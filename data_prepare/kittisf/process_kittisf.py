"""Convert raw KITTI Scene Flow (disparity + optical flow + instance maps)
into the per-scene pc1/pc2/segm npy layout.

Parity with reference data_prepare/kittisf/process_kittisf.py: unproject
both frames through the rectified left camera, warp frame-2 pixels by the
optical flow, drop far (z >= 35 m) and invalid pixels, keep Car/Truck
instances.

Usage: python process_kittisf.py <data_root>
"""

import argparse
import os
import os.path as osp
from multiprocessing import Pool

import numpy as np

from kittisf_util import (
    disp_2_depth,
    filter_segm,
    load_disp,
    load_op_flow,
    load_segm,
    pixel2xyz,
)

# KITTI semantic ids for 'Car' and 'Truck'.
SELECT_SEMANTICS = [26, 28]


def process_one_frame(task):
    idx, src_dir, save_dir = task
    data_id = "%06d" % idx

    with open(osp.join(src_dir, "calib_cam_to_cam", data_id + ".txt")) as fd:
        rows = [l for l in fd.readlines() if l.startswith("P_rect_02")]
    assert len(rows) == 1
    P_rect = np.array(
        [float(v) for v in rows[0].split()[1:]], dtype=np.float32
    ).reshape(3, 4)
    focal = P_rect[0, 0]

    disp1, valid_disp1 = load_disp(
        osp.join(src_dir, "disp_occ_0", data_id + "_10.png")
    )
    depth1 = disp_2_depth(disp1, valid_disp1, focal)
    pc1 = pixel2xyz(depth1, P_rect)

    disp2, valid_disp2 = load_disp(
        osp.join(src_dir, "disp_occ_1", data_id + "_10.png")
    )
    depth2 = disp_2_depth(disp2, valid_disp2, focal)
    valid_disp = np.logical_and(valid_disp1, valid_disp2)

    op_flow, valid_op_flow = load_op_flow(
        osp.join(src_dir, "flow_occ", data_id + "_10.png")
    )
    height, width = op_flow.shape[:2]
    # Pixel coordinates in frame 2 = frame-1 pixels advected by the flow
    # (vectorized version of the reference's pixel loop, :59-72).
    jj = np.tile(np.arange(width, dtype=np.float32)[None, :], (height, 1))
    ii = np.tile(np.arange(height, dtype=np.float32)[:, None], (1, width))
    ok = np.logical_and(valid_op_flow, valid_disp)
    px2 = np.where(ok, jj + op_flow[..., 0], 0.0).astype(np.float32)
    py2 = np.where(ok, ii + op_flow[..., 1], 0.0).astype(np.float32)
    pc2 = pixel2xyz(depth2, P_rect, px=px2, py=py2)

    instance_segm = load_segm(
        osp.join(src_dir, "instance", data_id + "_10.png")
    )

    near = np.logical_and(pc1[..., 2] < 35.0, pc2[..., 2] < 35.0)
    final = np.logical_and(np.logical_and(valid_disp, valid_op_flow), near)
    segm = filter_segm(
        instance_segm[final].astype(int), select_semantics=SELECT_SEMANTICS
    )

    save_path = osp.join(save_dir, data_id)
    os.makedirs(save_path, exist_ok=True)
    np.save(osp.join(save_path, "pc1.npy"), pc1[final])
    np.save(osp.join(save_path, "pc2.npy"), pc2[final])
    np.save(osp.join(save_path, "segm.npy"), segm)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str, help="Root path for the dataset")
    parser.add_argument("--n_workers", type=int, default=4)
    args = parser.parse_args()

    src_dir = osp.join(args.data_root, "training")
    save_dir = osp.join(args.data_root, "processed")
    os.makedirs(save_dir, exist_ok=True)

    tasks = [(i, src_dir, save_dir) for i in range(200)]
    with Pool(args.n_workers) as pool:
        pool.map(process_one_frame, tasks)
