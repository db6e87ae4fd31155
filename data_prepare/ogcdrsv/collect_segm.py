"""Label single-view OGC-DRSV scans by nearest neighbor against the complete
OGC-DR clouds, FPS-downsampling to 2048 points.

Parity with reference data_prepare/ogcdrsv/collect_segm.py (reads the npy
depth clouds written by build_ogcdrsv.py instead of Open3D .pcd files).

Usage: python collect_segm.py --src_root <OGC_DR> --dest_root <OGC_DRSV>
"""

import argparse
import os
import os.path as osp
import pathlib
import shutil
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402

N_FRAME = 4
N_SAMPLE_POINT = 2048


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_root", type=str, required=True)
    parser.add_argument("--dest_root", type=str, required=True)
    args = parser.parse_args()

    src_root = osp.join(args.src_root, "data")
    data_root = osp.join(args.dest_root, "pcd")
    data_ids = sorted(os.listdir(data_root))
    save_root = osp.join(args.dest_root, "data")
    os.makedirs(save_root, exist_ok=True)

    for data_id in data_ids:
        data_path = osp.join(data_root, data_id)
        src_path = osp.join(src_root, data_id)
        save_path = osp.join(save_root, data_id)
        os.makedirs(save_path, exist_ok=True)

        for fid in range(N_FRAME):
            pc = np.load(osp.join(data_path, "pc_%02d.npy" % fid)).astype(
                np.float32
            )
            fps_idx = fps_downsample(pc, n_sample_point=N_SAMPLE_POINT)
            pc = pc[fps_idx]

            pc_src = np.load(osp.join(src_path, "pc_%02d.npy" % fid))
            segm_src = np.load(osp.join(src_path, "segm_%02d.npy" % fid))
            pose = np.load(osp.join(src_path, "pose_%02d.npy" % fid))

            _, nearest = cKDTree(pc_src).query(pc, k=1)
            segm = segm_src[nearest]

            np.save(osp.join(save_path, "pc_%02d.npy" % fid), pc)
            np.save(osp.join(save_path, "segm_%02d.npy" % fid), segm)
            np.save(osp.join(save_path, "pose_%02d.npy" % fid), pose)

    for split in ["train", "val", "test"]:
        shutil.copyfile(
            osp.join(src_root, split + ".lst"),
            osp.join(save_root, split + ".lst"),
        )


if __name__ == "__main__":
    main()
