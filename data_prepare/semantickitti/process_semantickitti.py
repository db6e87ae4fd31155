"""Convert SemanticKITTI scans into front-view 8192-pt clouds with
panoptic-label instance segmentation (car/truck classes only).

Parity with reference data_prepare/semantickitti/process_semantickitti.py.

Usage: python process_semantickitti.py <data_root>
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from semantickitti_util import Calibration  # noqa: E402
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402

IMG_WIDTH, IMG_HEIGHT = 1242, 375
CLIP_DISTANCE = 2.0
DEPTH_THRESH = 35.0
N_SAMPLE_POINT = 8192
# ['car', 'truck', 'moving-car', 'moving-truck']
SELECTED_CLASS_IDS = [10, 18, 252, 258]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str)
    parser.add_argument("--sequences", type=int, nargs="*",
                        default=list(range(11)))
    args = parser.parse_args()

    src = osp.join(args.data_root, "sequences")
    save_dir = osp.join(args.data_root, "downsampled")
    os.makedirs(save_dir, exist_ok=True)

    for seq_id in args.sequences:
        seq_dir = osp.join(src, "%02d" % seq_id)
        lidar_dir = osp.join(seq_dir, "velodyne")
        label_dir = osp.join(seq_dir, "labels")
        calib = Calibration(osp.join(seq_dir, "calib.txt"))

        for sid in range(len(os.listdir(label_dir))):
            pc_velo = np.fromfile(
                osp.join(lidar_dir, "%06d.bin" % sid), dtype=np.float32
            ).reshape(-1, 4)[:, :3]
            label = np.fromfile(
                osp.join(label_dir, "%06d.label" % sid), dtype=np.int32
            ).reshape(-1)
            sem_label = label & 0xFFFF  # lower half = semantic class
            inst_label = label

            pts_ref = calib.project_velo_to_ref(pc_velo)
            uvd = calib.project_ref_to_image(pts_ref)
            uv = uvd[:, :2]
            fov = (
                (uv[:, 0] >= 0) & (uv[:, 0] < IMG_WIDTH)
                & (uv[:, 1] >= 0) & (uv[:, 1] < IMG_HEIGHT)
                & (pc_velo[:, 0] > CLIP_DISTANCE)
            )
            pc = pts_ref[fov]
            sem, inst = sem_label[fov], inst_label[fov]
            pc[:, :2] *= -1.0
            pc = pc.astype(np.float32)
            not_far = pc[:, 2] < DEPTH_THRESH
            pc, sem, inst = pc[not_far], sem[not_far], inst[not_far]

            fps_idx = fps_downsample(pc, n_sample_point=N_SAMPLE_POINT)
            pc, sem, inst = pc[fps_idx], sem[fps_idx], inst[fps_idx]

            segm = np.zeros_like(inst)
            keep = np.in1d(sem, SELECTED_CLASS_IDS)
            segm[keep] = inst[keep]
            _, segm = np.unique(segm, return_inverse=True)

            save_path = osp.join(save_dir, "%02d_%06d" % (seq_id, sid))
            os.makedirs(save_path, exist_ok=True)
            np.save(osp.join(save_path, "pc.npy"), pc)
            np.save(osp.join(save_path, "segm.npy"), segm)


if __name__ == "__main__":
    main()
