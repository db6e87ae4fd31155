"""Convert KITTI 3D-detection velodyne scans into front-view 8192-pt clouds
with per-point segmentation derived from 3D Car boxes.

Parity with reference data_prepare/kittidet/process_kittidet.py: project
velodyne into the rectified camera frame, keep in-image FOV points beyond
2 m and under 35 m depth, flip x/y to the OGC convention, FPS to 8192,
assign box-interior points instance ids 1..K.

Usage: python process_kittidet.py <data_root>
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

import kittidet_util as utils  # noqa: E402
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402

CLIP_DISTANCE = 2.0
DEPTH_THRESH = 35.0
N_SAMPLE_POINT = 8192


def box_to_segm(points, objects, relax=0.01):
    """Per-point instance ids from rect-frame 3D Car boxes
    (process_kittidet.py:33-65).  points are in the flipped OGC frame."""
    segm = np.zeros(points.shape[0], dtype=np.int32)
    pc = points.copy()
    pc[:, :2] *= -1.0  # back to rect frame
    for sid, obj in enumerate(objects):
        if obj.type != "Car":
            continue
        R = utils.roty(-obj.ry)
        pc_tr = (pc - obj.t) @ R.T
        l, w, h = obj.l, obj.w, obj.h
        inside = (
            (pc_tr[:, 0] > -l / 2 - relax) & (pc_tr[:, 0] < l / 2 + relax)
            & (pc_tr[:, 1] > -h - relax) & (pc_tr[:, 1] < relax)
            & (pc_tr[:, 2] > -w / 2 - relax) & (pc_tr[:, 2] < w / 2 + relax)
        )
        segm[inside] = sid + 1
    return segm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str)
    parser.add_argument("--n_sample", type=int, default=7481)
    args = parser.parse_args()

    src = osp.join(args.data_root, "training")
    save_dir = osp.join(args.data_root, "downsampled")
    os.makedirs(save_dir, exist_ok=True)

    for sid in range(args.n_sample):
        pc_velo = utils.load_velo_scan(
            osp.join(src, "velodyne", "%06d.bin" % sid)
        )[:, :3]
        img = utils.load_image(osp.join(src, "image_2", "%06d.png" % sid))
        calib = utils.Calibration(osp.join(src, "calib", "%06d.txt" % sid))
        img_h, img_w = img.shape[:2]

        pts_rect = calib.project_velo_to_rect(pc_velo)
        uvd = calib.project_rect_to_image(pts_rect)
        uv = uvd[:, :2]
        fov = (
            (uv[:, 0] >= 0) & (uv[:, 0] < img_w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < img_h)
            & (pc_velo[:, 0] > CLIP_DISTANCE)
        )
        pc = pts_rect[fov].astype(np.float32)
        pc[:, :2] *= -1.0
        pc = pc[pc[:, 2] < DEPTH_THRESH]

        fps_idx = fps_downsample(pc, n_sample_point=N_SAMPLE_POINT)
        pc = pc[fps_idx]

        objects = utils.read_label(osp.join(src, "label_2", "%06d.txt" % sid))
        segm = box_to_segm(pc, objects)

        save_path = osp.join(save_dir, "%06d" % sid)
        os.makedirs(save_path, exist_ok=True)
        np.save(osp.join(save_path, "pc.npy"), pc)
        np.save(osp.join(save_path, "segm.npy"), segm)


if __name__ == "__main__":
    main()
