"""Select Waymo frame pairs with sufficient moving (non-ego) motion for
unsupervised training, writing splits/<split>_unsup.json.

Parity with reference data_prepare/waymo/select_mov.py: compare flow
predictions against the GT ego-motion flow above the ground plane; keep
pairs where >20% of points move >0.2 m beyond ego-motion.

Usage: python select_mov.py --data_root <downsampled> --raw_root <full>
           --split train [--predflow_path flowstep3d_gpf_odo_bound]
"""

import argparse
import json
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from ogc_tpu.data.waymo import WaymoOpenDataset  # noqa: E402

MOVING_THRESH = 0.2
MOV_RATIO_THRESH = 0.2


def convert_id_to_pair(data_ids):
    """(sequence, t) single-frame ids -> backward (t, t-1) pair ids."""
    out = []
    for sequence_name, view_id in data_ids:
        if view_id > 0:
            out.append((sequence_name, view_id, view_id - 1))
    return out


def detect_moving(pc, flow, bg_rot, bg_transl, thresh=MOVING_THRESH):
    flow_fitted = pc @ bg_rot.T + bg_transl - pc
    diff = np.linalg.norm(flow_fitted - flow, axis=1)
    return float((diff > thresh).sum())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True,
                        help="Downsampled dataset root")
    parser.add_argument("--raw_root", type=str, required=True,
                        help="Full-resolution root (for GT poses)")
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--predflow_path", type=str,
                        default="flowstep3d_gpf_odo_bound")
    args = parser.parse_args()

    splits_dir = osp.join(osp.dirname(osp.abspath(__file__)), "splits")
    sup_json = osp.join(splits_dir, f"{args.split}_sup.json")
    with open(sup_json) as f:
        data_ids = json.load(f)
    paired = convert_id_to_pair([tuple(d) for d in data_ids])
    paired_json = osp.join(splits_dir, f"{args.split}_sup_paired.json")
    with open(paired_json, "w") as f:
        json.dump(paired, f)

    dataset = WaymoOpenDataset(
        data_root=args.data_root,
        mapping_path=osp.join(splits_dir, f"{args.split}.txt"),
        downsampled=True,
        select_frame=paired_json,
        predflow_path=args.predflow_path,
        ignore_class_ids=[2, 3],
        ignore_npoint_thresh=50,
    )

    moving_samples = []
    for sid in range(len(dataset)):
        sequence_name, v1, v2 = dataset.data_ids[sid]
        pcs, segms, flows, _ = dataset[sid]
        pc, segm, flow = pcs[0], segms[0], flows[0]

        if np.unique(segm).shape[0] == 1:  # pure background
            continue

        seq_path = osp.join(args.raw_root, "data", sequence_name)
        pose1 = np.load(osp.join(seq_path, "pose_%04d.npy" % v1))
        pose2 = np.load(osp.join(seq_path, "pose_%04d.npy" % v2))
        rot = pose2[:3, :3].T @ pose1[:3, :3]
        transl = pose2[:3, :3].T @ (pose1[:3, 3] - pose2[:3, 3])

        not_ground = pc[:, 1] >= 0.3
        pc_fg, flow_fg = pc[not_ground], flow[not_ground]
        if pc_fg.shape[0] == 0:
            continue
        ratio = detect_moving(pc_fg, flow_fg, rot, transl) / pc_fg.shape[0]
        if ratio > MOV_RATIO_THRESH:
            moving_samples.append((sequence_name, v1, v2))

    print(len(dataset), len(moving_samples))
    with open(osp.join(splits_dir, f"{args.split}_unsup.json"), "w") as f:
        json.dump(moving_samples, f)


if __name__ == "__main__":
    main()
