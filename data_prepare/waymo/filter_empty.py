"""Select Waymo single frames with enough points for supervised training,
writing splits/<split>_sup.json.

Parity with reference data_prepare/waymo/filter_empty.py (frames with
< 8192 points are dropped).

Usage: python filter_empty.py --data_root <full-res root> --split train
"""

import argparse
import json
import os.path as osp
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from ogc_tpu.data.waymo import WaymoOpenSingleFrameDataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--sampled_interval", type=int, default=5)
    args = parser.parse_args()

    splits_dir = osp.join(osp.dirname(osp.abspath(__file__)), "splits")
    dataset = WaymoOpenSingleFrameDataset(
        data_root=args.data_root,
        mapping_path=osp.join(splits_dir, f"{args.split}.txt"),
        downsampled=False,
        sampled_interval=args.sampled_interval,
    )

    keep = []
    for sid in range(len(dataset)):
        pcs, _, _ = dataset[sid]
        sequence_name, view_id = dataset.data_ids[sid]
        if pcs[0].shape[0] >= 8192:
            keep.append((sequence_name, view_id))
        else:
            print("drop", sequence_name, view_id, pcs[0].shape[0])

    with open(osp.join(splits_dir, f"{args.split}_sup.json"), "w") as f:
        json.dump(keep, f)


if __name__ == "__main__":
    main()
