"""FPS-downsample full-resolution Waymo sequences to 8192 points per frame.

Parity with reference data_prepare/waymo/downsample_waymo.py: frame 1 of
each backward pair carries segm/semantic/flow through the same indices;
frame 0 is only processed once (at the first pair).

Usage: python downsample_waymo.py --data_root <in> --save_root <out> --split train
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from ogc_tpu.data.waymo import WaymoOpenDataset  # noqa: E402
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402

N_SAMPLE_POINT = 8192


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--save_root", type=str, required=True)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--predflow_path", type=str, default=None)
    args = parser.parse_args()

    save_dir = osp.join(args.save_root, "data")
    os.makedirs(save_dir, exist_ok=True)
    if args.predflow_path is not None:
        predflow_root = osp.join(args.data_root, "flow_preds", args.predflow_path)
        save_pf_dir = osp.join(args.save_root, "flow_preds", args.predflow_path)
        os.makedirs(save_pf_dir, exist_ok=True)

    mapping_path = osp.join(
        osp.dirname(osp.abspath(__file__)), "splits", args.split + ".txt"
    )
    dataset = WaymoOpenDataset(data_root=args.data_root, mapping_path=mapping_path)

    for sid in range(len(dataset)):
        sequence_name, v1, v2 = dataset.data_ids[sid]
        seq_path = osp.join(args.data_root, "data", sequence_name)

        def load(name):
            return np.load(osp.join(seq_path, name))

        pc1, pc2 = load("pc_%04d.npy" % v1), load("pc_%04d.npy" % v2)
        segm1, segm2 = load("segm_%04d.npy" % v1), load("segm_%04d.npy" % v2)
        sem1, sem2 = (
            load("semantic_segm_%04d.npy" % v1),
            load("semantic_segm_%04d.npy" % v2),
        )
        if args.predflow_path is not None:
            flow = np.load(
                osp.join(predflow_root, sequence_name, "flow_%04d_%04d.npy" % (v1, v2))
            )
        else:
            flow = load("flow_%04d_%04d.npy" % (v1, v2))

        if pc1.shape[0] > 0:
            idx1 = fps_downsample(pc1, n_sample_point=N_SAMPLE_POINT)
            pc1, segm1, sem1, flow = pc1[idx1], segm1[idx1], sem1[idx1], flow[idx1]

        save_path = osp.join(save_dir, sequence_name)
        os.makedirs(save_path, exist_ok=True)
        np.save(osp.join(save_path, "pc_%04d.npy" % v1), pc1)
        np.save(osp.join(save_path, "segm_%04d.npy" % v1), segm1)
        np.save(osp.join(save_path, "semantic_segm_%04d.npy" % v1), sem1)

        if v2 == 0:  # first pair: frame 0 hasn't been emitted yet
            if pc2.shape[0] > 0:
                idx2 = fps_downsample(pc2, n_sample_point=N_SAMPLE_POINT)
                pc2, segm2, sem2 = pc2[idx2], segm2[idx2], sem2[idx2]
            np.save(osp.join(save_path, "pc_%04d.npy" % v2), pc2)
            np.save(osp.join(save_path, "segm_%04d.npy" % v2), segm2)
            np.save(osp.join(save_path, "semantic_segm_%04d.npy" % v2), sem2)

        if args.predflow_path is not None:
            pf_path = osp.join(save_pf_dir, sequence_name)
            os.makedirs(pf_path, exist_ok=True)
            np.save(osp.join(pf_path, "flow_%04d_%04d.npy" % (v1, v2)), flow)
        else:
            np.save(osp.join(save_path, "flow_%04d_%04d.npy" % (v1, v2)), flow)


if __name__ == "__main__":
    main()
