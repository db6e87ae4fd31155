"""FPS-downsample full-resolution KITTI-SF scenes to 8192 points.

Parity with reference data_prepare/kittisf/downsample_kittisf.py: per
view-direction, sample 8192 FPS points of frame 1 and carry segm + flow
through the same indices.

Usage:
    python downsample_kittisf.py <data_root> --save_root <out>
        [--predflow_path flowstep3d]
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from ogc_tpu.data.kittisf import KITTISceneFlowDataset  # noqa: E402
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str)
    parser.add_argument("--save_root", type=str, required=True)
    parser.add_argument("--predflow_path", type=str, default=None)
    parser.add_argument("--n_sample_point", type=int, default=8192)
    args = parser.parse_args()

    save_dir = osp.join(args.save_root, "data")
    os.makedirs(save_dir, exist_ok=True)
    if args.predflow_path is not None:
        save_predflow_dir = osp.join(args.save_root, "flow_preds", args.predflow_path)
        os.makedirs(save_predflow_dir, exist_ok=True)

    mapping_path = osp.join(
        pathlib.Path(__file__).resolve().parent, "splits", "all.txt"
    )
    dataset = KITTISceneFlowDataset(
        data_root=args.data_root, mapping_path=mapping_path, downsampled=False,
        view_sels=[[0, 1], [1, 0]], predflow_path=args.predflow_path,
    )

    for sid in range(len(dataset)):
        pcs, segms, flows, _ = dataset[sid]
        pc_org, segm_org, flow_org = pcs[0], segms[0], flows[0]

        fps_idx = fps_downsample(pc_org, n_sample_point=args.n_sample_point)
        pc, segm, flow = pc_org[fps_idx], segm_org[fps_idx], flow_org[fps_idx]

        idx, vi = sid // 2, sid % 2
        data_id = dataset.data_ids[idx]
        save_path = osp.join(save_dir, data_id)
        os.makedirs(save_path, exist_ok=True)
        np.save(osp.join(save_path, "pc%d.npy" % (vi + 1)), pc)
        np.save(osp.join(save_path, "segm%d.npy" % (vi + 1)), segm)

        if args.predflow_path is not None:
            pf_path = osp.join(save_predflow_dir, data_id)
            os.makedirs(pf_path, exist_ok=True)
            np.save(osp.join(pf_path, "flow%d.npy" % (vi + 1)), flow)
        else:
            np.save(osp.join(save_path, "flow%d.npy" % (vi + 1)), flow)


if __name__ == "__main__":
    main()
