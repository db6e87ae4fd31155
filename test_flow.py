"""Evaluate scene flow (EPE3D/AccS/AccR/Outlier) and optionally save flow
predictions for the segmentation stage.

Usage (CLI-compatible with the reference test_flow.py):
    python test_flow.py <config.yaml> --split test [--save]
"""

import argparse
import json
import os
import os.path as osp

import numpy as np


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.data.base import DataLoader
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="test", help="Dataset split")
    parser.add_argument("--test_batch_size", type=int, default=48)
    parser.add_argument("--test_model_iters", type=int, default=4,
                        help="FlowStep3D unroll iterations in testing")
    parser.add_argument("--save", default=False, action="store_true",
                        help="Save flow predictions")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    parser.add_argument("--dp", type=int, default=1,
                        help="Data-parallel eval over N local devices "
                             "(0 = all).  Exact: eval forwards are "
                             "per-sample independent.")
    args = parser.parse_args()
    load_config_into_args(args)
    from ogc_tpu import ops as _ops

    _ops.set_exact_neighbors(not args.approx_knn)

    data_root = args.data["root"]
    if args.dataset == "sapien":
        from ogc_tpu.data.sapien import SapienDataset as TestDataset

        data_root = osp.join(
            data_root, "mbs-sapien" if args.split == "test" else "mbs-shapepart"
        )
        epe_norm_thresh = 0.01
    elif args.dataset == "ogcdr":
        from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset as TestDataset

        epe_norm_thresh = 0.01
    else:
        raise KeyError("Unrecognized dataset!")

    # k_decay_fact fixed to 0.5 at test time (reference test_flow.py:52).
    flownet = FlowStep3D(
        npoint=args.flownet["npoint"],
        arch=args.dataset,
        use_instance_norm=args.flownet["use_instance_norm"],
        loc_flow_nn=args.flownet["loc_flow_nn"],
        loc_flow_rad=args.flownet["loc_flow_rad"],
        k_decay_fact=0.5,
    )
    n_point = args.flownet["npoint"]
    dummy = jnp.zeros((1, n_point, 3), jnp.float32)
    variables = flownet.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy, 2)
    variables = load_checkpoint(osp.join(args.save_path, "best"), variables)
    print("Loaded weights from", osp.join(args.save_path, "best"))

    view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
    test_set = TestDataset(
        data_root=data_root, split=args.split, view_sels=view_sels
    )
    batch_size = args.test_batch_size
    n_frame = len(view_sels)

    if args.save:
        assert batch_size % n_frame == 0, (
            "Frame pairs of one scene should be in the same batch!"
        )
        save_dir = osp.join(data_root, "flow_preds/flowstep3d")
        os.makedirs(save_dir, exist_ok=True)
        with open(save_dir + ".json", "w") as f:
            json.dump({"view_sel": view_sels}, f)

    from ogc_tpu.parallel import mesh as pmesh

    fwd = pmesh.dp_eval_fwd(
        jax.jit(
            lambda v, a, b: flownet.apply(
                v, a, b, a, b, args.test_model_iters, train=False
            )[-1]
        ),
        variables, args.dp,
    )

    eval_meter = AverageMeter()
    loader = DataLoader(test_set, batch_size=batch_size, shuffle=False, num_workers=4)
    for i, batch in enumerate(loader):
        pcs, _, flows, _ = batch
        pc1, pc2 = pcs[:, 0], pcs[:, 1]
        gt_flow = flows[:, 0]

        flow_pred = fwd(pc1, pc2)

        epe, acc_s, acc_r, outlier = eval_flow(
            gt_flow, flow_pred, epe_norm_thresh=epe_norm_thresh
        )
        eval_meter.append_loss(
            {"EPE": epe, "AccS": acc_s, "AccR": acc_r, "Outlier": outlier}
        )

        if args.save:
            test_set._save_predflow(
                flow_pred, save_root=save_dir, batch_size=batch_size,
                n_frame=n_frame, offset=i,
            )

    print("Evaluation on %s-%s:" % (args.dataset, args.split),
          eval_meter.get_mean_loss_dict())


if __name__ == "__main__":
    main()
