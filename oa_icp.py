"""Object-Aware ICP: improve flow predictions with the learned segmentation,
writing a new flow directory for the next training round.

Usage (CLI-compatible with the reference oa_icp.py):
    python oa_icp.py <config.yaml> --split train --round R --save
"""

import argparse
import json
import os
import os.path as osp

import numpy as np

# OA-ICP iterations per alternation round (reference oa_icp.py:175-176).
ICP_ITERS = {1: 20, 2: 10, 3: 5, 4: 3}


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.data.base import DataLoader
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.refine.oa_icp import object_aware_icp, weighted_kabsch
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="train", help="Dataset split")
    parser.add_argument("--round", type=int, default=1,
                        help="Which round of iterative optimization")
    parser.add_argument("--test_batch_size", type=int, default=48)
    parser.add_argument("--dp", type=int, default=1,
                        help="Data-parallel refinement over N local "
                             "devices (0 = all).  Exact: all per-batch "
                             "computations are per-sample independent.")
    parser.add_argument("--save", default=False, action="store_true",
                        help="Save updated flow predictions")
    parser.add_argument("--saveflow_path", type=str, default=None)
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    args = parser.parse_args()
    if args.round < 1:  # validate BEFORE any model/checkpoint work
        parser.error("--round must be >= 1 (got %d)" % args.round)
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
    elif args.dataset == "kittisf":
        from ogc_tpu.data.kittisf import KITTISceneFlowDataset as TestDataset

        mapping_path = (
            "data_prepare/kittisf/splits/val.txt"
            if args.split == "val"
            else "data_prepare/kittisf/splits/train.txt"
        )
        epe_norm_thresh = 0.05
    else:
        raise KeyError("Unrecognized dataset!")

    segnet = MaskFormer3D(
        n_slot=args.segnet["n_slot"],
        n_point=args.segnet["n_point"],
        arch=args.dataset,
        use_xyz=args.segnet["use_xyz"],
        n_transformer_layer=args.segnet["n_transformer_layer"],
        transformer_embed_dim=args.segnet["transformer_embed_dim"],
        transformer_input_pos_enc=args.segnet["transformer_input_pos_enc"],
    )
    dummy = jnp.zeros((1, args.segnet["n_point"], 3), jnp.float32)
    params = jax.jit(segnet.init)(jax.random.PRNGKey(0), dummy, dummy)
    weight_path = osp.join(args.save_path + "_R%d" % args.round, "best")
    params = load_checkpoint(weight_path, params)
    print("Loaded weights from", weight_path)

    predflow_path = (
        "flowstep3d_R%d" % (args.round - 1) if args.round > 1 else "flowstep3d"
    )
    if args.dataset in ("sapien", "ogcdr"):
        view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
        common = dict(
            data_root=data_root, split=args.split, view_sels=view_sels,
            decentralize=args.data["decentralize"],
        )
        test_set = TestDataset(**common)
        test_set_predflow = TestDataset(**common, predflow_path=predflow_path)
    else:
        view_sels = [[0, 1], [1, 0]]
        common = dict(
            data_root=data_root, mapping_path=mapping_path, downsampled=True,
            view_sels=view_sels, decentralize=args.data["decentralize"],
        )
        test_set = TestDataset(**common)
        test_set_predflow = TestDataset(**common, predflow_path=predflow_path)
    n_frame = len(view_sels)
    batch_size = args.test_batch_size
    # Rounds beyond the reference's schedule table (oa_icp.py:175-176)
    # clamp to the final entry (3 iterations) instead of raising.
    icp_iter = ICP_ITERS.get(args.round, ICP_ITERS[max(ICP_ITERS)])

    if args.save:
        assert batch_size % n_frame == 0
        if args.saveflow_path is None:
            args.saveflow_path = "flowstep3d"
        save_dir = osp.join(
            data_root, "flow_preds", args.saveflow_path + "_R%d" % args.round
        )
        os.makedirs(save_dir, exist_ok=True)
        if args.dataset in ("sapien", "ogcdr"):
            with open(save_dir + ".json", "w") as f:
                json.dump({"view_sel": view_sels}, f)

    from ogc_tpu.parallel import mesh as pmesh

    # ONE jitted chain (segnet on both clouds + weighted Kabsch + OA-ICP):
    # the (B, N, K) masks never leave the device, at any --dp.
    def _refine(p, a, b, f):
        m1 = segnet.apply(p, a, a)
        m2 = segnet.apply(p, b, b)
        return (
            weighted_kabsch(a, f, m1),
            object_aware_icp(a, b, f, m1, m2, icp_iter=icp_iter),
        )

    refine = pmesh.dp_eval_fwd(jax.jit(_refine), params, args.dp)

    meter, meter_kabsch, meter_oaicp = AverageMeter(), AverageMeter(), AverageMeter()
    loader = DataLoader(test_set, batch_size=batch_size, shuffle=False, num_workers=4)
    loader_pf = DataLoader(
        test_set_predflow, batch_size=batch_size, shuffle=False, num_workers=4
    )
    for i, (batch1, batch2) in enumerate(zip(loader, loader_pf)):
        pcs, _, flows, _ = batch1
        _, _, flow_preds, _ = batch2
        pc1, pc2 = pcs[:, 0], pcs[:, 1]
        gt_flow, flow_pred = flows[:, 0], flow_preds[:, 0]

        flow_kabsch, flow_oaicp = refine(pc1, pc2, flow_pred)

        for m, f in ((meter, np.asarray(flow_pred)), (meter_kabsch, flow_kabsch),
                     (meter_oaicp, flow_oaicp)):
            epe, acc_s, acc_r, outlier = eval_flow(
                gt_flow, f, epe_norm_thresh=epe_norm_thresh
            )
            m.append_loss(
                {"EPE": epe, "AccS": acc_s, "AccR": acc_r, "Outlier": outlier}
            )

        if args.save:
            test_set._save_predflow(
                flow_oaicp, save_root=save_dir, batch_size=batch_size,
                n_frame=n_frame, offset=i,
            )

    print("Original flow:", meter.get_mean_loss_dict())
    print("Weighted Kabsch flow:", meter_kabsch.get_mean_loss_dict())
    print("Object-Aware ICP flow:", meter_oaicp.get_mean_loss_dict())


if __name__ == "__main__":
    main()
