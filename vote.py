"""Multi-frame co-segmentation voting evaluation.

Usage (CLI-compatible with the reference vote.py):
    python vote.py <config.yaml> --split test --round R [--time_window_size T]
"""

import argparse
import os
import os.path as osp

import numpy as np


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.data.base import DataLoader
    from ogc_tpu.metrics.seg import (
        accumulate_eval_results,
        calculate_AP,
        calculate_PQ_F1,
        clustering_metrics,
    )
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.refine.vote import mask_voting
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--round", type=int, default=0)
    parser.add_argument("--test_batch_size", type=int, default=64)
    parser.add_argument("--time_window_size", type=int, default=3)
    parser.add_argument("--use_gt_flow", default=False, action="store_true")
    parser.add_argument("--save", default=False, action="store_true")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    parser.add_argument("--dp", type=int, default=1,
                        help="Data-parallel devices for eval serving "
                             "(0 = all local devices); scenes shard "
                             "over the mesh")
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
    elif args.dataset == "ogcdr":
        from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset as TestDataset
    elif args.dataset == "kittisf":
        from ogc_tpu.data.kittisf import KITTISceneFlowDataset as TestDataset

        mapping_path = (
            "data_prepare/kittisf/splits/val.txt"
            if args.split == "val"
            else "data_prepare/kittisf/splits/train.txt"
        )
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
    if args.round > 0:
        weight_path = osp.join(args.save_path + "_R%d" % args.round, "best")
    else:
        weight_path = osp.join(args.save_path, "best")
    params = load_checkpoint(weight_path, params)
    print("Loaded weights from", weight_path)

    if args.use_gt_flow:
        predflow_path = None
    elif args.round > 1:
        predflow_path = args.predflow_path + "_R%d" % (args.round - 1)
    else:
        predflow_path = args.predflow_path

    if args.dataset in ("sapien", "ogcdr"):
        view_sels = [[0, 1], [1, 2], [2, 3], [3, 2]]
        test_set = TestDataset(
            data_root=data_root, split=args.split, view_sels=view_sels,
            predflow_path=predflow_path, decentralize=args.data["decentralize"],
        )
        ignore_npoint_thresh = 0
    else:
        view_sels = [[0, 1], [1, 0]]
        test_set = TestDataset(
            data_root=data_root, mapping_path=mapping_path, downsampled=True,
            view_sels=view_sels, predflow_path=predflow_path,
            decentralize=args.data["decentralize"],
        )
        ignore_npoint_thresh = 50
    n_frame = len(view_sels)
    batch_size = args.test_batch_size
    assert batch_size % n_frame == 0

    if args.save:
        save_dir = osp.join(
            data_root, "segm_preds/Vote" + "_T%d" % args.time_window_size
        )
        os.makedirs(save_dir, exist_ok=True)

    from ogc_tpu.parallel import mesh as pmesh

    def _vote_batch(p, pc_s, flows_s):
        """One device call per batch: segnet on every frame (S*T batched for
        the MXU), then voting vmapped over scenes.  vmap (not lax.map): a
        scan over a dp-sharded axis makes GSPMD all-gather the operands and
        replicate the whole loop on every device (verified in HLO), while
        vmapped ops partition along the scene axis.  Memory: the streaming
        warp's (N, tile) transient multiplies by the per-device scene
        count — bounded by test_batch_size / n_frame / dp, ~1 GB at the
        KITTI worst case.  The reference interleaves a host loop per scene
        (vote.py:299-316)."""
        S, T, N, _ = pc_s.shape
        flat = pc_s.reshape(S * T, N, 3)
        mask = segnet.apply(p, flat, flat).reshape(S, T, N, -1)

        return jax.vmap(
            lambda pc1, m1, fl1: mask_voting(
                pc1, m1, fl1, time_window_size=args.time_window_size
            )
        )(pc_s, mask, flows_s)

    vote_fwd = pmesh.dp_eval_fwd(jax.jit(_vote_batch), params, args.dp)

    eval_meter = AverageMeter()
    ap_meter = {"Pred_IoU": [], "Pred_Matched": [], "Confidence": [], "N_GT_Inst": []}
    loader = DataLoader(test_set, batch_size=batch_size, shuffle=False, num_workers=4)

    for i, batch in enumerate(loader):
        pcs, segms, flows, _ = batch
        pc = np.asarray(pcs[:, 0])
        segm = segms[:, 0]

        n_scene = segm.shape[0] // n_frame
        pc_s = pc.reshape(n_scene, n_frame, *pc.shape[1:])
        flows_s = np.asarray(flows).reshape(
            n_scene, n_frame, *flows.shape[1:]
        )[:, : n_frame - 1]
        mask_voted = vote_fwd(pc_s, flows_s)
        mask_voted = mask_voted.reshape(n_scene * n_frame,
                                        *mask_voted.shape[2:])

        iou, matched, conf, n_gt = accumulate_eval_results(
            segm, mask_voted, ignore_npoint_thresh=ignore_npoint_thresh
        )
        ap_meter["Pred_IoU"].append(iou)
        ap_meter["Pred_Matched"].append(matched)
        ap_meter["Confidence"].append(conf)
        ap_meter["N_GT_Inst"].append(n_gt)

        for sid in range(segm.shape[0] // n_frame):
            sl = slice(n_frame * sid, n_frame * (sid + 1))
            mbs = clustering_metrics(
                mask_voted[sl], segm[sl], ignore_npoint_thresh=ignore_npoint_thresh
            )
            eval_meter.append_loss(
                {
                    "per_scan_iou_avg": float(np.mean(mbs["iou"])),
                    "per_scan_iou_std": float(np.std(mbs["iou"])),
                    "per_scan_ri_avg": float(np.mean(mbs["ri"])),
                    "per_scan_ri_std": float(np.std(mbs["ri"])),
                }
            )

        if args.save:
            test_set._save_predsegm(
                mask_voted, save_root=save_dir, batch_size=batch_size,
                n_frame=n_frame, offset=i,
            )

    print("Evaluation on %s-%s:" % (args.dataset, args.split))
    pred_iou = np.concatenate(ap_meter["Pred_IoU"])
    pred_matched = np.concatenate(ap_meter["Pred_Matched"])
    confidence = np.concatenate(ap_meter["Confidence"])
    n_gt_inst = int(np.sum(ap_meter["N_GT_Inst"]))
    print("AveragePrecision@50:", calculate_AP(pred_matched, confidence, n_gt_inst))
    pq, f1, pre, rec = calculate_PQ_F1(pred_iou, pred_matched, n_gt_inst)
    print("PanopticQuality@50:", pq, "F1-score@50:", f1, "Prec@50:", pre, "Recall@50:", rec)
    print(eval_meter.get_mean_loss_dict())


if __name__ == "__main__":
    main()
