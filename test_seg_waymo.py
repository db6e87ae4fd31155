"""Evaluate segmentation on Waymo Open with per-point ignore masks.

The reference test_seg_waymo.py imports a `metrics.seg_metric_ignmask`
module that is missing from its repo (broken as shipped); this entry point
implements the implied protocol via ogc_tpu.metrics.seg.*_ignmask.

Usage: python test_seg_waymo.py config/seg/waymo/waymo_unsup.yaml --split val --round R
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
    from ogc_tpu.data.waymo import WaymoOpenSingleFrameDataset as TestDataset
    from ogc_tpu.metrics.seg import (
        accumulate_eval_results_ignmask,
        calculate_AP,
        calculate_PQ_F1,
        clustering_metrics,
    )
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument("--round", type=int, default=0)
    parser.add_argument("--test_batch_size", type=int, default=64)
    parser.add_argument("--dp", type=int, default=1,
                        help="Data-parallel eval over N local devices "
                             "(0 = all).  Exact: eval forwards are "
                             "per-sample independent.")
    parser.add_argument("--save", default=False, action="store_true")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    args = parser.parse_args()
    load_config_into_args(args)
    from ogc_tpu import ops as _ops

    _ops.set_exact_neighbors(not args.approx_knn)

    data_root = args.data["root"]
    mapping_path = (
        "data_prepare/waymo/splits/val.txt"
        if args.split == "val"
        else "data_prepare/waymo/splits/train.txt"
    )

    segnet = MaskFormer3D(
        n_slot=args.segnet["n_slot"],
        n_point=args.segnet["n_point"],
        arch="waymo",
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

    # Eval-time ignore configuration (reference test_seg_waymo.py:63-71).
    n_frame = 1
    test_set = TestDataset(
        data_root=data_root,
        mapping_path=mapping_path,
        downsampled=True,
        sampled_interval=1,
        decentralize=args.data["decentralize"],
        ignore_class_ids=[2, 3],
        ignore_npoint_thresh=50,
    )
    batch_size = args.test_batch_size
    assert batch_size % n_frame == 0

    if args.save:
        save_dir = osp.join(data_root, "segm_preds/OGC" + "_R%d" % args.round)
        os.makedirs(save_dir, exist_ok=True)

    from ogc_tpu.parallel import mesh as pmesh

    fwd = pmesh.dp_eval_fwd(
        jax.jit(lambda p, x: segnet.apply(p, x, x)), params, args.dp
    )

    eval_meter = AverageMeter()
    ap_meter = {"Pred_IoU": [], "Pred_Matched": [], "Confidence": [], "N_GT_Inst": []}
    loader = DataLoader(test_set, batch_size=batch_size, shuffle=False, num_workers=4)

    for i, batch in enumerate(loader):
        pcs, segms, valids = batch
        ignores = 1 - valids
        pc = jnp.asarray(pcs[:, 0])
        segm = segms[:, 0]
        ignore = ignores[:, 0]

        mask = fwd(pc)

        iou, matched, conf, n_gt = accumulate_eval_results_ignmask(
            segm, mask, ignore
        )
        ap_meter["Pred_IoU"].append(iou)
        ap_meter["Pred_Matched"].append(matched)
        ap_meter["Confidence"].append(conf)
        ap_meter["N_GT_Inst"].append(n_gt)

        for sid in range(segm.shape[0] // n_frame):
            sl = slice(n_frame * sid, n_frame * (sid + 1))
            mbs = clustering_metrics(mask[sl], segm[sl], ignore_mask=ignore[sl])
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
                mask, save_root=save_dir, batch_size=batch_size,
                n_frame=n_frame, offset=i,
            )

    print("Evaluation on waymo-%s:" % args.split)
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
