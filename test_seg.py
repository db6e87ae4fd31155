"""Evaluate the object segmentation network (AP@50, PQ/F1/Pre/Rec, mIoU, RI).

Usage (CLI-compatible with the reference test_seg.py):
    python test_seg.py <config.yaml> --split test --round R [--save]
"""

import argparse
import os
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from ogc_tpu.metrics.seg import (
    accumulate_eval_results,
    calculate_AP,
    calculate_PQ_F1,
    clustering_metrics,
)
from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.data.base import DataLoader
from ogc_tpu.utils.checkpoint import load_checkpoint
from ogc_tpu.utils.config import load_config_into_args
from ogc_tpu.utils.meters import AverageMeter


def build_test_dataset(args):
    data_root = args.data["root"]
    if args.dataset == "sapien":
        from ogc_tpu.data.sapien import SapienDataset as TestDataset

        data_root = osp.join(
            data_root, "mbs-sapien" if args.split == "test" else "mbs-shapepart"
        )
        view_sels = [[0, 1], [1, 2], [2, 3], [3, 2]]
        test_set = TestDataset(
            data_root=data_root, split=args.split, view_sels=view_sels,
            decentralize=args.data["decentralize"],
        )
        return test_set, len(view_sels), 0, data_root
    if args.dataset == "ogcdr":
        from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset as TestDataset

        view_sels = [[0, 1], [1, 2], [2, 3], [3, 2]]
        test_set = TestDataset(
            data_root=data_root, split=args.split, view_sels=view_sels,
            decentralize=args.data["decentralize"],
        )
        return test_set, len(view_sels), 0, data_root
    if args.dataset == "kittisf":
        from ogc_tpu.data.kittisf import KITTISceneFlowDataset as TestDataset

        mapping_path = (
            "data_prepare/kittisf/splits/val.txt"
            if args.split == "val"
            else "data_prepare/kittisf/splits/train.txt"
        )
        view_sels = [[0, 1], [1, 0]]
        test_set = TestDataset(
            data_root=data_root, mapping_path=mapping_path, downsampled=True,
            view_sels=view_sels, decentralize=args.data["decentralize"],
        )
        return test_set, len(view_sels), 50, data_root
    if args.dataset == "kittidet":
        from ogc_tpu.data.kittidet import KITTIDetectionDataset as TestDataset

        mapping_path = (
            "data_prepare/kittidet/splits/val.txt"
            if args.split == "val"
            else "data_prepare/kittidet/splits/train.txt"
        )
        test_set = TestDataset(
            data_root=data_root, mapping_path=mapping_path,
            decentralize=args.data["decentralize"],
        )
        return test_set, 1, 50, data_root
    if args.dataset == "semantickitti":
        from ogc_tpu.data.semantickitti import SemanticKITTIDataset as TestDataset

        test_set = TestDataset(
            data_root=data_root, sequence_list=list(range(11)),
            decentralize=args.data["decentralize"],
        )
        return test_set, 1, 50, data_root
    raise KeyError("Unrecognized dataset!")


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="test", help="Dataset split")
    parser.add_argument("--round", type=int, default=0,
                        help="Trained segmentation model of which round")
    parser.add_argument("--visualize", default=False, action="store_true")
    parser.add_argument("--test_batch_size", type=int, default=64)
    parser.add_argument("--curate_by_object", type=int, default=0,
                        help="Only evaluate scenes with more objects than this")
    parser.add_argument("--save", default=False, action="store_true",
                        help="Save segmentation predictions")
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
    params = segnet.init(jax.random.PRNGKey(0), dummy, dummy)

    if args.round > 0:
        weight_path = osp.join(args.save_path + "_R%d" % args.round, "best")
    else:
        weight_path = osp.join(args.save_path, "best")
    params = load_checkpoint(weight_path, params)
    print("Loaded weights from", weight_path)

    test_set, n_frame, ignore_npoint_thresh, data_root = build_test_dataset(args)
    batch_size = args.test_batch_size
    if args.curate_by_object > 0:
        batch_size = n_frame
    assert batch_size % n_frame == 0, (
        "Frames of one scene should be in the same batch!"
    )

    from ogc_tpu.parallel import mesh as pmesh

    fwd = pmesh.dp_eval_fwd(
        jax.jit(lambda p, x: segnet.apply(p, x, x)), params, args.dp
    )

    if args.visualize:
        # Headless qualitative mode: GT vs prediction scatter PNGs per scene
        # (the reference opens interactive Open3D windows, test_seg.py:125+).
        from ogc_tpu.utils.visual import scatter_segm_png

        vis_dir = "vis_seg"
        os.makedirs(vis_dir, exist_ok=True)
        loader = DataLoader(test_set, batch_size=n_frame, shuffle=False,
                            num_workers=2)
        for i, batch in enumerate(loader):
            if i >= 20:
                break
            pcs, segms, _, _ = batch
            pc = pcs[:, 0]
            segm = segms[:, 0]
            mask = fwd(pc)
            pred = mask.argmax(2)
            for t in range(pc.shape[0]):
                scatter_segm_png(pc[t], segm[t], osp.join(vis_dir, f"{i:04d}_{t}_gt.png"))
                scatter_segm_png(pc[t], pred[t], osp.join(vis_dir, f"{i:04d}_{t}_pred.png"))
        print("Saved qualitative results to", vis_dir)
        raise SystemExit(0)

    if args.save:
        save_dir = osp.join(data_root, "segm_preds/OGC" + "_R%d" % args.round)
        os.makedirs(save_dir, exist_ok=True)
        print("Save segmentation predictions into", save_dir, "...")

    eval_meter = AverageMeter()
    ap_meter = {"Pred_IoU": [], "Pred_Matched": [], "Confidence": [], "N_GT_Inst": []}
    loader = DataLoader(test_set, batch_size=batch_size, shuffle=False, num_workers=4)

    for i, batch in enumerate(loader):
        pcs, segms, flows, _ = batch
        pc = pcs[:, 0]
        segm = segms[:, 0]

        n_object = np.unique(segm[0]).shape[0]
        if n_object <= args.curate_by_object:
            continue

        mask = fwd(pc)

        iou, matched, conf, n_gt = accumulate_eval_results(
            segm, mask, ignore_npoint_thresh=ignore_npoint_thresh
        )
        ap_meter["Pred_IoU"].append(iou)
        ap_meter["Pred_Matched"].append(matched)
        ap_meter["Confidence"].append(conf)
        ap_meter["N_GT_Inst"].append(n_gt)

        for sid in range(segm.shape[0] // n_frame):
            sl = slice(n_frame * sid, n_frame * (sid + 1))
            mbs = clustering_metrics(
                mask[sl], segm[sl], ignore_npoint_thresh=ignore_npoint_thresh
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
                mask, save_root=save_dir, batch_size=batch_size,
                n_frame=n_frame, offset=i,
            )

    print("Evaluation on %s-%s:" % (args.dataset, args.split))
    pred_iou = np.concatenate(ap_meter["Pred_IoU"])
    pred_matched = np.concatenate(ap_meter["Pred_Matched"])
    confidence = np.concatenate(ap_meter["Confidence"])
    n_gt_inst = int(np.sum(ap_meter["N_GT_Inst"]))
    ap = calculate_AP(pred_matched, confidence, n_gt_inst)
    print("AveragePrecision@50:", ap)
    pq, f1, pre, rec = calculate_PQ_F1(pred_iou, pred_matched, n_gt_inst)
    print("PanopticQuality@50:", pq, "F1-score@50:", f1, "Prec@50:", pre, "Recall@50:", rec)
    print(eval_meter.get_mean_loss_dict())


if __name__ == "__main__":
    main()
