"""Segmentation evaluation metrics: AP@50 (COCO 101-point), PQ/F1/Pre/Rec,
Hungarian mIoU, Rand Index.

Parity port of the reference metrics/seg_metric.py protocols.  The per-scene
matching (`eval_segm`) is numpy (it runs on host over small K x K tables);
the mIoU/RI clustering metrics offer both a numpy path and an XLA path for
large batches.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def eval_segm(
    segm: np.ndarray, mask: np.ndarray, ignore_npoint_thresh: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Greedy IoU matching of predictions to GT for one scene.

    :param segm: (N,) GT instance ids.
    :param mask: (N, K) soft prediction.
    :return: (pred_iou, pred_matched, confidence, n_gt_inst) — per surviving
        prediction.  Reference: metrics/seg_metric.py:38-93, including the
        ignore-small-GT bookkeeping (FPs mostly overlapping ignored GT are
        dropped; intersected area is deducted from prediction sizes).
    """
    segm_pred = np.argmax(mask, axis=1)
    _, segm, gt_sizes = np.unique(segm, return_inverse=True, return_counts=True)
    pred_ids, segm_pred, pred_sizes = np.unique(
        segm_pred, return_inverse=True, return_counts=True
    )
    n_gt = gt_sizes.shape[0]
    n_pred = pred_sizes.shape[0]
    mask = mask[:, pred_ids]

    # Intersection table via bincount on joint labels (vectorized version of
    # the reference's double loop at seg_metric.py:56-59).
    joint = segm * n_pred + segm_pred
    intersection = np.bincount(joint, minlength=n_gt * n_pred).reshape(
        n_gt, n_pred
    ).astype(np.float64)

    ignore_gt = np.where(gt_sizes < ignore_npoint_thresh)[0]

    ignored_overlap = intersection[ignore_gt].sum(axis=0)
    invalid_pred = (ignored_overlap / pred_sizes) > 0.5
    pred_sizes = pred_sizes - ignored_overlap
    valid_pred = np.logical_and(pred_sizes > 0, ~invalid_pred)

    intersection = np.delete(intersection, ignore_gt, axis=0)
    gt_sizes = np.delete(gt_sizes, ignore_gt, axis=0)
    n_gt = gt_sizes.shape[0]

    intersection = intersection[:, valid_pred]
    pred_sizes = pred_sizes[valid_pred]
    mask = mask[:, valid_pred]
    n_pred = int(valid_pred.sum())

    # Confidence: mean soft score of the points assigned to each prediction.
    confidence = np.zeros(n_pred)
    kept = np.where(valid_pred)[0]
    for jj, j in enumerate(kept):
        confidence[jj] = float(np.mean(mask[segm_pred == j, jj]))

    union = gt_sizes[:, None] + pred_sizes[None, :] - intersection
    iou = intersection / union
    pred_iou = iou.max(axis=0) if n_gt > 0 else np.zeros(n_pred)
    pred_matched = (pred_iou >= 0.5).astype(float)
    return pred_iou, pred_matched, confidence, n_gt


def accumulate_eval_results(
    segm: np.ndarray, mask: np.ndarray, ignore_npoint_thresh: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Batch version of eval_segm (reference metrics/seg_metric.py:8-35).

    :param segm: (B, N); :param mask: (B, N, K).
    """
    segm = np.asarray(segm)
    mask = np.asarray(mask)
    ious, matched, confs, n_gt = [], [], [], 0
    for b in range(segm.shape[0]):
        i, m, c, n = eval_segm(segm[b], mask[b], ignore_npoint_thresh)
        ious.append(i)
        matched.append(m)
        confs.append(c)
        n_gt += n
    return (
        np.concatenate(ious) if ious else np.zeros(0),
        np.concatenate(matched) if matched else np.zeros(0),
        np.concatenate(confs) if confs else np.zeros(0),
        n_gt,
    )


def calculate_AP(
    pred_matched: np.ndarray,
    confidence: np.ndarray,
    n_gt_inst: int,
    eps: float = 1e-10,
) -> float:
    """MS-COCO 101-point AP (reference metrics/seg_metric.py:99-143)."""
    order = np.argsort(-confidence, kind="mergesort")
    matched = pred_matched[order]
    tp = np.cumsum(matched)
    fp = np.cumsum(1 - matched)
    precisions = tp / np.maximum(tp + fp, eps)
    recalls = tp / max(n_gt_inst, eps)
    precisions = precisions.tolist()
    recalls = recalls.tolist()

    # Monotone non-increasing precision envelope (right to left), mirroring
    # the reference's in-place loop (seg_metric.py:114-115).
    for i in range(len(precisions) - 1, 0, -1):
        precisions[i - 1] = max(precisions[i - 1], precisions[i])

    thresholds = np.linspace(0, 1, 101, endpoint=True)
    inds = np.searchsorted(recalls, thresholds, side="left")
    queried = np.zeros(len(thresholds))
    for rid, pid in enumerate(inds):
        if pid < len(precisions):
            queried[rid] = precisions[pid]
    return float(np.mean(queried))


def calculate_PQ_F1(
    pred_iou: np.ndarray,
    pred_matched: np.ndarray,
    n_gt_inst: int,
    eps: float = 1e-10,
) -> Tuple[float, float, float, float]:
    """Panoptic quality and F1/Pre/Rec at IoU 0.5
    (reference metrics/seg_metric.py:146-161)."""
    tp = pred_matched.sum()
    tp_iou = pred_iou[pred_matched > 0].sum()
    fp = pred_matched.shape[0] - tp
    fn = n_gt_inst - tp
    pq = tp_iou / max(tp + 0.5 * fp + 0.5 * fn, eps)
    pre = tp / max(tp + fp, eps)
    rec = tp / max(tp + fn, eps)
    f1 = (2 * pre * rec) / max(pre + rec, eps)
    return float(pq), float(f1), float(pre), float(rec)


def eval_segm_ignmask(
    segm: np.ndarray, mask: np.ndarray, ignore: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Per-point-ignore-mask variant of eval_segm.

    The reference's test_seg_waymo.py:11 imports a `seg_metric_ignmask`
    module that does NOT exist in the repo (latent defect, SURVEY §4); this
    implements the protocol it implies: points with ignore=1 contribute to no
    intersection/union, predictions mostly (>50%) inside the ignored region
    are dropped rather than counted as FPs, and GT instances are formed from
    non-ignored points only.

    :param segm: (N,) GT ids; :param mask: (N, K); :param ignore: (N,) 0/1.
    """
    segm_pred_raw = np.argmax(mask, axis=1)
    ignored = np.asarray(ignore).astype(bool)

    pred_ids, segm_pred, pred_sizes_all = np.unique(
        segm_pred_raw, return_inverse=True, return_counts=True
    )
    mask = mask[:, pred_ids]
    n_pred = pred_ids.shape[0]

    overlap = np.bincount(segm_pred[ignored], minlength=n_pred).astype(np.float64)
    invalid_pred = (overlap / pred_sizes_all) > 0.5

    keep = ~ignored
    segm_k = segm[keep]
    pred_k = segm_pred[keep]
    mask_k = mask[keep]

    _, segm_k, gt_sizes = np.unique(segm_k, return_inverse=True, return_counts=True)
    n_gt = gt_sizes.shape[0]
    pred_sizes = np.bincount(pred_k, minlength=n_pred).astype(np.float64)
    valid_pred = np.logical_and(pred_sizes > 0, ~invalid_pred)

    joint = segm_k * n_pred + pred_k
    intersection = np.bincount(joint, minlength=n_gt * n_pred).reshape(
        n_gt, n_pred
    ).astype(np.float64)

    intersection = intersection[:, valid_pred]
    pred_sizes = pred_sizes[valid_pred]
    mask_k = mask_k[:, valid_pred]
    kept_ids = np.where(valid_pred)[0]
    n_pred = int(valid_pred.sum())

    confidence = np.zeros(n_pred)
    for jj, j in enumerate(kept_ids):
        sel = pred_k == j
        confidence[jj] = float(np.mean(mask_k[sel, jj])) if sel.any() else 0.0

    union = gt_sizes[:, None] + pred_sizes[None, :] - intersection
    iou = intersection / np.maximum(union, 1e-10)
    pred_iou = iou.max(axis=0) if n_gt > 0 else np.zeros(n_pred)
    pred_matched = (pred_iou >= 0.5).astype(float)
    return pred_iou, pred_matched, confidence, n_gt


def accumulate_eval_results_ignmask(
    segm: np.ndarray, mask: np.ndarray, ignore: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Batch version of eval_segm_ignmask (the `seg_metric_ignmask`
    equivalent of metrics/seg_metric.py:8-35)."""
    segm = np.asarray(segm)
    mask = np.asarray(mask)
    ignore = np.asarray(ignore)
    ious, matched, confs, n_gt = [], [], [], 0
    for b in range(segm.shape[0]):
        i, m, c, n = eval_segm_ignmask(segm[b], mask[b], ignore[b])
        ious.append(i)
        matched.append(m)
        confs.append(c)
        n_gt += n
    return (
        np.concatenate(ious) if ious else np.zeros(0),
        np.concatenate(matched) if matched else np.zeros(0),
        np.concatenate(confs) if confs else np.zeros(0),
        n_gt,
    )


def clustering_metrics(
    mask: np.ndarray,
    segm: np.ndarray,
    spec: Sequence[str] = ("iou", "ri"),
    ignore_npoint_thresh: int = 0,
    ignore_mask: np.ndarray = None,
) -> Dict[str, List[float]]:
    """Hungarian mIoU and Rand Index per batch element.

    :param mask: (B, N, K) soft prediction (argmax-ed internally).
    :param segm: (B, N) GT ids starting at 0.
    Reference: ClusteringMetrics (metrics/seg_metric.py:167-243), including
    the ignore-small-GT masking and the matched-prefix mIoU protocol (only
    the first n_gt rows of the IoU confusion enter the assignment).
    """
    mask = np.asarray(mask)
    segm = np.asarray(segm)
    B = mask.shape[0]
    gt_segm = segm.reshape(B, -1)
    n_data = gt_segm.shape[-1]
    n_gt_segms = gt_segm.max(axis=1) + 1

    k = mask.shape[-1]
    pred = mask.reshape(B, -1, k).argmax(-1)  # (B, N)
    k = int(max(k, n_gt_segms.max()))

    pred_oh = np.eye(k, dtype=np.float32)[pred]
    gt_oh = np.eye(k, dtype=np.float32)[gt_segm]

    valid_point = None
    if ignore_mask is not None:
        valid_point = ~np.asarray(ignore_mask).reshape(B, -1).astype(bool)
        gt_oh[~valid_point] = 0
        pred_oh[~valid_point] = 0
    elif ignore_npoint_thresh > 0:
        segm_size = gt_oh.sum(1, keepdims=True)  # (B, 1, K)
        nonsmall = segm_size >= ignore_npoint_thresh
        valid_point = (gt_oh * nonsmall).sum(-1) > 0  # (B, N)
        gt_oh[~valid_point] = 0
        pred_oh[~valid_point] = 0

    out: Dict[str, List[float]] = {}

    inter = np.einsum("bng,bnp->bgp", gt_oh, pred_oh)
    if "iou" in spec:
        union = gt_oh.sum(1)[:, :, None] + pred_oh.sum(1)[:, None, :] - inter
        iou = inter / (union + 1e-8)
        # Hungarian mIoU over the whole batch in one native threaded LAP
        # call (ogc_tpu/native/lap.cpp; scipy fallback inside).  Each
        # scene's rectangular (n_real, K) profit matrix is zero-padded to
        # (K, K): dummy rows absorb leftover columns at zero profit, so the
        # real rows' assignment value — and hence the mean — equals the
        # rectangular optimum scipy computes (optimal value is unique even
        # when the argmax assignment is not).
        from ogc_tpu.native import lap_solve_batch

        lap_costs = np.zeros((B, k, k), np.float32)
        n_reals = []
        for b, n_gt in enumerate(n_gt_segms):
            conf = iou[b, :n_gt, :]
            if ignore_mask is None and ignore_npoint_thresh > 0:
                nonsmall_b = (gt_oh[b].sum(0) >= ignore_npoint_thresh)[:n_gt]
                conf = conf[nonsmall_b]
            n_reals.append(conf.shape[0])
            lap_costs[b, : conf.shape[0]] = conf
        cols = lap_solve_batch(lap_costs, maximize=True)
        out["iou"] = [
            float(np.mean(lap_costs[b, np.arange(nr), cols[b, :nr]]))
            if nr else 0.0
            for b, nr in enumerate(n_reals)
        ]

    if "ri" in spec:
        # Rand Index over ordered point pairs (diagonal included), via the
        # contingency table: agree = n^2 - S_g - S_p + 2*S_gp with
        # S_g = sum_g |g|^2, S_p = sum_p |p|^2, S_gp = sum_{g,p} C[g,p]^2.
        # Exactly equal to the pair-matrix formulation the reference builds
        # (metrics/seg_metric.py:236-241 — three NxN float matrices,
        # ~1.6 GB/scene at 8192 points) at O(N + K^2) memory.
        ris = []
        for b in range(B):
            g = gt_segm[b].reshape(-1)
            p = pred[b].reshape(-1)
            if valid_point is not None:
                sel = valid_point[b]
                g, p = g[sel], p[sel]
            n = g.size
            if n == 0:
                ris.append(float("nan"))
                continue
            cont = np.bincount(g * k + p, minlength=k * k).astype(np.float64)
            cont = cont.reshape(k, k)
            s_gp = float((cont**2).sum())
            s_g = float((cont.sum(1) ** 2).sum())
            s_p = float((cont.sum(0) ** 2).sum())
            ris.append((n * n - s_g - s_p + 2.0 * s_gp) / (n * n))
        out["ri"] = ris
    return out
