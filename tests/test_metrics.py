"""Golden tests for segmentation / flow metrics."""

import numpy as np

from ogc_tpu.metrics.seg import (
    accumulate_eval_results,
    calculate_AP,
    calculate_PQ_F1,
    clustering_metrics,
    eval_segm,
)
from ogc_tpu.metrics.flow import eval_flow


def onehot(ids, k):
    return np.eye(k, dtype=np.float32)[ids]


def test_perfect_prediction_all_metrics_one():
    rng = np.random.RandomState(0)
    segm = rng.randint(0, 4, size=(2, 200))
    mask = onehot(segm, 6)
    iou, matched, conf, n_gt = accumulate_eval_results(segm, mask)
    assert n_gt == 8
    np.testing.assert_allclose(iou, 1.0)
    np.testing.assert_allclose(matched, 1.0)
    ap = calculate_AP(matched, conf, n_gt)
    assert ap > 0.99
    pq, f1, pre, rec = calculate_PQ_F1(iou, matched, n_gt)
    np.testing.assert_allclose([pq, f1, pre, rec], 1.0, atol=1e-6)
    cm = clustering_metrics(mask, segm)
    np.testing.assert_allclose(cm["iou"], 1.0, atol=1e-6)
    np.testing.assert_allclose(cm["ri"], 1.0, atol=1e-6)


def test_eval_segm_half_overlap():
    # 1 GT object of 100 points; prediction splits it 50/50 -> each pred has
    # IoU 0.5 vs GT; matched at the >= 0.5 threshold.
    segm = np.zeros(100, dtype=np.int64)
    pred = np.zeros((100, 2), dtype=np.float32)
    pred[:50, 0] = 1.0
    pred[50:, 1] = 1.0
    iou, matched, conf, n_gt = eval_segm(segm, pred)
    assert n_gt == 1
    np.testing.assert_allclose(iou, [0.5, 0.5])
    np.testing.assert_allclose(matched, [1.0, 1.0])
    pq, f1, pre, rec = calculate_PQ_F1(iou, matched, n_gt)
    # TP=2, FP=0, FN=-1... reference semantics: FN = n_gt - TP = -1, so this
    # checks the formula verbatim: PQ = 1.0 / (2 + 0.5*0 + 0.5*(-1)) = 2/3.
    np.testing.assert_allclose(pq, 1.0 / 1.5, atol=1e-6)


def test_eval_segm_ignore_small_gt():
    # GT: object0 = 10 points (ignored at thresh 20), object1 = 80 points.
    segm = np.concatenate([np.zeros(10), np.ones(80)]).astype(np.int64)
    # Prediction A covers exactly the ignored object; prediction B the rest.
    pred = np.zeros((90, 2), dtype=np.float32)
    pred[:10, 0] = 1.0
    pred[10:, 1] = 1.0
    iou, matched, conf, n_gt = eval_segm(segm, pred, ignore_npoint_thresh=20)
    assert n_gt == 1  # the small GT object is ignored
    # Pred A is mostly (100%) inside ignored GT -> dropped, not an FP.
    assert len(iou) == 1
    np.testing.assert_allclose(iou, [1.0])


def test_calculate_ap_half_confidence_ordering():
    # Two predictions: high-confidence match, low-confidence miss.
    matched = np.array([1.0, 0.0])
    conf = np.array([0.9, 0.1])
    ap = calculate_AP(matched, conf, n_gt_inst=1)
    assert ap > 0.99  # recall 1.0 reached at precision 1.0
    # Reversed confidences: the miss comes first, halving precision.
    ap2 = calculate_AP(matched, np.array([0.1, 0.9]), n_gt_inst=1)
    assert ap2 < 0.6


def test_clustering_metrics_known_values():
    # 2 GT objects of 50/50; prediction merges everything into one cluster.
    segm = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.int64)[None]
    mask = np.zeros((1, 100, 2), dtype=np.float32)
    mask[..., 0] = 1.0
    cm = clustering_metrics(mask, segm)
    # IoU: object0 matched to cluster0 (iou .5), object1 to cluster1 (iou 0).
    np.testing.assert_allclose(cm["iou"], [0.25], atol=1e-6)
    # RI: same-pair agreement = pairs within each GT object (2 * 50*50 out of
    # 100*100 disagree -> 1 - 0.5 = 0.5)
    np.testing.assert_allclose(cm["ri"], [0.5], atol=1e-6)


def test_eval_flow_golden():
    gt = np.zeros((1, 4, 3))
    gt[0, :, 0] = 1.0  # unit flows
    pred = gt.copy()
    pred[0, 0, 0] = 1.04  # epe .04 < .05 strict
    pred[0, 1, 0] = 1.08  # epe .08: relax only (< .1)
    pred[0, 2, 0] = 1.2  # epe .2: rel err .2 > .1 -> outlier
    pred[0, 3, 0] = 1.5  # epe .5 > 6*.05 -> outlier
    epe, acc_s, acc_r, outlier = eval_flow(gt, pred, epe_norm_thresh=0.05)
    np.testing.assert_allclose(epe, (0.04 + 0.08 + 0.2 + 0.5) / 4, atol=1e-6)
    np.testing.assert_allclose(acc_s, 0.25)
    np.testing.assert_allclose(acc_r, 0.5)
    np.testing.assert_allclose(outlier, 0.5)


def test_ri_contingency_matches_pair_matrix_oracle():
    """The O(N) contingency-table RI must equal the reference's O(N^2)
    pair-matrix formulation exactly, with and without ignore handling."""
    rng = np.random.RandomState(7)
    B, N, K = 3, 200, 5
    segm = rng.randint(0, K, size=(B, N))
    mask = rng.rand(B, N, K).astype(np.float32)

    def oracle(mask, gt_segm, ignore_mask=None, thresh=0):
        pred = np.asarray(mask).argmax(-1)
        k = max(int(pred.max()), int(gt_segm.max())) + 1
        pred_oh = np.eye(k, dtype=np.float32)[pred]
        gt_oh = np.eye(k, dtype=np.float32)[gt_segm]
        valid = None
        if ignore_mask is not None:
            valid = ~ignore_mask.astype(bool)
            gt_oh[~valid] = 0
            pred_oh[~valid] = 0
        elif thresh > 0:
            size = gt_oh.sum(1, keepdims=True)
            valid = (gt_oh * (size >= thresh)).sum(-1) > 0
            gt_oh[~valid] = 0
            pred_oh[~valid] = 0
        ri_gt = np.einsum("bnk,bmk->bnm", gt_oh, gt_oh)
        ri_pd = np.einsum("bnk,bmk->bnm", pred_oh, pred_oh)
        agree = (ri_gt == ri_pd).astype(np.float64)
        if valid is not None:
            vp = valid.astype(np.float64)
            vm = vp[:, :, None] * vp[:, None, :]
            return (vm * agree).sum((1, 2)) / vm.sum((1, 2))
        return agree.sum((1, 2)) / (gt_segm.shape[-1] ** 2)

    got = clustering_metrics(mask, segm, spec=["ri"])["ri"]
    np.testing.assert_allclose(got, oracle(mask, segm), rtol=1e-12)

    got_t = clustering_metrics(mask, segm, spec=["ri"],
                               ignore_npoint_thresh=30)["ri"]
    np.testing.assert_allclose(got_t, oracle(mask, segm, thresh=30),
                               rtol=1e-12)

    ign = rng.rand(B, N) > 0.7
    got_i = clustering_metrics(mask, segm, spec=["ri"],
                               ignore_mask=ign)["ri"]
    np.testing.assert_allclose(got_i, oracle(mask, segm, ignore_mask=ign),
                               rtol=1e-12)
