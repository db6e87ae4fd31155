"""Tests for the per-point-ignore metric variant (the reference's missing
seg_metric_ignmask module)."""

import numpy as np

from ogc_tpu.metrics.seg import (
    accumulate_eval_results_ignmask,
    clustering_metrics,
    eval_segm_ignmask,
)


def onehot(ids, k):
    return np.eye(k, dtype=np.float32)[ids]


def test_ignmask_perfect_prediction():
    rng = np.random.RandomState(0)
    segm = rng.randint(0, 3, size=80)
    mask = onehot(segm, 4)
    ignore = np.zeros(80, dtype=np.int32)
    iou, matched, conf, n_gt = eval_segm_ignmask(segm, mask, ignore)
    assert n_gt == 3
    np.testing.assert_allclose(iou, 1.0)


def test_ignmask_drops_predictions_inside_ignored():
    # Prediction A entirely inside the ignored region -> dropped, not an FP.
    segm = np.zeros(100, dtype=np.int64)
    ignore = np.zeros(100, dtype=np.int32)
    ignore[:40] = 1
    mask = np.zeros((100, 2), dtype=np.float32)
    mask[:40, 0] = 1.0
    mask[40:, 1] = 1.0
    iou, matched, conf, n_gt = eval_segm_ignmask(segm, mask, ignore)
    assert len(iou) == 1  # only prediction B survives
    np.testing.assert_allclose(iou, [1.0])
    assert n_gt == 1


def test_ignmask_points_excluded_from_iou():
    # GT object 0 spans 100 pts, 50 ignored.  Prediction covers only the
    # valid 50 -> perfect IoU on the valid region.
    segm = np.zeros(100, dtype=np.int64)
    ignore = np.zeros(100, dtype=np.int32)
    ignore[50:] = 1
    mask = np.zeros((100, 2), dtype=np.float32)
    mask[:50, 0] = 1.0
    mask[50:, 1] = 1.0  # this pred is 100% ignored -> dropped
    iou, matched, conf, n_gt = eval_segm_ignmask(segm, mask, ignore)
    np.testing.assert_allclose(iou, [1.0])


def test_ignmask_batch_and_clustering():
    rng = np.random.RandomState(1)
    segm = rng.randint(0, 3, size=(2, 60))
    mask = onehot(segm, 4)
    ignore = np.zeros((2, 60), dtype=np.int32)
    ignore[:, :10] = 1
    iou, matched, conf, n_gt = accumulate_eval_results_ignmask(segm, mask, ignore)
    np.testing.assert_allclose(iou, 1.0)

    cm = clustering_metrics(mask, segm, ignore_mask=ignore)
    np.testing.assert_allclose(cm["iou"], 1.0, atol=1e-6)
    np.testing.assert_allclose(cm["ri"], 1.0, atol=1e-6)
