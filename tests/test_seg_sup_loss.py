"""Supervised mask loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ogc_tpu.losses.seg_sup import (
    SupLossConfig,
    ce_loss,
    dice_loss,
    supervised_mask_loss,
)


def test_perfect_prediction_near_zero_loss():
    rng = np.random.RandomState(0)
    segm = rng.randint(0, 4, size=(2, 60))
    gt = jnp.asarray(np.eye(4, dtype=np.float32)[segm])
    pred = jnp.clip(gt, 0.001, 0.999)
    loss, d = supervised_mask_loss(pred, gt)
    assert float(d["dice"]) < 0.05
    assert float(loss) < 0.2


def test_permuted_prediction_matched():
    # Prediction = GT with channels permuted: Hungarian must align them.
    rng = np.random.RandomState(1)
    segm = rng.randint(0, 4, size=(2, 60))
    gt = np.eye(4, dtype=np.float32)[segm]
    perm = [2, 3, 1, 0]
    pred = jnp.clip(jnp.asarray(gt[..., perm]), 0.001, 0.999)
    loss_p, _ = supervised_mask_loss(pred, jnp.asarray(gt))
    loss_id, _ = supervised_mask_loss(
        jnp.clip(jnp.asarray(gt), 0.001, 0.999), jnp.asarray(gt)
    )
    np.testing.assert_allclose(float(loss_p), float(loss_id), rtol=1e-4)


def test_valid_mask_excludes_points():
    rng = np.random.RandomState(2)
    segm = rng.randint(0, 3, size=(1, 40))
    gt = np.eye(3, dtype=np.float32)[segm]
    pred = np.clip(gt.copy(), 0.01, 0.99)
    pred[0, :10] = 1.0 / 3  # corrupt first 10 points
    pred = jnp.asarray(pred)
    valid_all = jnp.ones((1, 40))
    valid_cut = jnp.asarray(np.concatenate([np.zeros((1, 10)), np.ones((1, 30))], 1))
    l_all = float(ce_loss(pred, jnp.asarray(gt), valid_all))
    l_cut = float(ce_loss(pred, jnp.asarray(gt), valid_cut))
    assert l_cut < l_all


def test_grad_flows():
    rng = np.random.RandomState(3)
    segm = rng.randint(0, 3, size=(1, 40))
    gt = jnp.asarray(np.eye(3, dtype=np.float32)[segm])
    logits = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))

    def f(lg):
        loss, _ = supervised_mask_loss(jax.nn.softmax(lg, -1), gt)
        return loss

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_focal_variant_runs():
    rng = np.random.RandomState(4)
    segm = rng.randint(0, 3, size=(1, 40))
    gt = jnp.asarray(np.eye(3, dtype=np.float32)[segm])
    pred = jax.nn.softmax(jnp.asarray(rng.randn(1, 40, 3).astype(np.float32)), -1)
    loss, d = supervised_mask_loss(pred, gt, cfg=SupLossConfig(use_focal=True))
    assert np.isfinite(float(loss))
