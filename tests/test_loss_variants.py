"""Waymo 1-frame loss variant + finite-gradient guard tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ogc_tpu.losses.seg_unsup import OGCLossConfig, ogc_loss
from ogc_tpu.train.seg import make_optimizer


def _rand_frames(rng, n_frames, n=48, k=3):
    pcs = [jnp.asarray(rng.rand(2, n, 3).astype(np.float32)) for _ in range(n_frames)]
    masks = [
        jax.nn.softmax(jnp.asarray(rng.randn(2, n, k).astype(np.float32)), -1)
        for _ in range(n_frames)
    ]
    flows = [jnp.asarray(0.1 * rng.randn(2, n, 3).astype(np.float32))
             for _ in range(n_frames)]
    return pcs, masks, flows


def test_single_frame_loss():
    # Waymo non-aug: 1 frame, no invariance (train_seg_waymo.py:265-334).
    rng = np.random.RandomState(0)
    pcs, masks, flows = _rand_frames(rng, 1)
    total, d = ogc_loss(pcs, masks, flows, OGCLossConfig())
    assert np.isfinite(float(total))
    assert float(d["invariance"]) == 0.0


def test_two_frame_aug_pairs_invariance():
    # Waymo aug: 2 frames = (original, augmented copy); invariance pairs (0,1).
    rng = np.random.RandomState(1)
    pcs, masks, flows = _rand_frames(rng, 2)
    # identical masks in the two views -> invariance 0
    masks[1] = masks[0]
    total, d = ogc_loss(pcs, masks, flows, OGCLossConfig(), aug_transform=True)
    assert float(d["invariance"]) < 1e-5

    masks2 = [masks[0], jax.nn.softmax(
        jnp.asarray(5 * rng.randn(2, 48, 3).astype(np.float32)), -1)]
    _, d2 = ogc_loss(pcs, masks2, flows, OGCLossConfig(), aug_transform=True)
    assert float(d2["invariance"]) > 1e-3


def test_four_frame_aug_pairs():
    # Standard aug: 4 frames, pairs (0,2),(1,3) (losses/seg_loss_unsup.py:383).
    rng = np.random.RandomState(2)
    pcs, masks, flows = _rand_frames(rng, 4)
    masks[2] = masks[0]
    masks[3] = masks[1]
    _, d = ogc_loss(pcs, masks, flows, OGCLossConfig(), aug_transform=True)
    assert float(d["invariance"]) < 1e-5


def test_finite_grad_guard_skips_nan_updates():
    # The optimizer must skip updates when gradients are non-finite
    # (the reference's backward guard, train_seg.py:76-84).
    opt = make_optimizer(1e-3, 0.7, 1e-5, 200000, 2)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)

    bad_grads = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
    updates, state = opt.update(bad_grads, state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new_params["w"]), np.ones(3))

    good_grads = {"w": jnp.ones((3,))}
    updates, state = opt.update(good_grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new_params["w"]), np.ones(3))


def test_flow_smooth_symmetric_grad_finite_and_same_forward():
    """flow smooth with symmetric_smooth_grad: identical forward value,
    finite scatter-free gradient."""
    import jax
    import jax.numpy as jnp
    from ogc_tpu.losses.flow_unsup import FlowLossConfig, flow_smooth_loss

    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    flow = jnp.asarray(0.1 * rng.randn(2, 96, 3).astype(np.float32))
    cfg_a = FlowLossConfig()
    cfg_s = FlowLossConfig(symmetric_smooth_grad=True)
    la = float(flow_smooth_loss(pc, flow, cfg_a))
    ls = float(flow_smooth_loss(pc, flow, cfg_s))
    np.testing.assert_allclose(la, ls, rtol=1e-6)
    g = jax.grad(lambda f: flow_smooth_loss(pc, f, cfg_s))(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
