"""Shape / structure tests for MaskFormer3D, mirroring the reference's
__main__ smoke checks (models/segnet_sapien.py:85-101)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ogc_tpu.models.segnet import MaskFormer3D


@pytest.fixture(scope="module")
def sapien_model():
    model = MaskFormer3D(
        n_slot=8,
        n_point=512,
        arch="sapien",
        n_transformer_layer=2,
        transformer_embed_dim=128,
    )
    pc = jnp.asarray(np.random.RandomState(0).randn(2, 512, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    return model, params, pc


def test_segnet_output_shape(sapien_model):
    model, params, pc = sapien_model
    mask = model.apply(params, pc, pc)
    assert mask.shape == (2, 512, 8)


def test_segnet_mask_is_softmax(sapien_model):
    model, params, pc = sapien_model
    mask = np.asarray(model.apply(params, pc, pc))
    np.testing.assert_allclose(mask.sum(-1), 1.0, atol=1e-5)
    assert (mask >= 0).all()


def test_segnet_jits_and_grads(sapien_model):
    model, params, pc = sapien_model

    @jax.jit
    def loss_fn(p):
        return jnp.sum(model.apply(p, pc, pc) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_segnet_kitti_arch():
    model = MaskFormer3D(
        n_slot=10, n_point=256, arch="kitti",
        n_transformer_layer=2, transformer_embed_dim=128,
    )
    pc = jnp.asarray(np.random.RandomState(1).randn(1, 256, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    mask = model.apply(params, pc, pc)
    assert mask.shape == (1, 256, 10)


def test_segnet_param_count_sapien(sapien_model):
    # Analytical parameter count of the reference sapien config
    # (segnet_sapien.py: SA 287,488 + MF head 382,464 + object_mlp 24,896).
    model, params, _ = sapien_model
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n == 694848, n


def test_segnet_split_grouped_dense_bf16_close_to_f32():
    """bf16 compute routes SA groupings through the SOURCE-PROJECTED path
    (first Dense of every scale applied to the source points before one
    concatenated narrow gather); masks must stay close to the f32 forward
    and the param tree unchanged."""
    import numpy as np

    from ogc_tpu.nn.layers import set_compute_dtype

    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32))
    m = MaskFormer3D(n_slot=8, n_point=512, arch="sapien")
    p32 = m.init(jax.random.PRNGKey(0), pc, pc)
    ref = m.apply(p32, pc, pc)
    set_compute_dtype(jnp.bfloat16)
    try:
        p16 = m.init(jax.random.PRNGKey(0), pc, pc)
        assert jax.tree_util.tree_structure(p32) == \
            jax.tree_util.tree_structure(p16)
        assert jax.tree_util.tree_map(lambda a: a.shape, p32) == \
            jax.tree_util.tree_map(lambda a: a.shape, p16)
        out = m.apply(p32, pc, pc)               # eval: source-projected fold
        out_tr = m.apply(p32, pc, pc, train=True)  # train: raw-gather split
    finally:
        set_compute_dtype(None)
    for o in (out, out_tr):
        d = np.abs(np.asarray(o) - np.asarray(ref))
        assert d.max() < 0.35 and d.mean() < 0.01, (d.max(), d.mean())


def test_eval_fold_matches_reference_shape(monkeypatch):
    """f32 EVAL fold (source-projected grouping, r4) vs the reference-
    shaped chain: same math by linearity, differs only by matmul
    reassociation.  Bound the deviation tightly — this is the parity-mode
    eval path."""
    import os

    import numpy as np

    from ogc_tpu.models.segnet import MaskFormer3D

    rng = np.random.RandomState(0)
    pc = jnp.asarray(30 * rng.rand(2, 512, 3).astype(np.float32))
    model = MaskFormer3D(n_slot=8, n_point=512, arch="sapien",
                         n_transformer_layer=2, transformer_embed_dim=128)
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    monkeypatch.setenv("OGC_EVAL_FOLD", "off")
    ref = np.asarray(model.apply(params, pc, pc))
    monkeypatch.setenv("OGC_EVAL_FOLD", "on")
    fold = np.asarray(model.apply(params, pc, pc))
    np.testing.assert_allclose(fold, ref, atol=5e-5)
