"""Row-group pool kernel vs numpy oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ogc_tpu.ops.pallas_pool import rowgroup_pool, supported


def oracle(x, scale, add, s, relu, mean):
    n, c = x.shape[0] // s, x.shape[1]
    y = x.astype(np.float32).reshape(n, s, c) * scale.astype(np.float32)
    y = y + add.astype(np.float32)[:, None, :]
    if relu:
        y = np.maximum(y, 0.0)
    return y.mean(axis=1) if mean else y.max(axis=1)


@pytest.mark.parametrize("s,c", [(4, 128), (8, 64), (16, 32), (32, 128),
                                 (32, 16), (16, 256), (64, 64)])
@pytest.mark.parametrize("relu,mean", [(True, False), (False, False),
                                       (True, True)])
def test_rowgroup_pool_matches_oracle(s, c, relu, mean):
    rng = np.random.RandomState(0)
    n_groups = 512
    x = rng.randn(n_groups * s, c).astype(np.float32)
    scale = rng.rand(c).astype(np.float32) + 0.5
    add = rng.randn(n_groups, c).astype(np.float32)
    assert supported(n_groups, s, c)
    got = rowgroup_pool(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(add), s,
        relu=relu, mean=mean, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), oracle(x, scale, add, s, relu, mean),
        rtol=1e-5, atol=1e-5,
    )


def test_rowgroup_pool_bf16_rows():
    rng = np.random.RandomState(1)
    s, c, n_groups = 32, 32, 256
    x = rng.randn(n_groups * s, c).astype(np.float32)
    scale = np.ones(c, np.float32)
    add = rng.randn(n_groups, c).astype(np.float32)
    got = rowgroup_pool(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(scale),
        jnp.asarray(add).astype(jnp.bfloat16), s, interpret=True,
        out_dtype=jnp.float32,
    )
    want = oracle(
        np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)),
        scale,
        np.asarray(jnp.asarray(add).astype(jnp.bfloat16).astype(jnp.float32)),
        s, True, False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_rowgroup_pool_broadcast_add():
    rng = np.random.RandomState(2)
    s, c, n_groups = 8, 128, 128
    x = rng.randn(n_groups * s, c).astype(np.float32)
    scale = rng.rand(c).astype(np.float32)
    add1 = rng.randn(1, c).astype(np.float32)
    got = rowgroup_pool(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(add1), s,
        interpret=True,
    )
    want = oracle(x, scale, np.broadcast_to(add1, (n_groups, c)), s,
                  True, False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pool_neighbors_affine_fold_matches_bn_chain():
    """pool_neighbors(scale=k, add=b, relu=True) == eval-BatchNorm-apply +
    relu + reduce — the classic inference BN fold the flow stacks use on
    their last layer (nn/flowstep3d.py _fold_norm_pool)."""
    from ogc_tpu.ops.pallas_pool import pool_neighbors

    rng = np.random.RandomState(3)
    b, m, s, c = 2, 64, 8, 32
    x = jnp.asarray(rng.randn(b, m, s, c).astype(np.float32))
    mean = rng.randn(c).astype(np.float32)
    var = rng.rand(c).astype(np.float32) + 0.3
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    eps = 1e-5

    ref = np.maximum(
        (np.asarray(x) - mean) / np.sqrt(var + eps) * scale + bias, 0.0
    )
    k = jnp.asarray(scale / np.sqrt(var + eps))
    bb = jnp.asarray(bias - mean * (scale / np.sqrt(var + eps)))
    for mn in (False, True):
        want = ref.mean(axis=2) if mn else ref.max(axis=2)
        got = pool_neighbors(x, mean=mn, differentiable=False,
                             scale=k, add=bb, relu=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5)


def test_pool_neighbors_pergroup_add():
    """Per-group (B, M, C) add — the source-projected center term of the
    single-layer fold path (GRU gates)."""
    from ogc_tpu.ops.pallas_pool import pool_neighbors

    rng = np.random.RandomState(4)
    b, m, s, c = 2, 32, 4, 16
    x = jnp.asarray(rng.randn(b, m, s, c).astype(np.float32))
    add = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    want = (np.asarray(x) + np.asarray(add)[:, :, None, :]).max(axis=2)
    got = pool_neighbors(x, differentiable=False, add=add, relu=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_model_eval_kernel_glue_matches_fallback(monkeypatch):
    """OGC_PALLAS_POOL=interpret routes the REAL eval forwards through the
    kernel (interpret mode) — catches model->kernel glue bugs (group-major
    reshape, add layout, BN-fold wiring) the fallback path can't see."""
    import jax

    from ogc_tpu.nn.flowstep3d import FlowSAModule

    rng = np.random.RandomState(5)
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))

    # Multi-layer BN stack (exercises the last-layer BN-affine fold) and a
    # single-layer no-act stack (the GRU-gate shape).
    for kwargs in (
        dict(npoint=32, nsample=8, mlp=(16, 32), radius=None),
        dict(npoint=32, nsample=8, mlp=(16,), use_act=False, radius=None),
    ):
        m = FlowSAModule(**kwargs)
        v = m.init(jax.random.PRNGKey(0), xyz, feat)
        # Perturb running stats so the eval BN affine is non-trivial.
        import flax

        v = flax.core.unfreeze(v)
        if "batch_stats" in v:  # absent for the no-act single-layer stack
            v["batch_stats"] = jax.tree_util.tree_map(
                lambda a: a + 0.3 * jnp.abs(jnp.asarray(
                    np.random.RandomState(9).randn(*a.shape), a.dtype)),
                v["batch_stats"],
            )
        monkeypatch.delenv("OGC_PALLAS_POOL", raising=False)
        _, ref, _ = m.apply(v, xyz, feat, train=False)
        monkeypatch.setenv("OGC_PALLAS_POOL", "interpret")
        _, got, _ = m.apply(v, xyz, feat, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
        )


def test_supported_gates():
    assert not supported(512, 24, 128)   # non-power-of-two S
    assert not supported(512, 1, 128)
    assert supported(16384, 32, 32)
    assert supported(2048 * 8, 4, 128)
