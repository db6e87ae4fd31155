"""Pallas VMEM-accumulator scatter-add (the fast group() backward)."""

import numpy as np
import jax
import jax.numpy as jnp

from ogc_tpu import ops
from ogc_tpu.ops.pallas_scatter import scatter_add_rows


def _ref_scatter(idx, g, n_dest):
    B, R = idx.shape
    out = np.zeros((B, n_dest, g.shape[-1]), np.float32)
    for b in range(B):
        np.add.at(out[b], idx[b], g[b])
    return out


def test_scatter_add_rows_matches_numpy():
    rng = np.random.RandomState(0)
    B, R, N, C = 2, 4096, 512, 10
    idx = rng.randint(0, N, size=(B, R)).astype(np.int32)
    g = rng.randn(B, R, C).astype(np.float32)
    out = np.asarray(scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), N))
    np.testing.assert_allclose(out, _ref_scatter(idx, g, N), rtol=1e-5,
                               atol=1e-5)


def test_scatter_add_rows_pads_non_tile_rows():
    rng = np.random.RandomState(1)
    B, R, N, C = 1, 3000, 256, 4  # R not a multiple of the 2048 tile
    idx = rng.randint(0, N, size=(B, R)).astype(np.int32)
    g = rng.randn(B, R, C).astype(np.float32)
    out = np.asarray(scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), N))
    np.testing.assert_allclose(out, _ref_scatter(idx, g, N), rtol=1e-5,
                               atol=1e-5)


def test_group_fast_backward_matches_plain():
    """The custom-vjp group backward (Pallas scatter) must equal the plain
    autodiff scatter-add."""
    from ogc_tpu.ops import core

    rng = np.random.RandomState(2)
    B, N, M, S, C = 2, 256, 128, 8, 10
    points = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, M, S)).astype(np.int32))

    def loss_fast(p):
        return jnp.sum(jnp.sin(core._group_fast_bwd(p, idx, N)))

    def loss_plain(p):
        return jnp.sum(jnp.sin(core._group_plain(p, idx)))

    g_fast = jax.grad(loss_fast)(points)
    g_plain = jax.grad(loss_plain)(points)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)
    # Forward values identical.
    np.testing.assert_array_equal(
        np.asarray(core._group_fast_bwd(points, idx, N)),
        np.asarray(core._group_plain(points, idx)),
    )
