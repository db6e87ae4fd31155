"""One-hot-matmul grouping (ops/pallas_onehot.py): bit-exactness vs the
XLA gather path and exactness of the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogc_tpu.ops import core
from ogc_tpu.ops.pallas_onehot import (
    gather_rows_onehot,
    group_onehot,
    scatter_add_rows_onehot,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n,c", [(512, 10), (130, 3), (2048, 35)])
def test_gather_bit_equal(dtype, n, c):
    rng = np.random.RandomState(0)
    B, E = 2, 1337
    src = jnp.asarray(rng.randn(B, n, c)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, n, (B, E)).astype(np.int32))
    ref = jnp.take_along_axis(
        src, idx[..., None], axis=1, mode="clip")
    out = gather_rows_onehot(src, idx)
    assert out.dtype == dtype
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32)), (
        np.abs(np.asarray(out, np.float32)
               - np.asarray(ref, np.float32)).max())


def test_group_onehot_matches_group():
    rng = np.random.RandomState(1)
    B, N, C, M, S = 2, 512, 10, 256, 24
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    ref = core.group(src, idx)
    out = group_onehot(src, idx, N)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_scatter_matches_xla_scatter_add():
    rng = np.random.RandomState(2)
    B, N, C, E = 2, 300, 7, 4097
    idx = jnp.asarray(rng.randint(0, N, (B, E)).astype(np.int32))
    # Integer-valued floats: any correct accumulation order is bitwise
    # identical, so this pins VALUES not just tolerances.
    cot = jnp.asarray(
        rng.randint(-8, 9, (B, E, C)).astype(np.float32))
    ref = jnp.zeros((B, N, C)).at[
        jnp.arange(B)[:, None], idx].add(cot)
    out = scatter_add_rows_onehot(idx, cot, N)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_group_onehot_vjp_matches_autodiff():
    rng = np.random.RandomState(3)
    B, N, C, M, S = 2, 256, 5, 128, 9
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    cot = jnp.asarray(rng.randn(B, M, S, C).astype(np.float32))

    _, vjp_ref = jax.vjp(lambda s: core.group(s, idx), src)
    _, vjp_oh = jax.vjp(lambda s: group_onehot(s, idx, N), src)
    g_ref = np.asarray(vjp_ref(cot)[0])
    g_oh = np.asarray(vjp_oh(cot)[0])
    np.testing.assert_allclose(g_oh, g_ref, rtol=1e-6, atol=1e-6)


def test_group_onehot_bf16_roundtrip_dtype():
    rng = np.random.RandomState(4)
    B, N, C, M, S = 1, 128, 4, 64, 3
    src = jnp.asarray(rng.randn(B, N, C)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    out, vjp = jax.vjp(lambda s: group_onehot(s, idx, N), src)
    assert out.dtype == jnp.bfloat16
    g = vjp(jnp.ones_like(out))[0]
    assert g.dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# Block-sparse variant
# ---------------------------------------------------------------------------

def _coherent_idx(rng, B, M, S, N, width=300):
    """Morton-coherent-like table: targets near the query row index."""
    i = np.arange(M)[None, :, None]
    off = rng.randint(-width, width + 1, (B, M, S))
    return np.clip(i + off, 0, N - 1).astype(np.int32)


def test_blocksparse_matches_group_coherent():
    from ogc_tpu.ops.pallas_onehot import group_blocksparse

    rng = np.random.RandomState(5)
    B, N, C, M, S = 2, 1024, 10, 700, 7  # odd S exercises S-padding
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(_coherent_idx(rng, B, M, S, N))
    ref = core.group(src, idx)
    out = group_blocksparse(src, idx, N)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_blocksparse_overflow_falls_back_exactly():
    from ogc_tpu.ops.pallas_onehot import _BS_CAP, group_blocksparse

    rng = np.random.RandomState(6)
    B, N, C, M, S = 1, 8192, 4, 512, 16
    # Uniform-random targets: every tile touches ~all 64 blocks > CAP.
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
    assert N // 128 > _BS_CAP
    ref = core.group(src, idx)
    out = group_blocksparse(src, idx, N)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_blocksparse_vjp_matches_autodiff():
    from ogc_tpu.ops.pallas_onehot import group_blocksparse

    rng = np.random.RandomState(7)
    B, N, C, M, S = 2, 512, 6, 512, 8
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(_coherent_idx(rng, B, M, S, N, width=150))
    cot = jnp.asarray(rng.randn(B, M, S, C).astype(np.float32))
    _, vjp_ref = jax.vjp(lambda s: core.group(s, idx), src)
    _, vjp_bs = jax.vjp(lambda s: group_blocksparse(s, idx, N), src)
    # f32 accumulation ORDER differs from XLA's scatter (both are valid
    # fixed orders); the integer test below pins exactness of the sums.
    np.testing.assert_allclose(
        np.asarray(vjp_bs(cot)[0]), np.asarray(vjp_ref(cot)[0]),
        rtol=1e-5, atol=1e-4)


def _plain_group_shim(src, idx, n):
    B, M, S = idx.shape
    out = jnp.take_along_axis(
        src, idx.reshape(B, M * S, 1), axis=1, mode="clip")
    return out.reshape(B, M, S, src.shape[-1])


def test_blocksparse_vjp_integer_bitexact():
    from ogc_tpu.ops.pallas_onehot import group_blocksparse

    rng = np.random.RandomState(8)
    B, N, C, M, S = 1, 640, 5, 512, 6
    src = jnp.asarray(rng.randint(-4, 5, (B, N, C)).astype(np.float32))
    idx = jnp.asarray(_coherent_idx(rng, B, M, S, N, width=100))
    cot = jnp.asarray(rng.randint(-4, 5, (B, M, S, C)).astype(np.float32))
    _, vjp_bs = jax.vjp(lambda s: group_blocksparse(s, idx, N), src)
    ref = jnp.zeros((B, N, C)).at[
        jnp.arange(B)[:, None], idx.reshape(B, M * S)].add(
            cot.reshape(B, M * S, C))
    assert np.array_equal(np.asarray(vjp_bs(cot)[0]), np.asarray(ref))
