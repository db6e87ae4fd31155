"""Bitonic-extraction flash-KNN: the partial bitonic top-k must return
EXACTLY what the iterative masked-min extraction returns (same packed keys
=> same k-smallest walk), at a fraction of the VPU op count.  On-chip A/B
decides the default; these tests pin correctness on CPU/interpret."""

import numpy as np
import jax.numpy as jnp
import pytest

from ogc_tpu.ops.pallas_knn import (
    _BALL_INVALID,
    _bitonic_smallest,
    ball_query_blockmin,
    knn_blockmin,
)


@pytest.mark.parametrize("g,k", [(32, 16), (64, 32), (256, 16), (2048, 32),
                                 (64, 5), (16, 16), (8, 1)])
def test_bitonic_smallest_matches_sort(g, k):
    rng = np.random.RandomState(g + k)
    keys = rng.randint(-(2**31), 2**31 - 1, size=(g, 24), dtype=np.int64)
    keys = jnp.asarray(keys.astype(np.int32))
    out = np.asarray(_bitonic_smallest(keys, k))
    ref = np.sort(np.asarray(keys), axis=0)[:k]
    np.testing.assert_array_equal(out, ref)


def test_bitonic_smallest_duplicates():
    rng = np.random.RandomState(7)
    keys = jnp.asarray(rng.randint(0, 5, size=(128, 16)).astype(np.int32))
    out = np.asarray(_bitonic_smallest(keys, 8))
    ref = np.sort(np.asarray(keys), axis=0)[:8]
    np.testing.assert_array_equal(out, ref)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(3)
    q = jnp.asarray(30 * rng.rand(2, 600, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(2, 1500, 3).astype(np.float32))
    return q, p


@pytest.mark.parametrize("k,blk", [(16, 8), (32, 4), (5, 8)])
def test_knn_extract_equivalence(clouds, k, blk):
    """Bit-identical (dist, idx) between the two extraction schemes: the
    packed keys are unique, so both walk the same exact sorted order."""
    q, p = clouds
    d_it, i_it = knn_blockmin(k, q, p, blk=blk, interpret=True,
                              extract="iter")
    d_bt, i_bt = knn_blockmin(k, q, p, blk=blk, interpret=True,
                              extract="bitonic")
    np.testing.assert_array_equal(np.asarray(i_it), np.asarray(i_bt))
    np.testing.assert_array_equal(np.asarray(d_it), np.asarray(d_bt))


def test_knn_extract_equivalence_nonpow2_rows(clouds):
    """M -> Mp=3072 with blk=4 gives 768 key rows (not a power of two):
    the kernel pads the scratch to 1024 with INT32_MAX rows."""
    rng = np.random.RandomState(11)
    q = jnp.asarray(30 * rng.rand(1, 512, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(1, 2900, 3).astype(np.float32))
    d_it, i_it = knn_blockmin(9, q, p, blk=4, interpret=True, extract="iter")
    d_bt, i_bt = knn_blockmin(9, q, p, blk=4, interpret=True,
                              extract="bitonic")
    np.testing.assert_array_equal(np.asarray(i_it), np.asarray(i_bt))
    np.testing.assert_array_equal(np.asarray(d_it), np.asarray(d_bt))


def test_mxu_d2_quality(clouds):
    """The expanded |p|^2+|q|^2-2pq form (MXU arm) carries cancellation
    error near zero, so it is NOT bit-equal to the direct form — but on
    non-degenerate clouds it must keep top-1 exact and full top-k equal
    away from ties."""
    from ogc_tpu import ops

    q, p = clouds
    k = 16
    _, i_ref = ops.knn(k, q, p, exact=True)
    d_mx, i_mx = knn_blockmin(k, q, p, blk=8, interpret=True, d2_mode="mxu")
    np.testing.assert_array_equal(
        np.asarray(i_ref[..., 0]), np.asarray(i_mx[..., 0])
    )
    d_vp, i_vp = knn_blockmin(k, q, p, blk=8, interpret=True, d2_mode="vpu")
    # Same neighbor SETS except where two candidates are within the
    # cancellation band (none expected on these random clouds).
    assert (np.asarray(i_mx) == np.asarray(i_vp)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(d_mx), np.asarray(d_vp),
                               rtol=3e-3, atol=1e-3)


def test_mxu_d2_scene_scale():
    """30 m KITTI-scale coordinates: the cancellation-band analysis in
    _D2_ENV's comment predicts ~5e-4 m^2 absolute d2 error; distances of
    selected neighbors must still track the true geometry."""
    rng = np.random.RandomState(5)
    q = jnp.asarray(30 * rng.rand(1, 512, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(1, 2048, 3).astype(np.float32))
    d_mx, i_mx = knn_blockmin(8, q, p, blk=8, interpret=True,
                              d2_mode="mxu", extract="bitonic")
    qn, pn = np.asarray(q), np.asarray(p)
    for n in range(0, 512, 29):
        true = np.sqrt(
            ((qn[0, n] - pn[0, np.asarray(i_mx[0, n])]) ** 2).sum(-1)
        )
        np.testing.assert_allclose(np.asarray(d_mx[0, n]), true,
                                   rtol=3e-3, atol=2e-3)


def test_ball_extract_equivalence(clouds):
    """Ball mode: identical in-radius prefixes; past the in-radius count
    the schemes differ only in WHICH >=_BALL_INVALID sentinel fills."""
    q, p = clouds
    c_it = np.asarray(ball_query_blockmin(0.8, 16, p, q, blk=8,
                                          interpret=True, extract="iter"))
    c_bt = np.asarray(ball_query_blockmin(0.8, 16, p, q, blk=8,
                                          interpret=True, extract="bitonic"))
    np.testing.assert_array_equal(
        np.minimum(c_it, _BALL_INVALID), np.minimum(c_bt, _BALL_INVALID)
    )
