"""Flash-KNN kernel tests (interpret mode on CPU; the real-TPU path is
bitwise-identical modulo VPU vs interpreter float ordering and was
additionally validated on-chip — BENCHLOG r2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ogc_tpu import ops
from ogc_tpu.ops.pallas_knn import knn_blockmin, pick_block


def _recall(i_ref, i_new, k):
    hits = [
        len(set(np.asarray(i_ref[b, n]).tolist())
            & set(np.asarray(i_new[b, n]).tolist())) / k
        for b in range(i_ref.shape[0]) for n in range(0, i_ref.shape[1], 7)
    ]
    return float(np.mean(hits))


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    q = jnp.asarray(30 * rng.rand(2, 600, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(2, 1500, 3).astype(np.float32))
    return q, p


def test_recall_meets_block_bound(clouds):
    q, p = clouds
    k = 16
    _, i_ref = ops.knn(k, q, p, exact=True)
    _, i_new = knn_blockmin(k, q, p, blk=8, interpret=True)
    # E[missed]/k ~ (k-1)/(2*G) with G = ceil(1500/8) blocks.
    g = -(-1500 // 8)
    expected = 1.0 - (k - 1) / (2 * g)
    assert _recall(i_ref, i_new, k) >= expected - 0.02


def test_top1_always_exact(clouds):
    q, p = clouds
    for k in (1, 4, 16):
        _, i_ref = ops.knn(k, q, p, exact=True)
        _, i_new = knn_blockmin(k, q, p, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(i_ref[..., 0]), np.asarray(i_new[..., 0])
        )


def test_distances_match_selected_indices(clouds):
    """Returned dists must equal true distances of the returned indices up
    to the documented idx-bit truncation (2^-(23-idx_bits) relative)."""
    q, p = clouds
    d_new, i_new = knn_blockmin(8, q, p, blk=8, interpret=True)
    qn, pn = np.asarray(q), np.asarray(p)
    for b in range(2):
        for n in range(0, 600, 37):
            true = np.sqrt(
                ((qn[b, n] - pn[b, np.asarray(i_new[b, n])]) ** 2).sum(-1)
            )
            np.testing.assert_allclose(
                np.asarray(d_new[b, n]), true, rtol=2e-3
            )
            # ascending order
            assert (np.diff(np.asarray(d_new[b, n])) >= -1e-6).all()


def test_padding_edges():
    """M and N far from tile multiples; k close to the winner budget."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.rand(1, 70, 3).astype(np.float32))
    p = jnp.asarray(rng.rand(1, 1100, 3).astype(np.float32))
    d, i = knn_blockmin(16, q, p, blk=8, interpret=True)
    assert int(jnp.max(i)) < 1100  # pads never selected
    assert np.isfinite(np.asarray(d)).all()
    # distinct neighbors per query
    for n in range(70):
        assert len(set(np.asarray(i[0, n]).tolist())) == 16


def test_pick_block_bounds():
    assert pick_block(8192, 32) == 16
    assert pick_block(4096, 32) == 8
    assert pick_block(8192, 1) == 32
    assert pick_block(8192, 3, 0.99) == 32
