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


def test_ball_mode_invariants():
    """Ball-mode kernel: structural parity with the exact ball query —
    empty balls zero, first slot = lowest in-radius index, padding repeats
    the first index, all indices in range and in-radius."""
    from ogc_tpu.ops.core import _fill_balls
    from ogc_tpu.ops.pallas_knn import ball_query_blockmin

    rng = np.random.RandomState(0)
    B, N, M, k, r = 2, 1500, 600, 16, 0.15
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    cand = ball_query_blockmin(r, k, xyz, ctr, blk=4, interpret=True)
    got = np.asarray(_fill_balls(cand, k))

    d2 = np.asarray(ops.square_distance(ctr, xyz))
    inside = d2 < r * r
    cnt = inside.sum(-1)
    assert (got[cnt == 0] == 0).all()
    first_true = np.where(inside, np.arange(N)[None, None], N).min(-1)
    nonempty = cnt > 0
    np.testing.assert_array_equal(got[nonempty][:, 0], first_true[nonempty])
    # Every returned index is genuinely in radius (for non-empty balls).
    bb, mm = np.nonzero(nonempty)
    sel = inside[bb[:, None], mm[:, None], got[nonempty]]
    assert sel.all()
    # Padded slots repeat the first index when fewer than k inside.
    few = (cnt > 0) & (cnt < k)
    rows = got[few]
    counts = np.minimum(cnt[few], k)
    for row, c in zip(rows, counts):
        assert (row[c:] == row[0]).all()


def test_ball_mode_crowded_is_block_stratified():
    """Documented deviation: an all-inside ball returns one index per
    block (0, blk, 2*blk, ...), not the reference's first consecutive
    nsample — codified so a change in this behavior is noticed."""
    from ogc_tpu.ops.core import _fill_balls
    from ogc_tpu.ops.pallas_knn import ball_query_blockmin

    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.rand(1, 1100, 3).astype(np.float32))
    ctr = xyz[:, :8]
    cand = ball_query_blockmin(100.0, 8, xyz, ctr, blk=8, interpret=True)
    got = np.asarray(_fill_balls(cand, 8))
    np.testing.assert_array_equal(
        got, np.broadcast_to(np.arange(8) * 8, (1, 8, 8))
    )


# ---------------------------------------------------------------------------
# Candidate-pruned KNN (experimental, opt-in — see BENCHLOG "KNN candidate
# pruning": extraction-bound analysis; kept for on-chip A/B)
# ---------------------------------------------------------------------------


from tests.synth import scene_like_cloud as _scene


def test_pruned_recall_and_consistency():
    from ogc_tpu.ops.pallas_knn import knn_pruned

    rng = np.random.RandomState(0)
    B, N, M, k = 2, 1024, 2048, 16
    q = jnp.asarray(np.stack([_scene(rng, N) for _ in range(B)]))
    p = jnp.asarray(np.stack([_scene(rng, M) for _ in range(B)]))
    _, i_ref = ops.knn(k, q, p, exact=True)
    d_new, i_new = knn_pruned(k, q, p, n_cand_blocks=10, blk=4,
                              interpret=True)
    assert _recall(i_ref, i_new, k) >= 0.95
    # pair consistency: returned dists = true dists of returned ids for the
    # ORIGINAL-order query (catches any unsort mismatch).
    qn, pn = np.asarray(q), np.asarray(p)
    for b in range(B):
        for n in range(0, N, 97):
            true = np.sqrt(
                ((qn[b, n] - pn[b, np.asarray(i_new[b, n])]) ** 2).sum(-1)
            )
            np.testing.assert_allclose(np.asarray(d_new[b, n]), true,
                                       rtol=2e-3, atol=1e-4)
            assert (np.diff(np.asarray(d_new[b, n])) >= -1e-4).all()
            assert len(set(np.asarray(i_new[b, n]).tolist())) == k


def test_pruned_ragged_shapes():
    """N, M away from tile multiples: pads never selected, ids in range."""
    from ogc_tpu.ops.pallas_knn import knn_pruned

    rng = np.random.RandomState(3)
    q = jnp.asarray(_scene(rng, 333)[None])
    p = jnp.asarray(_scene(rng, 999)[None])
    d, i = knn_pruned(8, q, p, n_cand_blocks=4, interpret=True)
    assert int(jnp.max(i)) < 999
    assert np.isfinite(np.asarray(d)).all()


def test_pruned_fallback_small_m():
    """Bc >= #blocks falls back to knn_blockmin (identical results)."""
    from ogc_tpu.ops.pallas_knn import knn_pruned

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.rand(1, 200, 3).astype(np.float32))
    p = jnp.asarray(rng.rand(1, 256, 3).astype(np.float32))
    d1, i1 = knn_pruned(8, q, p, interpret=True)
    d2_, i2 = knn_blockmin(8, q, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_morton_codes_order_locality():
    """Morton codes: equal points share codes; code order clusters space."""
    from ogc_tpu.ops.pallas_knn import morton_codes

    rng = np.random.RandomState(5)
    pc = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32) * 20)
    codes = np.asarray(morton_codes(pc))[0]
    order = np.argsort(codes)
    pts = np.asarray(pc)[0][order]
    # consecutive sorted points are closer than random pairs on average
    consec = np.linalg.norm(np.diff(pts, axis=0), axis=-1).mean()
    rand = np.linalg.norm(pts[:-1] - pts[np.roll(np.arange(511), 17)],
                          axis=-1).mean()
    assert consec < 0.5 * rand
