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


# ---------------------------------------------------------------------------
# Exact modes (knn_exact / ball_query_exact — the parity-mode fast path)
# ---------------------------------------------------------------------------


def _np_knn(k, q, p):
    """f32 oracle matching the reference CUDA: direct-form d2, stable sort
    (ties toward the lower index)."""
    d2 = ((q[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    return np.sqrt(np.take_along_axis(d2, idx, axis=-1)), idx


@pytest.mark.parametrize("emit", ["lex", "removal"])
@pytest.mark.parametrize("n,m,k", [(600, 1500, 16), (128, 1024, 3),
                                   (257, 1025, 32), (1024, 2048, 1),
                                   (200, 3000, 16)])
def test_exact_knn_matches_oracle(n, m, k, emit):
    from ogc_tpu.ops.pallas_knn import knn_exact

    rng = np.random.RandomState(7)
    q = jnp.asarray(30 * rng.rand(2, n, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(2, m, 3).astype(np.float32))
    d, i = knn_exact(k, q, p, interpret=True, emit=emit)
    want_d, want_i = _np_knn(k, np.asarray(q), np.asarray(p))
    np.testing.assert_array_equal(np.asarray(i), want_i)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("emit", ["lex", "removal"])
def test_exact_knn_ties_by_lower_index(emit):
    """Duplicated candidate points (exactly equal d2 — the bucket-padded
    production case) must resolve toward the lower index, like the
    reference's stable insertion sort."""
    from ogc_tpu.ops.pallas_knn import knn_exact

    rng = np.random.RandomState(8)
    p = 10 * rng.rand(1, 1100, 3).astype(np.float32)
    p[0, 550:] = p[0, :550]          # every point duplicated once
    q = p[:, :64].copy()
    d, i = knn_exact(4, jnp.asarray(q), jnp.asarray(p), interpret=True,
                     emit=emit)
    want_d, want_i = _np_knn(4, q, p)
    np.testing.assert_array_equal(np.asarray(i), want_i)
    # self first, its duplicate (index + 550) second
    np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(64))
    np.testing.assert_array_equal(np.asarray(i)[0, :, 1], np.arange(64) + 550)


def test_exact_ball_matches_oracle():
    from ogc_tpu.ops.core import _fill_balls
    from ogc_tpu.ops.pallas_knn import ball_query_exact

    rng = np.random.RandomState(9)
    xyz = rng.rand(2, 1500, 3).astype(np.float32)
    ctr = xyz[:, ::10].copy()
    cand = ball_query_exact(0.12, 8, jnp.asarray(xyz), jnp.asarray(ctr),
                            interpret=True)
    got = np.asarray(_fill_balls(cand, 8))

    # reference-order oracle (ball_query_gpu.cu:9-45): first nsample
    # in-radius indices ascending; pad with the first; empty -> zeros.
    d2 = ((ctr[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    want = np.zeros_like(got)
    for b in range(got.shape[0]):
        for n in range(got.shape[1]):
            inside = np.nonzero(d2[b, n] < 0.12 * 0.12)[0][:8]
            if len(inside):
                want[b, n, :] = inside[0]
                want[b, n, :len(inside)] = inside
    np.testing.assert_array_equal(got, want)


def test_exact_dispatch_semantics_match_xla():
    """ops.knn(exact=True)'s XLA path and the kernel agree on indices for
    well-separated clouds (the kernel's direct-form d2 vs XLA's MXU
    expansion differ in ulps, so only tie-free data pins equality)."""
    from ogc_tpu.ops.pallas_knn import knn_exact

    rng = np.random.RandomState(10)
    q = jnp.asarray(30 * rng.rand(1, 300, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(1, 1100, 3).astype(np.float32))
    d_x, i_x = ops.knn(9, q, p, exact=True)
    d_k, i_k = knn_exact(9, q, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_k))
    # distances: direct-form vs MXU-expansion d2 differ by ~|p||q|*eps
    # (~1e-4 absolute in d2 at 30 m scale)
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_k),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Bound-pruned exact modes (knn_exact_pruned / ball_query_exact_pruned)
# ---------------------------------------------------------------------------


def _clustered(rng, b, n, scale=30.0, n_clusters=12):
    """KITTI-like clustered cloud: pruning actually engages (uniform
    clouds at small scale leave every block near every tile)."""
    centers = scale * rng.rand(b, n_clusters, 3).astype(np.float32)
    assign = rng.randint(0, n_clusters, size=(b, n))
    pts = centers[np.arange(b)[:, None], assign]
    return (pts + 0.8 * rng.randn(b, n, 3)).astype(np.float32)


@pytest.mark.parametrize("n,m,k", [(600, 1500, 16), (257, 1025, 8),
                                   (512, 2048, 1), (200, 3000, 32)])
def test_pruned_exact_knn_bit_equal(n, m, k):
    """knn_exact_pruned == knn_exact bitwise: same direct-form d2, same
    tie rule; pruning only removes provably-irrelevant candidates."""
    from ogc_tpu.ops.pallas_knn import knn_exact, knn_exact_pruned

    rng = np.random.RandomState(11)
    for maker in (lambda b, nn: 30 * rng.rand(b, nn, 3).astype(np.float32),
                  lambda b, nn: _clustered(rng, b, nn)):
        q = jnp.asarray(maker(2, n))
        p = jnp.asarray(maker(2, m))
        d_u, i_u = knn_exact(k, q, p, interpret=True)
        d_p, i_p = knn_exact_pruned(k, q, p, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_u))
        np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_u))


def test_pruned_exact_knn_ties_by_lower_index():
    """Duplicate points (exact d2 ties) resolve to the lower ORIGINAL
    index through the Morton permutation."""
    from ogc_tpu.ops.pallas_knn import knn_exact_pruned

    rng = np.random.RandomState(12)
    p = 10 * rng.rand(1, 1100, 3).astype(np.float32)
    p[0, 550:] = p[0, :550]
    q = p[:, :64].copy()
    d, i = knn_exact_pruned(4, jnp.asarray(q), jnp.asarray(p),
                            interpret=True)
    want_d, want_i = _np_knn(4, q, p)
    np.testing.assert_array_equal(np.asarray(i), want_i)
    np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(64))
    np.testing.assert_array_equal(np.asarray(i)[0, :, 1],
                                  np.arange(64) + 550)


@pytest.mark.parametrize("radius", [0.05, 0.12, 5.0])
def test_pruned_exact_ball_bit_equal(radius):
    """ball_query_exact_pruned == ball_query_exact after _fill_balls, from
    near-empty balls (tiny r: most blocks pruned) to all-inside (huge r:
    nothing pruned)."""
    from ogc_tpu.ops.core import _fill_balls
    from ogc_tpu.ops.pallas_knn import (
        ball_query_exact, ball_query_exact_pruned,
    )

    rng = np.random.RandomState(13)
    xyz = rng.rand(2, 1500, 3).astype(np.float32)
    ctr = xyz[:, ::10].copy()
    cand_u = ball_query_exact(radius, 8, jnp.asarray(xyz),
                              jnp.asarray(ctr), interpret=True)
    cand_p = ball_query_exact_pruned(radius, 8, jnp.asarray(xyz),
                                     jnp.asarray(ctr), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(_fill_balls(cand_p, 8)), np.asarray(_fill_balls(cand_u, 8))
    )


def test_pruned_exact_knn_worst_case_single_tile():
    """All queries in one tile + all candidates nearby: count == nbp
    (nothing prunable) must still be bit-exact (the dynamic loop covers
    the full block list)."""
    from ogc_tpu.ops.pallas_knn import knn_exact, knn_exact_pruned

    rng = np.random.RandomState(14)
    q = jnp.asarray(0.5 * rng.rand(1, 100, 3).astype(np.float32))
    p = jnp.asarray(0.5 * rng.rand(1, 1024, 3).astype(np.float32))
    d_u, i_u = knn_exact(16, q, p, interpret=True)
    d_p, i_p = knn_exact_pruned(16, q, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_u))
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_u))


# ---------------------------------------------------------------------------
# Certified-MXU exact KNN (VERDICT r4 #4 arm)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,m,k", [(300, 1500, 16), (128, 1024, 3),
                                   (257, 2000, 8)])
def test_mxu_certified_matches_exact_scene_scale(n, m, k):
    """Public certified API == direct-form exact kernel at 30 m scene
    scale (the cancellation-band regime the r2 uncertified arm failed
    in).  Indices bit-equal; distances to 1-ulp FMA contract."""
    from ogc_tpu.ops.pallas_knn import knn_exact, knn_exact_mxu_certified

    rng = np.random.RandomState(21)
    # Clustered + offset far from the origin: worst case for expanded d2.
    ctr = 30 * rng.rand(2, 1, 3).astype(np.float32)
    q = jnp.asarray(ctr + 2 * rng.rand(2, n, 3).astype(np.float32))
    p = jnp.asarray(ctr + 2 * rng.rand(2, m, 3).astype(np.float32))
    d_u, i_u = knn_exact(k, q, p, interpret=True)
    d_c, i_c = knn_exact_mxu_certified(k, q, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_u))
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_u),
                               rtol=2e-7, atol=0)


def test_mxu_certified_core_flags_knife_edge():
    """Adversarial near-tie shell: MANY candidates at (near-)identical
    distance just outside the k+extra window must FAIL the certificate
    (not silently return wrong neighbors) and the public API must then
    fall back to bit-faithful results."""
    from ogc_tpu.ops.pallas_knn import (
        _mxu_certified_core, knn_exact, knn_exact_mxu_certified,
    )

    rng = np.random.RandomState(22)
    n, m, k = 64, 1200, 8
    q = 25.0 + rng.rand(1, n, 3).astype(np.float32)
    # Shell: every candidate ~the same distance from every query cluster
    # point -> d2 spread far below the expanded-form band at 25 m scale.
    dirs = rng.randn(1, m, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    p = jnp.asarray(q[:, :1] + 0.5 * dirs)
    _, _, cert_ok = _mxu_certified_core(k, jnp.asarray(q), p, extra=4,
                                        interpret=True)
    assert not bool(np.asarray(cert_ok).all()), \
        "shell geometry must trip the certificate"
    d_u, i_u = knn_exact(k, jnp.asarray(q), p, interpret=True)
    d_c, i_c = knn_exact_mxu_certified(k, jnp.asarray(q), p, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_u))
    np.testing.assert_array_equal(np.asarray(d_c), np.asarray(d_u))


def test_mxu_certified_full_window_small_m():
    """k + extra >= M examines every candidate: certificate is trivially
    true and results are exact with no band condition."""
    from ogc_tpu.ops.pallas_knn import knn_exact, knn_exact_mxu_certified

    rng = np.random.RandomState(23)
    q = jnp.asarray(30 * rng.rand(1, 100, 3).astype(np.float32))
    p = jnp.asarray(30 * rng.rand(1, 12, 3).astype(np.float32))
    d_u, i_u = knn_exact(8, q, p, interpret=True)
    d_c, i_c = knn_exact_mxu_certified(8, q, p, extra=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_u))
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_u),
                               rtol=2e-7, atol=0)
