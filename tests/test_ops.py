"""Oracle tests for ogc_tpu.ops against straightforward numpy references.

Each oracle independently re-implements the documented semantics of the
reference CUDA kernels (pointnet2/src/*.cu): FPS seeding/tie rules, KNN
ordering, ball-query padding, three_nn interpolation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ogc_tpu import ops


def np_fps(xyz, npoint):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        min_d2 = np.full(N, 1e10, dtype=np.float32)
        last = 0
        for j in range(1, npoint):
            d2 = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            min_d2 = np.minimum(min_d2, d2)
            last = int(np.argmax(min_d2))
            out[b, j] = last
    return out


def np_knn(k, query, points):
    d2 = np.sum((query[:, :, None, :] - points[:, None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=-1))
    return dist, idx


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for kpt in range(N):
                d2 = np.sum((new_xyz[b, m] - xyz[b, kpt]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, m, :] = kpt
                    out[b, m, cnt] = kpt
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_fps_matches_oracle(rng):
    xyz = rng.randn(3, 128, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32))
    want = np_fps(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_seeds_index_zero(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
    assert (got[:, 0] == 0).all()


def test_fps_no_duplicates(rng):
    xyz = rng.randn(2, 256, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 64))
    for b in range(2):
        assert len(np.unique(got[b])) == 64


def test_knn_matches_oracle(rng):
    q = rng.randn(2, 100, 3).astype(np.float32)
    p = rng.randn(2, 80, 3).astype(np.float32)
    dist, idx = ops.knn(5, jnp.asarray(q), jnp.asarray(p))
    want_d, want_i = np_knn(5, q, p)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dist), want_d, atol=2e-3)


def test_knn_chunked_matches_unchunked(rng):
    q = rng.randn(2, 300, 3).astype(np.float32)
    p = rng.randn(2, 150, 3).astype(np.float32)
    d1, i1 = ops.knn(4, jnp.asarray(q), jnp.asarray(p), chunk=128)
    d2, i2 = ops.knn(4, jnp.asarray(q), jnp.asarray(p), chunk=4096)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_self_knn_returns_self_first(rng):
    p = (10.0 * rng.randn(2, 64, 3)).astype(np.float32)
    _, idx = ops.knn(3, jnp.asarray(p), jnp.asarray(p))
    np.testing.assert_array_equal(np.asarray(idx)[..., 0], np.arange(64)[None].repeat(2, 0))


def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(2, 50, 3).astype(np.float32)
    known = rng.randn(2, 20, 3).astype(np.float32)
    feats = rng.randn(2, 20, 7).astype(np.float32)

    idx, weight = ops.interpolate_weights(jnp.asarray(unknown), jnp.asarray(known))
    out = ops.three_interpolate(jnp.asarray(feats), idx, weight)

    want_d, want_i = np_knn(3, unknown, known)
    recip = 1.0 / (want_d + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    want = np.einsum("bnk,bnkc->bnc", w, feats[np.arange(2)[:, None, None], want_i])
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-3)


def test_ball_query_matches_oracle(rng):
    xyz = rng.rand(2, 64, 3).astype(np.float32)
    new_xyz = xyz[:, ::4].copy()
    got = np.asarray(ops.ball_query(0.3, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = np_ball_query(0.3, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball():
    xyz = jnp.asarray(np.array([[[0.0, 0, 0], [1, 1, 1]]], dtype=np.float32))
    centers = jnp.asarray(np.array([[[10.0, 10, 10]]], dtype=np.float32))
    got = np.asarray(ops.ball_query(0.5, 4, xyz, centers))
    np.testing.assert_array_equal(got, np.zeros((1, 1, 4), dtype=np.int32))


def test_gather_and_group(rng):
    pts = rng.randn(2, 30, 5).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 10)).astype(np.int32)
    got = np.asarray(ops.gather(jnp.asarray(pts), jnp.asarray(idx)))
    want = pts[np.arange(2)[:, None], idx]
    np.testing.assert_allclose(got, want)

    gidx = rng.randint(0, 30, size=(2, 10, 4)).astype(np.int32)
    got = np.asarray(ops.group(jnp.asarray(pts), jnp.asarray(gidx)))
    want = pts[np.arange(2)[:, None, None], gidx]
    np.testing.assert_allclose(got, want)


def test_group_grad_is_scatter_add(rng):
    pts = rng.randn(1, 10, 2).astype(np.float32)
    idx = jnp.asarray(np.array([[[0, 0, 1], [2, 0, 2]]], dtype=np.int32))

    def f(p):
        return jnp.sum(ops.group(p, idx))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    want = np.zeros((1, 10, 2), dtype=np.float32)
    for j in np.asarray(idx).ravel():
        want[0, j] += 1.0
    np.testing.assert_allclose(g, want)


def test_query_and_group_radius_clamp(rng):
    # Clamp semantics: neighbors farther than radius are replaced by the
    # nearest neighbor's index (pointnet2/pointnet2.py:284-286).
    xyz = np.zeros((1, 4, 3), dtype=np.float32)
    xyz[0, 1] = [0.05, 0, 0]
    xyz[0, 2] = [5.0, 0, 0]
    xyz[0, 3] = [6.0, 0, 0]
    new_xyz = xyz[:, :1]
    new_feats, grouped_xyz = ops.query_and_group(
        0.1, 4, jnp.asarray(xyz), jnp.asarray(new_xyz), None, use_xyz=True
    )
    # neighbors sorted: 0 (d=0), 1 (d=.05), 2, 3; 2 and 3 clamp to index 0.
    np.testing.assert_allclose(
        np.asarray(grouped_xyz)[0, 0, :, 0], [0.0, 0.05, 0.0, 0.0], atol=1e-6
    )


def test_upsample_feat_identity(rng):
    pc = rng.randn(1, 20, 3).astype(np.float32)
    feats = rng.randn(1, 20, 4).astype(np.float32)
    out = np.asarray(ops.upsample_feat(jnp.asarray(pc), jnp.asarray(pc), jnp.asarray(feats)))
    np.testing.assert_allclose(out, feats, atol=1e-2)


def test_fps_chunked_matches_single_launch(monkeypatch):
    """Batch-chunked FPS must be bitwise identical to one launch (and to the
    XLA loop) — fleet batches must not silently fall back (VERDICT r1 #8)."""
    from ogc_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(10, 128, 3).astype(np.float32))
    single = np.asarray(
        pk.furthest_point_sample_pallas(xyz, 32, True)
    )
    monkeypatch.setattr(pk, "_VMEM_ELEMS", 3 * 128)  # force chunk=3
    chunked = np.asarray(pk.fps_pallas_chunked(xyz, 32, True))
    np.testing.assert_array_equal(chunked, single)
    xla = np.asarray(ops.furthest_point_sample(xyz, 32))
    np.testing.assert_array_equal(chunked, xla)


def test_exact_toggle_not_pinned_by_jit_cache():
    """set_exact_neighbors flips must take effect after a prior call with
    the other mode (regression: resolving exact=None inside the jitted body
    pinned the first trace's mode in the cache — the exact-vs-approx
    ablation produced four identical cells)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    p = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32))
    try:
        ops.set_exact_neighbors(True)
        d_e, _ = ops.knn(4, q, p)
        ops.set_exact_neighbors(False)
        d_a, _ = ops.knn(4, q, p)
    finally:
        ops.set_exact_neighbors(False)
    # The two calls must have traced DIFFERENT computations; on CPU the
    # approximate path lowers to exact, so compare the compiled paths via
    # the module default resolution instead: the jit caches must have two
    # distinct entries (one per resolved mode).
    assert _distinct_knn_traces() >= 2


def _distinct_knn_traces():
    from ogc_tpu.ops.core import _knn_jit

    return _knn_jit._cache_size()


def test_fps_nesting_identity(rng):
    """Greedy FPS is incremental: FPS of a cloud already in FPS selection
    order is its own prefix (the basis of the models' fps_nested slices)."""
    xyz = jnp.asarray(rng.rand(3, 256, 3).astype(np.float32) * 30)
    lvl1 = ops.gather(xyz, ops.furthest_point_sample(xyz, 128))
    got = np.asarray(ops.furthest_point_sample(lvl1, 64))
    np.testing.assert_array_equal(got, np.broadcast_to(np.arange(64), (3, 64)))
    lvl2 = lvl1[:, :64]  # still in selection order -> nests again
    got2 = np.asarray(ops.furthest_point_sample(lvl2, 32))
    np.testing.assert_array_equal(got2, np.broadcast_to(np.arange(32), (3, 32)))


def test_pallas_gate_respects_device_count():
    """Mosaic kernels cannot lower under multi-device SPMD (jax
    tpu_custom_call raises 'wrap the call in a shard_map'): the shared
    dispatch gate must refuse whenever the process sees >1 device, so
    multi-chip meshes fall back to XLA paths that GSPMD shards."""
    from ogc_tpu.ops.core import pallas_available

    # The CPU suite runs with 8 virtual devices and a cpu backend — both
    # conditions independently disqualify Pallas here.
    assert not pallas_available()


def test_searches_are_nondifferentiable_oracles():
    """knn/ball_query/FPS must carry NO tangents from their inputs (the
    reference CUDA ops register no backward; r4 this also keeps
    param-dependent warped clouds out of the Pallas kernels, which have
    no JVP rule — the kitti-scale flow-train crash)."""
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    tan = jnp.ones_like(pc)

    _, d_dot = jax.jvp(lambda x: ops.knn(4, x, x)[0], (pc,), (tan,))
    np.testing.assert_array_equal(np.asarray(d_dot), 0.0)

    # grad through a value-consumer still flows (group of features).
    feat = jnp.asarray(rng.rand(1, 64, 5).astype(np.float32))

    def f(x, ft):
        _, idx = ops.knn(4, x, x)
        return jnp.sum(ops.group(ft, idx))

    g = jax.grad(f, argnums=1)(pc, feat)
    assert float(jnp.sum(jnp.abs(g))) > 0
