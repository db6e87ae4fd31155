"""ICP / GPF / outdoor dataset tests."""

import numpy as np
from scipy.spatial.transform import Rotation

from ogc_tpu.utils.icp import best_fit_transform, icp
from ogc_tpu.utils.gpf import ground_plane_fitting, plane_best_fit


def test_best_fit_transform_exact():
    rng = np.random.RandomState(0)
    A = rng.randn(100, 3)
    R = Rotation.from_euler("zyx", [10, 40, -20], degrees=True).as_matrix()
    t = np.array([0.5, -1.0, 2.0])
    B = A @ R.T + t
    T, R_hat, t_hat = best_fit_transform(A, B)
    np.testing.assert_allclose(R_hat, R, atol=1e-8)
    np.testing.assert_allclose(t_hat, t, atol=1e-8)


def test_icp_recovers_small_transform():
    rng = np.random.RandomState(1)
    A = rng.rand(300, 3) * 5
    R = Rotation.from_euler("zyx", [2, 3, -2], degrees=True).as_matrix()
    t = np.array([0.1, -0.05, 0.08])
    B = A @ R.T + t
    T, dist, n_it = icp(A, B, max_iterations=30, tolerance=1e-7)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


def test_plane_best_fit():
    rng = np.random.RandomState(2)
    xz = rng.rand(200, 2) * 10
    pts = np.stack([xz[:, 0], np.full(200, 1.5), xz[:, 1]], 1)
    pts += 0.001 * rng.randn(200, 3)
    center, normal = plane_best_fit(pts)
    np.testing.assert_allclose(abs(normal[1]), 1.0, atol=1e-3)
    np.testing.assert_allclose(center[1], 1.5, atol=0.01)


def test_ground_plane_fitting_separates_ground():
    rng = np.random.RandomState(3)
    ground = np.stack(
        [rng.rand(500) * 40, 0.05 * rng.randn(500), rng.rand(500) * 40], 1
    )
    objects = np.stack(
        [rng.rand(100) * 40, 1.5 + rng.rand(100) * 2, rng.rand(100) * 40], 1
    )
    pts = np.concatenate([ground, objects], 0).astype(np.float32)
    is_ground = ground_plane_fitting(
        pts, n_sample_point=0, n_lpr=50, thresh_seed=0.4, thresh_dist=0.4
    )
    assert is_ground[:500].mean() > 0.95
    assert is_ground[500:].mean() < 0.05


# ---------------------------------------------------------------------------
# Jittable batched preprocessing (SURVEY §3.5) vs the numpy oracles
# ---------------------------------------------------------------------------


def _scene_pair(rng, n=512, scale=20.0, deg=(2.0, 3.0, -2.0)):
    A = (rng.rand(n, 3) * scale).astype(np.float32)
    R = Rotation.from_euler("zyx", deg, degrees=True).as_matrix()
    t = np.array([0.2, -0.1, 0.15])
    B = (A @ R.T + t).astype(np.float32)
    return A, B, R, t


def test_icp_xla_matches_numpy_icp():
    """Batched jittable ICP recovers the same transform as the numpy oracle
    (identical loop semantics: 1-NN -> Kabsch -> apply -> tolerance break)."""
    import jax.numpy as jnp

    from ogc_tpu.utils.icp import icp_xla

    rng = np.random.RandomState(5)
    scenes = [_scene_pair(rng, deg=(2, 3, -2)), _scene_pair(rng, deg=(-3, 1, 2))]
    A = jnp.asarray(np.stack([s[0] for s in scenes]))
    B = jnp.asarray(np.stack([s[1] for s in scenes]))
    T_x = np.asarray(icp_xla(A, B, max_iterations=30, tolerance=1e-7))
    for b, (An, Bn, R, t) in enumerate(scenes):
        T_np, _, _ = icp(An, Bn, max_iterations=30, tolerance=1e-7)
        np.testing.assert_allclose(T_x[b], T_np, atol=2e-3)
        np.testing.assert_allclose(T_x[b][:3, :3], R, atol=2e-3)
        np.testing.assert_allclose(T_x[b][:3, 3], t, atol=5e-3)


def test_icp_xla_convergence_mask_freezes_scenes():
    """A scene that converges immediately (identical clouds) must not be
    perturbed by later iterations while the other scene keeps iterating."""
    import jax.numpy as jnp

    from ogc_tpu.utils.icp import icp_xla

    rng = np.random.RandomState(6)
    A1, B1, _, _ = _scene_pair(rng)
    A2 = (rng.rand(512, 3) * 20).astype(np.float32)
    A = jnp.asarray(np.stack([A2, A1]))
    B = jnp.asarray(np.stack([A2.copy(), B1]))  # scene 0: identity
    T = np.asarray(icp_xla(A, B, max_iterations=40, tolerance=1e-6))
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-4)
    err = np.abs(A1 @ T[1][:3, :3].T + T[1][:3, 3] - B1).max()
    assert err < 0.01, err


def test_gpf_xla_matches_numpy():
    """Batched jittable GPF labels the same ground points as the numpy
    oracle, including under padding + the FPS fit-subcloud mask."""
    import jax.numpy as jnp

    from ogc_tpu.utils.gpf import ground_plane_fitting_xla

    rng = np.random.RandomState(7)

    def scene(n_ground, n_obj, tilt=0.0):
        g = np.stack(
            [rng.rand(n_ground) * 40, 0.05 * rng.randn(n_ground),
             rng.rand(n_ground) * 40], 1
        )
        g[:, 1] += tilt * g[:, 0] / 40.0
        o = np.stack(
            [rng.rand(n_obj) * 40, 1.5 + rng.rand(n_obj) * 2,
             rng.rand(n_obj) * 40], 1
        )
        return np.concatenate([g, o], 0).astype(np.float32)

    s1 = scene(500, 100)
    s2 = scene(400, 80, tilt=0.1)
    N = 640  # pad both to one bucket
    pts = np.zeros((2, N, 3), np.float32)
    valid = np.zeros((2, N), bool)
    pts[0, : len(s1)], valid[0, : len(s1)] = s1, True
    pts[1, : len(s2)], valid[1, : len(s2)] = s2, True

    out = np.asarray(ground_plane_fitting_xla(
        jnp.asarray(pts), valid=jnp.asarray(valid),
        n_lpr=50, thresh_seed=0.4, thresh_dist=0.4,
    ))
    for b, s in enumerate((s1, s2)):
        ref = ground_plane_fitting(
            s, n_sample_point=0, n_lpr=50, thresh_seed=0.4, thresh_dist=0.4
        )
        agree = (out[b, : len(s)] == ref).mean()
        assert agree > 0.99, (b, agree)
        assert out[b, len(s):].sum() == 0  # padding never labeled ground


def test_gpf_xla_retry_ladder():
    """A cloud whose 0.4-threshold seed set is empty must fall back to a
    raised threshold instead of failing (reference retry loop,
    gpf_util.py:47-66) — and a hopeless cloud returns all zeros."""
    import jax.numpy as jnp

    from ogc_tpu.utils.gpf import ground_plane_fitting_xla

    rng = np.random.RandomState(8)
    # Two points below (lpr + 0.4), rest far above: first attempts fail the
    # >= 3 seed check until the ladder lifts the threshold.
    low = np.array([[0, 0.0, 0], [40, 0.01, 40]], np.float32)
    high = np.stack(
        [rng.rand(200) * 40, 0.62 + 0.02 * rng.randn(200),
         rng.rand(200) * 40], 1
    ).astype(np.float32)
    pts = np.concatenate([low, high], 0)[None]
    out = np.asarray(ground_plane_fitting_xla(
        jnp.asarray(pts), n_lpr=2, thresh_seed=0.4, thresh_dist=0.4
    ))[0]
    ref = ground_plane_fitting(
        pts[0], n_sample_point=0, n_lpr=2, thresh_seed=0.4, thresh_dist=0.4
    )
    agree = (out == ref).mean()
    assert agree > 0.99, agree


def test_gpf_xla_scene_batched_matches_per_scene():
    """test_flow_waymo._batched_eval Phase A equality: batching clouds at a
    GROUP bucket with an unconditional FPS fit mask must reproduce the
    per-scene XLA path (per-cloud bucket; FPS only when N > n_point_gpf) —
    duplicate-padding rows never win an FPS tie and duplicate fit-mask
    marks are ANDed away by `valid` inside ground_plane_fitting_xla."""
    import jax.numpy as jnp

    from ogc_tpu import ops
    from ogc_tpu.utils.gpf import ground_plane_fitting_xla

    rng = np.random.RandomState(11)

    def scene(n_ground, n_obj):
        g = np.stack(
            [rng.rand(n_ground) * 40, 0.05 * rng.randn(n_ground),
             rng.rand(n_ground) * 40], 1)
        o = np.stack(
            [rng.rand(n_obj) * 40, 1.5 + rng.rand(n_obj) * 2,
             rng.rand(n_obj) * 40], 1)
        return np.concatenate([g, o], 0).astype(np.float32)

    n_point_gpf, n_lpr = 96, 20
    # One cloud above the FPS threshold, one below (the two per-scene
    # branches), padded to different buckets.
    s_big, s_small = scene(140, 40), scene(50, 14)  # 180 > 96 > 64
    bucket = 256  # group bucket (per-scene buckets would be 192 / 64)

    def per_scene(s):
        Nb = max(128, -(-len(s) // 128) * 128)  # per-cloud bucket
        pcp = np.concatenate(
            [s, np.repeat(s[:1], Nb - len(s), axis=0)], 0)
        valid = np.zeros(Nb, bool)
        valid[:len(s)] = True
        fit_valid = None
        if len(s) > n_point_gpf:
            fps_idx = np.asarray(ops.furthest_point_sample(
                jnp.asarray(pcp[None]), n_point_gpf))[0]
            fv = np.zeros(Nb, bool)
            fv[fps_idx] = True
            fit_valid = jnp.asarray(fv[None])
        return np.asarray(ground_plane_fitting_xla(
            jnp.asarray(pcp[None]), valid=jnp.asarray(valid[None]),
            fit_valid=fit_valid, n_lpr=n_lpr,
        ))[0, :len(s)]

    # Batched: group bucket, unconditional FPS fit mask (Phase A).
    clouds = [s_big, s_small]
    P = np.stack([np.concatenate(
        [c, np.broadcast_to(c[:1], (bucket - len(c), 3))], 0)
        for c in clouds])
    V = np.zeros((2, bucket), bool)
    for i, c in enumerate(clouds):
        V[i, :len(c)] = True
    fi = np.asarray(ops.furthest_point_sample(jnp.asarray(P), n_point_gpf))
    FV = np.zeros((2, bucket), bool)
    np.put_along_axis(FV, fi, True, axis=1)
    G = np.asarray(ground_plane_fitting_xla(
        jnp.asarray(P), valid=jnp.asarray(V), fit_valid=jnp.asarray(FV),
        n_lpr=n_lpr,
    ))

    for i, c in enumerate(clouds):
        np.testing.assert_array_equal(G[i, :len(c)], per_scene(c), str(i))
