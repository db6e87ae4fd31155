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
