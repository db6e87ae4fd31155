"""Ground-plane fitting (GPF): FPS pre-downsample, lowest-point seeding,
iterative least-squares plane fits, retry loop raising the seed threshold.

Parity with reference utils/gpf_util.py:20-70; the skspatial plane fit is
replaced by an SVD plane fit (identical least-squares solution), FPS comes
from ogc_tpu.ops.
"""

from __future__ import annotations

import numpy as np


def fps_downsample(pc: np.ndarray, n_sample_point: int = 1024) -> np.ndarray:
    """FPS indices of a single cloud (reference utils/data_util.py:8-18 /
    gpf_util.py:7-17), via the XLA kernel."""
    import jax.numpy as jnp

    from ogc_tpu import ops

    idx = ops.furthest_point_sample(
        jnp.asarray(pc[None].astype(np.float32)), n_sample_point
    )
    return np.asarray(idx)[0]


def plane_best_fit(points: np.ndarray):
    """Least-squares plane through points: (center, unit normal).

    Equivalent to skspatial Plane.best_fit (normal = singular vector of the
    smallest singular value of the centered cloud)."""
    center = points.mean(0)
    _, _, Vt = np.linalg.svd(points - center, full_matrices=False)
    normal = Vt[-1]
    return center, normal / np.linalg.norm(normal)


def extract_initial_gpf_seed(
    pc: np.ndarray, n_lpr: int = 20, thresh_seed: float = 0.4,
    vertical_axis: int = 1,
) -> np.ndarray:
    """Seed points below (mean of n_lpr lowest heights + thresh)
    (gpf_util.py:20-29)."""
    height = pc[:, vertical_axis]
    lpr = np.partition(height, n_lpr)[:n_lpr].mean()
    return pc[height < (lpr + thresh_seed)]


def ground_plane_fitting(
    points: np.ndarray,
    n_sample_point: int = 8192,
    n_iter: int = 5,
    n_lpr: int = 200,
    thresh_seed: float = 0.4,
    thresh_dist: float = 0.4,
    vertical_axis: int = 1,
) -> np.ndarray:
    """:return: is_ground (N,) int32.  Reference: gpf_util.py:32-70 including
    the retry loop raising thresh_seed by 0.05 up to 0.8."""
    if n_sample_point > 0 and points.shape[0] > n_sample_point:
        fps_idx = fps_downsample(points, n_sample_point=n_sample_point)
        pc = points[fps_idx]
    else:
        pc = points

    center = normal = None
    while True:
        try:
            seed = extract_initial_gpf_seed(pc, n_lpr, thresh_seed, vertical_axis)
            for _ in range(n_iter):
                if seed.shape[0] < 3:
                    raise ValueError("too few seed points")
                center, normal = plane_best_fit(seed)
                dist = np.abs((pc - center) @ normal)
                seed = pc[dist < thresh_dist]
            break
        except Exception:
            thresh_seed += 0.05
            if thresh_seed > 0.8:
                return np.zeros(points.shape[0], dtype=np.int32)

    dist = np.abs((points - center) @ normal)
    return (dist < thresh_dist).astype(np.int32)
