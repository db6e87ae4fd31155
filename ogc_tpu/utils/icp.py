"""Classic point-to-point ICP (numpy), used to estimate ego-motion on
KITTI/Waymo before flow inference.

Parity with reference utils/icp_util.py:10-123; nearest neighbors via
scipy cKDTree (the reference uses sklearn, not available here).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree


def best_fit_transform(A: np.ndarray, B: np.ndarray):
    """Least-squares rigid transform mapping corresponding A onto B.

    :return: (T (m+1,m+1), R (m,m), t (m,)).
    Reference: icp_util.py:10-51 (SVD Kabsch with reflection fix).
    """
    assert A.shape == B.shape
    m = A.shape[1]
    cA, cB = A.mean(0), B.mean(0)
    H = (A - cA).T @ (B - cB)
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[m - 1, :] *= -1
        R = Vt.T @ U.T
    t = cB - R @ cA
    T = np.identity(m + 1)
    T[:m, :m] = R
    T[:m, m] = t
    return T, R, t


def nearest_neighbor(src: np.ndarray, dst: np.ndarray):
    """1-NN of each src point in dst: (distances, indices)."""
    tree = cKDTree(dst)
    distances, indices = tree.query(src, k=1)
    return distances.ravel(), indices.ravel()


def icp(
    A: np.ndarray,
    B: np.ndarray,
    init_pose: Optional[np.ndarray] = None,
    max_iterations: int = 20,
    tolerance: float = 0.001,
):
    """Iterative closest point: best-fit transform mapping A onto B.

    :return: (T, distances, n_iterations).
    Reference: icp_util.py:73-123.
    """
    assert A.shape == B.shape
    m = A.shape[1]
    src = np.ones((m + 1, A.shape[0]))
    dst = np.ones((m + 1, B.shape[0]))
    src[:m, :] = A.T.copy()
    dst[:m, :] = B.T.copy()
    if init_pose is not None:
        src = init_pose @ src

    prev_error = 0.0
    distances = np.zeros(A.shape[0])
    i = 0
    for i in range(max_iterations):
        distances, indices = nearest_neighbor(src[:m, :].T, dst[:m, :].T)
        T, _, _ = best_fit_transform(src[:m, :].T, dst[:m, indices].T)
        src = T @ src
        mean_error = distances.mean()
        if abs(prev_error - mean_error) < tolerance:
            break
        prev_error = mean_error

    T, _, _ = best_fit_transform(A, src[:m, :].T)
    return T, distances, i
