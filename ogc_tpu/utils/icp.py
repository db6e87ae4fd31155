"""Point-to-point ICP for ego-motion estimation on KITTI/Waymo.

Two implementations with identical semantics (reference
utils/icp_util.py:10-123):

- `icp` — the numpy parity oracle (cKDTree 1-NN; the reference uses
  sklearn, not available here), host-side per scene.
- `icp_xla` — jittable and BATCHED: fixed-iteration lax.scan with a
  per-scene convergence mask (the reference's early break), 1-NN via the
  ops layer (flash top-1 on TPU — exact), Kabsch on the MXU at HIGHEST
  precision (scene-scale coordinates quantize in default bf16).  This is
  the SURVEY §3.5 batched-XLA preprocessing path: the outdoor CLIs run it
  on-device instead of the per-scene host loop.
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


# ---------------------------------------------------------------------------
# Jittable batched ICP
# ---------------------------------------------------------------------------


def _best_fit_xla(A, B):
    """Batched least-squares rigid transform A -> B (corresponding points).

    :param A, B: (Bb, P, 3).  :return: (R (Bb, 3, 3), t (Bb, 3)).
    Same math as best_fit_transform (SVD Kabsch, det-sign reflection fix on
    the last right singular vector).
    """
    import jax
    import jax.numpy as jnp

    hp = jax.lax.Precision.HIGHEST
    cA = jnp.mean(A, axis=1, keepdims=True)
    cB = jnp.mean(B, axis=1, keepdims=True)
    H = jnp.einsum("bni,bnj->bij", A - cA, B - cB, precision=hp)
    U, _, Vt = jnp.linalg.svd(H)
    # R = Vt^T @ U^T; where det(R) < 0, flip Vt's last row and recompute.
    R = jnp.einsum("bji,bkj->bik", Vt, U, precision=hp)
    flip = jnp.where(jnp.linalg.det(R) < 0, -1.0, 1.0)
    Vt = Vt.at[:, -1, :].multiply(flip[:, None])
    R = jnp.einsum("bji,bkj->bik", Vt, U, precision=hp)
    t = cB[:, 0] - jnp.einsum("bij,bj->bi", R, cA[:, 0], precision=hp)
    return R, t


def icp_xla(A, B, max_iterations: int = 20, tolerance: float = 0.001):
    """Jittable batched ICP: best-fit rigid transform mapping A onto B.

    :param A, B: (Bb, P, 3) jax arrays (static P — the callers run it on
        FPS-1024 subclouds, test_flow_waymo.py:158-160).
    :return: T (Bb, 4, 4) homogeneous transforms.

    Semantics of the reference loop (icp_util.py:73-123): per iteration,
    1-NN correspondences -> Kabsch -> apply; stop when the mean 1-NN
    distance changes by < tolerance.  Early stopping is a per-scene DONE
    mask over a fixed-length scan (converged scenes pass through), then the
    final transform is re-fit from the original cloud as the reference does.
    """
    import jax
    import jax.numpy as jnp

    from ogc_tpu import ops

    def _run(A, B):
        Bb, P, _ = A.shape

        def step(carry, _):
            src, prev_err, done = carry
            dist, idx = ops.knn(1, src, B)
            corr = ops.gather(B, idx[..., 0])
            R, t = _best_fit_xla(src, corr)
            src_new = (
                jnp.einsum(
                    "bij,bnj->bni", R, src,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + t[:, None, :]
            )
            mean_err = jnp.mean(dist[..., 0], axis=1)
            src = jnp.where(done[:, None, None], src, src_new)
            conv = jnp.abs(prev_err - mean_err) < tolerance
            prev_err = jnp.where(done, prev_err, mean_err)
            return (src, prev_err, done | conv), None

        init = (
            A,
            jnp.zeros((Bb,), A.dtype),
            jnp.zeros((Bb,), bool),
        )
        (src, _, _), _ = jax.lax.scan(
            step, init, None, length=max_iterations
        )
        R, t = _best_fit_xla(A, src)
        T = jnp.zeros((Bb, 4, 4), A.dtype)
        T = T.at[:, :3, :3].set(R)
        T = T.at[:, :3, 3].set(t)
        T = T.at[:, 3, 3].set(1.0)
        return T

    import jax

    return jax.jit(_run)(A, B)
