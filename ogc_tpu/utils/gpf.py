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


# ---------------------------------------------------------------------------
# Jittable batched GPF (SURVEY §3.5 batched-XLA preprocessing)
# ---------------------------------------------------------------------------


def _masked_plane_fit(pc, w):
    """Weighted least-squares plane: (center (Bb, 3), unit normal (Bb, 3),
    count (Bb,)).  Normal = smallest eigenvector of the weighted 3x3
    covariance — identical to the SVD fit on the selected points for 0/1
    weights (plane_best_fit above)."""
    import jax
    import jax.numpy as jnp

    hp = jax.lax.Precision.HIGHEST
    count = jnp.sum(w, axis=1)
    denom = jnp.maximum(count, 1.0)[:, None]
    center = jnp.sum(pc * w[..., None], axis=1) / denom
    d = (pc - center[:, None, :]) * w[..., None]
    cov = jnp.einsum("bni,bnj->bij", d, d, precision=hp)
    # eigh returns ascending eigenvalues; the plane normal is the first
    # eigenvector.  Sign is irrelevant (distances are absolute).
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., 0]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    return center, normal, count


def ground_plane_fitting_xla(
    points,
    valid=None,
    fit_valid=None,
    n_iter: int = 5,
    n_lpr: int = 200,
    thresh_seed: float = 0.4,
    thresh_dist: float = 0.4,
    vertical_axis: int = 1,
    max_thresh_seed: float = 0.8,
):
    """Jittable batched ground-plane fitting.

    :param points: (Bb, N, 3) jax array (pad variable-size clouds and pass
        `valid`).
    :param valid: optional (Bb, N) bool mask of real (non-padding) points.
    :param fit_valid: optional (Bb, N) bool mask restricting the points the
        plane is FITTED on (the reference FPS-downsamples to n_sample_point
        for the iterations but classifies the FULL cloud with the final
        plane, gpf_util.py:37-41,68-69 — pass the FPS-selection mask here).
    :return: is_ground (Bb, N) int32 over `valid` (0 on padding).

    Semantics of gpf_util.py:32-70: seed points below (mean of n_lpr lowest
    heights + thresh_seed); n_iter rounds of plane fit + reselection within
    thresh_dist; if any round has < 3 seed points the whole attempt fails
    and thresh_seed is raised by 0.05 up to max_thresh_seed (all-zeros if
    every attempt fails).  The retry ladder is unrolled with a first-success
    select — each attempt is a handful of (Bb, N) reductions + 3x3 eigs.
    """
    import jax
    import jax.numpy as jnp

    def _run(points, valid, fit_valid):
        Bb, N, _ = points.shape
        height = points[..., vertical_axis]
        big = jnp.float32(1e10)
        h_fit = jnp.where(fit_valid, height, big)
        # Mean of the n_lpr lowest fit-subcloud heights (masked entries sit
        # at +1e10 and are never among the lowest while >= n_lpr real
        # points exist; degenerate tiny clouds fail the count check below).
        k = min(n_lpr, N)
        lowest = -jax.lax.top_k(-h_fit, k)[0]  # (Bb, k) lowest heights
        lpr = jnp.mean(lowest, axis=1)  # (Bb,)

        def attempt(seed_thresh):
            seed = fit_valid & (h_fit < (lpr + seed_thresh)[:, None])
            ok = jnp.ones((Bb,), bool)
            for _ in range(n_iter):
                ok = ok & (jnp.sum(seed, axis=1) >= 3)
                center, normal, _ = _masked_plane_fit(
                    points, seed.astype(points.dtype)
                )
                dist = jnp.abs(
                    jnp.einsum(
                        "bni,bi->bn", points - center[:, None, :], normal,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )
                seed = fit_valid & (dist < thresh_dist)
            is_ground = (valid & (dist < thresh_dist)).astype(jnp.int32)
            return is_ground, ok

        n_retry = int(round((max_thresh_seed - thresh_seed) / 0.05)) + 1
        result = jnp.zeros((Bb, N), jnp.int32)
        chosen = jnp.zeros((Bb,), bool)
        for r in range(max(n_retry, 1)):
            ig, ok = attempt(jnp.float32(thresh_seed + 0.05 * r))
            take = ok & ~chosen
            result = jnp.where(take[:, None], ig, result)
            chosen = chosen | ok
        return result

    if valid is None:
        valid = jnp.ones(points.shape[:2], bool)
    valid = jnp.asarray(valid)
    fit_valid = valid if fit_valid is None else jnp.asarray(fit_valid) & valid
    return jax.jit(_run)(points, valid, fit_valid)
