"""Multi-frame co-segmentation by voting (jittable).

Equivalents of the reference vote.py:17-131: dense pairwise soft
correspondences from flow-warped distances, transitive propagation to
non-adjacent frames, Hungarian alignment of object channels, and averaging
within a time window.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ogc_tpu.ops.core import square_distance
from ogc_tpu.refine.streaming import softmax_corr_apply
from ogc_tpu.utils.lap import linear_sum_assignment

Array = jax.Array


def pairwise_correspondence(pc1: Array, pc2: Array, flow: Array,
                            temperature: float = 0.01) -> Array:
    """Softmaxed negative-distance correspondence (vote.py:17-28).

    :param pc1, pc2: (N, 3); :param flow: (N, 3).  :return: (N, N).
    """
    d = jnp.sqrt(
        jnp.maximum(square_distance(pc1 + flow, pc2), 0.0)
    )
    return jax.nn.softmax(-d / temperature, axis=-1)


def collect_correspondences(pc: Array, flows: Array) -> Dict[str, Array]:
    """All pairwise correspondences via transitive propagation
    (vote.py:31-59).

    :param pc: (T, N, 3); :param flows: (T-1, 2, N, 3) adjacent fwd/bwd flows.
    """
    T, N, _ = pc.shape
    corrs: Dict[str, Array] = {}
    eye = jnp.eye(N, dtype=pc.dtype)
    for t in range(T):
        corrs[f"{t}_{t}"] = eye
    for t in range(T - 1):
        corrs[f"{t}_{t+1}"] = pairwise_correspondence(
            pc[t], pc[t + 1], flows[t, 0]
        )
        corrs[f"{t+1}_{t}"] = pairwise_correspondence(
            pc[t + 1], pc[t], flows[t, 1]
        )
    for interval in range(2, T):
        for t in range(0, T - interval):
            c = corrs[f"{t}_{t+interval-1}"] @ corrs[f"{t+interval-1}_{t+interval}"]
            corrs[f"{t}_{t+interval}"] = c / jnp.maximum(
                jnp.sum(c, -1, keepdims=True), 1e-10
            )
            c = corrs[f"{t+interval}_{t+interval-1}"] @ corrs[f"{t+interval-1}_{t}"]
            corrs[f"{t+interval}_{t}"] = c / jnp.maximum(
                jnp.sum(c, -1, keepdims=True), 1e-10
            )
    return corrs


def match_mask_by_cost(mask1: Array, mask2: Array, measure: str = "ce") -> Array:
    """Reorder mask2's object channels to match mask1 (vote.py:62-91).

    :param mask1, mask2: (N, K) soft masks.  :return: reordered mask2.
    """
    K = mask1.shape[-1]
    m1 = mask1[:, :, None]  # (N, K, 1)
    m2 = mask2[:, None, :]  # (N, 1, K)
    if measure == "ce":
        eps = 1e-7
        p = jnp.clip(m2, eps, 1.0 - eps)
        cost = -(m1 * jnp.log(p) + (1.0 - m1) * jnp.log(1.0 - p))
        cost = jnp.mean(cost, axis=0)  # (K, K)
        col_ind = linear_sum_assignment(cost, False)
    else:
        inter = jnp.sum(m1 * m2, axis=0)
        union = jnp.maximum(jnp.sum(m1 + m2, axis=0), 1e-10)
        col_ind = linear_sum_assignment(inter / union, True)
    perm = jax.nn.one_hot(col_ind, K, dtype=mask2.dtype)
    return jnp.einsum("ij,nj->ni", perm, mask2)


def _apply_adjacent_corr(pc: Array, flows: Array, a: int, b: int, X: Array,
                         temperature: float, tile: int) -> Array:
    """Apply the adjacent softmax correspondence C_{a->b} to X (N, C).

    b == a+1 uses the forward flow flows[a, 0]; b == a-1 the backward flow
    flows[b, 1] (vote.py:41-48 builds exactly these two directions)."""
    if b == a + 1:
        q, p, fl = pc[a], pc[a + 1], flows[a, 0]
    else:
        assert b == a - 1
        q, p, fl = pc[a], pc[a - 1], flows[a - 1, 1]
    num, s0, _ = softmax_corr_apply(
        (q + fl)[None], p[None], X[None], temperature, tile=tile
    )
    return (num / s0[..., None])[0]


def warp_mask_chain(pc: Array, flows: Array, t: int, v: int, m: Array,
                    temperature: float = 0.01, tile: int = 1024) -> Array:
    """corrs[t_v] @ m without materializing any (N, N) matrix.

    The dense path (vote.py:31-59) renormalizes each transitive product's
    rows; since every factor is row-stochastic those row sums are
    identically 1 and all intermediate normalizations telescope into one
    final division — carried here as an extra ones column:
        corrs[t_v] @ m = (C_t,.. @ ... @ [m, 1])[:, :K] / (...)[:, K:].
    """
    N, K = m.shape
    X = jnp.concatenate([m, jnp.ones((N, 1), m.dtype)], axis=-1)
    step = 1 if v > t else -1
    # Innermost factor first: C_{v-step -> v}, ..., C_{t -> t+step}.
    for a in range(v - step, t - step, -step):
        X = _apply_adjacent_corr(pc, flows, a, a + step, X, temperature, tile)
    return X[:, :K] / jnp.maximum(X[:, K:], 1e-10)


@functools.partial(jax.jit, static_argnames=("time_window_size", "tile"))
def mask_voting(pc: Array, mask: Array, flows: Array,
                time_window_size: int = 3, tile: int = 1024) -> Array:
    """Aggregate per-frame masks by correspondence-warped voting
    (vote.py:94-131).

    Blockwise: warped masks come from chained softmax-matvec applications
    (peak memory (N, tile) per product) instead of the reference's dense
    (N, N) correspondence matrices and transitive matmuls (vote.py:26-27).

    :param pc: (T, N, 3); :param mask: (T, N, K);
    :param flows: (T-1, 2, N, 3).
    :return: voted masks (T, N, K).
    """
    T = pc.shape[0]

    voted = []
    for t in range(T):
        votes = []
        window = range(max(0, t - time_window_size),
                       min(T, t + time_window_size + 1))
        for v in window:
            if v == t:
                votes.append(mask[t])
            else:
                warped = warp_mask_chain(pc, flows, t, v, mask[v], tile=tile)
                votes.append(match_mask_by_cost(mask[t], warped))
        vote = jnp.mean(jnp.stack(votes, 0), axis=0)
        vote = vote / jnp.maximum(jnp.sum(vote, -1, keepdims=True), 1e-10)
        voted.append(vote)
    return jnp.stack(voted, 0)
