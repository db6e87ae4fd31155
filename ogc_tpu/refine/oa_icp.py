"""Object-Aware ICP flow refinement (jittable).

Equivalents of the reference oa_icp.py:16-84: weighted Kabsch rigid
projection of flow per object, and the full OA-ICP loop — soft
correspondences from a temperature-softmaxed distance matrix, masked by
inter-frame object-consistency scores, iterated with per-object Kabsch
re-fits.  The N x N correspondence matrix is the memory-critical tensor at
8192 points; it is formed with MXU matmuls in f32 and never materialized on
host.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ogc_tpu.losses.seg_unsup import (
    fit_motion_svd_batch,
    interpolate_mask_by_flow,
    match_mask_by_iou,
)
from ogc_tpu.ops.core import square_distance
from ogc_tpu.refine.streaming import softmax_corr_apply

Array = jax.Array


def _rigid_project(pc: Array, flow: Array, mask_kn: Array) -> Array:
    """Fit per-object rigid motions to `flow` and blend by mask.

    :param pc: (B, N, 3); :param flow: (B, N, 3); :param mask_kn: (B, K, N).
    :return: rigidified flow (B, N, 3).
    """
    B, K, N = mask_kn.shape
    mask_rep = mask_kn.reshape(B * K, N)
    pc_rep = jnp.repeat(pc[:, None], K, axis=1).reshape(B * K, N, 3)
    flow_rep = jnp.repeat(flow[:, None], K, axis=1).reshape(B * K, N, 3)

    R, t = fit_motion_svd_batch(pc_rep, pc_rep + flow_rep, mask_rep)
    pc_tr = jnp.einsum(
        "bij,bnj->bni", R, pc_rep,
        precision=jax.lax.Precision.HIGHEST,  # scene-scale coords
    ) + t[:, None, :]
    pc_tr = pc_tr.reshape(B, K, N, 3)
    return jnp.einsum("bkn,bkni->bni", mask_kn, pc_tr) - pc


def weighted_kabsch(pc: Array, flow: Array, mask: Array) -> Array:
    """Per-object rigid projection of a flow field (oa_icp.py:16-38).

    :param pc: (B, N, 3); :param flow: (B, N, 3); :param mask: (B, N, K).
    """
    return _rigid_project(pc, flow, jnp.swapaxes(mask, 1, 2))


@functools.partial(
    jax.jit, static_argnames=("icp_iter", "dense", "tile")
)
def object_aware_icp(
    pc1: Array,
    pc2: Array,
    flow: Array,
    mask1: Array,
    mask2: Array,
    icp_iter: int = 10,
    temperature: float = 0.01,
    dense: Optional[bool] = None,
    tile: int = 1024,
) -> Array:
    """OA-ICP (oa_icp.py:41-84).

    :param pc1, pc2: (B, N, 3); :param flow: (B, N, 3) initial flow.
    :param mask1, mask2: (B, N, K) soft object masks of the two frames.
    :param dense: force the dense (N, N) path (small N / equivalence tests);
        by default dense is used only when N <= `tile`.  The blockwise path
        streams the softmax-matvec over pc2 tiles (flash recurrence) so peak
        memory is (B, N, tile), never (B, N, N) — the reference materializes
        the full cdist (oa_icp.py:66).
    :return: refined flow (B, N, 3).
    """
    N = pc1.shape[1]
    if dense is None:
        dense = N <= tile

    # Align object ordering across frames via flow-warped IoU matching.
    mask2_interp = interpolate_mask_by_flow(pc1, pc2, mask1, flow)
    perm = match_mask_by_iou(mask2_interp, mask2)
    mask2 = jnp.einsum("bij,bnj->bni", perm, mask2)

    mask1_kn = jnp.swapaxes(mask1, 1, 2)  # (B, K, N)

    if dense:
        # Object-consistency scores between all point pairs.
        consistency12 = jnp.einsum(
            "bmk,bnk->bmn", mask1, mask2,
            precision=jax.lax.Precision.HIGHEST,
        )

    def body(_, flow):
        # Soft correspondences from nearest-neighbor distances.  The
        # reference uses cdist (euclidean); softmax is shift-invariant per
        # row, so using squared distances would NOT be equivalent — keep the
        # sqrt.
        if dense:
            d = jnp.sqrt(
                jnp.maximum(square_distance(pc1 + flow, pc2), 0.0)
            )
            corr12 = jax.nn.softmax(-d / temperature, axis=-1)
            corr12 = corr12 * consistency12
            row_sum = jnp.maximum(jnp.sum(corr12, -1, keepdims=True), 1e-10)
            corr12 = corr12 / row_sum
            new_flow = (
                jnp.einsum(
                    "bmn,bnj->bmj", corr12, pc2,
                    precision=jax.lax.Precision.HIGHEST,
                )
                - pc1
            )
        else:
            # Blockwise: corr12 @ pc2 = num / (s0 * max(s1/s0, 1e-10)),
            # where s1/s0 is exactly the dense post-softmax row sum.
            num, s0, s1 = softmax_corr_apply(
                pc1 + flow, pc2, pc2, temperature,
                cons_q=mask1, cons_p=mask2, tile=tile,
            )
            denom = s0 * jnp.maximum(s1 / s0, 1e-10)
            new_flow = num / denom[..., None] - pc1
        return _rigid_project(pc1, new_flow, mask1_kn)

    return jax.lax.fori_loop(0, icp_iter, body, flow)
