"""Blockwise (streaming-softmax) correspondence products.

The reference materializes dense (N, N) softmax correspondence matrices
(/root/reference/oa_icp.py:66, /root/reference/vote.py:26-27) — 268 MB/scene
f32 at 8192 points, several copies live at once, multiplied by batch size.
Here the softmax-matvec is computed over pc2 tiles with the running-max
rescaling pattern (the flash-attention recurrence), so peak transient memory
is (B, M, tile) instead of (B, M, N) and nothing N x N ever exists.

All quantities match the dense computation to float tolerance: the softmax
denominator is algebraically identical, only the summation order differs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ogc_tpu.ops.core import square_distance

Array = jax.Array


def softmax_corr_apply(
    q: Array,
    p2: Array,
    values: Array,
    temperature: float,
    cons_q: Optional[Array] = None,
    cons_p: Optional[Array] = None,
    tile: int = 1024,
) -> Tuple[Array, Array, Array]:
    """Streaming evaluation of exp(-|q - p2|/T) [* w] @ values, per row.

    With L[m, n] = -dist(q[m], p2[n]) / T and (optionally)
    w[m, n] = cons_q[m] . cons_p[n], returns the per-row running-max-stable
    triple:

      num[m] = sum_n exp(L[m,n] - gmax[m]) * w[m,n] * values[n]   (B, M, C)
      s0[m]  = sum_n exp(L[m,n] - gmax[m])                        (B, M)
      s1[m]  = sum_n exp(L[m,n] - gmax[m]) * w[m,n]               (B, M)

    from which callers reconstruct exactly the dense expressions:
      softmax(L) @ values                 = num / s0          (w == 1)
      (softmax(L)*w / rowsum) @ values    = num / s1, with the dense
        row_sum (post-softmax) available as s1 / s0 for clamp semantics.

    :param q: (B, M, 3) query points; :param p2: (B, N, 3) target points.
    :param values: (B, N, C); :param cons_q: (B, M, K); cons_p: (B, N, K).
    """
    B, N, C = values.shape
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        # Padded targets sit at 1e6 distance -> exp underflows to exactly 0.
        p2 = jnp.pad(p2, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
        values = jnp.pad(values, ((0, 0), (0, pad), (0, 0)))
        if cons_p is not None:
            cons_p = jnp.pad(cons_p, ((0, 0), (0, pad), (0, 0)))

    p2_t = p2.reshape(B, n_tiles, tile, 3).transpose(1, 0, 2, 3)
    val_t = values.reshape(B, n_tiles, tile, C).transpose(1, 0, 2, 3)
    if cons_p is not None:
        K = cons_p.shape[-1]
        consp_t = cons_p.reshape(B, n_tiles, tile, K).transpose(1, 0, 2, 3)
    else:
        consp_t = jnp.zeros((n_tiles, B, 0, 0), q.dtype)

    M = q.shape[1]
    init = (
        jnp.full((B, M), -1e30, q.dtype),     # running max
        jnp.zeros((B, M), q.dtype),           # s0
        jnp.zeros((B, M), q.dtype),           # s1
        jnp.zeros((B, M, C), q.dtype),        # num
    )

    def step(carry, xs):
        gmax, s0, s1, num = carry
        p2c, vc, cpc = xs
        d = jnp.sqrt(jnp.maximum(square_distance(q, p2c), 0.0))
        logit = -d / temperature  # (B, M, tile)
        m_new = jnp.maximum(gmax, jnp.max(logit, axis=-1))
        scale = jnp.exp(gmax - m_new)
        p = jnp.exp(logit - m_new[..., None])
        if cons_q is not None:
            w = jnp.einsum(
                "bmk,btk->bmt", cons_q, cpc,
                precision=jax.lax.Precision.HIGHEST,
            )
            pw = p * w
        else:
            pw = p
        s0 = s0 * scale + jnp.sum(p, axis=-1)
        s1 = s1 * scale + jnp.sum(pw, axis=-1)
        num = num * scale[..., None] + jnp.einsum(
            "bmt,btc->bmc", pw, vc, precision=jax.lax.Precision.HIGHEST
        )
        return (m_new, s0, s1, num), None

    (gmax, s0, s1, num), _ = jax.lax.scan(step, init, (p2_t, val_t, consp_t))
    return num, s0, s1
