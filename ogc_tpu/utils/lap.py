"""Jittable linear assignment (Hungarian) solver.

The reference escapes to scipy's `linear_sum_assignment` on the host once per
batch element inside the training loss (losses/seg_loss_unsup.py:234-237) and
in the mIoU metric (metrics/seg_metric.py:229).  On TPU that host round-trip
would break step fusion, so we implement the same shortest-augmenting-path
algorithm (Jonker-Volgenant, as in scipy's rectangular_lsap) with static
shapes and `lax.while_loop`s.  K is small (<= ~30 slots), so the O(K^3) cost
is negligible; the win is staying inside the compiled step.

Exact-equality with scipy is guaranteed for unique optima; for degenerate
(tied) optima any optimal assignment may be returned, matching scipy's own
unspecified tie behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Plain Python float: creating a jnp scalar at import time would initialize
# the JAX backend before CLIs get a chance to select the platform.
_INF = 1e30


def _solve_one(cost: jax.Array) -> jax.Array:
    """Solve a square LAP, minimizing.  cost: (K, K) -> col4row: (K,) int32."""
    K = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def assign_row(cur_row, carry):
        u, v, col4row, row4col = carry

        # Dijkstra over reduced costs from cur_row until an unassigned column
        # (the sink) is reached.
        def dijkstra_cond(state):
            _, _, _, _, _, sink, _ = state
            return sink < 0

        def dijkstra_body(state):
            shortest, pred, done, sr, min_val, sink, i = state
            sr = sr.at[i].set(True)
            d = min_val + cost[i] - u[i] - v  # (K,)
            upd = jnp.logical_and(~done, d < shortest)
            pred = jnp.where(upd, i, pred)
            shortest = jnp.where(upd, d, shortest)
            masked = jnp.where(done, _INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            done = done.at[j].set(True)
            unassigned = row4col[j] < 0
            sink = jnp.where(unassigned, j, -1)
            i = jnp.where(unassigned, i, row4col[j])
            return shortest, pred, done, sr, min_val, sink, i

        init = (
            jnp.full((K,), _INF, dtype=jnp.float32),  # shortest path costs
            jnp.zeros((K,), dtype=jnp.int32),  # predecessor row per col
            jnp.zeros((K,), dtype=bool),  # scanned cols
            jnp.zeros((K,), dtype=bool),  # scanned rows
            jnp.float32(0.0),
            jnp.int32(-1),  # sink
            cur_row.astype(jnp.int32),
        )
        shortest, pred, done, sr, min_val, sink, _ = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init
        )

        # Dual updates (scipy rectangular_lsap.cpp).
        row_ids = jnp.arange(K, dtype=jnp.int32)
        u = u.at[cur_row].add(min_val)
        visited_other = jnp.logical_and(sr, row_ids != cur_row)
        u = u + jnp.where(
            visited_other,
            min_val - shortest[jnp.clip(col4row, 0, K - 1)],
            0.0,
        )
        v = v - jnp.where(done, min_val - shortest, 0.0)

        # Augment along the alternating path back to cur_row.
        def aug_cond(state):
            _, _, _, stop = state
            return ~stop

        def aug_body(state):
            col4row, row4col, j, _ = state
            i = pred[j]
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return col4row, row4col, nxt, i == cur_row

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, jnp.bool_(False))
        )
        return u, v, col4row, row4col

    u = jnp.zeros((K,), dtype=jnp.float32)
    v = jnp.zeros((K,), dtype=jnp.float32)
    col4row = jnp.full((K,), -1, dtype=jnp.int32)
    row4col = jnp.full((K,), -1, dtype=jnp.int32)
    u, v, col4row, row4col = jax.lax.fori_loop(
        0, K, assign_row, (u, v, col4row, row4col)
    )
    return col4row


@functools.partial(jax.jit, static_argnums=(1,))
def linear_sum_assignment(cost: jax.Array, maximize: bool = False) -> jax.Array:
    """Batched square linear assignment.

    :param cost: (..., K, K) cost matrix/matrices.
    :param maximize: maximize total score instead of minimizing cost.
    :return: (..., K) int32 `col_ind` — column assigned to each row
        (row_ind is implicitly arange(K), as in scipy for square inputs).
    """
    if maximize:
        cost = -cost
    batch_shape = cost.shape[:-2]
    K = cost.shape[-1]
    flat = cost.reshape((-1, K, K))
    out = jax.vmap(_solve_one)(flat)
    return out.reshape(batch_shape + (K,))
