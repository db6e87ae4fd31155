"""Unsupervised OGC segmentation losses (jittable, TPU-native).

Equivalents of the reference losses/seg_loss_unsup.py: rigid dynamic
consistency via weighted Kabsch, local smoothness (KNN + ball query),
invariance across augmented views (Hungarian-matched), plus entropy / rank
monitoring terms.  Everything is a pure function of arrays — no host escapes:
the Hungarian matching runs in-graph via ogc_tpu.utils.lap, and the rank
(nuclear norm) term is computed from the K x K Gram spectrum instead of an
N x K SVD.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ogc_tpu import ops
from ogc_tpu.utils.lap import linear_sum_assignment

Array = jax.Array


def fit_motion_svd_batch(
    pc1: Array, pc2: Array, mask: Optional[Array] = None
) -> Tuple[Array, Array]:
    """Weighted Kabsch: per-batch rigid (R, t) aligning pc1 -> pc2.

    :param pc1, pc2: (B, N, 3); :param mask: optional (B, N) weights.
    :return: R (B, 3, 3), t (B, 3).

    Reference: losses/seg_loss_unsup.py:10-61, including the reflection fix
    via det sign (:50-53) and the identity fallback for ill-posed batches
    (:40-42) — realized here with `jnp.where` masking instead of boolean
    indexing so the whole thing stays jittable.
    """
    B, N, _ = pc1.shape
    if mask is None:
        w = jnp.ones((B, N), dtype=pc1.dtype)
    else:
        w = mask
    w_sum = jnp.sum(w, axis=1, keepdims=True)  # (B, 1)
    # Ill-posed batches (zero total weight) are detected up front; their
    # means are computed with a safe denominator and overwritten at the end.
    valid = (w_sum[:, 0] > 1e-12)

    safe = jnp.maximum(w_sum, 1e-12)
    # HIGHEST precision throughout: the TPU default (single-pass bf16)
    # quantizes scene-scale coordinates (~30 m on KITTI) to ~0.125 m in
    # these products — centroids, R composition, and t would all carry
    # that error into the rigid fit (reference computes in full f32).
    hp = jax.lax.Precision.HIGHEST
    pc1_mean = jnp.einsum("bnd,bn->bd", pc1, w, precision=hp) / safe
    pc2_mean = jnp.einsum("bnd,bn->bd", pc2, w, precision=hp) / safe

    pc1_c = pc1 - pc1_mean[:, None, :]
    pc2_c = pc2 - pc2_mean[:, None, :]

    # Cross-covariance S = P1^T diag(w) P2 (reference :36).
    S = jnp.einsum(
        "bnd,bn,bne->bde", pc1_c, w, pc2_c,
        precision=jax.lax.Precision.HIGHEST,
    )
    valid = jnp.logical_and(valid, jnp.all(jnp.isfinite(S), axis=(1, 2)))
    S_safe = jnp.where(valid[:, None, None], S, jnp.eye(3, dtype=S.dtype))

    u, s, vt = jnp.linalg.svd(S_safe, full_matrices=True)
    v = jnp.swapaxes(vt, -1, -2)
    R0 = jnp.einsum("bij,bkj->bik", v, u, precision=hp)  # v @ u^T
    det = jnp.linalg.det(R0)
    # Reflection fix: flip the last singular direction when det < 0.
    diag = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # (B, 3)
    R = jnp.einsum("bij,bj,bkj->bik", v, diag, u, precision=hp)

    t = pc2_mean - jnp.einsum("bij,bj->bi", R, pc1_mean, precision=hp)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    R = jnp.where(valid[:, None, None], R, eye)
    t = jnp.where(valid[:, None], t, 0.0)
    return R, t


def dynamic_loss(pc: Array, mask: Array, flow: Array, loss_norm: int = 2) -> Array:
    """Rigid-consistency loss.

    Fit per-object rigid motion from the soft mask, transform the cloud by
    each object's motion (detached), blend by the mask, and penalize the
    deviation from pc + flow.  Reference: DynamicLoss
    (losses/seg_loss_unsup.py:64-98, detach at :91).
    """
    B, N, K = mask.shape
    pc2 = pc + flow
    mask_f = jnp.swapaxes(mask, 1, 2).reshape(B * K, N)
    pc_rep = jnp.repeat(pc[:, None], K, axis=1).reshape(B * K, N, 3)
    pc2_rep = jnp.repeat(pc2[:, None], K, axis=1).reshape(B * K, N, 3)

    R, t = fit_motion_svd_batch(pc_rep, pc2_rep, mask_f)
    pc_tr = jnp.einsum(
        "bij,bnj->bni", R, pc_rep,
        precision=jax.lax.Precision.HIGHEST,
    ) + t[:, None, :]
    pc_tr = jax.lax.stop_gradient(pc_tr.reshape(B, K, N, 3))

    blended = jnp.sum(mask_f.reshape(B, K, N)[..., None] * pc_tr, axis=1)
    resid = jnp.linalg.norm(blended - pc2, ord=loss_norm, axis=-1)
    return jnp.mean(resid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sym_grad_discrepancy(mask: Array, idx: Array, loss_norm: int) -> Array:
    """Neighbor discrepancy with a SYMMETRIC-graph gradient (opt-in).

    Forward is identical to the autodiff path: mean_{i,s} ||m_i - m_{j(i,s)}||.
    Backward assumes the neighbor relation is symmetric (j in N(i) <=> i in
    N(j)), under which the scatter-add transpose of the neighbor gather
    equals the gather itself and grad_q = 2/(BNS) sum_s d||.||(m_q - m_js) —
    NO scatter.  The knn / truncated-ball graphs are only approximately
    symmetric, so this changes the regularizer's gradient slightly; it is
    gated by OGCLossConfig.symmetric_smooth_grad (default False) and
    justified by the training ablation in PARITY.md.  Motivation: the
    scatter-add floor is ~17 ns/row — 104 ms of the 510 ms train step
    (BENCHLOG r2).
    """
    nn_mask = ops.group(mask, idx)
    diff = mask[:, :, None, :] - nn_mask
    if loss_norm == 1:
        per = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        per = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))
    return jnp.mean(per)


def _sym_grad_fwd(mask, idx, loss_norm):
    return _sym_grad_discrepancy(mask, idx, loss_norm), (mask, idx)


def _sym_grad_bwd(loss_norm, res, g):
    mask, idx = res
    nn_mask = ops.group(mask, jax.lax.stop_gradient(idx))
    diff = mask[:, :, None, :] - nn_mask
    if loss_norm == 1:
        d = jnp.sign(diff)
    else:
        norm = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True),
                                    1e-24))
        d = diff / norm
    B, N, S, _ = diff.shape
    grad = (2.0 * g / (B * N * S)) * jnp.sum(d, axis=2)
    return grad, None


_sym_grad_discrepancy.defvjp(_sym_grad_fwd, _sym_grad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ref_graph_discrepancy(mask: Array, idx: Array, loss_norm: int,
                           scatter_kernel: bool) -> Array:
    """Reference-graph neighbor discrepancy with a LEAN-residual exact
    VJP (r5 arm against the 'duplicated fwd' cost the r5 arm table
    attributes to the autodiff path: smooth fwd+bwd 285 ms under
    jax.grad vs symgrad's 135 ms, of which only ~71 ms is the backward
    increment — the rest is residual/fusion structure).

    Forward is bit-identical to the default tail (ops.group +
    _neighbor_discrepancy without cross-entropy).  Backward saves ONLY
    (mask, idx), recomputes the gather, and emits the exact gradient
        grad = g/(B*N*S) * (sum_s phi'(diff) - scatter_add(phi'(diff)))
    — the same math autodiff produces (scatter reuses ops.group's own
    VJP, including the opt-in Pallas kernel), but with no stored
    (B, N, S, K) residuals crossing the fwd/bwd boundary.  Semantics:
    reference losses/seg_loss_unsup.py:101-158; the L1 subgradient at
    exactly-zero diffs uses sign(0)=0 like every custom VJP here
    (self-edges cancel between the direct and transpose terms either
    way), and loss_norm=2 uses the same 1e-24 guard as
    _mutual_discrepancy — plain autodiff NaNs on self-edges there
    (norm'(0)); no shipped config uses L2 smooth terms."""
    nn_mask = ops.group(mask, jax.lax.stop_gradient(idx),
                        scatter_kernel_bwd=scatter_kernel)
    return _neighbor_discrepancy(mask, nn_mask, False, loss_norm)


def _ref_graph_fwd(mask, idx, loss_norm, scatter_kernel):
    return (_ref_graph_discrepancy(mask, idx, loss_norm, scatter_kernel),
            (mask, idx))


def _ref_graph_bwd(loss_norm, scatter_kernel, res, g):
    mask, idx = res
    idx = jax.lax.stop_gradient(idx)
    nn_mask, pull = jax.vjp(
        lambda m: ops.group(m, idx, scatter_kernel_bwd=scatter_kernel),
        mask)
    diff = mask[:, :, None, :] - nn_mask
    if loss_norm == 1:
        d = jnp.sign(diff)
    else:
        norm = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True),
                                    1e-24))
        d = diff / norm
    B, N, S, _ = diff.shape
    scale = g / (B * N * S)
    grad = scale * (jnp.sum(d, axis=2) - pull(d)[0])
    return grad.astype(mask.dtype), None


_ref_graph_discrepancy.defvjp(_ref_graph_fwd, _ref_graph_bwd)


def mutual_keep_mask(idx: Array) -> Array:
    """Symmetrize a neighbor table into an EXACTLY symmetric edge multiset.

    :param idx: (B, N, S) int32 self-neighbor table (idx[b, i, s] = j means
        directed edge i -> j).
    :return: (B, N, S) bool; slot (i, s) is kept iff it is the FIRST
        occurrence of j in row i (dedup) AND the relation is mutual
        (i appears somewhere in row j).

    Property (the basis of the exact scatter-free gradient in
    _mutual_discrepancy): for every unordered pair {i, j} with mutual
    membership, exactly ONE slot of row i and ONE slot of row j is kept —
    the kept directed edges form a symmetric multiset.  Self-loops (j == i,
    e.g. the radius-clamp replacement in knn_smooth_loss or slot 0 of a
    self-KNN) may be kept but contribute 0 to the smoothness value and
    gradient (phi(0) = 0, phi'(0) = 0 for the L1/L2 discrepancies).

    Cost: one (B*N*S)-row gather of the S-int neighbor rows + (B, N, S, S)
    integer compares — paid once per frame in the forward; the payoff is
    deleting the scatter-add transpose (~17 ns/row) from the backward.
    """
    B, N, S = idx.shape
    # First-occurrence dedup: eq[..., s, s'] == (idx[s] == idx[s']).
    eq = idx[..., :, None] == idx[..., None, :]  # (B, N, S, S)
    strict_lower = jnp.tril(jnp.ones((S, S), bool), k=-1)
    first = ~jnp.any(eq & strict_lower, axis=-1)  # (B, N, S)
    # Mutuality: gather neighbor rows and test membership of i.
    nbr_rows = ops.group(idx, idx)  # (B, N, S, S) — row of each neighbor j
    i_ids = jnp.arange(N, dtype=idx.dtype)[None, :, None, None]
    mutual = jnp.any(nbr_rows == i_ids, axis=-1)  # (B, N, S)
    return first & mutual


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mutual_discrepancy(
    mask: Array, idx: Array, keep: Array, loss_norm: int
) -> Array:
    """Neighbor discrepancy over a symmetric-by-construction edge multiset
    with an EXACT scatter-free gradient.

    loss = 1/(B*N*S) * sum_{(i,s) kept} phi(m_i - m_{idx[i,s]}) where `keep`
    comes from mutual_keep_mask(idx).  Because the kept directed edges form
    a symmetric multiset and phi' is odd, the exact gradient is
        grad_q = 2/(B*N*S) * sum_{s kept} phi'(m_q - m_{idx[q,s]})
    — no scatter-add transpose (the incoming-edge sum mirrors the outgoing
    one).  Unlike _sym_grad_discrepancy (which applies this formula to the
    raw asymmetric KNN/ball graph as an approximation), here it is the true
    VJP of the forward; tests/test_seg_losses.py pins custom-vjp == autodiff.
    Saves (diff, keep) as residuals so the backward re-gathers nothing.
    """
    nn_mask = ops.group(mask, jax.lax.stop_gradient(idx))
    diff = mask[:, :, None, :] - nn_mask
    if loss_norm == 1:
        per = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        per = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))
    return jnp.mean(jnp.where(keep, per, 0.0))


def _mutual_fwd(mask, idx, keep, loss_norm):
    nn_mask = ops.group(mask, jax.lax.stop_gradient(idx))
    diff = mask[:, :, None, :] - nn_mask
    if loss_norm == 1:
        per = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        per = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))
    return jnp.mean(jnp.where(keep, per, 0.0)), (diff, keep)


def _mutual_bwd(loss_norm, res, g):
    diff, keep = res
    if loss_norm == 1:
        d = jnp.sign(diff)
    else:
        norm = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True),
                                    1e-24))
        d = diff / norm
    B, N, S, _ = diff.shape
    d = jnp.where(keep[..., None], d, 0.0)
    grad = (2.0 * g / (B * N * S)) * jnp.sum(d, axis=2)
    return grad.astype(diff.dtype), None, None


_mutual_discrepancy.defvjp(_mutual_fwd, _mutual_bwd)


def _first_occurrence(idx: Array) -> Array:
    """(B, N, S) bool: slot s is the first occurrence of its value in row
    i (the dedup half of mutual_keep_mask)."""
    eq = idx[..., :, None] == idx[..., None, :]  # (B, N, S, S)
    strict_lower = jnp.tril(jnp.ones((idx.shape[-1],) * 2, bool), k=-1)
    return ~jnp.any(eq & strict_lower, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mutual_discrepancy_scalar(mask, aux, idx, pc, loss_norm, kind):
    """Mutual-graph neighbor discrepancy with the SCALAR membership test —
    identical math to mutual_keep_mask + _mutual_discrepancy, one gather
    instead of three.

    The r4 train-step timeline (tools/roofline_calibrate.py) showed the
    mutual test's neighbor-LIST gathers (ops.group(idx, idx): 64/32-wide
    int rows per edge) plus their compare-reduces cost ~50 ms/step — all
    to answer "is i in row(j)?".  But row membership is decidable from
    per-point SCALARS, because the exact tables are lexicographic prefixes:

      knn (raw):  i in knn(j)  <=>  (d2(i,j), i) <=lex (theta_d2_j, theta_i_j)
                  where theta = j's k-th (distance, index) pair;
      + clamp:    i in clamped_row(j) <=> (i in knn(j) AND sqrt(d2) <= radius)
                  OR (i == nearest_j AND j clamped any slot);
      ball:       i in ball(j)  <=>  d2(i,j) < r^2 AND i <= max(row(j))
                  (selection is ascending-index; when not full, max is the
                  largest in-radius index, so the same test covers both).

    These scalars ride THE SAME gather as the mask columns (the gathers
    are row-latency-bound, so wider rows are free), deleting the
    neighbor-list gathers outright.  d2 is the direct per-coordinate form
    — algebraically the exact Pallas kernels' selection metric.  Two
    knife-edge caveats (ADVICE r4): (a) XLA may FMA-contract the x^2+y^2
    +z^2 chain here while the Mosaic kernel computes it uncontracted, a
    ~1-ulp divergence class the repo has observed on-chip (FPS commit
    ea4d2fd) — a pair EXACTLY on a tie/threshold boundary could flip
    membership vs the table; (b) under the XLA exact fallback the
    selection metric is the MXU expansion, diverging by ~|p||q|*eps.
    Either flip breaks the kept-multiset symmetry for that rare edge
    (the VJP then mis-weights it by 2x/0x).  CPU oracle tests use
    grid-quantized clouds where every d2 is exact; on-chip the
    scalar-vs-gather A/B in tools/tpu_e2e_smoke.py (--scalar_mutual_ab)
    bounds the divergence on continuous clouds.

    :param mask: (B, N, K) slot probabilities (differentiated).
    :param aux: (B, N, A) per-point scalar columns, stop-gradient:
        knn:  [theta_d2, theta_i, nearest_i, any_clamp]
        ball: [maxvalid]
    :param idx: (B, N, S) neighbor table (clamped / filled).
    :param pc: (B, N, 3) points (stop-gradient; d2 reconstruction).
    :param kind: ("knn", radius) or ("ball", radius) — trace-time static.
    """
    loss, _ = _mutual_scalar_fwd(mask, aux, idx, pc, loss_norm, kind)
    return loss


def _mutual_scalar_fwd(mask, aux, idx, pc, loss_norm, kind):
    B, N, K = mask.shape
    idx = jax.lax.stop_gradient(idx)
    src = jnp.concatenate(
        [mask.astype(jnp.float32), pc, aux], axis=-1)  # (B, N, K+3+A)
    G = ops.group(src, idx)                            # ONE gather
    nn_mask = G[..., :K]
    g_xyz = G[..., K:K + 3]
    g_aux = G[..., K + 3:]

    diff = mask[:, :, None, :].astype(jnp.float32) - nn_mask
    if loss_norm == 1:
        per = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        per = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))

    d = pc[:, :, None, :] - g_xyz
    d2_e = d[..., 0] ** 2 + d[..., 1] ** 2 + d[..., 2] ** 2  # direct form
    i_ids = jnp.arange(N, dtype=jnp.float32)[None, :, None]
    what, radius = kind
    if what == "knn":
        th_d2, th_i, near_i, anyclamp = (
            g_aux[..., 0], g_aux[..., 1], g_aux[..., 2], g_aux[..., 3])
        in_raw = (d2_e < th_d2) | ((d2_e == th_d2) & (i_ids <= th_i))
        # "unclamped slot" is the reference's sqrt-domain test: a slot
        # survives iff dist <= radius (knn_smooth_loss clamps dist>radius).
        cond1 = in_raw & (jnp.sqrt(d2_e) <= radius)
        cond2 = (i_ids == near_i) & (anyclamp > 0)
        mutual = cond1 | cond2
    else:
        maxvalid = g_aux[..., 0]
        mutual = (d2_e < radius * radius) & (i_ids <= maxvalid)
    keep = _first_occurrence(idx) & mutual
    loss = jnp.mean(jnp.where(keep, per, 0.0))
    # diff is f32 (the fused gather promotes); remember the PRIMAL mask
    # dtype via a zero-sized sentinel so the custom VJP returns a matching
    # cotangent under bf16 compute (residuals must be JAX types).
    return loss, (diff, keep, jnp.zeros((0,), mask.dtype))


def _mutual_scalar_bwd(loss_norm, kind, res, g):
    diff, keep, dt_sentinel = res
    mask_dtype = dt_sentinel.dtype
    if loss_norm == 1:
        d = jnp.sign(diff)
    else:
        norm = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True),
                                    1e-24))
        d = diff / norm
    B, N, S, _ = diff.shape
    d = jnp.where(keep[..., None], d, 0.0)
    grad = (2.0 * g / (B * N * S)) * jnp.sum(d, axis=2)
    return grad.astype(mask_dtype), None, None, None


_mutual_discrepancy_scalar.defvjp(_mutual_scalar_fwd, _mutual_scalar_bwd)


def _knn_mutual_aux(pc, dist, idx_raw, radius):
    """Per-point scalar columns for the knn scalar-mutual test (all f32;
    indices < 2^24 are exact in f32).  theta_d2 is the DIRECT-form d2 to
    the k-th raw neighbor — bitwise the exact kernel's selection metric."""
    kth = idx_raw[..., -1]                       # (B, N)
    kth_xyz = jnp.take_along_axis(pc, kth[..., None], axis=1, mode="clip")
    dd = pc - kth_xyz
    th_d2 = dd[..., 0] ** 2 + dd[..., 1] ** 2 + dd[..., 2] ** 2
    any_clamp = jnp.any(dist > radius, axis=-1)
    return jnp.stack(
        [th_d2, kth.astype(jnp.float32),
         idx_raw[..., 0].astype(jnp.float32),
         any_clamp.astype(jnp.float32)], axis=-1)


def _neighbor_discrepancy(
    mask: Array, nn_mask: Array, cross_entropy: bool, loss_norm: int
) -> Array:
    """Shared tail of the KNN / ball-query smoothness terms.

    :param mask: (B, N, K); :param nn_mask: (B, N, S, K) neighbor masks.
    """
    if cross_entropy:
        target = jax.lax.stop_gradient(
            jnp.broadcast_to(mask[:, :, None, :], nn_mask.shape)
        )
        eps = 1e-7
        p = jnp.clip(nn_mask, eps, 1.0 - eps)
        bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
        loss = jnp.sum(bce, axis=-1).mean(axis=-1)  # sum K, mean S
    else:
        diff = mask[:, :, None, :] - nn_mask
        loss = jnp.linalg.norm(diff, ord=loss_norm, axis=-1).mean(axis=-1)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# MXU edge engine (r5): smooth-loss edges as block-sparse one-hot matmuls
# ---------------------------------------------------------------------------
#
# The smooth losses' edge gather/scatter rides the flat per-row wall
# (~7.1 ns/row gathers, ~11-18 ns/row scatter-adds) while the MXU idles —
# VERDICT r4 #1.  On a Morton-SORTED cloud the tables become
# block-coherent (probe: <= 27 distinct 128-blocks per 256-query tile),
# so ops/pallas_onehot.group_blocksparse turns both directions into
# candidate-block one-hot matmuls.  Engine-specific pieces:
#
#  - The cloud (and mask) are permuted into Morton order inside the loss;
#    the loss value is a mean over edges, so the permutation only changes
#    WHICH approximate edges get picked (tie/fill order), not the loss's
#    semantics class; mask gradients ride the inverse permutation.
#  - Approximate flash search CANNOT run on a sorted cloud directly (its
#    per-block thinning keeps one candidate per consecutive block — on a
#    spatially-coherent order a query's whole neighborhood collapses into
#    ~2 blocks and recall dies).  Fix: present the candidates in
#    STRIDE-SHUFFLED order (j -> (j*stride) mod N, stride coprime to N,
#    an arithmetic permutation), search against that, and remap returned
#    indices back with the same closed form — no gather, recall restored
#    to the random-order baseline.
#  - Exact tables work on the sorted cloud as-is (the pruned-exact
#    kernels Morton-sort internally anyway); knn tie order and crowded-
#    ball fill order follow SORTED indices (same deviation class as
#    deviation 1/approx mode; engine is a fast-mode opt-in — parity
#    configs keep the gather engine on the original order).


def _coprime_stride(n: int) -> int:
    import math

    s = max(3, int(n * 0.618) | 1)
    while math.gcd(s, n) != 1:
        s += 2
    return s


def _shuffled_approx_tables(pc_s: Array, knn_k: int, ball_k: int,
                            ball_radius: float):
    """Approx KNN + ball tables of a SORTED cloud via the stride shuffle.

    :return: (knn_dist, knn_idx, ball_idx) with indices in sorted
        coordinates."""
    B, N, _ = pc_s.shape
    s = _coprime_stride(N)
    j = jnp.arange(N, dtype=jnp.int32)
    shuf_pos = (j * s) % N
    shuffled = jnp.take_along_axis(
        pc_s, shuf_pos[None, :, None], axis=1, mode="clip")
    dist, idx_shuf = ops.knn(knn_k, pc_s, shuffled, exact=False)
    knn_idx = (idx_shuf * s) % N
    ball_shuf = ops.ball_query(ball_radius, ball_k, shuffled, pc_s,
                               exact=False)
    ball_idx = (ball_shuf * s) % N
    return dist, knn_idx, ball_idx


def _edge_phi(diff: Array, loss_norm: int) -> Array:
    """Per-edge norm over the K mask channels: (..., S, K) -> (..., S)."""
    if loss_norm == 1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))


def _smooth_mxu(pc: Array, mask: Array, cfg: "OGCLossConfig") -> Array:
    """Reference-graph SmoothLoss with both edge tables through ONE
    block-sparse one-hot grouping call (w_knn * KnnLoss + w_ball_q *
    BallQLoss, reference losses/seg_loss_unsup.py:101-180).

    Ball fill correction: ball_query pads under-full rows by repeating
    the FIRST member — on a permuted cloud "first" changes, and the fill
    carries (S-occ)/S of the row's weight.  The member of minimum
    ORIGINAL index is recovered via an extra gathered channel (the
    original-index column rides the same one-hot matmul for free) and
    the fill mass is reassigned to it analytically, restoring the
    reference's fill semantics exactly.  (Self-balls are never empty —
    d2(i,i)=0 < r^2 — so the reference's empty-ball row-0 convention
    never fires here.)  Remaining edge-set deviation: CROWDED balls
    (occupancy > S) keep a sorted-order member subset, and exact-tie knn
    orderings follow sorted indices — the deviation class of the approx
    tables (PARITY.md), n=10-ablated.
    """
    from ogc_tpu.ops.pallas_onehot import group_blocksparse

    B, N, K = mask.shape
    from ogc_tpu.ops.pallas_knn import morton_codes

    perm = jnp.argsort(
        morton_codes(jax.lax.stop_gradient(pc)), axis=-1)
    perm = jax.lax.stop_gradient(perm)
    pc_s = jax.lax.stop_gradient(
        jnp.take_along_axis(pc, perm[..., None], axis=1, mode="clip"))
    mask_s = jnp.take_along_axis(
        mask, perm[..., None], axis=1, mode="clip")
    exact = ops.exact_neighbors() if cfg.smooth_exact is None \
        else bool(cfg.smooth_exact)
    if exact:
        dist, idx_raw = ops.knn(cfg.knn_k, pc_s, pc_s, exact=True)
        ball_idx = ops.ball_query(
            cfg.ball_q_radius, cfg.ball_q_k, pc_s, pc_s, exact=True)
    else:
        dist, idx_raw, ball_idx = _shuffled_approx_tables(
            pc_s, cfg.knn_k, cfg.ball_q_k, cfg.ball_q_radius)
    knn_idx = jnp.where(dist > cfg.knn_radius, idx_raw[..., :1], idx_raw)
    cat = jax.lax.stop_gradient(
        jnp.concatenate([knn_idx, ball_idx], axis=-1))
    # Original-index column (f32 exact below 2^24) rides the gather.
    src = jnp.concatenate(
        [mask_s, jax.lax.stop_gradient(perm).astype(mask_s.dtype)[..., None]],
        axis=-1)
    nn = group_blocksparse(src, cat, N)  # (B, N, S1+S2, K+1)
    k1 = cfg.knn_k
    l_knn = _neighbor_discrepancy(
        mask_s, nn[:, :, :k1, :K], False, cfg.knn_loss_norm)

    nn_ball = nn[:, :, k1:, :K]
    orig_ball = jax.lax.stop_gradient(nn[:, :, k1:, K])  # (B, N, S2)
    S2 = cfg.ball_q_k
    phi = _edge_phi(mask_s[:, :, None, :] - nn_ball,
                    cfg.ball_q_loss_norm)  # (B, N, S2)
    bidx = cat[:, :, k1:]
    fills = jnp.sum(
        (bidx[..., 1:] == bidx[..., :1]).astype(jnp.float32), axis=-1)
    # fills = S2 - occ: repeats of the first member beyond slot 0.
    s_star = jnp.argmin(orig_ball, axis=-1)  # min ORIGINAL index member
    phi_star = jnp.take_along_axis(phi, s_star[..., None], axis=-1)[..., 0]
    row = jnp.sum(phi, axis=-1) + fills * (phi_star - phi[..., 0])
    l_bq = jnp.mean(row) / S2
    return cfg.smooth_w_knn * l_knn + cfg.smooth_w_ball_q * l_bq


def _scalar_mutual_ok(exact) -> bool:
    """The scalar membership test is valid only on EXACT tables (lex-prefix
    property); approx flash tables can list j without listing i back, and
    the scalar test cannot see that — the kept multiset would lose the
    symmetry the exact scatter-free VJP relies on.  Trace-time resolution,
    same jit-pinning semantics as ops.knn's own `exact=None` (CLAUDE.md).
    """
    return ops.exact_neighbors() if exact is None else bool(exact)


def knn_smooth_loss(
    pc: Array, mask: Array, k: int, radius: float,
    cross_entropy: bool = False, loss_norm: int = 1,
    symmetric_grad: bool = False, graph: str = "reference",
    exact: Optional[bool] = None, scatter_kernel_bwd: bool = False,
    ref_bwd: str = "autodiff",
) -> Array:
    """KNN smoothness with radius clamp (reference KnnLoss,
    losses/seg_loss_unsup.py:101-129).

    graph="mutual" replaces the raw (asymmetric) clamped-KNN edge set by
    its mutualized subset whose scatter-free gradient is exact — opt-in
    since r5 (10-seed PQ deficit, see OGCLossConfig.smooth_graph /
    PARITY.md).  On EXACT tables the membership test is
    the r4 SCALAR form (_mutual_discrepancy_scalar: one fused gather; the
    r3 neighbor-list gathers cost ~50 ms/step); approx tables keep the
    gather-based test (scalar membership needs the lex-prefix property).
    "mutual_gather" forces the gather test (the oracle); "reference"
    keeps reference semantics.

    :param exact: per-call neighbor-search mode override (None = the
        ops-global default).  OGCLossConfig.smooth_exact routes here —
        exact smooth-loss tables are both closer to the reference AND
        enable the scalar mutual path.
    """
    dist, idx_raw = ops.knn(k, pc, pc, exact=exact)
    idx = jnp.where(dist > radius, idx_raw[..., :1], idx_raw)
    idx = jax.lax.stop_gradient(idx)
    if graph == "mutual" and not cross_entropy \
            and _scalar_mutual_ok(exact):
        aux = jax.lax.stop_gradient(
            _knn_mutual_aux(pc, dist, idx_raw, radius))
        return _mutual_discrepancy_scalar(
            mask, aux, idx, jax.lax.stop_gradient(pc),
            loss_norm, ("knn", float(radius)))
    if graph in ("mutual", "mutual_gather") and not cross_entropy:
        keep = jax.lax.stop_gradient(mutual_keep_mask(idx))
        return _mutual_discrepancy(mask, idx, keep, loss_norm)
    if symmetric_grad and not cross_entropy:
        return _sym_grad_discrepancy(mask, idx, loss_norm)
    if ref_bwd == "lean" and not cross_entropy:
        return _ref_graph_discrepancy(mask, idx, loss_norm,
                                      scatter_kernel_bwd)
    if ref_bwd == "remat" and not cross_entropy:
        term = jax.checkpoint(
            lambda m: _neighbor_discrepancy(
                m, ops.group(m, idx, scatter_kernel_bwd=scatter_kernel_bwd),
                False, loss_norm))
        return term(mask)
    nn_mask = ops.group(mask, idx, scatter_kernel_bwd=scatter_kernel_bwd)
    return _neighbor_discrepancy(mask, nn_mask, cross_entropy, loss_norm)


def ball_q_smooth_loss(
    pc: Array, mask: Array, k: int, radius: float,
    cross_entropy: bool = False, loss_norm: int = 1,
    symmetric_grad: bool = False, graph: str = "reference",
    exact: Optional[bool] = None, scatter_kernel_bwd: bool = False,
    ref_bwd: str = "autodiff",
) -> Array:
    """Ball-query smoothness (reference BallQLoss,
    losses/seg_loss_unsup.py:132-158).  graph="mutual" / `exact` as in
    knn_smooth_loss (also drops the reference's spurious empty-ball ->
    point-0 edges unless point 0 reciprocates)."""
    idx = jax.lax.stop_gradient(
        ops.ball_query(radius, k, pc, pc, exact=exact))
    if graph == "mutual" and not cross_entropy \
            and _scalar_mutual_ok(exact):
        # maxvalid covers full AND under-full balls: selection is the
        # ascending-index in-radius prefix, and fill slots repeat the
        # first (lowest) member, so the row max IS the last selected.
        aux = jax.lax.stop_gradient(
            jnp.max(idx, axis=-1).astype(jnp.float32)[..., None])
        return _mutual_discrepancy_scalar(
            mask, aux, idx, jax.lax.stop_gradient(pc),
            loss_norm, ("ball", float(radius)))
    if graph in ("mutual", "mutual_gather") and not cross_entropy:
        keep = jax.lax.stop_gradient(mutual_keep_mask(idx))
        return _mutual_discrepancy(mask, idx, keep, loss_norm)
    if symmetric_grad and not cross_entropy:
        return _sym_grad_discrepancy(mask, idx, loss_norm)
    if ref_bwd == "lean" and not cross_entropy:
        return _ref_graph_discrepancy(mask, idx, loss_norm,
                                      scatter_kernel_bwd)
    if ref_bwd == "remat" and not cross_entropy:
        term = jax.checkpoint(
            lambda m: _neighbor_discrepancy(
                m, ops.group(m, idx, scatter_kernel_bwd=scatter_kernel_bwd),
                False, loss_norm))
        return term(mask)
    nn_mask = ops.group(mask, idx, scatter_kernel_bwd=scatter_kernel_bwd)
    return _neighbor_discrepancy(mask, nn_mask, cross_entropy, loss_norm)


def interpolate_mask_by_flow(
    pc1: Array, pc2: Array, mask1: Array, flow1: Array, k: int = 1
) -> Array:
    """Warp pc1 by flow1 and carry its mask onto pc2 via (inverse-distance
    weighted) KNN.  Reference: losses/seg_loss_unsup.py:183-209.  Used by
    OA-ICP and voting."""
    warped = pc1 + flow1
    dist, idx = ops.knn(k, pc2, warped)
    nn_mask = ops.group(mask1, jax.lax.stop_gradient(idx))  # (B, N, k, K)
    if k == 1:
        return nn_mask[:, :, 0, :]
    dist = jnp.maximum(dist, 1e-10)
    recip = 1.0 / dist
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return jnp.sum(weight[..., None] * nn_mask, axis=2)


def match_mask_by_iou(mask1: Array, mask2: Array) -> Array:
    """Hungarian-match hard (argmax) object masks by IoU.

    :return: perm (B, K, K) permutation matrices aligning mask2's objects to
        mask1's.  Reference: losses/seg_loss_unsup.py:212-240 — but the
        per-batch scipy host call (:234-237) is replaced by the in-graph LAP
        solver so the training step stays fused.
    """
    B, N, K = mask1.shape
    seg1 = jax.lax.stop_gradient(jnp.argmax(mask1, axis=-1))
    seg2 = jax.lax.stop_gradient(jnp.argmax(mask2, axis=-1))
    oh1 = jax.nn.one_hot(seg1, K, dtype=jnp.float32)
    oh2 = jax.nn.one_hot(seg2, K, dtype=jnp.float32)
    inter = jnp.einsum(
        "bng,bnp->bgp", oh1, oh2, precision=jax.lax.Precision.HIGHEST
    )
    union = (
        jnp.sum(oh1, axis=1)[..., None] + jnp.sum(oh2, axis=1)[:, None, :] - inter
    )
    iou = inter / jnp.maximum(union, 1e-10)
    col_ind = linear_sum_assignment(iou, True)  # (B, K), maximize IoU
    return jax.nn.one_hot(col_ind, K, dtype=jnp.float32)  # (B, K, K)


def invariance_loss(
    mask1: Array, mask2: Array, cross_entropy: bool = False, loss_norm: int = 2
) -> Array:
    """Symmetric invariance between two augmented views after Hungarian
    alignment.  Reference: InvarianceLoss (losses/seg_loss_unsup.py:243-280).
    """

    def distance(pred, target):
        if cross_entropy:
            eps = 1e-7
            p = jnp.clip(pred, eps, 1.0 - eps)
            bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
            return jnp.mean(jnp.sum(bce, axis=1))
        return jnp.mean(jnp.linalg.norm(pred - target, ord=loss_norm, axis=-1))

    perm2 = match_mask_by_iou(mask1, mask2)
    hp = jax.lax.Precision.HIGHEST  # exact permutation application
    target1 = jax.lax.stop_gradient(
        jnp.einsum("bij,bnj->bni", perm2, mask2, precision=hp)
    )
    perm1 = match_mask_by_iou(mask2, mask1)
    target2 = jax.lax.stop_gradient(
        jnp.einsum("bij,bnj->bni", perm1, mask1, precision=hp)
    )
    return distance(mask1, target1) + distance(mask2, target2)


def entropy_loss(mask: Array, epsilon: float = 1e-5) -> Array:
    """Per-point entropy of the soft mask (monitoring only).
    Reference: losses/seg_loss_unsup.py:283-297."""
    return jnp.mean(-jnp.sum(mask * jnp.log(jnp.maximum(mask, epsilon)), axis=-1))


def rank_loss(mask: Array, ns_iters: int = 24) -> Array:
    """Nuclear norm of the (N, K) mask (monitoring only).

    Reference: losses/seg_loss_unsup.py:300-314.  ||M||_* = tr(sqrtm(M^T M)):
    the K x K matrix square root is computed with a Newton-Schulz iteration
    (pure batched matmuls) instead of eigvalsh — TPU's QDWH-based eigh costs
    ~7 ms even for (B, 10, 10), ~50x this iteration, and a monitor only
    needs ~4 digits.
    """
    gram = jnp.einsum(
        "bnk,bnl->bkl", mask, mask, precision=jax.lax.Precision.HIGHEST
    )
    K = gram.shape[-1]
    eye = jnp.eye(K, dtype=gram.dtype)
    # Normalize so the spectrum lies in (0, 1]; add a tiny ridge for
    # rank-deficient masks (sqrt is not smooth at 0).
    scale = jnp.trace(gram, axis1=-2, axis2=-1)[..., None, None] + 1e-6
    a = gram / scale + 1e-9 * eye

    # HIGHEST precision on the K x K iteration matmuls: the TPU default
    # (single-pass bf16) accumulates enough error over ~24 Newton-Schulz
    # steps to diverge to NaN (observed on-chip via the rank monitor; CPU
    # tests never see it).  These are 10x10 matmuls — free at any precision.
    mm = functools.partial(
        jnp.matmul, precision=jax.lax.Precision.HIGHEST
    )

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - mm(z, y))
        return mm(y, t), mm(t, z)

    z0 = jnp.broadcast_to(eye, a.shape)
    y, _ = jax.lax.fori_loop(0, ns_iters, body, (a, z0))
    # tr(sqrtm(gram)) = sqrt(scale) * tr(sqrtm(a))
    tr = jnp.trace(y, axis1=-2, axis2=-1) * jnp.sqrt(scale[..., 0, 0])
    return jnp.mean(tr)


@dataclasses.dataclass(frozen=True)
class OGCLossConfig:
    """Weights / scheduling for the combined loss (mirrors the reference
    YAML `loss:` block, e.g. config/seg/sapien/sapien_unsup.yaml)."""

    weights: Tuple[float, float, float] = (10.0, 0.1, 0.1)  # dynamic/smooth/inv
    start_steps: Tuple[int, int, int] = (0, 0, 0)
    dynamic_loss_norm: int = 2
    smooth_w_knn: float = 3.0
    smooth_w_ball_q: float = 1.0
    knn_k: int = 8
    knn_radius: float = 0.1
    knn_loss_norm: int = 1
    ball_q_k: int = 16
    ball_q_radius: float = 0.2
    ball_q_loss_norm: int = 1
    invariance_loss_norm: int = 2
    cross_entropy: bool = False
    # Scatter-free smooth-loss backward assuming a symmetric neighbor graph
    # (see _sym_grad_discrepancy); opt-in, ablation in PARITY.md.  Applies
    # only when smooth_graph == "reference".
    symmetric_smooth_grad: bool = False
    # Smooth-loss neighbor graph.  "reference" (DEFAULT, r5) keeps the
    # reference's raw asymmetric KNN/ball graphs
    # (losses/seg_loss_unsup.py:101-180).  "mutual" mutualizes the edges
    # so the scatter-free gradient is EXACT on the sparser graph —
    # deleting the scatter-add backward wall (~104 ms/step at B=8 x 8192,
    # BENCHLOG r2) — and was the r3/r4 default under a 5-seed
    # accuracy-neutrality defense; the r5 10-seed paired ablation
    # OVERTURNED that (PQ deficit -0.022 ± 0.020, paired p=0.007 at 24
    # epochs — PARITY.md graph tables), so mutual is now opt-in with its
    # accuracy cost documented.  r4: mutual membership on exact tables is
    # the SCALAR test (_mutual_discrepancy_scalar, one fused gather);
    # "mutual_gather" keeps the gather-based test (the oracle).
    smooth_graph: str = "reference"
    # Neighbor-search mode for the smooth-loss tables only (None = the
    # ops-global default).  True runs the smooth KNN/ball exact even in
    # fast (approx) training: reference-faithful edges AND the scalar
    # mutual path (the exact kernels + ball pruning vs the ~50 ms of
    # membership gathers — on-chip A/B in bench_train.py, BENCHLOG r4).
    smooth_exact: Optional[bool] = None
    # Smooth-loss edge engine (r5): "gather" = XLA row gather/scatter on
    # the original point order (reference-faithful edge sets); "mxu" =
    # Morton-sort + block-sparse one-hot matmuls (_smooth_mxu) — trades
    # the per-row latency wall for MXU/VPU compute (on-chip A/B in
    # bench_train.py).  "mxu" applies to the reference graph without
    # cross_entropy/symmetric_grad; other combos fall back to "gather".
    # Fast-mode opt-in: the sorted order changes approx tie/fill edge
    # picks (deviation class of PARITY.md deviation 1).
    smooth_edge_engine: str = "gather"
    # Reference-graph smooth-term differentiation structure (r5).
    # "autodiff" = plain jax.grad through group+norm (the historical
    # default); "lean" = _ref_graph_discrepancy's custom VJP — same
    # exact gradient, but only (mask, idx) residuals cross the fwd/bwd
    # boundary and the backward recomputes the gather; "remat" =
    # jax.checkpoint around the term (identical gradient, XLA re-fuses
    # the fwd into the bwd).  Both attack the ~150 ms/step structural
    # gap the r5 arm table exposed (symgrad's fwd+bwd costs LESS than
    # the autodiff fwd alone); A/B arms in bench_train.py pick the
    # default.  Applies when smooth_graph == "reference", no CE, no
    # symmetric_smooth_grad.
    smooth_ref_bwd: str = "autodiff"
    # Route the reference-graph smooth backward through the Pallas VMEM
    # scatter-add kernel (ops/pallas_scatter.py) instead of XLA's
    # scatter.  The r4 closure measured BLANKET routing (model gathers
    # included: regression); this field targets ONLY the smooth-loss
    # groups, whose near-uniform full-cloud tables are the distribution
    # the kernel wins on isolated (10.6-16.4 vs 18-25 ns/row).  A/B arm
    # in bench_train.py under the r5 reference-graph default.
    smooth_scatter_kernel: bool = False
    # When False, monitoring-only computations are skipped statically:
    # entropy/rank (reference seg_loss_unsup.py:328-330, never in backprop)
    # and any weighted term whose weight is exactly 0.0 in the config (the
    # reference still evaluates those forwards purely to fill the log dict).
    # Their loss_dict entries are reported as 0.  Turn off for production
    # throughput runs without scalar logging.
    monitor_terms: bool = True

    @classmethod
    def from_dict(cls, loss_cfg: dict) -> "OGCLossConfig":
        """Build from a reference-style YAML dict (train_seg.py:333-339)."""
        d = loss_cfg.get("dynamic_loss_params", {})
        s = loss_cfg.get("smooth_loss_params", {})
        i = loss_cfg.get("invariance_loss_params", {})
        kp = s.get("knn_loss_params", {})
        bp = s.get("ball_q_loss_params", {})
        graph = s.get("graph", "reference")
        if graph not in ("mutual", "reference"):  # a typo here would
            # silently select the reference scatter-add path
            raise ValueError(
                f"smooth_loss_params.graph must be 'mutual' or 'reference',"
                f" got {graph!r}")
        return cls(
            weights=tuple(loss_cfg.get("weights", (10.0, 0.1, 0.1))),
            start_steps=tuple(loss_cfg.get("start_steps", (0, 0, 0))),
            dynamic_loss_norm=d.get("loss_norm", 2),
            smooth_w_knn=s.get("w_knn", 3.0),
            smooth_w_ball_q=s.get("w_ball_q", 1.0),
            knn_k=kp.get("k", 8),
            knn_radius=kp.get("radius", 0.1),
            knn_loss_norm=kp.get("loss_norm", 1),
            ball_q_k=bp.get("k", 16),
            ball_q_radius=bp.get("radius", 0.2),
            ball_q_loss_norm=bp.get("loss_norm", 1),
            invariance_loss_norm=i.get("loss_norm", 2),
            # Extension keys (not in reference YAMLs): scatter-free smooth
            # backward (see _sym_grad_discrepancy) and monitor-term skipping.
            symmetric_smooth_grad=s.get("symmetric_grad", False),
            smooth_graph=graph,
            smooth_ref_bwd=s.get("ref_bwd", "autodiff"),
            smooth_edge_engine=s.get("edge_engine", "gather"),
            smooth_scatter_kernel=s.get("scatter_kernel", False),
            monitor_terms=loss_cfg.get("monitor_terms", True),
        )


def smooth_loss(pc: Array, mask: Array, cfg: OGCLossConfig) -> Array:
    """w_knn * KnnLoss + w_ball_q * BallQLoss (reference SmoothLoss,
    losses/seg_loss_unsup.py:161-180)."""
    if (
        cfg.smooth_edge_engine == "mxu"
        and cfg.smooth_graph == "reference"
        and not cfg.cross_entropy
        and not cfg.symmetric_smooth_grad
    ):
        return _smooth_mxu(pc, mask, cfg)
    l_knn = knn_smooth_loss(
        pc, mask, cfg.knn_k, cfg.knn_radius, cfg.cross_entropy,
        cfg.knn_loss_norm, cfg.symmetric_smooth_grad, cfg.smooth_graph,
        exact=cfg.smooth_exact,
        scatter_kernel_bwd=cfg.smooth_scatter_kernel,
        ref_bwd=cfg.smooth_ref_bwd,
    )
    l_bq = ball_q_smooth_loss(
        pc, mask, cfg.ball_q_k, cfg.ball_q_radius, cfg.cross_entropy,
        cfg.ball_q_loss_norm, cfg.symmetric_smooth_grad, cfg.smooth_graph,
        exact=cfg.smooth_exact,
        scatter_kernel_bwd=cfg.smooth_scatter_kernel,
        ref_bwd=cfg.smooth_ref_bwd,
    )
    return cfg.smooth_w_knn * l_knn + cfg.smooth_w_ball_q * l_bq


def ogc_loss(
    pcs: List[Array],
    masks: List[Array],
    flows: List[Array],
    cfg: OGCLossConfig,
    step_w: bool = False,
    it: Array | int = 0,
    aug_transform: bool = False,
) -> Tuple[Array, Dict[str, Array]]:
    """Combined unsupervised OGC loss over 2 (or 4, with augmentation) frames.

    Reference: UnsupervisedOGCLoss (losses/seg_loss_unsup.py:317-409).
    `it` may be a traced step counter; the start_steps gating uses where().
    :return: (scalar loss, dict of scalar monitoring values).
    """
    assert len(pcs) == len(masks) == len(flows)
    n_frames = len(pcs)

    def gate(weight: float, start_step: int):
        if not step_w:
            return jnp.float32(weight)
        return jnp.where(jnp.asarray(it) < start_step, 0.0, weight)

    loss_dict: Dict[str, Array] = {}
    # With monitor_terms off, a term whose config weight is exactly 0.0 is
    # skipped STATICALLY (it can never contribute to the gradient; the
    # reference evaluates it only to populate the log dict).
    skip_zero = not cfg.monitor_terms
    total = jnp.float32(0.0)

    if skip_zero and cfg.weights[0] == 0.0:
        loss_dict["dynamic"] = jnp.float32(0.0)
    else:
        l_dyn = sum(
            dynamic_loss(pcs[f], masks[f], flows[f], cfg.dynamic_loss_norm)
            for f in range(n_frames)
        )
        if aug_transform:
            l_dyn = 0.5 * l_dyn
        loss_dict["dynamic"] = l_dyn
        total = total + gate(cfg.weights[0], cfg.start_steps[0]) * l_dyn

    if skip_zero and cfg.weights[1] == 0.0:
        loss_dict["smooth"] = jnp.float32(0.0)
    else:
        l_smooth = sum(
            smooth_loss(pcs[f], masks[f], cfg) for f in range(n_frames)
        )
        if aug_transform:
            l_smooth = 0.5 * l_smooth
        loss_dict["smooth"] = l_smooth
        total = total + gate(cfg.weights[1], cfg.start_steps[1]) * l_smooth

    if aug_transform and skip_zero and cfg.weights[2] == 0.0:
        loss_dict["invariance"] = jnp.float32(0.0)
    elif aug_transform:
        # Invariance between each frame and its augmented copy: with 4 frames
        # (2 original x 2 views) pairs are (0,2),(1,3)
        # (losses/seg_loss_unsup.py:383); the Waymo 1-frame variant has 2
        # frames and pairs (0,1) (train_seg_waymo.py:306-309).
        half = n_frames // 2
        l_inv = sum(
            invariance_loss(
                masks[i], masks[i + half], cfg.cross_entropy,
                cfg.invariance_loss_norm,
            )
            for i in range(half)
        )
        loss_dict["invariance"] = l_inv
        total = total + gate(cfg.weights[2], cfg.start_steps[2]) * l_inv
    else:
        loss_dict["invariance"] = jnp.float32(0.0)

    # Monitoring-only terms (not in the gradient).
    if cfg.monitor_terms:
        mon_masks = [jax.lax.stop_gradient(m) for m in masks]
        l_ent = sum(entropy_loss(m) for m in mon_masks)
        l_rank = sum(rank_loss(m) for m in mon_masks)
        if aug_transform:
            l_ent, l_rank = 0.5 * l_ent, 0.5 * l_rank
        loss_dict["entropy"] = l_ent
        loss_dict["rank"] = l_rank
    else:
        loss_dict["entropy"] = jnp.float32(0.0)
        loss_dict["rank"] = jnp.float32(0.0)
    loss_dict["sum"] = total
    return total, loss_dict
