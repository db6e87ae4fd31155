"""Golden / property tests for the unsupervised OGC losses."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from ogc_tpu.losses import seg_unsup as L


def random_rigid(rng):
    R = Rotation.from_euler("zyx", rng.uniform(-60, 60, 3), degrees=True).as_matrix()
    t = rng.uniform(-1, 1, 3)
    return R.astype(np.float32), t.astype(np.float32)


def test_kabsch_recovers_rigid_motion():
    rng = np.random.RandomState(0)
    pc1 = rng.randn(4, 100, 3).astype(np.float32)
    Rs, ts = zip(*[random_rigid(rng) for _ in range(4)])
    Rs, ts = np.stack(Rs), np.stack(ts)
    pc2 = np.einsum("bij,bnj->bni", Rs, pc1) + ts[:, None, :]
    R_hat, t_hat = L.fit_motion_svd_batch(jnp.asarray(pc1), jnp.asarray(pc2))
    np.testing.assert_allclose(np.asarray(R_hat), Rs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat), ts, atol=1e-4)


def test_kabsch_weighted():
    rng = np.random.RandomState(1)
    pc1 = rng.randn(1, 60, 3).astype(np.float32)
    R, t = random_rigid(rng)
    pc2 = pc1.copy()
    pc2[0, :30] = pc1[0, :30] @ R.T + t  # only first half moves rigidly
    pc2[0, 30:] += rng.randn(30, 3).astype(np.float32)  # rest is noise
    w = np.zeros((1, 60), dtype=np.float32)
    w[0, :30] = 1.0
    R_hat, t_hat = L.fit_motion_svd_batch(
        jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(R_hat)[0], R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat)[0], t, atol=1e-4)


def test_kabsch_zero_mask_identity_fallback():
    rng = np.random.RandomState(2)
    pc1 = rng.randn(2, 30, 3).astype(np.float32)
    pc2 = rng.randn(2, 30, 3).astype(np.float32)
    w = np.zeros((2, 30), dtype=np.float32)
    R, t = L.fit_motion_svd_batch(jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_kabsch_reflection_fix_gives_rotation():
    rng = np.random.RandomState(3)
    pc1 = rng.randn(8, 50, 3).astype(np.float32)
    pc2 = rng.randn(8, 50, 3).astype(np.float32)  # unrelated clouds
    R, _ = L.fit_motion_svd_batch(jnp.asarray(pc1), jnp.asarray(pc2))
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_dynamic_loss_zero_for_rigid_flow():
    rng = np.random.RandomState(4)
    pc = rng.randn(2, 80, 3).astype(np.float32)
    # two objects, each moving rigidly
    segm = (rng.rand(2, 80) > 0.5).astype(np.int32)
    mask = np.eye(2, dtype=np.float32)[segm]  # (2, 80, 2) hard mask
    flow = np.zeros_like(pc)
    for b in range(2):
        for k in range(2):
            R, t = random_rigid(rng)
            sel = segm[b] == k
            flow[b, sel] = pc[b, sel] @ R.T + t - pc[b, sel]
    loss = L.dynamic_loss(jnp.asarray(pc), jnp.asarray(mask), jnp.asarray(flow))
    assert float(loss) < 1e-3


def test_dynamic_loss_positive_for_nonrigid_flow():
    rng = np.random.RandomState(5)
    pc = rng.randn(1, 80, 3).astype(np.float32)
    mask = np.ones((1, 80, 1), dtype=np.float32)
    flow = rng.randn(1, 80, 3).astype(np.float32)  # random, non-rigid
    loss = L.dynamic_loss(jnp.asarray(pc), jnp.asarray(mask), jnp.asarray(flow))
    assert float(loss) > 0.1


def test_smooth_loss_zero_for_constant_mask():
    rng = np.random.RandomState(6)
    pc = rng.rand(1, 64, 3).astype(np.float32)
    mask = np.ones((1, 64, 4), dtype=np.float32) * 0.25
    cfg = L.OGCLossConfig()
    loss = L.smooth_loss(jnp.asarray(pc), jnp.asarray(mask), cfg)
    assert float(loss) < 1e-6


def test_invariance_loss_zero_for_identical_masks():
    rng = np.random.RandomState(7)
    m = jax.nn.softmax(jnp.asarray(rng.randn(2, 50, 6).astype(np.float32)), -1)
    loss = L.invariance_loss(m, m)
    assert float(loss) < 1e-5


def test_invariance_loss_zero_for_permuted_masks():
    rng = np.random.RandomState(8)
    m = jax.nn.softmax(jnp.asarray(5 * rng.randn(1, 50, 4).astype(np.float32)), -1)
    perm = np.asarray([2, 0, 3, 1])
    m2 = m[..., perm]
    loss = L.invariance_loss(m, m2)
    assert float(loss) < 1e-4


def test_entropy_and_rank():
    onehot = jnp.asarray(np.eye(4, dtype=np.float32)[np.zeros(32, dtype=int)][None])
    assert float(L.entropy_loss(onehot)) < 1e-3
    uniform = jnp.full((1, 32, 4), 0.25)
    np.testing.assert_allclose(float(L.entropy_loss(uniform)), np.log(4), atol=1e-5)
    # rank of a single-object one-hot mask: nuclear norm = sqrt(N)
    np.testing.assert_allclose(float(L.rank_loss(onehot)), np.sqrt(32), atol=1e-3)


def test_ogc_loss_combination_and_gating():
    rng = np.random.RandomState(9)
    pcs = [jnp.asarray(rng.rand(2, 64, 3).astype(np.float32)) for _ in range(2)]
    masks = [
        jax.nn.softmax(jnp.asarray(rng.randn(2, 64, 4).astype(np.float32)), -1)
        for _ in range(2)
    ]
    flows = [jnp.asarray(0.1 * rng.randn(2, 64, 3).astype(np.float32)) for _ in range(2)]
    cfg = L.OGCLossConfig(weights=(10.0, 0.1, 0.1), start_steps=(0, 1000, 0))

    total, d = L.ogc_loss(pcs, masks, flows, cfg, step_w=True, it=0)
    # smooth gated off before step 1000
    np.testing.assert_allclose(float(total), 10.0 * float(d["dynamic"]), rtol=1e-5)

    total2, d2 = L.ogc_loss(pcs, masks, flows, cfg, step_w=True, it=2000)
    np.testing.assert_allclose(
        float(total2),
        10.0 * float(d2["dynamic"]) + 0.1 * float(d2["smooth"]),
        rtol=1e-5,
    )


def test_ogc_loss_grad_flows_to_mask():
    rng = np.random.RandomState(10)
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    flow = jnp.asarray(0.1 * rng.randn(1, 64, 3).astype(np.float32))
    logits = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))
    cfg = L.OGCLossConfig()

    def f(lg):
        mask = jax.nn.softmax(lg, -1)
        total, _ = L.ogc_loss([pc], [mask], [flow], cfg)
        return total

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_interpolate_mask_by_flow_identity():
    rng = np.random.RandomState(11)
    pc1 = jnp.asarray(rng.rand(1, 40, 3).astype(np.float32))
    mask1 = jax.nn.softmax(jnp.asarray(rng.randn(1, 40, 3).astype(np.float32)), -1)
    # zero flow, pc2 == pc1: mask carries over exactly
    out = L.interpolate_mask_by_flow(pc1, pc1, mask1, jnp.zeros_like(pc1), k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mask1), atol=1e-6)


def test_symmetric_smooth_grad_exact_on_symmetric_graph():
    """On a truly symmetric neighbor graph the scatter-free custom VJP must
    equal autodiff exactly; on a KNN graph it is a documented approximation
    (high cosine similarity)."""
    from ogc_tpu.losses.seg_unsup import (
        _neighbor_discrepancy,
        _sym_grad_discrepancy,
    )
    from ogc_tpu import ops as _ops

    rng = np.random.RandomState(0)
    B, N, K = 2, 64, 5
    mask = jnp.asarray(rng.rand(B, N, K).astype(np.float32))

    # Symmetric graph: pair 2i <-> 2i+1, two slots each (self + partner).
    partner = np.arange(N) ^ 1
    idx_sym = jnp.asarray(
        np.broadcast_to(
            np.stack([np.arange(N), partner], -1), (B, N, 2)
        ).astype(np.int32)
    )

    def auto(m):
        return _neighbor_discrepancy(m, _ops.group(m, idx_sym), False, 1)

    def sym(m):
        return _sym_grad_discrepancy(m, idx_sym, 1)

    np.testing.assert_allclose(float(auto(mask)), float(sym(mask)), rtol=1e-6)
    g_auto = np.asarray(jax.grad(auto)(mask))
    g_sym = np.asarray(jax.grad(sym)(mask))
    np.testing.assert_allclose(g_sym, g_auto, rtol=1e-5, atol=1e-7)

    # KNN graph (asymmetric): gradients should still be strongly aligned.
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    _, idx_knn = _ops.knn(4, pc, pc, exact=True)
    idx_knn = jax.lax.stop_gradient(idx_knn)

    def auto_k(m):
        return _neighbor_discrepancy(m, _ops.group(m, idx_knn), False, 1)

    def sym_k(m):
        return _sym_grad_discrepancy(m, idx_knn, 1)

    ga = np.asarray(jax.grad(auto_k)(mask)).ravel()
    gs = np.asarray(jax.grad(sym_k)(mask)).ravel()
    cos = np.dot(ga, gs) / (np.linalg.norm(ga) * np.linalg.norm(gs))
    assert cos > 0.9, cos


def test_mutual_keep_mask_is_exactly_symmetric():
    """mutual_keep_mask must produce a symmetric directed-edge multiset with
    at most one kept copy per direction, on REAL knn-clamped and ball-query
    graphs (the basis of _mutual_discrepancy's exact scatter-free VJP)."""
    from ogc_tpu import ops as _ops
    from ogc_tpu.losses.seg_unsup import mutual_keep_mask

    rng = np.random.RandomState(3)
    B, N = 2, 96
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))

    dist, idx_knn = _ops.knn(6, pc, pc, exact=True)
    idx_knn = jnp.where(dist > 0.25, idx_knn[..., :1], idx_knn)
    idx_bq = _ops.ball_query(0.3, 8, pc, pc, exact=True)

    for idx in (idx_knn, idx_bq):
        keep = np.asarray(mutual_keep_mask(idx))
        idx = np.asarray(idx)
        for b in range(B):
            A = np.zeros((N, N), np.int64)  # kept directed-edge counts
            for i in range(N):
                seen = set()
                for s in range(idx.shape[-1]):
                    j = int(idx[b, i, s])
                    # kept slots must be first occurrences
                    if keep[b, i, s]:
                        assert j not in seen
                        A[i, j] += 1
                    seen.add(j)
            np.fill_diagonal(A, 0)  # self-loops contribute 0 anyway
            assert A.max() <= 1
            np.testing.assert_array_equal(A, A.T)
            # sanity: the graphs actually have edges (non-trivial test)
            assert A.sum() > N


def test_mutual_discrepancy_grad_is_exact():
    """The custom scatter-free VJP of _mutual_discrepancy must equal plain
    autodiff of the SAME forward — exact, not approximate (contrast with
    _sym_grad_discrepancy's documented approximation)."""
    from ogc_tpu import ops as _ops
    from ogc_tpu.losses.seg_unsup import (
        _mutual_discrepancy,
        mutual_keep_mask,
    )

    rng = np.random.RandomState(4)
    B, N, K = 2, 80, 7
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    mask = jax.nn.softmax(jnp.asarray(rng.randn(B, N, K).astype(np.float32)),
                          -1)

    for maker, norm in (
        (lambda: _ops.knn(5, pc, pc, exact=True)[1], 1),
        (lambda: _ops.ball_query(0.3, 8, pc, pc, exact=True), 1),
        (lambda: _ops.knn(5, pc, pc, exact=True)[1], 2),
    ):
        idx = jax.lax.stop_gradient(maker())
        keep = jax.lax.stop_gradient(mutual_keep_mask(idx))

        def plain(m):
            nn = _ops.group(m, idx)
            diff = m[:, :, None, :] - nn
            if norm == 1:
                per = jnp.sum(jnp.abs(diff), axis=-1)
            else:
                per = jnp.sqrt(
                    jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))
            return jnp.mean(jnp.where(keep, per, 0.0))

        def custom(m):
            return _mutual_discrepancy(m, idx, keep, norm)

        np.testing.assert_allclose(float(plain(mask)), float(custom(mask)),
                                   rtol=1e-6)
        g_plain = np.asarray(jax.grad(plain)(mask))
        g_custom = np.asarray(jax.grad(custom)(mask))
        np.testing.assert_allclose(g_custom, g_plain, rtol=1e-5, atol=1e-7)


def test_smooth_graph_config_wiring():
    """smooth_graph defaults to 'reference' (r5: the 10-seed ablation
    measured a PQ deficit for the old 'mutual' default — PARITY.md) and
    is switchable via smooth_loss_params.graph; the two modes differ on
    an asymmetric graph and the mutual loss can only drop edges
    (<= reference value for L1)."""
    cfg_default = L.OGCLossConfig.from_dict({})
    assert cfg_default.smooth_graph == "reference"
    cfg_mut = L.OGCLossConfig.from_dict(
        {"smooth_loss_params": {"graph": "mutual"}})
    assert cfg_mut.smooth_graph == "mutual"
    with pytest.raises(ValueError, match="graph"):  # a typo must not
        # silently fall back to either path
        L.OGCLossConfig.from_dict({"smooth_loss_params": {"graph": "mutal"}})

    rng = np.random.RandomState(5)
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    mask = jax.nn.softmax(jnp.asarray(rng.randn(1, 64, 4).astype(np.float32)),
                          -1)
    lm = float(L.smooth_loss(pc, mask, L.OGCLossConfig(smooth_graph="mutual")))
    lr = float(L.smooth_loss(pc, mask, L.OGCLossConfig()))
    assert 0.0 < lm <= lr + 1e-7


def test_monitor_terms_off_same_gradient_loss():
    """monitor_terms=False must not change the training objective; monitor
    dict entries become 0; statically-zero-weight terms are skipped."""
    rng = np.random.RandomState(7)
    pcs = [jnp.asarray(rng.rand(2, 64, 3).astype(np.float32)) for _ in range(2)]
    masks = [
        jax.nn.softmax(jnp.asarray(rng.randn(2, 64, 5).astype(np.float32)), -1)
        for _ in range(2)
    ]
    flows = [jnp.asarray(0.05 * rng.randn(2, 64, 3).astype(np.float32))
             for _ in range(2)]

    cfg_on = L.OGCLossConfig(weights=(10.0, 0.0, 0.1), knn_k=4, ball_q_k=4)
    cfg_off = L.OGCLossConfig(
        weights=(10.0, 0.0, 0.1), knn_k=4, ball_q_k=4, monitor_terms=False
    )
    tot_on, ld_on = L.ogc_loss(pcs, masks, flows, cfg_on)
    tot_off, ld_off = L.ogc_loss(pcs, masks, flows, cfg_off)
    np.testing.assert_allclose(
        np.asarray(tot_on), np.asarray(tot_off), rtol=1e-6
    )
    assert set(ld_on) == set(ld_off)
    assert float(ld_on["entropy"]) > 0 and float(ld_off["entropy"]) == 0.0
    assert float(ld_on["smooth"]) > 0 and float(ld_off["smooth"]) == 0.0
    # Gated weight (start_steps) still works with monitors off.
    tot_g, _ = L.ogc_loss(
        pcs, masks, flows,
        L.OGCLossConfig(weights=(10.0, 0.0, 0.1), knn_k=4, ball_q_k=4,
                        monitor_terms=False, start_steps=(100, 0, 0)),
        step_w=True, it=5,
    )
    assert float(tot_g) == 0.0


def test_monitor_terms_from_dict():
    cfg = L.OGCLossConfig.from_dict({"monitor_terms": False})
    assert not cfg.monitor_terms
    assert L.OGCLossConfig.from_dict({}).monitor_terms


def test_scalar_mutual_matches_gather_oracle():
    """The r4 scalar membership test (graph='mutual' on exact tables) must
    reproduce the gather-based mutual loss AND gradient exactly.  Grid-
    quantized clouds: every pairwise d2 is exactly representable, so the
    scalar reconstruction agrees with either exact path's selection metric
    bit-for-bit (continuous clouds could flip knife-edge pairs under the
    XLA MXU-form fallback — see _mutual_discrepancy_scalar)."""
    from ogc_tpu.losses.seg_unsup import (
        ball_q_smooth_loss, knn_smooth_loss,
    )

    rng = np.random.RandomState(7)
    B, N, K = 2, 160, 6
    pc = jnp.asarray(np.round(rng.rand(B, N, 3) * 16).astype(np.float32)
                     / 16.0)
    mask = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, K).astype(np.float32)), -1)

    cases = [
        (knn_smooth_loss, dict(k=6, radius=0.25)),
        (knn_smooth_loss, dict(k=6, radius=10.0)),   # no clamps
        (ball_q_smooth_loss, dict(k=8, radius=0.3)),
        (ball_q_smooth_loss, dict(k=8, radius=0.02)),  # mostly empty balls
        (ball_q_smooth_loss, dict(k=4, radius=2.0)),   # crowded/truncated
    ]
    for fn, kw in cases:
        for norm in (1, 2):
            def scalar(m):
                return fn(pc, m, kw["k"], kw["radius"], loss_norm=norm,
                          graph="mutual", exact=True)

            def gather(m):
                return fn(pc, m, kw["k"], kw["radius"], loss_norm=norm,
                          graph="mutual_gather", exact=True)

            ls, lg = float(scalar(mask)), float(gather(mask))
            np.testing.assert_allclose(ls, lg, rtol=1e-6, err_msg=str(kw))
            gs = np.asarray(jax.grad(scalar)(mask))
            gg = np.asarray(jax.grad(gather)(mask))
            np.testing.assert_allclose(gs, gg, rtol=1e-5, atol=1e-7,
                                       err_msg=str(kw))


def test_scalar_mutual_vjp_is_exact():
    """Custom scatter-free VJP of _mutual_discrepancy_scalar == plain
    autodiff of its own forward (same bar as _mutual_discrepancy)."""
    from ogc_tpu.losses.seg_unsup import (
        _knn_mutual_aux, _mutual_discrepancy_scalar, _mutual_scalar_fwd,
    )

    rng = np.random.RandomState(8)
    B, N, K = 2, 120, 5
    pc = jnp.asarray(np.round(rng.rand(B, N, 3) * 16).astype(np.float32)
                     / 16.0)
    mask = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, K).astype(np.float32)), -1)
    from ogc_tpu import ops as _ops

    dist, idx_raw = _ops.knn(5, pc, pc, exact=True)
    radius = 0.3
    idx = jnp.where(dist > radius, idx_raw[..., :1], idx_raw)
    aux = _knn_mutual_aux(pc, dist, idx_raw, radius)

    for norm in (1, 2):
        def custom(m):
            return _mutual_discrepancy_scalar(
                m, aux, idx, pc, norm, ("knn", radius))

        def plain(m):
            return _mutual_scalar_fwd(m, aux, idx, pc, norm,
                                      ("knn", radius))[0]

        np.testing.assert_allclose(float(custom(mask)), float(plain(mask)),
                                   rtol=1e-6)
        g_c = np.asarray(jax.grad(custom)(mask))
        g_p = np.asarray(jax.grad(plain)(mask))
        np.testing.assert_allclose(g_c, g_p, rtol=1e-5, atol=1e-7)


def test_scalar_mutual_gated_off_for_approx_tables():
    """graph='mutual' with approximate tables must keep the gather-based
    test: the scalar lex-prefix argument does not hold for flash tables
    (an approx row can list j without j listing i back), which would break
    the kept multiset's symmetry."""
    from ogc_tpu.losses import seg_unsup as SU

    rng = np.random.RandomState(9)
    pc = jnp.asarray(rng.rand(1, 96, 3).astype(np.float32))
    mask = jax.nn.softmax(
        jnp.asarray(rng.randn(1, 96, 4).astype(np.float32)), -1)
    called = {}
    orig = SU._mutual_discrepancy

    def spy(*a, **k):
        called["gather"] = True
        return orig(*a, **k)

    SU._mutual_discrepancy = spy
    try:
        SU.knn_smooth_loss(pc, mask, 5, 0.3, graph="mutual", exact=False)
    finally:
        SU._mutual_discrepancy = orig
    assert called.get("gather"), "approx tables must use the gather test"


def test_smooth_mxu_engine_matches_gather_on_uncrowded_graphs():
    """With no crowded balls and no knn ties, the MXU engine's edge SET
    equals the gather engine's (sorting only permutes a uniquely-
    determined set), so the loss values must agree to fp-sum tolerance;
    on crowded/tie geometries only the documented tie/fill picks differ."""
    rng = np.random.RandomState(11)
    B, N, K = 2, 256, 5
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    mask = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, K).astype(np.float32)), -1)
    # ball_k large enough to hold every in-radius member -> no fill
    # ambiguity; generic float cloud -> no exact d2 ties.
    cfg_g = L.OGCLossConfig(knn_k=6, knn_radius=0.3, ball_q_k=48,
                            ball_q_radius=0.12)
    cfg_m = dataclasses.replace(cfg_g, smooth_edge_engine="mxu")
    lg = float(L.smooth_loss(pc, mask, cfg_g))
    lm = float(L.smooth_loss(pc, mask, cfg_m))
    assert abs(lg - lm) < 1e-5, (lg, lm)


def test_smooth_mxu_engine_grad_matches_plain_group_oracle():
    """Bitwise-level check: _smooth_mxu with group_blocksparse swapped
    for the plain XLA group must give the identical loss and matching
    gradients — isolates the kernel from the (documented) edge-set
    permutation effects."""
    import ogc_tpu.ops.pallas_onehot as OH

    rng = np.random.RandomState(12)
    B, N, K = 2, 200, 4
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    logits = jnp.asarray(rng.randn(B, N, K).astype(np.float32))
    cfg = L.OGCLossConfig(knn_k=5, knn_radius=0.3, ball_q_k=8,
                          ball_q_radius=0.15, smooth_edge_engine="mxu")

    def loss_fn(lg):
        return L.smooth_loss(pc, jax.nn.softmax(lg, -1), cfg)

    v1, g1 = jax.value_and_grad(loss_fn)(logits)

    from test_onehot_group import _plain_group_shim

    orig = OH.group_blocksparse
    OH.group_blocksparse = _plain_group_shim
    try:
        v2, g2 = jax.value_and_grad(loss_fn)(logits)
    finally:
        OH.group_blocksparse = orig
    assert abs(float(v1) - float(v2)) < 1e-6
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_smooth_mxu_engine_routing_gates():
    """mxu engine only routes for the reference graph w/o CE/symgrad;
    other combos keep the gather path (no crash, finite values)."""
    rng = np.random.RandomState(13)
    pc = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32))
    mask = jax.nn.softmax(
        jnp.asarray(rng.randn(1, 128, 3).astype(np.float32)), -1)
    for kw in (dict(smooth_graph="mutual"),
               dict(cross_entropy=True),
               dict(symmetric_smooth_grad=True)):
        cfg = L.OGCLossConfig(knn_k=4, knn_radius=0.3, ball_q_k=6,
                              ball_q_radius=0.2,
                              smooth_edge_engine="mxu", **kw)
        v = float(L.smooth_loss(pc, mask, cfg))
        assert np.isfinite(v)


def test_ref_graph_lean_vjp_is_exact():
    """The lean-residual custom VJP of _ref_graph_discrepancy (r5
    differentiation-structure arm) must equal plain autodiff of the
    default reference-graph tail — same value bitwise, same gradient;
    and the remat routing must equal it too (jax.checkpoint changes no
    math)."""
    from ogc_tpu import ops as _ops
    from ogc_tpu.losses.seg_unsup import (
        _neighbor_discrepancy,
        _ref_graph_discrepancy,
        ball_q_smooth_loss,
        knn_smooth_loss,
    )

    rng = np.random.RandomState(5)
    B, N, K = 2, 80, 7
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    mask = jax.nn.softmax(jnp.asarray(rng.randn(B, N, K).astype(np.float32)),
                          -1)

    for maker, norm in (
        (lambda: _ops.knn(5, pc, pc, exact=True)[1], 1),
        (lambda: _ops.ball_query(0.3, 8, pc, pc, exact=True), 1),
        (lambda: _ops.knn(5, pc, pc, exact=True)[1], 2),
    ):
        idx = jax.lax.stop_gradient(maker())

        def plain(m):
            return _neighbor_discrepancy(m, _ops.group(m, idx), False, norm)

        def guarded(m):
            # L2 gradient oracle: plain autodiff NaNs on self-edges
            # (norm'(0)); the custom VJPs use the 1e-24-guarded form
            # (same convention as _mutual_discrepancy).
            nn = _ops.group(m, idx)
            diff = m[:, :, None, :] - nn
            per = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-24))
            return jnp.mean(per)

        def lean(m):
            return _ref_graph_discrepancy(m, idx, norm, False)

        assert float(plain(mask)) == float(lean(mask))  # identical fwd ops
        g_plain = np.asarray(jax.grad(plain if norm == 1 else guarded)(mask))
        g_lean = np.asarray(jax.grad(lean)(mask))
        np.testing.assert_allclose(g_lean, g_plain, rtol=1e-5, atol=1e-7)

    # Routing: knn/ball smooth losses honor ref_bwd and agree with the
    # autodiff default (value AND gradient).
    for fn, kw in (
        (knn_smooth_loss, dict(k=5, radius=0.3)),
        (ball_q_smooth_loss, dict(k=8, radius=0.3)),
    ):
        base_v = fn(pc, mask, kw["k"], kw["radius"], exact=True)
        base_g = np.asarray(jax.grad(
            lambda m: fn(pc, m, kw["k"], kw["radius"], exact=True))(mask))
        for mode in ("lean", "remat"):
            v = fn(pc, mask, kw["k"], kw["radius"], exact=True,
                   ref_bwd=mode)
            g = np.asarray(jax.grad(
                lambda m: fn(pc, m, kw["k"], kw["radius"], exact=True,
                             ref_bwd=mode))(mask))
            np.testing.assert_allclose(float(v), float(base_v), rtol=1e-6)
            np.testing.assert_allclose(g, base_g, rtol=1e-5, atol=1e-7)
