"""Regression tests for data-parallel sharding on non-divisible batches and
the eval-epoch loss weighting.

Round-1 defects: _shard silently returned unsharded arrays when the batch
wasn't divisible by the device count (losing data parallelism + forcing a
recompile), and eval_epoch seeded count=1.0 (biasing the val loss used for
best-checkpoint selection)."""

import numpy as np
import jax
import pytest

from ogc_tpu.losses.seg_unsup import OGCLossConfig
from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.train.seg import SegTrainer, make_optimizer


N_POINT, N_SLOT, T = 64, 4, 2


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    model = MaskFormer3D(
        n_slot=N_SLOT, n_point=N_POINT, arch="sapien",
        n_transformer_layer=1, transformer_embed_dim=64,
    )
    pc = jax.numpy.zeros((1, N_POINT, 3))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    return SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0), start_steps=(0, 0, 0)),
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 8),
        aug_transform_epoch=9999, ignore_npoint_thresh=0,
        exp_base=str(tmp_path_factory.mktemp("shard_exp")),
        mesh=mesh,
    )


def _batch(b, seed=0):
    rng = np.random.RandomState(seed)
    pcs = rng.rand(b, T, N_POINT, 3).astype(np.float32)
    flows = (0.05 * rng.randn(b, T, N_POINT, 3)).astype(np.float32)
    segms = rng.randint(0, 2, size=(b, T, N_POINT)).astype(np.int32)
    valids = np.ones((b, T, N_POINT), np.float32)
    return pcs, segms, flows, valids


def test_shard_pads_nondivisible_batch_to_8way(trainer):
    pcs, _, flows, _ = _batch(12)
    (pcs_d, flows_d), b = trainer._shard(pcs, flows)
    assert b == 12
    assert pcs_d.shape[0] == 16  # padded to next multiple of 8
    assert len(pcs_d.sharding.device_set) == 8
    assert len(flows_d.sharding.device_set) == 8
    # Padding repeats the last sample.
    np.testing.assert_array_equal(np.asarray(pcs_d[12:]), pcs[-1:].repeat(4, 0))


def test_train_step_keeps_sharding_on_odd_batch(trainer):
    batch = _batch(12)
    ld, segm, mask = trainer.train_it(0, batch)
    assert np.isfinite(ld["sum"])
    assert segm.shape[0] == 12 and mask.shape[0] == 12  # sliced back


def test_divisible_batch_not_padded(trainer):
    pcs, _, flows, _ = _batch(16)
    (pcs_d, _), b = trainer._shard(pcs, flows)
    assert b == 16 and pcs_d.shape[0] == 16
    assert len(pcs_d.sharding.device_set) == 8


def test_eval_epoch_loss_is_per_sample_average(trainer):
    batch = _batch(8, seed=1)
    pcs, segms, flows, _ = batch
    (pcs_d, flows_d), _ = trainer._shard(pcs, flows)
    loss, _, _ = trainer._eval_step(trainer.params, pcs_d, flows_d)
    # One batch: epoch loss must equal that batch's mean loss exactly
    # (the old count=1.0 seed halved it).
    val_loss, _, _ = trainer.eval_epoch([batch])
    assert val_loss == pytest.approx(float(loss), rel=1e-6)


def test_dp_eval_fwd_pytree_uneven_batch():
    """dp_eval_fwd pads an 11-row batch to 16 across 8 devices, runs the
    jitted fn partitioned, and slices every output leaf back to 11 rows —
    matching the single-device wrapper exactly."""
    import jax.numpy as jnp

    jitted = jax.jit(lambda p, x, y: {"a": x * p, "b": [x + y, x.sum(-1)]})
    x = np.random.RandomState(0).randn(11, 3).astype(np.float32)
    y = np.random.RandomState(1).randn(11, 3).astype(np.float32)
    p = jnp.float32(2.0)
    ref = pmesh.dp_eval_fwd(jitted, p, 1)(x, y)
    got = pmesh.dp_eval_fwd(jitted, p, 0)(x, y)
    assert got["a"].shape == (11, 3) and got["b"][1].shape == (11,)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-6)


def test_vmapped_voting_stays_sharded():
    """Voting vmapped over scenes must partition along the mesh without
    collectives: a lax.map/scan over a sharded axis makes GSPMD all-gather
    the operands and replicate the loop on every device (the vote.py --dp
    regression this guards against)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ogc_tpu.refine.vote import mask_voting

    mesh = pmesh.make_mesh(jax.devices(), "data")
    S, T, N, K = 8, 4, 64, 4
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(S, T, N, 3).astype(np.float32))
    mask = jax.nn.softmax(
        jnp.asarray(rng.rand(S, T, N, K).astype(np.float32)), -1
    )
    flows = jnp.asarray(rng.rand(S, T - 1, 2, N, 3).astype(np.float32) * 0.01)
    sh = NamedSharding(mesh, P("data"))
    pc, mask, flows = (jax.device_put(x, sh) for x in (pc, mask, flows))

    f = jax.jit(jax.vmap(
        lambda a, b, c: mask_voting(a, b, c, time_window_size=3)
    ))
    txt = f.lower(pc, mask, flows).compile().as_text()
    assert txt.count("all-gather") == 0, "voting re-gathers the scene axis"
    out = f(pc, mask, flows)
    assert out.sharding.spec == P("data")


def test_train_step_has_no_feature_table_all_gathers(tmp_path):
    """The GSPMD-sharded train step must keep every neighbor gather
    shard-local: the flat-take lowering (batch axis folded into rows) made
    GSPMD all-gather entire feature tables to every device — 30
    all-gathers per step, HLO-audited — silently defeating DP scaling
    while staying correct.  ops._flat_take auto-selects the batched
    lowering when the process sees >1 device.  (manual_spmd=False: the
    default trainer is shard_map'd, whose only collectives are pmeans by
    construction.)"""
    tr = _make_trainer(tmp_path / "gspmd", manual=False)
    batch = _batch(8, seed=3)
    pcs, segms, flows, _ = batch
    (pcs_d, flows_d), b = tr._shard(pcs, flows)
    import jax.numpy as jnp

    txt = tr._train_step.lower(
        tr.params, tr.opt_state, pcs_d, flows_d,
        jnp.int32(0), aug=False,
    ).compile().as_text()
    assert txt.count("all-gather") == 0, (
        "feature gathers re-gather the batch axis"
    )


def test_dp_eval_fwd_manual_matches_gspmd():
    """The shard_map serving path (manual=True, the default — it is what
    lets Mosaic kernels lower on a mesh) must reproduce the GSPMD path
    exactly on a forward that exercises the neighbor ops, including the
    interpret-mode pool kernel inside the manual region."""
    import os

    import jax.numpy as jnp
    from ogc_tpu import ops
    from ogc_tpu.ops.pallas_pool import pool_neighbors

    def fwd(p, pc):
        _, idx = ops.knn(4, pc, pc, exact=True)
        grouped = ops.group(pc, idx)              # (B, N, 4, 3)
        return pool_neighbors(grouped, differentiable=False) * p

    jitted = jax.jit(fwd)
    pc = np.random.RandomState(0).rand(11, 64, 3).astype(np.float32)
    p = jax.numpy.float32(2.0)
    old = os.environ.get("OGC_PALLAS_POOL")
    os.environ["OGC_PALLAS_POOL"] = "interpret"
    try:
        got = pmesh.dp_eval_fwd(jitted, p, 0, manual=True)(pc)
    finally:
        if old is None:
            os.environ.pop("OGC_PALLAS_POOL", None)
        else:
            os.environ["OGC_PALLAS_POOL"] = old
    ref = pmesh.dp_eval_fwd(jitted, p, 0, manual=False)(pc)
    assert got.shape == (11, 64, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _make_trainer(tmp, manual, symgrad=False):
    model = MaskFormer3D(
        n_slot=N_SLOT, n_point=N_POINT, arch="sapien",
        n_transformer_layer=1, transformer_embed_dim=64,
    )
    pc = jax.numpy.zeros((1, N_POINT, 3))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    return SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0), start_steps=(0, 0, 0),
                               symmetric_smooth_grad=symgrad),
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 8),
        aug_transform_epoch=9999, ignore_npoint_thresh=0,
        exp_base=str(tmp), mesh=mesh, manual_spmd=manual,
    )


def test_fast_mode_train_step_has_no_all_gathers(tmp_path):
    """The fast-mode combination (bf16 compute + symmetric smooth grad —
    the *_fast.yaml configs) lowers DIFFERENT gathers than the default
    step (source-projected grouping moves the first Dense before the
    neighbor gather; the scatter-free smooth backward reshapes the
    cotangent flow), so the default step's all-gather audit does not
    cover it.  GSPMD must keep all of them shard-local too."""
    import jax.numpy as jnp

    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    try:
        tr = _make_trainer(tmp_path / "fast", manual=False, symgrad=True)
        pcs, segms, flows, _ = _batch(8, seed=5)
        (pcs_d, flows_d), b = tr._shard(pcs, flows)
        txt = tr._train_step.lower(
            tr.params, tr.opt_state, pcs_d, flows_d,
            jnp.int32(0), aug=False,
        ).compile().as_text()
    finally:
        set_compute_dtype(None)
    assert txt.count("all-gather") == 0, (
        "fast-mode gathers re-gather the batch axis"
    )


def test_manual_spmd_train_step_matches_gspmd(tmp_path):
    """shard_map (manual) training — what keeps the Mosaic kernels on a
    mesh — must reproduce the GSPMD step: local-batch loss + gradient
    pmean over equal padded shards equals the global-batch mean."""
    tr_g = _make_trainer(tmp_path / "g", manual=False)
    tr_m = _make_trainer(tmp_path / "m", manual=True)
    batch = _batch(8, seed=7)
    for it in range(2):
        ld_g, _, _ = tr_g.train_it(it, batch)
        ld_m, _, _ = tr_m.train_it(it, batch)
        for k in ld_g:
            np.testing.assert_allclose(ld_m[k], ld_g[k], rtol=2e-4,
                                       atol=1e-6, err_msg=k)
    for pg, pm in zip(jax.tree_util.tree_leaves(tr_g.params),
                      jax.tree_util.tree_leaves(tr_m.params)):
        # atol at float-reassociation scale: Adam divides two pmean'd
        # moments whose summation order differs between the lowerings,
        # amplifying near-zero moment wobble.  Real semantic divergence
        # would shift every element, not isolated ones — so the per-
        # element bound is loose (worst observed: 2 of 16384 at 1.6e-3
        # after two steps under the r5 reference-graph default, whose
        # scatter-add backward reassociates differently between the two
        # lowerings) and a tight SYSTEMATIC guard rides the mean.
        a_m, a_g = np.asarray(pm), np.asarray(pg)
        np.testing.assert_allclose(a_m, a_g, rtol=2e-2, atol=2e-3)
        assert np.mean(np.abs(a_m - a_g)) < 3e-5
    # Eval parity too (pmean'd scalars, sharded masks).
    pcs, segms, flows, _ = batch
    (pcs_d, flows_d), b = tr_g._shard(pcs, flows)
    lg, _, mg = tr_g._eval_step(tr_g.params, pcs_d, flows_d)
    lm, _, mm = tr_m._eval_step(tr_m.params, pcs_d, flows_d)
    np.testing.assert_allclose(float(lm), float(lg), rtol=2e-4)
    np.testing.assert_allclose(
        pmesh.local_values(mm, b), pmesh.local_values(mg, b),
        rtol=2e-3, atol=2e-5,
    )


def _make_flow_trainer(tmp, manual, bn_sync="global", n_devices=8):
    import optax

    from ogc_tpu.losses.flow_unsup import FlowLossConfig
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.train.flow import FlowTrainer

    model = FlowStep3D(npoint=64, arch="sapien", loc_flow_nn=4,
                       loc_flow_rad=0.2)
    pc0 = jax.numpy.zeros((1, 64, 3))
    variables = jax.jit(lambda k, a: model.init(k, a, a, a, a, 2))(
        jax.random.PRNGKey(0), pc0
    )
    return FlowTrainer(
        model=model, variables=variables, model_iters=2,
        loss_cfg=FlowLossConfig(iters_w=(0.5, 1.0)),
        # SGD, not Adam: Adam normalizes by |grad|, turning float
        # reassociation noise on near-zero gradients into +-lr update
        # flips; SGD keeps updates linear in the gradients, so this
        # compares the actual gradient math.
        optimizer=optax.sgd(1e-3), exp_base=str(tmp),
        mesh=pmesh.make_mesh(jax.devices()[:n_devices]),
        manual_spmd=manual, bn_sync=bn_sync,
    )


def test_manual_spmd_flow_step_matches_gspmd(tmp_path):
    """Flow trainer manual-SPMD parity in bn_sync="global" mode: BatchNorm
    batch statistics pmean across the mesh inside the manual region, so
    running stats, loss scalars, and parameters all match the GSPMD step's
    global-batch semantics."""
    tr_g = _make_flow_trainer(tmp_path / "g", False)
    tr_m = _make_flow_trainer(tmp_path / "m", True, bn_sync="global")
    rng = np.random.RandomState(0)
    pcs = rng.rand(8, 2, 64, 3).astype(np.float32)
    flows = (0.02 * rng.randn(8, 2, 64, 3)).astype(np.float32)
    batch = (pcs, None, flows, None)
    ld_g = tr_g.train_it(0, batch)
    ld_m = tr_m.train_it(0, batch)
    for k in ld_g:
        np.testing.assert_allclose(ld_m[k], ld_g[k], rtol=5e-4, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(tr_g.batch_stats),
                    jax.tree_util.tree_leaves(tr_m.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr_g.params),
                    jax.tree_util.tree_leaves(tr_m.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)


def test_flow_bn_sync_local_semantics(tmp_path):
    """bn_sync="local" (the manual-SPMD default): per-device BatchNorm
    batch stats + ONE fused running-stat all-reduce per step.

    Checks (a) the compiled manual step carries <= 10 all-reduces (vs ~200
    with in-layer pmeans, MULTICHIP r3); (b) running stats equal the mean
    over devices of the per-device linear updates — pinned against a
    single-device oracle run per shard; (c) loss/params stay finite and
    close to global-stat mode at homogeneous shard statistics."""
    import re

    tr_l = _make_flow_trainer(tmp_path / "l", True, bn_sync="local")
    rng = np.random.RandomState(0)
    pcs = rng.rand(8, 2, 64, 3).astype(np.float32)
    flows = (0.02 * rng.randn(8, 2, 64, 3)).astype(np.float32)
    batch = (pcs, None, flows, None)

    # (a) collective census on the lowered manual step.
    (pc1_d, pc2_d, gtf_d), _ = tr_l._shard(pcs[:, 0], pcs[:, 1], flows[:, 0])
    txt = tr_l._train_step.lower(
        tr_l.params, tr_l.batch_stats, tr_l.opt_state,
        pc1_d, pc2_d, gtf_d, jax.numpy.float32(0.9),
    ).compile().as_text()
    n_ar = sum(
        1 for line in txt.splitlines()
        if re.search(r"= (.+?) all-reduce(?:-start)?\(", line)
    )
    assert 1 <= n_ar <= 10, f"local bn_sync step has {n_ar} all-reduces"

    ld_l = tr_l.train_it(0, batch)
    assert np.isfinite(ld_l["sum"])

    # (b) running stats == mean over shards of single-device updates.
    # Single-device manual trainers see exactly one shard each; their BN
    # updates use that shard's local stats — the local-mode per-device
    # behavior by construction.
    oracle_leaves = None
    for s in range(8):
        tr_1 = _make_flow_trainer(tmp_path / f"o{s}", True,
                                  bn_sync="local", n_devices=1)
        tr_1.train_it(0, (pcs[s:s + 1], None, flows[s:s + 1], None))
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(tr_1.batch_stats)]
        if oracle_leaves is None:
            oracle_leaves = [l / 8.0 for l in leaves]
        else:
            oracle_leaves = [a + l / 8.0
                             for a, l in zip(oracle_leaves, leaves)]
    for got, want in zip(jax.tree_util.tree_leaves(tr_l.batch_stats),
                         oracle_leaves):
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-6)

    # (c) on a 1-device mesh local and global stats coincide — the two
    # modes must produce bit-identical steps (the multi-device modes
    # legitimately differ: at B_local=1 per-device batch stats are
    # per-sample, nothing like the global batch's).
    tr_1l = _make_flow_trainer(tmp_path / "c_l", True, bn_sync="local",
                               n_devices=1)
    tr_1g = _make_flow_trainer(tmp_path / "c_g", True, bn_sync="global",
                               n_devices=1)
    small = (pcs[:2], None, flows[:2], None)
    ld_1l = tr_1l.train_it(0, small)
    ld_1g = tr_1g.train_it(0, small)
    np.testing.assert_allclose(ld_1l["sum"], ld_1g["sum"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr_1l.batch_stats),
                    jax.tree_util.tree_leaves(tr_1g.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_manual_spmd_sup_trainer_matches_gspmd(tmp_path):
    """SupSegTrainer (previously untested) manual-SPMD parity with GSPMD:
    loss scalars and one-SGD-step parameters."""
    import optax

    from ogc_tpu.losses.seg_sup import SupLossConfig
    from ogc_tpu.train.seg_sup import SupSegTrainer

    def make(tmp, manual):
        model = MaskFormer3D(
            n_slot=N_SLOT, n_point=N_POINT, arch="sapien",
            n_transformer_layer=1, transformer_embed_dim=64,
        )
        pc = jax.numpy.zeros((1, N_POINT, 3))
        params = model.init(jax.random.PRNGKey(0), pc, pc)
        return SupSegTrainer(
            model=model, params=params, loss_cfg=SupLossConfig(),
            optimizer=optax.sgd(1e-3), ignore_npoint_thresh=0,
            exp_base=str(tmp), mesh=pmesh.make_mesh(jax.devices()[:8]),
            manual_spmd=manual,
        )

    tr_g = make(tmp_path / "g", False)
    tr_m = make(tmp_path / "m", True)
    rng = np.random.RandomState(2)
    pcs = rng.rand(8, T, N_POINT, 3).astype(np.float32)
    segms = rng.randint(0, N_SLOT, size=(8, T, N_POINT)).astype(np.int32)
    # one-hot GT masks with per-point valid masks, as the CLI feeds them
    gt = np.eye(N_SLOT, dtype=np.float32)[segms]
    valids = np.ones((8, T, N_POINT), np.float32)
    batch = (pcs, gt, None, valids)
    ld_g, _, _ = tr_g.train_it(0, batch)
    ld_m, _, _ = tr_m.train_it(0, batch)
    for k in ld_g:
        np.testing.assert_allclose(ld_m[k], ld_g[k], rtol=5e-4, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(tr_g.params),
                    jax.tree_util.tree_leaves(tr_m.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)
