"""End-to-end flow training smoke test: a few steps on synthetic rigid
scenes, chamfer loss must decrease and BN stats must update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ogc_tpu.data.base import DataLoader
from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.losses.flow_unsup import FlowLossConfig, flowstep3d_loss
from ogc_tpu.models.flownet import FlowStep3D
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.train.flow import FlowTrainer, make_bn_schedule
from ogc_tpu.train.seg import make_optimizer
from tests.synth import make_sapien_root


def test_flow_train_step_runs_and_improves(tmp_path):
    root = make_sapien_root(str(tmp_path / "sapien"), n_scenes=3, n_points=64)
    train_set = SapienDataset(
        root, split="train",
        view_sels=[[0, 1], [1, 0]],
    )
    loader = DataLoader(train_set, batch_size=2, shuffle=True, seed=0,
                        drop_last=True, num_workers=1)

    model = FlowStep3D(npoint=64, arch="sapien")
    dummy = jnp.zeros((1, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy, 2)

    trainer = FlowTrainer(
        model=model,
        variables=variables,
        model_iters=2,
        loss_cfg=FlowLossConfig(iters_w=(0.5, 0.3)),
        optimizer=make_optimizer(1e-3, 0.5, 1e-5, 400000, 2),
        exp_base=str(tmp_path / "exp"),
        bn_schedule=make_bn_schedule(0.9, 0.5, 400000, 2),
        mesh=pmesh.make_mesh(jax.devices()[:1]),
    )

    stats_before = jax.device_get(trainer.batch_stats)
    losses = []
    it = 0
    for _ in range(4):
        for batch in loader:
            ld = trainer.train_it(it, batch)
            losses.append(ld["sum"])
            assert np.isfinite(ld["sum"])
            assert "epe3d_#0" in ld and "epe3d_#1" in ld
            it += 1
    assert np.mean(losses[-2:]) < np.mean(losses[:2])

    stats_after = jax.device_get(trainer.batch_stats)
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        stats_before, stats_after,
    )
    assert any(jax.tree_util.tree_leaves(changed))

    val_loss, val_avg = trainer.eval_epoch(loader)
    assert np.isfinite(val_loss)


@pytest.mark.parametrize("mode", ["full", "dots", "scan"])
def test_flow_remat_grads_match_default(tmp_path, mode):
    """Flow remat variants (whole-forward jax.checkpoint and per-iteration
    nn.remat of the refinement scan body) re-execute the same ops in the
    backward — the loss AND the gradient tree must match the default up to
    fp reassociation.  Gradients (not post-Adam params) are the right
    comparison: Adam's first step is ~lr*sign(g), so reassociation noise on
    a near-zero gradient entry flips to a full ±lr param difference even
    when the remat is mathematically exact.  Tolerance is scaled per-leaf
    by the gradient magnitude for the same reason.  iters=3 so the scanned
    refinement path (not the 2-iter prefix-only path) is exercised."""
    rng = np.random.RandomState(0)
    pc1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    pc2 = jnp.asarray(pc1 + 0.05 * rng.randn(2, 64, 3).astype(np.float32))

    def run(mode):
        model = FlowStep3D(npoint=64, arch="sapien",
                           remat_refine=mode == "scan")
        dummy = jnp.zeros((1, 64, 3))
        variables = model.init(
            jax.random.PRNGKey(0), dummy, dummy, dummy, dummy, 2
        )
        tr = FlowTrainer(
            model=model, variables=variables, model_iters=3,
            loss_cfg=FlowLossConfig(iters_w=(0.5, 0.3, 0.3)),
            optimizer=make_optimizer(1e-3, 0.5, 1e-5, 400000, 2),
            exp_base=str(tmp_path / f"exp_{mode}"),
            mesh=pmesh.make_mesh(jax.devices()[:1]),
            remat=None if mode in ("off", "scan") else mode,
        )

        # Mirror _train_step_impl's loss graph, stopping before the
        # optimizer so we compare the quantity remat actually touches.
        def apply(p):
            return tr.model.apply(
                {"params": p, "batch_stats": tr.batch_stats},
                pc1, pc2, pc1, pc2, tr.model_iters,
                train=True, bn_momentum=jnp.float32(0.9),
                mutable=["batch_stats"],
            )

        apply = tr._remat_wrap(apply, tr.remat)

        def loss_fn(p):
            flow_preds, _ = apply(p)
            loss, _ = flowstep3d_loss(pc1, pc2, flow_preds, tr.loss_cfg)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(tr.params)
        return float(loss), jax.device_get(grads)

    base_loss, base_grads = run("off")
    m_loss, m_grads = run(mode)
    assert np.allclose(base_loss, m_loss, rtol=1e-5, atol=1e-6)
    flat_base, tdef = jax.tree_util.tree_flatten(base_grads)
    flat_m = jax.tree_util.tree_flatten(m_grads)[1] == tdef and \
        jax.tree_util.tree_leaves(m_grads)
    assert flat_m is not False, "gradient tree structure changed under remat"
    for a, b in zip(flat_base, flat_m):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4 * scale)
