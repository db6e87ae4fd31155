"""End-to-end flow training smoke test: a few steps on synthetic rigid
scenes, chamfer loss must decrease and BN stats must update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ogc_tpu.data.base import DataLoader
from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.losses.flow_unsup import FlowLossConfig
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
