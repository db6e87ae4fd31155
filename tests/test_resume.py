"""Checkpoint resume test: save mid-training, restore into a fresh trainer,
verify params + optimizer state + epoch round-trip exactly."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from ogc_tpu.data.base import DataLoader
from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.losses.seg_unsup import OGCLossConfig
from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.train.seg import SegTrainer, make_optimizer
from tests.synth import make_sapien_root


def make_trainer(model, params, tmp_path, name):
    return SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0)),
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 2),
        aug_transform_epoch=9999,
        ignore_npoint_thresh=0,
        exp_base=str(tmp_path / name),
        mesh=pmesh.make_mesh(jax.devices()[:1]),
    )


def test_resume_roundtrip(tmp_path):
    root = make_sapien_root(str(tmp_path / "sapien"), n_scenes=2, n_points=64)
    ds = SapienDataset(root, split="train", view_sels=[[0, 1]])
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1)

    model = MaskFormer3D(n_slot=4, n_point=64, arch="sapien",
                         n_transformer_layer=1, transformer_embed_dim=64)
    pc = jnp.zeros((1, 64, 3))
    params = model.init(jax.random.PRNGKey(0), pc, pc)

    t1 = make_trainer(model, params, tmp_path, "exp1")
    for i, batch in enumerate(loader):
        t1.train_it(i, batch)
    t1.save(True, epoch=3)

    t2 = make_trainer(model, params, tmp_path, "exp2")
    epoch = t2.resume(str(tmp_path / "exp1" / "current"))
    assert epoch == 3

    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t1.params)),
        jax.tree_util.tree_leaves(jax.device_get(t2.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t1.opt_state)),
        jax.tree_util.tree_leaves(jax.device_get(t2.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed trainer must take identical next steps.
    batch = next(iter(loader))
    ld1, _, _ = t1.train_it(10, batch)
    ld2, _, _ = t2.train_it(10, batch)
    np.testing.assert_allclose(ld1["sum"], ld2["sum"], rtol=1e-6)


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save: background write joins on load; atomic rename leaves the
    previous file intact until the new one is complete."""
    import jax.numpy as jnp

    from ogc_tpu.utils.checkpoint import (
        load_train_state, save_checkpoint, wait_pending_saves,
    )

    state = {"model_state": {"w": jnp.arange(5.0)}, "epoch": 3}
    fn = str(tmp_path / "cur")
    bn = str(tmp_path / "best")
    save_checkpoint(state, True, filename=fn, bestname=bn, async_save=True)
    # load joins the pending writer.
    out = load_train_state(fn, {"model_state": {"w": jnp.zeros(5)}, "epoch": 0})
    assert out["epoch"] == 3
    assert np.allclose(np.asarray(out["model_state"]["w"]), np.arange(5.0))
    # best copy exists too
    out2 = load_train_state(bn, {"model_state": {"w": jnp.zeros(5)}, "epoch": 0})
    assert out2["epoch"] == 3
    wait_pending_saves()  # idempotent


def test_async_checkpoint_error_surfaces(tmp_path, monkeypatch):
    """A failed background write must raise on the next wait/save/load, not
    vanish into the thread."""
    import ogc_tpu.utils.checkpoint as C

    def boom(path, data):
        raise OSError("disk full")

    monkeypatch.setattr(C, "_write_atomic", boom)
    C.save_checkpoint({"x": np.zeros(3)}, False,
                      filename=str(tmp_path / "c"), async_save=True)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        C.wait_pending_saves()
    # slot cleared: subsequent waits are clean
    C.wait_pending_saves()


def test_flow_trainer_resume_roundtrip(tmp_path):
    """FlowTrainer.resume restores params, BatchNorm running stats,
    optimizer state and epoch (the CLIs now expose --resume on every
    trainer; the reference always restarts at epoch 1)."""
    import optax

    from ogc_tpu.losses.flow_unsup import FlowLossConfig
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.flow import FlowTrainer

    def make(tmp):
        model = FlowStep3D(npoint=64, arch="sapien", loc_flow_nn=4,
                           loc_flow_rad=0.2)
        pc0 = jax.numpy.zeros((1, 64, 3))
        variables = jax.jit(lambda k, a: model.init(k, a, a, a, a, 2))(
            jax.random.PRNGKey(0), pc0
        )
        return FlowTrainer(
            model=model, variables=variables, model_iters=2,
            loss_cfg=FlowLossConfig(iters_w=(0.5, 1.0)),
            optimizer=optax.adam(1e-3), exp_base=str(tmp),
            mesh=pmesh.make_mesh(jax.devices()[:2]),
        )

    tr = make(tmp_path / "a")
    rng = np.random.RandomState(0)
    pcs = rng.rand(4, 2, 64, 3).astype(np.float32)
    flows = (0.02 * rng.randn(4, 2, 64, 3)).astype(np.float32)
    tr.train_it(0, (pcs, None, flows, None))
    tr.save(False, epoch=5)

    tr2 = make(tmp_path / "b")
    epoch = tr2.resume(tr.checkpoint_name)
    assert epoch == 5
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.batch_stats),
                    jax.tree_util.tree_leaves(tr2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_state),
                    jax.tree_util.tree_leaves(tr2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
