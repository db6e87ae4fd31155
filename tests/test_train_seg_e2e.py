"""End-to-end unsupervised training smoke test on synthetic rigid scenes:
train a tiny MaskFormer3D for a few steps and check the loss goes down and
checkpoints are written."""

import os.path as osp

import numpy as np
import jax
import pytest

from ogc_tpu.data.base import DataLoader
from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.losses.seg_unsup import OGCLossConfig
from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.train.seg import SegTrainer, make_optimizer
from ogc_tpu.utils.checkpoint import load_checkpoint
from tests.synth import make_sapien_root


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = make_sapien_root(
        str(tmp_path_factory.mktemp("sapien_e2e")),
        n_scenes=4, n_views=4, n_points=128, n_parts=2,
    )
    train_set = SapienDataset(root, split="train", view_sels=[[0, 1], [1, 2]])
    val_set = SapienDataset(root, split="val", view_sels=[[0, 1]])
    model = MaskFormer3D(
        n_slot=4, n_point=128, arch="sapien",
        n_transformer_layer=1, transformer_embed_dim=64,
    )
    pc = jax.numpy.zeros((1, 128, 3))
    params = model.init(jax.random.PRNGKey(0), pc, pc)
    return root, train_set, val_set, model, params


def test_train_reduces_loss(tiny_setup, tmp_path):
    _, train_set, val_set, model, params = tiny_setup
    optimizer = make_optimizer(
        lr=1e-3, lr_decay=0.7, lr_clip=1e-5, decay_step=200000,
        batch_size=2, weight_decay=0.0,
    )
    trainer = SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0), start_steps=(0, 0, 0)),
        optimizer=optimizer,
        aug_transform_epoch=9999,
        ignore_npoint_thresh=0,
        exp_base=str(tmp_path / "exp"),
        mesh=pmesh.make_mesh(jax.devices()[:1]),
    )
    train_loader = DataLoader(train_set, batch_size=2, shuffle=True, seed=0,
                              drop_last=True, num_workers=1)
    val_loader = DataLoader(val_set, batch_size=1, shuffle=False, num_workers=1)

    first_losses, last_losses = [], []
    it = 0
    for epoch in range(6):
        for batch in train_loader:
            ld, segm, mask = trainer.train_it(it, batch)
            if epoch == 0:
                first_losses.append(ld["sum"])
            if epoch == 5:
                last_losses.append(ld["sum"])
            it += 1
    assert np.mean(last_losses) < np.mean(first_losses)

    # Eval path works and checkpointing round-trips.
    val_loss, val_avg, ap = trainer.eval_epoch(val_loader)
    assert np.isfinite(val_loss)
    from ogc_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(trainer.params, True,
                    filename=str(tmp_path / "exp" / "current"),
                    bestname=str(tmp_path / "exp" / "best"))
    restored = load_checkpoint(str(tmp_path / "exp" / "best"), jax.device_get(trainer.params))
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            jax.device_get(trainer.params), restored,
        )
    )
    assert chex_equal


@pytest.mark.parametrize("remat", ["full", "dots"])
def test_remat_train_step_matches_default(tiny_setup, tmp_path, remat):
    """jax.checkpoint remat modes re-execute the same forward ops in the
    backward instead of loading stored activations — the resulting update
    must match the default step (up to fp reassociation from different
    fusion)."""
    _, train_set, _, model, params = tiny_setup
    optimizer = make_optimizer(1e-3, 0.7, 1e-5, 200000, 2)

    def make(remat_mode):
        return SegTrainer(
            model=model, params=params,
            loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.1),
                                   start_steps=(0, 0, 0)),
            optimizer=optimizer,
            aug_transform_epoch=9999, ignore_npoint_thresh=0,
            exp_base=str(tmp_path / f"exp_remat_{remat_mode}"),
            mesh=pmesh.make_mesh(jax.devices()[:1]),
            remat=remat_mode,
        )

    base, rm = make("off"), make(remat)
    assert base.remat is None and rm.remat == remat
    batch = next(iter(DataLoader(train_set, batch_size=2, shuffle=False,
                                 num_workers=1)))
    ld0, _, _ = base.train_it(0, batch)
    ld1, _, _ = rm.train_it(0, batch)
    assert np.allclose(ld0["sum"], ld1["sum"], rtol=1e-5, atol=1e-6)
    for (a, b) in zip(jax.tree_util.tree_leaves(base.params),
                      jax.tree_util.tree_leaves(rm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_remat_env_resolution(monkeypatch):
    from ogc_tpu.train.seg import _resolve_remat

    assert _resolve_remat("off") is None
    assert _resolve_remat("FULL") == "full"
    monkeypatch.setenv("OGC_REMAT", "dots")
    assert _resolve_remat(None) == "dots"
    monkeypatch.setenv("OGC_REMAT", "")
    assert _resolve_remat(None) is None
    with pytest.raises(ValueError):
        _resolve_remat("bogus")


def test_trainer_full_loop_runs(tiny_setup, tmp_path):
    _, train_set, val_set, model, params = tiny_setup
    optimizer = make_optimizer(1e-3, 0.7, 1e-5, 200000, 2)
    trainer = SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.1)),
        optimizer=optimizer,
        aug_transform_epoch=1,  # exercises the aug-view switch at epoch 2
        ignore_npoint_thresh=0,
        exp_base=str(tmp_path / "exp2"),
        mesh=pmesh.make_mesh(jax.devices()[:1]),
    )
    train_set.aug_transform_args = {
        "scale_low": 0.95, "scale_high": 1.05,
        "degree_range": [0, 180, 0], "shift_range": [0, 0, 0],
    }
    train_loader = DataLoader(train_set, batch_size=2, shuffle=True,
                              drop_last=True, num_workers=1)
    val_loader = DataLoader(val_set, batch_size=1, shuffle=False, num_workers=1)
    best = trainer.train(2, train_set, train_loader, val_loader, progress=False)
    assert np.isfinite(best)
    assert osp.exists(str(tmp_path / "exp2" / "best.ckpt"))
    train_set.aug_transform = False  # reset for other tests
