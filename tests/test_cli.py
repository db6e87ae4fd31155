"""CLI smoke tests: train_seg.py then test_seg.py on a synthetic SAPIEN set,
run as real subprocesses with the reference-compatible YAML interface."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.synth import make_sapien_root

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_env():
    env = dict(os.environ)
    env["OGC_PLATFORM"] = "cpu"
    return env


@pytest.fixture(scope="module")
def sapien_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    root = str(tmp / "MBS_SAPIEN")
    # train_seg uses <root>/mbs-shapepart; test_seg --split test uses
    # <root>/mbs-sapien (reference train_seg.py:297, test_seg.py:37-40).
    make_sapien_root(osp.join(root, "mbs-shapepart"), n_scenes=3, n_points=64)
    make_sapien_root(osp.join(root, "mbs-sapien"), n_scenes=2, n_points=64)
    cfg = {
        "dataset": "sapien",
        "save_path": str(tmp / "ckpt" / "sapien_unsup"),
        "random_seed": 10,
        "data": {"root": root, "decentralize": False, "aug_transform_args": None},
        "predflow_path": None,
        "aug_transform_epoch": 9999,
        "ignore_npoint_thresh": 0,
        "epochs": 1,
        "batch_size": 2,
        "lr": 1.0e-3,
        "lr_decay": 0.7,
        "lr_clip": 1.0e-5,
        "decay_step": 200000,
        "weight_decay": 0.0,
        "segnet": {
            "n_slot": 4,
            "n_point": 64,
            "use_xyz": True,
            "n_transformer_layer": 1,
            "transformer_embed_dim": 64,
            "transformer_input_pos_enc": False,
        },
        "loss": {
            "weights": [10.0, 0.1, 0.0],
            "start_steps": [0, 0, 0],
            "dynamic_loss_params": {"loss_norm": 2},
            "smooth_loss_params": {
                "w_knn": 3.0,
                "w_ball_q": 1.0,
                "knn_loss_params": {"k": 4, "radius": 0.1, "loss_norm": 1},
                "ball_q_loss_params": {"k": 8, "radius": 0.2, "loss_norm": 1},
            },
            "invariance_loss_params": {"loss_norm": 2},
        },
    }
    cfg_path = str(tmp / "sapien_unsup.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    return cfg_path, cfg


@pytest.fixture(scope="module")
def trained_ckpt(sapien_cfg, cli_env):
    cfg_path, cfg = sapien_cfg
    r = subprocess.run(
        [sys.executable, "train_seg.py", cfg_path, "--round", "1"],
        cwd=REPO, env=cli_env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert osp.exists(cfg["save_path"] + "_R1/best.ckpt")
    return cfg_path, cfg


def _run_test_seg(cfg_path, cli_env, *extra):
    return subprocess.run(
        [
            sys.executable, "test_seg.py", cfg_path,
            "--split", "test", "--round", "1", "--test_batch_size", "4",
            *extra,
        ],
        cwd=REPO, env=cli_env, capture_output=True, text=True, timeout=900,
    )


def test_train_then_test_cli(trained_ckpt, cli_env):
    cfg_path, _ = trained_ckpt
    r = _run_test_seg(cfg_path, cli_env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "AveragePrecision@50" in r.stdout
    assert "PanopticQuality@50" in r.stdout


def test_seg_cli_dp_eval_matches_single_device(trained_ckpt, cli_env):
    """--dp 0 (all 8 virtual devices, odd final batch -> padding path) must
    reproduce the single-device metrics exactly: eval forwards are
    per-sample independent and padded rows are sliced off before metrics."""
    cfg_path, _ = trained_ckpt
    r1 = _run_test_seg(cfg_path, cli_env, "--dp", "1")
    r8 = _run_test_seg(cfg_path, cli_env, "--dp", "0")
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert r8.returncode == 0, r8.stderr[-3000:]
    tail1 = r1.stdout[r1.stdout.index("Evaluation on"):]
    tail8 = r8.stdout[r8.stdout.index("Evaluation on"):]
    assert tail1 == tail8, f"dp metrics diverge:\n{tail1}\nvs\n{tail8}"


def test_compute_dtype_hook(tmp_path):
    """`compute_dtype: bf16` in YAML (or OGC_COMPUTE_DTYPE) flips the MLP
    compute dtype through the shared config loader."""
    import argparse

    import jax.numpy as jnp

    from ogc_tpu.nn.layers import compute_dtype, set_compute_dtype
    from ogc_tpu.utils.config import load_config_into_args

    cfg = tmp_path / "c.yaml"
    cfg.write_text("compute_dtype: bf16\nfoo: 1\n")
    args = argparse.Namespace(config=str(cfg))
    try:
        load_config_into_args(args)
        assert args.foo == 1
        assert compute_dtype() == jnp.bfloat16
    finally:
        set_compute_dtype(None)
    cfg.write_text("foo: 2\n")
    load_config_into_args(argparse.Namespace(config=str(cfg)))
    assert compute_dtype() is None


def test_fast_configs_resolve_fast_modes():
    """The shipped *_fast.yaml configs must actually flip the validated
    fast mode (bf16 compute — PARITY.md ablations) and must NOT
    otherwise deviate from the parity protocol.  In particular the smooth
    graph must stay 'reference': the r5 10-seed ablation measured a PQ
    deficit for 'mutual', which is therefore no longer part of the fast
    mode (PARITY.md graph tables)."""
    import argparse

    import jax.numpy as jnp

    from ogc_tpu.losses.seg_unsup import OGCLossConfig
    from ogc_tpu.nn.layers import compute_dtype, set_compute_dtype
    from ogc_tpu.utils.config import load_config_into_args

    for cfg in ("config/seg/kittisf/kittisf_unsup_fast.yaml",
                "config/seg/waymo/waymo_unsup_fast.yaml"):
        base = cfg.replace("_fast", "")
        args = argparse.Namespace(config=os.path.join(REPO, cfg))
        ref = argparse.Namespace(config=os.path.join(REPO, base))
        try:
            load_config_into_args(args)
            assert compute_dtype() == jnp.bfloat16, cfg
        finally:
            set_compute_dtype(None)
        load_config_into_args(ref)
        lc = OGCLossConfig.from_dict(args.loss)
        assert not lc.symmetric_smooth_grad, cfg
        assert lc.smooth_graph == "reference", cfg
        # Everything else must match the parity config exactly.
        assert lc == OGCLossConfig.from_dict(ref.loss)
        assert args.segnet == ref.segnet and args.epochs == ref.epochs
        assert args.lr == ref.lr and args.batch_size == ref.batch_size


def _run_vote(cfg_path, cli_env, *extra):
    return subprocess.run(
        [
            sys.executable, "vote.py", cfg_path,
            "--split", "test", "--round", "1", "--test_batch_size", "8",
            "--use_gt_flow", *extra,
        ],
        cwd=REPO, env=cli_env, capture_output=True, text=True, timeout=900,
    )


def test_vote_cli_and_dp_equality(trained_ckpt, cli_env):
    """vote.py: one fused device call per batch (segnet + lax.map voting);
    --dp 0 shards scenes over the 8-device mesh and must reproduce the
    single-device metrics exactly (scene-independent voting, padded scenes
    sliced off before metrics)."""
    cfg_path, _ = trained_ckpt
    r1 = _run_vote(cfg_path, cli_env, "--dp", "1")
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "AveragePrecision@50" in r1.stdout
    r8 = _run_vote(cfg_path, cli_env, "--dp", "0")
    assert r8.returncode == 0, r8.stderr[-3000:]
    tail1 = r1.stdout[r1.stdout.index("Evaluation on"):]
    tail8 = r8.stdout[r8.stdout.index("Evaluation on"):]
    assert tail1 == tail8, f"vote dp metrics diverge:\n{tail1}\nvs\n{tail8}"
