"""Outdoor flow-extraction CLI e2e tests (CPU subprocesses).

test_flow_waymo.py / test_flow_kittisf.py run their full per-scene pipeline
(GPF ground removal, ICP ego-motion, FOV bounding, FPS, flownet, 3-NN
upsample, flow composition, predflow save) on synthetic fixtures — these
paths were previously covered only at the library level.  Exercises the
batched-XLA preprocessing default (icp_xla / ground_plane_fitting_xla,
SURVEY §3.5) end-to-end through the real CLIs.
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _run_cli(script, cfg_path, *flags, timeout=1500, env_extra=None):
    env = dict(os.environ)
    env["OGC_PLATFORM"] = "cpu"
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(
        [sys.executable, script, cfg_path, *flags],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    return r.stdout


def _save_flow_ckpt(path, npoint):
    """Init a tiny flownet and write its variables where the CLI loads
    weights from.  arch="kitti" — the outdoor CLIs hardcode it."""
    import jax
    import jax.numpy as jnp

    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.checkpoint import save_checkpoint

    net = FlowStep3D(npoint=npoint, arch="kitti", loc_flow_nn=4,
                     loc_flow_rad=1.5, k_decay_fact=0.5)
    dummy = jnp.zeros((1, npoint, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy, 2)
    os.makedirs(osp.dirname(path), exist_ok=True)
    save_checkpoint(jax.device_get(variables), False, filename=path)
    return net


def _flownet_cfg(npoint):
    # arch is keyed on dataset in the CLIs ("kitti"); the test overrides via
    # npoint-compatible sapien arch is NOT reachable from the CLI flag set,
    # so use the kitti arch with a small npoint (all dims divide npoint=128).
    return {"npoint": npoint, "use_instance_norm": False,
            "loc_flow_nn": 4, "loc_flow_rad": 1.5}


@pytest.fixture(scope="module")
def waymo_fixture(tmp_path_factory):
    """Waymo-layout fixture with a flat ground plane + elevated objects so
    GPF removes a plausible subset."""
    root = str(tmp_path_factory.mktemp("waymo_cli"))
    rng = np.random.RandomState(0)
    seqs = ["seq_a"]
    n_frames, n_ground, n_obj = 3, 400, 300
    for seq in seqs:
        d = osp.join(root, "data", seq)
        os.makedirs(d, exist_ok=True)
        for t in range(n_frames):
            ground = np.stack(
                [40 * rng.rand(n_ground) - 20, 0.02 * rng.randn(n_ground),
                 30 * rng.rand(n_ground) + 3], 1)
            obj = np.stack(
                [20 * rng.rand(n_obj) - 10, 1.0 + 1.5 * rng.rand(n_obj),
                 25 * rng.rand(n_obj) + 4], 1)
            pc = np.concatenate([ground, obj], 0).astype(np.float32)
            n = pc.shape[0]
            segm = np.concatenate(
                [np.zeros(n_ground), rng.randint(1, 3, n_obj)]
            ).astype(np.int32)
            np.save(osp.join(d, "pc_%04d.npy" % t), pc)
            np.save(osp.join(d, "segm_%04d.npy" % t), segm)
            np.save(osp.join(d, "semantic_segm_%04d.npy" % t), segm)
            np.save(osp.join(d, "pose_%04d.npy" % t), np.eye(4))
            if t > 0:
                np.save(osp.join(d, "flow_%04d_%04d.npy" % (t, t - 1)),
                        0.05 * rng.randn(n, 3).astype(np.float32))
    mapping = osp.join(root, "train.txt")
    with open(mapping, "w") as f:
        f.write("\n".join(s + ".tfrecord" for s in seqs))
    return root, mapping


@pytest.mark.slow
def test_flow_waymo_cli_xla_preproc(waymo_fixture, tmp_path):
    root, mapping = waymo_fixture
    npoint = 128
    save_path = str(tmp_path / "ckpt" / "flow_waymo")
    _save_flow_ckpt(save_path, npoint)
    cfg = {
        "dataset": "waymo",
        "save_path": save_path,
        "data": {"root": root, "mapping_path": mapping},
        "flownet": _flownet_cfg(npoint),
    }
    cfg_path = str(tmp_path / "waymo.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = _run_cli("test_flow_waymo.py", cfg_path, "--split", "train",
                   "--test_model_iters", "2", "--bound", "--save",
                   "--approx_knn")
    assert "Evaluation on waymo-train" in out, out[-800:]
    # Saved predictions exist and are finite full-resolution flows.
    save_dir = osp.join(root, "flow_preds/flowstep3d_gpf_bound")
    saved = sorted(osp.join(dp, f) for dp, _, fs in os.walk(save_dir)
                   for f in fs if f.endswith(".npy"))
    assert saved, "no predflows written"
    arr = np.load(saved[0])
    assert arr.ndim == 2 and arr.shape[1] == 3
    assert np.isfinite(arr).all()
    flows1 = {f: np.load(f) for f in saved}

    def _metrics(stdout):
        import ast

        (line,) = [l for l in stdout.splitlines()
                   if "Evaluation on waymo-train" in l]
        return ast.literal_eval(line[line.index("{"):])

    # --scene_batch 2: GPF / FPS / ICP / network / upsample batched over
    # padded clouds must reproduce the per-scene metrics AND predflows.
    out_b = _run_cli("test_flow_waymo.py", cfg_path, "--split", "train",
                     "--test_model_iters", "2", "--bound", "--save",
                     "--approx_knn", "--scene_batch", "2")
    m1, mb = _metrics(out), _metrics(out_b)
    assert m1.keys() == mb.keys()
    for k in m1:  # batched reassociation -> tiny fp drift only
        np.testing.assert_allclose(mb[k], m1[k], rtol=1e-5, atol=1e-6)
    for f in saved:
        np.testing.assert_allclose(np.load(f), flows1[f],
                                   rtol=1e-5, atol=1e-5)

    # And sharded over the virtual mesh: --scene_batch 2 --dp 0.
    out_dp = _run_cli("test_flow_waymo.py", cfg_path, "--split", "train",
                      "--test_model_iters", "2", "--bound", "--approx_knn",
                      "--scene_batch", "2", "--dp", "0")
    mdp = _metrics(out_dp)
    for k in m1:
        np.testing.assert_allclose(mdp[k], m1[k], rtol=1e-5, atol=1e-6)

    # Serial fallback (OGC_WAYMO_PIPELINE=off): same device dispatches,
    # same in-order finalization, no worker thread — must match the
    # default double-buffered pipeline bitwise (metrics AND predflows).
    flows_b = {f: np.load(f) for f in saved}
    out_s = _run_cli("test_flow_waymo.py", cfg_path, "--split", "train",
                     "--test_model_iters", "2", "--bound", "--save",
                     "--approx_knn", "--scene_batch", "2",
                     env_extra={"OGC_WAYMO_PIPELINE": "off"})
    ms = _metrics(out_s)
    for k in m1:
        np.testing.assert_array_equal(ms[k], mb[k])
    for f in saved:
        np.testing.assert_array_equal(np.load(f), flows_b[f])


@pytest.mark.slow
def test_flow_waymo_batched_empty_post_gpf_scene(tmp_path):
    """A scene whose points are entirely ground (empty post-GPF cloud) must
    not abort its --scene_batch group: it routes to the ego-only identity
    path (zero residual flow) while the rest of the group proceeds."""
    root = str(tmp_path / "waymo_empty")
    rng = np.random.RandomState(1)
    n_frames, n_ground, n_obj = 3, 400, 300
    d = osp.join(root, "data", "seq_a")
    os.makedirs(d, exist_ok=True)
    for t in range(n_frames):
        ground = np.stack(
            [40 * rng.rand(n_ground) - 20, 0.02 * rng.randn(n_ground),
             30 * rng.rand(n_ground) + 3], 1)
        if t == 2:  # frame 2: all-ground -> pair (2,1) has empty pc1
            pc = ground.astype(np.float32)
            segm = np.zeros(n_ground, np.int32)
        else:
            obj = np.stack(
                [20 * rng.rand(n_obj) - 10, 1.0 + 1.5 * rng.rand(n_obj),
                 25 * rng.rand(n_obj) + 4], 1)
            pc = np.concatenate([ground, obj], 0).astype(np.float32)
            segm = np.concatenate(
                [np.zeros(n_ground), rng.randint(1, 3, n_obj)]
            ).astype(np.int32)
        n = pc.shape[0]
        np.save(osp.join(d, "pc_%04d.npy" % t), pc)
        np.save(osp.join(d, "segm_%04d.npy" % t), segm)
        np.save(osp.join(d, "semantic_segm_%04d.npy" % t), segm)
        np.save(osp.join(d, "pose_%04d.npy" % t), np.eye(4))
        if t > 0:
            np.save(osp.join(d, "flow_%04d_%04d.npy" % (t, t - 1)),
                    0.05 * rng.randn(n, 3).astype(np.float32))
    mapping = osp.join(root, "train.txt")
    with open(mapping, "w") as f:
        f.write("seq_a.tfrecord")

    npoint = 128
    save_path = str(tmp_path / "ckpt" / "flow_waymo")
    _save_flow_ckpt(save_path, npoint)
    cfg = {
        "dataset": "waymo",
        "save_path": save_path,
        "data": {"root": root, "mapping_path": mapping},
        "flownet": _flownet_cfg(npoint),
    }
    cfg_path = str(tmp_path / "waymo.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    # Both pairs land in one K=2 group; pair (2,1) has an empty post-GPF
    # frame-1 cloud.
    out = _run_cli("test_flow_waymo.py", cfg_path, "--split", "train",
                   "--test_model_iters", "2", "--bound", "--save",
                   "--approx_knn", "--scene_batch", "2")
    assert "Evaluation on waymo-train" in out, out[-800:]
    save_dir = osp.join(root, "flow_preds/flowstep3d_gpf_bound")
    saved = sorted(osp.join(dp, f) for dp, _, fs in os.walk(save_dir)
                   for f in fs if f.endswith(".npy"))
    assert len(saved) == 2, saved
    for f in saved:
        arr = np.load(f)
        assert np.isfinite(arr).all()
    # The all-ground scene's prediction is the ego-only zero flow.
    empty = np.load(osp.join(save_dir, "seq_a", "flow_0002_0001.npy"))
    np.testing.assert_array_equal(empty, np.zeros_like(empty))


@pytest.mark.slow
def test_flow_kittisf_cli_xla_preproc(tmp_path):
    base = str(tmp_path / "kittisf")
    # Full-resolution layout (downsampled=False): processed/<id>/{pc1, pc2,
    # segm}.npy.  Points span y in [0, 20): the CLI's height-based ground
    # filter (y < -1.4 in BOTH frames) removes nothing.
    rng = np.random.RandomState(0)
    ids = ["%06d" % i for i in range(2)]
    for i in ids:
        d = osp.join(base, "processed", i)
        os.makedirs(d, exist_ok=True)
        pc1 = (20 * rng.rand(256, 3)).astype(np.float32)
        np.save(osp.join(d, "pc1.npy"), pc1)
        np.save(osp.join(d, "pc2.npy"),
                pc1 + 0.2 * rng.randn(256, 3).astype(np.float32))
        np.save(osp.join(d, "segm.npy"), rng.randint(0, 3, 256))
    os.makedirs(osp.join(base, "splits"), exist_ok=True)
    val_map = osp.join(base, "splits", "val.txt")
    with open(val_map, "w") as f:
        f.write("\n".join(ids))
    npoint = 128
    save_path = str(tmp_path / "ckpt" / "flow_kittisf")
    _save_flow_ckpt(save_path, npoint)
    cfg = {
        "dataset": "kittisf",
        "save_path": save_path,
        "data": {"root": base, "mapping_path": val_map},
        "flownet": _flownet_cfg(npoint),
    }
    cfg_path = str(tmp_path / "kittisf.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = _run_cli("test_flow_kittisf.py", cfg_path, "--split", "val",
                   "--test_model_iters", "2", "--save", "--approx_knn")
    assert "Evaluation on kittisf-val" in out, out[-800:]
    save_dir = osp.join(base, "flow_preds/flowstep3d")
    saved = sorted(
        osp.join(dp, f)
        for dp, _, fs in os.walk(save_dir) for f in fs if f.endswith(".npy")
    )
    assert saved, "no predflows written"
    flows1 = {f: np.load(f) for f in saved}

    # --scene_batch 2 (batched FPS/ICP/network/upsample over padded
    # clouds) must reproduce the per-scene metrics AND predflows exactly.
    out_b = _run_cli("test_flow_kittisf.py", cfg_path, "--split", "val",
                     "--test_model_iters", "2", "--save", "--approx_knn",
                     "--scene_batch", "2")
    def _metrics(stdout):
        import ast

        (line,) = [l for l in stdout.splitlines()
                   if "Evaluation on kittisf" in l]
        return ast.literal_eval(line[line.index("{"):])

    m1, mb = _metrics(out), _metrics(out_b)
    assert m1.keys() == mb.keys()
    for k in m1:  # batched einsum reassociation -> tiny fp drift only
        np.testing.assert_allclose(mb[k], m1[k], rtol=1e-5, atol=1e-6)

    # And sharded over the virtual mesh: --scene_batch 2 --dp 0.
    out_dp = _run_cli("test_flow_kittisf.py", cfg_path, "--split", "val",
                      "--test_model_iters", "2", "--approx_knn",
                      "--scene_batch", "2", "--dp", "0")
    mdp = _metrics(out_dp)
    for k in m1:
        np.testing.assert_allclose(mdp[k], m1[k], rtol=1e-5, atol=1e-6)
    for f in saved:
        np.testing.assert_allclose(
            np.load(f), flows1[f], rtol=1e-5, atol=1e-5,
        )


@pytest.mark.slow
def test_seg_waymo_cli_dp_eval(tmp_path):
    """test_seg_waymo.py end-to-end on a synthetic downsampled-Waymo layout
    (the CLI previously had only library-level coverage), with --dp 0
    data-parallel eval over the virtual 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.checkpoint import save_checkpoint

    # The CLI reads the repo's real split list and the dataset skips
    # unavailable sequences — provide only the first train sequence.
    with open(osp.join(REPO, "data_prepare/waymo/splits/train.txt")) as f:
        seq = osp.splitext(f.readline().strip())[0]

    root = str(tmp_path / "waymo")
    n_point, n_frames = 256, 3
    d = osp.join(root, "data", seq)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for t in range(n_frames):
        pc = np.stack(
            [20 * rng.rand(n_point) - 10, 2.0 * rng.rand(n_point),
             25 * rng.rand(n_point) + 4], 1).astype(np.float32)
        segm = rng.randint(0, 2, n_point).astype(np.int32)
        segm[:100] = 1  # one sizable instance above ignore_npoint_thresh=50
        np.save(osp.join(d, "pc_%04d.npy" % t), pc)
        np.save(osp.join(d, "segm_%04d.npy" % t), segm)
        np.save(osp.join(d, "semantic_segm_%04d.npy" % t), segm)

    save_path = str(tmp_path / "ckpt" / "waymo_unsup")
    os.makedirs(save_path, exist_ok=True)
    seg_cfg = dict(n_slot=4, n_point=n_point, use_xyz=True,
                   n_transformer_layer=1, transformer_embed_dim=64,
                   transformer_input_pos_enc=False)
    net = MaskFormer3D(arch="waymo", **seg_cfg)
    dummy = jnp.zeros((1, n_point, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), dummy, dummy)
    save_checkpoint(jax.device_get(params), False,
                    filename=osp.join(save_path, "best"))

    cfg = {
        "dataset": "waymo",
        "save_path": save_path,
        "data": {"root": root, "decentralize": False},
        "segnet": seg_cfg,
    }
    cfg_path = str(tmp_path / "waymo_unsup.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    out = _run_cli("test_seg_waymo.py", cfg_path, "--split", "train",
                   "--test_batch_size", "3", "--dp", "0")
    assert "AveragePrecision@50" in out
    assert "PanopticQuality@50" in out
