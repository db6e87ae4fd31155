"""On-chip A/B for the double-buffered Waymo scene-batched eval pipeline
(test_flow_waymo.py::_batched_eval, OGC_WAYMO_PIPELINE on/off).

Builds a synthetic Waymo-layout fixture at protocol-like scale (default
24 view-pairs, ~40k raw points/frame, flat ground + elevated objects so
GPF removes a plausible subset), writes an 8192-pt kitti-arch flownet
checkpoint, then runs the real CLI twice — pipelined and serialized —
and reports the two eval walls (each run pays the same compiles; the
pipeline overlaps group k+1's device phases A-C with group k's host
finalization).  Run ON TPU, one process at a time:

    python tools/bench_waymo_pipeline.py [--scenes 24] [--raw_n 40000]
"""

import argparse
import os
import os.path as osp
import re
import subprocess
import sys
import tempfile
import time

import numpy as np
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def build_fixture(root, n_pairs, raw_n, seed=0):
    rng = np.random.RandomState(seed)
    n_frames = n_pairs + 1
    seq = "seq_a"
    d = osp.join(root, "data", seq)
    os.makedirs(d, exist_ok=True)
    n_ground = raw_n // 2
    n_obj = raw_n - n_ground
    for t in range(n_frames):
        ground = np.stack(
            [80 * rng.rand(n_ground) - 40, 0.04 * rng.randn(n_ground),
             55 * rng.rand(n_ground) + 3], 1)
        obj = np.stack(
            [40 * rng.rand(n_obj) - 20, 1.0 + 2.0 * rng.rand(n_obj),
             45 * rng.rand(n_obj) + 4], 1)
        pc = np.concatenate([ground, obj], 0).astype(np.float32)
        n = pc.shape[0]
        segm = np.concatenate(
            [np.zeros(n_ground), rng.randint(1, 6, n_obj)]).astype(np.int32)
        np.save(osp.join(d, "pc_%04d.npy" % t), pc)
        np.save(osp.join(d, "segm_%04d.npy" % t), segm)
        np.save(osp.join(d, "semantic_segm_%04d.npy" % t), segm)
        np.save(osp.join(d, "pose_%04d.npy" % t), np.eye(4))
        if t > 0:
            np.save(osp.join(d, "flow_%04d_%04d.npy" % (t, t - 1)),
                    0.05 * rng.randn(n, 3).astype(np.float32))
    mapping = osp.join(root, "train.txt")
    with open(mapping, "w") as f:
        f.write(seq + ".tfrecord")
    return mapping


def save_ckpt(path, npoint):
    import jax

    # The parent process must NOT touch the TPU: its children are the TPU
    # processes, and the remote compile helper serializes — a resident
    # parent TPU client would starve every arm (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.checkpoint import save_checkpoint

    net = FlowStep3D(npoint=npoint, arch="kitti", loc_flow_nn=16,
                     loc_flow_rad=1.5, k_decay_fact=0.5)
    dummy = jnp.zeros((1, npoint, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy, 2)
    os.makedirs(osp.dirname(path), exist_ok=True)
    save_checkpoint(jax.device_get(variables), False, filename=path)


def run_arm(cfg_path, pipelined, scene_batch, timeout):
    env = dict(os.environ)
    env["OGC_WAYMO_PIPELINE"] = "on" if pipelined else "off"
    t0 = time.perf_counter()
    # --save so each group's finalization includes the predflow writes the
    # pipeline overlaps (the CLI derives the save dir from data_root; the
    # arms overwrite each other, which is fine for a timing A/B).
    r = subprocess.run(
        [sys.executable, "test_flow_waymo.py", cfg_path, "--split", "train",
         "--scene_batch", str(scene_batch), "--bound", "--save",
         "--test_model_iters", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"arm pipelined={pipelined} failed")
    m = re.search(r"batched eval wall: ([0-9.]+) s for (\d+) scenes",
                  r.stderr)
    eval_wall = float(m.group(1)) if m else float("nan")
    return wall, eval_wall, r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--raw_n", type=int, default=40000)
    ap.add_argument("--scene_batch", type=int, default=4)
    ap.add_argument("--n_point", type=int, default=8192)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="waymo_pipe_")
    build_fixture(tmp, args.scenes, args.raw_n)
    # save_path is the checkpoint FILE the CLI loads (tests/test_outdoor_cli
    # layout), and datasets read data.root / data.mapping_path.
    ckpt_path = osp.join(tmp, "ckpt", "flow_waymo")
    save_ckpt(ckpt_path, args.n_point)

    cfg = {
        "dataset": "waymo",
        "save_path": ckpt_path,
        "data": {"root": tmp, "mapping_path": osp.join(tmp, "train.txt")},
        "flownet": {"npoint": args.n_point, "use_instance_norm": False,
                    "loc_flow_nn": 16, "loc_flow_rad": 1.5},
    }
    cfg_path = osp.join(tmp, "waymo.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    results = {}
    # off first, then on: any relay/compile-cache warmth favors the arm
    # that runs second only through XLA's persistent cache; run order
    # off->on->off->on and take per-arm minima to cancel it.
    for rep in range(2):
        for pipelined in (False, True):
            wall, eval_wall, _ = run_arm(
                cfg_path, pipelined, args.scene_batch, args.timeout)
            key = "pipelined" if pipelined else "serial"
            results.setdefault(key, []).append(eval_wall)
            print(f"# arm {key} rep {rep}: eval {eval_wall:.2f} s "
                  f"(proc wall {wall:.1f} s)", flush=True)

    ser = min(results["serial"])
    pip = min(results["pipelined"])
    print(f"serial {ser:.2f} s | pipelined {pip:.2f} s | "
          f"speedup {ser / pip:.3f}x at K={args.scene_batch}, "
          f"{args.scenes} scenes, raw_n={args.raw_n}")


if __name__ == "__main__":
    main()
