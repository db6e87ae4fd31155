"""Reference-length SAPIEN protocol run on synthetic coherent scenes
(VERDICT r4 #2: no training run at reference length had ever been
executed — schedules, aug phase-in, and loss gating were only exercised
in their first few percent).

Reproduces the reference's full R-round recipe through the REAL CLIs
(reference README.md:215-222):

  round 1..R-1:  train_seg  <woinv cfg>  --round r      (40 epochs)
                 oa_icp     <woinv cfg>  --split train/val --round r --save
  round R:       train_seg  <full cfg>   --round R      (40 epochs,
                 invariance + aug_transform phase-in at epoch 20)
  eval:          test_seg --split test --round R;  vote

All epoch-denominated knobs (epochs=40, aug_transform_epoch=20, B=32,
lr/bn constants) match config/seg/sapien/sapien_unsup*.yaml verbatim.
Sample-denominated knobs (decay_step=200000, start_steps=[0,1000,0]) are
scaled by the synthetic/assumed-reference sample ratio so each landmark
fires at the same FRACTION of training (assumed reference train size
--ref_scenes 2000; the reference repo pins no size — the real MBS-SAPIEN
download is blocked, BASELINE.md).  Scaling is printed and recorded.

Runs ON TPU (one process at a time):
    python tools/protocol_sapien.py --seed 0 --mode default
    python tools/protocol_sapien.py --seed 0 --mode fast      # bf16
    python tools/protocol_sapien.py --seed 0 --mode parity    # f32+exact
    python tools/protocol_sapien.py --seed 0 --graph mutual   # arm
Writes <out>/summary.json (final metrics + per-epoch trajectories).
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def build_cfg(args, root, save_root, woinv: bool) -> dict:
    n_pairs = args.n_scenes * 3
    # Schedule-landmark scaling (see module docstring).
    scale = (args.n_scenes) / float(args.ref_scenes)
    decay_step = max(1, int(round(200000 * scale)))
    smooth_start = max(1, int(round(1000 * scale)))
    cfg = {
        "dataset": "sapien",
        "save_path": osp.join(
            save_root, "sapien_unsup_woinv" if woinv else "sapien_unsup"),
        "random_seed": 10 + args.seed,
        "data": {
            "root": root, "decentralize": False,
            "aug_transform_args": None if woinv else {
                "scale_low": 0.95, "scale_high": 1.05,
                "degree_range": [0, 180, 0], "shift_range": [0, 0, 0],
            },
        },
        "predflow_path": "flowstep3d",
        "aug_transform_epoch": 9999 if woinv else 20,
        "ignore_npoint_thresh": 0,
        "epochs": args.epochs,
        "batch_size": 32,
        "lr": 1.0e-3, "lr_decay": 0.7, "lr_clip": 1.0e-5,
        "decay_step": decay_step, "weight_decay": 0.0,
        "bn_momentum": 0.9, "bn_decay": 1.0,
        "segnet": {"n_slot": 8, "n_point": 512, "use_xyz": True,
                   "n_transformer_layer": 2, "transformer_embed_dim": 128,
                   "transformer_input_pos_enc": False},
        "loss": {
            "weights": [10.0, 0.1, 0.0 if woinv else 0.1],
            "start_steps": [0, smooth_start, 0],
            "dynamic_loss_params": {"loss_norm": 2},
            "smooth_loss_params": {
                "graph": args.graph,
                # Pinned so paired arms stay comparable even if the
                # repo-wide smooth_ref_bwd default flips mid-queue
                # (lean/remat are exact — same math — but pinning keeps
                # every seed bit-comparable to the runs already done).
                "ref_bwd": "autodiff",
                "w_knn": 3.0, "w_ball_q": 1.0,
                "knn_loss_params": {"k": 8, "radius": 0.1, "loss_norm": 1},
                "ball_q_loss_params": {"k": 16, "radius": 0.2,
                                       "loss_norm": 1},
            },
            "invariance_loss_params": {"loss_norm": 2},
        },
    }
    if args.mode == "fast":
        cfg["compute_dtype"] = "bf16"
    return cfg, {"decay_step": decay_step, "smooth_start": smooth_start,
                 "n_pairs": n_pairs}


def read_trajectory(save_path):
    """Per-epoch scalar trajectories from the JSONL writer."""
    traj = {}
    p = osp.join(save_path, "log", "scalars.jsonl")
    if not osp.exists(p):
        return traj
    for line in open(p):
        d = json.loads(line)
        tag = d["tag"]
        if tag.startswith("epoch_sum_"):
            traj.setdefault(tag, []).append(
                [d.get("step"), round(d["value"], 5)])
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", choices=("default", "fast", "parity"),
                    default="default",
                    help="default: approx+f32 (training defaults); fast: "
                         "bf16+approx; parity: f32+exact neighbors")
    ap.add_argument("--graph", choices=("reference", "mutual"),
                    default="reference")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--n_scenes", type=int, default=120)
    ap.add_argument("--n_test_scenes", type=int, default=24)
    ap.add_argument("--ref_scenes", type=int, default=2000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--keep_data", action="store_true")
    args = ap.parse_args()

    from synth import make_sapien_root_coherent

    tag = f"s{args.seed}_{args.mode}_{args.graph}"
    out = args.out or f"/tmp/ogc_protocol_{tag}"
    os.makedirs(out, exist_ok=True)
    root = osp.join(out, "MBS_SAPIEN")
    t0 = time.time()
    if not osp.exists(osp.join(root, "mbs-shapepart", "meta.json")):
        make_sapien_root_coherent(
            osp.join(root, "mbs-shapepart"), n_scenes=args.n_scenes,
            n_points=512, seed=100 + args.seed)
        make_sapien_root_coherent(
            osp.join(root, "mbs-sapien"), n_scenes=args.n_test_scenes,
            n_points=512, seed=900 + args.seed, test_frac=0.99)

    # Seed round-1 "flowstep3d" predictions with GT flows (stands in for
    # the flow network; the reference's round-1 flows come from
    # test_flow.py --save of a trained FlowStep3D).
    from ogc_tpu.data.sapien import SapienDataset

    view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
    pf_dir = osp.join(root, "mbs-shapepart", "flow_preds", "flowstep3d")
    if not osp.exists(pf_dir + ".json"):
        os.makedirs(pf_dir, exist_ok=True)
        with open(pf_dir + ".json", "w") as f:
            json.dump({"view_sel": view_sels}, f)
        for split in ("train", "val"):
            seed_set = SapienDataset(
                osp.join(root, "mbs-shapepart"), split=split,
                view_sels=view_sels)
            for sid in range(0, len(seed_set), len(view_sels)):
                flows = []
                for k in range(len(view_sels)):
                    _, _, fl, _ = seed_set[sid + k]
                    flows.append(fl[0])
                seed_set._save_predflow(
                    np.stack(flows, 0), save_root=pf_dir,
                    batch_size=len(view_sels), n_frame=len(view_sels),
                    offset=sid // len(view_sels))

    cfg_w, scales = build_cfg(args, root, osp.join(out, "ckpt"), True)
    cfg_f, _ = build_cfg(args, root, osp.join(out, "ckpt"), False)
    cfg_w_path = osp.join(out, "woinv.yaml")
    cfg_f_path = osp.join(out, "full.yaml")
    yaml.safe_dump(cfg_w, open(cfg_w_path, "w"))
    yaml.safe_dump(cfg_f, open(cfg_f_path, "w"))
    print(f"[protocol {tag}] scales: {scales}", flush=True)

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
    env["OGC_WRITER"] = "jsonl"
    # Pin the r5-session-1 grouping path: the one-hot default flipped to
    # "auto" mid-queue; its scatter-order reassociation is Adam-wobble
    # class, but pinning keeps every paired seed strictly comparable.
    env["OGC_GROUP_ONEHOT"] = "off"

    def run(*cmd, extra_env=None):
        e = dict(env)
        if extra_env:
            e.update(extra_env)
        print("::", " ".join(cmd), flush=True)
        r = subprocess.run([sys.executable, *cmd], cwd=REPO, env=e,
                           capture_output=True, text=True, timeout=14000)
        sys.stdout.write(r.stdout[-1800:])
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-6000:])
            raise SystemExit(f"FAILED: {cmd}")
        return r.stdout

    # Training-mode env: parity trains with exact neighbor search.
    tr_env = {"OGC_EXACT_NEIGHBORS": "1"} if args.mode == "parity" else {}

    summary = {"tag": tag, "args": vars(args), "scales": scales,
               "rounds": {}}
    for r in range(1, args.rounds + 1):
        last = r == args.rounds
        cfg_path = cfg_f_path if last else cfg_w_path
        cfg_used = cfg_f if last else cfg_w
        run("train_seg.py", cfg_path, "--round", str(r),
            extra_env=tr_env)
        summary["rounds"][r] = {
            "train_traj": read_trajectory(
                cfg_used["save_path"] + f"_R{r}")}
        if not last:
            for split in ("train", "val"):
                o = run("oa_icp.py", cfg_path, "--split", split,
                        "--round", str(r), "--save",
                        "--test_batch_size", "12")
                summary["rounds"][r][f"oaicp_{split}"] = o[-900:]

    o = run("test_seg.py", cfg_f_path, "--split", "test",
            "--round", str(args.rounds))
    summary["test_seg"] = o[-1200:]
    o = run("vote.py", cfg_f_path, "--split", "test",
            "--round", str(args.rounds), "--use_gt_flow",
            "--test_batch_size", "12", "--time_window_size", "3")
    summary["vote"] = o[-1200:]
    summary["wall_s"] = round(time.time() - t0, 1)

    with open(osp.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"PROTOCOL OK [{tag}] wall={summary['wall_s']}s -> "
          f"{out}/summary.json", flush=True)
    if not args.keep_data:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
