"""On-TPU end-to-end smoke: the full round-alternation pipeline
(train_seg R1 -> oa_icp --save -> train_seg R2 -> test_seg) on a synthetic
SAPIEN fixture, through the real CLIs on the real chip (Pallas kernels,
approximate neighbor paths, optional bf16 mode).

The pytest suite runs the same pipeline on CPU (tests/test_pipeline_e2e.py);
this validates the TPU execution path.  Run manually (ONE TPU process at a
time):

    python tools/tpu_e2e_smoke.py [--bf16] [--n_points 512]
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

import numpy as np
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def flow_smoke(args, tmp, root, env, run):
    """train_flow -> test_flow --save on the synthetic fixture: validates
    the flow training path (chamfer + smooth losses, GRU backward through
    the scanned refinement) and flow extraction on the real chip."""
    cfg = {
        "dataset": "sapien",
        "save_path": osp.join(tmp, "ckpt", "flow", "sapien_unsup"),
        "random_seed": 10,
        "data": {
            "root": root, "aug_transform": True,
            "aug_transform_args": {
                "scale_low": 0.95, "scale_high": 1.05,
                "degree_range": [0, 10, 0],
                "shift_range": [0.05, 0.05, 0.05],
                "aug_pc2": {"degree_range": [0, 0, 0],
                            "shift_range": [0.01, 0.01, 0.01]},
            },
        },
        "flownet": {"npoint": args.n_points, "use_instance_norm": False,
                    "loc_flow_nn": 8, "loc_flow_rad": 0.1,
                    "k_decay_fact": 1.0},
        "model_iters": 2,
        "epochs": 1,
        "batch_size": 4,
        "lr": 1.0e-3, "lr_decay": 0.5, "lr_clip": 1.0e-5,
        "decay_step": 400000, "weight_decay": 0.0,
        "bn_momentum": 0.9, "bn_decay": 0.5,
        "loss": {
            "weights": [0.75, 0.25],
            "iters_w": [0.5, 0.3],
            "chamfer_loss_params": {"loss_norm": 2},
            "smooth_loss_params": {
                "w_knn": 3.0, "w_ball_q": 1.0,
                "knn_loss_params": {"k": 4, "radius": 0.05, "loss_norm": 1},
                "ball_q_loss_params": {"k": 8, "radius": 0.1,
                                       "loss_norm": 1},
            },
        },
    }
    if args.bf16:
        cfg["compute_dtype"] = "bf16"
    cfg_path = osp.join(tmp, "flow_smoke.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run("train_flow.py", cfg_path)
    out = run("test_flow.py", cfg_path, "--split", "test",
              "--test_batch_size", "6", "--test_model_iters", "2", "--save")
    assert "EPE" in out or "epe" in out, out[-500:]


def scalar_mutual_smoke():
    """On-chip scalar-vs-gather mutual-membership A/B on CONTINUOUS
    clouds (ADVICE r4: the CPU oracle tests use grid-quantized clouds and
    cannot see the ~1-ulp FMA-contraction divergence class between the
    XLA-recomputed d2 in the loss body and the Pallas kernels'
    uncontracted d2 — losses/seg_unsup.py::_mutual_discrepancy_scalar).
    Bounds the loss/grad divergence and the flipped-edge fraction."""
    import jax
    import jax.numpy as jnp

    from ogc_tpu.losses import seg_unsup as L

    rng = np.random.RandomState(0)
    worst = {"loss": 0.0, "grad": 0.0}
    for trial in range(4):
        pc = jnp.asarray(
            30.0 * rng.rand(2, 8192, 3).astype(np.float32))
        logits = jnp.asarray(rng.randn(2, 8192, 10).astype(np.float32))

        def loss(lg, graph):
            mask = jax.nn.softmax(lg, -1)
            lk = L.knn_smooth_loss(pc, mask, 32, 1.0, graph=graph,
                                   exact=True)
            lb = L.ball_q_smooth_loss(pc, mask, 64, 2.0, graph=graph,
                                      exact=True)
            return 3.0 * lk + 1.0 * lb

        vs, gs = jax.value_and_grad(loss)(logits, "mutual")
        vg, gg = jax.value_and_grad(loss)(logits, "mutual_gather")
        dl = abs(float(vs) - float(vg)) / max(abs(float(vg)), 1e-12)
        dgnum = float(jnp.max(jnp.abs(gs - gg)))
        dgden = float(jnp.max(jnp.abs(gg)))
        worst["loss"] = max(worst["loss"], dl)
        worst["grad"] = max(worst["grad"], dgnum / max(dgden, 1e-12))
        print(f"  trial {trial}: rel dloss {dl:.2e}, "
              f"rel dgrad_max {dgnum/max(dgden,1e-12):.2e}", flush=True)
    # Knife-edge flips hit isolated edges; anything systematic would
    # blow these bounds by orders of magnitude.
    assert worst["loss"] < 1e-4, worst
    assert worst["grad"] < 1e-2, worst
    print(f"scalar_mutual ok: worst rel dloss {worst['loss']:.2e}, "
          f"worst rel dgrad {worst['grad']:.2e}", flush=True)


def vote_scale_smoke():
    """mask_voting at OUTDOOR scale on the real chip: T=6 frames x 8192
    points x K=10 slots, time window 3 — the configuration whose dense form
    (T^2 (N, N) transitive correspondence matrices, /root/reference/
    vote.py:31-59) needs ~6.7 GB per 5-frame window and cannot fit alongside
    the model.  The streamed warp_mask_chain path's peak transient is
    (N, tile); this validates it executes within HBM and stays
    row-stochastic at KITTI/Waymo sizes (VERDICT r1 #4)."""
    import jax
    import jax.numpy as jnp

    from ogc_tpu.refine.vote import mask_voting

    T, N, K = 6, 8192, 10
    rng = np.random.RandomState(0)
    base = 30.0 * rng.rand(N, 3).astype(np.float32)
    flows_fwd = 0.3 * rng.randn(T - 1, N, 3).astype(np.float32)
    pcs = [base]
    for t in range(T - 1):
        pcs.append(pcs[-1] + flows_fwd[t])
    pc = jnp.asarray(np.stack(pcs, 0))
    flows = jnp.asarray(
        np.stack([np.stack([flows_fwd[t], -flows_fwd[t]], 0)
                  for t in range(T - 1)], 0)
    )
    logits = rng.randn(T, N, K).astype(np.float32)
    mask = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))

    voted = mask_voting(pc, mask, flows, time_window_size=3)
    voted = np.asarray(jax.device_get(voted))
    assert voted.shape == (T, N, K), voted.shape
    assert np.isfinite(voted).all(), "non-finite votes"
    np.testing.assert_allclose(voted.sum(-1), 1.0, atol=1e-3)
    print(f"vote_scale ok: T={T} N={N} K={K} window=3 "
          f"(rowsum err {np.abs(voted.sum(-1) - 1).max():.2e})", flush=True)


def pool_kernel_smoke():
    """rowgroup_pool (ops/pallas_pool.py) vs the jnp reduce ON THE CHIP at
    every (S, C) the models pool — the CPU suite only exercises interpret
    mode, and Mosaic sublane-group reshapes are exactly the kind of thing
    that behaves differently compiled (cf. the N=128 FPS edge case, r1)."""
    import jax
    import jax.numpy as jnp

    from ogc_tpu.ops.pallas_pool import rowgroup_pool, supported

    rng = np.random.RandomState(0)
    shapes = [  # (n_groups, S, C) drawn from kitti flow/seg pooling sites
        (8 * 4096, 32, 32), (8 * 2048, 32, 64), (8 * 2048, 32, 128),
        (8 * 2048, 16, 128), (8 * 2048, 4, 128), (8 * 2048, 8, 16),
        (16 * 1024, 32, 128), (16 * 256, 16, 256), (8, 2048, 131),
        (8 * 2048, 64, 64), (8 * 512, 64, 256),  # seg MSG stages (S=64)
    ]
    for mean in (False, True):
        n_ok = 0
        for (n, s, c) in shapes:
            if not supported(n, s, c):
                print(f"pool skip (unsupported): n={n} s={s} c={c}")
                continue
            n_ok += 1
            x = rng.randn(n * s, c).astype(np.float32)
            for dt in (jnp.float32, jnp.bfloat16):
                xd = jnp.asarray(x).astype(dt)
                got = rowgroup_pool(
                    xd, jnp.ones((c,), jnp.float32), jnp.zeros((1, c), dt),
                    s, relu=False, mean=mean,
                )
                want = (jnp.mean if mean else jnp.max)(
                    xd.reshape(n, s, c), axis=1
                )
                err = float(
                    jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32)))
                )
                tol = 1e-6 if dt == jnp.float32 else (2e-2 if mean else 0.0)
                assert err <= tol, (n, s, c, mean, str(dt), err)
        print(f"pool_kernel ok (mean={mean}): {n_ok}/{len(shapes)} shapes, "
              "f32 + bf16", flush=True)

    # Affine + ReLU fold (eval BN / per-group center term) on model shapes.
    for (n, s, c) in [(8 * 2048, 4, 128), (8 * 2048, 16, 128),
                      (16 * 1024, 32, 128)]:
        x = rng.randn(n * s, c).astype(np.float32)
        scale = (rng.rand(c) + 0.5).astype(np.float32)
        add = rng.randn(n, c).astype(np.float32)
        got = rowgroup_pool(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(add),
            s, relu=True, mean=False,
        )
        want = np.maximum(
            x.reshape(n, s, c) * scale + add[:, None, :], 0.0
        ).max(axis=1)
        err = float(jnp.max(jnp.abs(got - jnp.asarray(want))))
        assert err <= 1e-5, (n, s, c, "affine", err)
    print("pool_kernel ok (affine+relu): 3 shapes", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="run in the bf16 compute mode")
    ap.add_argument("--mode",
                    choices=("seg", "flow", "vote_scale", "pool_kernel",
                             "scalar_mutual"),
                    default="seg",
                    help="seg: round-alternation pipeline; flow: "
                         "train_flow + test_flow --save; vote_scale: "
                         "mask_voting at 8192 pts / 6 frames on-chip; "
                         "pool_kernel: rowgroup_pool vs jnp on-chip")
    ap.add_argument("--n_points", type=int, default=512)
    ap.add_argument("--keep", action="store_true", help="keep the tmp dir")
    args = ap.parse_args()

    if args.mode == "vote_scale":
        vote_scale_smoke()
        print("TPU E2E SMOKE OK [vote_scale]", flush=True)
        return
    if args.mode == "scalar_mutual":
        scalar_mutual_smoke()
        print("TPU E2E SMOKE OK [scalar_mutual]", flush=True)
        return
    if args.mode == "pool_kernel":
        pool_kernel_smoke()
        print("TPU E2E SMOKE OK [pool_kernel]", flush=True)
        return

    from synth import make_sapien_root

    tmp = tempfile.mkdtemp(prefix="ogc_tpu_smoke_")
    root = osp.join(tmp, "MBS_SAPIEN")
    make_sapien_root(osp.join(root, "mbs-shapepart"), n_scenes=4,
                     n_points=args.n_points)
    make_sapien_root(osp.join(root, "mbs-sapien"), n_scenes=2,
                     n_points=args.n_points)

    # Seed "flowstep3d" predictions with GT flows (what test_flow.py --save
    # produces), both splits — mirrors tests/test_pipeline_e2e.py.
    from ogc_tpu.data.sapien import SapienDataset

    view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
    pf_dir = osp.join(root, "mbs-shapepart", "flow_preds", "flowstep3d")
    os.makedirs(pf_dir, exist_ok=True)
    with open(pf_dir + ".json", "w") as f:
        json.dump({"view_sel": view_sels}, f)
    for split in ("train", "val"):
        seed_set = SapienDataset(
            osp.join(root, "mbs-shapepart"), split=split, view_sels=view_sels
        )
        for sid in range(0, len(seed_set), len(view_sels)):
            flows = []
            for k in range(len(view_sels)):
                _, _, fl, _ = seed_set[sid + k]
                flows.append(fl[0])
            seed_set._save_predflow(
                np.stack(flows, 0), save_root=pf_dir,
                batch_size=len(view_sels), n_frame=len(view_sels),
                offset=sid // len(view_sels),
            )

    cfg = {
        "dataset": "sapien",
        "save_path": osp.join(tmp, "ckpt", "sapien_unsup"),
        "random_seed": 10,
        "data": {"root": root, "decentralize": False,
                 "aug_transform_args": None},
        "predflow_path": "flowstep3d",
        "aug_transform_epoch": 9999,
        "ignore_npoint_thresh": 0,
        "epochs": 2,
        "batch_size": 4,
        "lr": 1.0e-3, "lr_decay": 0.7, "lr_clip": 1.0e-5,
        "decay_step": 200000, "weight_decay": 0.0,
        "segnet": {"n_slot": 8, "n_point": args.n_points, "use_xyz": True,
                   "n_transformer_layer": 2, "transformer_embed_dim": 128,
                   "transformer_input_pos_enc": False},
        "loss": {
            "weights": [10.0, 0.1, 0.0], "start_steps": [0, 0, 0],
            "dynamic_loss_params": {"loss_norm": 2},
            "smooth_loss_params": {
                "w_knn": 3.0, "w_ball_q": 1.0,
                "knn_loss_params": {"k": 8, "radius": 0.1, "loss_norm": 1},
                "ball_q_loss_params": {"k": 16, "radius": 0.2, "loss_norm": 1},
            },
            "invariance_loss_params": {"loss_norm": 2},
        },
    }
    if args.bf16:
        cfg["compute_dtype"] = "bf16"
    cfg_path = osp.join(tmp, "smoke.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)  # NO OGC_PLATFORM override: run on the TPU
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"

    def run(*cmd):
        print("::", " ".join(cmd), flush=True)
        r = subprocess.run([sys.executable, *cmd], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=3000)
        sys.stdout.write(r.stdout[-2500:])
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-5000:])
            raise SystemExit(f"FAILED: {cmd}")
        return r.stdout

    if args.mode == "flow":
        flow_smoke(args, tmp, root, env, run)
    else:
        run("train_seg.py", cfg_path, "--round", "1")
        run("oa_icp.py", cfg_path, "--split", "train", "--round", "1",
            "--save", "--test_batch_size", "6")
        run("oa_icp.py", cfg_path, "--split", "val", "--round", "1",
            "--save", "--test_batch_size", "6")
        run("train_seg.py", cfg_path, "--round", "2")
        out = run("test_seg.py", cfg_path, "--split", "test", "--round", "2")
        assert "AveragePrecision@50" in out, out[-500:]
        # Multi-frame co-segmentation voting (the one CLI the CPU suite
        # only covers at the library level).
        out = run("vote.py", cfg_path, "--split", "test", "--round", "2",
                  "--use_gt_flow", "--test_batch_size", "8",
                  "--time_window_size", "2")
        assert "AveragePrecision@50" in out or "mIoU" in out, out[-500:]
    print("TPU E2E SMOKE OK [%s%s]  (dir: %s)" %
          (args.mode, " bf16" if args.bf16 else "", tmp), flush=True)
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
