"""Derive the A100 throughput baseline for the UNMODIFIED reference stack.

The reference repo ships no throughput numbers (BASELINE.md), so every
`vs_baseline` in BENCH_r*.json rests on an estimate of how fast the
reference PyTorch+CUDA stack would run the bench protocol (KITTI segnet
fwd + FlowStep3D fwd at 8192 pts) on one A100.  This tool makes that
estimate auditable by measuring, on the actual reference code (via
tools/pointnet2_cpu_shim):

  1. per-forward operator counts (aten-op events == CUDA kernel-launch
     proxy for the eager reference);
  2. matmul/conv FLOPs (torch.profiler with_flops) + analytic FLOP/byte
     counts for the custom CUDA ops (brute-force KNN interpolate_gpu.cu:9-57,
     FPS sampling_gpu.cu:93-209, grouping/gather row traffic);
  3. a measured CPU wall-time anchor of the same forwards.

The A100 estimate in BASELINE.md is then
    T_A100(phase) = max(FLOPs/eff_TFLOPS, bytes/eff_GBs, n_ops * t_launch)
with *generous* efficiency assumptions (favoring the reference), so the
resulting scenes/s is an upper bound on the reference and vs_baseline is
conservative.

MUST run in a torch-only process (never import torch into a JAX process —
CLAUDE.md).  Usage:
    python tools/derive_baseline.py [--n_point 8192] [--reps 2] [--json out]
"""

import argparse
import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


class OpLog:
    """Shape log for the custom pointnet2 ops, recorded by wrapping the CPU
    shim's wrapper functions."""

    def __init__(self):
        self.calls = []  # (name, dict of dims)

    # ---- analytic costs per call (FLOPs in multiply-adds counted as 2,
    # bytes = HBM traffic of the CUDA kernel, f32).
    def totals(self):
        flops, bytes_, rows = 0.0, 0.0, 0.0
        for name, d in self.calls:
            B = d.get("B", 1)
            if name == "knn":
                # brute-force: every (query, candidate) pair costs
                # 3 sub + 3 mul + 2 add = 8 flops (interpolate_gpu.cu:30-38)
                flops += 8.0 * B * d["N"] * d["M"]
                bytes_ += 4.0 * B * (3 * d["N"] + 3 * d["M"]
                                     + 2 * d["N"] * d["k"])
            elif name == "three_nn":
                flops += 8.0 * B * d["N"] * d["M"]
                bytes_ += 4.0 * B * (3 * d["N"] + 3 * d["M"] + 6 * d["N"])
            elif name == "fps":
                # npoint sequential steps, each a full pass over N points:
                # distance (8 flops) + min + argmax-reduction
                flops += 10.0 * B * d["npoint"] * d["N"]
                bytes_ += 4.0 * B * d["npoint"] * d["N"] * 2
            elif name == "group":
                r = float(B) * d["npoint"] * d["nsample"]
                rows += r
                bytes_ += r * d["C"] * 4 * 2  # read + write
            elif name == "gather":
                r = float(B) * d["npoint"]
                rows += r
                bytes_ += r * d["C"] * 4 * 2
            elif name == "three_interpolate":
                r = 3.0 * B * d["n"]
                rows += r
                flops += 6.0 * B * d["n"] * d["c"]
                bytes_ += float(B) * d["n"] * d["c"] * 4 * 4
            elif name == "ball_query":
                flops += 8.0 * B * d["npoint"] * d["N"]
                bytes_ += 4.0 * B * (3 * d["N"] + 3 * d["npoint"]
                                     + d["npoint"] * d["nsample"])
        return dict(flops=flops, bytes=bytes_, gather_rows=rows,
                    n_calls=len(self.calls))


def wrap_shim(shim, log):
    orig = {}

    def rec(name, fn, dims):
        orig[name] = fn

        def wrapper(*args):
            log.calls.append((name, dims(*args)))
            return fn(*args)

        return wrapper

    shim.knn_wrapper = rec(
        "knn", shim.knn_wrapper,
        lambda B, N, m, k, *a: dict(B=B, N=N, M=m, k=k))
    shim.three_nn_wrapper = rec(
        "three_nn", shim.three_nn_wrapper,
        lambda B, N, m, *a: dict(B=B, N=N, M=m))
    shim.furthest_point_sampling_wrapper = rec(
        "fps", shim.furthest_point_sampling_wrapper,
        lambda B, N, npoint, *a: dict(B=B, N=N, npoint=npoint))
    shim.group_points_wrapper = rec(
        "group", shim.group_points_wrapper,
        lambda B, C, N, nfeat, nsample, *a: dict(
            B=B, C=C, N=N, npoint=nfeat, nsample=nsample))
    shim.gather_points_wrapper = rec(
        "gather", shim.gather_points_wrapper,
        lambda B, C, N, npoint, *a: dict(B=B, C=C, N=N, npoint=npoint))
    shim.three_interpolate_wrapper = rec(
        "three_interpolate", shim.three_interpolate_wrapper,
        lambda B, c, m, n, *a: dict(B=B, c=c, m=m, n=n))
    shim.ball_query_wrapper = rec(
        "ball_query", shim.ball_query_wrapper,
        lambda B, N, npoint, radius, nsample, *a: dict(
            B=B, N=N, npoint=npoint, nsample=nsample))


def count_eager_bytes(fn, grad=False):
    """Estimate the HBM traffic of one eager forward: every non-view aten
    op materializes its output and reads its inputs (eager PyTorch does not
    fuse), so traffic ~= sum over ops of (input + output) tensor bytes.
    Double-counts buffers that would stay in L2 between adjacent ops and
    misses conv workspace traffic — good to ~1.5x, stated in BASELINE.md."""
    import torch
    from torch.utils._python_dispatch import TorchDispatchMode

    VIEW_OPS = {
        "aten.view", "aten.reshape", "aten._unsafe_view", "aten.t",
        "aten.transpose", "aten.permute", "aten.unsqueeze", "aten.squeeze",
        "aten.expand", "aten.slice", "aten.select", "aten.as_strided",
        "aten.detach", "aten.alias", "aten.lift_fresh",
    }

    state = {"bytes": 0.0, "ops": 0}

    def tensor_bytes(x):
        if isinstance(x, torch.Tensor):
            return x.numel() * x.element_size()
        if isinstance(x, (list, tuple)):
            return sum(tensor_bytes(e) for e in x)
        return 0

    class Counter(TorchDispatchMode):
        def __torch_dispatch__(self, func, types, args=(), kwargs=None):
            out = func(*args, **(kwargs or {}))
            name = str(func).split(".out")[0]
            base = ".".join(name.split(".")[:2])
            if base not in VIEW_OPS:
                state["bytes"] += tensor_bytes(args) + tensor_bytes(out)
                state["ops"] += 1
            return out

    import contextlib

    ctx = contextlib.nullcontext() if grad else torch.no_grad()
    with ctx, Counter():
        fn()
    return state["bytes"], state["ops"]


def profile_fwd(fn, log, grad=False):
    """One profiled forward: returns (aten op count, profiler matmul/conv
    FLOPs, custom-op totals from the shim log)."""
    import contextlib

    import torch
    from torch.profiler import ProfilerActivity, profile

    log.calls.clear()
    ctx = contextlib.nullcontext() if grad else torch.no_grad()
    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as prof:
        with ctx:
            fn()
    evs = prof.key_averages()
    n_ops = int(sum(e.count for e in evs
                    if e.key.startswith("aten::")
                    and not e.key.startswith("aten::empty")
                    and e.key not in ("aten::to", "aten::detach",
                                      "aten::view", "aten::reshape",
                                      "aten::contiguous", "aten::t",
                                      "aten::transpose", "aten::permute",
                                      "aten::unsqueeze", "aten::squeeze",
                                      "aten::expand", "aten::slice",
                                      "aten::select", "aten::as_strided")))
    prof_flops = float(sum((e.flops or 0) for e in evs))
    return n_ops, prof_flops, log.totals()


def time_fwd(fn, reps, grad=False):
    import contextlib

    import torch

    ctx = contextlib.nullcontext() if grad else torch.no_grad()
    with ctx:
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_point", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5,
                    help="flow refinement iterations (eval protocol)")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--ref_root", type=str, default="/root/reference")
    ap.add_argument("--train", action="store_true",
                    help="derive the TRAIN-step baseline instead (segnet "
                         "fwd x2 frames + UnsupervisedOGCLoss + backward + "
                         "Adam; bench_train.py protocol)")
    ap.add_argument("--train_flow", action="store_true",
                    help="derive the FLOW-train-step baseline (reference "
                         "train_flow.py:59-91 protocol: FlowStep3D sapien "
                         "512 pts iters=4 + UnsupervisedFlowStep3DLoss + "
                         "backward + Adam; tools/bench_train_flow.py)")
    args = ap.parse_args()

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(max(1, (__import__("os").cpu_count() or 8) - 2))

    import tools.pointnet2_cpu_shim as shim

    log = OpLog()
    wrap_shim(shim, log)
    sys.modules["pointnet2_cuda"] = shim
    shim.patch_torch_cuda()
    sys.path.insert(0, args.ref_root)

    from models.segnet_kitti import MaskFormer3D

    N = args.n_point

    if args.train:
        # Training-step baseline (bench_train.py protocol: KITTI segnet on
        # both frames + UnsupervisedOGCLoss fwd+bwd + Adam, per scene).
        # Reference: train_seg.py:327-339 + losses/seg_loss_unsup.py, loss
        # params from config/seg/kittisf/kittisf_unsup.yaml:39-56.
        from losses.seg_loss_unsup import (
            DynamicLoss, EntropyLoss, InvarianceLoss, RankLoss, SmoothLoss,
            UnsupervisedOGCLoss,
        )

        segnet = MaskFormer3D(
            n_slot=10, n_point=N, use_xyz=True,
            n_transformer_layer=2, transformer_embed_dim=128,
            transformer_input_pos_enc=False,
        ).train()
        criterion = UnsupervisedOGCLoss(
            DynamicLoss(loss_norm=2),
            SmoothLoss(w_knn=3.0, w_ball_q=1.0,
                       knn_loss_params=dict(k=32, radius=1.0, loss_norm=1),
                       ball_q_loss_params=dict(k=64, radius=2.0,
                                               loss_norm=1)),
            InvarianceLoss(loss_norm=2), EntropyLoss(), RankLoss(),
            weights=[10.0, 0.1, 0.1], start_steps=[0, 0, 0],
        )
        opt = torch.optim.Adam(segnet.parameters(), lr=1e-3)
        rng = np.random.RandomState(0)
        pc1 = torch.from_numpy(
            30.0 * rng.rand(1, N, 3).astype(np.float32))
        pc2 = torch.from_numpy(
            30.0 * rng.rand(1, N, 3).astype(np.float32))
        fl1 = torch.from_numpy(0.5 * rng.randn(1, N, 3).astype(np.float32))
        fl2 = torch.from_numpy(0.5 * rng.randn(1, N, 3).astype(np.float32))

        def train_step():
            opt.zero_grad()
            m1 = segnet(pc1, pc1)
            m2 = segnet(pc2, pc2)
            loss, _ = criterion([pc1, pc2], [m1, m2], [fl1, fl2])
            loss.backward()
            opt.step()

        out = {"n_point": N, "batch": 1, "mode": "train",
               "torch_threads": torch.get_num_threads()}
        n_ops, prof_flops, custom = profile_fwd(train_step, log, grad=True)
        eager_bytes, eager_ops = count_eager_bytes(train_step, grad=True)
        t = time_fwd(train_step, args.reps, grad=True)
        out["train"] = dict(
            cpu_sec_per_scene=t, aten_ops_per_step=n_ops,
            profiler_matmul_conv_flops=prof_flops,
            custom_op_flops=custom["flops"],
            custom_gather_rows=custom["gather_rows"],
            eager_traffic_bytes=eager_bytes, eager_traffic_ops=eager_ops,
        )
        TF32_TFLOPS = 156e12 * 0.5
        CUSTOM_TFLOPS = 19.5e12 * 0.7
        HBM_GBS = 1555e9 * 0.7
        T_LAUNCH = 5e-6
        BATCH_PROTO = 8
        t_a100 = max(prof_flops / TF32_TFLOPS,
                     custom["flops"] / CUSTOM_TFLOPS,
                     eager_bytes / HBM_GBS,
                     n_ops * T_LAUNCH / BATCH_PROTO)
        out["a100_estimate"] = dict(
            sec_per_scene=t_a100, scenes_per_sec=1.0 / t_a100,
            t_matmul=prof_flops / TF32_TFLOPS,
            t_custom=custom["flops"] / CUSTOM_TFLOPS,
            t_bytes=eager_bytes / HBM_GBS,
            t_launch_per_scene=n_ops * T_LAUNCH / BATCH_PROTO,
            assumptions=dict(tf32_tflops_eff=TF32_TFLOPS,
                             custom_tflops_eff=CUSTOM_TFLOPS,
                             hbm_gbs_eff=HBM_GBS, t_launch_sec=T_LAUNCH,
                             batch=BATCH_PROTO),
        )
        print(f"[train] {t:.2f} s/scene CPU; {n_ops} aten ops; "
              f"{prof_flops/1e9:.2f} GFLOP mm; eager {eager_bytes/1e9:.2f} "
              f"GB -> A100 est {1.0/t_a100:.1f} scenes/s "
              f"({t_a100*1e3:.2f} ms/scene)", file=sys.stderr)
        js = json.dumps(out, indent=1)
        if args.json:
            with open(args.json, "w") as f:
                f.write(js)
        print(js)
        return

    if args.train_flow:
        # Flow-training baseline (reference train_flow.py:59-91 with
        # config/flow/sapien/sapien_unsup.yaml: 512 pts, iters=4,
        # loc_flow_nn=8, loc_flow_rad=0.1, loss weights [0.75, 0.25],
        # iters_w [0.5, 0.3, 0.3, 0.3], batch 32).
        from models.flownet_sapien import FlowStep3D as FlowSapien
        from losses.flow_loss_unsup import (
            ChamferLoss, SmoothLoss as FlowSmooth,
            UnsupervisedFlowStep3DLoss,
        )

        NF = 512
        fnet = FlowSapien(
            npoint=NF, use_instance_norm=False,
            loc_flow_nn=8, loc_flow_rad=0.1, k_decay_fact=1.0,
        ).train()
        criterion = UnsupervisedFlowStep3DLoss(
            ChamferLoss(loss_norm=2),
            FlowSmooth(w_knn=3.0, w_ball_q=1.0,
                       knn_loss_params=dict(k=4, radius=0.05, loss_norm=1),
                       ball_q_loss_params=dict(k=8, radius=0.1,
                                               loss_norm=1)),
            weights=[0.75, 0.25], iters_w=[0.5, 0.3, 0.3, 0.3],
        )
        opt = torch.optim.Adam(fnet.parameters(), lr=1e-3)
        rng = np.random.RandomState(0)
        p1 = torch.from_numpy(rng.rand(1, NF, 3).astype(np.float32))
        p2 = p1 + torch.from_numpy(
            0.02 * rng.randn(1, NF, 3).astype(np.float32))

        def train_step():
            opt.zero_grad()
            preds = fnet(p1, p2, p1, p2, iters=4)
            loss, _ = criterion(p1, p2, preds)
            loss.backward()
            opt.step()

        out = {"n_point": NF, "batch": 1, "mode": "train_flow",
               "torch_threads": torch.get_num_threads()}
        n_ops, prof_flops, custom = profile_fwd(train_step, log, grad=True)
        eager_bytes, eager_ops = count_eager_bytes(train_step, grad=True)
        t = time_fwd(train_step, args.reps, grad=True)
        out["train_flow"] = dict(
            cpu_sec_per_scene=t, aten_ops_per_step=n_ops,
            profiler_matmul_conv_flops=prof_flops,
            custom_op_flops=custom["flops"],
            custom_gather_rows=custom["gather_rows"],
            eager_traffic_bytes=eager_bytes, eager_traffic_ops=eager_ops,
        )
        TF32_TFLOPS = 156e12 * 0.5
        CUSTOM_TFLOPS = 19.5e12 * 0.7
        HBM_GBS = 1555e9 * 0.7
        T_LAUNCH = 5e-6
        BATCH_PROTO = 32  # the reference protocol's batch size
        t_a100 = max(prof_flops / TF32_TFLOPS,
                     custom["flops"] / CUSTOM_TFLOPS,
                     eager_bytes / HBM_GBS,
                     n_ops * T_LAUNCH / BATCH_PROTO)
        out["a100_estimate"] = dict(
            sec_per_scene=t_a100, scenes_per_sec=1.0 / t_a100,
            t_matmul=prof_flops / TF32_TFLOPS,
            t_custom=custom["flops"] / CUSTOM_TFLOPS,
            t_bytes=eager_bytes / HBM_GBS,
            t_launch_per_scene=n_ops * T_LAUNCH / BATCH_PROTO,
            assumptions=dict(tf32_tflops_eff=TF32_TFLOPS,
                             custom_tflops_eff=CUSTOM_TFLOPS,
                             hbm_gbs_eff=HBM_GBS, t_launch_sec=T_LAUNCH,
                             batch=BATCH_PROTO),
        )
        print(f"[train_flow] {t:.2f} s/scene CPU; {n_ops} aten ops; "
              f"{prof_flops/1e9:.2f} GFLOP mm; eager "
              f"{eager_bytes/1e9:.2f} GB -> A100 est "
              f"{1.0/t_a100:.1f} scenes/s ({t_a100*1e3:.2f} ms/scene)",
              file=sys.stderr)
        js = json.dumps(out, indent=1)
        if args.json:
            with open(args.json, "w") as f:
                f.write(js)
        print(js)
        return

    from models.flownet_kitti import FlowStep3D
    # KITTI protocol configs (reference config/seg/kittisf/kittisf_unsup.yaml
    # and config/flow/kittisf/kittisf_unsup.yaml).
    segnet = MaskFormer3D(
        n_slot=10, n_point=N, use_xyz=True,
        n_transformer_layer=2, transformer_embed_dim=128,
        transformer_input_pos_enc=False,
    ).eval()
    flownet = FlowStep3D(
        npoint=N, use_instance_norm=False,
        loc_flow_nn=16, loc_flow_rad=1.5, k_decay_fact=1.0,
    ).eval()

    pc = torch.from_numpy(
        30.0 * np.random.RandomState(0).rand(1, N, 3).astype(np.float32))
    pc2 = torch.from_numpy(
        30.0 * np.random.RandomState(1).rand(1, N, 3).astype(np.float32))

    def seg_fwd():
        return segnet(pc, pc)

    def flow_fwd():
        return flownet(pc, pc2, pc, pc2, iters=args.iters)

    out = {"n_point": N, "batch": 1, "flow_iters": args.iters,
           "torch_threads": torch.get_num_threads()}

    for name, fn in (("seg", seg_fwd), ("flow", flow_fwd)):
        n_ops, prof_flops, custom = profile_fwd(fn, log)
        eager_bytes, eager_ops = count_eager_bytes(fn)
        t = time_fwd(fn, args.reps)
        out[name] = dict(
            cpu_sec_per_scene=t,
            aten_ops_per_fwd=n_ops,
            profiler_matmul_conv_flops=prof_flops,
            custom_op_flops=custom["flops"],
            custom_op_bytes=custom["bytes"],
            custom_gather_rows=custom["gather_rows"],
            custom_op_calls=custom["n_calls"],
            eager_traffic_bytes=eager_bytes,
            eager_traffic_ops=eager_ops,
        )
        print(f"[{name}] {t:.2f} s/scene CPU; {n_ops} aten ops; "
              f"{prof_flops/1e9:.2f} GFLOP matmul/conv + "
              f"{custom['flops']/1e9:.2f} GFLOP custom "
              f"({custom['n_calls']} custom calls, "
              f"{custom['gather_rows']/1e6:.2f}M gathered rows); "
              f"eager traffic {eager_bytes/1e9:.2f} GB over {eager_ops} ops",
              file=sys.stderr)

    # ---- A100 estimate (full derivation written up in BASELINE.md) ------
    # Per-resource roofline with GENEROUS-to-the-reference efficiencies;
    # resources assumed perfectly overlapped (max, not sum) -> the estimate
    # is an UPPER bound on reference speed, so vs_baseline is conservative.
    TF32_TFLOPS = 156e12 * 0.5   # A100 TF32 peak x 50% MFU (small matmuls)
    CUSTOM_TFLOPS = 19.5e12 * 0.7  # f32 CUDA-core peak x 70% (brute KNN
    #                                is a clean FMA loop; sampling is worse)
    HBM_GBS = 1555e9 * 0.7       # A100-40GB HBM x 70% achieved
    T_LAUNCH = 5e-6              # eager kernel launch+dispatch, ~5 us/op
    BATCH_PROTO = 8              # bench.py protocol batch; launches
    #                              amortize across scenes at batch B

    est = {}
    for name in ("seg", "flow"):
        d = out[name]
        t_mm = d["profiler_matmul_conv_flops"] / TF32_TFLOPS
        t_cu = d["custom_op_flops"] / CUSTOM_TFLOPS
        t_bw = d["eager_traffic_bytes"] / HBM_GBS  # incl. custom-op traffic
        t_launch = d["aten_ops_per_fwd"] * T_LAUNCH / BATCH_PROTO
        t_a100 = max(t_mm, t_cu, t_bw, t_launch)
        est[name] = dict(t_matmul=t_mm, t_custom=t_cu, t_bytes=t_bw,
                         t_launch_per_scene=t_launch, t_total=t_a100)
        print(f"[{name}] A100 est/scene: max(mm {t_mm*1e3:.2f}, "
              f"custom {t_cu*1e3:.2f}, bytes {t_bw*1e3:.2f}, "
              f"launch/B {t_launch*1e3:.2f}) -> {t_a100*1e3:.2f} ms",
              file=sys.stderr)

    t_scene = est["seg"]["t_total"] + est["flow"]["t_total"]
    out["a100_estimate"] = dict(
        assumptions=dict(tf32_tflops_eff=TF32_TFLOPS,
                         custom_tflops_eff=CUSTOM_TFLOPS,
                         hbm_gbs_eff=HBM_GBS, t_launch_sec=T_LAUNCH,
                         batch=BATCH_PROTO),
        per_phase=est,
        sec_per_scene=t_scene,
        scenes_per_sec=1.0 / t_scene,
    )
    print(f"A100 estimate: {1.0/t_scene:.1f} scenes/s "
          f"(seg {est['seg']['t_total']*1e3:.2f} ms + "
          f"flow {est['flow']['t_total']*1e3:.2f} ms)", file=sys.stderr)

    js = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(js)
    print(js)


if __name__ == "__main__":
    main()
