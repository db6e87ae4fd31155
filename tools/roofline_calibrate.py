"""Reconcile the r3 HBM-roofline contradiction (VERDICT r3 #1).

r3 left two numbers that cannot both be true:
  - XLA cost analysis: train step "moves" 194.6 GB in 247.8 ms = 785 GB/s
    (claimed 95.9% of the 819 GB/s v5e paper peak, headroom <= 4%);
  - the stream anchor: a pure un-fusable elementwise stream achieves only
    161-191 GB/s on the same chip.
If real achievable bandwidth is ~190 GB/s, the step cannot be moving
194.6 GB — the cost-analysis bytes must over-count true HBM traffic by
~4x, and the saturation claim falls.  This tool settles it with
independent anchors:

  mxu:      big bf16 matmuls -> measured TFLOP/s vs the 197 TFLOP/s paper
            peak.  If the MXU hits a healthy fraction, the chip is not
            globally throttled and the stream numbers mean what they say.
  stream:   several INDEPENDENT stream formulations (scan-carried
            read+write at two sizes, read-only reduce, bf16) -> the real
            achievable stream ceiling is the best of them.
  timeline: xplane trace of the train step, sync-op time bucketed by HLO
            class (dot/conv vs gather/scatter vs elementwise fusion) ->
            where the 248 ms actually goes, composable against the
            per-class anchors.

Run ON TPU, one process at a time:
    python tools/roofline_calibrate.py [mxu stream timeline]
"""

import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed  # canonical in-graph repetition timer

V5E_BF16_TFLOPS = 197e12
V5E_HBM_GBS = 819e9
ITERS = 5


def section_mxu(out):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for n in (4096, 8192):
        a = jnp.asarray(rng.rand(n, n).astype(np.float32)).astype(
            jnp.bfloat16)
        b = jnp.asarray(rng.rand(n, n).astype(np.float32))

        def mm(a, b):
            # make_timed's f32 perturbation rides on b; cast back so the
            # MXU runs true bf16 x bf16 -> f32.
            return jax.lax.dot(
                a, b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

        t = make_timed(mm)(a, b)
        tf = 2 * n**3 / t / 1e12
        row = dict(op=f"matmul{n}", ms=t * 1e3, tflops=tf,
                   mfu_pct=100 * tf * 1e12 / V5E_BF16_TFLOPS)
        out["mxu"].append(row)
        print(f"[mxu {n}] {t*1e3:.2f} ms = {tf:.1f} TFLOP/s "
              f"({row['mfu_pct']:.0f}% of paper peak)",
              file=sys.stderr, flush=True)


def _timed_scan_stream(x, length=10):
    """The r3 anchor form: loop-carried full-array dependency, 1 read +
    1 write of the carry per step (un-fusable, un-hoistable)."""
    import jax
    import jax.numpy as jnp

    def stream(x):
        def body(c, _):
            return c * 1.000001 + 1e-7, None

        final, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(final)

    js = jax.jit(stream)
    float(js(x))
    float(js(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(js(x))
    return (time.perf_counter() - t0) / (ITERS * length)


def section_stream(out):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    for mb in (256, 1024):
        x = jnp.asarray(
            rng.rand(mb, 512, 512).astype(np.float32))  # mb MB
        t = _timed_scan_stream(x)
        gbs = 2 * x.size * 4 / t / 1e9
        out["stream"].append(dict(op=f"scan_rw_f32_{mb}MB", ms=t * 1e3,
                                  gbs=gbs))
        print(f"[stream scan-rw f32 {mb}MB] {t*1e3:.2f} ms/step = "
              f"{gbs:.0f} GB/s ({100*gbs*1e9/V5E_HBM_GBS:.0f}% of paper)",
              file=sys.stderr, flush=True)

    # bf16 scan carry (same bytes at half the elements-per-byte -> if the
    # f32 form were VPU-issue-bound this one doubles throughput).
    xb = jnp.asarray(rng.rand(1024, 512, 512).astype(np.float32)).astype(
        jnp.bfloat16)
    t = _timed_scan_stream(xb)
    gbs = 2 * xb.size * 2 / t / 1e9
    out["stream"].append(dict(op="scan_rw_bf16_512MB", ms=t * 1e3, gbs=gbs))
    print(f"[stream scan-rw bf16 512MB] {t*1e3:.2f} ms/step = "
          f"{gbs:.0f} GB/s", file=sys.stderr, flush=True)

    # Read-only reduce: one pass over the buffer per rep, no write-back
    # (the multiply-reduce fuses; make_timed's carry perturbation forces a
    # fresh pass every rep).
    xr = jnp.asarray(rng.rand(1024, 512, 512).astype(np.float32))  # 1 GB
    t = make_timed(lambda x: jnp.sum(x * 1.000001))(xr)
    gbs = xr.size * 4 / t / 1e9
    out["stream"].append(dict(op="read_reduce_f32_1GB", ms=t * 1e3,
                              gbs=gbs))
    print(f"[stream read-reduce f32 1GB] {t*1e3:.2f} ms = {gbs:.0f} GB/s",
          file=sys.stderr, flush=True)


_BUCKETS = (
    ("mxu", ("dot", "convolution", "cublas", "gemm")),
    ("gather", ("gather", "dynamic-slice")),
    ("scatter", ("scatter", "dynamic-update-slice")),
    ("sortcmp", ("sort", "top-k", "compare")),
    ("copy", ("copy", "transpose", "bitcast", "reshape", "broadcast",
              "concatenate", "slice", "pad")),
    ("custom", ("custom-call", "tpu_custom_call")),
    ("reduce", ("reduce",)),
    ("fusion", ("fusion", "loop", "input", "output", "add", "multiply",
                "subtract", "select", "convert", "exponential", "rsqrt")),
)


def _bucket(name):
    base = name.split(".")[0].split("(")[0].lower()
    for bucket, keys in _BUCKETS:
        if any(k in base for k in keys):
            return bucket
    return "other"


def section_timeline(out):
    """Trace ONE train step and bucket sync-op device time by HLO class.
    trace_flow.py 'train' builds the identical step; inlined here so the
    buckets and the JSON artifact stay in one tool."""
    import jax
    import jax.numpy as jnp

    from jax.profiler import ProfileData

    from ogc_tpu.losses.seg_unsup import OGCLossConfig
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.seg import SegTrainer, make_optimizer

    set_compute_dtype(jnp.bfloat16)
    B, N = 8, 8192
    rng = np.random.RandomState(0)
    pc1 = jnp.asarray(30.0 * rng.rand(1, N, 3).astype(np.float32))
    loss_cfg = OGCLossConfig(
        weights=(10.0, 0.1, 0.1), start_steps=(0, 0, 0),
        smooth_w_knn=3.0, smooth_w_ball_q=1.0,
        knn_k=32, knn_radius=1.0, ball_q_k=64, ball_q_radius=2.0,
    )
    net = MaskFormer3D(n_slot=10, n_point=N, arch="kitti",
                       n_transformer_layer=2, transformer_embed_dim=128)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), pc1, pc1)
    trainer = SegTrainer(
        model=net, params=params, loss_cfg=loss_cfg,
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, B),
        aug_transform_epoch=9999, ignore_npoint_thresh=50,
        exp_base="/tmp/ogc_roofcal", mesh=pmesh.make_mesh(jax.devices()[:1]),
    )
    pcs = jnp.asarray(30.0 * rng.rand(B, 2, N, 3).astype(np.float32))
    flows = jnp.asarray(0.5 * rng.randn(B, 2, N, 3).astype(np.float32))

    _step = jax.jit(lambda p, o, pcs, flows: trainer._train_step_impl(
        p, o, pcs, flows, jnp.int32(10**6), False)[:3])

    def fn(p, o, pcs, flows):
        # returning updated (params, opt) keeps backward+Adam alive
        p2, o2, ld = _step(p, o, pcs, flows)
        return float(ld["sum"]), p2, o2

    args = (trainer.params, trainer.opt_state, pcs, flows)
    fn(*args)
    fn(*args)
    trace_dir = "/tmp/jaxtrace_roofcal"
    with jax.profiler.trace(trace_dir):
        s, _, _ = fn(*args)
    time.sleep(1)

    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    pd = ProfileData.from_file(files[-1])
    per_op = {}
    for plane in pd.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                d, c = per_op.get(ev.name, (0.0, 0))
                per_op[ev.name] = (d + ev.duration_ns, c + 1)
    buckets = {}
    for name, (dur, _) in per_op.items():
        b = _bucket(name)
        buckets[b] = buckets.get(b, 0.0) + dur
    tot = sum(buckets.values())
    out["timeline"] = {
        "total_ms": tot / 1e6,
        "buckets_ms": {k: v / 1e6
                       for k, v in sorted(buckets.items(),
                                          key=lambda kv: -kv[1])},
        "top_ops": [
            dict(name=n[:120], ms=d / 1e6, count=c)
            for n, (d, c) in sorted(per_op.items(),
                                    key=lambda kv: -kv[1][0])[:30]
        ],
    }
    print(f"[timeline] train-step sync op time {tot/1e6:.1f} ms; buckets: "
          + " ".join(f"{k}={v/1e6:.1f}ms"
                     for k, v in sorted(buckets.items(),
                                        key=lambda kv: -kv[1])),
          file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    sections = set(sys.argv[1:]) or {"mxu", "stream", "timeline"}
    out = {"mxu": [], "stream": [], "timeline": None}
    if "mxu" in sections:
        section_mxu(out)
    if "stream" in sections:
        section_stream(out)
    if "timeline" in sections:
        section_timeline(out)
    print(json.dumps(out))
    with open("/tmp/roofline_calibrate.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
