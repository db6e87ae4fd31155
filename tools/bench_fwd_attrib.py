"""A/B-arm re-attribution of the fast-mode forward headline (VERDICT r4
#7): the 94.9 scenes/s figure has been flat since r2 and its floor
analysis leaned partly on xplane per-op timelines — the instrument r4
proved overlap-confounded.  This tool re-derives the split with ARMS
(the only cost attribution CLAUDE.md admits): seg-vs-flow, and the flow
prefix-vs-iteration-body via an iters sweep (body cost = slope of ms vs
iters; prefix = intercept).

Run ON TPU: python tools/bench_fwd_attrib.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed as _make_timed


def make_timed(fn):
    return _make_timed(fn, reps=10, warmup=2, iters=3)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu import ops
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    ops.set_exact_neighbors(False)

    B, N = 8, 8192
    rng = np.random.RandomState(0)
    pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))

    segnet = MaskFormer3D(n_slot=10, n_point=N, arch="kitti",
                          n_transformer_layer=2, transformer_embed_dim=128)
    pc0 = jnp.zeros((1, N, 3), jnp.float32)
    sparams = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc0, pc0)
    flownet = FlowStep3D(npoint=N, arch="kitti", loc_flow_nn=16,
                         loc_flow_rad=1.5, k_decay_fact=1.0)
    fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
        jax.random.PRNGKey(1), pc0, pc0)

    out = {}
    t_seg = make_timed(
        lambda v, a: segnet.apply(v, a, a))(sparams, pc)
    out["seg_fwd_ms"] = round(t_seg * 1e3, 2)
    print(f"# seg fwd: {t_seg*1e3:.2f} ms", file=sys.stderr, flush=True)

    for iters in (1, 2, 3, 5):
        t = make_timed(
            lambda v, a, b, it=iters: flownet.apply(
                v, a, b, a, b, it, train=False)[-1])(fvars, pc, pc)
        out[f"flow_fwd_iters{iters}_ms"] = round(t * 1e3, 2)
        print(f"# flow fwd iters={iters}: {t*1e3:.2f} ms",
              file=sys.stderr, flush=True)

    # Least-squares split: ms ~= prefix + body * iters.
    xs = np.array([1, 2, 3, 5], dtype=np.float64)
    ys = np.array([out[f"flow_fwd_iters{i}_ms"] for i in (1, 2, 3, 5)])
    body, prefix = np.polyfit(xs, ys, 1)
    out["flow_prefix_ms"] = round(float(prefix), 2)
    out["flow_body_ms_per_iter"] = round(float(body), 2)
    t5 = out["flow_fwd_iters5_ms"]
    out["headline_split"] = {
        "seg_pct": round(100 * out["seg_fwd_ms"] / (out["seg_fwd_ms"] + t5), 1),
        "prefix_pct_of_flow": round(100 * prefix / t5, 1),
        "body_pct_of_flow": round(100 * 5 * body / t5, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
