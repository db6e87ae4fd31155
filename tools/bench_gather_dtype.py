"""On-chip A/B: OGC_GATHER_F32 (gather bf16 tables as f32) on the fast-mode
forwards.

The r4 mask-gather microbench measured bf16 rows ~30% slower per row than
f32 (9.25 vs 7.17 ns, width-independent).  The bf16 fast-mode models
gather bf16 activation tables everywhere; casting each table to f32 before
its take (one stream pass over N rows, amortized over S gathered rows)
could recover the difference — IF the cast materializes instead of fusing
into the gather as a convert-on-read.  This measures the real thing: flow
fwd (the gather-heaviest surface) + seg fwd, flag off vs on.

The flag is read per-trace inside _flat_take; a fresh process per arm
avoids jit-cache pinning:
    python tools/bench_gather_dtype.py        # runs both arms via exec
    python tools/bench_gather_dtype.py --arm off|on   (single arm)
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")


def run_arm(arm):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from bench import make_timed
    from ogc_tpu import ops
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    ops.set_exact_neighbors(False)
    B, N = 8, 8192
    rng = np.random.RandomState(0)
    pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))

    flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                         loc_flow_nn=16, loc_flow_rad=1.5)
    fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
        jax.random.PRNGKey(1), pc[:1], pc[:1])
    t_flow = make_timed(
        lambda v, a, b: flownet.apply(v, a, b, a, b, 5, train=False)[-1]
    )(fvars, pc, pc)

    segnet = MaskFormer3D(n_slot=10, n_point=N, arch="kitti",
                          n_transformer_layer=2, transformer_embed_dim=128)
    sp = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc[:1], pc[:1])
    t_seg = make_timed(lambda p, x: segnet.apply(p, x, x))(sp, pc)

    print(json.dumps(dict(arm=arm, flow_ms=t_flow * 1e3,
                          seg_ms=t_seg * 1e3)))


def main():
    if "--arm" in sys.argv:
        run_arm(sys.argv[sys.argv.index("--arm") + 1])
        return
    out = {}
    for arm in ("off", "on"):
        env = dict(os.environ)
        env["OGC_GATHER_F32"] = arm
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", arm],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"arm {arm} FAILED: {r.stderr[-500:]}", file=sys.stderr)
            continue
        out[arm] = json.loads(line[-1])
        print(line[-1], file=sys.stderr, flush=True)
    if "off" in out and "on" in out:
        print(json.dumps(dict(
            flow_speedup=out["off"]["flow_ms"] / out["on"]["flow_ms"],
            seg_speedup=out["off"]["seg_ms"] / out["on"]["seg_ms"],
            **{f"{a}_{k}": v for a, d in out.items()
               for k, v in d.items() if k != "arm"},
        )))


if __name__ == "__main__":
    main()
