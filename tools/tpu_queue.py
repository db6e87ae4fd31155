"""Serial on-chip work queue: runs every TPU-gated validation pending for
the round, one process at a time (the remote compile helper serializes —
CLAUDE.md), logging each step and continuing past failures.

    python tools/tpu_queue.py [--steps pool,flowbf16,bench,benchoff,knnab,vote]

Writes per-step logs to /tmp/tpu_queue/<step>.log and a summary JSON line
at the end.  Probe first: if a 120 s matmul probe times out, exits 3
(relay down).  Step names are validated before anything runs — a typo
must not crash the queue after hours of completed on-chip work.
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
LOGDIR = "/tmp/tpu_queue"

STEPS = {
    "pool": (["python", "tools/tpu_e2e_smoke.py", "--mode", "pool_kernel"],
             3600),
    "flowbf16": (["python", "tools/tpu_e2e_smoke.py", "--mode", "flow",
                  "--bf16"], 3600),
    # Plain flow smoke (f32 + exact neighbors = the eval-CLI parity
    # default): end-to-end coverage of the exact Pallas kernels in a real
    # pipeline, not just the knnexact isolation A/B.
    "flow": (["python", "tools/tpu_e2e_smoke.py", "--mode", "flow"], 3600),
    "seg": (["python", "tools/tpu_e2e_smoke.py"], 3600),
    "bench": (["python", "bench.py"], 2400),
    "benchoff": (["python", "bench.py"], 2400),  # OGC_PALLAS_POOL=off
    "knnab": (["python", "tools/bench_knn_pruned.py"], 2400),
    "knnext": (["python", "tools/bench_knn_extract.py"], 2400),
    "benchtrain": (["python", "bench_train.py"], 2400),
    "prefixprof": (["python", "tools/profile_prefix.py"], 2400),
    "vote": (["python", "tools/tpu_e2e_smoke.py", "--mode", "vote_scale"],
             2400),
    # 8192-pt re-runs of the 5-seed ablations (PARITY.md tables are 2048-pt;
    # the KITTI/Waymo point count is the scale the defaults actually serve).
    "abl8k_nb": (["python", "tools/ablate_approx_knn.py", "--ablate",
                  "neighbors", "--seeds", "5", "--n_points", "8192"], 5400),
    "abl8k_sg": (["python", "tools/ablate_approx_knn.py", "--ablate",
                  "symgrad", "--seeds", "5", "--n_points", "8192"], 5400),
    "abl8k_dt": (["python", "tools/ablate_approx_knn.py", "--ablate",
                  "dtype", "--seeds", "5", "--n_points", "8192"], 5400),
    # Round-3 additions: the mutual-vs-reference smooth-graph accuracy
    # ablation (the mutual graph is the new DEFAULT, so it carries the
    # stronger burden of proof), roofline/MFU measurements, and the Waymo
    # double-buffer pipeline A/B.
    "abl2k_gr": (["python", "tools/ablate_approx_knn.py", "--ablate",
                  "graph", "--seeds", "5"], 5400),
    "abl8k_gr": (["python", "tools/ablate_approx_knn.py", "--ablate",
                  "graph", "--seeds", "5", "--n_points", "8192"], 5400),
    "knnexact": (["python", "tools/bench_knn_exact.py"], 2400),
    "exactqt": (["python", "tools/bench_exact_qt.py"], 2400),
    "benchdec": (["python", "bench.py", "--decompose"], 3600),
    "roofline": (["python", "tools/roofline.py"], 2400),
    "rooftrain": (["python", "tools/roofline.py", "--train"], 2400),
    "waymopipe": (["python", "tools/bench_waymo_pipeline.py"], 5400),
}
# Fast, high-information steps first (kernel validation + the bench A/B),
# then the measurement probes, then the long pipeline smokes — `seg` also
# exercises vote.py's fused batch path on-chip.
DEFAULT = ("pool,bench,benchoff,knnext,knnab,benchtrain,prefixprof,seg,"
           "flowbf16,vote,abl8k_nb,abl8k_sg,abl8k_dt")


def probe(timeout=300):
    # Persistent compilation cache: when the relay is merely SLOW (cold
    # compile helper), the first probe pays the compile and later probes
    # hit the cache instead of timing out identically.
    code = ("import jax, jax.numpy as jnp; "
            "jax.config.update('jax_compilation_cache_dir', "
            "'/root/.jax_cache'); "
            "x = jnp.ones((8, 8)); print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True, cwd=REPO)
        return r.returncode == 0 and "512.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default=DEFAULT)
    args = ap.parse_args()
    steps = [s.strip() for s in args.steps.split(",") if s.strip()]
    unknown = [s for s in steps if s not in STEPS]
    if unknown:
        sys.exit(f"unknown steps {unknown}; available: {sorted(STEPS)}")
    os.makedirs(LOGDIR, exist_ok=True)

    print("probing TPU relay ...", flush=True)
    for attempt in range(4):
        # Final attempt gets a long leash: a degraded-but-alive relay has
        # been observed taking ~5 min for a trivial compile.
        if probe(timeout=300 if attempt < 3 else 900):
            break
        print(f"probe attempt {attempt + 1} failed", flush=True)
        time.sleep(60)
    else:
        print("PROBE FAILED: relay down", flush=True)
        sys.exit(3)
    print("probe ok", flush=True)

    summary = {}
    for step in steps:
        cmd, timeout = STEPS[step]
        env = dict(os.environ)
        if step == "benchoff":
            env["OGC_PALLAS_POOL"] = "off"
        log = osp.join(LOGDIR, f"{step}.log")
        t0 = time.time()
        print(f"[{step}] {' '.join(cmd)} -> {log}", flush=True)
        with open(log, "w") as fh:
            try:
                r = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT,
                                   timeout=timeout, env=env, cwd=REPO)
                ok = r.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False
        dt = time.time() - t0
        tail = open(log).read().strip().splitlines()[-3:]
        summary[step] = {"ok": ok, "secs": round(dt, 1),
                         "tail": " | ".join(tail)}
        print(f"[{step}] {'OK' if ok else 'FAIL'} ({dt:.0f}s): "
              f"{summary[step]['tail'][-200:]}", flush=True)

    print("QUEUE SUMMARY " + json.dumps(summary), flush=True)
    sys.exit(0 if all(v["ok"] for v in summary.values()) else 1)


if __name__ == "__main__":
    main()
