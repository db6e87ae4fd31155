#!/bin/sh
# Round-5 TPU queue v3: continues r5_queue2.sh after its STOP-flag wind-down
# (member 1, the corrected one-hot A/B, completed there).  Inserts the
# certified-MXU exact KNN A/B (VERDICT r4 #4) ahead of the long protocol
# members.  ONE TPU process at a time; wind down via runs_r5/STOP3.
set -x
cd /root/repo
R=/root/repo/runs_r5
mkdir -p $R

stop() { test -e $R/STOP3 && { echo QUEUE_STOPPED; exit 0; }; }

# 1. Flow-train one-hot arm (blocked twice behind the B128 crash; B128
#    itself is closed as a helper-OOM casualty — see bench_train_flow.py).
stop; timeout 2400 python tools/bench_train_flow.py --arms decomp_onehot,sapien_ref_protocol > $R/flow_onehot.log 2>&1

# 2. Certified-MXU exact KNN A/B (VERDICT r4 #4).
stop; timeout 2400 python tools/bench_exact_mxu_cert.py > $R/mxu_cert.log 2>&1

# 2a. Differentiation-structure arms (exact gradients): lean custom VJP
#     and term-scoped remat vs the autodiff default + symgrad yardstick.
stop; timeout 3600 python bench_train.py --arms "smooth_ref_bwd" > $R/refbwd_arms.log 2>&1
stop; timeout 2400 python bench_train.py --arms "reference graph (default" > $R/refbwd_base.log 2>&1

# 2b. bench.py validation: the flow_train emission (VERDICT r4 #6) has
#     never executed end-to-end; the driver's round-end run must not be
#     its first execution.
stop; timeout 3600 python bench.py > $R/bench_probe.log 2>&1

# 3. Reference-length SAPIEN protocol (VERDICT r4 #2), paired arms,
#    seed-major; members are idempotent (skip when summary.json exists —
#    queue v2 may have completed s0 parity before its wind-down).
proto() { # $1 seed, $2 tag, extra args...
  s=$1; tag=$2; shift 2
  test -e $R/proto_s${s}_$tag/summary.json && return 0
  timeout 9000 python tools/protocol_sapien.py --seed $s \
    --out $R/proto_s${s}_$tag "$@" > $R/proto_s${s}_$tag.log 2>&1
}
for s in 0 1 2; do
  stop; proto $s parity --mode parity
  stop; proto $s fast --mode fast
  stop; proto $s mutual --mode fast --graph mutual
  # sg24 after the first full trio: it gates the symgrad config default.
  if [ $s = 0 ]; then
    stop
    test -e $R/ablate_sg24.log || \
      timeout 14000 python tools/ablate_approx_knn.py --ablate symgrad \
        --seeds 10 --epochs 24 > $R/ablate_sg24.log 2>&1
  fi
done

echo QUEUE_DONE
