#!/bin/sh
# Round-5 TPU queue, take 2 (the box rebooted mid-queue and /tmp was
# wiped; r5_tpu_queue.sh's flow-decomp/attrib/one-hot-fwd members had
# already landed in BENCHLOG).  Remaining members, re-ordered so the
# highest-value evidence lands first, with all outputs under
# /root/repo/runs_r5 (persistent).
#
# ONE TPU process at a time; NEVER kill members mid-flight (relay claim
# wedge, CLAUDE.md).  To wind the queue down safely:
#     touch /root/repo/runs_r5/STOP
# — checked between members; the in-flight member finishes normally.
set -x
cd /root/repo
R=/root/repo/runs_r5
mkdir -p $R

stop() { test -e $R/STOP && { echo QUEUE_STOPPED; exit 0; }; }

# 1. Corrected one-hot fwd+bwd A/B (the r5-session-1 fwd table landed;
#    the fwd+bwd arms were hoisted and discarded — this is the rerun
#    with the nonlinear value).  Gates OGC_GROUP_ONEHOT.
stop; timeout 2400 python tools/bench_group_onehot.py > $R/onehot_ab2.log 2>&1

# 2. Flow-train decomposition arms that died on the transient relay 500
#    (B=128, one-hot groups; the rerun repeats iters1/2/B64 as
#    consistency checks — cheap, compile cache is warm).
stop; timeout 2400 python tools/bench_train_flow.py --arms decomp > $R/flow_decomp2.log 2>&1

# 3. Reference-length SAPIEN protocol (VERDICT r4 #2), PAIRED arms.
#    Seed-major order so a complete parity/fast/mutual trio exists as
#    early as possible.
for s in 0 1 2; do
  for m in parity fast; do
    stop
    timeout 9000 python tools/protocol_sapien.py --seed $s --mode $m \
      --out $R/proto_s${s}_$m > $R/proto_s${s}_$m.log 2>&1
  done
  stop
  timeout 9000 python tools/protocol_sapien.py --seed $s --mode fast \
    --graph mutual --out $R/proto_s${s}_mutual \
    > $R/proto_s${s}_mutual.log 2>&1
  # sg24 goes after the first full trio: it gates a config-default
  # decision (symgrad in *_fast.yaml) that must land before round end.
  if [ $s = 0 ]; then
    stop
    timeout 14000 python tools/ablate_approx_knn.py --ablate symgrad \
      --seeds 10 --epochs 24 > $R/ablate_sg24.log 2>&1
  fi
done

echo QUEUE_DONE
