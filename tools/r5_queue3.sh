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

# 1. Flow-train decomposition arms (B=128 + one-hot rerun; relay-500 casualties).
stop; timeout 2400 python tools/bench_train_flow.py --arms decomp > $R/flow_decomp2.log 2>&1

# 2. Certified-MXU exact KNN A/B (VERDICT r4 #4).
stop; timeout 2400 python tools/bench_exact_mxu_cert.py > $R/mxu_cert.log 2>&1

# 3. Reference-length SAPIEN protocol (VERDICT r4 #2), paired arms, seed-major.
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
  # sg24 after the first full trio: it gates the symgrad config default.
  if [ $s = 0 ]; then
    stop
    timeout 14000 python tools/ablate_approx_knn.py --ablate symgrad \
      --seeds 10 --epochs 24 > $R/ablate_sg24.log 2>&1
  fi
done

echo QUEUE_DONE
