#!/bin/sh
# Round-5 TPU queue v4: post-sg24 tail.  The one-hot grouping default
# flipped mid-round (compute-path change) -> the on-TPU e2e smokes run
# BEFORE the remaining protocol seeds (correctness evidence outranks
# seed count if the round ends mid-queue).  Wind down via runs_r5/STOP4.
set -x
cd /root/repo
R=/root/repo/runs_r5
stop() { test -e $R/STOP4 && { echo QUEUE_STOPPED; exit 0; }; }

stop; timeout 4000 python tools/tpu_e2e_smoke.py > $R/e2e_seg.log 2>&1
stop; timeout 4000 python tools/tpu_e2e_smoke.py --mode flow > $R/e2e_flow.log 2>&1

proto() {
  s=$1; tag=$2; shift 2
  test -e $R/proto_s${s}_$tag/summary.json && return 0
  timeout 9000 python tools/protocol_sapien.py --seed $s \
    --out $R/proto_s${s}_$tag "$@" > $R/proto_s${s}_$tag.log 2>&1
}
for s in 1 2; do
  stop; proto $s parity --mode parity
  stop; proto $s fast --mode fast
  stop; proto $s mutual --mode fast --graph mutual
done
echo QUEUE_DONE
