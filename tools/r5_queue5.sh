#!/bin/sh
# Round-5 TPU queue v5 (final): bench.py revalidation (symgrad now in the
# fast-train arm) then the remaining protocol seeds until the round ends.
set -x
cd /root/repo
R=/root/repo/runs_r5
stop() { test -e $R/STOP5 && { echo QUEUE_STOPPED; exit 0; }; }

stop; timeout 3600 python bench.py > $R/bench_probe2.log 2>&1

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
