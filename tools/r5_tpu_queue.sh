#!/bin/sh
# Round-5 long TPU queue: reference-length protocol runs (VERDICT r4 #2),
# graph arms at full length (#3), the symgrad 24-epoch 10-seed rerun, and
# the corrected one-hot fwd+bwd A/B.  ONE TPU process at a time; never
# kill members mid-flight (relay claim wedge, CLAUDE.md).
set -x
cd /root/repo

# Corrected one-hot A/B (valid fwd+bwd arms).
python tools/bench_group_onehot.py > /tmp/onehot_ab2.log 2>&1

# Reference-length SAPIEN protocol, PAIRED across arms (the synthetic
# scenes are a deterministic function of --seed, shared by all modes):
#   3 x parity (f32+exact), 3 x fast (bf16+approx), 3 x fast+mutual
# -> fast-vs-parity delta at full length (VERDICT #2) and the mutual
# graph deficit at reference length (VERDICT #3 adversarial arm).
for s in 0 1 2; do
  python tools/protocol_sapien.py --seed $s --mode parity \
    > /tmp/proto_p$s.log 2>&1
  python tools/protocol_sapien.py --seed $s --mode fast \
    > /tmp/proto_f$s.log 2>&1
  python tools/protocol_sapien.py --seed $s --mode fast --graph mutual \
    > /tmp/proto_m$s.log 2>&1
done

# symgrad 24-epoch power upgrade (12-epoch n=10 landed p=0.40).
python tools/ablate_approx_knn.py --ablate symgrad --seeds 10 --epochs 24 \
  > /tmp/ablate_sg24.log 2>&1

echo QUEUE_DONE
