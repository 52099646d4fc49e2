#!/bin/bash
# Sequential RD measurement queue for the 1-core box: each QP in its OWN
# process (LLVM JIT arena exhaustion killed combined sweeps three times),
# natural clip first (the honest scoreboard), then the synthetic one.
# Usage: tools/rd_queue.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results}
ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
mkdir -p "$OUT"

for qp in 22 27 32 37; do
  $ENV python tools/bdrate.py --clip /tmp/natural416.yuv \
      --width 416 --height 240 --frames 32 --qps $qp \
      --json "$OUT/bd_nat_qp${qp}.json" \
      > "/tmp/bd_nat_qp${qp}.log" 2>&1
done
for qp in 22 27 32 37; do
  $ENV python tools/bdrate.py --clip /tmp/clip192x128x12.yuv \
      --width 192 --height 128 --frames 12 --qps $qp \
      --json "$OUT/bd_syn_qp${qp}.json" \
      > "/tmp/bd_syn_qp${qp}.log" 2>&1
done
python tools/bd_merge.py "$OUT" || true
