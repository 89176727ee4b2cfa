#!/bin/bash
# Round-4 headline sweep -> BENCH_SWEEP_r4.jsonl (one JSON row per kernel).
# Every kernel has a tracked TPU number (VERDICT r3 item 5); mining rows
# now run at scale 20 too (wedge-stream v2 lifted the 65536-id cap) with
# the scale-16 rows kept for r3 comparability.
set -u
OUT=BENCH_SWEEP_r4.jsonl
: > $OUT
for k in pr spmv bfs msbfs cc tc bc sgd sssp vc scc mst symgs sgl; do
  timeout 2400 python -u bench.py --kernel $k --scale 20 | tail -1 >> $OUT
done
timeout 2400 python -u bench.py --kernel kcl --scale 16 | tail -1 >> $OUT
timeout 3000 python -u bench.py --kernel kcl --scale 20 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel motif --scale 16 | tail -1 >> $OUT
timeout 3000 python -u bench.py --kernel motif --scale 20 | tail -1 >> $OUT
cat $OUT
