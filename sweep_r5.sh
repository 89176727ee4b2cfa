#!/bin/bash
# Round-5 headline sweep -> BENCH_SWEEP_r5.jsonl (one JSON row per kernel).
# VERDICT r4 item 1: the full measurement record, committed — every kernel
# incl. vc/scc/mst/symgs/sgl, scale-20 kcl/motif (wedge-stream v2 demo,
# item 2) and the first fsm rows (aggregate MNI engine, item 6).
set -u
OUT=BENCH_SWEEP_r5.jsonl
: > $OUT
for k in pr spmv bfs msbfs cc tc bc sgd sssp vc scc mst symgs sgl; do
  timeout 2400 python -u bench.py --kernel $k --scale 20 | tail -1 >> $OUT
done
timeout 2400 python -u bench.py --kernel fsm --scale 16 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel fsm --scale 20 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel kcl --scale 16 | tail -1 >> $OUT
timeout 3600 python -u bench.py --kernel kcl --scale 20 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel motif --scale 16 | tail -1 >> $OUT
timeout 3600 python -u bench.py --kernel motif --scale 20 | tail -1 >> $OUT
cat $OUT
