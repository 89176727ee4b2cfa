#!/bin/bash
# Round-3 headline sweep -> BENCH_SWEEP_r3.jsonl (one JSON row per kernel).
# Mining rows run at scale 16 (VERDICT r2 item 10); everything else at 20.
set -u
OUT=BENCH_SWEEP_r3.jsonl
: > $OUT
for k in pr spmv bfs msbfs cc tc bc sgd sssp; do
  timeout 2400 python -u bench.py --kernel $k --scale 20 | tail -1 >> $OUT
done
timeout 2400 python -u bench.py --kernel kcl --scale 16 | tail -1 >> $OUT
# motif-4 at scale 16: the device wedge-stream sort-groupby engine
# (mining/wedgestream.py) made the 0.62 G-wedge C4 census practical
timeout 2400 python -u bench.py --kernel motif --scale 16 | tail -1 >> $OUT
cat $OUT
