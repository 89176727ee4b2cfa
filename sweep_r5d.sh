#!/bin/bash
# Round-5 sweep, part 4: every row still missing from BENCH_SWEEP_r5.jsonl
# after parts 1-3 — vc@20 (palette escalation), kcl/motif@16 re-measured
# on the k=4 candidate-mask engine, symgs@20 (chunked rowsel fix),
# sgl@20 (single timed iter), motif@20 (wedge-stream v2 demo, VERDICT
# r4 item 2).
set -u
OUT=BENCH_SWEEP_r5.jsonl
timeout 3600 python -u bench.py --kernel vc --scale 20 2>&1 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel motif --scale 16 2>&1 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel symgs --scale 20 2>&1 | tail -1 >> $OUT
timeout 3600 python -u bench.py --kernel sgl --scale 20 2>&1 | tail -1 >> $OUT
timeout 5400 python -u bench.py --kernel motif --scale 20 2>&1 | tail -1 >> $OUT
tail -6 $OUT
