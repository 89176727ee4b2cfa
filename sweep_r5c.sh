#!/bin/bash
# Round-5 sweep, part 3: rows invalidated by the second wave of fixes —
# vc after palette escalation (the 128-color cap saturates at RMAT-20:
# the fused loop could never converge and the worker killed it), and
# kcl/motif at 16 after the k=4 candidate-mask engine (VERDICT r4
# item 4: count pass -> edge popcount, fill -> one mask bit per wedge,
# final level rotates only the new member).
set -u
OUT=BENCH_SWEEP_r5.jsonl
timeout 3600 python -u bench.py --kernel vc --scale 20 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel kcl --scale 16 | tail -1 >> $OUT
timeout 2400 python -u bench.py --kernel motif --scale 16 | tail -1 >> $OUT
tail -3 $OUT
