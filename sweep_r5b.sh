#!/bin/bash
# Round-5 sweep, part 2: re-run the rows that failed in sweep_r5.sh,
# after the fixes they forced — vc/mst chunked per-edge rowsel sweeps
# (55221f9), mst host-side int64-key np.unique, kcl class-sort chunking
# (the s32[2^26,128] = 32 GB gather that killed kcl/motif/sgl at 20),
# and single timed iteration for sgl at scale >= 18.
set -u
OUT=BENCH_SWEEP_r5.jsonl
for k in vc mst symgs; do
  timeout 2400 python -u bench.py --kernel $k --scale 20 | tail -1 >> $OUT
done
timeout 3600 python -u bench.py --kernel kcl --scale 20 | tail -1 >> $OUT
timeout 3600 python -u bench.py --kernel sgl --scale 20 | tail -1 >> $OUT
timeout 5400 python -u bench.py --kernel motif --scale 20 | tail -1 >> $OUT
tail -6 $OUT
