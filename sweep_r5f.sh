#!/bin/bash
# Round-5 sweep, part 6 (final session): the two rows still missing
# from BENCH_SWEEP_r5.jsonl — sgl (no recorded row at ANY scale; 16 is
# the feasible cold-cache scale this session) and motif@20 (VERDICT r4
# item 2: wedge-stream v2 demonstrated at scale).  Waits for the
# cache-warming pr@20 run to release the chip first.  Only lines that
# parse as JSON are appended.
set -u
OUT=BENCH_SWEEP_r5.jsonl
LOGD=/tmp/sweep_r5f
mkdir -p $LOGD
if [ -f /tmp/bench_pr20.pid ]; then
  while kill -0 "$(cat /tmp/bench_pr20.pid)" 2>/dev/null; do sleep 10; done
fi
row() { # row <timeout_s> <kernel> <scale>
  local t=$1 k=$2 s=$3
  timeout "$t" python -u bench.py --kernel "$k" --scale "$s" \
    > "$LOGD/${k}_${s}.log" 2>&1
  local line
  line=$(tail -1 "$LOGD/${k}_${s}.log")
  if python -c "import json,sys; json.loads(sys.argv[1])" "$line" \
      2>/dev/null; then
    echo "$line" >> $OUT
    echo "OK  $k@$s: $line"
  else
    echo "FAIL $k@$s (see $LOGD/${k}_${s}.log)"
  fi
}
row 1500 sgl 16
row 2700 motif 20
