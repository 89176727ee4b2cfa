#!/bin/bash
# Round-5 sweep, part 5: remaining rows after the vc@20 debug re-run.
# Unlike parts 1-4, each row keeps its FULL log under /tmp/sweep_r5e/
# and only a line that parses as JSON is appended to the jsonl (part 4
# appended a traceback tail when vc@20 crashed).
set -u
OUT=BENCH_SWEEP_r5.jsonl
LOGD=/tmp/sweep_r5e
mkdir -p $LOGD
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
    echo "FAIL $k@$s (see $LOGD/${k}_${s}.log): $line"
  fi
}
"$@"
