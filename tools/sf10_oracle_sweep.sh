#!/bin/bash
# Round-11 judge ask #2: oracle-verify the COMPLETE bench headline at
# sf10 (.layout/sf10_synth, 100x the sf0.1 gate data), one query per
# process with a watchdog; exclusions documented in the log.
cd /root/repo
OUT=${1:-/tmp/sf10_sweep.log}
: > "$OUT"
QS=$(python - <<'PY'
import sys; sys.path.insert(0,'.')
from tools.bench_compare import HEADLINE, EXTENDED
print(" ".join(HEADLINE + EXTENDED))
PY
)
for q in $QS; do
  case "$q" in
    embedding_near_dup|embedding_near_dup_exact)
      echo "SKIP $q: planted-quadratic ground-truth oracle (~100x output per decade; excluded at sf1 for the same reason, r5/r10 notes)" >> "$OUT"
      continue;;
  esac
  timeout 900 python tools/check_correctness.py .layout/sf10_synth "$q" 2>/dev/null | grep -E "^(PASS|FAIL|ERR)" >> "$OUT" \
    || echo "TIMEOUT-OR-ERROR $q (900s watchdog)" >> "$OUT"
done
echo "DONE $(grep -c '^PASS' "$OUT") pass / $(grep -cE '^(FAIL|ERR|TIMEOUT)' "$OUT") fail-or-timeout / $(grep -c '^SKIP' "$OUT") skipped" >> "$OUT"
