#!/bin/bash
# Chunked driver-gate sweep: runs tools/check_queries.py over all
# queries() entries in fresh processes of CHUNK entries each, so a
# single long Ray session never accumulates the ~500-Dataset state that
# trips Ray 2.49's ReferenceCounter check (CLAUDE.md).  Usage:
#   tools/sweep_gate.sh [SF_DIR] [CHUNK]
set -u
SF="${1:-/root/testdata/sf0.01}"
CHUNK="${2:-40}"
cd "$(dirname "$0")/.."
NAMES=$(python - <<'PY'
import sys
sys.path.insert(0, ".")
import __ray_entry__ as m
print("\n".join(m.queries().keys()))
PY
)
total=0; failures=0
while read -r -a batch; do
  names=$(IFS=,; echo "${batch[*]}")
  python tools/check_queries.py "$SF" "$names" 2>/dev/null | grep -E "^(PASS|ok|FAIL)"
  rc=$?
  total=$((total + ${#batch[@]}))
  [ $rc -ne 0 ] && failures=$((failures + 1))
done < <(echo "$NAMES" | xargs -n "$CHUNK")
echo "swept $total entries in chunks of $CHUNK; failing chunks: $failures"
exit $failures
