#!/bin/bash
# End-of-round snapshot gate (round-13 process fix; VERDICT r12 items
# 2 and 6). The r12 snapshot (98155d2) shipped a deterministic test
# failure because the suite was never re-run after a mid-round plan
# rewrite, and round artifacts were left dirty/untracked twice in a
# row (r11 item 6, r12 item 6). This script is the ONLY sanctioned way
# to cut the snapshot:
#
#   tools/snapshot.sh "<commit message>"
#
# 1. runs the FULL sbt test suite; any failure ABORTS the commit and
#    records the red suite loudly in SNAPSHOT_BLOCKED.txt (committed
#    nowhere — it sits dirty so the next `git status` screams);
# 2. sweeps EVERY round artifact (BENCH_*/CORRECTNESS_*/LEAKCHECK/
#    BENCH_OUT/STREAM_SCALE/MICROBENCH_* and friends) into the commit;
# 3. refuses to leave the tree dirty: after the commit, `git status
#    --porcelain` must be empty or the script exits 1.
set -euo pipefail
cd "$(dirname "$0")/.."

MSG="${1:?usage: tools/snapshot.sh \"commit message\"}"
LOG=/tmp/snapshot_sbt_test.log

echo "=== snapshot gate: full sbt test (log: $LOG) ==="
if ! sbt -batch test >"$LOG" 2>&1; then
  {
    echo "SNAPSHOT BLOCKED $(date -u +%FT%TZ): sbt test is RED."
    echo "Failing lines:"
    grep -E "^\[error\]|\*\*\* FAILED \*\*\*|Tests: .*failed [1-9]" "$LOG" | head -40
  } | tee SNAPSHOT_BLOCKED.txt
  echo "=== REFUSING to commit a red suite. Fix it, then re-run. ==="
  exit 1
fi
grep -E "Tests: succeeded|All tests passed" "$LOG" | tail -2
rm -f SNAPSHOT_BLOCKED.txt

echo "=== snapshot gate: sweeping round artifacts ==="
git add -A
if git diff --cached --quiet; then
  echo "nothing to commit — tree already clean"
else
  git commit -m "$MSG"
fi

if [ -n "$(git status --porcelain)" ]; then
  echo "=== snapshot gate FAILED: tree still dirty after commit ==="
  git status --porcelain
  exit 1
fi
echo "=== snapshot gate: green suite, clean tree ==="
