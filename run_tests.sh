#!/usr/bin/env bash
# File-sharded test runner: one pytest process per test file.
#
# Rationale: a single-process full run accumulates RSS across 160+
# jitted XLA programs on the 8-device virtual mesh and can die (observed
# exit 139 after ~160 tests) — per-file processes bound the footprint and
# isolate any crash to one file.  Shards run PAR_JOBS at a time (default
# 4); with a warm per-machine compile cache (tests/conftest.py) the full
# suite finishes well under the 25-minute budget.
#
# Usage:
#   ./run_tests.sh            # full suite, sharded
#   ./run_tests.sh -m smoke   # pass-through pytest args per shard
set -u
cd "$(dirname "$0")"
PAR_JOBS="${PAR_JOBS:-4}"
LOGDIR="$(mktemp -d /tmp/vvc_mm_tests.XXXXXX)"
export VVC_TEST_ARGS="$*"

run_one() {
    f="$1"
    log="$LOGDIR/$(basename "$f").log"
    # shellcheck disable=SC2086
    timeout 1200 python -m pytest "$f" -q $VVC_TEST_ARGS >"$log" 2>&1
    rc=$?
    tail -1 "$log" | sed "s|^|$(basename "$f"): |"
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then     # 5 = no tests collected
        echo "FAILED ($rc): $f  (log: $log)"
        return 1
    fi
    return 0
}
export -f run_one
export LOGDIR

ls tests/test_*.py | xargs -P "$PAR_JOBS" -I{} bash -c 'run_one "$@"' _ {}
rc=$?
if [ $rc -eq 0 ]; then
    echo "ALL TEST FILES PASSED"
else
    echo "SOME TEST FILES FAILED (logs in $LOGDIR)"
fi
exit $rc
