#!/bin/bash
# N-trial rerun of the local correctness gate — the graft analog of the
# reference's flake hunter (/root/reference/mr-main/test-mr-many.sh:8-19).
# Each trial re-runs graft.Verify (fresh Spark session, fresh shuffle
# nondeterminism) and the DuckDB oracle compare; any trial that fails
# stops the loop. Catches local-green/driver-red divergence (unstable
# orderings, engine-specific hashes) before the driver does.
#
# Usage: scripts/verify-many.sh <numTrials> [sfDir]
set -u
if [ $# -lt 1 ]; then
    echo "Usage: $0 numTrials [sfDir (default /root/testdata/sf0.01)]"
    exit 1
fi
runs=$1
case "$runs" in
    ''|*[!0-9]*) echo "numTrials must be a positive integer, got '$runs'"; exit 1;;
esac
if [ "$runs" -lt 1 ]; then
    echo "numTrials must be >= 1, got $runs"; exit 1
fi
sf=${2:-/root/testdata/sf0.01}
cd "$(dirname "$0")/.."
# A stale exported ORACLE_SKIP must never weaken the gate silently.
# Skipping is legitimate only when requested EXPLICITLY for this run
# via ALLOW_ORACLE_SKIP=1 (e.g. dedup_clusters' quadratic closure
# oracle at sf0.1); otherwise run strict: any skip fails the trial.
if [ -n "${ORACLE_SKIP:-}" ]; then
    if [ "${ALLOW_ORACLE_SKIP:-0}" = "1" ]; then
        echo "*** WARNING: trials EXCLUDE skipped queries: ORACLE_SKIP=$ORACLE_SKIP"
        export ORACLE_STRICT=0  # a stale strict flag must not override the explicit allow
    else
        echo "*** ORACLE_SKIP=$ORACLE_SKIP is set but ALLOW_ORACLE_SKIP=1 is not:"
        echo "*** running STRICT (skips fail). Export ALLOW_ORACLE_SKIP=1 to allow."
        export ORACLE_STRICT=1
    fi
fi
for i in $(seq 1 "$runs"); do
    out=$(mktemp -d /tmp/graft-verify-XXXX)
    if ! timeout -k 10s 900s sbt -batch "runMain graft.Verify $sf $out" \
         > "$out/verify.log" 2>&1; then
        echo "*** VERIFY CRASHED IN TRIAL $i (log: $out/verify.log)"
        exit 1
    fi
    if ! python3 scripts/oracle_check.py "$sf" "$out" > "$out/oracle.log" 2>&1; then
        echo "*** FAILED ORACLE CHECK IN TRIAL $i:"
        grep -E '^FAIL' "$out/oracle.log"
        echo "(full log: $out/oracle.log)"
        exit 1
    fi
    tail -1 "$out/oracle.log" | sed "s/^/trial $i: /"
    rm -rf "$out"
done
echo "*** PASSED ALL $runs TESTING TRIALS"
