#!/usr/bin/env bash
# Pre-snapshot gate (round-6 postmortem: a round must never end on an
# uncompilable HEAD). Run before any end-of-round commit/snapshot:
#
#   scripts/pre_snapshot_check.sh            # compile gate only (~15 s)
#   scripts/pre_snapshot_check.sh --verify   # + sf0.001 spot verify
#
# Exit 0 = safe to snapshot. Non-zero = DO NOT COMMIT; fix or revert to
# the last green commit instead.
set -u
cd "$(dirname "$0")/.."

echo "[gate] sbt Test/compile ..."
if ! sbt -batch "Test/compile" > /tmp/pre_snapshot_compile.log 2>&1; then
  echo "[gate] FAIL: Test/compile is red — refusing the snapshot." >&2
  grep -E "^\[error\]" /tmp/pre_snapshot_compile.log | head -20 >&2
  exit 1
fi
echo "[gate] compile green."

if [[ "${1:-}" == "--verify" ]]; then
  echo "[gate] flagship smoke (entry query, sf0.001) ..."
  if ! SPARK_GRAFT_CPUS=4 sbt -batch \
      "runMain graft.Verify /root/testdata/sf0.001 /tmp/pre_snapshot_verify q1_platform_agg,q7_pricing_summary" \
      > /tmp/pre_snapshot_verify.log 2>&1; then
    echo "[gate] FAIL: Verify smoke is red — refusing the snapshot." >&2
    tail -20 /tmp/pre_snapshot_verify.log >&2
    exit 1
  fi
  echo "[gate] verify smoke green."
fi
echo "[gate] OK to snapshot."
