#!/usr/bin/env bash
# Tri-SF oracle gate: one entry point for the full correctness sweep the
# round-13 rounding class proved necessary — the driver only gates sf0.01,
# and the q_quality_score decimal-half divergence was INVISIBLE there (it
# needed an sf0.1 row landing exactly on a printed .5 boundary). Running
# Verify + check_oracle.py at ALL THREE fixture SFs keeps that class of
# boundary-only divergences structurally caught.
#
# Usage: scripts/gate_tri_sf.sh [outRoot]   (default /tmp/graft_gate)
# Exit 0 iff every declared oracle passes at every SF.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_gate}"
mkdir -p "$OUT"
fail=0
for sf in sf0.001 sf0.01 sf0.1; do
  dir="/root/testdata/$sf"
  out="$OUT/$sf"
  rm -rf "$out"
  echo "== Verify @ $sf"
  sbt "runMain graft.Verify $dir $out" >"$OUT/verify_$sf.log" 2>&1 || {
    echo "VERIFY FAILED @ $sf (see $OUT/verify_$sf.log)"; fail=1; continue; }
  echo "== Oracle gate @ $sf"
  python3 scripts/check_oracle.py "$dir" "$out" | tee "$OUT/oracle_$sf.log" |
    grep -E "FAIL|==" || true
  grep -q ", 0 fail" "$OUT/oracle_$sf.log" || fail=1
done
if [ "$fail" -eq 0 ]; then echo "TRI-SF GATE: ALL PASS"; else echo "TRI-SF GATE: FAILURES"; fi
exit $fail
