#!/bin/bash
# Warmup-gated closing-bench runner (r18, verdict ask #2a).
#
# The r17 driver bench recorded 2.07x the r1 line on a measurably
# slow-era run (warmup 92.8 s vs 69-77 s for identical work minutes
# earlier) — warmup_sec is the proven era proxy on this box, so the
# close ritual now GATES on it: a run whose warmup exceeds
# $GRAFT_WARMUP_GATE_SEC is discarded as slow-era and re-run, up to
# $GRAFT_CLOSE_MAX_TRIES (default 6) attempts total.
#
# Gate default recalibrated r19: the warmup leg now runs its memo
# families in parallel FAIR pools (Bench.scala) and reads ~38 s
# fast-era (was 62-70 s sequential), so the gate drops 80 -> 50 —
# the same ~1.3x fast-era margin as before. If the warmup leg is
# re-shaped again, re-measure and re-set BOTH this default and the
# BASELINE.md protocol paragraph.
# Produces $GRAFT_CLOSE_RUNS (default 3) accepted runs, then feeds
# them to tools/bench_minima.py for the committed era-robust series.
#
# Usage: tools/close_bench.sh [outdir]        (default /tmp/close_bench)
# Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#        SPARK_GRAFT_CPUS   (default 32)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/close_bench}"
RUNS="${GRAFT_CLOSE_RUNS:-3}"
GATE="${GRAFT_WARMUP_GATE_SEC:-50}"
MAX="${GRAFT_CLOSE_MAX_TRIES:-6}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
mkdir -p "$OUT"
accepted=()
try=0
while [ "${#accepted[@]}" -lt "$RUNS" ] && [ "$try" -lt "$MAX" ]; do
  try=$((try + 1))
  log="$OUT/run_try${try}.log"
  echo "== close bench try $try (loadavg: $(cut -d' ' -f1-3 /proc/loadavg))"
  tools/graft-java.sh graft.Bench > "$log" 2>&1 || {
    echo "   BENCH FAILED (see $log)"; continue; }
  # first metric line is authoritative
  metric=$(grep -m1 '^{"metric"' "$log" || true)
  if [ -z "$metric" ]; then echo "   no metric line (see $log)"; continue; fi
  warm=$(python3 -c "import json,sys; print(json.loads(sys.argv[1]).get('warmup_sec', -1))" "$metric")
  total=$(python3 -c "import json,sys; print(round(json.loads(sys.argv[1])['value'], 1))" "$metric")
  # a missing/malformed warmup_sec (-1 sentinel) must NOT pass the gate
  # by comparing below the threshold — an un-instrumented run is
  # invalid, not fast-era (ADVICE r18)
  valid=$(python3 -c "import sys; print(1 if float(sys.argv[1]) >= 0 else 0)" "$warm")
  if [ "$valid" != "1" ]; then
    echo "   REJECTED invalid run: warmup_sec missing or negative (${warm}) — not gateable"
    continue
  fi
  gated=$(python3 -c "import sys; print(1 if float(sys.argv[1]) > float(sys.argv[2]) else 0)" "$warm" "$GATE")
  if [ "$gated" = "1" ]; then
    echo "   REJECTED slow era: warmup ${warm}s > gate ${GATE}s (total ${total}s)"
    continue
  fi
  n=$(( ${#accepted[@]} + 1 ))
  echo "$metric" > "$OUT/run${n}.json"
  accepted+=("$OUT/run${n}.json")
  echo "   accepted run $n: total ${total}s warmup ${warm}s"
done
if [ "${#accepted[@]}" -lt "$RUNS" ]; then
  echo "FAILED: only ${#accepted[@]}/$RUNS runs passed the warmup gate in $MAX tries"
  echo "(machine stuck in a slow era — re-run later rather than record)"
  exit 1
fi
python3 tools/bench_minima.py "${accepted[@]}"
