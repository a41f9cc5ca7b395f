#!/bin/bash
# Run every independent-reference audit against a fresh Verify dump.
# Usage: tools/audit/run_all.sh [dump_dir]   (default /tmp/v1 at sf0.01)
# Produce the dump first:
#   SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v1"
set -e
cd "$(dirname "$0")"
fail=0
for f in audit_timeseries.py audit_textdedup.py audit_similarity.py \
         audit_temporal.py audit_relational.py; do
  echo "== $f"
  python3 "$f" || fail=1
done
exit $fail
