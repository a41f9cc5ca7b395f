#!/usr/bin/env python3
"""Fingerprint the /root/testdata fixture schemas (driver-side tool).

Round 8 lost 11 queries and 27 tests to a mid-round fixture regeneration
that silently changed events.ts from TIMESTAMP(NANOS) to timestamp[us].
This prints one line per (sf, table) with a short hash of the arrow
schema (field names + types), so the snapshot ritual can record the
vintage in NOTES.md and a later regeneration shows up as a one-line diff
instead of a board of red queries.

Usage: python3 tools/fixture_fingerprint.py [testdata_root]
"""
import hashlib
import sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        parts = []
        for t in TABLES:
            schema = pq.read_schema(f"{root}/{sf}/{t}.parquet")
            desc = ";".join(f"{f.name}:{f.type}" for f in schema)
            parts.append(f"{t}={hashlib.sha256(desc.encode()).hexdigest()[:10]}")
        print(f"{sf}: " + " ".join(parts))
        # the vintage-sensitive column, spelled out so the diff is readable
        ts_type = dict((f.name, str(f.type))
                       for f in pq.read_schema(f"{root}/{sf}/events.parquet"))["ts"]
        print(f"{sf}: events.ts = {ts_type}")


if __name__ == "__main__":
    main()
