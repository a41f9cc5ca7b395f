#!/usr/bin/env python3
"""Schema-drift twin generator (VERDICT r19 ask #4 — wave 5).

SURVEY §1.3 documents the reference's drift tolerance: runtime schema
introspection (regression.py:58-72), missing-column price reconstruction
(spark_stream.py:123-128), multi-format dates (ml_impl.py:22-30). The
hostile waves 1-4 covered VALUE-level hazards; this wave drifts the
SCHEMA itself. Four twins of a base SF dir, each one drift class, all
deterministic (no RNG, no wall clock), rows byte-identical to base:

  reorder  every multi-column table's columns REVERSED on disk. A
           name-based engine must be unaffected; a positional read
           would silently transpose values. Expected: full green.
  widen    int32 columns widened to int64 (lineitem.l_linenumber,
           customer.c_nationkey, supplier.s_nationkey where present).
           Both engines read the widened type from the same file, so
           any FAIL is a hard-coded narrow-type assumption. Expected:
           full green.
  addcol   a `drift_note` string column appended to orders + events (a
           new upstream vintage adds a field). Explicit projections
           must ignore it. The DECLARED divergence: q_null_audit
           introspects df.schema at runtime (the engine ADAPTS — it
           audits the new column) while its oracle SQL is a frozen
           column list — a schema mismatch that demonstrates drift
           tolerance, not a defect (triaged DYNAMIC_ORACLE).
  dropcol  events.props REMOVED (an upstream vintage stops shipping a
           field). The two props consumers (q_event_json,
           q_json_profile) must fail LOUDLY in BOTH engines — a
           missing-column read must never silently return NULLs
           (triaged LOUD_BOTH). Everything else green. The engine's
           sanctioned tolerance path for a missing column is
           Sources.reconstructColumn (q_value_recon), which stays
           green here because it stages its own two-vintage source.

Usage:
    python3 tools/schema_drift_fixtures.py /root/testdata/sf0.01 /tmp/drift
    # -> /tmp/drift/{reorder,widen,addcol,dropcol}/<table>.parquet
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WIDEN = {
    "lineitem": ["l_linenumber"],
    "customer": ["c_nationkey"],
    "supplier": ["s_nationkey"],
}


def read(base, name):
    return pq.read_table(os.path.join(base, f"{name}.parquet"))


def write(out, name, table):
    # preserve the base fixtures' timestamp physical type: a version-2
    # writer would re-type ts and change what both engines read
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))


def copy(base, out, name):
    shutil.copyfile(os.path.join(base, f"{name}.parquet"),
                    os.path.join(out, f"{name}.parquet"))


def twin_reorder(base, out):
    for t in TABLES:
        tab = read(base, t)
        if tab.num_columns > 1:
            write(out, t, tab.select(list(reversed(tab.column_names))))
        else:
            copy(base, out, t)


def twin_widen(base, out):
    for t in TABLES:
        if t not in WIDEN:
            copy(base, out, t)
            continue
        tab = read(base, t)
        cols, changed = [], False
        for f in tab.schema:
            c = tab.column(f.name)
            if f.name in WIDEN[t] and pa.types.is_int32(f.type):
                c = c.cast(pa.int64())
                changed = True
            cols.append(c)
        if changed:
            write(out, t, pa.table(dict(zip(tab.column_names, cols))))
        else:
            copy(base, out, t)


def twin_addcol(base, out):
    for t in TABLES:
        if t not in ("orders", "events"):
            copy(base, out, t)
            continue
        tab = read(base, t)
        note = pa.array([f"v2_{i % 3}" for i in range(tab.num_rows)],
                        pa.string())
        write(out, t, tab.append_column("drift_note", note))


def twin_dropcol(base, out):
    for t in TABLES:
        if t != "events":
            copy(base, out, t)
            continue
        tab = read(base, t)
        write(out, t, tab.drop_columns(["props"]))


def main(base, outroot):
    twins = {"reorder": twin_reorder, "widen": twin_widen,
             "addcol": twin_addcol, "dropcol": twin_dropcol}
    for name, fn in twins.items():
        out = os.path.join(outroot, name)
        os.makedirs(out, exist_ok=True)
        fn(base, out)
        print(f"[drift] {name}: written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
