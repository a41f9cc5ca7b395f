#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, sorts
columns by name and rows by all columns, and compares cell-by-cell (exact,
like a hash compare would be).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema mismatch spark={gc} oracle={ec}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(er)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(oracle)} total")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
