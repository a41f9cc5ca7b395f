#!/usr/bin/env python3
"""Degenerate-cardinality fixture twins (VERDICT r18 ask #3 — wave 4).

The hostile twins (tools/hostile_fixtures.py, waves 1-3) deliberately
keep every join populated and every query returning rows; the untested
class left after three clean sweeps is MINIMAL input: empty tables,
one-row tables, and an all-NULL text column. Aggregates differ between
engines on empty input (sum() -> NULL both, but avg/corr/guarded
estimators each have their own edge), window frames over one row hit
every min_periods branch, and the quantizer/trainer family has
DECLARED loud-failure contracts (KMeans requires k <= n) that should
fail loudly, not return garbage.

Builds THREE sibling twins of a base SF dir, schema-preserved:

    python3 tools/degenerate_fixtures.py /root/testdata/sf0.01 /tmp/degen
        -> /tmp/degen/empty     every table 0 rows
        -> /tmp/degen/one       every table exactly 1 row, FK-consistent
        -> /tmp/degen/nulltext  base tables, but documents.text and
                                events.props are ALL NULL

Sweep each with graft.Verify + tools/check_oracle.py, same as the
hostile waves. Expected-loud-failure queries (trainers/quantizers on
empty or sub-k input) are triaged by tools/degenerate_sweep.sh, which
separates "both engines agree" / "declared loud failure" / "real
divergence" — only the third class is a defect.

Deterministic: no RNG, no wall clock.
"""
import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def strip_meta(schema):
    return pa.schema([schema.field(i) for i in range(len(schema))])


def write(out, name, table):
    os.makedirs(out, exist_ok=True)
    schema = strip_meta(table.schema)
    table = table.cast(schema)
    pq.write_table(table, f'{out}/{name}.parquet')
    print(f'{os.path.basename(out)}/{name}: {table.num_rows} rows')


def ts(s):
    return dt.datetime.fromisoformat(s)


def one_row(name, schema):
    """One FK-consistent row per table: region 0 <- nation 0 <- customer
    1/supplier 1; part 1 <- lineitem of order 1 <- customer 1. The
    single doc/embedding/event exercise every single-row group edge
    (stddev of 1 row, window frames of width 1, corpus of size 1)."""
    rows = {
        'region': {'r_regionkey': 0, 'r_name': 'AMERICA'},
        'nation': {'n_nationkey': 0, 'n_name': 'BRAZIL', 'n_regionkey': 0},
        'customer': {'c_custkey': 1, 'c_name': 'Customer#000000001',
                     'c_nationkey': 0, 'c_acctbal': 100.25,
                     'c_mktsegment': 'BUILDING'},
        'supplier': {'s_suppkey': 1, 's_name': 'Supplier#000000001',
                     's_nationkey': 0, 's_acctbal': 50.5},
        'part': {'p_partkey': 1, 'p_name': 'azure metal', 'p_brand': 'Brand#11',
                 'p_type': 'SMALL PLATED COPPER', 'p_size': 7,
                 'p_retailprice': 901.0},
        'orders': {'o_orderkey': 1, 'o_custkey': 1, 'o_orderstatus': 'O',
                   'o_totalprice': 173665.47,
                   'o_orderdate': ts('2024-01-02T00:00:00'),
                   'o_orderpriority': '1-URGENT'},
        'lineitem': {'l_orderkey': 1, 'l_partkey': 1, 'l_suppkey': 1,
                     'l_linenumber': 1, 'l_quantity': 17.0,
                     'l_extendedprice': 21168.23, 'l_discount': 0.04,
                     'l_tax': 0.02, 'l_returnflag': 'N', 'l_linestatus': 'O',
                     'l_shipdate': ts('2024-03-13T00:00:00')},
        'events': {'event_id': 1, 'ts': ts('2024-01-05T10:00:00'),
                   'user_id': 1, 'event_type': 'view', 'value': 42.5,
                   'props': '{"k": 3}'},
        'documents': {'doc_id': 0, 'text': 'the quick brown fox',
                      'lang': 'en', 'source': 'web', 'n_chars': 19},
        'embeddings': {'vec_id': 0,
                       'embedding': [0.1 * (i % 7) + 0.01 for i in range(8)],
                       'label': 0},
    }
    row = dict(rows[name])
    if name == 'embeddings':
        # match the base fixture's embedding dim, not a guessed 8
        return None  # handled by caller with the real dim
    return pa.Table.from_pylist([row], schema=strip_meta(schema))


def main(base, outroot):
    schemas = {t: pq.read_schema(f'{base}/{t}.parquet') for t in TABLES}

    # ---- empty: 0 rows, exact schema --------------------------------
    out = os.path.join(outroot, 'empty')
    for t in TABLES:
        write(out, t, pa.Table.from_pylist([], schema=strip_meta(schemas[t])))

    # ---- one: exactly 1 FK-consistent row per table ------------------
    out = os.path.join(outroot, 'one')
    base_emb = pq.read_table(f'{base}/embeddings.parquet')
    dim = len(base_emb['embedding'][0])
    for t in TABLES:
        if t == 'embeddings':
            row = {'vec_id': 0,
                   'embedding': [0.1 * (i % 7) + 0.01 for i in range(dim)],
                   'label': 0}
            tab = pa.Table.from_pylist([row], schema=strip_meta(schemas[t]))
        else:
            tab = one_row(t, schemas[t])
        write(out, t, tab)

    # ---- nulltext: base tables, documents.text + events.props NULL ---
    out = os.path.join(outroot, 'nulltext')
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f'{base}/{t}.parquet')
        if t == 'documents':
            idx = tab.schema.get_field_index('text')
            tab = tab.set_column(idx, tab.schema.field(idx),
                                 pa.nulls(tab.num_rows, pa.string()))
        if t == 'events':
            idx = tab.schema.get_field_index('props')
            tab = tab.set_column(idx, tab.schema.field(idx),
                                 pa.nulls(tab.num_rows, pa.string()))
        write(out, t, tab)

    print('degenerate twins written under', outroot)


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
