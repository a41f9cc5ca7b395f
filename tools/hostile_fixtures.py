#!/usr/bin/env python3
"""Hostile fixture twin generator (verdict r17 ask #1).

Every defect family found in rounds 16-17 (phantom tokens on
tab/newline-edged docs, NULL cube keys colliding with margins,
NULLS-FIRST/LAST order divergence, U+000B tokenizer divergence) was
latent ONLY because the driver's TPC-H-ish fixtures are clean: non-null
group keys, space-separated ASCII text, unique timestamps, no boundary
ties. This script builds a TWIN of a base SF dir with the hostile
properties injected, preserving every table's exact arrow schema, so
the FULL oracle board (graft.Verify + tools/check_oracle.py) can run
against it unchanged:

    python3 tools/hostile_fixtures.py /root/testdata/sf0.01 /tmp/hostile
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/hostile /tmp/vh"
    python3 tools/check_oracle.py /tmp/vh /tmp/hostile

Hazard classes injected (deterministic — no RNG, no wall clock):

  K. NULL and empty-string GROUP KEYS: l_returnflag/l_linestatus,
     o_orderpriority/o_orderstatus, c_mktsegment, event_type,
     documents.lang/source, p_brand/p_type — the class that exposed
     the r16 cube NULL-margin collision.
  J. NULL JOIN KEYS + broken FKs: orders with NULL o_custkey, a
     customer pointing at a nonexistent nation, an order with no
     lineitems, a nation with no customers.
  T. HOSTILE TEXT (mutates doc_id 3/7/11/13/17 so the doc_id<20
     queries see it; appends the rest): empty, whitespace-only,
     tab/newline/CRLF-edged, U+000B vertical tab (Java-vs-RE2 \\s),
     NBSP (not whitespace in either engine), unicode (diacritics,
     CJK, astral emoji), NULL text, exact-dup pair, near-dup pair,
     single-token and 400x-repeated-token docs, PII-shaped strings.
  W. DUPLICATE TIMESTAMPS: same (user_id, ts) with distinct
     event_ids — any window ordered by ts without a tiebreaker
     diverges between engines; same l_shipdate ties.
  V. ZERO-VARIANCE and SINGLE-ROW GROUPS: a user whose events all
     carry one value (stddev 0 -> z-score guards), a one-event user,
     a one-doc source and lang, 3 identical docs in one source.
  B. BOUNDARY TIES: exact duplicate o_totalprice/l_extendedprice at
     ranking cut lines, values on the floor(x*1e4+0.5) rounding
     boundary, discount exactly 0.05/0.00.
  P. HOSTILE JSON props: NULL, '{}', '{"k": null}', non-numeric k,
     malformed '{k:' (DuckDB json_extract ERRORS on invalid JSON
     where Spark NULLs — oracles need json_valid guards).
  E. HOSTILE EMBEDDINGS: the all-zero vector (norm 0 -> cosine
     guard), an exact duplicate of vec 0 and a mutually-identical
     new pair (distance ties at top-k cuts).
  R. EMPTY ROW GROUP appended to documents and lineitem parquet
     (readers must tolerate a 0-row group), plus multi-row-group
     files throughout.

The twin is a superset mutation: joins stay populated, every query
still returns rows, and the compare is Spark-vs-DuckDB on the SAME
file, so any FAIL is a real cross-engine divergence.

DELIBERATELY NOT injected — declared DATA-CONTRACT boundaries rather
than robustness gaps (r18 wave-2 triage):

  * NaN / +-Inf measures: the two engines' comparison semantics
    genuinely differ (DuckDB: NaN > everything is TRUE in predicates;
    Spark: NaN ordered largest but predicate semantics differ) and
    BOTH engines fail the exact-cents cast (DuckDB range error, Spark
    ANSI throw) — non-finite measures are out of the landed-data
    contract; the engine's NaN surface is the declared scrub ops
    (F20 NaN->0 JSON scrub, q_json_profile's isnan NULL-banding) and
    a production deployment quarantines non-finite rows at ingest.
  * Wrong-length embedding vectors: the embeddings table declares a
    fixed dim; a mixed-dim corpus is a schema violation upstream of
    every operator (KMeans would reject the fit outright).
  * Duplicate primary keys / empty tables: key uniqueness and
    non-empty model-training inputs are contract preconditions
    (KMeans requires k <= n); an empty-corpus index build should
    fail loudly, not return an empty index.
"""
import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

US = 1  # timestamps are microsecond-grain python datetimes


def read(base, name):
    return pq.read_table(f'{base}/{name}.parquet')


def strip_meta(schema):
    return pa.schema([schema.field(i) for i in range(len(schema))])


def write(out, name, table, extra_empty_group=False):
    """Write with >=2 row groups; optionally append a 0-row group."""
    schema = strip_meta(table.schema)
    table = table.cast(schema)
    path = f'{out}/{name}.parquet'
    n = table.num_rows
    with pq.ParquetWriter(path, schema) as w:
        half = max(1, n // 2)
        w.write_table(table.slice(0, half))
        w.write_table(table.slice(half))
        if extra_empty_group:
            try:
                w.write_table(table.slice(0, 0))
            except Exception as e:  # pragma: no cover
                print(f'  note: empty row group unsupported ({e})')
    print(f'{name}: {n} rows -> {path}')


def rows_to_table(rows, schema):
    return pa.Table.from_pylist(rows, schema=strip_meta(schema))


def ts(s):
    return dt.datetime.fromisoformat(s)


def main(base, out):
    os.makedirs(out, exist_ok=True)

    # ---------------- region / nation: an empty-join group ---------
    region = read(base, 'region')
    write(out, 'region', region)

    nation = read(base, 'nation')
    nation = pa.concat_tables([nation, rows_to_table([
        # K/J: a nation no customer or supplier references; empty name
        {'n_nationkey': 97, 'n_name': '', 'n_regionkey': 0},
    ], nation.schema)])
    write(out, 'nation', nation)

    # ---------------- customer --------------------------------------
    cust = read(base, 'customer')
    ck = pa.compute.max(cust['c_custkey']).as_py()
    cust = pa.concat_tables([cust, rows_to_table([
        # K: NULL and empty-string segment keys; NULL balance
        {'c_custkey': ck + 1, 'c_name': 'hostile null-segment',
         'c_nationkey': 0, 'c_acctbal': 100.0, 'c_mktsegment': None},
        {'c_custkey': ck + 2, 'c_name': 'hostile empty-segment',
         'c_nationkey': 1, 'c_acctbal': 200.0, 'c_mktsegment': ''},
        {'c_custkey': ck + 3, 'c_name': 'hostile null-balance',
         'c_nationkey': 2, 'c_acctbal': None, 'c_mktsegment': 'BUILDING'},
        # J: FK break — nationkey 96 exists in no nation row
        {'c_custkey': ck + 4, 'c_name': 'hostile broken-fk \tüñí',
         'c_nationkey': 96, 'c_acctbal': -1.5, 'c_mktsegment': 'BUILDING'},
    ], cust.schema)])
    write(out, 'customer', cust)

    # ---------------- supplier --------------------------------------
    sup = read(base, 'supplier')
    sk = pa.compute.max(sup['s_suppkey']).as_py()
    sup = pa.concat_tables([sup, rows_to_table([
        {'s_suppkey': sk + 1, 's_name': 'hostile null-bal',
         's_nationkey': 0, 's_acctbal': None},
        # B: exact acctbal tie with an existing supplier is likely;
        # make one certain by duplicating a round value twice
        {'s_suppkey': sk + 2, 's_name': 'hostile tie-a',
         's_nationkey': 1, 's_acctbal': 5000.0},
        {'s_suppkey': sk + 3, 's_name': 'hostile tie-b',
         's_nationkey': 2, 's_acctbal': 5000.0},
    ], sup.schema)])
    write(out, 'supplier', sup)

    # ---------------- part ------------------------------------------
    part = read(base, 'part')
    pk = pa.compute.max(part['p_partkey']).as_py()
    part = pa.concat_tables([part, rows_to_table([
        {'p_partkey': pk + 1, 'p_name': 'hostile null-brand',
         'p_brand': None, 'p_type': 'TYPE#1', 'p_size': 1,
         'p_retailprice': 10.0},
        {'p_partkey': pk + 2, 'p_name': 'hostile empty-type',
         'p_brand': 'Brand#1', 'p_type': '', 'p_size': 0,
         'p_retailprice': 10.0},
        # B: retail price tie pair on the rounding boundary
        {'p_partkey': pk + 3, 'p_name': 'hostile tie-price-a',
         'p_brand': 'Brand#2', 'p_type': 'TYPE#2', 'p_size': 2,
         'p_retailprice': 99.99995},
        {'p_partkey': pk + 4, 'p_name': 'hostile tie-price-b',
         'p_brand': 'Brand#2', 'p_type': 'TYPE#2', 'p_size': 2,
         'p_retailprice': 99.99995},
    ], part.schema)])
    write(out, 'part', part)

    # ---------------- orders ----------------------------------------
    orders = read(base, 'orders')
    ok = pa.compute.max(orders['o_orderkey']).as_py()
    od = ts('2024-02-01T00:00:00')
    orders = pa.concat_tables([orders, rows_to_table([
        # J: NULL join key; K: NULL priority, empty status
        {'o_orderkey': ok + 1, 'o_custkey': None, 'o_orderstatus': 'O',
         'o_totalprice': 1234.56, 'o_orderdate': od,
         'o_orderpriority': None},
        {'o_orderkey': ok + 2, 'o_custkey': 0, 'o_orderstatus': '',
         'o_totalprice': 2345.67, 'o_orderdate': od,
         'o_orderpriority': '1-URGENT'},
        # J: an order with NO lineitems (left-join unmatched side)
        {'o_orderkey': ok + 3, 'o_custkey': 1, 'o_orderstatus': 'F',
         'o_totalprice': 10.0, 'o_orderdate': od,
         'o_orderpriority': '2-HIGH'},
        # B: exact totalprice tie pair, same date (ranking ties)
        {'o_orderkey': ok + 4, 'o_custkey': 2, 'o_orderstatus': 'O',
         'o_totalprice': 77777.77, 'o_orderdate': od,
         'o_orderpriority': '3-MEDIUM'},
        {'o_orderkey': ok + 5, 'o_custkey': 3, 'o_orderstatus': 'O',
         'o_totalprice': 77777.77, 'o_orderdate': od,
         'o_orderpriority': '3-MEDIUM'},
    ], orders.schema)])
    write(out, 'orders', orders)

    # ---------------- lineitem --------------------------------------
    li = read(base, 'lineitem')
    sd = ts('2024-02-02T00:00:00')
    hostile_li = []
    # K: NULL flag/status rows attached to the tie orders (W: all on
    # one duplicated shipdate); B: rounding-boundary quantities
    for i, (flag, status, qty) in enumerate([
            (None, 'O', 1.0), (None, None, 2.0), ('', 'F', 3.0),
            ('N', None, 12.34565), ('R', 'F', 12.34565)]):
        hostile_li.append({
            'l_orderkey': ok + 4, 'l_partkey': pk + 3, 'l_suppkey': sk + 2,
            'l_linenumber': i + 1, 'l_quantity': qty,
            'l_extendedprice': 5000.5, 'l_discount': 0.05, 'l_tax': 0.0,
            'l_returnflag': flag, 'l_linestatus': status,
            'l_shipdate': sd})
    # V: a single-lineitem order with zero discount/tax
    hostile_li.append({
        'l_orderkey': ok + 5, 'l_partkey': pk + 4, 'l_suppkey': sk + 3,
        'l_linenumber': 1, 'l_quantity': 50.0, 'l_extendedprice': 9999.99,
        'l_discount': 0.0, 'l_tax': 0.0, 'l_returnflag': 'A',
        'l_linestatus': 'F', 'l_shipdate': sd})
    li = pa.concat_tables([li, rows_to_table(hostile_li, li.schema)])
    write(out, 'lineitem', li, extra_empty_group=True)

    # ---------------- events ----------------------------------------
    ev = read(base, 'events')
    ek = pa.compute.max(ev['event_id']).as_py()
    # W: duplicate (user_id, ts) — reuse user 8's FIRST event ts so the
    # tie sits mid-stream of a real series
    t0 = ev['ts'][0].as_py()
    hostile_ev = [
        {'event_id': ek + 1, 'ts': t0, 'user_id': 8, 'event_type': 'click',
         'value': 10.0, 'props': '{"k": 1}'},
        {'event_id': ek + 2, 'ts': t0, 'user_id': 8, 'event_type': 'view',
         'value': 20.0, 'props': '{"k": 2}'},
        {'event_id': ek + 3, 'ts': t0, 'user_id': 8, 'event_type': 'click',
         'value': 30.0, 'props': '{"k": 3}'},
        # K/P: NULL and empty event types; hostile props payloads
        {'event_id': ek + 4, 'ts': ts('2024-01-15T12:00:00'), 'user_id': 7,
         'event_type': None, 'value': 5.0, 'props': '{"k": 7}'},
        {'event_id': ek + 5, 'ts': ts('2024-01-15T12:00:01'), 'user_id': 7,
         'event_type': '', 'value': 6.0, 'props': '{"k": 8}'},
        {'event_id': ek + 6, 'ts': ts('2024-01-15T12:00:02'), 'user_id': 7,
         'event_type': 'click', 'value': None, 'props': None},
        {'event_id': ek + 7, 'ts': ts('2024-01-15T12:00:03'), 'user_id': 7,
         'event_type': 'click', 'value': 7.0, 'props': '{}'},
        {'event_id': ek + 8, 'ts': ts('2024-01-15T12:00:04'), 'user_id': 7,
         'event_type': 'click', 'value': 8.0, 'props': '{"k": null}'},
        {'event_id': ek + 9, 'ts': ts('2024-01-15T12:00:05'), 'user_id': 7,
         'event_type': 'click', 'value': 9.0, 'props': '{k:'},
        {'event_id': ek + 10, 'ts': ts('2024-01-15T12:00:06'), 'user_id': 7,
         'event_type': 'click', 'value': 10.0, 'props': '{"k": "xx"}'},
        # W: exact midnight (day-bucket boundary)
        {'event_id': ek + 11, 'ts': ts('2024-01-16T00:00:00'), 'user_id': 7,
         'event_type': 'view', 'value': 11.0, 'props': '{"k": 11}'},
        # T/K (wave 3): event types that stress CSV/JSON quoting and
        # every group key — embedded comma, quote, newline, unicode
        {'event_id': ek + 18, 'ts': ts('2024-01-19T00:00:01'), 'user_id': 6,
         'event_type': 'comma,type', 'value': 1.0, 'props': '{"k": 1}'},
        {'event_id': ek + 19, 'ts': ts('2024-01-19T00:00:02'), 'user_id': 6,
         'event_type': 'quote"type', 'value': 2.0, 'props': '{"k": 2}'},
        {'event_id': ek + 20, 'ts': ts('2024-01-19T00:00:03'), 'user_id': 6,
         'event_type': 'multi\nline', 'value': 3.0, 'props': '{"k": 3}'},
        {'event_id': ek + 21, 'ts': ts('2024-01-19T00:00:04'), 'user_id': 6,
         'event_type': 'sémi;colon', 'value': 4.0, 'props': '{"k": "a\\"b"}'},
        # P (wave 4, ADVICE r18): FRACTIONAL / scientific / overflow k —
        # Spark try_cast('3.7' AS INT) -> NULL but DuckDB TRY_CAST
        # ROUNDS ('3.7'->4, '-2.5'->-3); both engines now share an
        # integral-string regex gate, and these rows pin it
        {'event_id': ek + 22, 'ts': ts('2024-01-19T00:00:05'), 'user_id': 6,
         'event_type': 'click', 'value': 5.0, 'props': '{"k": 3.7}'},
        {'event_id': ek + 23, 'ts': ts('2024-01-19T00:00:06'), 'user_id': 6,
         'event_type': 'click', 'value': 6.0, 'props': '{"k": -2.5}'},
        {'event_id': ek + 24, 'ts': ts('2024-01-19T00:00:07'), 'user_id': 6,
         'event_type': 'click', 'value': 7.0, 'props': '{"k": 1e3}'},
        {'event_id': ek + 25, 'ts': ts('2024-01-19T00:00:08'), 'user_id': 6,
         'event_type': 'click', 'value': 8.0,
         'props': '{"k": 99999999999999999999}'},
        # K (r21, verdict ask #3): NULL-typed group with >= 2 non-NULL
        # values in BOTH month halves — with only ek+4 the halfMoments
        # NULL hazard (Spark's conditional aggregate keeping a NULL
        # event_type group the oracle's inner join drops) was never
        # exercised: the n>=2-per-arm consumer filters hid it. These
        # three rows complete the twin (first half: ek+4 + ek+26;
        # second half: ek+27 + ek+28), so q_ab_test/q_power_analysis
        # diverge on this fixture iff the explicit isNotNull guard is
        # ever lost.
        # values cluster near 7 so the NULL group's element-valued GK
        # median (Spark percentile_approx) stays inside q_approx_sketch's
        # 5% band around the interpolated exact median on both engines —
        # the first cut (6.5/7.5/8.5) landed the even-cardinality group
        # exactly on the element-vs-interpolation disagreement point
        {'event_id': ek + 26, 'ts': ts('2024-01-15T12:00:07'), 'user_id': 7,
         'event_type': None, 'value': 6.9, 'props': '{"k": 26}'},
        {'event_id': ek + 27, 'ts': ts('2024-01-19T06:00:00'), 'user_id': 6,
         'event_type': None, 'value': 7.1, 'props': '{"k": 27}'},
        {'event_id': ek + 28, 'ts': ts('2024-01-19T06:00:01'), 'user_id': 6,
         'event_type': None, 'value': 7.3, 'props': '{"k": 28}'},
    ]
    # V: zero-variance user (5 identical values), single-event user
    for i in range(5):
        hostile_ev.append({
            'event_id': ek + 12 + i, 'ts': ts(f'2024-01-17T0{i}:00:00'),
            'user_id': 901, 'event_type': 'view', 'value': 42.0,
            'props': '{"k": 42}'})
    hostile_ev.append({
        'event_id': ek + 17, 'ts': ts('2024-01-18T00:00:00'),
        'user_id': 902, 'event_type': 'purchase', 'value': 3.14,
        'props': '{"k": 3}'})
    ev = pa.concat_tables([ev, rows_to_table(hostile_ev, ev.schema)])
    write(out, 'events', ev)

    # ---------------- documents -------------------------------------
    docs = read(base, 'documents').to_pylist()
    # T: mutate docs INSIDE the doc_id<20 slice the bounded queries read
    mut = {
        3: '\tfoo bar\n',
        7: '',
        11: '   ',
        13: 'héllo wörld 中文 🙂 café-au-lait naïve',
        17: 'one\x0btwo\x0b three',
    }
    for d in docs:
        if d['doc_id'] in mut:
            d['text'] = mut[d['doc_id']]
            d['n_chars'] = len(mut[d['doc_id']])
    dk = max(d['doc_id'] for d in docs)
    base_text = docs[0]['text']

    def doc(i, text, lang='en', source='src_hostile', n_chars=None):
        return {'doc_id': dk + i, 'text': text, 'lang': lang,
                'source': source,
                'n_chars': (len(text) if text is not None else None)
                if n_chars is None else n_chars}

    hostile_docs = [
        doc(1, None, lang='en'),                       # NULL text
        doc(2, 'dup dup dup exact pair', source='src_dup'),
        doc(3, 'dup dup dup exact pair', source='src_dup'),
        doc(4, base_text + ' tail', source='src_dup'),  # near-dup of doc 0
        doc(5, 'x', lang='xx', source='src_solo'),      # single-token, solo lang
        doc(6, ('spam ' * 400).strip(), source='src_const'),
        doc(7, 'same words here', source='src_const'),
        doc(8, 'same words here', source='src_const'),
        doc(9, 'contact a@b.co https://x.io/a\tnow (555) 123-4567 10.0.0.1',
            source='src_pii'),
        doc(10, 'a\r\nb crlf line', lang=None),         # NULL lang
        doc(11, 'a\u00a0b nbsp pair', lang=''),         # empty lang
        doc(12, '42 !!! *** 7 @@@', source=None),       # NULL source
    ]
    docs_tbl = rows_to_table(docs + hostile_docs, read(base, 'documents').schema)
    write(out, 'documents', docs_tbl, extra_empty_group=True)

    # ---------------- embeddings ------------------------------------
    emb = read(base, 'embeddings')
    vk = pa.compute.max(emb['vec_id']).as_py()
    dim = len(emb['embedding'][0])
    v0 = emb['embedding'][0].as_py()
    ones = [1.0 / (dim ** 0.5)] * dim
    emb = pa.concat_tables([emb, rows_to_table([
        # E: zero vector (norm 0), exact duplicate of vec 0, and a
        # mutually-identical pair (top-k distance ties)
        {'vec_id': vk + 1, 'embedding': [0.0] * dim, 'label': 0},
        {'vec_id': vk + 2, 'embedding': v0, 'label': 1},
        {'vec_id': vk + 3, 'embedding': ones, 'label': 2},
        {'vec_id': vk + 4, 'embedding': ones, 'label': 2},
        # E: NULL embedding + NULL label (wave 2, r18): must be excluded
        # by every fit/encode path and read NULL cos everywhere else
        {'vec_id': vk + 5, 'embedding': None, 'label': None},
    ], emb.schema)])
    write(out, 'embeddings', emb)

    print('hostile twin complete:', out)


if __name__ == '__main__':
    b = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    o = sys.argv[2] if len(sys.argv) > 2 else '/tmp/hostile'
    main(b, o)
