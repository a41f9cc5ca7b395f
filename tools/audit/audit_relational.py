"""Independent-reference audit of Relational + MlQueries' relational
surface (round 17). Pure pandas re-implementations off the TPC-H-ish
fixture tables; SCD2 expectations re-derived from the merge semantics.
"""
import numpy as np
import pandas as pd
from common import Audit, events, table, rnd, cents

a = Audit('Relational')
li = table('lineitem')
orders = table('orders')
cust = table('customer')
part = table('part')
supp = table('supplier')
nation = table('nation')
region = table('region')

T = pd.Timestamp

# ---- q1 pricing summary ----
g = li.assign(disc_price=li.l_extendedprice * (1 - li.l_discount),
              dc=np.floor(li.l_discount * 100 + 0.5).astype('int64')) \
    .groupby(['l_returnflag', 'l_linestatus']) \
    .agg(sum_qty=('l_quantity', 'sum'),
         sum_base_price=('l_extendedprice', 'sum'),
         sum_disc_price=('disc_price', 'sum'),
         avg_qty=('l_quantity', 'mean'),
         sdc=('dc', 'sum'), n=('dc', 'size')).reset_index()
g['avg_disc'] = g.sdc / (g.n * 100.0)
a.check('q1_pricing_summary',
        g.assign(count_order=g.n)[['l_returnflag', 'l_linestatus', 'sum_qty',
                                   'sum_base_price', 'sum_disc_price',
                                   'avg_qty', 'avg_disc', 'count_order']],
        keys=['l_returnflag', 'l_linestatus'],
        float_round={'sum_qty': 2, 'sum_base_price': 2, 'sum_disc_price': 4,
                     'avg_qty': 4, 'avg_disc': 4})

# ---- projections / filters ----
p = li[li.l_shipdate < T('1999-06-01')]
a.check('q_projection',
        p[['l_orderkey', 'l_linenumber', 'l_extendedprice']],
        keys=['l_orderkey', 'l_linenumber'], float_exact=('l_extendedprice',))

d = li[li.l_orderkey < 500]
a.check('q_derived',
        pd.DataFrame({'l_orderkey': d.l_orderkey,
                      'l_linenumber': d.l_linenumber,
                      'revenue': d.l_extendedprice * (1 - d.l_discount),
                      'charge': d.l_extendedprice * (1 - d.l_discount)
                      * (1 + d.l_tax),
                      'gross': d.l_quantity * d.l_extendedprice}),
        keys=['l_orderkey', 'l_linenumber'],
        float_round={'revenue': 4, 'charge': 6, 'gross': 2})

cr = li[li.l_orderkey < 200]
a.check('q_cast_rename',
        pd.DataFrame({'order_id': cr.l_orderkey,
                      'line_no': cr.l_linenumber.astype('int64'),
                      'qty_int': np.floor(cr.l_quantity).astype('int32'),
                      'flag': cr.l_returnflag}),
        keys=['order_id', 'line_no'])

fc = li[(li.l_quantity > 45) & (li.l_returnflag != 'N') &
        li.l_discount.notna() &
        (li.l_shipdate >= T('1999-01-01')) & (li.l_shipdate <= T('2000-01-01'))]
a.check('q_filter_compound',
        fc[['l_orderkey', 'l_linenumber', 'l_quantity', 'l_returnflag']],
        keys=['l_orderkey', 'l_linenumber'], float_exact=('l_quantity',))

fi = cust[cust.c_mktsegment.isin(['BUILDING', 'AUTOMOBILE']) &
          (cust.c_acctbal > 9000)]
a.check('q_filter_isin', fi[['c_custkey', 'c_name', 'c_mktsegment']],
        keys=['c_custkey'])

nh = li.l_discount.where(li.l_discount != 0.0, -1.0)
a.check('q_null_handling',
        nh.value_counts().rename_axis('d').reset_index(name='cnt'),
        keys=['d'], float_exact=('d',))

# ---- joins ----
jl = orders[orders.o_totalprice > 490000].merge(
    cust, left_on='o_custkey', right_on='c_custkey', how='left')
a.check('q_join_left',
        jl[['o_orderkey', 'o_totalprice', 'c_name', 'c_mktsegment']],
        keys=['o_orderkey'], float_exact=('o_totalprice',))

jb = li.merge(part, left_on='l_partkey', right_on='p_partkey')
jb['rev'] = jb.l_extendedprice * (1 - jb.l_discount)
jbg = jb.groupby('p_brand').agg(revenue=('rev', 'sum'),
                                n_items=('rev', 'size')).reset_index()
a.check('q_join_broadcast', jbg, keys=['p_brand'],
        float_round={'revenue': 4})

big = set(orders[orders.o_totalprice > 400000].o_custkey)
a.check('q_join_semi',
        cust[cust.c_custkey.isin(big)][['c_custkey', 'c_name']],
        keys=['c_custkey'])
big45 = set(orders[orders.o_totalprice > 450000].o_custkey)
a.check('q_join_anti',
        cust[~cust.c_custkey.isin(big45)][['c_custkey', 'c_name']],
        keys=['c_custkey'])

js = li.merge(orders, left_on='l_orderkey', right_on='o_orderkey') \
    .merge(cust, left_on='o_custkey', right_on='c_custkey') \
    .merge(nation, left_on='c_nationkey', right_on='n_nationkey') \
    .merge(region, left_on='n_regionkey', right_on='r_regionkey')
js['rev'] = js.l_extendedprice * (1 - js.l_discount)
jsg = js.groupby(['r_name', 'n_name']).agg(
    revenue=('rev', 'sum'), n_items=('rev', 'size')).reset_index()
a.check('q_join_star', jsg, keys=['r_name', 'n_name'],
        float_round={'revenue': 4})

# ---- sorts / pagination ----
tk = orders.sort_values(['o_totalprice', 'o_orderkey'],
                        ascending=[False, True]).head(10)
a.check('q_topk', tk[['o_orderkey', 'o_custkey', 'o_totalprice']],
        keys=['o_orderkey'], float_exact=('o_totalprice',))

pg = cust.sort_values(['c_acctbal', 'c_custkey'],
                      ascending=[False, True]).reset_index(drop=True)
pg['rn'] = (pg.index + 1).astype('int32')
page = pg[(pg.rn >= 21) & (pg.rn <= 30)]
ref_page = page[['c_custkey', 'c_name', 'c_acctbal', 'rn']]
a.check('q_pagination', ref_page, keys=['rn'], float_exact=('c_acctbal',))
a.check('q_pagination_chunked', ref_page, keys=['rn'],
        float_exact=('c_acctbal',))

kp = orders[orders.o_orderkey > 1000].sort_values('o_orderkey').head(20)
a.check('q_keyset_page', kp[['o_orderkey', 'o_custkey', 'o_totalprice']],
        keys=['o_orderkey'], float_exact=('o_totalprice',))

# ---- upsert latest (events) ----
e = events()
ul = e.sort_values(['user_id', 'tns', 'event_id']) \
    .groupby('user_id').tail(1)
a.check('q_upsert_latest',
        pd.DataFrame({'user_id': ul.user_id, 'last_event_id': ul.event_id,
                      'last_value': ul.value}),
        keys=['user_id'], float_exact=('last_value',))

# ---- SCD2 merge (expected history from the merge semantics) ----
b = cust[['c_custkey', 'c_name', 'c_mktsegment', 'c_nationkey']]
d0, d1 = pd.Timestamp('2024-01-01').date(), pd.Timestamp('2024-06-01').date()
upd = b.c_custkey % 10 == 3
parts = [
    b[~upd].assign(valid_from=d0, valid_to=None, is_current=True),
    b[upd].assign(valid_from=d0, valid_to=d1, is_current=False),
    b[upd].assign(c_mktsegment='RELOCATED',
                  c_nationkey=((b[upd].c_nationkey + 1) % 25).astype('int32'),
                  valid_from=d1, valid_to=None, is_current=True),
    b[b.c_custkey % 100 == 7].assign(
        c_custkey=b[b.c_custkey % 100 == 7].c_custkey + 9000000,
        c_mktsegment='FOUNDED', valid_from=d1, valid_to=None,
        is_current=True),
]
scd = pd.concat(parts, ignore_index=True)
a.check('q_scd2_merge', scd, keys=['c_custkey', 'valid_from'])

# ---- point-in-time join ----
v1 = cust[['c_custkey', 'c_mktsegment']].copy()
v1['valid_from'] = pd.Timestamp('1992-01-01').date()
v1['valid_to'] = np.where(cust.c_custkey % 10 == 3,
                          pd.Timestamp('1995-06-01').date(), None)
v2 = cust[cust.c_custkey % 10 == 3][['c_custkey']].copy()
v2['c_mktsegment'] = 'RELOCATED'
v2['valid_from'] = pd.Timestamp('1995-06-01').date()
v2['valid_to'] = None
hist = pd.concat([v1, v2], ignore_index=True)
f = orders[['o_orderkey', 'o_custkey', 'o_orderdate']].copy()
f['o_day'] = f.o_orderdate.dt.date
pj = f.merge(hist, left_on='o_custkey', right_on='c_custkey', how='left')
keep = (pd.to_datetime(pj.valid_from) <= pd.to_datetime(pj.o_day)) & \
    (pj.valid_to.isna() | (pd.to_datetime(pj.o_day) <
                           pd.to_datetime(pj.valid_to)))
pj = pj[keep]
a.check('q_pit_join',
        pd.DataFrame({'o_orderkey': pj.o_orderkey, 'c_custkey': pj.o_custkey,
                      'o_day': pj.o_day,
                      'seg_at_order': pj.c_mktsegment}),
        keys=['o_orderkey'])

# ---- distinct / group count / rollup ----
a.check('q_distinct',
        orders[['o_orderstatus', 'o_orderpriority']].drop_duplicates(),
        keys=['o_orderstatus', 'o_orderpriority'])
a.check('q_group_count',
        orders.groupby('o_orderpriority').size().reset_index(name='cnt'),
        keys=['o_orderpriority'])

rparts = []
full = li.groupby(['l_returnflag', 'l_linestatus']).agg(
    sum_qty=('l_quantity', 'sum'), cnt=('l_quantity', 'size')).reset_index()
rparts.append(full.rename(columns={'l_returnflag': 'flag',
                                   'l_linestatus': 'status'}))
sub = li.groupby('l_returnflag').agg(
    sum_qty=('l_quantity', 'sum'), cnt=('l_quantity', 'size')).reset_index()
sub['status'] = 'ALL'
rparts.append(sub.rename(columns={'l_returnflag': 'flag'}))
rparts.append(pd.DataFrame({'flag': ['ALL'], 'status': ['ALL'],
                            'sum_qty': [li.l_quantity.sum()],
                            'cnt': [len(li)]}))
roll = pd.concat(rparts, ignore_index=True)
a.check('q_rollup', roll[['flag', 'status', 'sum_qty', 'cnt']],
        keys=['flag', 'status'], float_round={'sum_qty': 2})

# ---- set ops ----
un = sorted(set(cust[cust.c_mktsegment == 'BUILDING'].c_custkey) |
            set(orders[orders.o_totalprice > 450000].o_custkey))
a.check('q_union', pd.DataFrame({'c_custkey': un}), keys=['c_custkey'])
iv = sorted(set(cust[cust.c_mktsegment == 'MACHINERY'].c_custkey) &
            set(orders[orders.o_totalprice > 300000].o_custkey))
a.check('q_intersect', pd.DataFrame({'c_custkey': iv}), keys=['c_custkey'])
ev = sorted(set(cust[cust.c_acctbal > 9500].c_custkey) -
            set(orders[orders.o_totalprice > 350000].o_custkey))
a.check('q_except', pd.DataFrame({'c_custkey': ev}), keys=['c_custkey'])

# ---- null audit / temporal split ----
na = pd.DataFrame([{c: int(orders[c].isna().sum()) for c in orders.columns}])
a.check('q_null_audit', na, keys=[orders.columns[0]])

cutoff = orders.o_orderdate.max() - pd.Timedelta(days=14)
sp = orders.assign(split=np.where(orders.o_orderdate < cutoff,
                                  'train', 'test'))
spg = sp.groupby('split').agg(cnt=('o_orderdate', 'size'),
                              min_d=('o_orderdate', 'min'),
                              max_d=('o_orderdate', 'max')).reset_index()
spg['min_d'] = spg.min_d.dt.date
spg['max_d'] = spg.max_d.dt.date
a.check('q_temporal_split', spg, keys=['split'])

# ---- skew join (== plain join on the power-law key) ----
pur = e[e.event_type == 'purchase'][['event_id', 'user_id', 'value']]
sgn = e[e.event_type == 'signup'].groupby('user_id').size() \
    .reset_index(name='n_signups')
sj = pur.merge(sgn, on='user_id')
a.check('q_skew_join', sj[['event_id', 'user_id', 'value', 'n_signups']],
        keys=['event_id'], float_exact=('value',))

# ---- q3 shipping priority ----
rev4 = (np.floor(li.l_extendedprice * 100 + 0.5).astype('int64') *
        (100 - np.floor(li.l_discount * 100 + 0.5).astype('int64')))
li3 = li.assign(rev4=rev4)[li.l_shipdate > T('1997-01-01')]
o3 = orders[orders.o_orderdate < T('1997-01-01')]
c3 = cust[cust.c_mktsegment == 'BUILDING'][['c_custkey']]
j3 = li3.merge(o3, left_on='l_orderkey', right_on='o_orderkey') \
    .merge(c3, left_on='o_custkey', right_on='c_custkey')
j3['order_date'] = j3.o_orderdate.dt.date
g3 = j3.groupby(['l_orderkey', 'order_date', 'o_orderpriority']) \
    .rev4.sum().reset_index()
g3['revenue'] = rnd(g3.rev4 / 10000.0, 2)
g3 = g3.sort_values(['revenue', 'order_date', 'l_orderkey'],
                    ascending=[False, True, True]).head(10)
a.check('q3_shipping_priority',
        g3[['l_orderkey', 'order_date', 'o_orderpriority', 'revenue']],
        keys=['l_orderkey'], float_round={'revenue': 2})

# ---- q5 local supplier ----
nat5 = nation.merge(region[region.r_name == 'ASIA'],
                    left_on='n_regionkey', right_on='r_regionkey')
sup5 = supp.merge(nat5, left_on='s_nationkey', right_on='n_nationkey')
o5 = orders[(orders.o_orderdate >= T('1996-01-01')) &
            (orders.o_orderdate < T('1997-01-01'))]
j5 = li.assign(rev4=rev4) \
    .merge(o5[['o_orderkey', 'o_custkey']], left_on='l_orderkey',
           right_on='o_orderkey') \
    .merge(sup5[['s_suppkey', 's_nationkey', 'n_name']],
           left_on='l_suppkey', right_on='s_suppkey') \
    .merge(cust[['c_custkey', 'c_nationkey']], left_on='o_custkey',
           right_on='c_custkey')
j5 = j5[j5.c_nationkey == j5.s_nationkey]
g5 = j5.groupby('n_name').rev4.sum().reset_index()
g5['revenue'] = g5.rev4 / 10000.0
a.check('q5_local_supplier', g5[['n_name', 'revenue']], keys=['n_name'],
        float_round={'revenue': 2})

# ---- q_ml_whitelist (MlQueries' relational surface) ----
mcut = e.tns.max() - 7 * 86_400_000_000_000
train_users = set(e[e.tns < mcut].user_id)
wl = e[(e.tns >= mcut) & e.user_id.isin(train_users)] \
    .groupby('user_id').size().reset_index(name='n_events')
a.check('q_ml_whitelist', wl, keys=['user_id'])

import sys
sys.exit(1 if a.summary() else 0)
