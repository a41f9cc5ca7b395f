"""Independent-reference audit of TimeSeriesQueries (round 17).

Every statistic recomputed from scratch with pandas/numpy off the
fixture parquet (pandas IS the independent implementation for the
operators whose Scaladoc names a pandas equivalent), compared
cell-exact against the engine's Verify dump at sf0.01.
"""
import json
import numpy as np
import pandas as pd
from common import Audit, events, rnd, cents, day_of, dump

HOUR_NS = 3_600_000_000_000
a = Audit('TimeSeriesQueries')

e = events()
# the shared per-user window order: (ts, event_id)
eu = e.sort_values(['user_id', 'tns', 'event_id']).reset_index(drop=True)
eu['c'] = cents(eu.value)


def per_user(col_fn):
    """Apply col_fn per user group (ordered) and return a flat Series."""
    return eu.groupby('user_id', group_keys=False).apply(col_fn)


def frame_stat(vals, frm, to, fn):
    """Row-frame statistic over [i+frm, i+to] for each i (NaN if empty)."""
    n = len(vals)
    out = np.full(n, np.nan)
    arr = np.asarray(vals, dtype='float64')
    for i in range(n):
        lo, hi = max(0, i + frm), min(n - 1, i + to)
        if i + to < 0 or lo > hi:
            continue
        out[i] = fn(arr[lo:hi + 1])
    return out


def sma_cents(carr, frm, to):
    return frame_stat(carr, frm, to, lambda s: s.sum() / (len(s) * 100.0))


def by_user(fn):
    """fn(group_df) -> array aligned with group; returns full-length array."""
    parts = []
    for _, g in eu.groupby('user_id', sort=False):
        parts.append(pd.Series(fn(g), index=g.index))
    return pd.concat(parts).sort_index().to_numpy()


# ---- W1/W2 lag & lead ----
lag1 = by_user(lambda g: g.value.shift(1).to_numpy())
lag3 = by_user(lambda g: g.value.shift(3).to_numpy())
lag5 = by_user(lambda g: g.value.shift(5).to_numpy())
nxt = by_user(lambda g: g.value.shift(-1).to_numpy())
a.check('q_lag_lead',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'value': eu.value, 'lag1': lag1, 'lag3': lag3,
                      'lag5': lag5, 'next_value': nxt}),
        keys=['user_id', 'event_id'],
        float_exact=('value', 'lag1', 'lag3', 'lag5', 'next_value'))

# ---- W3 rolling means (cents-exact) ----
ma5 = by_user(lambda g: sma_cents(g.c.to_numpy(), -5, -1))
ma20 = by_user(lambda g: sma_cents(g.c.to_numpy(), -20, -1))
a.check('q_rolling_mean',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'ma5': ma5, 'ma20': ma20}),
        keys=['user_id', 'event_id'], float_round={'ma5': 4, 'ma20': 4})

# ---- W4 rolling sample stddev (pandas ddof=1 over [-14,-1]) ----
vol = by_user(lambda g: g.value.shift(1).rolling(14, min_periods=1)
              .std(ddof=1).to_numpy())
a.check('q_rolling_std',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'volatility14': vol}),
        keys=['user_id', 'event_id'], float_round={'volatility14': 4})


# ---- W5 RSI-14 (current row excluded, +1e-6 guard) ----
def rsi_of(g):
    d = g.value.diff().to_numpy()
    gain = np.where(np.nan_to_num(d) > 0, np.floor(d * 100 + 0.5), 0.0)
    loss = np.where(np.nan_to_num(d) < 0, np.floor(-d * 100 + 0.5), 0.0)
    n = len(d)
    out = np.full(n, np.nan)
    cg = np.concatenate([[0.0], np.cumsum(gain)])
    cl = np.concatenate([[0.0], np.cumsum(loss)])
    for i in range(n):
        lo, hi = max(0, i - 14), i - 1
        if hi < lo:
            continue
        k = hi - lo + 1
        ag = (cg[hi + 1] - cg[lo]) / (k * 100.0)
        al = (cl[hi + 1] - cl[lo]) / (k * 100.0)
        out[i] = 100.0 - 100.0 / (1.0 + ag / (al + 1e-6))
    return out


rsi = by_user(rsi_of)
a.check('q_rsi',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'rsi14': rsi}),
        keys=['user_id', 'event_id'], float_round={'rsi14': 4})

# ---- W6 momentum ----
mom3 = eu.value.to_numpy() - by_user(lambda g: g.value.shift(3).to_numpy())
lag5v = by_user(lambda g: g.value.shift(5).to_numpy())
mom5 = eu.value.to_numpy() / np.where(lag5v == 0, np.nan, lag5v) - 1.0
a.check('q_momentum',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'mom3': mom3, 'mom5_pct': mom5}),
        keys=['user_id', 'event_id'], float_round={'mom3': 2, 'mom5_pct': 4})

# ---- W7 spike flag ----
spike = np.where(eu.value.to_numpy() > 1.5 * ma5, 1, 0).astype('int32')
a.check('q_spike',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'spike': spike}),
        keys=['user_id', 'event_id'])

# ---- W8 MACD (SMA-as-EMA quirk: frames [-12,0] and [-26,0]) ----
sma12 = by_user(lambda g: sma_cents(g.c.to_numpy(), -12, 0))
sma26 = by_user(lambda g: sma_cents(g.c.to_numpy(), -26, 0))
a.check('q_macd',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'macd': sma12 - sma26}),
        keys=['user_id', 'event_id'], float_round={'macd': 4})

# ---- W9 forward fill ----
filled = by_user(lambda g: g.value.where(g.event_type != 'error')
                 .ffill().to_numpy())
a.check('q_ffill',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'filled': filled}),
        keys=['user_id', 'event_id'], float_exact=('filled',))

# ---- W10 global diff (and its chunk-stitched twin) ----
eg = e.sort_values(['tns', 'event_id']).reset_index(drop=True)
prev = eg.value.shift(1).to_numpy()
diff = eg.value.to_numpy() - prev
pct = diff / np.where(prev == 0, np.nan, prev) * 100.0
ref_diff = pd.DataFrame({'event_id': eg.event_id, 'diff': diff,
                         'pct_change': pct})
a.check('q_diff_global', ref_diff, keys=['event_id'],
        float_round={'diff': 2, 'pct_change': 4})
a.check('q_diff_chunked', ref_diff, keys=['event_id'],
        float_round={'diff': 2, 'pct_change': 4})

# ---- crossover ----
sig = np.where(ma5 > ma20, 1, 0)
prev_sig = by_user(lambda g: pd.Series(sig[g.index]).shift(1).to_numpy())
keep = ~np.isnan(prev_sig) & (sig != prev_sig)
a.check('q_crossover',
        pd.DataFrame({'event_id': eu.event_id[keep],
                      'user_id': eu.user_id[keep],
                      'signal': sig[keep].astype('int32')}),
        keys=['user_id', 'event_id'])

# ---- running sum + row number ----
cum = by_user(lambda g: g.value.cumsum().to_numpy())
rn = by_user(lambda g: np.arange(1, len(g) + 1))
a.check('q_running_sum',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'cum_value': cum, 'rn': rn.astype('int32')}),
        keys=['user_id', 'event_id'], float_round={'cum_value': 2})

# ---- ranked (total order => rank == dense_rank == row_number) ----
ev_rank = e.sort_values(['user_id', 'value', 'event_id'],
                        ascending=[True, False, True]).reset_index(drop=True)
ev_rank['rn'] = ev_rank.groupby('user_id').cumcount() + 1
top = ev_rank[ev_rank.rn <= 3]
a.check('q_ranked',
        pd.DataFrame({'event_id': top.event_id, 'user_id': top.user_id,
                      'value': top.value, 'rn': top.rn.astype('int32'),
                      'rk': top.rn.astype('int32'),
                      'drk': top.rn.astype('int32')}),
        keys=['user_id', 'rn'], float_exact=('value',))

# ---- global z-score anomalies (population stddev, cents-exact mean) ----
v = e.value.to_numpy()
mu = cents(v).sum() / (len(v) * 100.0)
sigma = float(np.sqrt(np.mean((v - np.mean(v)) ** 2)))
z = (v - mu) / sigma
zmask = np.abs(z) > 3
zs = e[zmask].copy()
zs['z'] = z[zmask]
a.check('q_zscore_anomaly',
        zs[['event_id', 'value', 'z']].assign(value=zs.value),
        keys=['event_id'], float_round={'z': 4}, float_exact=('value',))

ad = zs.copy()
ad['day'] = day_of(ad.tns)
a.check('q_anomaly_daily',
        ad.groupby('day').size().reset_index(name='n_anomalies'),
        keys=['day'])

# ---- threshold alert ----
prevv = by_user(lambda g: g.value.shift(1).to_numpy())
pctc = (eu.value.to_numpy() - prevv) / np.where(prevv == 0, np.nan, prevv) * 100
tmask = np.nan_to_num(pctc, nan=-np.inf) > 5
a.check('q_threshold_alert',
        pd.DataFrame({'event_id': eu.event_id[tmask],
                      'user_id': eu.user_id[tmask], 'pct': pctc[tmask]}),
        keys=['user_id', 'event_id'], float_round={'pct': 4})


# ---- salted rolling 1h range sum (== plain per-user range window) ----
def range_sum(g):
    t = g.tns.to_numpy()
    val = g.value.to_numpy()
    out = np.empty(len(t))
    lo = 0
    for i in range(len(t)):
        while t[lo] < t[i] - HOUR_NS:
            lo += 1
        # peers: rows AFTER i with the same ts are in the RANGE frame too
        hi = i
        while hi + 1 < len(t) and t[hi + 1] == t[i]:
            hi += 1
        out[i] = val[lo:hi + 1].sum()
    return out


rollsum = by_user(range_sum)
a.check('q_salted_rolling',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'rolling_sum': rollsum}),
        keys=['user_id', 'event_id'], float_round={'rolling_sum': 4})

# ---- event json ----
ks = e.props.map(lambda s: json.loads(s).get('k'))
ej = pd.DataFrame({'event_type': e.event_type, 'k': ks})
g = ej.groupby('event_type').agg(
    avg_k=('k', lambda s: s.dropna().sum() / s.dropna().count()),
    cnt=('k', 'size')).reset_index()
a.check('q_event_json', g, keys=['event_type'], float_round={'avg_k': 4})

# ---- ml features (user_id < 20) ----
m = eu.user_id.to_numpy() < 20
a.check('q_ml_features',
        pd.DataFrame({'event_id': eu.event_id[m], 'user_id': eu.user_id[m],
                      'value': eu.value[m], 'lag1': lag1[m], 'lag3': lag3[m],
                      'ma5': ma5[m], 'volatility14': vol[m],
                      'rsi14': rsi[m], 'mom3': mom3[m],
                      'macd': (sma12 - sma26)[m],
                      'spike': spike[m], 'next_value': nxt[m]}),
        keys=['user_id', 'event_id'],
        float_round={'ma5': 4, 'volatility14': 4, 'rsi14': 4, 'mom3': 2,
                     'macd': 4},
        float_exact=('value', 'lag1', 'lag3', 'next_value'))

# ---- OHLC hourly resample ----
eb = e.copy()
eb['b'] = eb.tns // HOUR_NS
eb['c'] = cents(eb.value)
eb = eb.sort_values(['event_type', 'b', 'tns', 'event_id'])
rows = []
for (et, b), g in eb.groupby(['event_type', 'b']):
    rows.append((et, b, g.value.iloc[0], g.value.max(), g.value.min(),
                 g.value.iloc[-1], len(g), g.c.sum() / 100.0))
ohlc = pd.DataFrame(rows, columns=['event_type', 'bucket_hour', 'open',
                                   'high', 'low', 'close', 'n_events',
                                   'volume'])
a.check('q_ohlc_resample', ohlc, keys=['event_type', 'bucket_hour'],
        float_round={'volume': 2},
        float_exact=('open', 'high', 'low', 'close'))

# ---- resample + ffill on the dense hourly spine ----
sp_rows = []
for et, g in ohlc.groupby('event_type'):
    spine = pd.DataFrame({'bucket_hour': np.arange(g.bucket_hour.min(),
                                                   g.bucket_hour.max() + 1)})
    j = spine.merge(g[['bucket_hour', 'close', 'n_events']], on='bucket_hour',
                    how='left')
    j['event_type'] = et
    j['n_events'] = j.n_events.fillna(0).astype('int64')
    j['close_ffill'] = j.close.ffill()
    sp_rows.append(j[['event_type', 'bucket_hour', 'n_events', 'close_ffill']])
a.check('q_resample_ffill', pd.concat(sp_rows, ignore_index=True),
        keys=['event_type', 'bucket_hour'], float_exact=('close_ffill',))

# ---- resample + linear time interpolation ----
it_rows = []
for et, g in ohlc.groupby('event_type'):
    spine = pd.DataFrame({'bucket_hour': np.arange(g.bucket_hour.min(),
                                                   g.bucket_hour.max() + 1)})
    j = spine.merge(g[['bucket_hour', 'close']], on='bucket_hour', how='left')
    obs = j.close.notna()
    b = j.bucket_hour.to_numpy(dtype='float64')
    ob = np.where(obs, b, np.nan)
    pv = j.close.ffill().to_numpy()
    pb = pd.Series(ob).ffill().to_numpy()
    nv = j.close.bfill().to_numpy()
    nb = pd.Series(ob).bfill().to_numpy()
    vi = np.where(obs, j.close.to_numpy(),
                  pv + (nv - pv) * ((b - pb) / (nb - pb)))
    it_rows.append(pd.DataFrame({'event_type': et, 'bucket_hour':
                                 j.bucket_hour, 'observed': obs,
                                 'value_interp': vi}))
a.check('q_interpolate', pd.concat(it_rows, ignore_index=True),
        keys=['event_type', 'bucket_hour'], float_round={'value_interp': 4})

# ---- seasonal (dow x hod) baseline ----
ts_us = pd.to_datetime(e.tns // 1000, unit='us')
sb = pd.DataFrame({'event_type': e.event_type, 'value': e.value,
                   'dow': ((ts_us.dt.weekday + 1) % 7 + 1).astype('int32'),
                   'hod': ts_us.dt.hour.astype('int32'),
                   'c': cents(e.value)})
grid = sb.groupby(['event_type', 'dow', 'hod']).agg(
    n=('c', 'size'), sumc=('c', 'sum'),
    sumsq=('c', lambda s: int((s.astype('int64') ** 2).sum()))).reset_index()
grid['mean_v'] = grid.sumc / grid.n / 100.0
nd = grid.n.astype('float64')
var = np.maximum(0.0, (nd * grid.sumsq - grid.sumc.astype('float64') ** 2) /
                 (nd * (nd - 1.0))) / 10000.0
grid['std_v'] = np.where(grid.n >= 2, np.sqrt(var), np.nan)
an = sb.merge(grid, on=['event_type', 'dow', 'hod'])
an = an[(an.n >= 2) & (an.std_v > 0.0) &
        (np.abs(an.value - an.mean_v) > 3.0 * an.std_v)]
anc = an.groupby(['event_type', 'dow', 'hod']).size().reset_index(
    name='n_anom')
sbo = grid.merge(anc, on=['event_type', 'dow', 'hod'], how='left')
a.check('q_seasonal_baseline',
        pd.DataFrame({'event_type': sbo.event_type, 'dow': sbo.dow,
                      'hod': sbo.hod, 'n': sbo.n,
                      'mean_value': sbo.mean_v, 'std_value': sbo.std_v,
                      'n_anomalies': sbo.n_anom.fillna(0).astype('int64')}),
        keys=['event_type', 'dow', 'hod'],
        float_round={'mean_value': 4, 'std_value': 4})

# ---- rolling 14-row median (pandas rolling median on cents) ----
med = by_user(lambda g: g.c.rolling(14, min_periods=1).median().to_numpy())
a.check('q_rolling_median',
        pd.DataFrame({'event_id': eu.event_id, 'user_id': eu.user_id,
                      'med14': med / 100.0}),
        keys=['user_id', 'event_id'], float_round={'med14': 4})

# ---- latency percentile bands (numpy linear interpolation) ----
lb = e.copy()
lb['day'] = day_of(lb.tns)
lb_rows = []
for (et, dy), g in lb.groupby(['event_type', 'day']):
    q = np.percentile(g.value.to_numpy(), [50, 95, 99],
                      method='linear')
    lb_rows.append((et, dy, len(g), q[0], q[1], q[2], g.value.max()))
a.check('q_latency_bands',
        pd.DataFrame(lb_rows, columns=['event_type', 'day', 'n', 'p50',
                                       'p95', 'p99', 'max_value']),
        keys=['event_type', 'day'],
        float_round={'p50': 4, 'p95': 4, 'p99': 4},
        float_exact=('max_value',))

# ---- market-basket lift over (user, day) baskets ----
bk = e.copy()
bk['day'] = day_of(bk.tns)
bask = bk[['user_id', 'day', 'event_type']].drop_duplicates()
nb = len(bask[['user_id', 'day']].drop_duplicates())
item = bask.groupby('event_type').size().to_dict()
pr = bask.merge(bask, on=['user_id', 'day'])
pr = pr[pr.event_type_x < pr.event_type_y]
pg = pr.groupby(['event_type_x', 'event_type_y']).size().reset_index(
    name='n_both')
a.check('q_lift_pairs',
        pd.DataFrame({'type_a': pg.event_type_x, 'type_b': pg.event_type_y,
                      'n_both': pg.n_both,
                      'support': pg.n_both / nb,
                      'confidence': pg.n_both /
                      pg.event_type_x.map(item),
                      'lift': pg.n_both * nb /
                      (pg.event_type_x.map(item) *
                       pg.event_type_y.map(item))}),
        keys=['type_a', 'type_b'],
        float_round={'support': 6, 'confidence': 6, 'lift': 6})

# ---- transition matrix + pagerank ----
tp = eu.copy()
tp['prev'] = by_user(lambda g: g.event_type.shift(1).to_numpy())
tc = tp[tp.prev.notna()].groupby(['prev', 'event_type']).size().reset_index(
    name='n').rename(columns={'event_type': 'next'})
tot = tc.groupby('prev').n.sum().to_dict()
a.check('q_transition_matrix',
        pd.DataFrame({'prev': tc.prev, 'next': tc['next'], 'n': tc.n,
                      'p': tc.n / tc.prev.map(tot)}),
        keys=['prev', 'next'], float_round={'p': 4})

nodes = sorted(set(tc.prev) | set(tc['next']))
score = {x: 1.0 / 5.0 for x in nodes}
edges = [(p, d, n / tot[p]) for p, d, n in
         zip(tc.prev, tc['next'], tc.n)]
for _ in range(3):
    mass = {x: 0.0 for x in nodes}
    for s, d, pw in edges:
        mass[d] += pw * score[s]
    score = {x: 0.15 / 5.0 + 0.85 * mass[x] for x in nodes}
a.check('q_pagerank',
        pd.DataFrame({'event_type': nodes,
                      'pagerank': [score[x] for x in nodes]}),
        keys=['event_type'], float_round={'pagerank': 6})

# ---- cohort retention ----
cr = e.copy()
cr['day'] = day_of(cr.tns)
first = cr.groupby('user_id').day.min().rename('cohort')
act = cr[['user_id', 'day']].drop_duplicates().join(first, on='user_id')
act['day_offset'] = (pd.to_datetime(act.day) -
                     pd.to_datetime(act.cohort)).dt.days.astype('int32')
ret = act.groupby(['cohort', 'day_offset']).size().reset_index(name='n_users')
a.check('q_cohort_retention', ret, keys=['cohort', 'day_offset'])

# ---- ordered funnel (click -> view -> purchase) ----
fu = e[['user_id', 'event_type', 'tns']]
s1 = fu[fu.event_type == 'click'].groupby('user_id').tns.min().rename('t1')
j2 = fu[fu.event_type == 'view'].join(s1, on='user_id', how='inner')
s2 = j2[j2.tns > j2.t1].groupby('user_id').tns.min().rename('t2')
j3 = fu[fu.event_type == 'purchase'].join(s2, on='user_id', how='inner')
s3 = j3[j3.tns > j3.t2].groupby('user_id').tns.min().rename('t3')
n1, n2, n3 = len(s1), len(s2), len(s3)
a.check('q_funnel_sequence',
        pd.DataFrame({'stage': np.array([1, 2, 3], dtype='int32'),
                      'name': ['click', 'view_after_click',
                               'purchase_after_view'],
                      'n': np.array([n1, n2, n3], dtype='int64'),
                      'conv_from_entry': np.array([n1, n2, n3]) / n1}),
        keys=['stage'], float_round={'conv_from_entry': 4})

# ---- time-bound funnel (signup -> click -> purchase, 7-day gap) ----
GAP = 7 * 86_400_000_000_000
t1 = fu[fu.event_type == 'signup'].groupby('user_id').tns.min().rename('t1')
k2 = fu[fu.event_type == 'click'].join(t1, on='user_id', how='inner')
t2 = k2[(k2.tns > k2.t1) & (k2.tns - k2.t1 <= GAP)] \
    .groupby('user_id').tns.min().rename('t2')
k3 = fu[fu.event_type == 'purchase'].join(t2, on='user_id', how='inner')
t3 = k3[(k3.tns > k3.t2) & (k3.tns - k3.t2 <= GAP)] \
    .groupby('user_id').tns.min().rename('t3')
a.check('q_funnel_timebound',
        pd.DataFrame({'stage': np.array([1, 2, 3], dtype='int32'),
                      'event_type': ['signup', 'click', 'purchase'],
                      'n_users': np.array([len(t1), len(t2), len(t3)],
                                          dtype='int64')}),
        keys=['stage'])

# ---- TWAP per (type, day) ----
tw = e.copy()
tw['day'] = day_of(tw.tns)
tw['c'] = cents(tw.value)
tw = tw.sort_values(['event_type', 'day', 'tns', 'event_id']) \
    .reset_index(drop=True)
# exact int64 next-row delta: a pandas shift() coerces int64 epoch
# nanos (~1.7e18 > 2^53) to float64, whose ulp is 256 ns — enough to
# flip ms-grain holding intervals (caught by this audit at sf0.1)
_t = tw.tns.to_numpy()
_same = ((tw.event_type.to_numpy()[:-1] == tw.event_type.to_numpy()[1:]) &
         (tw.day.to_numpy()[:-1] == tw.day.to_numpy()[1:]))
_dms = np.full(len(tw), np.nan)
_dms[:-1][_same] = ((_t[1:] - _t[:-1]) // 1_000_000)[_same]
tw['dms'] = _dms
gt = tw.groupby(['event_type', 'day'])
twr = gt.agg(n_events=('c', 'size'),
             num=('c', lambda s: np.nan),  # filled below
             den=('dms', lambda s: s.dropna().sum())).reset_index()
twr['num'] = gt.apply(
    lambda g: (g.c * g.dms).dropna().sum()).to_numpy()
twr['twap'] = np.where(twr.den > 0, (twr.num / twr.den) / 100.0, np.nan)
a.check('q_twap',
        twr[['event_type', 'day', 'n_events', 'twap']],
        keys=['event_type', 'day'], float_round={'twap': 4})

# ---- inter-arrival gap stats per type ----
ia = e.sort_values(['event_type', 'tns', 'event_id'])
ia_rows = []
for et, g in ia.groupby('event_type'):
    _gt = g.tns.to_numpy()  # exact int64 diffs (the q_twap shift hazard)
    gaps = ((_gt[1:] - _gt[:-1]) // 1_000_000).astype('int64')
    n = len(gaps)
    sg, sgg = int(gaps.sum()), int((gaps.astype(object) ** 2).sum())
    mean = sg / n
    med = float(np.percentile(gaps, 50, method='linear'))
    vr = max(0.0, (n * sgg - sg * sg) / (n * (n - 1.0)))
    cv = np.sqrt(vr) / mean if (n > 1 and sg > 0) else np.nan
    ia_rows.append((et, n, mean, med, cv))
a.check('q_interarrival',
        pd.DataFrame(ia_rows, columns=['event_type', 'n_gaps', 'mean_gap_ms',
                                       'median_gap_ms', 'cv']),
        keys=['event_type'],
        float_round={'mean_gap_ms': 3, 'cv': 4},
        float_exact=('median_gap_ms',))

# ---- streaks (gaps and islands) ----
sd = e.copy()
sd['day'] = day_of(sd.tns)
dd = sd[['user_id', 'day']].drop_duplicates().sort_values(['user_id', 'day'])
dd['rn'] = dd.groupby('user_id').cumcount() + 1
dd['anchor'] = pd.to_datetime(dd.day) - pd.to_timedelta(dd.rn, unit='D')
isl = dd.groupby(['user_id', 'anchor']).size().reset_index(name='len')
st = isl.groupby('user_id').agg(best_streak=('len', 'max'),
                                n_active_days=('len', 'sum')).reset_index()
st = st.sort_values(['best_streak', 'user_id'],
                    ascending=[False, True]).head(20)
st = st.rename(columns={'user_id': 'user'})
a.check('q_streaks', st[['user', 'best_streak', 'n_active_days']],
        keys=['user'])

# ---- completeness ----
dc = sd.groupby(['event_type', 'day']).size().reset_index(name='n')
co_rows = []
for et, g in dc.groupby('event_type'):
    g = g.sort_values('day')
    days = pd.to_datetime(g.day)
    gaps = days.diff().dt.days.dropna() - 1
    first, last = g.day.min(), g.day.max()
    span = (pd.to_datetime(last) - pd.to_datetime(first)).days + 1
    active = len(g)
    co_rows.append((et, int(g.n.sum()), first, last, span, active,
                    span - active, int(active * 100 // span),
                    int(gaps.max()) if len(gaps) else 0))
a.check('q_completeness',
        pd.DataFrame(co_rows, columns=['event_type', 'n_events', 'first_day',
                                       'last_day', 'span_days', 'active_days',
                                       'missing_days', 'coverage_pct',
                                       'longest_gap_days']),
        keys=['event_type'])

# ---- RFM quintile segmentation ----
rf = e.copy()
rf['day'] = day_of(rf.tns)
rf['c'] = cents(rf.value)
per = rf.groupby('user_id').agg(last_day=('day', 'max'),
                                freq=('c', 'size'),
                                cents=('c', 'sum')).reset_index()
anchor = per.last_day.max()
per['rec_days'] = (pd.to_datetime(anchor) -
                   pd.to_datetime(per.last_day)).dt.days
nn = len(per)
per = per.sort_values(['rec_days', 'user_id'],
                      ascending=[False, True]).reset_index(drop=True)
per['rn_r'] = per.index + 1
per = per.sort_values(['freq', 'user_id']).reset_index(drop=True)
per['rn_f'] = per.index + 1
per = per.sort_values(['cents', 'user_id']).reset_index(drop=True)
per['rn_m'] = per.index + 1
for s, c in (('r_score', 'rn_r'), ('f_score', 'rn_f'), ('m_score', 'rn_m')):
    per[s] = (((per[c] - 1) * 5) // nn + 1).astype('int32')
seg = per.groupby(['r_score', 'f_score', 'm_score']).agg(
    n_users=('cents', 'size'), tot=('cents', 'sum')).reset_index()
seg['avg_spend'] = (seg.tot / seg.n_users) / 100.0
a.check('q_rfm', seg[['r_score', 'f_score', 'm_score', 'n_users',
                      'avg_spend']],
        keys=['r_score', 'f_score', 'm_score'],
        float_round={'avg_spend': 4})

# ---- cohort LTV curve ----
lv = rf[['user_id', 'day', 'c']].copy()
f0 = lv.groupby('user_id').day.min().rename('d0')
a0 = f0.min()
coh = ((pd.to_datetime(f0) - pd.to_datetime(a0)).dt.days // 7) \
    .rename('cohort_week')
sizes = coh.value_counts().to_dict()
lv = lv.join(f0, on='user_id').join(coh, on='user_id')
lv['age_week'] = ((pd.to_datetime(lv.day) -
                   pd.to_datetime(lv.d0)).dt.days // 7)
cells = lv.groupby(['cohort_week', 'age_week']).c.sum().reset_index()
cells = cells.sort_values(['cohort_week', 'age_week'])
cells['cum'] = cells.groupby('cohort_week').c.cumsum()
cells['n_users'] = cells.cohort_week.map(sizes)
a.check('q_cohort_ltv',
        pd.DataFrame({'cohort_week': cells.cohort_week,
                      'age_week': cells.age_week,
                      'n_users': cells.n_users,
                      'revenue': cells.c / 100.0,
                      'cum_ltv_per_user': (cells.cum / cells.n_users) / 100.0}),
        keys=['cohort_week', 'age_week'],
        float_round={'revenue': 2, 'cum_ltv_per_user': 4})

import sys
sys.exit(1 if a.summary() else 0)
