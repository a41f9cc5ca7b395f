"""Independent-reference audit of TemporalJoinQueries (round 17).

As-of join, gap sessionization, band join, last-touch attribution and
session paths recomputed from scratch in pandas off the events fixture.
"""
import numpy as np
import pandas as pd
from common import Audit, events, rnd, cents

a = Audit('TemporalJoinQueries')
e = events()
GAP = 6 * 3_600_000_000_000

# ---- as-of join (purchases <- most recent signup at-or-before) ----
pur = e[e.event_type == 'purchase'][['event_id', 'user_id', 'tns', 'value']]
sig = e[e.event_type == 'signup'][['user_id', 'tns', 'value']]
# ties at one ts collapse to max(value) (the documented dedup rule)
sig = sig.groupby(['user_id', 'tns'], as_index=False).value.max() \
    .sort_values(['user_id', 'tns'])
rows = []
sig_by_user = {u: g for u, g in sig.groupby('user_id')}
for r in pur.itertuples(index=False):
    g = sig_by_user.get(r.user_id)
    av = np.nan
    if g is not None:
        m = g[g.tns <= r.tns]
        if len(m):
            av = m.value.iloc[-1]
    rows.append((r.event_id, r.user_id, r.value, av))
ref_asof = pd.DataFrame(rows, columns=['event_id', 'user_id', 'value',
                                       'asof_value'])
a.check('q_asof_join', ref_asof, keys=['event_id'],
        float_exact=('value', 'asof_value'))
a.check('q_asof_join_composed', ref_asof, keys=['event_id'],
        float_exact=('value', 'asof_value'))

# ---- gap sessionization ----
eu = e.sort_values(['user_id', 'tns', 'event_id']).reset_index(drop=True)
# exact int64 gap (pandas shift coerces epoch nanos to float64 — the
# q_twap 256-ns ulp hazard)
_t = eu.tns.to_numpy()
_gap = np.full(len(eu), -1, dtype='int64')
_gap[1:] = np.where(eu.user_id.to_numpy()[1:] ==
                    eu.user_id.to_numpy()[:-1], _t[1:] - _t[:-1], -1)
eu['flag'] = (_gap > GAP).astype('int64')
eu['session_idx'] = eu.groupby('user_id').flag.cumsum()
sess = eu.groupby(['user_id', 'session_idx']).agg(
    n_events=('event_id', 'size'),
    dur=('tns', lambda s: int((s.max() - s.min()) // 1_000_000_000)),
    first_event=('event_id', 'min')).reset_index()
a.check('q_sessionize',
        sess.rename(columns={'dur': 'duration_s'})
        [['user_id', 'session_idx', 'n_events', 'duration_s', 'first_event']],
        keys=['user_id', 'session_idx'])

st = sess.groupby('n_events').agg(
    n_sessions=('dur', 'size'), s=('dur', 'sum'),
    max_duration_s=('dur', 'max')).reset_index()
st['avg_duration_s'] = st.s / st.n_sessions
a.check('q_session_stats',
        st[['n_events', 'n_sessions', 'avg_duration_s', 'max_duration_s']],
        keys=['n_events'], float_round={'avg_duration_s': 2})

# ---- band join (errors x purchases within 1h, users < 30) ----
e30 = e[e.user_id < 30]
err = e30[e30.event_type == 'error'][['user_id', 'event_id', 'tns']]
pu = e30[e30.event_type == 'purchase'][['user_id', 'event_id', 'tns']]
bj = err.merge(pu, on='user_id', suffixes=('_e', '_p'))
bj = bj[(bj.tns_e - bj.tns_p).abs() <= 3_600_000_000_000]
a.check('q_band_join',
        pd.DataFrame({'user_id': bj.user_id, 'error_id': bj.event_id_e,
                      'purchase_id': bj.event_id_p}),
        keys=['user_id', 'error_id', 'purchase_id'])

# ---- last-touch attribution ----
eu['touch'] = eu.event_type.where(eu.event_type != 'purchase')
eu['att'] = eu.groupby('user_id').touch.ffill()
purch = eu[eu.event_type == 'purchase'].copy()
purch['channel'] = purch.att.fillna('none')
purch['cents'] = cents(purch.value)
at = purch.groupby('channel').agg(n_purchases=('cents', 'size'),
                                  s=('cents', 'sum')).reset_index()
at['revenue'] = at.s / 100.0
a.check('q_attribution', at[['channel', 'n_purchases', 'revenue']],
        keys=['channel'], float_round={'revenue': 2})

# ---- top session paths (first 3 types per session, top 10) ----
eu['rn'] = eu.groupby(['user_id', 'session_idx']).cumcount() + 1
paths = eu[eu.rn <= 3].groupby(['user_id', 'session_idx']).event_type \
    .agg('>'.join).rename('path').reset_index()
pc = paths.groupby('path').size().reset_index(name='n_sessions')
pc = pc.sort_values(['n_sessions', 'path'],
                    ascending=[False, True]).head(10)
a.check('q_session_paths', pc[['path', 'n_sessions']], keys=['path'])

import sys
sys.exit(1 if a.summary() else 0)
