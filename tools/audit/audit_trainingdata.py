"""Independent-reference audit of TrainingDataQueries (round 17).

Samplers, splits, packing, mixtures, drift monitors (PSI/JSD/
Hellinger), Welch t-test/power analysis, quantile drift, k-anonymity
and DP counts recomputed from scratch with pandas/numpy; hash draws
re-derived from the md5 convention, statistics from their textbook
forms.
"""
import hashlib
import math
import numpy as np
import pandas as pd
import re
from common import Audit, events, documents, rnd, cents, day_of

a = Audit('TrainingDataQueries')
e = events()
docs = documents()
TWO32 = 4294967296

WS = re.compile(r'[ \t\n\x0b\f\r]+')


def ntok(text):
    return sum(1 for t in WS.split(text.strip(' ')) if t != '')


def h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def sh(v, salt):
    return h32(f'{v}|{salt}')


# ---- stratified sample ----
RATES = {'click': 0.5, 'error': 0.25, 'purchase': 1.0, 'signup': 1.0,
         'view': 0.1}
keep = e[[h32(f'{i}|strat') < RATES[t] * TWO32
          for i, t in zip(e.event_id, e.event_type)]]
ss = keep.groupby('event_type').agg(n_sampled=('event_id', 'size'),
                                    first_id=('event_id', 'min'),
                                    last_id=('event_id', 'max')).reset_index()
a.check('q_stratified_sample', ss, keys=['event_type'])

# ---- entity hash split ----
buck = e.user_id.map(lambda u: h32(f'{u}|split') % 100)
spl = np.where(buck < 80, 'train', np.where(buck < 90, 'val', 'test'))
hs = pd.DataFrame({'split': spl, 'user_id': e.user_id}) \
    .groupby('split').agg(n_events=('user_id', 'size'),
                          n_users=('user_id', 'nunique')).reset_index()
a.check('q_hash_split', hs, keys=['split'])

# ---- sequence packing ----
dd = docs.assign(n_tok=docs.text.map(ntok)) \
    .sort_values(['source', 'doc_id']).reset_index(drop=True)
dd['cum'] = dd.groupby('source').n_tok.cumsum() - dd.n_tok
dd['bin'] = dd.cum // 2048
sp = dd.groupby(['source', 'bin']).agg(
    n_docs=('doc_id', 'size'), total_tokens=('n_tok', 'sum'),
    first_doc=('doc_id', 'min'), last_doc=('doc_id', 'max')).reset_index()
a.check('q_seq_packing', sp, keys=['source', 'bin'])

# ---- domain mix ----
TGT = {'src0': 0.2, 'src1': 0.1, **{f'src{i}': 0.7 / 18
                                    for i in range(2, 20)}}
nc = docs.groupby('source').size().to_dict()
t = min(nc[s] / f for s, f in TGT.items() if s in nc and f > 0)
rate = {s: TGT[s] * t / nc[s] for s in nc if TGT.get(s, 0) > 0}
kd = docs[[h32(f'{i}|mix') < rate.get(s, 0) * TWO32
           for i, s in zip(docs.doc_id, docs.source)]]
dm = kd.groupby('source').size().reset_index(name='n_kept')
dm['n_orig'] = dm.source.map(nc)
dm['rate'] = dm.source.map(rate)
a.check('q_domain_mix', dm[['source', 'n_orig', 'n_kept', 'rate']],
        keys=['source'], float_round={'rate': 6})

# ---- winsorize ----
bounds = e.groupby('event_type').value.agg(
    p05=lambda s: np.percentile(s, 5, method='linear'),
    p95=lambda s: np.percentile(s, 95, method='linear'))
w = e[e.event_id < 2000].join(bounds, on='event_type')
a.check('q_winsorize',
        pd.DataFrame({'event_id': w.event_id, 'event_type': w.event_type,
                      'value_capped': np.maximum(w.p05,
                                                 np.minimum(w.p95, w.value))}),
        keys=['event_id'], float_round={'value_capped': 4})

# ---- per-entity z-normalize ----
stats = e.groupby('user_id').value.agg(
    mu=lambda s: cents(s).sum() / (len(s) * 100.0),
    sigma=lambda s: float(np.sqrt(np.mean((s - s.mean()) ** 2))))
nz = e[e.user_id < 30].join(stats, on='user_id')
zz = (nz.value - nz.mu) / nz.sigma.where(nz.sigma != 0)
a.check('q_normalize',
        pd.DataFrame({'event_id': nz.event_id, 'user_id': nz.user_id,
                      'value_z': zz}),
        keys=['event_id'], float_round={'value_z': 4})

# ---- MAD outliers over doc lengths ----
med = docs.groupby('source').n_chars.apply(
    lambda s: np.percentile(s, 50, method='linear')).rename('med')
om = docs.join(med, on='source')
mad = om.assign(dev=(om.n_chars - om.med).abs()) \
    .groupby('source').dev.apply(
        lambda s: np.percentile(s, 50, method='linear')).rename('mad')
om = om.join(mad, on='source')
rz = 0.6745 * (om.n_chars - om.med) / om['mad'].where(om['mad'] != 0)
rzr = rnd(rz.to_numpy(), 4)
a.check('q_outlier_mad',
        pd.DataFrame({'doc_id': om.doc_id, 'source': om.source,
                      'n_chars': om.n_chars, 'robust_z': rz,
                      'outlier': np.where(np.abs(rzr) > 3.5, 1, 0)
                      .astype('int32')}),
        keys=['doc_id'], float_round={'robust_z': 4})


# ---- end-to-end pipeline ----
def normalize(text):
    s = re.sub(r'[^a-z0-9 ]', ' ', text.lower())
    return re.sub(r' +', ' ', s).strip(' ')


def sh5(ts):
    return {' '.join(ts[i:i + 5]) for i in range(len(ts) - 4)}


corpus = docs[docs.doc_id >= 10]
fp = {r.doc_id: hashlib.md5(normalize(r.text).encode()).hexdigest()
      for r in corpus.itertuples(index=False)}
keep_ids = set()
byfp = {}
for i in sorted(fp):
    byfp.setdefault(fp[i], i)
keep_ids = set(byfp.values())
bench_sh = set()
for r in docs[docs.doc_id < 10].itertuples(index=False):
    bench_sh |= sh5([t for t in WS.split(r.text.strip(' ')) if t])
rows = []
for r in corpus.itertuples(index=False):
    if r.doc_id not in keep_ids:
        continue
    ts = [t for t in WS.split(r.text.strip(' ')) if t]
    if sh5(ts) & bench_sh:
        continue
    n = len(ts)
    if n < 20:
        continue
    starts = [s for s in range(1, n + 1, 24) if s == 1 or s + 8 <= n]
    rows.append((r.doc_id, n, len(starts)))
a.check('q_pipeline_e2e',
        pd.DataFrame(rows, columns=['doc_id', 'n_tokens', 'n_chunks']),
        keys=['doc_id'])

# ---- sample per group ----
sg = docs.assign(h=[h32(f'{i}|pergroup') for i in docs.doc_id]) \
    .sort_values(['source', 'h', 'doc_id'])
sg['draw_rank'] = sg.groupby('source').cumcount() + 1
sg = sg[sg.draw_rank <= 25]
a.check('q_sample_per_group',
        pd.DataFrame({'source': sg.source, 'doc_id': sg.doc_id,
                      'draw_rank': sg.draw_rank.astype('int32')}),
        keys=['source', 'draw_rank'])

# ---- weighted sample (Efraimidis-Spirakis) ----
wsd = docs[docs.n_chars > 0].copy()
u = (np.array([h32(f'{i}|weighted') for i in wsd.doc_id], dtype='float64')
     + 1.0) / TWO32
wsd['key'] = -np.log(u) / wsd.n_chars.astype('float64')
top = wsd.sort_values(['key', 'doc_id']).head(100)
a.check('q_weighted_sample',
        pd.DataFrame({'doc_id': top.doc_id, 'n_chars': top.n_chars,
                      'key_scaled': top.key * 1e6}),
        keys=['doc_id'], float_round={'key_scaled': 4})

# ---- fractional-epoch upsample + mixture report ----
EP = {'en': 2.5, 'de': 1.0, 'fr': 0.5, 'es': 3.25, 'zh': 1.75}
base = docs.assign(n_toks=docs.text.map(ntok))
nrep = []
for r in base.itertuples(index=False):
    ep = EP.get(r.lang, 0.0)
    extra = 1 if h32(f'{r.doc_id}|epoch') < (ep - math.floor(ep)) * TWO32 \
        else 0
    nrep.append(int(math.floor(ep)) + extra)
base = base.assign(n_rep=nrep)
up_rows = [(r.doc_id, r.lang, k + 1)
           for r in base.itertuples(index=False)
           for k in range(r.n_rep)]
a.check('q_upsample_repeat',
        pd.DataFrame(up_rows, columns=['doc_id', 'lang', 'repeat_idx'])
        .astype({'repeat_idx': 'int32'}),
        keys=['doc_id', 'repeat_idx'])

mx = base[base.n_rep > 0].groupby('lang').apply(
    lambda g: pd.Series({'n_docs': g.doc_id.nunique(),
                         'n_rows': int(g.n_rep.sum()),
                         'n_tokens': int((g.n_toks * g.n_rep).sum())}),
    include_groups=False).reset_index()
tot = mx.n_tokens.sum()
mx['token_share'] = mx.n_tokens / tot
a.check('q_mixture_report',
        mx[['lang', 'n_docs', 'n_rows', 'n_tokens', 'token_share']],
        keys=['lang'], float_round={'token_share': 4})

# ---- epoch shuffle ----
es = docs[['doc_id']].copy()
es['hkey'] = [h32(f'{i}|epoch1') for i in es.doc_id]
es = es.sort_values(['hkey', 'doc_id']).reset_index(drop=True)
es['pos'] = (es.index + 1).astype('int64')
es['shard'] = ((es.pos - 1) % 8).astype('int32')
es['pos_in_shard'] = ((es.pos - 1) // 8 + 1).astype('int32')
a.check('q_epoch_shuffle', es[['doc_id', 'pos', 'shard', 'pos_in_shard']],
        keys=['doc_id'])

# ---- drift family: shared smoothed bin probabilities ----
day = pd.to_datetime(e.tns // 1000, unit='us')
period = np.where(day.dt.day <= 15, 'a', 'b')
mn, mx_ = e.value.min(), e.value.max()
bn = np.minimum(9, np.floor((e.value - mn) / ((mx_ - mn) / 10.0))
                .astype('int64'))
bp = pd.DataFrame({'event_type': e.event_type, 'period': period, 'bin': bn})
cells = bp.groupby(['event_type', 'bin', 'period']).size() \
    .unstack(fill_value=0).reindex(columns=['a', 'b'], fill_value=0)
probs = {}
for et in sorted(e.event_type.unique()):
    na = np.zeros(10, dtype='int64')
    nb = np.zeros(10, dtype='int64')
    if et in cells.index.get_level_values(0):
        sub = cells.loc[et]
        for b_, row in sub.iterrows():
            na[b_] = row['a']
            nb[b_] = row['b']
    ta, tb = na.sum(), nb.sum()
    pa = (na + 1.0) / (ta + 10.0)
    pb = (nb + 1.0) / (tb + 10.0)
    probs[et] = (ta, tb, pa, pb)

psi_rows, jsd_rows, hel_rows = [], [], []
for et, (ta, tb, pa, pb) in probs.items():
    psi = float(((pa - pb) * np.log(pa / pb)).sum())
    m = (pa + pb) / 2.0
    jsd = float((0.5 * pa * np.log(pa / m) + 0.5 * pb * np.log(pb / m)).sum())
    bc = float(np.sqrt(pa * pb).sum())
    hel = math.sqrt(max(0.0, 1.0 - bc))
    psi_rows.append((et, ta, tb, psi, float(rnd([psi], 6)[0]) > 0.25))
    jsd_rows.append((et, ta, tb, jsd, float(rnd([jsd], 6)[0]) > 0.1))
    hel_rows.append((et, ta, tb, bc, hel, float(rnd([hel], 6)[0]) > 0.1))
a.check('q_psi_drift',
        pd.DataFrame(psi_rows, columns=['event_type', 'n_first_half',
                                        'n_second_half', 'psi', 'drifted']),
        keys=['event_type'], float_round={'psi': 6})
a.check('q_jsd_drift',
        pd.DataFrame(jsd_rows, columns=['event_type', 'n_first_half',
                                        'n_second_half', 'jsd', 'drifted']),
        keys=['event_type'], float_round={'jsd': 6})
a.check('q_hellinger',
        pd.DataFrame(hel_rows, columns=['event_type', 'n_first_half',
                                        'n_second_half', 'bc', 'hellinger',
                                        'drifted']),
        keys=['event_type'], float_round={'bc': 6, 'hellinger': 6})

# ---- Welch t-test / power analysis / quantile drift ----
em = pd.DataFrame({'event_type': e.event_type, 'period': period,
                   'c': cents(e.value)})
mom = em.groupby(['event_type', 'period']).agg(
    n=('c', 'size'), sumc=('c', 'sum'),
    sumsq=('c', lambda s: int((s.astype('int64') ** 2).sum()))).reset_index()


def mv(row):
    n, sc, sq = float(row.n), float(row.sumc), float(row.sumsq)
    mean = (sc / n) / 100.0
    var = max(0.0, (n * sq - sc * sc) / (n * (n - 1.0))) / 10000.0
    return mean, var


ab_rows, pw_rows = [], []
ZS2 = (1.959963984540054 + 0.8416212335729143) ** 2
for et in sorted(e.event_type.unique()):
    ra = mom[(mom.event_type == et) & (mom.period == 'a')]
    rb = mom[(mom.event_type == et) & (mom.period == 'b')]
    if len(ra) == 0 or len(rb) == 0 or ra.n.iloc[0] < 2 or rb.n.iloc[0] < 2:
        continue
    ra, rb = ra.iloc[0], rb.iloc[0]
    ma_, va = mv(ra)
    mb_, vb = mv(rb)
    na_, nb_ = float(ra.n), float(rb.n)
    se2 = va / na_ + vb / nb_
    tstat = (ma_ - mb_) / math.sqrt(se2) if se2 > 0 else np.nan
    dfw = (se2 * se2) / ((va / na_) ** 2 / (na_ - 1) +
                         (vb / nb_) ** 2 / (nb_ - 1)) if se2 > 0 else np.nan
    tr = float(rnd([tstat], 4)[0]) if not np.isnan(tstat) else np.nan
    ab_rows.append((et, int(ra.n), int(rb.n), ma_ - mb_, tstat, dfw,
                    None if np.isnan(tr) else bool(abs(tr) > 1.96)))
    delta = ma_ - mb_
    raw = ZS2 * (va + vb) / (delta * delta) if abs(delta) > 0 else np.nan
    npa = int(math.ceil(raw)) if (not np.isnan(raw) and 0 < raw <= 1e15) \
        else None
    pw_rows.append((et, int(ra.n), int(rb.n), delta, npa))
a.check('q_ab_test',
        pd.DataFrame(ab_rows, columns=['event_type', 'n_a', 'n_b',
                                       'mean_diff', 't_stat', 'df',
                                       'significant']),
        keys=['event_type'],
        float_round={'mean_diff': 4, 't_stat': 4, 'df': 1})
a.check('q_power_analysis',
        pd.DataFrame(pw_rows, columns=['event_type', 'n_a', 'n_b',
                                       'observed_delta', 'n_per_arm']),
        keys=['event_type'], float_round={'observed_delta': 4})

qd_rows = []
for et in sorted(e.event_type.unique()):
    sa = em[(em.event_type == et) & (em.period == 'a')].c.to_numpy()
    sb_ = em[(em.event_type == et) & (em.period == 'b')].c.to_numpy()
    pa25, pa50, pa75 = np.percentile(sa, [25, 50, 75], method='linear')
    pb25, pb50, pb75 = np.percentile(sb_, [25, 50, 75], method='linear')
    qd_rows.append((et, len(sa), len(sb_), pa50 / 100, pb50 / 100,
                    (pb25 - pa25) / 100, (pb50 - pa50) / 100,
                    (pb75 - pa75) / 100))
a.check('q_quantile_drift',
        pd.DataFrame(qd_rows, columns=['event_type', 'n_a', 'n_b',
                                       'median_a', 'median_b', 'd_p25',
                                       'd_p50', 'd_p75']),
        keys=['event_type'],
        float_round={'median_a': 4, 'median_b': 4, 'd_p25': 4, 'd_p50': 4,
                     'd_p75': 4})

# ---- k-anonymity ----
ka = pd.DataFrame({'event_type': e.event_type, 'day': day_of(e.tns),
                   'band': np.floor(e.value / 50.0).astype('int64')})
cls = ka.groupby(['event_type', 'day', 'band']).size().reset_index(name='n')
kg = cls.groupby('event_type').agg(
    n_classes=('n', 'size'), min_class=('n', 'min'),
    rows_below=('n', lambda s: int(s[s < 5].sum())),
    total=('n', 'sum')).reset_index()
kg['frac_below'] = kg.rows_below / kg.total
kg['k_anonymous'] = kg.min_class >= 5
a.check('q_k_anonymity',
        kg[['event_type', 'n_classes', 'min_class', 'rows_below',
            'frac_below', 'k_anonymous']],
        keys=['event_type'], float_round={'frac_below': 6})

# ---- DP noisy counts ----
dp_rows = []
for et, n in e.groupby('event_type').size().items():
    u = (h32(f'{et}|dp') + 0.5) / TWO32
    c = u - 0.5
    noise = -1.0 * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))
    dp_rows.append((et, 1.0, n + noise))
a.check('q_dp_counts',
        pd.DataFrame(dp_rows, columns=['event_type', 'epsilon', 'noisy_n']),
        keys=['event_type'], float_round={'noisy_n': 4},
        float_exact=('epsilon',))

# ---- temperature mix ----
tm = docs.assign(n_toks=docs.text.map(ntok)).groupby('lang') \
    .n_toks.sum().reset_index(name='n_tokens')
tm['w_micro'] = np.floor(np.sqrt(tm.n_tokens.astype('float64')) * 1e6
                         + 0.5).astype('int64')
tm['raw_share'] = tm.n_tokens / tm.n_tokens.sum()
tm['temp_share'] = tm.w_micro / tm.w_micro.sum()
a.check('q_temperature_mix',
        tm[['lang', 'n_tokens', 'raw_share', 'temp_share']],
        keys=['lang'], float_round={'raw_share': 6, 'temp_share': 6})

import sys
sys.exit(1 if a.summary() else 0)
