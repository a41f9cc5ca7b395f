"""Independent-reference audit of SimilarityQueries (round 17).

NumPy re-implementations of every embedding statistic straight off the
float32 fixture vectors. The six recall-gated queries are registered as
constant-shape certificates (no row data in their dumps); for those the
audit re-derives the GROUND TRUTH side — the exact brute-force top-5
(q_ann_bruteforce) and the exact cos >= 0.45 pair set
(q_embedding_neardup) every gate compares against — and cross-checks
the published RECALL_r16.json floors for consistency.
"""
import hashlib
import numpy as np
import pandas as pd
from common import Audit, embeddings, rnd, dump

a = Audit('SimilarityQueries')
emb = embeddings()
V32 = np.stack(emb.embedding.to_numpy())            # float32 (n, 64)
V = V32.astype('float64')
IDS = emb.vec_id.to_numpy()
LBL = emb.label.to_numpy()
n = len(IDS)
assert (IDS == np.arange(n)).all()

NORM = np.sqrt((V * V).sum(axis=1))

# ---- per-vector L2 norm ----
m100 = IDS < 100
a.check('q_embedding_norm',
        pd.DataFrame({'vec_id': IDS[m100], 'label': LBL[m100],
                      'norm': NORM[m100]}),
        keys=['vec_id'], float_round={'norm': 4})

# ---- per-label norm stats (integer-micro exact mean) ----
micro = np.floor(NORM * 1e6 + 0.5).astype('int64')
st = pd.DataFrame({'label': LBL, 'norm': NORM, 'micro': micro}) \
    .groupby('label') \
    .agg(cnt=('norm', 'size'), s=('micro', 'sum'),
         min_norm=('norm', 'min'), max_norm=('norm', 'max')).reset_index()
st['avg_norm'] = st.s / 1e6 / st.cnt
a.check('q_embedding_stats',
        st[['label', 'cnt', 'avg_norm', 'min_norm', 'max_norm']],
        keys=['label'],
        float_round={'avg_norm': 4, 'min_norm': 4, 'max_norm': 4})

# ---- int8 scalar quantization ----
rows = []
for i in np.where(m100)[0]:
    x = V[i]
    mn, mx = x.min(), x.max()
    sc = (mx - mn) / 255.0
    if sc > 0:
        q = np.minimum(255.0, np.maximum(0.0, np.floor((x - mn) / sc + 0.5)))
        qsum = int(q.astype('int64').sum())
        mse = float(((x - (mn + q * sc)) ** 2).sum() / len(x))
    else:
        qsum, mse = 0, 0.0
    rows.append((int(IDS[i]), mn, mx, qsum, mse * 1e6))
a.check('q_embedding_quantize',
        pd.DataFrame(rows, columns=['vec_id', 'mn', 'mx', 'qsum', 'mse_e6']),
        keys=['vec_id'],
        float_round={'mn': 6, 'mx': 6, 'mse_e6': 6})

# ---- full cosine matrix (fp64) ----
COS = (V @ V.T) / np.outer(NORM, NORM)

# ---- embedding decontamination (max cos vs bench id < 10) ----
corp = IDS >= 10
max_cos = COS[np.ix_(corp, ~corp)].max(axis=1)
a.check('q_embedding_decontam',
        pd.DataFrame({'vec_id': IDS[corp], 'max_cos': max_cos,
                      'contaminated': max_cos >= 0.45}),
        keys=['vec_id'], float_round={'max_cos': 4})

# ---- exact near-dup pairs at cos >= 0.45 (brute force) ----
iu = np.triu_indices(n, k=1)
sel = COS[iu] >= 0.45
a.check('q_embedding_neardup',
        pd.DataFrame({'a': IDS[iu[0][sel]], 'b': IDS[iu[1][sel]],
                      'cos': COS[iu][sel]}),
        keys=['a', 'b'], float_round={'cos': 4})

# ---- exact brute-force top-5 (the ANN ground truth) ----
bf = []
for q in range(20):
    scores = COS[q].copy()
    scores[q] = -np.inf
    order = np.lexsort((np.arange(n), -scores))[:5]
    for r, j in enumerate(order, 1):
        bf.append((q, int(IDS[j]), scores[j], r))
a.check('q_ann_bruteforce',
        pd.DataFrame(bf, columns=['query_id', 'neighbor_id', 'cos', 'rank'])
        .astype({'rank': 'int32'}),
        keys=['query_id', 'rank'], float_round={'cos': 6})

# ---- cluster sample: sign-bit cells + deterministic md5 draw ----


def hash32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


cell = np.zeros(n, dtype='int32')
for i in range(4):
    cell += np.where(V32[:, i] >= np.float32(0), 1 << (3 - i), 0)
cs = pd.DataFrame({'cell': cell, 'vec_id': IDS,
                   'h': [hash32(f'{v}|pergroup') for v in IDS]})
cs = cs.sort_values(['cell', 'h', 'vec_id'])
cs['draw_rank'] = cs.groupby('cell').cumcount() + 1
cs = cs[cs.draw_rank <= 10]
a.check('q_cluster_sample',
        pd.DataFrame({'cell': cs.cell, 'vec_id': cs.vec_id,
                      'draw_rank': cs.draw_rank.astype('int32')}),
        keys=['cell', 'draw_rank'])

# ---- embedding drift (id parity split, exact integer sums) ----
b = IDS % 2
M = np.floor(V * 1048576.0 + 0.5).astype('int64')
na, nb = int((b == 0).sum()), int((b == 1).sum())
sa = M[b == 0].sum(axis=0)
sb = M[b == 1].sum(axis=0)
ca = sa.astype('float64') / 1048576.0 / na
cb = sb.astype('float64') / 1048576.0 / nb


def nano(x):
    return np.floor(x * 1e9 + 0.5).astype('int64')


dot = int(nano(ca * cb).sum())
aa = int(nano(ca * ca).sum())
bb = int(nano(cb * cb).sum())
d2 = int(nano((ca - cb) * (ca - cb)).sum())
cosc = (dot / 1e9) / np.sqrt((aa / 1e9) * (bb / 1e9)) \
    if aa > 0 and bb > 0 else np.nan
l2s = np.sqrt(max(0.0, d2 / 1e9))
cosr = float(rnd(np.array([cosc]), 6)[0])
a.check('q_embedding_drift',
        pd.DataFrame({'dim': [64], 'n_a': [na], 'n_b': [nb],
                      'cos_centroid': [cosc], 'l2_shift': [l2s],
                      'drifted': [cosr < 0.95]}),
        keys=['dim'], float_round={'cos_centroid': 6, 'l2_shift': 6})

# ---- recall-gated certificates: verify the published measurements ----
# The certificate dumps are constant-shape (the gate flips a boolean on
# violation); the audit's real check on this family is the ground-truth
# side above. Cross-check the latest RECALL json against the floors.
import json
import glob
import os
recall_files = sorted(glob.glob('/root/repo/RECALL_r*.json'),
                      key=os.path.getmtime)
if recall_files:
    rec = json.load(open(recall_files[-1]))
    cells = [(q, sf, v['recall'], spec['floor'])
             for q, spec in rec.get('queries', {}).items()
             for sf, v in spec.get('per_sf', {}).items()]
    bad = [c for c in cells if c[2] < c[3]]
    print(f'     [recall floors: {len(cells) - len(bad)}/{len(cells)} '
          f'measured >= floor in {os.path.basename(recall_files[-1])}]'
          + (f' VIOLATIONS: {bad}' if bad else ''))
    for q in ('q_ann_lsh', 'q_ann_ivf', 'q_ann_ivf_indexed', 'q_ann_pq',
              'q_ann_ivfpq', 'q_semantic_dedup'):
        d = dump(q)
        flags = [c for c in d.columns if d[c].dtype == bool]
        ok = all(bool(d[c].iloc[0]) for c in flags)
        a.results.append((q, 'ok' if ok else 'FAIL',
                          f'certificate booleans {"all true" if ok else "FALSE"}'))
        print(f'{"ok  " if ok else "FAIL"} {q} (certificate row, '
              f'booleans {"all true" if ok else "FALSE"})')

import sys
sys.exit(1 if a.summary() else 0)
