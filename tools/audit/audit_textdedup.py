"""Independent-reference audit of TextDedup (round 17).

Every dedup operator recomputed from scratch in pure Python/NumPy:
brute-force all-pairs where the engine bands (SimHash neardup is
pigeonhole-exact, so brute force IS its contract), union-find for
connected components, a direct DP for Levenshtein. The engine's md5
hash conventions (hash32/hash60, the fixed MinHash (a,b,P) family,
md5 band keys) are re-derived from their definitions, not from SQL.
"""
import hashlib
import numpy as np
import pandas as pd
import re
from common import Audit, documents, rnd, dump

a = Audit('TextDedup')
docs = documents()

WS = re.compile(r'[ \t\n\x0b\f\r]+')


def tokens(text):
    return [t for t in WS.split(text.strip(' ')) if t != '']


def normalize(text):
    s = re.sub(r'[^a-z0-9 ]', ' ', text.lower())
    s = re.sub(r' +', ' ', s)
    return s.strip(' ')


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def hash32(s):
    return int(md5hex(s)[:8], 16)


def hash60(s):
    return int(md5hex(s)[:15], 16)


def shingles(ts, n):
    if n == 1:
        return set(ts)
    return {' '.join(ts[i:i + n]) for i in range(len(ts) - n + 1)}


D = {r.doc_id: r.text for r in docs.itertuples(index=False)}
TOK = {i: tokens(t) for i, t in D.items()}
IDS = sorted(D)

# ---- exact dedup groups ----
fp = {i: md5hex(normalize(D[i])) for i in IDS}
gr = {}
for i in IDS:
    gr.setdefault(fp[i], []).append(i)
a.check('q_dedup_exact',
        pd.DataFrame([(f, min(v), len(v)) for f, v in gr.items()],
                     columns=['fp', 'canonical_id', 'cnt']),
        keys=['fp'])

# ---- MinHash signatures (k=8) ----
P = 2147483647
A_ = [3, 7, 11, 13, 17, 19, 23, 29]
B_ = [1, 5, 9, 15, 21, 27, 33, 39]


def minhash_sig(ts):
    hvs = [hash32(t) for t in ts]
    return [min((A_[i] * h + B_[i]) % P for h in hvs) for i in range(8)]


sigs = {i: minhash_sig(TOK[i]) for i in IDS if TOK[i]}
a.check('q_minhash_sig',
        pd.DataFrame([(i, *sigs[i]) for i in sorted(sigs)],
                     columns=['doc_id'] + [f'mh{j}' for j in range(8)]),
        keys=['doc_id'])


# ---- MinHash LSH pairs (banding re-derived) + Jaccard verify ----
def band_keys(sig, k=8, r=2):
    return [(b, md5hex('_'.join(str(sig[i]) for i in range(b * r, (b + 1) * r))))
            for b in range(k // r)]


SUB = [i for i in IDS if i < 100]
buckets = {}
for i in SUB:
    if i not in sigs:
        continue
    for bk in band_keys(sigs[i]):
        buckets.setdefault(bk, []).append(i)
cands = set()
for v in buckets.values():
    for x in range(len(v)):
        for y in range(x + 1, len(v)):
            aa, bb = sorted((v[x], v[y]))
            cands.add((aa, bb))
TS1 = {i: set(TOK[i]) for i in SUB}


def jacc(x, y):
    inter = len(TS1[x] & TS1[y])
    return inter / (len(TS1[x]) + len(TS1[y]) - inter)


mh_pairs = [(x, y, jacc(x, y)) for x, y in sorted(cands)
            if TS1[x] & TS1[y] and jacc(x, y) >= 0.8]
a.check('q_dedup_minhash',
        pd.DataFrame(mh_pairs, columns=['a', 'b', 'jaccard']),
        keys=['a', 'b'], float_round={'jaccard': 4})

# recall diagnostic: banded-vs-brute at J >= 0.8 over the same slice
brute08 = {(x, y) for xi, x in enumerate(SUB) for y in SUB[xi + 1:]
           if TS1[x] & TS1[y] and jacc(x, y) >= 0.8}
missed = brute08 - {(x, y) for x, y, _ in mh_pairs}
print(f'     [minhash recall: {len(brute08) - len(missed)}/{len(brute08)} '
      f'true pairs proposed by LSH]')

# ---- exact word-set Jaccard pairs at 0.8 (brute force) ----
jp = [(x, y, jacc(x, y)) for xi, x in enumerate(SUB) for y in SUB[xi + 1:]
      if TS1[x] & TS1[y] and jacc(x, y) >= 0.8]
a.check('q_dedup_jaccard', pd.DataFrame(jp, columns=['a', 'b', 'jaccard']),
        keys=['a', 'b'], float_round={'jaccard': 4})

# ---- threshold sweep (one pair set at the floor, filtered per point) ----
jp5 = [(x, y, jacc(x, y)) for xi, x in enumerate(SUB) for y in SUB[xi + 1:]
       if TS1[x] & TS1[y] and jacc(x, y) >= 0.5]
sweep = []
for th in (0.5, 0.6, 0.7, 0.8, 0.9):
    sel = [(x, y) for x, y, j in jp5 if j >= th]
    nd = len({d for p in sel for d in p})
    sweep.append((th, len(sel), nd, nd / len(SUB)))
a.check('q_dedup_sweep',
        pd.DataFrame(sweep, columns=['threshold', 'n_pairs', 'n_docs',
                                     'dup_frac']),
        keys=['threshold'], float_round={'dup_frac': 4},
        float_exact=('threshold',))

# ---- bigram Jaccard at 0.05 ----
TS2 = {i: shingles(TOK[i], 2) for i in SUB}
ng = []
for xi, x in enumerate(SUB):
    for y in SUB[xi + 1:]:
        inter = len(TS2[x] & TS2[y])
        if inter:
            j = inter / (len(TS2[x]) + len(TS2[y]) - inter)
            if j >= 0.05:
                ng.append((x, y, j))
a.check('q_ngram_sim', pd.DataFrame(ng, columns=['a', 'b', 'jaccard']),
        keys=['a', 'b'], float_round={'jaccard': 4})

# ---- directed trigram containment (brute force all-pairs) ----
SUB5 = [i for i in IDS if i < 500]
TS3 = {i: shingles(TOK[i], 3) for i in SUB5}
ct = []
for x in SUB5:
    if not TS3[x]:
        continue
    for y in SUB5:
        if x == y:
            continue
        inter = len(TS3[x] & TS3[y])
        if inter and inter / len(TS3[x]) >= 0.1:
            ct.append((x, y, inter / len(TS3[x])))
a.check('q_containment', pd.DataFrame(ct, columns=['a', 'b', 'containment']),
        keys=['a', 'b'], float_round={'containment': 4})

# ---- span dedup (L=5): gram identity by the TOKEN TUPLE itself ----
L = 5
occ = {}
for i in IDS:
    ts = TOK[i]
    for p in range(len(ts) - L + 1):
        occ.setdefault(tuple(ts[p:p + L]), {}).setdefault(i, []).append(p)
rows = []
removed_at = {i: set() for i in IDS}
for g, dmap in occ.items():
    if len(dmap) < 2:
        continue
    owner = min(dmap)
    for d, poss in dmap.items():
        if d == owner:
            continue
        for s in poss:
            removed_at[d].update(range(s, s + L))
for i in IDS:
    ts = TOK[i]
    rm = removed_at[i]
    kept = [t for p, t in enumerate(ts) if p not in rm]
    rows.append((i, len(ts), len(ts) - len(kept), ' '.join(kept)))
span = pd.DataFrame(rows, columns=['doc_id', 'n_tokens', 'n_removed',
                                   'clean_text'])
a.check('q_span_dedup', span, keys=['doc_id'])
a.check('q_span_dedup_rowhash',
        span.assign(clean_md5=span.clean_text.map(md5hex))
        .drop(columns='clean_text'),
        keys=['doc_id'])

# ---- SimHash 32/60-bit signatures (vote fold over token MULTISET) ----


def simhash(ts, bits, hf):
    votes = np.zeros(bits, dtype=np.int64)
    for t in ts:
        h = hf(t)
        for j in range(bits):
            votes[j] += 1 if (h >> j) & 1 else -1
    return int(sum(1 << j for j in range(bits) if votes[j] > 0))


sh32 = {i: simhash(TOK[i], 32, hash32) for i in IDS if TOK[i]}
a.check('q_simhash',
        pd.DataFrame(sorted(sh32.items()), columns=['doc_id', 'simhash']),
        keys=['doc_id'])

sh60 = {i: simhash(TOK[i], 60, hash60) for i in IDS if TOK[i]}
a.check('q_simhash_wide',
        pd.DataFrame(sorted(sh60.items()), columns=['doc_id', 'simhash']),
        keys=['doc_id'])


def brute_pairs(sh, maxd):
    ks = sorted(sh)
    out = []
    for xi, x in enumerate(ks):
        for y in ks[xi + 1:]:
            d = bin(sh[x] ^ sh[y]).count('1')
            if d <= maxd:
                out.append((x, y, d))
    return out


p32 = brute_pairs(sh32, 3)
a.check('q_simhash_neardup',
        pd.DataFrame(p32, columns=['a', 'b', 'dist']).astype(
            {'dist': 'int32'}),
        keys=['a', 'b'])
a.check('q_simhash_wide_neardup',
        pd.DataFrame(brute_pairs(sh60, 3), columns=['a', 'b', 'dist'])
        .astype({'dist': 'int32'}),
        keys=['a', 'b'])
a.check('q_simhash_wide20_neardup',
        pd.DataFrame(brute_pairs(sh60, 2), columns=['a', 'b', 'dist'])
        .astype({'dist': 'int32'}),
        keys=['a', 'b'])

# ---- near-dup degree profile over the 32-bit pair graph ----
deg = {i: 0 for i in IDS}
for x, y, _ in p32:
    deg[x] += 1
    deg[y] += 1
dd = pd.Series(deg).value_counts().sort_index()
a.check('q_neardup_degree',
        pd.DataFrame({'degree': dd.index.astype('int64'),
                      'n_docs': dd.to_numpy()}),
        keys=['degree'])


# ---- edit-distance verify over simhash candidates ----
def lev(s, t):
    if len(s) > len(t):
        s, t = t, s
    prev = list(range(len(s) + 1))
    for j, cb in enumerate(t, 1):
        cur = [j] + [0] * len(s)
        for i, ca in enumerate(s, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (ca != cb))
        prev = cur
    return prev[-1]


if len(p32) <= 5000:
    ed = []
    for x, y, _ in p32:
        pa, pb = D[x][:250], D[y][:250]
        if abs(len(pa) - len(pb)) > 50:
            continue
        d = lev(pa, pb)
        if d <= 50:
            ed.append((x, y, d))
    a.check('q_editdist_neardup',
            pd.DataFrame(ed, columns=['a', 'b', 'lev'])
            .astype({'lev': 'int32'}),
            keys=['a', 'b'])
else:
    # large-SF guard: a full Python DP over ~100k 250-char candidate
    # pairs is infeasible — verify a deterministic md5-chosen sample of
    # 2000 candidates cell-exact against the engine rows instead (the
    # engine's candidate SET is already proven by q_simhash_neardup)
    samp = sorted(p32, key=lambda p: md5hex(f'{p[0]}|{p[1]}|edsample'))[:2000]
    eng = dump('q_editdist_neardup')
    eng_map = {(r.a, r.b): r.lev for r in eng.itertuples(index=False)}
    bad = 0
    for x, y, _ in samp:
        pa, pb = D[x][:250], D[y][:250]
        exp = None
        if abs(len(pa) - len(pb)) <= 50:
            d = lev(pa, pb)
            exp = d if d <= 50 else None
        got = eng_map.get((x, y))
        if exp != got:
            bad += 1
            print(f'FAIL q_editdist_neardup sample pair ({x},{y}): '
                  f'eng={got} ref={exp}')
    status = 'ok' if bad == 0 else 'FAIL'
    a.results.append(('q_editdist_neardup', status,
                      f'sampled {len(samp)}/{len(p32)} candidates, '
                      f'{bad} mismatches'))
    print(f'{"ok  " if bad == 0 else "FAIL"} q_editdist_neardup '
          f'(sampled {len(samp)} of {len(p32)} candidates)')

# ---- decontamination (5-gram overlap vs bench docs id < 10) ----
bench_sh = set().union(*(shingles(TOK[i], 5) for i in IDS if i < 10))
dc = []
for i in IDS:
    if i < 10:
        continue
    hits = len(shingles(TOK[i], 5) & bench_sh)
    dc.append((i, hits, int(hits == 0)))
ref_dc = pd.DataFrame(dc, columns=['doc_id', 'n_contaminated_ngrams',
                                   'keep']).astype({'keep': 'int32'})
a.check('q_decontaminate', ref_dc, keys=['doc_id'])
a.check('q_decontam_bloom', ref_dc, keys=['doc_id'])

# ---- incremental dedup: batch 60..119 vs corpus < 60 ----
corpus = [i for i in IDS if i < 60]
batch = [i for i in IDS if 60 <= i < 120]
corp_fp = {}
for i in corpus:
    corp_fp.setdefault(fp[i], []).append(i)
corp_buckets = {}
for i in corpus:
    if i in sigs:
        for bk in band_keys(sigs[i]):
            corp_buckets.setdefault(bk, []).append(i)
inc = []
for b in batch:
    ex = corp_fp.get(fp[b])
    if ex:
        inc.append((b, 'exact_dup', min(ex)))
        continue
    cc = set()
    if b in sigs:
        for bk in band_keys(sigs[b]):
            cc.update(corp_buckets.get(bk, ()))
    near = [c for c in sorted(cc)
            if set(TOK[c]) & set(TOK[b]) and
            len(set(TOK[c]) & set(TOK[b])) /
            len(set(TOK[c]) | set(TOK[b])) >= 0.8]
    if near:
        inc.append((b, 'near_dup', min(near)))
    else:
        inc.append((b, 'new', None))
ref_inc = pd.DataFrame(inc, columns=['doc_id', 'status', 'match_id'])
a.check('q_dedup_incremental', ref_inc, keys=['doc_id'])
a.check('q_dedup_indexed', ref_inc, keys=['doc_id'])

# ---- connected components over the minhash pairs (union-find) ----
parent = {}


def find(x):
    while parent.get(x, x) != x:
        parent[x] = parent.get(parent[x], parent[x])
        x = parent[x]
    return x


def union(x, y):
    rx, ry = find(x), find(y)
    if rx != ry:
        parent[max(rx, ry)] = min(rx, ry)


for x, y, _ in mh_pairs:
    union(x, y)
canon = {i: find(i) for i in SUB}
a.check('q_dedup_groups',
        pd.DataFrame({'doc_id': SUB,
                      'canonical_id': [canon[i] for i in SUB]}),
        keys=['doc_id'])

# ---- group-aware split ----
split = []
for i in SUB:
    b = hash32(f'{canon[i]}|gsplit') % 100
    split.append((i, canon[i],
                  'train' if b < 80 else 'val' if b < 90 else 'test'))
a.check('q_group_split',
        pd.DataFrame(split, columns=['doc_id', 'canonical_id', 'split']),
        keys=['doc_id'])

# ---- best-of-cluster (composite quality argmax per group) ----
EN = {"the", "a", "of", "to", "and", "in", "is", "on", "for", "with"}


def quality(text, ts):
    n = len(ts)
    length_score = min(n / 50.0, 1.0)
    stop_score = min((sum(1 for t in ts if t in EN) / n) * 5.0, 1.0) \
        if n else 0.0
    clean = len(re.sub(r'[^a-zA-Z0-9 ]', '', text)) / len(text) \
        if len(text) else 0.0
    return length_score * 0.4 + stop_score * 0.3 + clean * 0.3


qb = pd.DataFrame({'doc_id': SUB,
                   'group_id': [canon[i] for i in SUB],
                   'quality': [quality(D[i], TOK[i]) for i in SUB]})
qb['rk'] = qb.sort_values(['quality', 'doc_id'],
                          ascending=[False, True]) \
    .groupby('group_id').cumcount() + 1
qb = qb.sort_values('doc_id')
a.check('q_dedup_best',
        pd.DataFrame({'doc_id': qb.doc_id, 'group_id': qb.group_id,
                      'quality': qb.quality,
                      'keep': (qb.rk == 1).astype('int32')}),
        keys=['doc_id'], float_round={'quality': 4})

import sys
sys.exit(1 if a.summary() else 0)
