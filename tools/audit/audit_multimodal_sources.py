"""Independent-reference audit of MultimodalQueries + SourceQueries
(round 17). The multimodal grid is closed-form — recomputed in numpy
float32 with brute-force Hamming pairs; the format roundtrips are
identity over the events fixture; the bucketed join is recomputed as a
plain pandas join.
"""
import numpy as np
import pandas as pd
from common import Audit, events, table, rnd, cents

a = Audit('Multimodal+Sources')

# ---- multimodal closed-form grid ----
ids = np.arange(64)
cells = np.arange(16)
g = pd.DataFrame([(int(d), int(c), int((d * 17 + c * 13) % 256))
                  for d in ids for c in cells],
                 columns=['doc_id', 'cell', 'v'])
luma32 = np.array([np.float32(v / 255.0) for v in g.v], dtype='float64')
g['luma'] = np.where(g.doc_id % 2 == 0, luma32, np.nan)
a.check('q_multimodal_decode',
        g[['doc_id', 'cell', 'luma']].astype({'cell': 'int64'}),
        keys=['doc_id', 'cell'], float_round={'luma': 6})

ph = g[g.doc_id % 2 == 0].assign(bit=(g.v > 127).astype('int64'))
ah = ph.groupby('doc_id').apply(
    lambda s: int(sum(1 << c for c, b in zip(s.cell, s.bit) if b)),
    include_groups=False).rename('ahash').reset_index()
a.check('q_image_phash', ah, keys=['doc_id'])

hs = dict(zip(ah.doc_id, ah.ahash))
pp = [(x, y, bin(hs[x] ^ hs[y]).count('1'))
      for i, x in enumerate(sorted(hs)) for y in sorted(hs)[i + 1:]
      if bin(hs[x] ^ hs[y]).count('1') <= 2]
a.check('q_image_phash_dedup',
        pd.DataFrame(pp, columns=['a', 'b', 'hamming']),
        keys=['a', 'b'])

# ---- format roundtrips: identity over the events fixture ----
e = events()
ident = pd.DataFrame({'event_id': e.event_id, 'ts_us': e.tns // 1000,
                      'user_id': e.user_id, 'event_type': e.event_type,
                      'value': e.value})
for q in ('q_compaction_roundtrip', 'q_orc_roundtrip', 'q_json_roundtrip',
          'q_csv_roundtrip'):
    a.check(q, ident, keys=['event_id'], float_exact=('value',))

# ---- q_value_recon (r20 wave 5): the two-vintage reconstruction must
# return exactly round(value*1e6) for EVERY event — the drifted rows'
# base+change sum is bit-identical to the direct path by construction
# (exact longs end-to-end). Values sit ~1e-7 off integers, so rint's
# half-even vs the engines' half-up can never disagree here.
recon = pd.DataFrame({'event_id': e.event_id,
                      'value_micros': np.rint(e.value * 1e6).astype('int64')})
a.check('q_value_recon', recon, keys=['event_id'])

# ---- bucketed join == plain join + rollup ----
orders = table('orders')
cust = table('customer')
bj = orders.merge(cust, left_on='o_custkey', right_on='c_custkey')
bj['c'] = cents(bj.o_totalprice)
bg = bj.groupby('c_mktsegment').agg(n_orders=('c', 'size'),
                                    s=('c', 'sum')).reset_index()
bg['sum_price'] = bg.s / 100.0
a.check('q_bucketed_join', bg[['c_mktsegment', 'n_orders', 'sum_price']],
        keys=['c_mktsegment'], float_exact=('sum_price',))

import sys
sys.exit(1 if a.summary() else 0)
