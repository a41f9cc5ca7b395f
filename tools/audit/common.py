"""Shared harness for the independent-reference audits (round 16 legs
4/4b/4c institutionalized in round 17).

Modality: every statistic is recomputed FROM SCRATCH in Python/NumPy/
pandas straight off the fixture parquet — never by mirroring the Spark
or DuckDB SQL — and compared cell-exact against the engine's Verify
dump. This is the one defense against the wrong-formula-in-BOTH-engines
class the mirrored oracle is structurally blind to.

Float columns that the engine rounds to k digits are compared as:
  engine == rnd(ref, k)            -> exact match
  |engine - ref| <= 0.5*10^-k + e  -> rounding-boundary cell (reported,
                                      not a defect: last-ulp engine
                                      aggregation order at a tie)
  otherwise                        -> MISMATCH (a real formula defect)
"""
import json
import os
import numpy as np
import pandas as pd

# override per-run: GRAFT_AUDIT_SF=/root/testdata/sf0.1
#                   GRAFT_AUDIT_DUMP=/tmp/v01x
SF = os.environ.get('GRAFT_AUDIT_SF', '/root/testdata/sf0.01')
DUMP = os.environ.get('GRAFT_AUDIT_DUMP', '/tmp/v1')


def events():
    e = pd.read_parquet(f'{SF}/events.parquet')
    # Tables.read normalizes the timestamp[us] column to epoch-NANO longs
    e = e.copy()
    e['tns'] = e['ts'].astype('int64') * 1000
    return e


def documents():
    return pd.read_parquet(f'{SF}/documents.parquet')


def embeddings():
    return pd.read_parquet(f'{SF}/embeddings.parquet')


def table(name):
    return pd.read_parquet(f'{SF}/{name}.parquet')


def dump(q):
    return pd.read_parquet(f'{DUMP}/{q}')


def rnd(x, s):
    """The engines' shared deterministic rounding: floor(x*10^s+0.5)/10^s."""
    p = 10.0 ** s
    return np.floor(np.asarray(x, dtype='float64') * p + 0.5) / p


def cents(v):
    """centsOf: CAST(floor(v*100 + 0.5) AS BIGINT)."""
    return np.floor(np.asarray(v, dtype='float64') * 100 + 0.5).astype('int64')


def day_of(tns):
    """dayOf: calendar day of an epoch-nano int64 (UTC)."""
    return pd.to_datetime(tns // 1000, unit='us').dt.date


class Audit:
    def __init__(self, family):
        self.family = family
        self.results = []

    def check(self, name, ref, keys, float_round=None, float_exact=(),
              engine=None):
        """Compare the engine dump for `name` against reference frame `ref`.

        keys: sort columns (must make rows unique in both frames).
        float_round: {col: k} — engine column is rnd(ref_col, k).
        float_exact: float columns expected bit-equal (exact rationals).
        """
        float_round = float_round or {}
        try:
            eng = dump(name) if engine is None else engine
        except Exception as ex:  # dump missing
            self.results.append((name, 'ERR', f'no dump: {ex}'))
            print(f'ERR  {name}: no dump: {ex}')
            return
        ref = ref.copy()
        if list(eng.columns) != list(ref.columns):
            self.results.append(
                (name, 'FAIL', f'cols eng={list(eng.columns)} ref={list(ref.columns)}'))
            print(f'FAIL {name}: columns eng={list(eng.columns)} ref={list(ref.columns)}')
            return
        if len(eng) != len(ref):
            self.results.append((name, 'FAIL', f'rows eng={len(eng)} ref={len(ref)}'))
            print(f'FAIL {name}: rows eng={len(eng)} ref={len(ref)}')
            return
        eng = eng.sort_values(keys, na_position='last').reset_index(drop=True)
        ref = ref.sort_values(keys, na_position='last').reset_index(drop=True)
        bad = []
        boundary = 0
        for c in eng.columns:
            ev = eng[c]
            rv = ref[c]
            if c in float_round:
                k = float_round[c]
                e = ev.to_numpy(dtype='float64', na_value=np.nan)
                runr = rv.to_numpy(dtype='float64', na_value=np.nan)
                r = rnd(runr, k)
                both_nan = np.isnan(e) & np.isnan(r)
                eq = (e == r) | both_nan
                if not eq.all():
                    # boundary window: half a rounding step, plus a
                    # relative term for large-magnitude raw double sums
                    # (order-of-accumulation noise is ~|v|*n*ulp — at
                    # 5e9 over 600k rows that exceeds a 1e-4 step).
                    # The relative term is CAPPED at 4 rounding steps so
                    # a genuine last-digit formula defect on a big-sum
                    # column cannot hide inside the widened window
                    # (ADVICE r18: uncapped |v|*1e-12 at 5e9 is ~50
                    # steps wide at k=4).
                    rel = np.minimum(np.abs(runr) * 1e-12,
                                     4.0 * 10.0 ** (-k))
                    step = 0.5 * 10.0 ** (-k) * 1.000001 + 1e-12 + rel
                    near = np.abs(e - runr) <= step
                    hard = ~eq & ~near
                    boundary += int((~eq & near).sum())
                    if hard.any():
                        i = int(np.argmax(hard))
                        bad.append((c, i, e[i], runr[i]))
            elif c in float_exact or str(ev.dtype).startswith('float'):
                e = ev.to_numpy(dtype='float64', na_value=np.nan)
                r = rv.to_numpy(dtype='float64', na_value=np.nan)
                eq = (e == r) | (np.isnan(e) & np.isnan(r))
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append((c, i, e[i], r[i]))
            else:
                ev2 = ev.astype('object').where(ev.notna(), None)
                rv2 = rv.astype('object').where(rv.notna(), None)
                neq = [i for i, (a, b) in enumerate(zip(ev2, rv2))
                       if not _veq(a, b)]
                if neq:
                    i = neq[0]
                    bad.append((c, i, ev2[i], rv2[i]))
        # Escalate when boundary cells stop being isolated tie sites:
        # accumulation noise touches a handful of rows; a systematic
        # last-digit formula defect touches a large fraction. (ADVICE
        # r18: without this, such a defect reads as 'ok (N boundary)'.)
        boundary_cap = max(5, int(0.02 * len(eng)))
        if not bad and boundary > boundary_cap:
            bad.append(('<boundary-fraction>', -1, boundary,
                        f'> cap {boundary_cap} of {len(eng)} rows'))
        if bad:
            c, i, a, b = bad[0]
            keyinfo = dict(eng.loc[i, keys]) if i >= 0 else '{}'
            msg = (f'{len(bad)} bad col(s); first: col={c} row={i} '
                   f'keys={keyinfo} eng={a!r} ref={b!r}')
            self.results.append((name, 'FAIL', msg))
            print(f'FAIL {name}: {msg}')
        else:
            note = f' ({boundary} boundary cells)' if boundary else ''
            self.results.append((name, 'ok', f'{len(eng)} rows{note}'))
            print(f'ok   {name} ({len(eng)} rows{note})')

    def summary(self):
        ok = sum(1 for _, s, _ in self.results if s == 'ok')
        print(f'\n{self.family}: {ok}/{len(self.results)} match')
        fails = [(n, m) for n, s, m in self.results if s != 'ok']
        for n, m in fails:
            print(f'  DEFECT? {n}: {m}')
        return len(fails)


def _veq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            return (fa == fb) or (np.isnan(fa) and np.isnan(fb))
        except Exception:
            return False
    if hasattr(a, 'isoformat') or hasattr(b, 'isoformat'):
        return str(a) == str(b)
    return a == b
