#!/usr/bin/env python3
"""Per-query minima across N same-tree closing-bench runs — the
era-robust comparison series BASELINE.md's r17+ closing protocol
records (single whole-board reads carry +-12% uniform-era noise on
this box; per-query minima are stable across eras).

Usage: tools/bench_minima.py run1.json run2.json [run3.json ...]
Writes bench_minima.json next to the repo root and prints the summary.
Accepts either a raw Bench JSON line artifact or a driver BENCH_r{N}
wrapper (the metric line is searched in its `tail`).
"""
import json
import sys
import os


def load_metric(path):
    # a raw Bench capture may hold two metric lines (full + rounded
    # summary) — the first line is the authoritative record
    first = open(path).readline().strip()
    if first.startswith('{"metric"'):
        d = json.loads(first)
    else:
        d = json.load(open(path))
    if 'queries' in d:
        return d
    best = None
    for line in (d.get('tail') or '').splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            try:
                best = json.loads(line[i:])
            except ValueError:
                pass
    if best is None:
        raise SystemExit(f'{path}: no metric JSON found')
    return best


def main(paths):
    runs = [load_metric(p) for p in paths]
    totals = [r.get('value') for r in runs]
    warmups = [r.get('warmup_sec') for r in runs]
    qsets = [r['queries'] for r in runs]
    common = set(qsets[0])
    union = set(qsets[0])
    for q in qsets[1:]:
        common &= set(q)
        union |= set(q)
    # A truncated/partial run must not silently shrink min-sum coverage
    # and flatter the round-over-round comparison (ADVICE r18): error
    # when the runs disagree on the query set, unless explicitly allowed.
    if common != union:
        missing = {os.path.basename(p): sorted(union - set(q))
                   for p, q in zip(paths, qsets) if set(q) != union}
        msg = (f'runs disagree on the query set '
               f'(common {len(common)} < union {len(union)}): {missing}')
        if os.environ.get('GRAFT_MINIMA_ALLOW_PARTIAL', '0') == '1':
            print(f'WARNING: {msg} — min-sum covers the COMMON set only')
        else:
            raise SystemExit(
                f'ERROR: {msg}\n(set GRAFT_MINIMA_ALLOW_PARTIAL=1 to '
                f'accept a common-set min-sum)')
    minima = {k: min(q[k] for q in qsets) for k in sorted(common)}
    out = {
        'n_runs': len(runs),
        'inputs': [os.path.basename(p) for p in paths],
        'raw_totals_sec': totals,
        'warmups_sec': warmups,
        'n_queries_common': len(common),
        'min_sum_sec': round(sum(minima.values()), 3),
        'minima': {k: round(v, 4) for k, v in minima.items()},
    }
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'bench_minima.json')
    with open(dst, 'w') as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f'runs: {len(runs)}  raw totals: '
          f'{[round(t, 1) for t in totals]}  '
          f'min-sum over {len(common)} queries: {out["min_sum_sec"]} s')
    print(f'wrote {dst}')


if __name__ == '__main__':
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
