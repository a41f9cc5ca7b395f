"""Independent-reference audit of the ML metric formulas (round 17).

The four GBT certificate queries are the one family whose values the
DuckDB oracle cannot check. This audit closes the metric-formula gap:
`graft.MlAudit <sfDir> <outDir>` dumps the scored holdout frames plus
the metrics the engine emitted, and every metric is re-derived here in
NumPy from the raw (label, score, prediction) / (target, prediction)
rows — tie-aware Mann-Whitney AUC, accuracy, the confusion partition,
RMSE/MSE/MAE/R², directional accuracy, the serve ranking and the
importance invariants.

Produce the dump first:
  SPARK_GRAFT_CPUS=8 tools/graft-java.sh graft.MlAudit \
      /root/testdata/sf0.01 /tmp/mlaudit
"""
import os
import numpy as np
import pandas as pd

D = os.environ.get('GRAFT_MLAUDIT_DUMP', '/tmp/mlaudit')
fails = []
n_checks = 0


def check(name, ok, detail):
    global n_checks
    n_checks += 1
    print(f'{"ok  " if ok else "FAIL"} {name}: {detail}')
    if not ok:
        fails.append(name)


# ---- classifier metrics ----
cs = pd.read_parquet(f'{D}/cls_scored')
cm = pd.read_parquet(f'{D}/cls_metrics').iloc[0]
lab = cs.label.to_numpy()
pred = cs.prediction.to_numpy()
score = cs.score.to_numpy()
n = len(cs)
tp = int(((lab == 1) & (pred == 1)).sum())
fp = int(((lab == 0) & (pred == 1)).sum())
fn = int(((lab == 1) & (pred == 0)).sum())
tn = int(((lab == 0) & (pred == 0)).sum())
check('confusion', (cm.tp, cm.fp, cm.fn, cm.tn, cm.n) ==
      (tp, fp, fn, tn, n),
      f'eng=({cm.tp},{cm.fp},{cm.fn},{cm.tn},n={cm.n}) '
      f'ref=({tp},{fp},{fn},{tn},n={n})')
acc = (tp + tn) / n
check('accuracy', abs(cm.accuracy - acc) < 1e-12,
      f'eng={cm.accuracy:.6f} ref={acc:.6f}')

# tie-aware Mann-Whitney AUC (exact); Spark's evaluator bins the ROC at
# 1000 points, so compare within the binning tolerance and report delta
order = np.argsort(score, kind='mergesort')
ranks = np.empty(n)
s_sorted = score[order]
i = 0
r = np.empty(n)
while i < n:
    j = i
    while j + 1 < n and s_sorted[j + 1] == s_sorted[i]:
        j += 1
    r[i:j + 1] = (i + j) / 2.0 + 1.0
    i = j + 1
ranks[order] = r
n1 = int((lab == 1).sum())
n0 = n - n1
auc = (ranks[lab == 1].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0)
tol = 1e-9 if n <= 1000 else 0.01
check('auc', abs(cm.auc - auc) < tol,
      f'eng={cm.auc:.6f} exact-MW={auc:.6f} delta={abs(cm.auc-auc):.6f} '
      f'(n={n}, Spark bins ROC at 1000 pts)')
check('auc_floor', cm.auc > 0.70 and auc > 0.70,
      f'both clear the 0.70 gate floor (eng={cm.auc:.4f})')

# ---- regressor metrics ----
rs = pd.read_parquet(f'{D}/reg_scored')
rm = pd.read_parquet(f'{D}/reg_metrics').iloc[0]
y = rs.target.to_numpy()
p = rs.prediction.to_numpy()
err = y - p
rmse = float(np.sqrt(np.mean(err ** 2)))
mae = float(np.mean(np.abs(err)))
r2 = 1.0 - float((err ** 2).sum()) / float(((y - y.mean()) ** 2).sum())
dir_acc = float(np.mean(np.sign(y) == np.sign(p)))
rel = lambda a, b: abs(a - b) / max(1e-12, abs(b))
check('rmse', rel(rm.rmse, rmse) < 1e-8, f'eng={rm.rmse} ref={rmse}')
check('mse', rel(rm.mse, rmse * rmse) < 1e-8, f'eng={rm.mse}')
check('mae', rel(rm.mae, mae) < 1e-8, f'eng={rm.mae} ref={mae}')
check('r2', rel(rm.r2, r2) < 1e-6, f'eng={rm.r2} ref={r2}')
check('dir_accuracy', abs(rm.dir_accuracy - dir_acc) < 1e-12,
      f'eng={rm.dir_accuracy:.6f} ref={dir_acc:.6f} '
      f'(floor 0.60 {"cleared" if dir_acc > 0.60 else "VIOLATED"})')
check('mae_le_rmse', mae <= rmse + 1e-12, 'power-mean inequality holds')

# ---- serve ranking ----
sv = pd.read_parquet(f'{D}/serve')
exp = rs.sort_values(['prediction', 'event_id'],
                     ascending=[False, True]).head(20)
check('serve_ranking',
      list(sv.event_id) == list(exp.event_id) and
      np.allclose(sv.predicted_return, exp.prediction) and
      np.allclose(sv.predicted_value,
                  exp.value * (1.0 + exp.prediction)),
      'top-20 by (prediction desc, event_id) with predicted_value = '
      'value*(1+prediction)')

# ---- importances invariants ----
imp = pd.read_parquet(f'{D}/importances')
check('importances',
      len(imp) == 9 and (imp.importance >= 0).all() and
      abs(imp.importance.sum() - 1.0) < 1e-6 and
      (imp.importance > 0).sum() >= 3,
      f'slate={len(imp)}, sum={imp.importance.sum():.9f}, '
      f'nonzero={(imp.importance > 0).sum()}')

print(f'\nMlMetrics: {n_checks - len(fails)}/{n_checks} match'
      + (f'; FAILS: {fails}' if fails else ''))
import sys
sys.exit(1 if fails else 0)
