#!/usr/bin/env python3
"""Degenerate-cardinality sweep triage (VERDICT r18 ask #3 — wave 4).

Runs the full oracle board against the three degenerate twins built by
tools/degenerate_fixtures.py and triages every FAIL into one of three
declared classes — anything else is a REAL defect and the sweep exits
nonzero:

  LOUD_CONTRACT   trainers/quantizers on empty or sub-k input must fail
                  LOUDLY with the named contract message (the r18 triage
                  doctrine: an empty-corpus index build should fail, not
                  return an empty index). The triage verifies the Verify
                  log carries the declared message for each.
  CERT_LITERAL    theorem-certificate queries whose FROM-less oracle pins
                  fixture facts (n_queries = AnnQueryIdBound, recall_ok
                  TRUE) — on a sub-20-vector corpus the pinned literals
                  cannot hold by construction.
  ENGINE_DIVERGENCE grouping-set queries over an EMPTY relation: Spark's
                  Expand→HashAggregate emits zero rows where the SQL
                  standard emits one grand-total row. Declared in
                  ScalarQueries.cubeSummary's Scaladoc, pinned in
                  PropertySpec.

Usage:
    python3 tools/degenerate_fixtures.py /root/testdata/sf0.01 /tmp/degen
    for t in empty one nulltext; do
        SPARK_GRAFT_CPUS=8 tools/graft-java.sh graft.Verify /tmp/degen/$t /tmp/vdeg_$t > /tmp/vdeg_$t.log 2>&1
        python3 tools/check_oracle.py /tmp/vdeg_$t /tmp/degen/$t > /tmp/chk_$t.log 2>&1
    done
    python3 tools/degenerate_sweep.py /tmp/chk_{empty,one,nulltext}.log \
        /tmp/vdeg_{empty,one,nulltext}.log
"""
import re
import sys

# queries whose fit layer carries a declared loud-failure require();
# the triage demands the CONTRACT message in the verify log, so a
# regression back to the cryptic internal error (QuantileSummaries /
# ArrayIndexOutOfBounds) is itself a failure
LOUD = {
    "q_ml_classifier": "loud-failure contract",
    "q_ml_importances": "loud-failure contract",
    "q_ml_regressor": "loud-failure contract",
    "q_ml_serve": "loud-failure contract",
    "q_ann_ivf": "loud-failure contract",
    "q_ann_ivf_indexed": "loud-failure contract",
    "q_ann_ivfpq": "fitPq: corpus is empty|loud-failure contract",
    "q_ann_pq": "fitPq: corpus is empty|loud-failure contract",
    "q_semantic_dedup": "loud-failure contract",
}
# FROM-less pinned-literal certificates (recallCert): sub-AnnQueryIdBound
# corpora cannot satisfy n_queries=20 / recall_ok=TRUE by construction
CERT = {"q_ann_lsh", "q_ann_pq"}
# declared Spark-vs-standard divergence on EMPTY input only
ENGINE_EMPTY = {"q_cube", "q_rollup", "q_grouping_sets"}

EXPECTED = {
    # twin -> (loud set, cert set, engine set)
    "empty": (set(LOUD), CERT, ENGINE_EMPTY),
    # on the one-row twin the PQ fit succeeds (1 vector) but its cert
    # literals still cannot hold; the quantizer/trainer contracts fire
    "one": (set(LOUD) - {"q_ann_pq"}, CERT, set()),
    "nulltext": (set(), set(), set()),
}


def fails_of(chk_log):
    out = {}
    for line in open(chk_log):
        m = re.match(r"FAIL (\S+):", line)
        if m:
            out[m.group(1)] = line.strip()
    return out


def main(args):
    # args alternate: chk_empty chk_one chk_nulltext vlog_empty vlog_one
    # vlog_nulltext — order must match EXPECTED key order below
    twins = ["empty", "one", "nulltext"]
    chk = dict(zip(twins, args[0:3]))
    vlog = dict(zip(twins, args[3:6]))
    bad = 0
    for t in twins:
        loud, cert, engine = EXPECTED[t]
        fails = fails_of(chk[t])
        log = open(vlog[t], errors="replace").read()
        unexpected = set(fails) - loud - cert - engine
        missing = (loud | cert | engine) - set(fails)
        for q in sorted(unexpected):
            print(f"[{t}] UNEXPECTED FAIL: {fails[q]}")
            bad += 1
        for q in sorted(missing):
            print(f"[{t}] expected divergence did not occur (fix landed? "
                  f"update EXPECTED): {q}")
            bad += 1
        cryptic = 0
        for q in sorted(set(fails) & loud):
            pat = LOUD[q]
            if not re.search(rf"{q} failed: .*(?:{pat})", log):
                print(f"[{t}] {q} failed WITHOUT the declared contract "
                      f"message — cryptic internal error leaked")
                bad += 1
                cryptic += 1
        # the summary condition must include the contract-message check
        # (advice r19): printing "ok ... all declared" while a cryptic
        # internal error leaked is misleading exactly when it matters
        twin_ok = not (unexpected or missing or cryptic)
        print(f"[{t}] ok: {len(fails)} fails, all declared "
              f"({len(set(fails) & loud)} loud-contract, "
              f"{len(set(fails) & cert)} cert-literal, "
              f"{len(set(fails) & engine)} engine-divergence)"
              if twin_ok else f"[{t}] TRIAGE FAILED")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
