#!/usr/bin/env python3
"""Schema-drift sweep triage (VERDICT r19 ask #4 — wave 5).

Runs after the full board has been driven against the four twins built
by tools/schema_drift_fixtures.py. Triages every FAIL into one of two
declared classes — anything else is a REAL schema-fragility defect and
the sweep exits nonzero:

  DYNAMIC_ORACLE  the ENGINE introspects the schema at runtime and
                  adapts to the drifted vintage, but the frozen oracle
                  SQL cannot — the check_oracle line must show Spark's
                  result carrying the drifted column (proof the engine
                  adapted; a Spark-side MISSING column would be a real
                  regression of the dynamic path).
  LOUD_BOTH       a query whose required column was dropped must fail
                  LOUDLY naming the column (UNRESOLVED_COLUMN in the
                  Verify log) — never silently return NULLs.

Expected board state per twin (sf0.01, 243 queries):
  reorder  243/243 — name-based reads are position-independent.
  widen    243/243 — no narrow-type assumptions.
  addcol   242/243 — q_null_audit adapts (DYNAMIC_ORACLE).
  dropcol  241/243 — q_event_json + q_json_profile loud (LOUD_BOTH).

Usage:
    python3 tools/schema_drift_fixtures.py /root/testdata/sf0.01 /tmp/drift
    for t in reorder widen addcol dropcol; do
        SPARK_GRAFT_CPUS=8 tools/graft-java.sh graft.Verify /tmp/drift/$t /tmp/vdrift_$t \
            > /tmp/vdrift_$t.log 2>&1
        python3 tools/check_oracle.py /tmp/vdrift_$t /tmp/drift/$t > /tmp/chkdrift_$t.log 2>&1
    done
    python3 tools/schema_drift_sweep.py /tmp/chkdrift_{reorder,widen,addcol,dropcol}.log \
        /tmp/vdrift_{reorder,widen,addcol,dropcol}.log
"""
import re
import sys

TWINS = ["reorder", "widen", "addcol", "dropcol"]

# twin -> (dynamic-oracle set, loud-both set)
EXPECTED = {
    "reorder": (set(), set()),
    "widen": (set(), set()),
    "addcol": ({"q_null_audit"}, set()),
    "dropcol": (set(), {"q_event_json", "q_json_profile"}),
}
# the column each dropcol victim must name loudly
LOUD_COLUMN = "props"
# the column the addcol dynamic query must have picked up
ADDED_COLUMN = "drift_note"


def fails_of(chk_log):
    out = {}
    for line in open(chk_log):
        m = re.match(r"FAIL (\S+):", line)
        if m:
            out[m.group(1)] = line.strip()
    return out


def main(args):
    chk = dict(zip(TWINS, args[0:4]))
    vlog = dict(zip(TWINS, args[4:8]))
    bad = 0
    for t in TWINS:
        dyn, loud = EXPECTED[t]
        fails = fails_of(chk[t])
        log = open(vlog[t], errors="replace").read()
        unexpected = set(fails) - dyn - loud
        missing = (dyn | loud) - set(fails)
        weak = 0
        for q in sorted(unexpected):
            print(f"[{t}] UNEXPECTED FAIL: {fails[q]}")
            bad += 1
        for q in sorted(missing):
            print(f"[{t}] expected divergence did not occur (fix landed? "
                  f"update EXPECTED): {q}")
            bad += 1
        for q in sorted(set(fails) & dyn):
            # the check line lists Spark's columns — the drifted column
            # must be IN them (engine adapted), else the dynamic path
            # regressed and this is not the declared divergence
            if not re.search(rf"FAIL {q}: schema mismatch spark=\[[^]]*"
                             rf"'{ADDED_COLUMN}'", fails[q]):
                print(f"[{t}] {q} failed but Spark did NOT adapt to "
                      f"{ADDED_COLUMN} — dynamic-schema path regressed")
                bad += 1
                weak += 1
        for q in sorted(set(fails) & loud):
            if not re.search(rf"{q} failed: .*(?:UNRESOLVED_COLUMN)"
                             rf".*`{LOUD_COLUMN}`", log):
                print(f"[{t}] {q} failed WITHOUT the loud missing-column "
                      f"error naming `{LOUD_COLUMN}` — silent drift leak")
                bad += 1
                weak += 1
        twin_ok = not (unexpected or missing or weak)
        print(f"[{t}] ok: {len(fails)} fails, all declared "
              f"({len(set(fails) & dyn)} dynamic-oracle, "
              f"{len(set(fails) & loud)} loud-both)"
              if twin_ok else f"[{t}] TRIAGE FAILED")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
