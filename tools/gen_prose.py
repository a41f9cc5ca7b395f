#!/usr/bin/env python3
"""Regenerate the recall / spec-count / oracle-count prose blocks from
artifacts, so the numbers in OPERATORS.md and README.md cannot drift from
what was actually measured (VERDICT r9 ask #2 — the r9 OPERATORS.md PQ
line contradicted RECALL_r9.json because a hand-written number outlived
the fit change that invalidated it).

Blocks are delimited by HTML-comment markers and fully rewritten in
place; everything outside the markers is untouched:

    <!-- GEN:RECALL (tools/gen_prose.py) -->   ... <!-- /GEN:RECALL -->
    <!-- GEN:SPECS (tools/gen_prose.py) -->    ... <!-- /GEN:SPECS -->
    <!-- GEN:ORACLES (tools/gen_prose.py) -->  ... <!-- /GEN:ORACLES -->

Sources:
  - recall: the highest-numbered RECALL_r{N}.json in the repo root
    (floors + per-SF measured recalls, written by graft.RecallProbe)
  - specs: --tests-log <file> (an `sbt test` log; the line
    "Total number of tests run: N" is parsed) or --tests N
  - oracles: --verify-dir <dir> (a graft.Verify output dir: registered
    count = query dump dirs, oracled count = keys of oracle_sql.json)

Usage (typical round close):
    sbt -batch test | tee /tmp/sbt_test.log
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vfinal"
    python3 tools/gen_prose.py --tests-log /tmp/sbt_test.log \
        --verify-dir /tmp/vfinal
"""
import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_recall():
    best, best_n = None, -1
    for f in os.listdir(ROOT):
        m = re.fullmatch(r"RECALL_r(\d+)\.json", f)
        if m and int(m.group(1)) > best_n:
            best, best_n = f, int(m.group(1))
    if best is None:
        sys.exit("no RECALL_r{N}.json found in repo root")
    with open(os.path.join(ROOT, best)) as fh:
        return best, json.load(fh)


def recall_block(name, data):
    lines = [
        f"Measured mean recall of the recall-gated queries, from `{name}`",
        "(regenerate with `graft.RecallProbe --json`; floors are the",
        "in-plan gate constants in SimilarityQueries, set under the",
        "measured minimum per the 0.06-margin policy in their Scaladoc):",
        "",
        "| Query | Floor | " + " | ".join(
            sf for sf in next(iter(data["queries"].values()))["per_sf"]) + " |",
        "|---|---|" + "---|" * len(next(iter(data["queries"].values()))["per_sf"]),
    ]
    for qn, q in data["queries"].items():
        cells = " | ".join(f"{q['per_sf'][sf]['recall']:.2f}" for sf in q["per_sf"])
        lines.append(f"| {qn} | {q['floor']} | {cells} |")
    return "\n".join(lines)


def specs_line(args):
    n = args.tests
    if args.tests_log:
        with open(args.tests_log) as fh:
            for line in fh:
                m = re.search(r"Total number of tests run: (\d+)", line)
                if m:
                    n = int(m.group(1))
    if n is None:
        return None
    return (f"`sbt test` = {n} specs including plan-shape assertions, streaming\n"
            "  MemoryStream drives, golden reference-lifecycle checks, and\n"
            "  scalacheck properties.")


def oracles_line(args):
    if not args.verify_dir:
        return None
    oj = os.path.join(args.verify_dir, "oracle_sql.json")
    with open(oj) as fh:
        oracled = len(json.load(fh))
    registered = len([d for d in os.listdir(args.verify_dir)
                      if d.startswith("q") and
                      os.path.isdir(os.path.join(args.verify_dir, d))])
    return (f"{registered} queries, {oracled} with DuckDB oracle SQL\n"
            "  hash-matching at sf0.001/sf0.01/sf0.1; the model-backed entries\n"
            "  (ANN tiers, semantic dedup, ML metrics) register as theorem\n"
            "  certificates — measured recall/metric invariants emitted as\n"
            "  constant-pinned rows the oracle hash-compares — with the rich\n"
            "  per-query surfaces in-plan recall-gated behind the same floors")


def check_operators_complete(verify_dir):
    """Fail when a registered query name is absent from OPERATORS.md.

    VERDICT r14 found 8 green queries missing from the ledger, caught
    only by a judge-side script; r15 fixed them by hand and r15's ask #4
    is this automation. The registered set is the Verify dump dirs (one
    per SparkEntry.queries entry), so the check runs on exactly what the
    correctness gate saw. Exit 1 (after still writing the GEN blocks)
    so the close ritual trips loudly on a deliberate or accidental
    omission.
    """
    registered = sorted(d for d in os.listdir(verify_dir)
                        if d.startswith("q") and
                        os.path.isdir(os.path.join(verify_dir, d)))
    with open(os.path.join(ROOT, "OPERATORS.md")) as fh:
        text = fh.read()
    # word-boundary match so q_simhash does not satisfy q_simhash_wide
    present = set(re.findall(r"\bq[0-9a-z_]+\b", text))
    missing = [q for q in registered if q not in present]
    if missing:
        print(f"OPERATORS.md is missing {len(missing)} registered "
              f"queries: {', '.join(missing)}", file=sys.stderr)
    return missing


def rewrite(path, tag, body):
    if body is None:
        return False
    begin = f"<!-- GEN:{tag} (tools/gen_prose.py) -->"
    end = f"<!-- /GEN:{tag} -->"
    with open(path) as fh:
        text = fh.read()
    if begin not in text:
        return False
    pattern = re.escape(begin) + r".*?" + re.escape(end)
    new = f"{begin}\n{body}\n{end}"
    # lambda replacement: a plain-string repl would interpret backslashes
    # and \g<...> in the generated body as template escapes
    out = re.sub(pattern, lambda _: new, text, flags=re.DOTALL)
    with open(path, "w") as fh:
        fh.write(out)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests", type=int, help="spec count (overridden by --tests-log)")
    ap.add_argument("--tests-log", help="sbt test log to parse the spec count from")
    ap.add_argument("--verify-dir", help="graft.Verify output dir for query/oracle counts")
    args = ap.parse_args()

    name, data = latest_recall()
    blocks = {
        "RECALL": recall_block(name, data),
        "SPECS": specs_line(args),
        "ORACLES": oracles_line(args),
    }
    for path in (os.path.join(ROOT, "OPERATORS.md"), os.path.join(ROOT, "README.md")):
        for tag, body in blocks.items():
            if rewrite(path, tag, body):
                print(f"updated GEN:{tag} in {os.path.basename(path)}")

    if args.verify_dir and check_operators_complete(args.verify_dir):
        sys.exit(1)


if __name__ == "__main__":
    main()
