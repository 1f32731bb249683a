"""Write-Audit-Publish ingest: the validation engine gating visibility.

A batch lands on an ISOLATED BRANCH of a :class:`dff.tablefmt.Table`,
the rule-DAG validation engine audits exactly the branch delta
(``scan_added`` — never the whole table), and only a green audit
publishes: readers of main never see a row the rules rejected.  A red
audit drops the branch, leaves main bit-identical, and (optionally)
writes the violation rows for triage.  This is the table-format
realization of the reference's gate-scoring-on-rule-verdicts flow
(``02_dff_orchestration.py``) — there the gate was a notebook convention,
here it is the commit log's visibility boundary itself.

At 100 TB the audit cost is O(batch): the branch fork is one metadata
commit, ``scan_added`` opens only the batch's files, and publish is a
fast-forward (or an append-only rebase when main advanced concurrently).

Usage:
  python jobs/wap_ingest.py --table ROOT --src BATCH.parquet
      [--rules spec.json|.dmn] [--max-violation-rate 0.0]
      [--branch NAME] [--violations OUT] [--parallelism N]

Prints ONE JSON line: {"published": bool, "rows": N, "violations": N,
"violation_rate": x, "version": v or null}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="table root")
    ap.add_argument("--src", required=True, help="batch parquet path")
    ap.add_argument("--rules", help="rule spec (.json or .dmn); default built-in")
    ap.add_argument("--max-violation-rate", type=float, default=0.0,
                    help="publish iff violations/rows <= this (default 0)")
    ap.add_argument("--branch", default=None,
                    help="branch name (default: ingest-<uuid8>)")
    ap.add_argument("--violations", help="write rejected batch's violation "
                                         "rows here (parquet)")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--n-files", type=int, default=None)
    args = ap.parse_args(argv)

    from validate import DEFAULT_RULES, build_session

    from dff.ruleset import parse_dmn, parse_json
    from dff.runner import ValidationConfig, ValidationRunner
    from dff.tablefmt import Table

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(args.parallelism, app="dff-wap-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    if args.rules and args.rules.endswith(".dmn"):
        ruleset = parse_dmn(args.rules)
    elif args.rules:
        ruleset = parse_json(args.rules)
    else:
        ruleset = parse_json(DEFAULT_RULES)

    batch = spark.read.parquet(args.src)
    if not Table.exists(args.table):
        Table.create(args.table, batch.schema)
    t = Table(args.table)

    branch_name = args.branch or f"ingest-{uuid.uuid4().hex[:8]}"
    br = t.create_branch(branch_name)
    br.append(batch, n_files=args.n_files)

    # audit EXACTLY the delta this branch added — O(batch), not O(table)
    delta = br.scan_added(spark, since_version=0)
    runner = ValidationRunner(ValidationConfig(ruleset=ruleset))
    result = runner.validate(delta)
    n_rows = delta.count()
    n_viol = result.violations.count()
    rate = (n_viol / n_rows) if n_rows else 0.0

    published_version = None
    if rate <= args.max_violation_rate:
        published_version = t.publish_branch(branch_name)
    elif args.violations:
        result.violations.write.mode("overwrite").parquet(args.violations)
    t.drop_branch(branch_name)

    out = {
        "published": published_version is not None,
        "rows": n_rows,
        "violations": n_viol,
        "violation_rate": round(rate, 6),
        "version": published_version,
        "branch": branch_name,
    }
    print(json.dumps(out))
    if owns_session:  # spark-submit owns it; an embedding caller keeps its own
        spark.stop()
    return out


if __name__ == "__main__":
    main()
