"""Text reporting: rule-DAG dump + per-constraint hit totals.

The reference renders its decision graph with Graphviz and highlights the
triggered node per scored record (/root/reference/02_dff_orchestration.py:
104-127,362-397) and prints a VALID/FRAUDULENT banner (:402-405).  A
distributed engine reports in aggregate instead: a driver-side text DAG
dump (same information as the Graphviz render) and per-constraint hit
totals rolled up from the partition-metrics table — no extra scan of the
input, the counts ride the metrics map the runner already computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ruleset import RuleSet


def dag_text(ruleset: RuleSet) -> str:
    """Topologically-ordered text rendering of the rule DAG.

    One line per decision node: id, kind (sql predicate vs scorer),
    dependencies, and the decision name — the text twin of the reference's
    Graphviz digraph (02_dff_orchestration.py:104-127).
    """
    lines = [
        f"rule DAG {ruleset.version!r} "
        f"(sensitivity {ruleset.sensitivity}, first-match-wins):"
    ]
    for c in ruleset.topo_order:
        dep = f"  <- {', '.join(c.requires)}" if c.requires else ""
        lines.append(f"  {c.id:<14} {c.kind:<5} {c.name!r}{dep}")
    return "\n".join(lines)


def constraint_totals(partition_metrics: DataFrame) -> DataFrame:
    """Whole-run violation totals per constraint id.

    Input is the runner's per-partition metrics (n_parts rows); the
    ``by_constraint`` map is exploded and summed — kilobytes of driver-side
    work, no input re-scan.
    """
    return (
        partition_metrics.where(F.col("by_constraint").isNotNull())
        .select(F.explode("by_constraint").alias("constraint_id", "n"))
        .groupBy("constraint_id")
        .agg(F.sum("n").cast("long").alias("hits"))
    )


def render_report(ruleset: RuleSet, partition_metrics) -> str:
    """DAG dump + per-constraint hit table + partition pass/fail banner —
    the aggregate analog of the reference's triggered-node highlight and
    VALID/FRAUDULENT banner (02_dff_orchestration.py:362-405).

    ``partition_metrics`` may be the metrics DataFrame OR its already-
    collected rows (callers that just ran ``.collect()`` for other reasons
    should pass the rows — re-collecting re-runs the whole metrics lineage
    as an extra Spark job)."""
    if isinstance(partition_metrics, DataFrame):
        metrics = partition_metrics.select(
            "rows", "violations", "verdict", "by_constraint"
        ).collect()
    else:
        metrics = partition_metrics
    totals: dict[str, int] = {}
    for m in metrics:
        for cid, n in (m["by_constraint"] or {}).items():
            totals[cid] = totals.get(cid, 0) + int(n)
    rows = sum(m["rows"] for m in metrics)
    violations = sum(m["violations"] for m in metrics)
    failed = sum(1 for m in metrics if m["verdict"] == "fail")
    lines = [dag_text(ruleset), ""]
    lines.append(f"rows validated:     {rows:,}")
    lines.append(f"violations:         {violations:,}")
    lines.append(
        f"partitions:         {len(metrics):,} ({failed:,} fail, "
        f"{len(metrics) - failed:,} pass)"
    )
    if totals:
        lines.append("hits by constraint:")
        width = max(len(c) for c in totals)
        for cid in sorted(totals, key=totals.get, reverse=True):
            lines.append(f"  {cid:<{width}}  {totals[cid]:,}")
    untriggered = [
        c.id for c in ruleset.topo_order
        if c.id not in totals
    ]
    if untriggered:
        lines.append(f"rules never triggered: {', '.join(untriggered)}")
    banner = "ALL PARTITIONS VALID" if failed == 0 else f"{failed} PARTITIONS FAILED"
    lines += ["", banner]
    return "\n".join(lines)
