"""Stats-only validation fast path over the native table format.

The reference evaluates every rule against every row (pandasql over the
full frame, ``02_dff_orchestration.py``).  At 10^12 files that is the one
cost you cannot pay — but a table-format manifest already carries per-file
``{min, max, nulls, rows}`` for every column (``dff/tablefmt.py:138``), and
for the range/null constraint family those stats DECIDE most files without
touching a data page:

- ``not_null(col)``      -> violations == stats.nulls, always exact.
- ``col >= lo``          -> min >= lo and nulls == 0  => 0 violations;
                            max <  lo                 => all rows violate;
                            min >= lo and nulls  > 0  => exactly ``nulls``;
                            otherwise scan the file.
- ``col <= hi``          -> symmetric.
- ``between(lo, hi)``    -> conjunction of the two.

NULL counts as a violation for every rule here (a range rule a NULL cannot
satisfy), which is what makes the nulls-only cases exact rather than
bounds.

Only the undecidable (file, rule) pairs are scanned — in ONE distributed
pass: the undecided files are read once, each row is joined (broadcast)
against a tiny (file -> which-rules-undecided) flag frame, and a rule's
scan count only accumulates over files where the stats could not decide
it.  Decided counts are folded in driver-side from the manifest — O(files)
integers, no data IO.  On a date-clustered 100 TB table a "content_length
between" rule scans only the files whose min/max straddle the bounds; the
provably-clean majority is certified from metadata alone.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from dff.tablefmt import Table, _name_map_for

_OPS = (">=", "<=", "between", "not_null")


@dataclass(frozen=True)
class StatsRule:
    """One stats-decidable constraint: ``col op (lo, hi)``."""

    constraint_id: str
    col: str
    op: str  # one of _OPS
    lo: float | int | str | None = None
    hi: float | int | str | None = None

    def __post_init__(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"op {self.op!r} not in {_OPS}")
        if self.op in (">=", "between") and self.lo is None:
            raise ValueError(f"{self.constraint_id}: op {self.op!r} needs lo")
        if self.op in ("<=", "between") and self.hi is None:
            raise ValueError(f"{self.constraint_id}: op {self.op!r} needs hi")

    def violation_expr(self) -> F.Column:
        """Row-level violation predicate — the scan-path ground truth the
        stats decisions must agree with (pinned by tests)."""
        c = F.col(self.col)
        if self.op == "not_null":
            return c.isNull()
        cond = c.isNull()
        if self.op in (">=", "between"):
            cond = cond | (c < F.lit(self.lo))
        if self.op in ("<=", "between"):
            cond = cond | (c > F.lit(self.hi))
        return cond


def _decide(rule: StatsRule, entry: dict) -> int | None:
    """Exact violation count for one file from manifest stats, or None if
    the stats cannot decide (file must be scanned)."""
    st = (entry.get("stats") or {}).get(rule.col)
    if st is None:
        return None  # no complete stats for this column -> scan
    rows = entry["rows"]
    nulls = st["nulls"]
    if rule.op == "not_null":
        return nulls
    lo_ok = rule.op == "<=" or (st["min"] is not None and st["min"] >= rule.lo)
    hi_ok = rule.op == ">=" or (st["max"] is not None and st["max"] <= rule.hi)
    if lo_ok and hi_ok:
        return nulls  # every non-null row satisfies the range
    if rows == nulls:
        return rows  # all-null file: every row violates a range rule
    if st["min"] is None:
        return None
    if rule.op in (">=", "between") and st["max"] < rule.lo:
        return rows  # entirely below the lower bound
    if rule.op in ("<=", "between") and st["min"] > rule.hi:
        return rows  # entirely above the upper bound
    return None


@dataclass
class StatsValidationPlan:
    """What the manifest decided vs what must be scanned — the pruning
    measurement (``files_scanned / files_total`` is the headline)."""

    decided_counts: dict  # constraint_id -> violations certain from stats
    scan_files: list  # manifest entries needing any scan
    scan_flags: dict  # file basename -> set of undecided constraint_ids
    files_total: int

    @property
    def files_scanned(self) -> int:
        return len(self.scan_files)


def plan_stats_validation(
    table: Table, rules: list[StatsRule], version: int | None = None
) -> StatsValidationPlan:
    if table.delete_entries(version):
        # manifest stats describe the file AS WRITTEN; pending equality
        # deletes remove rows the stats still count, so every stats-only
        # decision would overcount.  Fold tombstones in first.
        raise ValueError(
            "stats-only validation needs no pending MOR deletes: run "
            "table.compact() (or any full rewrite) first"
        )
    entries = table.entries(version)
    snap = table._snapshot(version)
    cur_names = {fl["name"] for fl in (snap.get("fields") or [])}
    maps: dict = {}
    decided = {r.constraint_id: 0 for r in rules}
    scan_flags: dict = {}
    scan_files = []
    for e in entries:
        # schema evolution: manifest stats are keyed by the file's
        # PHYSICAL (write-time) names — translate to current names per
        # entry through the field ids, and give fields added AFTER the
        # file was written exact all-NULL stats (that is precisely what
        # the file reads for them).  Identity for legacy snapshots.
        sid = e.get("schema_id")
        if sid not in maps:
            maps[sid] = _name_map_for(snap, sid)
        nmap = maps[sid]
        if nmap is not None:
            raw = e.get("stats") or {}
            stats = {
                cur: raw[phys] for cur, phys in nmap.items() if phys in raw
            }
            for n in cur_names - set(nmap):
                stats[n] = {"min": None, "max": None, "nulls": e["rows"]}
            e = dict(e, stats=stats)
        undecided = set()
        for r in rules:
            n = _decide(r, e)
            if n is None:
                undecided.add(r.constraint_id)
            else:
                decided[r.constraint_id] += n
        if undecided:
            scan_flags[os.path.basename(e["path"])] = undecided
            scan_files.append(e)
    return StatsValidationPlan(decided, scan_files, scan_flags, len(entries))


def validate_table_stats(
    spark: SparkSession,
    table: Table,
    rules: list[StatsRule],
    version: int | None = None,
) -> DataFrame:
    """Per-constraint violation totals: manifest-decided counts plus ONE
    distributed pass over only the undecidable files.  Returns
    ``(constraint_id, violations)`` — identical to what a full scan with
    ``violation_expr`` would produce (pinned by tests + driver gate)."""
    pl = plan_stats_validation(table, rules, version)
    scanned = {r.constraint_id: 0 for r in rules}
    if pl.scan_files:
        snap = table._snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        # evolution-aware read (plan already refused pending deletes):
        # files written under old names/types project to current ones;
        # input_file_name survives the per-era projections
        df = table._read_with_deletes(
            spark, pl.scan_files, schema, [], snap=snap
        ).withColumn(
            "__file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        # tiny (file -> undecided flags) frame, broadcast: a rule's scan
        # count accumulates only over files its stats could not decide
        flag_schema = T.StructType(
            [T.StructField("__file", T.StringType())]
            + [T.StructField(f"__u_{i}", T.BooleanType()) for i in range(len(rules))]
        )
        flag_rows = [
            tuple([name] + [r.constraint_id in und for r in rules])
            for name, und in pl.scan_flags.items()
        ]
        flags = spark.createDataFrame(flag_rows, flag_schema)
        aggs = [
            F.sum(
                F.when(F.col(f"__u_{i}") & r.violation_expr(), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias(r.constraint_id)
            for i, r in enumerate(rules)
        ]
        row = df.join(F.broadcast(flags), "__file").agg(*aggs).collect()[0]
        scanned = {r.constraint_id: row[r.constraint_id] or 0 for r in rules}
    out = [
        (r.constraint_id, int(pl.decided_counts[r.constraint_id] + scanned[r.constraint_id]))
        for r in rules
    ]
    return spark.createDataFrame(
        out,
        T.StructType(
            [
                T.StructField("constraint_id", T.StringType(), False),
                T.StructField("violations", T.LongType(), False),
            ]
        ),
    )
