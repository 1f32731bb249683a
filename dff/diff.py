"""Snapshot diff: row-level added / removed / changed between table versions.

Incremental validation needs to know WHAT moved between two snapshots of
the source table — validate only the delta, alert on unexpected churn,
and feed the drift baseline update.  The reference re-reads its whole
table every run (one small pandas frame); at 10^12 rows the diff itself
must not shuffle payloads.

Scale shape: each side is first compressed map-side to
``(keys..., __sig)`` where ``__sig`` is a 64-bit ``xxhash64`` of the
compare columns — the full-outer join then shuffles key tuples plus 8
bytes instead of document payloads.  Classification:

- ``added``   — key only in the new snapshot;
- ``removed`` — key only in the old snapshot;
- ``changed`` — key in both, signatures differ.

Unchanged rows are dropped before the join output leaves the stage, so
the result is proportional to the churn, not the table.  A signature
collision (2^-64 per changed row) can only misreport ``changed`` as
unchanged; the oracle gate compares against DuckDB's direct
column-by-column ``IS DISTINCT FROM`` classification, so a collision
would surface as a gate mismatch.

Keys are joined NULL-SAFELY: a NULL key component pairs with itself
across snapshots instead of reporting one phantom add plus one phantom
remove.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    new: DataFrame,
    old: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """``(keys..., change)`` for every key whose row was added, removed,
    or changed between ``old`` and ``new``; unchanged keys are absent.
    Each side must be unique on ``keys`` (use ``dff.uniqueness`` first —
    duplicate keys make "the row for this key" ill-defined)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")

    def compress(df: DataFrame, side: str) -> DataFrame:
        # interleave each compare column with its null flag: xxhash64
        # SKIPS null inputs, so without the flags (x, NULL) and (NULL, x)
        # would collide into one signature
        sig_inputs = []
        for c in compare_cols:
            sig_inputs += [F.col(c), F.isnull(F.col(c))]
        return df.select(
            *[F.col(k).alias(f"{side}_{k}") for k in keys],
            F.xxhash64(*sig_inputs).alias(f"{side}_sig"),
        )

    n = compress(new, "n")
    o = compress(old, "o")
    cond = None
    for k in keys:
        clause = n[f"n_{k}"].eqNullSafe(o[f"o_{k}"])
        cond = clause if cond is None else cond & clause
    j = n.join(o, cond, "full_outer")
    # n-side key presence: at least one key col non-null OR the sig col
    # non-null (all-NULL key tuples still carry a sig)
    n_present = F.col("n_sig").isNotNull()
    o_present = F.col("o_sig").isNotNull()
    change = (
        F.when(~o_present, F.lit("added"))
        .when(~n_present, F.lit("removed"))
        .when(F.col("n_sig") != F.col("o_sig"), F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"n_{k}"), F.col(f"o_{k}")).alias(k) for k in keys
    ]
    return (
        j.select(*out_keys, change.alias("change"))
        .where(F.col("change").isNotNull())
    )


def schema_drift(old: DataFrame, new: DataFrame) -> list[dict]:
    """Column-level drift between two snapshots' SCHEMAS (no data read).

    The row diff above assumes both sides share a schema; at ingest time
    the first failure mode is upstream silently adding, dropping, or
    retyping a column.  Returns one record per drifted column:
    ``{"column", "change" ('added'|'removed'|'retyped'), "old_type",
    "new_type"}`` — driver-side metadata only, O(cols), safe to run before
    any job touches data.  Nullability relaxation (nullable False -> True)
    is reported as ``retyped`` too: writers downstream may rely on it.
    """
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in sorted(set(o) | set(n)):
        if name not in o:
            out.append(
                {"column": name, "change": "added", "old_type": None,
                 "new_type": n[name].dataType.simpleString()}
            )
        elif name not in n:
            out.append(
                {"column": name, "change": "removed",
                 "old_type": o[name].dataType.simpleString(), "new_type": None}
            )
        elif (
            o[name].dataType != n[name].dataType
            or o[name].nullable != n[name].nullable
        ):
            out.append(
                {"column": name, "change": "retyped",
                 "old_type": f"{o[name].dataType.simpleString()}"
                             f"{'' if o[name].nullable else ' not null'}",
                 "new_type": f"{n[name].dataType.simpleString()}"
                             f"{'' if n[name].nullable else ' not null'}"}
            )
    return out


def apply_cdc(
    spark,
    table,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> int:
    """Reconcile a :class:`dff.tablefmt.Table` to match ``new`` by
    applying exactly the churn :func:`snapshot_diff` reports — the CDC
    closure: added/changed rows MERGE in (COW, manifest-pruned), removed
    keys DELETE out (COW anti-join).  Cost is proportional to the churn
    plus the files it overlaps, never the table; unchanged files are
    carried by reference through both commits.

    Two snapshot commits (merge, then delete) — a reader between them
    sees the merged-but-not-yet-deleted state, never a torn file set;
    single-commit semantics would fold the delete into the merge rewrite
    (the API admits it; kept separate for auditable history).  Returns
    the final version."""
    cur = table.scan(spark)
    d = snapshot_diff(new, cur, keys, compare_cols)
    upsert_keys = d.where(F.col("change").isin("added", "changed")).select(
        *keys
    )
    ups = new.join(upsert_keys, keys, "left_semi")
    v = table.merge_upsert(spark, ups, keys, check_unique_keys=False)
    removed = d.where(F.col("change") == "removed").select(*keys)
    return max(v, table.delete_matching(spark, removed, keys))
