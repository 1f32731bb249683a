"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rule-DAG verdict query at sf0.001.
``queries()`` registers every implemented operator from SURVEY.md §2 plus
the training-data ops; ``oracle_sql()`` carries the DuckDB-equivalent ANSI
SQL for each.  Only three queries are rows-only (no cross-engine oracle):
MinHash/SimHash/IVF near-dup, whose primitives (xxhash64 shingles, SimHash
bit packing, trained IVF cells) have no DuckDB twin — and each now has an
ORACLE-CHECKED twin pinning its correctness: ``minhash_precision_violations``
/ ``simhash_precision_violations`` (containment invariants, must be empty),
``ivf_full_probe`` (nprobe = n_centroids makes IVF exactly brute force,
value-hash-checked against DuckDB), ``ivf_consistency_violations`` and the
planted-copy ``embedding_near_dups`` (full output deterministic).

Float policy: every cross-engine aggregate/computed double is rounded to 4
decimals on BOTH sides so last-ulp summation-order differences can't break
the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dff.compiler import compile_ruleset
from dff.dedup import (
    minhash_dedup_pairs,
    simhash_near_dup_pairs,
)
from dff.referential import orphan_rows
from dff.ruleset import parse_json
from dff.similarity import brute_force_topk, ivf_topk
from dff.stats import salted_grouped_stats
from dff.textops import lang_id, quality_score, whitespace_token_count
from dff.uniqueness import duplicate_key_counts

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: the reference's rule-DAG semantics over the documents table
# (chain R1 -> R2 -> R3, first-match-wins, NULL verdict = valid;
#  /root/reference/02_dff_orchestration.py:215-250 re-expressed vectorized)
# ---------------------------------------------------------------------------

DOC_RULESET = {
    "version": "docs-v1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "R1", "name": "text is null or length(text) = 0", "requires": []},
        {"id": "R2", "name": "n_chars < 40", "requires": ["R1"]},
        {"id": "R3", "name": "lang = 'zh' and n_chars > 400", "requires": ["R2"]},
    ],
}

_DOC_VERDICT_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL OR length(text) = 0 THEN 'text is null or length(text) = 0'
            WHEN n_chars < 40 THEN 'n_chars < 40'
            WHEN lang = 'zh' AND n_chars > 400 THEN 'lang = ''zh'' and n_chars > 400'
       END AS verdict
FROM documents
"""


def q_rule_dag_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    compiled = compile_ruleset(parse_json(DOC_RULESET), docs)
    return docs.select("doc_id", compiled.verdict.alias("verdict"))


# The reference's defining 5-node shape: chain R1 -> R2 -> R3 fanning out to
# {R4, R5} where R5 is an ML scorer thresholded at sensitivity
# (/root/reference/DFF_Ruleset.dmn:3-34, 02_dff_orchestration.py:215-250).
# R5 here is a deterministic logistic scorer so DuckDB can replay it; rows
# with n_chars in [885, 900] (and lang != 'zh') trigger BOTH R4 and R5,
# exercising the fan-out tie-break (declaration order: R4 wins) —
# SURVEY.md §7.3's top parity risk.
SCORE_RULESET = {
    "version": "docs-score-v1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "R1", "name": "text is null or length(text) = 0", "requires": []},
        {"id": "R2", "name": "n_chars < 40", "requires": ["R1"]},
        {"id": "R3", "name": "lang = 'zh' and n_chars > 400", "requires": ["R2"]},
        {"id": "R4", "name": "n_chars between 850 and 900", "requires": ["R3"]},
        {"id": "R5", "name": "score:chars_logistic", "requires": ["R3"]},
    ],
}


def _chars_logistic(df: DataFrame):
    """Deterministic stand-in for the reference's XGB pyfunc: a logistic
    blend of a numeric column, P = sigmoid((n_chars - 800) / 100)."""
    return F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("n_chars").cast("double") - 800.0) / 100.0)
    )


def q_rule_dag_score_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    compiled = compile_ruleset(
        parse_json(SCORE_RULESET), docs, scorers={"score:chars_logistic": _chars_logistic}
    )
    return docs.select("doc_id", compiled.verdict.alias("verdict"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_rule_dag_verdict(spark, SF_DEFAULT)


# ---------------------------------------------------------------------------
# relational operator inventory (SURVEY.md §2) over the TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """Group-by aggregation (TPC-H Q1 shape; SURVEY §2.4 group-by count)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_filter_project(spark, sf_dir):
    """Predicate + projection (SURVEY §2.2 comparison predicates / column subset)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45) & (F.col("l_discount") < 0.03)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def q_case_when_matrix(spark, sf_dir):
    """CASE WHEN bucketing + group-by count — the reference's confusion
    matrix shape (01_dff_model.py:503-507)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("predicted"),
            "l_returnflag",
        )
        .groupBy("predicted", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_inner_join(spark, sf_dir):
    """Inner equi-join (reference 01_dff_model.py:476-480) + agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


def q_left_outer_join(spark, sf_dir):
    """Left outer equi-join: customers with no matching order survive with
    null order columns (the reference's only join is inner —
    01_dff_model.py:476-480; outer joins round out the relational surface
    a validation report needs, e.g. 'every entity, matched or not')."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


def q_full_outer_join(spark, sf_dir):
    """Full outer join of two derived dimensions: rich customers vs
    customers having big orders — rows exist on both exclusive sides."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.where(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("k_rich"),
        F.round("c_acctbal", 4).alias("acctbal"),
    )
    big = (
        o.where(F.col("o_totalprice") > 250000)
        .groupBy(F.col("o_custkey").alias("k_big"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    return rich.join(
        big, rich.k_rich == big.k_big, "full_outer"
    ).select(
        F.coalesce("k_rich", "k_big").alias("custkey"),
        "acctbal",
        "n_big_orders",
    )


def q_cross_join_small(spark, sf_dir):
    """Cartesian product of the two tiny dims (region x nation grid)."""
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return r.crossJoin(n)


def q_broadcast_join(spark, sf_dir):
    """Explicit broadcast-hash join of a small dimension (SURVEY §4)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


def q_left_anti(spark, sf_dir):
    """Broadcast left-anti referential check (north rule): parts never shipped."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    p = _t(spark, sf_dir, "part")
    return orphan_rows(
        p.select("p_partkey", "p_brand"), li, ["p_partkey"], constraint_id="never_shipped"
    ).drop("constraint_id")


def q_left_anti_big_dim(spark, sf_dir):
    """The same referential check through the big-dim realization
    (dff/referential.py::orphan_rows_big_dim): distinct KEY tuples shuffle
    and anti-join the dim, then a null-safe semi join brings back the
    fact rows — the fact's payload columns never enter an exchange.
    Result-identical to ``left_anti`` by construction, so it shares that
    oracle."""
    from dff.referential import orphan_rows_big_dim

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)  # non-empty orphan set at sf0.01
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    p = _t(spark, sf_dir, "part")
    return orphan_rows_big_dim(
        p.select("p_partkey", "p_brand"), li, ["p_partkey"]
    ).drop("constraint_id")


def q_left_semi(spark, sf_dir):
    """Left-semi join: brands with at least one shipment."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    p = _t(spark, sf_dir, "part")
    return (
        p.join(li, ["p_partkey"], "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q_topk(spark, sf_dir):
    """Top-k by value (reference top-8 SHAP, 01_dff_model.py:401)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(8)
        .select("p_partkey", "p_name", "p_retailprice")
    )


def q_window_topk_per_group(spark, sf_dir):
    """Most expensive order per customer (top-1/group).

    r6 realization: ``max_by`` with a (price, -orderkey) ordering struct —
    a sort-free hash aggregate with map-side partials, replacing the
    window row_number plan whose per-partition Sort of every row was the
    entire cost (guide §2.3 "aggregate before you shuffle"; the window
    rank pattern itself remains exercised by tfidf_top_terms /
    two_stage_topk / the dedup windows).  Identical rows: struct ordering
    compares price first (NULLs sort below any value, matching DESC NULLS
    LAST) and breaks ties on the SMALLEST orderkey via the negated key."""
    o = _t(spark, sf_dir, "orders")
    best = F.max_by(
        F.struct("o_orderkey", "o_totalprice"),
        F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")),
    )
    return (
        o.groupBy("o_custkey")
        .agg(best.alias("__best"))
        .select(
            "o_custkey",
            F.col("__best.o_orderkey").alias("o_orderkey"),
            F.col("__best.o_totalprice").alias("o_totalprice"),
        )
    )


def q_stats_onepass(spark, sf_dir):
    """One-pass multi-statistic aggregation (fitted-scaler stats of
    01_dff_model.py:138-139 generalized; single scan / single Exchange)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
    )


def q_exact_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (small-scale oracle for the
    percentile_approx scale path)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
    )


def q_sort_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


def q_except_all(spark, sf_dir):
    """Multiset difference (set-op family): nation keys with more customers
    than suppliers, one row per surplus customer-nation slot."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


def q_rollup_grouping(spark, sf_dir):
    """ROLLUP multi-level aggregation with grouping_id — subtotal + grand
    total levels in one pass (Catalyst Expand, no re-scan per level)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


def q_monthly_rollup(spark, sf_dir):
    """Timestamp truncation + two-key rollup over the events stream table."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("month", F.col("ts")).alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_dup_keys(spark, sf_dir):
    """Uniqueness check: customers placing more than one order."""
    o = _t(spark, sf_dir, "orders")
    return duplicate_key_counts(o, ["o_custkey"])


def q_batch_sessions(spark, sf_dir):
    """Batch sessionization — the canonical window composition: per-user
    event gaps -> new-session flag (gap > 30 min) -> cumulative sum as
    session id -> per-session aggregates.  One Exchange on user_id feeds
    both window passes AND the final groupBy (same partitioning).  The
    streaming twin is q_session_counts / dff.streaming.sessionize_events."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(
        F.lag("ts").over(w).cast("timestamp")
    )
    new_sess = (
        F.when(gap_ms.isNull() | (gap_ms > 30 * 60 * 1000), 1).otherwise(0)
    )
    sess = e.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        (
            F.unix_millis(F.max("ts").cast("timestamp"))
            - F.unix_millis(F.min("ts").cast("timestamp"))
        ).alias("duration_ms"),
    )


def q_json_extract_stats(spark, sf_dir):
    """Semi-structured parsing: typed ``from_json`` extraction of the
    events.props JSON column (schema'd struct — predicate/aggregate over
    the parsed field stays whole-stage codegen) with malformed-input
    accounting: rows planted as garbage (event_id % 101 == 0) parse to
    NULL under PERMISSIVE mode and are counted, never dropped or fatal —
    exactly what a 100 TB ingest needs from dirty JSON."""
    e = _t(spark, sf_dir, "events").withColumn(
        "props",
        F.when(F.col("event_id") % 101 == 0, F.lit("{not json")).otherwise(
            F.col("props")
        ),
    )
    parsed = e.withColumn("p", F.from_json("props", "k long"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p.k").isNull().cast("long")).alias("n_malformed"),
        F.sum("p.k").alias("sum_k"),
        F.max("p.k").alias("max_k"),
    )


def q_rolling_aggs(spark, sf_dir):
    """Window FRAMES over event time (the reference's per-account running
    aggregates generalized): per-user cumulative sum, trailing-3-row moving
    average, and a RANGE frame (trailing 10 minutes by event time, peers
    included).  Pure Catalyst — one hash Exchange on user_id feeds all
    three frames (same partitioning + ordering, one Window operator chain,
    no extra shuffle per frame).  Sums rounded through decimal so the two
    engines' different in-frame addition orders cannot flip a digit."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 30)
    order = [F.col("ts"), F.col("event_id")]
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-2, 0)
    # RANGE frames need a single numeric ordering key: epoch MICROseconds
    # (integer — second-truncation would move sub-second edges differently
    # than the oracle's)
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600 * 1_000_000, 0)
    )

    def dec(c, nd=6):
        return F.round(c.cast("decimal(28,10)"), nd).cast("double")

    return e.select(
        "user_id",
        "event_id",
        dec(F.sum("value").over(w_cum)).alias("cum_value"),
        dec(F.avg("value").over(w_mov)).alias("mov_avg3"),
        dec(F.sum("value").over(w_rng)).alias("sum_10min"),
    )


def q_event_gaps(spark, sf_dir):
    """Window lag: seconds since the user's previous event."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        # ts is TIMESTAMP_NTZ; cast for unix_millis — the shift cancels in the diff
        e.withColumn(
            "gap_ms",
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(prev.cast("timestamp")),
        )
        .where(F.col("gap_ms").isNotNull())
        .select("user_id", "event_id", "gap_ms")
    )


# ---------------------------------------------------------------------------
# documents / text ops
# ---------------------------------------------------------------------------


def q_asof_join(spark, sf_dir):
    """Backward-inclusive as-of join (dff/asof.py: union + ordered window
    fill, one shuffle, no range cross-product) — each click event picks up
    the user's most recent purchase at or before it.  Hash-checked against
    DuckDB's NATIVE ``ASOF LEFT JOIN`` on the same tables."""
    from dff.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    # right_order makes the match deterministic if a user ever has two
    # purchases at one timestamp (largest event_id wins) — without it the
    # hash-checked comparison against the oracle would be flaky on ties
    # (ADVICE r03); the oracle SQL mirrors the same tie-break.
    out = asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("ts_r"), F.col("event_id_r"), F.col("value_r"),
    )


def _asof_sides(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return clicks, purchases


def q_asof_join_forward(spark, sf_dir):
    """Forward-inclusive as-of: each click picks up the user's NEXT
    purchase at or after it (smallest ts >= click ts; ties keep the
    smallest event_id — the oracle mirrors both orderings)."""
    from dff.asof import asof_join

    clicks, purchases = _asof_sides(spark, sf_dir)
    out = asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("ts_r"), F.col("event_id_r"), F.col("value_r"),
    )


def q_asof_join_nearest(spark, sf_dir):
    """Nearest as-of: the closer of the backward/forward matches, exact
    distance ties resolving backward — same one-shuffle plan, two window
    specs over one Exchange."""
    from dff.asof import asof_join

    clicks, purchases = _asof_sides(spark, sf_dir)
    out = asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
        direction="nearest",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("ts_r"), F.col("event_id_r"), F.col("value_r"),
    )


def q_asof_join_skewed(spark, sf_dir):
    """Skew-aware as-of join (dff/asof.py:asof_join_skewed): the same
    backward-inclusive semantics as q_asof_join but realized with coarse
    1-day time buckets + per-bucket seed rows, so a hot user's timeline
    splits across tasks.  Result-identical to the plain realization by
    construction — hash-checked against the SAME explicit-window DuckDB
    oracle."""
    from dff.asof import asof_join_skewed

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join_skewed(
        clicks, purchases, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
        bucket_width=86400.0,
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("ts_r"), F.col("event_id_r"), F.col("value_r"),
    )


def q_range_join(spark, sf_dir):
    """Binned range join (dff/rangejoin.py): click events matched to every
    same-group purchase interval [value-2, value+2] containing their value.
    Points bucket once, intervals explode into overlapped buckets, and the
    pair meets in exactly the point's bucket — equi-join + exact filter,
    no nested-loop cross product.  Hash-checked against DuckDB's plain
    inequality join."""
    from dff.rangejoin import interval_point_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("g"),
        F.col("event_id").alias("click_id"),
        F.col("value"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("g"),
        F.col("event_id").alias("purchase_id"),
        (F.col("value") - 2.0).alias("lo"),
        (F.col("value") + 2.0).alias("hi"),
    )
    out = interval_point_join(
        clicks, purchases, ["g"], "value", "lo", "hi", bucket_width=8.0
    )
    return out.select("g", "click_id", "purchase_id")


def q_interval_overlap_join(spark, sf_dir):
    """Binned interval-overlap join (dff/rangejoin.py): click value
    intervals [v-1, v+1] against purchase intervals [v-2, v+2] per group —
    each overlapping pair found exactly once via its canonical
    overlap-start bucket (no dedup shuffle).  Hash-checked against
    DuckDB's plain inequality join."""
    from dff.rangejoin import interval_overlap_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("g"),
        F.col("event_id").alias("click_id"),
        (F.col("value") - 1.0).alias("ls"),
        (F.col("value") + 1.0).alias("le"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("g"),
        F.col("event_id").alias("purchase_id"),
        (F.col("value") - 2.0).alias("rs"),
        (F.col("value") + 2.0).alias("re"),
    )
    out = interval_overlap_join(
        clicks, purchases, ["g"], "ls", "le", "rs", "re", bucket_width=6.0
    )
    return out.select("g", "click_id", "purchase_id")


def q_sha256(spark, sf_dir):
    """Per-row content hash — the engine's per-row invariant (input_hint)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("content_sha"))


def q_hashing_vector_violations(spark, sf_dir):
    """Driver-checkable INVARIANT for feature hashing
    (dff/vectorize.py): over all pairs of 30 documents, the hashed-vector
    cosine (dim=1024) must sit within 0.2 of the exact token-count cosine
    (hashing error ~1/sqrt(dim) ≈ 0.03 std; 0.2 is >6 sigma).  Pairs with
    no shared term count as exact cosine 0.  Violations returned; expected
    empty."""
    from dff.relevance import term_frequencies
    from dff.vectorize import hashing_vectorize

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    tf = term_frequencies(docs)
    norms = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("n")
    )
    a = tf.select(
        F.col("doc_id").alias("ida"), "term", F.col("tf").alias("tfa")
    )
    b = tf.select(
        F.col("doc_id").alias("idb"), "term", F.col("tf").alias("tfb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    ids = docs.select("doc_id")
    all_pairs = (
        ids.select(F.col("doc_id").alias("ida"))
        .crossJoin(ids.select(F.col("doc_id").alias("idb")))
        .where(F.col("ida") < F.col("idb"))
    )
    exact = (
        all_pairs.join(dots, ["ida", "idb"], "left")
        .join(norms.select(F.col("doc_id").alias("ida"), F.col("n").alias("na")), "ida")
        .join(norms.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb")), "idb")
        .select(
            "ida", "idb",
            (F.coalesce(F.col("dot"), F.lit(0.0)) / (F.col("na") * F.col("nb")))
            .alias("exact_cos"),
        )
    )
    vecs = hashing_vectorize(docs, dim=1024)
    va = vecs.select(F.col("doc_id").alias("ida"), F.col("embedding").alias("ea"))
    vb = vecs.select(F.col("doc_id").alias("idb"), F.col("embedding").alias("eb"))
    hashed = (
        va.crossJoin(vb)
        .where(F.col("ida") < F.col("idb"))
        .select(
            "ida", "idb",
            F.aggregate(
                F.zip_with("ea", "eb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("hash_cos"),
        )
    )
    return (
        exact.join(hashed, ["ida", "idb"])
        .where(F.abs(F.col("hash_cos") - F.col("exact_cos")) > 0.2)
        .select("ida", "idb", "exact_cos", "hash_cos")
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (dff/relevance.py:tfidf) — lexical
    relevance for corpus search / quality filtering.  idf operands are
    integer counts, so the double idf is bit-identical across engines and
    the rank ordering cannot diverge; ties broken by term."""
    from dff.relevance import tfidf

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    scored = tfidf(docs)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            "rank",
            F.round(F.col("tfidf").cast("decimal(28,12)"), 6)
            .cast("double")
            .alias("score"),
        )
    )


def q_bm25_scores(spark, sf_dir):
    """Okapi BM25 document ranking for a fixed 3-term query
    (dff/relevance.py:bm25_scores).  The only data-sized stage is the
    (doc, term) tf aggregation; query-term df and corpus constants
    broadcast."""
    from dff.relevance import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    out = bm25_scores(docs, ["spark", "join", "vector"])
    return out.select(
        "doc_id",
        F.round(F.col("bm25").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("bm25"),
        "matched_terms",
    )


def q_token_counts(spark, sf_dir):
    # r6: widen the single-split scan so the split/trim work spreads over
    # the cores (no-op when the input is already wide)
    from dff.dedup import widen_if_narrow

    d = widen_if_narrow(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        F.length("text").alias("n_chars_check"),
    )


def q_source_profile(spark, sf_dir):
    """Per-source exact profile incl. exact distinct (dedup baseline)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("distinct_texts"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        # cast->double BEFORE round: DuckDB's round() returns DOUBLE while
        # Spark's round(bigint) stays BIGINT — the driver's value hash is
        # type-sensitive (CORRECTNESS_r01 source_profile hash_match=false)
        F.round(F.min("n_chars").cast("double"), 4).alias("min_chars"),
        F.round(F.max("n_chars").cast("double"), 4).alias("max_chars"),
    )


def q_psi_drift(spark, sf_dir):
    """PSI between the n_chars distribution of lang='en' docs and all docs,
    over shared 100-char bins (drift check as a relational query)."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).alias("bucket")
    allh = d.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("q_cnt"))
    enh = (
        d.where(F.col("lang") == "en")
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("p_cnt"))
    )
    joined = allh.join(enh, "bucket", "full_outer").fillna(0)
    tot = joined.agg(
        F.sum("p_cnt").alias("pt"), F.sum("q_cnt").alias("qt")
    )
    j = joined.crossJoin(tot)
    pe = F.greatest(F.col("p_cnt") / F.col("pt"), F.lit(1e-6))
    qe = F.greatest(F.col("q_cnt") / F.col("qt"), F.lit(1e-6))
    return j.agg(F.round(F.sum((qe - pe) * F.log(qe / pe)), 4).alias("psi"))


def q_js_drift(spark, sf_dir):
    """Jensen-Shannon divergence between the same two n_chars histograms as
    ``psi_drift`` (lang='en' docs vs all docs, shared 100-char bins) —
    symmetric and bounded by ln 2 where PSI is neither; rides the identical
    two-histogram plan, only the final map-side formula differs."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).alias("bucket")
    allh = d.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("q_cnt"))
    enh = (
        d.where(F.col("lang") == "en")
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("p_cnt"))
    )
    joined = allh.join(enh, "bucket", "full_outer").fillna(0)
    tot = joined.agg(
        F.sum("p_cnt").alias("pt"), F.sum("q_cnt").alias("qt")
    )
    j = joined.crossJoin(tot)
    pe = F.greatest(F.col("p_cnt") / F.col("pt"), F.lit(1e-6))
    qe = F.greatest(F.col("q_cnt") / F.col("qt"), F.lit(1e-6))
    me = (pe + qe) / 2
    term = pe * F.log(pe / me) * 0.5 + qe * F.log(qe / me) * 0.5
    return j.agg(F.round(F.sum(term), 6).alias("js"))


def q_lang_id(spark, sf_dir):
    """Heuristic language ID distribution (rows-only would hide regressions;
    the marker hit-count is reproducible in SQL, so it IS oracle-checked).
    r6: the sf-dir documents table is a single parquet split, so the
    regex scoring — the entire cost — ran on one core; widen first (a
    no-op when the input already carries >= cores splits)."""
    from dff.dedup import widen_if_narrow

    d = widen_if_narrow(_t(spark, sf_dir, "documents").select("text"))
    return d.groupBy(lang_id("text").alias("lid")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# embeddings / similarity
# ---------------------------------------------------------------------------


def q_ann_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, q, k=5)
    return out.select(
        "query_id", "item_id", F.round("cosine", 4).alias("cosine_r"), "rank"
    )


# ------- rows-only (engine-specific primitives; no cross-engine oracle) ----


def q_minhash_near_dups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )


def q_minhash_precision_violations(spark, sf_dir):
    """Driver-checkable MinHash INVARIANT (VERDICT r01 §missing-2): every
    LSH pair estimated at jaccard >= 0.5 must have EXACT shingle-set
    jaccard >= 0.2 (64 hashes -> sigma ~ 0.0625; 0.3 of slack is > 4
    sigma).  The query returns the violating pairs — expected EMPTY, and
    an empty frame hash-compares cleanly against the empty-set oracle."""
    from dff.dedup import shingle_hashes_32

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )
    sh = d.select(
        F.col("doc_id").alias("doc"),
        F.array_distinct(shingle_hashes_32("text", 9)).alias("s"),
    )
    a = sh.select(F.col("doc").alias("id_a"), F.col("s").alias("s_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("s").alias("s_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    union_sz = F.size(F.array_union("s_a", "s_b"))
    exact_j = F.when(
        union_sz > 0, F.size(F.array_intersect("s_a", "s_b")) / union_sz
    ).otherwise(F.lit(1.0))
    return joined.where(exact_j < 0.2).select("id_a", "id_b")


def q_simhash_near_dups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=10, prefix_bits=8)


def q_simhash_precision_violations(spark, sf_dir):
    """Driver-checkable SimHash INVARIANT (VERDICT r02 §next-1), mirroring
    ``minhash_precision_violations``: every pair at hamming <= 8 (of 64
    bits) must have EXACT 9-char shingle jaccard >= 0.5 — the violating
    pairs are returned and must be EMPTY.  Calibration: planted near-dup
    copies measure >= 0.92 exact jaccard at hamming <= 8, while template-
    coincidence false positives (shared boilerplate phrases dominating the
    sign bits without shingle overlap) first appear at hamming 10 with
    jaccard < 0.1 — the 0.5 bar sits mid-gap, far from both."""
    from dff.textops import shingle_hashes

    d = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=8, prefix_bits=8)
    sh = d.select(
        F.col("doc_id").alias("doc"),
        F.array_distinct(shingle_hashes("text", 9)).alias("s"),
    )
    a = sh.select(F.col("doc").alias("id_a"), F.col("s").alias("s_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("s").alias("s_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    union_sz = F.size(F.array_union("s_a", "s_b"))
    exact_j = F.when(
        union_sz > 0, F.size(F.array_intersect("s_a", "s_b")) / union_sz
    ).otherwise(F.lit(1.0))
    return joined.where(exact_j < 0.5).select("id_a", "id_b")


def q_ivf_ann(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, q, k=5, n_centroids=16, nprobe=4)


def q_ivf_incremental_full_probe(spark, sf_dir):
    """Incremental IVF adds (IvfIndex.add, VERDICT-style invariant): build
    the index on HALF the vectors, add the other half against the frozen
    centroids, then full-probe — the result must be the EXACT brute-force
    top-k over the WHOLE table (same oracle as ``ivf_full_probe``): every
    added item lands in exactly one probed cell, so incremental assignment
    cannot lose or duplicate candidates."""
    from dff.similarity import build_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    old = emb.where(F.xxhash64("vec_id") % 2 == 0)
    new = emb.where(F.xxhash64("vec_id") % 2 != 0)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    index = build_ivf_index(old, n_centroids=16).add(new)
    out = index.query(q, k=5, nprobe=16)
    return out.select(
        "query_id", "item_id", F.round("cosine", 4).alias("cosine_r"), "rank"
    )


def q_ivf_full_probe(spark, sf_dir):
    """IVF with nprobe = n_centroids probes EVERY cell, so it must return
    the EXACT cosine top-k — each item lives in exactly one cell, and the
    union of all probed cells covers the table once.  That makes the whole
    IVF machinery (centroid training, Arrow-batched assignment, broadcast
    cell join, map-side top-k merge) fully hash-checkable against the same
    DuckDB brute-force oracle as ``ann_bruteforce`` (VERDICT r02 §next-1)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=16)
    return out.select(
        "query_id", "item_id", F.round("cosine", 4).alias("cosine_r"), "rank"
    )


def q_ivf_consistency_violations(spark, sf_dir):
    """Driver-checkable IVF INVARIANT for the pruned path (nprobe <
    n_centroids, where recall < 1 makes the result set engine-specific):
    every returned row must (a) reference a real item and query embedding,
    (b) carry the TRUE cosine of that pair (recomputed here from the base
    table — catches id/score bookkeeping corruption in the merge), and
    (c) be ranked consistently with its own cosine ordering.  Violating
    rows are returned and must be EMPTY."""
    from dff.dedup import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=4)
    items = emb.select(
        F.col("vec_id").alias("item_id"),
        F.col("embedding").cast("array<double>").alias("i_emb"),
    )
    qs = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    checked = (
        out.withColumn("rn", F.row_number().over(w))
        .join(items, "item_id", "left")
        .join(qs, "query_id", "left")
        .withColumn("true_cos", cosine_expr(F.col("i_emb"), F.col("q_emb")))
    )
    bad = (
        F.col("i_emb").isNull()
        | F.col("q_emb").isNull()
        | (F.abs(F.col("cosine") - F.col("true_cos")) > 1e-6)
        | (F.col("rn") != F.col("rank"))
    )
    return checked.where(bad).select("query_id", "item_id")


def q_embedding_near_dups(spark, sf_dir):
    """Hyperplane-LSH embedding near-dup, FULLY oracle-checked (VERDICT r02
    §missing-2): the base embeddings have no natural pairs at cosine >=
    0.8, so the query plants one EXACT copy per vector (vec_id + 10000).
    Identical vectors land in identical buckets in every hyperplane table,
    so LSH recall on the planted pairs is provably 1.0 — the full output is
    deterministic (each vector pairs with its copy at cosine 1.0, nothing
    else reaches 0.95) and hash-compares against plain SQL.  (A jittered
    copy would make recall probabilistic and only invariant-checkable.)"""
    from dff.dedup import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    copies = emb.select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    base = emb.unionByName(copies)
    pairs = embedding_near_dup_pairs(
        base, "vec_id", "embedding", dim=64, threshold=0.95
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


def q_salted_stats(spark, sf_dir):
    """Salted two-stage skew-aware aggregation, ORACLE-CHECKED: the
    algebraic partials (count/min/max/mean/std) merge to exactly the
    unsalted answer, so plain GROUP BY SQL is a valid oracle.  The HLL
    variant (engine-specific sketch) stays pytest-asserted in test_stats."""
    d = _t(spark, sf_dir, "documents")
    s = salted_grouped_stats(
        d, ["lang"], "n_chars", salt_buckets=8, include_approx_distinct=False
    )
    return s.select(
        "lang",
        "rows",
        "non_null",
        F.round("min", 4).alias("min_v"),
        F.round("max", 4).alias("max_v"),
        F.round("mean", 4).alias("mean_v"),
        F.round("stddev", 4).alias("std_v"),
    )


def q_tdigest_accuracy_violations(spark, sf_dir):
    """Driver-checkable t-digest INVARIANT: every per-lang quantile the
    distributed sketch (dff/tdigest.py: mapInPandas partition digests ->
    applyInPandas merge) reports must sit within rank error 0.05 of the
    true CDF — i.e. for estimate v at quantile q, the data's
    P(x < v) - eps <= q <= P(x <= v) + eps.  Violations returned, expected
    EMPTY.  The bound holds for ANY partitioning/merge order (t-digest
    centroids vary with merge order; their rank error does not exceed the
    k1-scale guarantee), so the invariant is deterministic even though the
    sketch itself is not byte-stable."""
    from dff.tdigest import tdigest_quantiles

    d = _t(spark, sf_dir, "documents")
    td = tdigest_quantiles(d, "n_chars", (0.25, 0.5, 0.75), key_col="lang")
    vals = d.select(F.col("lang").cast("string").alias("group_key"), "n_chars")
    j = td.join(vals, "group_key")
    checked = j.groupBy("group_key", "q", "value").agg(
        F.avg((F.col("n_chars") < F.col("value")).cast("double")).alias("lo"),
        F.avg((F.col("n_chars") <= F.col("value")).cast("double")).alias("hi"),
    )
    eps = 0.05
    bad = (F.col("q") < F.col("lo") - eps) | (F.col("q") > F.col("hi") + eps)
    return checked.where(bad).select("group_key", "q")


def _doc_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(F.explode(F.split(F.col("text"), " ")).alias("tok")).where(
        F.col("tok") != ""
    )


def q_heavy_hitters_exact(spark, sf_dir):
    """Misra-Gries heavy hitters (dff/heavyhitters.py) at a capacity that
    covers every distinct token: no truncation ever fires, so the sketch
    output EQUALS the exact token counts — plain GROUP BY SQL is a valid
    oracle and the whole two-stage mapInPandas -> applyInPandas merge path
    is value-hash-checked end to end."""
    from dff.heavyhitters import heavy_hitters

    hh = heavy_hitters(_doc_tokens(spark, sf_dir), "tok", capacity=256)
    return hh.select(F.col("item").alias("tok"), F.col("est").alias("cnt"))


def q_heavy_hitters_violations(spark, sf_dir):
    """Driver-checkable Misra-Gries INVARIANT at a capacity (8) far below
    the ~30 distinct tokens, so decrements genuinely fire: for every token,
    est <= true and true - est(or 0 if evicted) <= floor(N/(capacity+1)) —
    which also forces any token more frequent than that bound to survive.
    The reported n_total / max_undercount must agree with the exact totals.
    Violations returned, expected EMPTY; the guarantee is topology-
    independent, so the invariant is deterministic even though the
    surviving counter set is not."""
    from dff.heavyhitters import heavy_hitters

    cap = 8
    toks = _doc_tokens(spark, sf_dir)
    hh = heavy_hitters(toks, "tok", capacity=cap)
    exact = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    totals = exact.agg(F.sum("true_cnt").alias("n")).select(
        "n", F.floor(F.col("n") / (cap + 1)).alias("bound")
    )
    j = exact.crossJoin(F.broadcast(totals)).join(
        hh.withColumnRenamed("item", "tok"), "tok", "left"
    )
    est0 = F.coalesce(F.col("est"), F.lit(0))
    bad = (
        (F.col("est") > F.col("true_cnt"))
        | (F.col("true_cnt") - est0 > F.col("bound"))
        | (F.col("est").isNotNull() & (F.col("n_total") != F.col("n")))
        | (F.col("est").isNotNull() & (F.col("max_undercount") != F.col("bound")))
    )
    return j.where(bad).select("tok")


def q_stratified_sample(spark, sf_dir):
    """Deterministic content-hash stratified sampling (dff/sampling.py):
    keep iff the first 60 bits of md5(seed|doc_id) / 2^60 land under the
    per-lang CASE threshold — a pure map-side predicate, stable under any
    repartitioning, and exactly replayable in DuckDB (same md5, same hex
    prefix, same IEEE division), so the SELECTED ROW SET is value-hash-
    checked cross-engine, not just the sample rate."""
    from dff.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d,
        "lang",
        {"en": 0.25, "zh": 0.75, "es": 1.0},
        key_cols=["doc_id"],
        default=0.5,
        seed=7,
    )
    return out.select("doc_id", "lang")


def q_sample_per_group(spark, sf_dir):
    """Exactly-n-per-group deterministic sampling: rank rows in each lang
    by the same content hash (doc_id tie-break) and keep the first 3 —
    ONE shuffle, and the chosen ids replay identically in DuckDB via the
    mirrored row_number() window."""
    from dff.sampling import sample_n_per_group

    d = _t(spark, sf_dir, "documents")
    out = sample_n_per_group(d, ["lang"], 3, key_cols=["doc_id"], seed=7)
    return out.select("lang", "doc_id")


def q_snapshot_diff(spark, sf_dir):
    """Row-level snapshot diff (dff/diff.py): the 'previous snapshot' is
    derived deterministically from documents (every 17th doc missing ->
    added; every 13th text perturbed -> changed; 1M-offset clones of every
    29th doc -> removed), then classified via the payload-free
    signature join.  The oracle classifies the same synthetic old/new pair
    with direct IS DISTINCT FROM column comparison — so a signature
    false-negative (hash collision) would surface as a gate mismatch."""
    from dff.diff import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = d.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" CHANGED"))
        ).otherwise(F.col("text")).alias("text"),
        "lang",
    )
    extra = d.where(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    old = base.union(extra)
    return snapshot_diff(d, old, keys=["doc_id"], compare_cols=["text", "lang"])


def q_repetition_scores(spark, sf_dir):
    """Gopher-style intra-document repetition ratio (fraction of word
    3-gram occurrences that repeat an earlier one) — a standard
    pre-training quality filter; pure Catalyst, map-only."""
    from dff.textops import repetition_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(repetition_ratio("text", 3), 4).alias("rep_ratio")
    )


def q_contamination(spark, sf_dir):
    """Benchmark decontamination (dff/contamination.py): every 37th doc
    plays the held-out benchmark; corpus docs sharing any word 3-gram
    with it are flagged with their distinct shared-gram count.  The
    benchmark gram-hash set broadcasts; the corpus explodes map-side and
    semi-joins BEFORE any shuffle, so the one exchange carries only
    contaminated (doc, gram) pairs."""
    from dff.contamination import contaminated_docs

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 37 == 0)
    corpus = d.where(F.col("doc_id") % 37 != 0)
    return contaminated_docs(corpus, bench, "doc_id", "text", n=3)


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (dff/textops.py::chunk_documents): 12-word
    windows with 3-word overlap, trailing pure-suffix windows dropped;
    pure Catalyst explode, map-only.  Every chunk row (id, text, width)
    hash-checks against a DuckDB replay of the identical slicing."""
    from dff.textops import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", size=12, overlap=3)


def q_training_corpus_pipeline(spark, sf_dir):
    """CAPSTONE: the full training-corpus build as ONE composed plan —
    length filter -> exact-dedup survivors (min-id per identical text) ->
    benchmark decontamination (3-gram vs the %37 held-out set) ->
    12/3 context-window chunking -> deterministic 50% content-hash
    sample.  Every stage is a dff primitive; the WHOLE chain stays one
    Catalyst plan whose exchanges carry only 8-byte gram hashes, doc ids,
    and (r6) the hash-compressed dedup's duplicated-hash aggregation —
    full text never enters an exchange at all now.  r6 plan surgery
    (results bit-identical, proven against the frozen oracle):

    - ``dedup_exact`` is hash-compressed (dff/dedup.py): the old plan
      shuffled every row's text by sha2(text) through a window, TWICE
      (once per side of the decontamination anti-join).
    - ``bad`` is computed over ``corpus`` instead of ``surv``: a doc's
      contamination verdict depends only on its own grams, so
      ``surv ⟕anti bad(corpus) == surv ⟕anti bad(surv)`` (the extra ids
      in ``bad(corpus)`` are rows the anti join's left side never
      contains) — and the two big subtrees become independent instead of
      one being evaluated inside the other.
    - the single-split sf-dir scan is widened first (widen_if_narrow) so
      gram hashing / chunk building use every core; at real scale the
      input carries more splits than cores and this is a no-op.

    Final chunk rows hash-check against a DuckDB replay of the entire
    five-stage pipeline."""
    from dff.contamination import contaminated_docs
    from dff.dedup import dedup_exact, widen_if_narrow
    from dff.sampling import hash_sample
    from dff.textops import chunk_documents

    d = widen_if_narrow(_t(spark, sf_dir, "documents"))
    bench = d.where(F.col("doc_id") % 37 == 0)
    corpus = d.where((F.col("doc_id") % 37 != 0) & (F.col("n_chars") >= 50))
    surv = dedup_exact(corpus, "text", "doc_id")
    bad = contaminated_docs(corpus, bench, "doc_id", "text", n=3).select("doc_id")
    clean = surv.join(bad, "doc_id", "left_anti")
    chunks = chunk_documents(clean, "doc_id", "text", size=12, overlap=3)
    return hash_sample(chunks, ["doc_id", "chunk_id"], 0.5, seed=21).select(
        "doc_id", "chunk_id", "chunk_text", "n_words"
    )


def q_quota_sample(spark, sf_dir):
    """Domain mixing (dff/sampling.py::quota_sample): cap en at 10% and
    zh at 5% of the corpus total; unlisted langs pass through whole.  The
    per-stratum keep fraction min(1, quota*N/N_s) is computed from exact
    integer counts with the same left-associated double arithmetic in
    both engines, so the selected row set still replays bit-identically
    in DuckDB (window counts there, one driver collect here)."""
    from dff.sampling import quota_sample

    d = _t(spark, sf_dir, "documents")
    out = quota_sample(
        d, "lang", {"en": 0.10, "zh": 0.05}, key_cols=["doc_id"], seed=13
    )
    return out.select("doc_id", "lang")


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing (dff/textops.py::redact_pii): deterministic
    synthetic emails/IPs appended to each doc, then redacted with typed
    placeholders and counted.  Patterns are restricted to Java-regex ∩
    RE2 syntax, so the oracle replays the IDENTICAL pattern chain in
    DuckDB and the full redacted strings hash-match."""
    from dff.textops import pii_count, redact_pii

    d = _t(spark, sf_dir, "documents")
    x = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return d.select(
        "doc_id",
        redact_pii(x).alias("redacted"),
        pii_count(x).alias("n_pii"),
    )


def q_weighted_sample(spark, sf_dir):
    """Probability-proportional-to-size Poisson sampling: keep a doc with
    probability min(1, rate * n_chars) — the sample's character mass
    mirrors the corpus.  Pure map-side predicate, no transcendentals, so
    the SELECTED ROW SET is bit-replayable in DuckDB."""
    from dff.sampling import weighted_hash_sample

    d = _t(spark, sf_dir, "documents")
    out = weighted_hash_sample(
        d, key_cols=["doc_id"], rate=0.0005, weight_col="n_chars", seed=11
    )
    return out.select("doc_id", "lang", "n_chars")


def q_weighted_sample_per_group(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, exactly 4 docs per lang:
    Efraimidis-Spirakis exponential race keys E = -ln(u)/n_chars ranked in
    a window — the DuckDB oracle mirrors the identical race (same md5
    uniform, same 1e-18 floor, doc_id tie-break); output columns carry no
    floats, so a cross-engine 1-ulp ln() divergence could only matter on a
    ~2^-50 rank-boundary tie."""
    from dff.sampling import weighted_sample_n_per_group

    d = _t(spark, sf_dir, "documents")
    out = weighted_sample_n_per_group(
        d, ["lang"], 4, key_cols=["doc_id"], weight_col="n_chars", seed=11
    )
    return out.select("lang", "doc_id")


def q_multimodal_bytes(spark, sf_dir):
    """Multimodal plumbing under the driver gate: documents re-encoded as
    opaque ``binary`` media payloads, pushed through the REAL Arrow-batched
    ``mapInPandas`` feature-extraction stage (dff/multimodal.py), with the
    Python-side byte counts hash-checked against DuckDB's ``octet_length``
    of the same encoding — pins binary fidelity through the Arrow
    round-trip.  (The decode step itself stays a declared stub — no imaging
    libs in this container; its deterministic fake-feature invariants are
    pytest-pinned in test_multimodal.py.)"""
    from dff.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )
    feats = extract_features(media, dim=8)
    return feats.select("media_id", "kind", "n_bytes")


def q_ngram_jaccard_exact(spark, sf_dir):
    """Exact word-3-gram Jaccard over a bounded id subset — the verify
    expression of ``ngram_jaccard_pairs`` (normalize -> n-gram set ->
    intersect/union) hash-checked against DuckDB list arithmetic.  The all-pairs join is
    DELIBERATE here (sf0.01 gate: 500 docs) — it is the exact oracle for
    the verify expression; at scale candidate generation is LSH
    (``ngram_jaccard_pairs``), which stays covered by
    ``minhash_precision_violations`` and pytest."""
    from dff.dedup import word_ngrams

    d = _t(spark, sf_dir, "documents")
    g = d.select(F.col("doc_id").alias("doc"), word_ngrams("text", 3).alias("grams"))
    a = g.select(F.col("doc").alias("id_a"), F.col("grams").alias("g_a"))
    b = g.select(F.col("doc").alias("id_b"), F.col("grams").alias("g_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    union_sz = F.size(F.array_union("g_a", "g_b"))
    j = F.when(
        union_sz > 0, F.size(F.array_intersect("g_a", "g_b")) / union_sz
    ).otherwise(F.lit(1.0))
    return (
        pairs.select("id_a", "id_b", F.round(j, 4).alias("jaccard"))
        .where(F.col("jaccard") >= 0.2)
    )


def q_ngram_containment_exact(spark, sf_dir):
    """Exact asymmetric containment |grams(small) ∩ grams(big)| /
    |grams(small)| over a bounded all-pairs (the verify expression of
    dff/dedup.py:ngram_containment_pairs; deliberate all-pairs at the
    500-doc gate — the scale path is the rare-gram inverted index, pinned
    by test_dedup.py's planted-containment + df-cap tests)."""
    from dff.dedup import word_ngrams

    d = _t(spark, sf_dir, "documents")
    g = d.select(F.col("doc_id").alias("doc"), word_ngrams("text", 3).alias("grams"))
    a = g.select(F.col("doc").alias("id_small"), F.col("grams").alias("g_a"))
    b = g.select(F.col("doc").alias("id_big"), F.col("grams").alias("g_b"))
    pairs = a.join(b, F.col("id_small") != F.col("id_big")).where(
        F.size("g_a") > 0
    )
    c = F.size(F.array_intersect("g_a", "g_b")) / F.size("g_a")
    return (
        pairs.select("id_small", "id_big", F.round(c, 4).alias("containment"))
        .where(F.col("containment") >= 0.3)
    )


def q_dup_clusters(spark, sf_dir):
    """Duplicate-cluster formation: transitive closure of the exact
    n-gram-Jaccard pair graph via distributed alternating-star connected
    components (dff/cluster.py), every doc assigned the MINIMUM doc_id of
    its cluster (isolated docs = singletons).  Similarity is not
    transitive, so pair output alone under-deletes chained near-dups; this
    is the closure step the dedup family feeds.  Oracle: DuckDB
    WITH RECURSIVE min-label reachability over the identical pair graph."""
    from dff.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    edges = q_ngram_jaccard_exact(spark, sf_dir).select("id_a", "id_b")
    return connected_components(edges, nodes=d, node_col="doc_id")


def q_dedup_survivors(spark, sf_dir):
    """The deduplicated corpus: one canonical survivor (min doc_id) per
    duplicate cluster, non-duplicated docs untouched — the end-to-end
    dedup deliverable (pairs -> clusters -> survivors) a training-data
    pipeline actually materializes."""
    from dff.cluster import canonical_survivors

    d = _t(spark, sf_dir, "documents")
    pairs = q_ngram_jaccard_exact(spark, sf_dir).select("id_a", "id_b")
    return canonical_survivors(d, pairs, "doc_id").select(
        "doc_id", "lang", "n_chars"
    )


def q_best_survivors(spark, sf_dir):
    """Quality-weighted dedup: per duplicate cluster keep the member with
    the LARGEST ``n_chars`` (tie-break min doc_id) instead of the minimum
    id — what a training pipeline actually wants when collapsing near-dup
    clusters (keep the longest/best copy).  Same n-gram jaccard pair graph
    as ``dedup_survivors``, so the two oracles share the closure CTEs."""
    from dff.cluster import best_survivors

    d = _t(spark, sf_dir, "documents")
    pairs = q_ngram_jaccard_exact(spark, sf_dir).select("id_a", "id_b")
    return best_survivors(d, pairs, "doc_id", "n_chars").select(
        "doc_id", "lang", "n_chars"
    )


# The reference scores single records widget-interactively; our streaming
# surface is the engine-native analog.  This query puts it under the SAME
# driver gate as batch (VERDICT r02 §next-8): the events table replayed as
# a file stream through the compiled rule DAG -> watermark -> tumbling
# event-time window, availableNow trigger, memory sink; the final window
# counts hash-compare against plain GROUP BY SQL.
EVENT_RULESET = {
    "version": "events-v1",
    "rules": [
        {"id": "E_high_value", "name": "value > 180", "requires": []},
        {
            "id": "E_error_mid",
            "name": "event_type = 'error' and value > 150",
            "requires": ["E_high_value"],
        },
    ],
}


def _stream_dir(sf_dir: str) -> str:
    """FileStreamSource requires a DIRECTORY; the testdata table is a
    single file -> stage a symlink dir (testdata is read-only).  The dir
    name is content-stable (NOT Python hash(): per-process seed
    randomization would leak one new dir per run)."""
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        return src
    import hashlib
    import tempfile

    tag = hashlib.sha256(src.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"dff-stream-{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return stage


def q_stream_window_counts(spark, sf_dir):
    from dff.runner import ValidationConfig, ValidationRunner
    from dff.streaming import windowed_violation_counts

    # pin UTC so the NTZ->TZ cast (watermarks require TIMESTAMP) and the
    # epoch-aligned 1-day windows agree with DuckDB's naive date_trunc
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        src = _stream_dir(sf_dir)
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        runner = ValidationRunner(
            ValidationConfig(ruleset=parse_json(EVENT_RULESET))
        )
        win = windowed_violation_counts(
            stream, runner, ts_col="ts",
            window_duration="1 day",
            # bounded replay: nothing may be dropped as late (the drop
            # behavior itself is pinned by tests/test_streaming.py)
            watermark_delay="3650 days",
        )
        out = win.select(
            F.col("window.start").cast("timestamp_ntz").alias("day"),
            "verdict_id",
            F.col("n"),
        )
        q = (
            out.writeStream.format("memory")
            .queryName("stream_window_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
        return spark.table("stream_window_counts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_row_attribution(spark, sf_dir):
    """Per-row multi-constraint attribution (dff/runner.py:row_attribution,
    VERDICT r03 #5): one row per (doc, violated constraint) — EVERY
    triggered DAG rule, not just the first-win verdict, plus a failed
    broadcast referential check (lang ∉ allowed dim).  Map-only fused
    plan; oracle is a plain UNION ALL of the per-constraint predicates."""
    from dff.runner import ReferentialCheck, ValidationConfig, ValidationRunner

    docs = _t(spark, sf_dir, "documents")
    allowed = spark.createDataFrame([("en",), ("de",), ("fr",)], "lang string")
    runner = ValidationRunner(
        ValidationConfig(
            ruleset=parse_json(DOC_RULESET),
            key_cols=("doc_id", "lang"),
            part_col="source",
            unique_keys=None,
            referential=[
                ReferentialCheck(
                    dim=allowed, on=["lang"], constraint_id="lang_allowed",
                    dim_is_distinct=True,
                )
            ],
        )
    )
    return runner.row_attribution(docs).select("doc_id", "constraint_id")


def q_stream_interval_join(spark, sf_dir):
    """Watermarked stream-stream interval join
    (dff/streaming.py:interval_join_streams): views joined to the same
    user's purchases within the following 2 hours, replayed with
    availableNow and hash-checked against the equivalent static SQL join.
    The generous watermark makes the bounded replay drop-free (eviction
    behavior itself is pinned in tests/test_streaming.py)."""
    from dff.streaming import interval_join_streams

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        src = _stream_dir(sf_dir)
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

        def _stream():
            return (
                spark.readStream.schema(schema)
                .parquet(src)
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )

        views = _stream().where(F.col("event_type") == "view").select(
            "user_id", "event_id", "ts"
        )
        buys = _stream().where(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        )
        joined = interval_join_streams(
            views, buys, ["user_id"],
            lower="0 seconds", upper="2 hours",
            watermark_delay="3650 days",
        )
        out = joined.select(
            "user_id",
            F.col("event_id_l").alias("view_id"),
            F.col("event_id_r").alias("purchase_id"),
        )
        q = (
            out.writeStream.format("memory")
            .queryName("stream_interval_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
        return spark.table("stream_interval_join")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_session_counts(spark, sf_dir):
    """Event-time gap sessionization (dff/streaming.py:event_time_sessions)
    replayed deterministically with availableNow: sessions split where
    consecutive same-user events are >= 30 min apart; append mode emits
    every session finalized by the final watermark (end <= max event
    time).  Oracle is a gaps-and-islands SQL with the same cutoff."""
    from dff.streaming import event_time_sessions

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        src = _stream_dir(sf_dir)
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        )
        sess = event_time_sessions(
            stream, ts_col="ts", key_cols=("user_id",), gap="30 minutes",
            watermark_delay="0 seconds",
        )
        out = sess.select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias(
                "session_start"
            ),
            F.col("session_window.end").cast("timestamp_ntz").alias(
                "session_end"
            ),
            "n_events",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("session_counts")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
        return spark.table("session_counts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_unpivot_measures(spark, sf_dir):
    """Unpivot (wide->long, the inverse of ``pivot_counts``): per-flag
    aggregate measures melted into (flag, measure, value) rows via
    ``DataFrame.unpivot``; the oracle replays it as a UNION ALL (the
    portable relational form)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_disc", "n_rows"],
        "measure", "value",
    )


def q_ntile_buckets(spark, sf_dir):
    """Quantile binning (feature engineering / equi-depth histogram):
    ntile(4) + percent_rank per event_type over value, then bucket
    occupancy counts.  Deterministic tie-break on event_id."""
    e = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = e.select(
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return binned.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("pr").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("min_pr"),
        F.round(F.max("pr").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("max_pr"),
    )


def q_monotonic_violations(spark, sf_dir):
    """Order-dependency constraint (dff/fd.py:monotonic_violations):
    per-user running-max watermark over event time; rows dipping below any
    earlier high are violations.  prev_max is a copied data value (no
    arithmetic), so it hash-matches without rounding."""
    from dff.fd import monotonic_violations

    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 15)
    out = monotonic_violations(e, ["user_id"], ["ts", "event_id"], "value")
    return out.select("user_id", "event_id", "value", "prev_max")


def q_bloom_referential(spark, sf_dir):
    """Bloom-pre-filtered referential check (dff/bloom.py): the dim is the
    set of user_ids seen in 'signup' events; fact rows failing the Bloom
    probe are DEFINITE orphans emitted map-side (never shuffled), the rest
    verify through the exact anti-join.  Result must equal the plain
    anti-join — the oracle replays exactly that."""
    from dff.bloom import orphan_rows_bloom

    e = _t(spark, sf_dir, "events")
    # user_id % 7 == 0 signups withheld from the dim => those users'
    # purchases are planted orphans (the definite-orphan path fires)
    dim = e.where(
        (F.col("event_type") == "signup") & (F.col("user_id") % 7 != 0)
    ).select("user_id")
    orphans = orphan_rows_bloom(
        e.where(F.col("event_type") == "purchase"), dim, ["user_id"],
        m_bits=1 << 16,
    )
    return orphans.select("event_id", "user_id")


def q_impute_values(spark, sf_dir):
    """Null repair (dff/repair.py:impute): NULLs planted deterministically
    (event_id % 97 == 0), refilled with the per-type exact median, audit
    flag kept.  Exact interpolated median == DuckDB quantile_cont."""
    from dff.repair import impute

    e = _t(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = impute(e, "value", ["event_type"], strategy="median")
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("value").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("v"),
        "was_imputed",
    )


def q_fd_violations(spark, sf_dir):
    """Functional-dependency constraint (dff/fd.py): user_id -> event_type
    is (deliberately) massively violated in events; the op reports each
    conflicting (user, type) pair with its conflict count after
    compressing to distinct pairs map-side."""
    from dff.fd import fd_violations

    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 60)
    return fd_violations(e, ["user_id"], "event_type").select(
        "user_id", "event_type", "n_conflicts"
    )


def q_zscore_outliers(spark, sf_dir):
    """Data-derived anomaly constraint (dff/outliers.py:zscore_outliers):
    events whose value is >3 sample standard deviations from the mean OF
    ITS event_type.  Plan: one algebraic agg (6 groups) broadcast-joined
    back — the fact table never shuffles.  z is rounded through
    decimal(28,12) so the engines' different summation orders in mean/std
    cannot flip the printed digits."""
    from dff.outliers import zscore_outliers

    e = _t(spark, sf_dir, "events")
    out = zscore_outliers(e, "value", ["event_type"], threshold=3.0)
    return out.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("zscore").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("z"),
    )


def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence outliers (dff/outliers.py:iqr_outliers, exact-percentile
    realization; the 100 TB path swaps in the mergeable t-digest with
    identical plan shape — sketch-only shuffle, broadcast fences)."""
    from dff.outliers import iqr_outliers

    e = _t(spark, sf_dir, "events")
    out = iqr_outliers(e, "value", ["event_type"], k=1.5, exact=True)
    return out.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("fence_lo").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("lo"),
        F.round(F.col("fence_hi").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("hi"),
    )


def q_hll_rollup_violations(spark, sf_dir):
    """Driver-checkable INVARIANT for the persisted-HLL rollup
    (dff/hll.py): per-day sketches unioned per event_type must estimate
    distinct users within 5% of the exact count (lgk=12 => ~1.6% rse; 5%
    is > 3 sigma).  The merge path is exercised for real — sketches are
    built per (type, day) and unioned down to type.  Violations returned;
    expected empty."""
    from dff.hll import estimate_distinct, hll_rollup, merge_rollup

    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    daily = hll_rollup(e, "user_id", ["event_type", "day"])
    est = estimate_distinct(merge_rollup(daily, ["event_type"]))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .where(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            > 0.05
        )
        .select("event_type", "approx_distinct", "exact_distinct")
    )


def q_zorder_roundtrip(spark, sf_dir):
    """Z-order clustering (dff/layout.py) is a LAYOUT op — correctness is
    exact row preservation, which this query asserts as content aggregates
    over the re-read clustered copy (count, key sums, value checksum).
    The scan-pruning benefit is measured in test_layout.py (multi-dim
    min/max skipping vs a single-column sort)."""
    import tempfile

    from dff.layout import zorder_write

    e = _t(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="dff-zorder-") + "/events"
    zorder_write(e, ["user_id", "value"], out_dir, n_files=8)
    z = spark.read.parquet(out_dir)
    return z.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("user_id").alias("sum_user"),
        F.sum("event_id").alias("sum_event"),
        F.round(F.sum("value").cast("decimal(28,10)"), 3)
        .cast("double")
        .alias("sum_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_winsorized_values(spark, sf_dir):
    """Quantile clipping (dff/outliers.py:winsorize) — the repair twin of
    the outlier detectors: values clipped to per-type [p5, p95].  Exact
    interpolated percentiles match DuckDB quantile_cont bit-for-bit."""
    from dff.outliers import winsorize

    e = _t(spark, sf_dir, "events")
    out = winsorize(e, "value", ["event_type"], p_lo=0.05, p_hi=0.95)
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("value_winsorized").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("vw"),
    )


def q_chisq_drift(spark, sf_dir):
    """Pearson chi-square drift (dff/drift.py:chisq_drift): the
    even-event_id half of events is the baseline snapshot, the odd half is
    'current'; the statistic answers whether the event_type mix shifted
    beyond sampling noise.  The 5-row baseline count collect is the same
    bounded driver-side footprint as a persisted snapshot read."""
    from dff.drift import chisq_drift

    e = _t(spark, sf_dir, "events")
    base = {
        r["event_type"]: r["n"]
        for r in e.where(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cur = e.where(F.col("event_id") % 2 == 1)
    out = chisq_drift(cur, "event_type", base)
    return out.select(
        F.round(F.col("chi2").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("chi2"),
        "dof",
        "n",
    )


def q_correlation_stats(spark, sf_dir):
    """Bivariate aggregates (corr / covar) — the fitted-stats family
    (SURVEY §2.4) extended to column relationships; rounded through
    decimal(20,10) so the two engines' different summation orders cannot
    flip the last printed digit."""
    li = _t(spark, sf_dir, "lineitem")

    def dec(c, nd):
        return F.round(c.cast("decimal(20,10)"), nd).cast("double")

    return li.agg(
        dec(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        dec(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_s"),
        dec(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_p"),
    )


def q_pivot_counts(spark, sf_dir):
    """Pivot (wide confusion-matrix shape, reference 01_dff_model.py:503-507
    rendered as columns): docs per (lang, source) with explicit pivot
    values so the schema is static; empty cells coalesce to 0 to match the
    conditional-aggregation oracle."""
    d = _t(spark, sf_dir, "documents")
    srcs = ["src0", "src1", "src2", "src3"]
    wide = (
        d.where(F.col("source").isin(srcs))
        .groupBy("lang")
        .pivot("source", srcs)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "lang", *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in srcs]
    )


def q_split_assignment(spark, sf_dir):
    """Deterministic train/val/test assignment by content hash
    (dff/sampling.py::assign_splits): every doc gets exactly one label,
    stable under repartitioning and replayable in DuckDB.  Weights are
    binary-exact (0.75/0.125/0.125) so the cumulative thresholds are the
    same doubles in both engines."""
    from dff.sampling import assign_splits

    d = _t(spark, sf_dir, "documents")
    return assign_splits(
        d, ["doc_id"], {"train": 0.75, "val": 0.125, "test": 0.125}, seed=11
    ).select("doc_id", "split")


def q_word_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the word distribution (lexical-diversity
    quality signal).  Rounded through decimal(20,10) for the same
    cross-engine half-boundary reason as ``quality_scores``."""
    from dff.textops import word_entropy

    d = _t(spark, sf_dir, "documents")
    we = word_entropy(d, "doc_id", "text")
    h = F.col("entropy").cast("decimal(20,10)")
    return we.select(
        "doc_id", "n_words", F.round(h, 4).cast("double").alias("h")
    )


def q_quality_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # round once, through decimal(20,10): rounding a raw DOUBLE diverges
    # across engines at half-boundaries (Spark rounds the shortest decimal
    # repr HALF_UP, DuckDB rounds the true binary value); the decimal cast
    # pins both to the same 10-decimal value first
    q = quality_score("text", decimals=None).cast("decimal(20,10)")
    return d.select("doc_id", F.round(q, 4).cast("double").alias("q"))


def q_incremental_dedup_violations(spark, sf_dir):
    """Driver-checkable INVARIANT for the incremental MinHash store
    (dff/incremental.py): splitting the corpus into old/new halves, then
    ``init(old) + probe(new)`` must find EXACTLY the pairs a one-shot
    :func:`dff.dedup.minhash_dedup_pairs` run over the whole corpus finds,
    restricted to pairs touching a new doc — same (id_a, id_b, est_jaccard)
    triples (the est_jaccard arithmetic is count-of-64 / 64, exact in fp on
    both paths).  Returns the symmetric difference — expected EMPTY."""
    import hashlib
    import tempfile

    from dff.incremental import MinHashStore

    d = _t(spark, sf_dir, "documents")
    old = d.where(F.xxhash64("doc_id") % 2 == 0)
    new = d.where(F.xxhash64("doc_id") % 2 != 0)

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    loc = os.path.join(tempfile.gettempdir(), f"dff-incr-{tag}")
    store = MinHashStore(spark, loc, managed=False)
    store.init(old, "doc_id", "text")  # overwrite: rerun-safe
    probed = store.probe(new, "doc_id", "text", threshold=0.7).select(
        "id_a", "id_b", "est_jaccard"
    )

    full = minhash_dedup_pairs(d, "doc_id", "text", threshold=0.7)
    new_ids = new.select(F.col("doc_id").alias("id_a"))
    touching_new = full.join(
        F.broadcast(new_ids), "id_a", "left_semi"
    ).unionByName(
        full.join(
            F.broadcast(new_ids.withColumnRenamed("id_a", "id_b")),
            "id_b",
            "left_semi",
        )
    ).dropDuplicates(["id_a", "id_b"]).select("id_a", "id_b", "est_jaccard")

    # set difference via anti-joins (both sides are distinct on (id_a,id_b)
    # by construction; exceptAll trips a Spark attribute-binding bug on
    # these self-referencing cached subplans).  est_jaccard is k/64 with k
    # integer on both paths, so the double equality in the join key is
    # exact, not a tolerance comparison.
    keys = ["id_a", "id_b", "est_jaccard"]
    return (
        probed.join(touching_new, keys, "left_anti")
        .unionByName(touching_new.join(probed, keys, "left_anti"))
        .select("id_a", "id_b")
    )


def q_pca_projection_violations(spark, sf_dir):
    """Driver-checkable INVARIANT for PCA projection (dff/projection.py,
    VERDICT r04 #5): a full-rank (k = d) PCA basis is orthonormal, so it
    preserves every pairwise squared Euclidean distance exactly (fp
    tolerance); any k < d projection is a CONTRACTION — it can only shrink
    a distance, never grow it.  Both checks over all pairs of a fixed
    30-vector set; violations returned, expected empty (oracle twin:
    WHERE 1=0, the pattern shared with minhash/ivf/tdigest).  Basis
    QUALITY beyond the invariant (recall@10 of projected ANN) is pinned by
    tests/test_projection.py."""
    from dff.projection import fit_pca

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    full = fit_pca(emb, "embedding", k=64)
    low = fit_pca(emb, "embedding", k=8)
    ev = emb.where(F.col("vec_id") < 30).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    proj = low.transform(full.transform(ev, "p_full"), "p_low")

    def d2(ca, cb):
        return F.aggregate(
            F.zip_with(ca, cb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = proj.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("xa"),
        F.col("p_full").alias("fa"), F.col("p_low").alias("la"),
    )
    b = proj.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("xb"),
        F.col("p_full").alias("fb"), F.col("p_low").alias("lb"),
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("ida") < F.col("idb"))
        .select(
            "ida", "idb",
            d2("xa", "xb").alias("exact_d2"),
            d2("fa", "fb").alias("full_d2"),
            d2("la", "lb").alias("low_d2"),
        )
    )
    return pairs.where(
        (F.abs(F.col("full_d2") - F.col("exact_d2"))
         > 1e-6 * (F.col("exact_d2") + F.lit(1.0)))
        | (F.col("low_d2")
           > F.col("exact_d2") * F.lit(1.0 + 1e-9) + F.lit(1e-6))
    ).select("ida", "idb", "exact_d2", "full_d2", "low_d2")


def q_lineage_trend_violations(spark, sf_dir):
    """Trend gate (dff/checkpoint.py:trend_violations — the engine's
    snapshot-over-snapshot lineage constraints, VERDICT r04 #8) under the
    driver: two per-partition metric frames derived deterministically from
    orders.  base = rows + violations per (o_orderkey % 24) partition;
    cur = the same snapshot with partition 7 losing every o_orderkey%5<2
    row (~40% drop > 10% gate; 5 is coprime with 24, so the drop predicate
    varies WITHIN the partition — a %3 predicate would be constant there),
    partition 11's violations tripled (rate rise 2.0 > 0.5 gate), and
    partition 19 absent entirely (missing_partition).  The oracle replays
    the aggregation + full-outer join + first-match CASE in ANSI SQL."""
    from dff.checkpoint import trend_violations

    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 24).cast("int").alias("partition_id"),
        "o_orderkey",
    )
    is_viol = F.when(F.col("o_orderkey") % 11 == 0, 1).otherwise(0)
    base = orders.groupBy("partition_id").agg(
        F.count("*").alias("base_rows"),
        F.sum(is_viol).alias("base_viol"),
    )
    cur_src = orders.where(
        ~((F.col("partition_id") == 7) & (F.col("o_orderkey") % 5 < 2))
        & (F.col("partition_id") != 19)
    )
    cur_viol = F.when(
        F.col("o_orderkey") % 11 == 0,
        F.when(F.col("partition_id") == 11, 3).otherwise(1),
    ).otherwise(0)
    cur = cur_src.groupBy("partition_id").agg(
        F.count("*").alias("cur_rows"),
        F.sum(cur_viol).alias("cur_viol"),
    )
    return trend_violations(base, cur, max_row_drop=0.1, max_violation_rise=0.5)


def q_table_time_travel(spark, sf_dir):
    """Table format (dff/tablefmt.py) under the driver: documents land in
    THREE atomic snapshot commits split by doc_id % 3; reading snapshot
    version 2 (create=0, append=1, append=2) must see exactly the first
    two commits — time travel as a row-set oracle (`WHERE doc_id % 3 <= 1`
    in DuckDB).  The commit protocol itself (O_EXCL create, crash
    invisibility, rebase-on-race) is pinned by tests/test_tablefmt.py."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for r in range(3):
        t.append(d.where(F.col("doc_id") % 3 == r), n_files=2)
    return t.scan(spark, version=2).select("doc_id", "lang", "n_chars")


def q_table_cow_delete(spark, sf_dir):
    """Copy-on-write DELETE through the table format: four commits split
    by doc_id % 4, then ``delete_where(lang = 'en')``; the survivor set
    must equal ANSI ``DELETE WHERE lang = 'en'`` (NULL-lang rows survive —
    predicate-NULL is not TRUE).  File-granularity carry-by-reference (only
    stat-overlapping files rewritten) is pinned by tests/test_tablefmt.py;
    here the driver checks the row-level semantics end to end."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for r in range(4):
        t.append(d.where(F.col("doc_id") % 4 == r), n_files=1)
    t.delete_where(spark, [("lang", "=", "en")])
    return t.scan(spark).select("doc_id", "lang", "source")


def q_table_merge_upsert(spark, sf_dir):
    """MERGE INTO through the table format (dff/tablefmt.py:merge_upsert):
    documents land in four commits; the source carries one UPDATE stream
    (doc_id % 7 == 0 relabeled lang='xx') and one INSERT stream (doc_id %
    13 == 0 shifted by +10M).  Matched target rows are replaced whole,
    unmatched source rows append, everything else is untouched — the
    oracle replays it as anti-join + union in ANSI SQL.  COW file pruning
    by source key bounds is pinned by tests/test_tablefmt.py."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for r in range(4):
        t.append(d.where(F.col("doc_id") % 4 == r), n_files=1)
    upd = d.where(F.col("doc_id") % 7 == 0).withColumn("lang", F.lit("xx"))
    ins = d.where(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    t.merge_upsert(spark, upd.unionByName(ins), ["doc_id"])
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_scan_added(spark, sf_dir):
    """Incremental read off the table log (dff/tablefmt.py:scan_added):
    three commits split by doc_id % 3; reading 'files added after commit
    1' must see exactly the % 3 in (1, 2) rows — the primitive that turns
    every downstream pipeline incremental (validate.py --table-input
    --since consumes it)."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    v1 = None
    for r in range(3):
        v = t.append(d.where(F.col("doc_id") % 3 == r), n_files=2)
        if r == 0:
            v1 = v
    return t.scan_added(spark, since_version=v1).select(
        "doc_id", "lang", "n_chars"
    )


def q_table_stream_sink(spark, sf_dir):
    """Exactly-once streaming sink into the table format
    (dff/streaming.py:stream_to_table): documents flow through a file
    stream into atomic snapshot commits keyed by stream-batch id; a
    hand-replayed batch 0 (the foreachBatch crash window) hits its
    idempotency key in the commit log and no-ops.  The final row set must
    be exactly the source table — no loss, no duplication."""
    import hashlib
    import tempfile

    from dff.streaming import stream_to_table
    from dff.tablefmt import Table

    src = f"{sf_dir}/documents.parquet"
    if os.path.isdir(src):
        stage = src
    else:
        tag = hashlib.sha256(src.encode()).hexdigest()[:12]
        stage = os.path.join(tempfile.gettempdir(), f"dff-docstream-{tag}")
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stage)
    root = tempfile.mkdtemp(prefix="dff-tbl-") + "/docs"
    q = stream_to_table(stream, root, tempfile.mkdtemp(prefix="dff-ck-"))
    q.awaitTermination(120)
    t = Table(root)
    t.append(spark.read.parquet(src), idempotency_key="stream-batch-0")
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_stream_source(spark, sf_dir):
    """Table as a streaming SOURCE end-to-end (dff/streaming.py:
    stream_from_table -> Table.append(idempotency_key=...)): the source
    table takes three appends with a compaction between the last two; a
    consumer tails the commit log into a sink table, stamping each batch
    with its ``table-src-<until>`` idempotency key.  Then the cursor file
    is deleted (the crash window) and the whole log re-drains — every
    replayed batch finds its key in the sink's commit log and no-ops.
    The sink must equal the source exactly: the compaction re-delivers
    nothing (row-neutral layout commit), the replay duplicates nothing.
    Native realization of Delta's readStream / Iceberg's incremental
    append scan; the reference's closest surface is its batch-scored
    orchestration loop (RUNME.py staging), re-expressed as a resumable
    commit-log tail."""
    import tempfile

    from dff.streaming import stream_from_table
    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    src = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/src", d.schema)
    sink = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/sink", d.schema
    )
    ckpt = tempfile.mkdtemp(prefix="dff-ck-")

    def copy(df, batch):
        sink.append(df, idempotency_key=batch["idempotency_key"])

    src.append(d.where(F.col("doc_id") % 3 == 0), n_files=2)
    stream_from_table(spark, src.root, ckpt, copy)  # drains commit 1
    src.append(d.where(F.col("doc_id") % 3 == 1), n_files=2)
    src.compact(spark)  # row-neutral: must deliver nothing
    src.append(d.where(F.col("doc_id") % 3 == 2), n_files=2)
    stream_from_table(spark, src.root, ckpt, copy)  # drains the rest
    os.remove(os.path.join(ckpt, "cursor.json"))  # crash: cursor lost
    stream_from_table(spark, src.root, ckpt, copy)  # full replay, no-ops
    return sink.scan(spark)


def q_table_rollback_retention(spark, sf_dir):
    """Rollback + retention + orphan GC on the table format
    (dff/tablefmt.py:rollback/expire_snapshots/gc_orphans): a bad load
    lands (doc_id % 3 == 2), ``rollback`` points the tip back at the good
    snapshot as a NEW commit (history stays auditable), a corrective
    append lands, a crashed writer's orphan data file is GC'd
    (grace 0), and ``expire_snapshots(keep_last=2)`` drops time travel to
    the bad era — while the kept rollback snapshot keeps the ORIGINAL
    load's manifests alive through its reference (the retention edge this
    gate exists to pin).  Final scan == good load + corrective load;
    reading the expired version must raise (asserted in-run)."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    v1 = t.append(d.where(F.col("doc_id") % 3 == 0), n_files=2)
    v2 = t.append(d.where(F.col("doc_id") % 3 == 2), n_files=2)  # bad load
    t.rollback(v1)
    t.append(d.where(F.col("doc_id") % 3 == 1), n_files=2)
    orphan = os.path.join(t.data_dir, "orphan-crashed-writer.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a committed file")
    t.gc_orphans(grace_seconds=0.0)
    assert not os.path.exists(orphan), "orphan survived gc_orphans"
    t.expire_snapshots(keep_last=2)
    try:
        t.scan(spark, version=v2).count()
        raise AssertionError("time travel to an expired snapshot succeeded")
    except AssertionError:
        raise
    except Exception:
        pass  # expired: any read error is the contract
    return t.scan(spark)


def q_fuzzy_pairs(spark, sf_dir):
    """Fuzzy edit-distance self-join (dff/fuzzy.py): identifier-like
    strings derived from doc_id (planted 1-edit families: u007 / u007x /
    u007xy) matched at levenshtein <= 1 via FastSS deletion-neighborhood
    blocking + exact verify — no cartesian product (plan-tested).  The
    oracle brute-forces the same predicate with DuckDB's levenshtein."""
    from dff.fuzzy import fuzzy_pairs

    t = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.lit("u"),
            F.lpad(F.floor(F.col("doc_id") / 3).cast("string"), 3, "0"),
            F.when(F.col("doc_id") % 3 == 1, F.lit("x"))
            .when(F.col("doc_id") % 3 == 2, F.lit("xy"))
            .otherwise(F.lit("")),
        ).alias("s"),
    )
    return fuzzy_pairs(t, "id", "s", max_dist=1)


def q_scd2_intervals(spark, sf_dir):
    """SCD type-2 history (dff/scd.py): the events change log collapses
    into per-user validity intervals — consecutive equal event_types
    suppress, each surviving change opens [valid_from, valid_to) with the
    open interval flagged current.  One shuffle on user_id; the oracle
    replays the same LAG-suppress + LEAD-close windows in ANSI SQL."""
    from dff.scd import scd2_intervals

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    return scd2_intervals(
        e, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
    )


def q_cdc_apply(spark, sf_dir):
    """CDC closure (dff/diff.py:apply_cdc): a table seeded with one
    snapshot is reconciled to a second by applying EXACTLY the
    snapshot_diff churn — added/changed rows MERGE (COW), removed keys
    DELETE (COW anti-join).  The final scan must equal the target
    snapshot bit-for-bit; the oracle states that target directly.
    Exercises all three change classes: added (doc_id%5=0 & %7!=0),
    removed (%7=0 & %5!=0), changed (%3=0 survivors)."""
    import tempfile

    from dff.diff import apply_cdc
    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 5 != 0)
    new = d.where(F.col("doc_id") % 7 != 0).withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.lit("cdc")).otherwise(
            F.col("lang")
        ),
    )
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(old, n_files=3)
    apply_cdc(spark, t, new, ["doc_id"], ["lang", "text", "source", "n_chars"])
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_partition_prune(spark, sf_dir):
    """Hidden partitioning, bucket transform (dff/tablefmt.py): documents
    land bucket(8)-partitioned on doc_id; an in-list point lookup on the
    SOURCE column prunes to only the buckets the values hash into (the
    pruning-count invariant is pinned by tests/test_partition.py — this
    gate pins that pruning never changes results).  min/max stats cannot
    prune a hash-scattered key; bucket partitioning is what makes point
    lookups on a 10^12-file table open 1/n of it."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    t = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/docs",
        d.schema,
        partition_spec=[("doc_id", "bucket", 8)],
    )
    t.append(d)
    ids = list(range(0, max_id + 1, 13))
    return t.scan(spark, filters=[("doc_id", "in", ids)]).select(
        "doc_id", "lang", "n_chars"
    )


def q_table_day_partition(spark, sf_dir):
    """Hidden partitioning, day transform: events land day-partitioned on
    ts (30 files for the 30-day fixture); a half-open timestamp range on
    the source column prunes to the 5 overlapped days before any file is
    listed.  The oracle replays the exact predicate over all rows."""
    import datetime
    import tempfile

    from dff.tablefmt import Table

    e = _t(spark, sf_dir, "events")
    t = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/events",
        e.schema,
        partition_spec=[("ts", "day")],
    )
    t.append(e)
    flt = [
        ("ts", ">=", datetime.datetime(2024, 1, 10)),
        ("ts", "<", datetime.datetime(2024, 1, 15)),
    ]
    return (
        t.scan(spark, filters=flt)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


def q_table_wap_publish(spark, sf_dir):
    """Write-Audit-Publish (dff/tablefmt.py branches): even doc_ids land
    on main; odd doc_ids arrive on branch 'ingest' and pass their audit
    (scan_added + a not-null/lang constraint) -> published; a second
    branch 'bad' carries rows relabeled lang=NULL, FAILS the audit and is
    dropped.  The final main scan must be exactly the full documents
    table — the bad batch never becomes visible to readers.  This is the
    table-format realization of the engine's whole reason to exist:
    validation gating visibility."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(d.where(F.col("doc_id") % 2 == 0), n_files=2)

    good = t.create_branch("ingest")
    good.append(d.where(F.col("doc_id") % 2 == 1), n_files=2)
    audited = good.scan_added(spark, since_version=0)
    if audited.where(F.col("lang").isNull()).count() == 0:
        t.publish_branch("ingest")

    bad = t.create_branch("bad")
    bad.append(
        d.where(F.col("doc_id") % 2 == 1).withColumn(
            "lang", F.lit(None).cast("string")
        ),
        n_files=1,
    )
    if bad.scan_added(spark, since_version=0).where(
        F.col("lang").isNull()
    ).count() > 0:
        t.drop_branch("bad")  # audit failed: never published

    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_optimize_cluster(spark, sf_dir):
    """OPTIMIZE (dff/tablefmt.py::rewrite_clustered): events ingested
    unclustered (every file spans the full event_id range), then
    rewritten range-clustered on event_id in one atomic commit; a
    between-filter scan afterward opens a small fraction of files
    (pruning counts pinned by tests/test_branches.py) and must return
    exactly the oracle's rows — layout changes, data never does."""
    import tempfile

    from dff.tablefmt import Table

    e = _t(spark, sf_dir, "events")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/ev", e.schema)
    t.append(e.repartition(8), n_files=8)
    t.rewrite_clustered(spark, ["event_id"], n_files=8)
    return t.scan(
        spark, filters=[("event_id", "between", (2000, 3999))]
    ).select("event_id", "event_type", "value")


def q_table_mor_delete(spark, sf_dir):
    """Merge-on-read DELETE (dff/tablefmt.py:delete_matching_mor): the
    doc_id % 7 == 3 keys become an equality-delete file — ZERO data files
    are read or rewritten (asserted in-run) — then the % 21 == 3 subset
    re-appends with lang='re'.  Sequence numbers make the tombstone apply
    only to files OLDER than the delete, so the re-inserted rows survive;
    the oracle replays both effects in ANSI SQL."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for r in range(2):
        t.append(d.where(F.col("doc_id") % 2 == r), n_files=2)
    files_before = {e["path"] for e in t.entries()}
    t.delete_matching_mor(
        spark, d.where(F.col("doc_id") % 7 == 3).select("doc_id"), ["doc_id"]
    )
    assert {e["path"] for e in t.entries()} == files_before  # MOR: no rewrite
    t.append(
        d.where(F.col("doc_id") % 21 == 3).withColumn("lang", F.lit("re")),
        n_files=1,
    )
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_mor_merge(spark, sf_dir):
    """MERGE INTO, merge-on-read (dff/tablefmt.py:merge_upsert mode=mor):
    identical semantics to the COW gate (same oracle SQL) but the target
    is NEVER read — source keys land as an equality-delete file and the
    source rows append, so a daily upsert into a 100 TB table costs
    O(batch).  In-run assert: every pre-merge data file survives
    untouched."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for r in range(4):
        t.append(d.where(F.col("doc_id") % 4 == r), n_files=1)
    files_before = {e["path"] for e in t.entries()}
    upd = d.where(F.col("doc_id") % 7 == 0).withColumn("lang", F.lit("xx"))
    ins = d.where(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    t.merge_upsert(spark, upd.unionByName(ins), ["doc_id"], mode="mor")
    assert files_before <= {e["path"] for e in t.entries()}
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_spec_evolution(spark, sf_dir):
    """Partition spec evolution (dff/tablefmt.py:evolve_partition_spec):
    documents ingested under bucket(doc_id, 4), the spec evolves to
    bucket(doc_id, 8) in a METADATA-ONLY commit (in-run assert: zero
    files rewritten), the second half lands under the new spec, and a
    point lookup prunes each era under the spec its files were written
    with (1/4 + 1/8, asserted).  The filtered scan must equal the plain
    SQL replay — evolution changes layout bookkeeping, never rows."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents")
    t = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/docs",
        d.schema,
        partition_spec=[("doc_id", "bucket", 4)],
    )
    t.append(d.where(F.col("doc_id") % 2 == 0))
    files_before = {e["path"] for e in t.entries()}
    t.evolve_partition_spec([("doc_id", "bucket", 8)])
    assert {e["path"] for e in t.entries()} == files_before  # metadata-only
    t.append(d.where(F.col("doc_id") % 2 == 1))
    era0 = [e for e in t.entries() if e.get("spec_id", 0) == 0]
    era1 = [e for e in t.entries() if e.get("spec_id", 0) == 1]
    n = t.scan_file_count(filters=[("doc_id", "=", 77)])
    assert n <= -(-len(era0) // 4) + -(-len(era1) // 8) < len(t.entries())
    return t.scan(spark, filters=[("doc_id", "<", 500)]).select(
        "doc_id", "lang", "n_chars"
    )


def q_table_change_feed(spark, sf_dir):
    """Change-data-feed (dff/tablefmt.py:scan_changes): a COW delete, a
    COW update and a MOR delete over the documents table, read back as
    row-level CDC events (delete / update_preimage / update_postimage
    with commit versions).  COW changes come from commit-time change
    files; the MOR delete's pre-images compute on read with the prior
    snapshot manifest-pruned by the tombstone's own key stats."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/docs",
        d.schema,
        change_feed=True,
    )
    v1 = t.append(
        d.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
    )
    t.delete_where(spark, [("doc_id", "between", (100, 149))])
    t.update_where(
        spark, [("doc_id", "between", (200, 249))], {"n_chars": "n_chars + 7"}
    )
    t.delete_matching_mor(
        spark,
        spark.createDataFrame([(300,), (301,), (302,)], "doc_id long"),
        ["doc_id"],
    )
    return t.scan_changes(spark, v1)


def q_cdc_replication(spark, sf_dir):
    """CDC replication (dff/cdc.py:apply_changes over
    dff/tablefmt.py:scan_changes): documents flow into a change_feed
    source table, a COW delete + update and a MOR delete mutate it, and
    the feed replays into an independent target table commit-by-commit
    (MOR writes only — the target never reads its own files).  The
    returned target scan must equal the oracle's direct replay of the
    same mutations; in-run assert pins target == source."""
    import tempfile

    from dff.cdc import apply_changes
    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = tempfile.mkdtemp(prefix="dff-tbl-")
    src = Table.create(base + "/src", d.schema, change_feed=True)
    dst = Table.create(base + "/dst", d.schema)
    src.append(d.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id"))
    src.delete_where(spark, [("doc_id", "between", (100, 149))])
    src.update_where(
        spark, [("doc_id", "between", (200, 249))], {"lang": "'xx'"}
    )
    src.delete_matching_mor(
        spark,
        spark.createDataFrame([(300,), (301,)], "doc_id long"),
        ["doc_id"],
    )
    apply_changes(spark, src, dst, ["doc_id"], since_version=0)
    a = {tuple(r) for r in dst.scan(spark).collect()}
    b = {tuple(r) for r in src.scan(spark).collect()}
    assert a == b, "replica diverged from source"
    return dst.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_widen_type(spark, sf_dir):
    """Type-widening evolution (dff/tablefmt.py:widen_column_type):
    even docs ingested with int32 n_chars, the column widens to bigint
    in a METADATA-ONLY commit (in-run assert: zero files rewritten, old
    files physically int32), odd docs then land with values past 2^35.
    Reads cast each file's era; stats pruning spans both eras."""
    import os as _os
    import tempfile

    import pyarrow.parquet as pq

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("int").alias("doc_id"),
        F.col("n_chars").cast("int").alias("n_chars"),
    )
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(d.where(F.col("doc_id") % 2 == 0), n_files=2)
    from pyspark.sql import types as T

    files_before = {e["path"] for e in t.entries()}
    t.widen_column_type("n_chars", T.LongType())
    assert {e["path"] for e in t.entries()} == files_before  # metadata-only
    narrow = pq.ParquetFile(
        _os.path.join(t.root, next(iter(files_before)))
    ).schema_arrow
    assert str(narrow.field("n_chars").type) == "int32"  # never rewritten
    t.append(
        d.where(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            (F.col("n_chars").cast("long") + F.lit(2**35)).alias("n_chars"),
        ),
        n_files=2,
    )
    # values past int32 only exist in the wide era: pruning engages
    assert t.scan_file_count(filters=[("n_chars", ">=", 2**35)]) <= 2
    return t.scan(spark).select("doc_id", "n_chars")


def q_table_update_where(spark, sf_dir):
    """COW UPDATE ... SET ... WHERE (dff/tablefmt.py:update_where):
    documents ingested as 4 doc_id-range-clustered files; an UPDATE on a
    100-key range rewrites ONLY the stat-overlapping files (in-run
    assert: >= 2 of 4 carried by reference) and applies the SET
    expressions to exactly the predicate-true rows.  Reference analog:
    the reference refreshes Delta tables by full overwrite
    (01_dff_model.py:481-485) — this is the surgical row-level verb."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(
        d.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
    )
    before = {e["path"] for e in t.entries()}
    t.update_where(
        spark,
        [("doc_id", "between", (100, 199))],
        {"lang": "'xx'", "n_chars": "n_chars + 1"},
    )
    after = {e["path"] for e in t.entries()}
    assert len(before & after) >= 2  # untouched files carried by reference
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_merge_conditional(spark, sf_dir):
    """Conditional MERGE clauses (dff/tablefmt.py:merge_upsert): WHEN
    MATCHED AND t.doc_id % 2 = 0 THEN UPDATE, WHEN MATCHED AND
    s.n_chars % 10 = 3 THEN DELETE (checked first, Delta clause order),
    WHEN NOT MATCHED AND s.doc_id % 2 = 0 THEN INSERT — per-row outcomes
    against the broadcast source pair, target files never joined unless
    their stats overlap the source keys."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(d.where(F.col("doc_id") < 400), n_files=2)
    src = d.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.lit("src").alias("lang"),
        (F.col("n_chars") + 500).alias("n_chars"),
    )
    t.merge_upsert(
        spark,
        src,
        ["doc_id"],
        matched_condition="t.doc_id % 2 = 0",
        matched_delete_condition="s.n_chars % 10 = 3",
        not_matched_condition="s.doc_id % 2 = 0",
    )
    return t.scan(spark).select("doc_id", "lang", "n_chars")


def q_table_schema_evolution(spark, sf_dir):
    """Field-id schema evolution (dff/tablefmt.py:rename_column /
    append(evolve=True)): even docs ingested, ``lang`` renamed to
    ``language`` in a METADATA-ONLY commit (in-run assert: zero files
    rewritten), odd docs then land WITH a new ``half_chars`` column via
    an evolve append.  Old files read the renamed column through their
    write-time field ids and NULL for the added one; files predating the
    add physically LACK its field id, so a filter on it prunes them
    without opening anything (asserted).  Reference analog: the
    reference evolves its Delta tables by full rewrite
    (01_dff_model.py:481-485); field ids make it O(1 commit) at 100 TB."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(d.where(F.col("doc_id") % 2 == 0), n_files=2)
    files_before = {e["path"] for e in t.entries()}
    t.rename_column("lang", "language")
    assert {e["path"] for e in t.entries()} == files_before  # metadata-only
    t.append(
        d.where(F.col("doc_id") % 2 == 1)
        .withColumnRenamed("lang", "language")
        .withColumn("half_chars", F.col("n_chars") / F.lit(2.0)),
        evolve=True,
        n_files=2,
    )
    # pre-add files physically lack the field id -> pruned outright
    assert t.scan_file_count(filters=[("half_chars", ">=", 0.0)]) <= 2
    return t.scan(spark).select(
        "doc_id", "language", "n_chars", "half_chars"
    )


def q_table_distributed_plan(spark, sf_dir):
    """Distributed manifest planning (dff/tablefmt.py:
    plan_files_distributed): events ingested as 8 event_id-range-
    clustered commits; the file-pruning decision for a range predicate
    runs as a Catalyst job over the manifest JSONs (the driver loop is
    O(files) — hours at 10^9 files), and reading EXACTLY the surviving
    files plus the row filter must equal the oracle.  In-run asserts:
    the plan prunes (< all files) and matches the driver loop's file set
    bit-for-bit."""
    import tempfile

    from dff.tablefmt import Table

    e = _t(spark, sf_dir, "events")
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/ev", e.schema)
    t.append(
        e.repartitionByRange(8, "event_id").sortWithinPartitions("event_id")
    )
    filters = [("event_id", "between", (2500, 4499))]
    planned = t.plan_files_distributed(spark, filters)
    # parity with the driver loop, and the plan must actually prune
    assert len(planned) == t.scan_file_count(filters) < len(t.entries())
    import os

    df = (
        spark.read.schema(t.schema())
        .parquet(*[os.path.join(t.root, x["path"]) for x in planned])
        .where(F.col("event_id").between(2500, 4499))
    )
    return df.select("event_id", "event_type", "value")


def q_table_bloom_lookup(spark, sf_dir):
    """Per-file Bloom skipping (dff/tablefmt.py bloom_cols): documents
    gain a hash-scattered uid column — every file's [min,max] spans any
    probe, so stats prune NOTHING — yet a point lookup opens <=2 of 4
    files via the manifest blooms (asserted in-run).  The returned rows
    must equal the plain doc_id replay (uid = xxhash64(doc_id) is
    deterministic and collision-free at this scale)."""
    import tempfile

    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").withColumn(
        "uid", F.xxhash64("doc_id")
    )
    t = Table.create(
        tempfile.mkdtemp(prefix="dff-tbl-") + "/docs",
        d.schema,
        bloom_cols=["uid"],
    )
    for r in range(4):
        t.append(d.where(F.col("doc_id") % 4 == r), n_files=1)
    probes = tuple(
        r.uid
        for r in d.where(F.col("doc_id").isin(123, 124, 125)).collect()
    )
    assert t.scan_file_count(filters=[("uid", "in", probes)]) < 4  # bloom cut
    return t.scan(spark, filters=[("uid", "in", probes)]).select(
        "doc_id", "lang", "n_chars"
    )


def q_table_check_constraint(spark, sf_dir):
    """Table CHECK constraints (dff/tablefmt.py add_check_constraint —
    Delta's ALTER TABLE ADD CONSTRAINT): the rule-DAG predicate language
    applied as a WRITE gate.  Load the n_chars>=100 documents, attach
    that predicate as a constraint (metadata-only, existing rows proven),
    then (a) a violating batch — n_chars forced to 1 — must raise and
    commit NOTHING (asserted in-run), and (b) the clean remainder must
    append normally.  Final contents therefore equal the plain ANSI
    filter: every committed row satisfies the constraint by
    construction of the gate, not of the query."""
    import tempfile

    from dff.tablefmt import CheckConstraintViolation, Table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    clean = d.where(F.col("n_chars") >= 100)
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    t.append(clean.where(F.col("doc_id") % 2 == 0), n_files=1)
    t.add_check_constraint(spark, "min_length", "n_chars >= 100")
    tip = t._snapshot()["version"]
    try:
        t.append(
            d.limit(50).withColumn(
                "n_chars", F.lit(1).cast(dict(d.dtypes)["n_chars"])
            ),
            n_files=1,
        )
        raise AssertionError("violating batch must not commit")
    except CheckConstraintViolation:
        pass
    assert t._snapshot()["version"] == tip  # nothing committed
    t.append(clean.where(F.col("doc_id") % 2 == 1), n_files=1)
    return t.scan(spark)


def q_stats_prune_validation(spark, sf_dir):
    """Stats-only validation fast path (dff/statsvalidate.py): documents
    ingested as 8 doc_id-range-clustered files; three constraints —
    doc_id >= 40%-of-max (clustered: stats decide 7/8 files),
    n_chars between(100,400) (scattered: forces scans), and
    not_null(maybe) with planted doc_id%11 nulls (decided from null
    counts alone, zero scans).  The manifest-decided counts plus ONE
    distributed pass over only the undecidable files must equal the full
    per-rule violation counts the oracle computes over every row — the
    10^12-file move: certify the provably-clean majority from metadata.
    Reference analog: pandasql rule eval over the whole frame
    (02_dff_orchestration.py), which re-reads everything every run."""
    import tempfile

    from dff.statsvalidate import StatsRule, validate_table_stats
    from dff.tablefmt import Table

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars"))
        .alias("maybe"),
    )
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    lo = max_id * 2 // 5
    band = max_id // 8 + 1
    t = Table.create(tempfile.mkdtemp(prefix="dff-tbl-") + "/docs", d.schema)
    for b in range(8):
        part = d.where(
            (F.col("doc_id") >= b * band) & (F.col("doc_id") < (b + 1) * band)
        )
        t.append(part, n_files=1)
    rules = [
        StatsRule("c_docid_ge", "doc_id", ">=", lo=lo),
        StatsRule("c_maybe_nn", "maybe", "not_null"),
        StatsRule("c_nchars_between", "n_chars", "between", lo=100, hi=400),
    ]
    return validate_table_stats(spark, t, rules)


def q_corpus_mixture(spark, sf_dir):
    """Token-budget corpus mixture (dff/mixing.py): give src1 half of a
    120%-of-pool char budget and src2/src3 a quarter each — src1 must
    UP-sample (full epoch 0 + a hash-picked partial epoch 1), src2/src3
    down-sample.  The whole derivation (exact BIGINT avail sums, integer
    budget, fixed-order IEEE rate arithmetic, md5 epoch membership) is
    replayed in DuckDB, so the sampled (doc_id, epoch) SET — mixture
    multiplicity included — is value-hash-checked cross-engine."""
    from dff.mixing import mixture_plan, mixture_sample

    weights = {"src1": 0.5, "src2": 0.25, "src3": 0.25}
    pool = _t(spark, sf_dir, "documents").where(F.col("source").isin(list(weights)))
    total = pool.agg(F.sum(F.col("n_chars").cast("long"))).collect()[0][0]
    budget = (int(total) * 6) // 5  # 120% of the pool: forces upsampling
    plan = mixture_plan(pool, "source", "n_chars", weights, budget, max_rate=4.0)
    out = mixture_sample(pool, "source", ["doc_id"], plan, seed=11)
    return out.select(
        "doc_id", "source", F.col("epoch").cast("long").alias("epoch")
    )


def q_sequence_packing(spark, sf_dir):
    """GPT-style sequence packing (dff/packing.py): documents hash into 4
    independent token streams, a deterministic within-shard shuffle orders
    them, and ONE running-sum window lays each doc at its stream offset —
    start context, in-context offset, and boundary-crossing span are plain
    arithmetic on that sum.  DuckDB replays the identical hash order and
    window, so the ENTIRE layout (every doc's placement) value-hash-checks
    cross-engine.  n_chars stands in for the token count (integral, so the
    running sums are exact in both engines)."""
    from dff.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    out = pack_sequences(d, "n_chars", 256, ["doc_id"], n_shards=4, seed=4)
    return out.select(
        "doc_id",
        "shard",
        F.col("start_off").cast("long").alias("start_off"),
        F.col("ctx_id").cast("long").alias("ctx_id"),
        F.col("ctx_off").cast("long").alias("ctx_off"),
        F.col("n_ctx").cast("long").alias("n_ctx"),
    )


def q_semantic_dedup_violations(spark, sf_dir):
    """SemDeDup-style semantic dedup self-check (dff/semdedup.py): cluster
    embeddings with the bounded IVF trainer, apply the upper-triangular
    drop rule, then re-derive every verdict by brute force over the SAME
    cell assignment and report disagreements.  Must be empty on any input
    (invariant-twin pattern: cells are engine-internal, so the oracle is
    the empty set, like hll_rollup_violations); the drop rule itself is
    pinned by pytest on planted duplicate vectors."""
    from dff.semdedup import semantic_dedup_violations

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_violations(
        e, "vec_id", "embedding", threshold=0.98, n_centroids=4
    )


def q_context_fill_stats(spark, sf_dir):
    """Per-context fill report over the sequence_packing layout
    (dff/packing.py::context_fill): for every (shard, ctx_id) a document
    starts in, how many start there and the tokens they contribute to
    that context (clipped at the boundary).  Pure arithmetic on the
    packed layout, so DuckDB replays the whole chain — hash order,
    running sum, clipping, grouping — and the report value-hash-checks."""
    from dff.packing import context_fill, pack_sequences

    d = _t(spark, sf_dir, "documents")
    packed = pack_sequences(d, "n_chars", 256, ["doc_id"], n_shards=4, seed=4)
    out = context_fill(packed, "n_chars", 256)
    return out.select(
        "shard",
        F.col("ctx_id").cast("long").alias("ctx_id"),
        F.col("docs_starting").cast("long").alias("docs_starting"),
        F.col("tokens_started_here").cast("long").alias("tokens_started_here"),
    )


def q_mixture_summary_stats(spark, sf_dir):
    """Achieved-vs-target mixture report (dff/mixing.py::mixture_summary)
    over the corpus_mixture derivation: per domain, picked rows, picked
    char mass, the planned target, and the achieved fraction.  The whole
    chain — exact avail/budget ints, fixed-order rate doubles, epoch
    membership, and the final ratio — replays in DuckDB; doubles are
    rounded through the DECIMAL idiom on the oracle side so both engines
    hash the same 6-decimal values."""
    from dff.mixing import mixture_plan, mixture_sample, mixture_summary

    weights = {"src1": 0.5, "src2": 0.25, "src3": 0.25}
    pool = _t(spark, sf_dir, "documents").where(F.col("source").isin(list(weights)))
    total = pool.agg(F.sum(F.col("n_chars").cast("long"))).collect()[0][0]
    budget = (int(total) * 6) // 5
    plan = mixture_plan(pool, "source", "n_chars", weights, budget, max_rate=4.0)
    mixed = mixture_sample(pool, "source", ["doc_id"], plan, seed=11)
    out = mixture_summary(mixed, "source", "n_chars", plan)
    return out.select(
        "source",
        "picked_rows",
        "picked_weight",
        F.round("target_weight", 6).alias("target_weight"),
        F.round("achieved_frac", 6).alias("achieved_frac"),
    )


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROTATION PLAN (the driver's correctness gate checks only the FIRST
    # 50 entries of this dict each round):
    #   Round 6 front-loads the 22 r5-late oracle-paired queries that had
    #   never had a driver CORRECTNESS row (17 table-format gates + 5
    #   training-data gates — VERDICT r05 "Next round" #1), followed by a
    #   28-query core re-sample biased toward the operators whose
    #   INTERNALS this optimization round changed (dedup_exact /
    #   shingle+ngram lambda binding / minhash LSH candidates /
    #   hashing_vectorize / bm25 / lang_id / window_topk / as-of seeds /
    #   IVF sample) so the driver re-proves them after the surgery.
    #   Everything after position 50 has a green CORRECTNESS row on
    #   record (r3/r4/r5).  Future rounds: rotate any entry whose latest
    #   green row is >2 rounds old into the window.
    return {
        # --- r6 ROTATION: the 22 oracle-paired queries that had never
        # had a driver CORRECTNESS row (r5-late additions past the
        # 50-entry window; VERDICT r05 "Next round" #1) move to the
        # front.  All 22 verified green under tools/check_oracle.py this
        # round before rotating.  Everything displaced past position 50
        # has a green CORRECTNESS_r05 row on record. ------------------
        "table_day_partition": q_table_day_partition,
        "table_wap_publish": q_table_wap_publish,
        "table_optimize_cluster": q_table_optimize_cluster,
        "table_mor_delete": q_table_mor_delete,
        "table_mor_merge": q_table_mor_merge,
        "table_distributed_plan": q_table_distributed_plan,
        "table_spec_evolution": q_table_spec_evolution,
        "table_schema_evolution": q_table_schema_evolution,
        "table_change_feed": q_table_change_feed,
        "cdc_replication": q_cdc_replication,
        "table_widen_type": q_table_widen_type,
        "table_update_where": q_table_update_where,
        "table_merge_conditional": q_table_merge_conditional,
        "table_bloom_lookup": q_table_bloom_lookup,
        "table_check_constraint": q_table_check_constraint,
        "table_stream_source": q_table_stream_source,
        "table_rollback_retention": q_table_rollback_retention,
        "corpus_mixture": q_corpus_mixture,
        "mixture_summary_stats": q_mixture_summary_stats,
        "sequence_packing": q_sequence_packing,
        "context_fill_stats": q_context_fill_stats,
        "semantic_dedup_violations": q_semantic_dedup_violations,
        # --- core re-sample (28 slots): r5-touched operators + engine
        # pillars whose internals this optimization round changed
        # (dedup / corpus / text / vectorize / asof / window / bm25) ---
        "training_corpus_pipeline": q_training_corpus_pipeline,
        "chunk_documents": q_chunk_documents,
        "contamination": q_contamination,
        "repetition_scores": q_repetition_scores,
        "ngram_jaccard_exact": q_ngram_jaccard_exact,
        "ngram_containment_exact": q_ngram_containment_exact,
        "dup_clusters": q_dup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "best_survivors": q_best_survivors,
        "minhash_precision_violations": q_minhash_precision_violations,
        "simhash_precision_violations": q_simhash_precision_violations,
        "incremental_dedup_violations": q_incremental_dedup_violations,
        "hashing_vector_violations": q_hashing_vector_violations,
        "bm25_scores": q_bm25_scores,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "word_entropy": q_word_entropy,
        "source_profile": q_source_profile,
        "window_topk_per_group": q_window_topk_per_group,
        "asof_join_skewed": q_asof_join_skewed,
        "asof_join": q_asof_join,
        "ivf_full_probe": q_ivf_full_probe,
        "ivf_incremental_full_probe": q_ivf_incremental_full_probe,
        "ivf_consistency_violations": q_ivf_consistency_violations,
        "embedding_near_dups": q_embedding_near_dups,
        "rule_dag_verdict": q_rule_dag_verdict,
        "pii_redaction": q_pii_redaction,  # position 50
        # ---------------- position 51+ (driver-green r3/r4/r5) ---------
        "session_counts": q_session_counts,
        "stream_interval_join": q_stream_interval_join,
        "row_attribution": q_row_attribution,
        "heavy_hitters_exact": q_heavy_hitters_exact,
        "heavy_hitters_violations": q_heavy_hitters_violations,
        "stratified_sample": q_stratified_sample,
        "split_assignment": q_split_assignment,
        "pivot_counts": q_pivot_counts,
        "correlation_stats": q_correlation_stats,
        "unpivot_measures": q_unpivot_measures,
        "ntile_buckets": q_ntile_buckets,
        "winsorized_values": q_winsorized_values,
        "impute_values": q_impute_values,
        "bloom_referential": q_bloom_referential,
        "monotonic_violations": q_monotonic_violations,
        "fd_violations": q_fd_violations,
        "chisq_drift": q_chisq_drift,
        "zscore_outliers": q_zscore_outliers,
        "iqr_outliers": q_iqr_outliers,
        "zorder_roundtrip": q_zorder_roundtrip,
        "hll_rollup_violations": q_hll_rollup_violations,
        "sample_per_group": q_sample_per_group,
        "weighted_sample": q_weighted_sample,
        "snapshot_diff": q_snapshot_diff,
        "quota_sample": q_quota_sample,
        "weighted_sample_per_group": q_weighted_sample_per_group,
        "json_extract_stats": q_json_extract_stats,
        "batch_sessions": q_batch_sessions,
        "pca_projection_violations": q_pca_projection_violations,
        "lineage_trend_violations": q_lineage_trend_violations,
        "table_time_travel": q_table_time_travel,
        "table_cow_delete": q_table_cow_delete,
        "table_merge_upsert": q_table_merge_upsert,
        "table_scan_added": q_table_scan_added,
        "table_stream_sink": q_table_stream_sink,
        "fuzzy_pairs": q_fuzzy_pairs,
        "scd2_intervals": q_scd2_intervals,
        "cdc_apply": q_cdc_apply,
        "stats_prune_validation": q_stats_prune_validation,
        "table_partition_prune": q_table_partition_prune,
        # --- core pillar (green r1-r5; also exercised by entry()) --------
        "rule_dag_score_fanout": q_rule_dag_score_fanout,
        "stats_onepass": q_stats_onepass,
        "salted_stats": q_salted_stats,
        "dup_keys": q_dup_keys,
        "psi_drift": q_psi_drift,
        "ann_bruteforce": q_ann_bruteforce,
        "pricing_summary": q_pricing_summary,
        "filter_project": q_filter_project,
        "case_when_matrix": q_case_when_matrix,
        "inner_join": q_inner_join,
        "left_outer_join": q_left_outer_join,
        "full_outer_join": q_full_outer_join,
        "cross_join_small": q_cross_join_small,
        "broadcast_join": q_broadcast_join,
        "left_anti": q_left_anti,
        "left_anti_big_dim": q_left_anti_big_dim,
        "left_semi": q_left_semi,
        "topk": q_topk,
        "exact_percentiles": q_exact_percentiles,
        "sort_limit": q_sort_limit,
        "distinct": q_distinct,
        "union_distinct": q_union_distinct,
        "except_all": q_except_all,
        "rollup_grouping": q_rollup_grouping,
        "monthly_rollup": q_monthly_rollup,
        "event_gaps": q_event_gaps,
        "rolling_aggs": q_rolling_aggs,
        "asof_join_forward": q_asof_join_forward,
        "asof_join_nearest": q_asof_join_nearest,
        "range_join": q_range_join,
        "interval_overlap_join": q_interval_overlap_join,
        "sha256": q_sha256,
        "tfidf_top_terms": q_tfidf_top_terms,
        "js_drift": q_js_drift,
        "stream_window_counts": q_stream_window_counts,
        "multimodal_bytes": q_multimodal_bytes,
        "tdigest_accuracy_violations": q_tdigest_accuracy_violations,
        # rows-only (engine-specific hash primitives: xxhash64 shingles /
        # SimHash bits / trained IVF cells have no cross-engine twin); each
        # is covered by an oracle-checked invariant twin above
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "ivf_ann": q_ivf_ann,
    }


# shared CTE text: the exact word-3-gram jaccard pair graph (the edge set
# for ngram_jaccard_exact / dup_clusters / dedup_survivors — ONE
# definition so the three oracles can never drift apart)
_NGRAM_PAIR_CTES = """w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN ws IS NULL OR len(ws) < 3
                          THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     END AS grams
              FROM w),
            njpairs AS (
              SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
                            THEN round(len(list_intersect(a.grams, b.grams)) * 1.0
                                       / len(list_distinct(a.grams || b.grams)), 4)
                            ELSE 1.0 END AS jaccard
                FROM g a JOIN g b ON a.doc_id < b.doc_id)
              WHERE jaccard >= 0.2)"""


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the skewed as-of realization is result-identical to the plain one by
    # construction, so it is hash-checked against the SAME oracle
    d["asof_join_skewed"] = d["asof_join"]
    return d


def _pii_oracle_sql() -> str:
    """Built from the SAME dff.textops.PII_PATTERNS chain the Spark query
    uses — one source of truth, no drift.  Backslashes pass through SQL
    single-quoted literals untouched; DuckDB regexp_replace needs the
    explicit 'g' flag to match Spark's replace-all."""
    from dff.textops import PII_PATTERNS

    x = ("text || ' contact user' || CAST(doc_id AS VARCHAR)"
         " || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
         " || '.7'")
    red = x
    counts = []
    for pat, repl in PII_PATTERNS.values():
        lit = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{lit}', '{repl}', 'g')"
        counts.append(f"len(regexp_extract_all({x}, '{lit}'))")
    return (
        f"SELECT doc_id, {red} AS redacted, "
        f"CAST({' + '.join(counts)} AS INT) AS n_pii FROM documents"
    )


def _oracle_sql_base() -> dict[str, str]:
    from dff.textops import LANG_MARKERS

    lang_score = ", ".join(
        f"(length(regexp_split_to_array(lower(text), '\\b({'|'.join(ws)})\\b')) - 1) AS s_{lg}"
        for lg, ws in LANG_MARKERS.items()
    )
    return {
        "rule_dag_verdict": _DOC_VERDICT_SQL,
        # first-match CASE in topo order R1,R2,R3,R4,R5 — R4 before R5 is the
        # fan-out tie-break (declaration order), R5 is the logistic scorer
        # thresholded at sensitivity 0.7
        "rule_dag_score_fanout": """
            SELECT doc_id,
                   CASE WHEN text IS NULL OR length(text) = 0
                             THEN 'text is null or length(text) = 0'
                        WHEN n_chars < 40 THEN 'n_chars < 40'
                        WHEN lang = 'zh' AND n_chars > 400
                             THEN 'lang = ''zh'' and n_chars > 400'
                        WHEN n_chars BETWEEN 850 AND 900
                             THEN 'n_chars between 850 and 900'
                        WHEN 1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) - 800.0) / 100.0)) >= 0.7
                             THEN 'score:chars_logistic'
                   END AS verdict
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.03
        """,
        "case_when_matrix": """
            SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS predicted,
                   l_returnflag, count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        "inner_join": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderstatus
        """,
        "broadcast_join": """
            SELECT p_brand, count(*) AS n,
                   round(avg(l_extendedprice), 4) AS avg_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "left_outer_join": """
            SELECT c_custkey, o_orderkey, o_totalprice
            FROM customer LEFT JOIN
                 (SELECT * FROM orders WHERE o_totalprice > 200000) o
                 ON c_custkey = o.o_custkey
        """,
        "full_outer_join": """
            SELECT coalesce(k_rich, k_big) AS custkey, acctbal, n_big_orders
            FROM (SELECT c_custkey AS k_rich, round(c_acctbal, 4) AS acctbal
                  FROM customer WHERE c_acctbal > 7000) r
            FULL OUTER JOIN
                 (SELECT o_custkey AS k_big, count(*) AS n_big_orders
                  FROM orders WHERE o_totalprice > 250000
                  GROUP BY o_custkey) b
                 ON r.k_rich = b.k_big
        """,
        "cross_join_small": """
            SELECT r_regionkey, r_name, n_nationkey, n_name
            FROM region CROSS JOIN nation
        """,
        "left_anti": """
            SELECT p_partkey, p_brand FROM part
            WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
        """,
        "left_anti_big_dim": """
            SELECT p_partkey, p_brand FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey AND l_quantity > 45)
        """,
        "left_semi": """
            SELECT p_brand, count(*) AS n_parts FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
            GROUP BY p_brand
        """,
        "topk": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 8
        """,
        "window_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders) WHERE rn = 1
        """,
        "stats_onepass": """
            SELECT count(*) AS n_rows,
                   round(min(l_quantity), 4) AS min_qty,
                   round(max(l_quantity), 4) AS max_qty,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(stddev_samp(l_quantity), 4) AS std_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(stddev_samp(l_extendedprice), 4) AS std_price
            FROM lineitem
        """,
        "exact_percentiles": """
            SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
            FROM lineitem
        """,
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "union_distinct": """
            SELECT DISTINCT nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                UNION ALL SELECT s_nationkey FROM supplier)
        """,
        "except_all": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL SELECT s_nationkey FROM supplier
        """,
        "rollup_grouping": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                   count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "monthly_rollup": """
            SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "dup_keys": """
            SELECT o_custkey, count(*) AS dup_count FROM orders
            GROUP BY o_custkey HAVING count(*) > 1
        """,
        "batch_sessions": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
              FROM events WHERE user_id < 40),
            s AS (
              SELECT user_id, event_id, ts,
                     -- CAST: DuckDB integer sum() yields HUGEINT, which
                     -- fetchdf materializes as float64 and breaks the
                     -- driver's int64 value hash (CORRECTNESS_r04)
                     CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS session_id
              FROM g)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event, max(event_id) AS last_event,
                   epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
            FROM s GROUP BY user_id, session_id
        """,
        "json_extract_stats": """
            WITH src AS (
              SELECT event_type,
                     CASE WHEN event_id % 101 = 0 THEN '{not json'
                          ELSE props END AS props
              FROM events),
            parsed AS (
              SELECT event_type,
                     CASE WHEN json_valid(props)
                          THEN CAST(json_extract(props, '$.k') AS BIGINT)
                     END AS k
              FROM src)
            SELECT event_type, count(*) AS n,
                   -- CAST: HUGEINT sums arrive float64 via fetchdf vs
                   -- Spark's int64 (driver hash-fail root cause, r04)
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_malformed,
                   CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
            FROM parsed GROUP BY event_type
        """,
        "rolling_aggs": """
            SELECT user_id, event_id,
                   CAST(round(CAST(sum(value) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DECIMAL(28,10)), 6) AS DOUBLE) AS cum_value,
                   CAST(round(CAST(avg(value) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     AS DECIMAL(28,10)), 6) AS DOUBLE) AS mov_avg3,
                   CAST(round(CAST(sum(value) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                     AS DECIMAL(28,10)), 6) AS DOUBLE) AS sum_10min
            FROM events WHERE user_id < 30
        """,
        "event_gaps": """
            SELECT user_id, event_id,
                   epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id)) AS gap_ms
            FROM events WHERE user_id < 50
            QUALIFY gap_ms IS NOT NULL
        """,
        "asof_join": """
            -- explicit window realization of ASOF LEFT JOIN so the
            -- same-(user, ts) tie-break (largest event_id) is pinned on
            -- both sides of the gate; DuckDB's native ASOF leaves the
            -- tie choice unspecified (ADVICE r03)
            WITH j AS (
              SELECT l.event_id, l.user_id, l.ts,
                     r.ts AS ts_r, r.event_id AS event_id_r,
                     r.value AS value_r,
                     ROW_NUMBER() OVER (
                       PARTITION BY l.event_id
                       ORDER BY r.ts DESC, r.event_id DESC
                     ) AS rn
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click') l
              LEFT JOIN (SELECT user_id, ts, event_id, value FROM events
                         WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            )
            SELECT event_id, user_id, ts, ts_r, event_id_r, value_r
            FROM j WHERE rn = 1
        """,
        "asof_join_forward": """
            WITH j AS (
              SELECT l.event_id, l.user_id, l.ts,
                     r.ts AS ts_r, r.event_id AS event_id_r,
                     r.value AS value_r,
                     ROW_NUMBER() OVER (
                       PARTITION BY l.event_id
                       ORDER BY r.ts ASC, r.event_id ASC
                     ) AS rn
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click') l
              LEFT JOIN (SELECT user_id, ts, event_id, value FROM events
                         WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND r.ts >= l.ts
            )
            SELECT event_id, user_id, ts, ts_r, event_id_r, value_r
            FROM j WHERE rn = 1
        """,
        "asof_join_nearest": """
            -- rank ALL the user's purchases by |distance|, preferring the
            -- backward side on exact ties, then the side-specific id
            -- tie-break (backward keeps the largest event_id, forward the
            -- smallest) - the explicit enumeration of the engine's
            -- two-window nearest semantics
            WITH j AS (
              SELECT l.event_id, l.user_id, l.ts,
                     r.ts AS ts_r, r.event_id AS event_id_r,
                     r.value AS value_r,
                     ROW_NUMBER() OVER (
                       PARTITION BY l.event_id
                       ORDER BY abs(epoch(r.ts) - epoch(l.ts)) ASC,
                                CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END ASC,
                                CASE WHEN r.ts <= l.ts THEN -r.event_id
                                     ELSE r.event_id END ASC
                     ) AS rn
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click') l
              LEFT JOIN (SELECT user_id, ts, event_id, value FROM events
                         WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id
            )
            SELECT event_id, user_id, ts, ts_r, event_id_r, value_r
            FROM j WHERE rn = 1
        """,
        "range_join": """
            SELECT p.g, p.click_id, i.purchase_id FROM
              (SELECT user_id % 50 AS g, event_id AS click_id, value
               FROM events WHERE event_type = 'click') p
            JOIN
              (SELECT user_id % 50 AS g, event_id AS purchase_id,
                      value - 2.0 AS lo, value + 2.0 AS hi
               FROM events WHERE event_type = 'purchase') i
            ON p.g = i.g AND p.value >= i.lo AND p.value <= i.hi
        """,
        "interval_overlap_join": """
            SELECT l.g, l.click_id, r.purchase_id FROM
              (SELECT user_id % 50 AS g, event_id AS click_id,
                      value - 1.0 AS ls, value + 1.0 AS le
               FROM events WHERE event_type = 'click') l
            JOIN
              (SELECT user_id % 50 AS g, event_id AS purchase_id,
                      value - 2.0 AS rs, value + 2.0 AS re
               FROM events WHERE event_type = 'purchase') r
            ON l.g = r.g AND l.ls <= r.re AND r.rs <= l.le
        """,
        "sha256": "SELECT doc_id, sha256(text) AS content_sha FROM documents",
        "token_counts": """
            SELECT doc_id,
                   length(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
                   length(text) AS n_chars_check
            FROM documents
        """,
        "source_profile": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT text) AS distinct_texts,
                   round(avg(n_chars), 4) AS avg_chars,
                   round(min(n_chars), 4) AS min_chars,
                   round(max(n_chars), 4) AS max_chars
            FROM documents GROUP BY source
        """,
        "psi_drift": """
            WITH b AS (SELECT least(floor(n_chars / 100), 9) AS bucket, lang FROM documents),
            q AS (SELECT bucket, count(*) AS q_cnt FROM b GROUP BY bucket),
            p AS (SELECT bucket, count(*) AS p_cnt FROM b WHERE lang = 'en' GROUP BY bucket),
            j AS (SELECT coalesce(q.bucket, p.bucket) AS bucket,
                         coalesce(p_cnt, 0) AS p_cnt, coalesce(q_cnt, 0) AS q_cnt
                  FROM q FULL OUTER JOIN p ON q.bucket = p.bucket),
            t AS (SELECT sum(p_cnt) AS pt, sum(q_cnt) AS qt FROM j)
            SELECT round(sum((qe - pe) * ln(qe / pe)), 4) AS psi FROM (
                SELECT greatest(p_cnt * 1.0 / pt, 1e-6) AS pe,
                       greatest(q_cnt * 1.0 / qt, 1e-6) AS qe
                FROM j CROSS JOIN t)
        """,
        "js_drift": """
            WITH b AS (SELECT least(floor(n_chars / 100), 9) AS bucket, lang FROM documents),
            q AS (SELECT bucket, count(*) AS q_cnt FROM b GROUP BY bucket),
            p AS (SELECT bucket, count(*) AS p_cnt FROM b WHERE lang = 'en' GROUP BY bucket),
            j AS (SELECT coalesce(q.bucket, p.bucket) AS bucket,
                         coalesce(p_cnt, 0) AS p_cnt, coalesce(q_cnt, 0) AS q_cnt
                  FROM q FULL OUTER JOIN p ON q.bucket = p.bucket),
            t AS (SELECT sum(p_cnt) AS pt, sum(q_cnt) AS qt FROM j)
            SELECT round(sum(0.5 * pe * ln(pe / me) + 0.5 * qe * ln(qe / me)), 6)
                     AS js
            FROM (
                SELECT pe, qe, (pe + qe) / 2 AS me FROM (
                    SELECT greatest(p_cnt * 1.0 / pt, 1e-6) AS pe,
                           greatest(q_cnt * 1.0 / qt, 1e-6) AS qe
                    FROM j CROSS JOIN t))
        """,
        # tie-break parity: Spark's array_max over struct(score, lang) picks the
        # lexicographically LARGEST lang among tied scores (fr > es > en > de)
        "lang_id": f"""
            WITH scored AS (SELECT {lang_score}, text FROM documents),
            best AS (SELECT CASE
                WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                WHEN s_en >= s_de THEN 'en'
                ELSE 'de' END AS lid FROM scored)
            SELECT lid, count(*) AS n FROM best GROUP BY lid
        """,
        # invariant oracles: each violating-rows set must be EMPTY
        "minhash_precision_violations": """
            SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
            WHERE 1 = 0
        """,
        "incremental_dedup_violations": """
            SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
            WHERE 1 = 0
        """,
        "simhash_precision_violations": """
            SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
            WHERE 1 = 0
        """,
        "ivf_consistency_violations": """
            SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS item_id
            WHERE 1 = 0
        """,
        "tdigest_accuracy_violations": """
            SELECT CAST(NULL AS VARCHAR) AS group_key, CAST(NULL AS DOUBLE) AS q
            WHERE 1 = 0
        """,
        # capacity >= distinct tokens => Misra-Gries is exact, so the sketch
        # path must reproduce plain token counts bit for bit
        "heavy_hitters_exact": """
            SELECT tok, COUNT(*) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok FROM documents
            )
            WHERE tok <> ''
            GROUP BY tok
        """,
        "heavy_hitters_violations": """
            SELECT CAST(NULL AS VARCHAR) AS tok
            WHERE 1 = 0
        """,
        # the EXACT same 60-bit-md5 uniform + CASE threshold predicate the
        # Spark sampler compiles; both engines agree bit for bit, so the
        # selected row set (not just its size) hash-matches
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5(concat_ws('|', '7',
                          CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0
                < CASE lang WHEN 'en' THEN 0.25 WHEN 'es' THEN 1.0
                            WHEN 'zh' THEN 0.75 ELSE 0.5 END
        """,
        "stream_interval_join": """
            SELECT a.user_id,
                   a.event_id AS view_id,
                   b.event_id AS purchase_id
            FROM events a JOIN events b ON a.user_id = b.user_id
            WHERE a.event_type = 'view' AND b.event_type = 'purchase'
              AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
        """,
        "hll_rollup_violations": """
            SELECT CAST(NULL AS VARCHAR) AS event_type,
                   CAST(NULL AS BIGINT) AS approx_distinct,
                   CAST(NULL AS BIGINT) AS exact_distinct
            WHERE 1 = 0
        """,
        "zorder_roundtrip": """
            SELECT count(*) AS n_rows,
                   CAST(sum(user_id) AS BIGINT) AS sum_user,
                   CAST(sum(event_id) AS BIGINT) AS sum_event,
                   CAST(round(CAST(sum(value) AS DECIMAL(28,10)), 3)
                        AS DOUBLE) AS sum_value,
                   count(DISTINCT event_type) AS n_types
            FROM events
        """,
        "hashing_vector_violations": """
            SELECT CAST(NULL AS BIGINT) AS ida, CAST(NULL AS BIGINT) AS idb,
                   CAST(NULL AS DOUBLE) AS exact_cos,
                   CAST(NULL AS DOUBLE) AS hash_cos
            WHERE 1 = 0
        """,
        # invariant twin: orthonormal full-rank basis preserves pairwise
        # distances; k<d projection contracts them — violations empty
        "pca_projection_violations": """
            SELECT CAST(NULL AS BIGINT) AS ida, CAST(NULL AS BIGINT) AS idb,
                   CAST(NULL AS DOUBLE) AS exact_d2,
                   CAST(NULL AS DOUBLE) AS full_d2,
                   CAST(NULL AS DOUBLE) AS low_d2
            WHERE 1 = 0
        """,
        # full replay of dff/checkpoint.py:trend_violations over the same
        # deterministic two-snapshot lineage derived from orders
        "lineage_trend_violations": """
            WITH b AS (
              SELECT CAST(o_orderkey % 24 AS INT) AS partition_id,
                     count(*) AS base_rows,
                     CAST(sum(CASE WHEN o_orderkey % 11 = 0
                                   THEN 1 ELSE 0 END) AS BIGINT) AS base_viol
              FROM orders GROUP BY 1),
            c AS (
              SELECT CAST(o_orderkey % 24 AS INT) AS partition_id,
                     count(*) AS cur_rows,
                     CAST(sum(CASE WHEN o_orderkey % 11 = 0
                                   THEN CASE WHEN o_orderkey % 24 = 11
                                             THEN 3 ELSE 1 END
                                   ELSE 0 END) AS BIGINT) AS cur_viol
              FROM orders
              WHERE NOT (o_orderkey % 24 = 7 AND o_orderkey % 5 < 2)
                AND o_orderkey % 24 <> 19
              GROUP BY 1),
            j AS (
              SELECT coalesce(b.partition_id, c.partition_id) AS partition_id,
                     base_rows, cur_rows, base_viol, cur_viol
              FROM b FULL OUTER JOIN c ON b.partition_id = c.partition_id)
            SELECT partition_id, "check",
                   base_rows, cur_rows, base_viol, cur_viol
            FROM (
              SELECT *,
                     CASE WHEN base_rows IS NOT NULL AND cur_rows IS NULL
                               THEN 'missing_partition'
                          WHEN base_rows IS NOT NULL AND base_rows > 0
                               AND (base_rows - cur_rows) * 1.0 / base_rows > 0.1
                               THEN 'row_drop'
                          WHEN base_viol IS NOT NULL AND base_viol > 0
                               AND cur_rows IS NOT NULL
                               AND ((cur_viol * 1.0 / cur_rows)
                                    - (base_viol * 1.0 / base_rows))
                                   / (base_viol * 1.0 / base_rows) > 0.5
                               THEN 'violation_rise'
                     END AS "check"
              FROM j)
            WHERE "check" IS NOT NULL
        """,
        # table format: snapshot v2 = the first two of three doc_id%3
        # commits; COW delete = ANSI DELETE (NULL-predicate rows survive)
        "table_time_travel": """
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE doc_id % 3 <= 1
        """,
        "table_cow_delete": """
            SELECT doc_id, lang, source
            FROM documents
            WHERE lang IS NULL OR lang <> 'en'
        """,
        # MERGE upsert = anti-join out matched target rows + append source
        "table_merge_upsert": """
            WITH src AS (
              SELECT doc_id, 'xx' AS lang, n_chars
              FROM documents WHERE doc_id % 7 = 0
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, lang, n_chars
              FROM documents WHERE doc_id % 13 = 0
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.doc_id = d.doc_id)
            UNION ALL
            SELECT doc_id, lang, n_chars FROM src
        """,
        "table_scan_added": """
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE doc_id % 3 IN (1, 2)
        """,
        # MOR delete: tombstoned keys vanish, the later re-append survives
        "table_mor_delete": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id % 7 <> 3
            UNION ALL
            SELECT doc_id, 're' AS lang, n_chars FROM documents
            WHERE doc_id % 21 = 3
        """,
        # CHECK constraint write gate: committed rows == the predicate's
        # ANSI filter (the violating batch never became a snapshot)
        "table_check_constraint": """
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE n_chars >= 100
        """,
        # bloom skipping: pruned point lookup == plain key replay
        "table_bloom_lookup": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id IN (123, 124, 125)
        """,
        # spec evolution: layout bookkeeping changes, rows never do
        "table_spec_evolution": """
            SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 500
        """,
        # change feed: delete / update pre+post / MOR-delete CDC events
        "table_change_feed": """
            SELECT doc_id, lang, n_chars,
                   'delete' AS _change_type,
                   CAST(2 AS BIGINT) AS _commit_version
            FROM documents WHERE doc_id BETWEEN 100 AND 149
            UNION ALL
            SELECT doc_id, lang, n_chars,
                   'update_preimage', CAST(3 AS BIGINT)
            FROM documents WHERE doc_id BETWEEN 200 AND 249
            UNION ALL
            SELECT doc_id, lang, n_chars + 7,
                   'update_postimage', CAST(3 AS BIGINT)
            FROM documents WHERE doc_id BETWEEN 200 AND 249
            UNION ALL
            SELECT doc_id, lang, n_chars,
                   'delete', CAST(4 AS BIGINT)
            FROM documents WHERE doc_id IN (300, 301, 302)
        """,
        # CDC replication: the replica equals a direct replay of the ops
        "cdc_replication": """
            SELECT doc_id,
                   CASE WHEN doc_id BETWEEN 200 AND 249
                        THEN 'xx' ELSE lang END AS lang,
                   n_chars
            FROM documents
            WHERE doc_id NOT BETWEEN 100 AND 149
              AND doc_id NOT IN (300, 301)
        """,
        # type widening: old era int32, new era bigint, one logical column
        "table_widen_type": """
            SELECT CAST(doc_id AS INTEGER) AS doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN n_chars
                        ELSE n_chars + 34359738368 END AS n_chars
            FROM documents
        """,
        # COW UPDATE: SET expressions on predicate-true rows only
        "table_update_where": """
            SELECT doc_id,
                   CASE WHEN doc_id BETWEEN 100 AND 199
                        THEN 'xx' ELSE lang END AS lang,
                   CASE WHEN doc_id BETWEEN 100 AND 199
                        THEN n_chars + 1 ELSE n_chars END AS n_chars
            FROM documents
        """,
        # conditional MERGE: delete gate first, then update gate; insert
        # gate on the unmatched source side
        "table_merge_conditional": """
            WITH src AS (
              SELECT doc_id, 'src' AS lang, n_chars + 500 AS n_chars
              FROM documents WHERE doc_id % 3 = 0
            ),
            tgt AS (
              SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 400
            )
            SELECT t.doc_id,
                   CASE WHEN s.doc_id IS NOT NULL
                             AND NOT (s.n_chars % 10 = 3)
                             AND t.doc_id % 2 = 0
                        THEN s.lang ELSE t.lang END AS lang,
                   CASE WHEN s.doc_id IS NOT NULL
                             AND NOT (s.n_chars % 10 = 3)
                             AND t.doc_id % 2 = 0
                        THEN s.n_chars ELSE t.n_chars END AS n_chars
            FROM tgt t LEFT JOIN src s ON s.doc_id = t.doc_id
            WHERE s.doc_id IS NULL OR NOT (s.n_chars % 10 = 3)
            UNION ALL
            SELECT s.doc_id, s.lang, s.n_chars
            FROM src s
            WHERE s.doc_id NOT IN (SELECT doc_id FROM tgt)
              AND s.doc_id % 2 = 0
        """,
        # schema evolution: rename maps old files through field ids,
        # evolve-added column reads NULL before the add, values after
        "table_schema_evolution": """
            SELECT doc_id, lang AS language, n_chars,
                   CASE WHEN doc_id % 2 = 1 THEN n_chars / 2.0 END
                     AS half_chars
            FROM documents
        """,
        # distributed planning: pruned-file read + row filter == full replay
        "table_distributed_plan": """
            SELECT event_id, event_type, "value" FROM events
            WHERE event_id BETWEEN 2500 AND 4499
        """,
        # MOR merge: row-level semantics identical to the COW merge gate
        "table_mor_merge": """
            WITH src AS (
              SELECT doc_id, 'xx' AS lang, n_chars
              FROM documents WHERE doc_id % 7 = 0
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, lang, n_chars
              FROM documents WHERE doc_id % 13 = 0
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.doc_id = d.doc_id)
            UNION ALL
            SELECT doc_id, lang, n_chars FROM src
        """,
        # exactly-once stream sink: loss-free, duplication-free landing
        "table_stream_sink": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        # streaming SOURCE tail + idempotent sink + crash replay: the
        # drained sink must be exactly the source rows, once each
        "table_stream_source": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        # rollback undoes the bad load (% 3 == 2), the corrective append
        # lands (% 3 == 1); retention + GC must not disturb either
        "table_rollback_retention": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id % 3 IN (0, 1)
        """,
        # SCD-2: LAG-suppress runs of equal attrs, LEAD-close intervals.
        # LAG(TRUE) distinguishes "first row" from "previous attr NULL"
        # (Spark lags a non-null struct, so first-row detection must not
        # lean on the attr value itself)
        "scd2_intervals": """
            WITH ordered AS (
              SELECT user_id, ts, event_type, event_id,
                     LAG(TRUE) OVER w IS NULL AS is_first,
                     LAG(event_type) OVER w AS prev
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), changed AS (
              SELECT user_id, ts, event_type, event_id FROM ordered
              WHERE is_first OR prev IS DISTINCT FROM event_type
            )
            SELECT user_id, event_type,
                   ts AS valid_from,
                   LEAD(ts) OVER w2 AS valid_to,
                   LEAD(ts) OVER w2 IS NULL AS is_current
            FROM changed
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # CDC closure: the reconciled table IS the target snapshot
        "cdc_apply": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'cdc' ELSE lang END AS lang,
                   n_chars
            FROM documents
            WHERE doc_id % 7 <> 0
        """,
        # hidden partitioning: pruning must never change results
        "table_partition_prune": """
            SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 13 = 0
        """,
        "table_day_partition": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   sum("value") AS sum_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10'
              AND ts <  TIMESTAMP '2024-01-15'
            GROUP BY event_type
        """,
        # WAP: published main == base + the audited-good batch, exactly
        "table_wap_publish": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        # OPTIMIZE: layout rewrite must be row-invariant under any filter
        "table_optimize_cluster": """
            SELECT event_id, event_type, "value" FROM events
            WHERE event_id BETWEEN 2000 AND 3999
        """,
        # stats-only validation: oracle replays every rule over every row;
        # the engine must reach the same counts scanning only undecidable
        # files (NULL counts as a violation for range rules)
        "stats_prune_validation": """
            WITH d AS (
              SELECT doc_id, n_chars,
                     CASE WHEN doc_id % 11 = 0 THEN NULL
                          ELSE n_chars END AS maybe
              FROM documents
            ),
            lo AS (SELECT max(doc_id) * 2 // 5 AS v FROM documents)
            SELECT 'c_docid_ge' AS constraint_id,
                   CAST(sum(CASE WHEN doc_id IS NULL
                                   OR doc_id < (SELECT v FROM lo)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS violations
            FROM d
            UNION ALL
            SELECT 'c_maybe_nn',
                   CAST(sum(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM d
            UNION ALL
            SELECT 'c_nchars_between',
                   CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 100
                                   OR n_chars > 400
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM d
        """,
        # fuzzy join: brute-force replay of the exact predicate
        "fuzzy_pairs": """
            WITH t AS (
              SELECT doc_id AS id,
                     'u' || lpad(CAST(doc_id // 3 AS VARCHAR), 3, '0') ||
                     CASE doc_id % 3 WHEN 1 THEN 'x'
                                     WHEN 2 THEN 'xy' ELSE '' END AS s
              FROM documents WHERE doc_id < 400
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
            FROM t a JOIN t b
              ON a.id < b.id AND levenshtein(a.s, b.s) <= 1
        """,
        "tfidf_top_terms": """
            WITH docs AS (SELECT * FROM documents WHERE doc_id < 40),
            tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+')) AS term
                    FROM docs)
              WHERE term <> '' GROUP BY 1, 2),
            n AS (SELECT count(*) AS n_docs FROM docs),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * (ln((n_docs + 1.0)/(df + 1.0)) + 1.0) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n)
            SELECT doc_id, term,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term) AS rank,
                   CAST(round(CAST(tfidf AS DECIMAL(28,12)), 6) AS DOUBLE)
                     AS score
            FROM scored
            QUALIFY rank <= 3
        """,
        "bm25_scores": """
            WITH tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+')) AS term
                    FROM documents)
              WHERE term <> '' GROUP BY 1, 2),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
            consts AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            qtf AS (SELECT * FROM tf
                    WHERE term IN ('join', 'spark', 'vector')),
            qdf AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1)
            SELECT q.doc_id,
                   CAST(round(CAST(sum(
                       ln(1.0 + (n - df + 0.5)/(df + 0.5))
                       * (q.tf * (1.2 + 1.0))
                         / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                     ) AS DECIMAL(28,12)), 6) AS DOUBLE) AS bm25,
                   count(*) AS matched_terms
            FROM qtf q JOIN qdf USING (term) JOIN dl USING (doc_id)
                 CROSS JOIN consts
            GROUP BY q.doc_id
        """,
        "monotonic_violations": """
            SELECT user_id, event_id, value, prev_max
            FROM (
              SELECT user_id, event_id, value,
                     max(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) AS prev_max
              FROM events WHERE user_id < 15)
            WHERE value IS NOT NULL AND prev_max IS NOT NULL
              AND value < prev_max
        """,
        "bloom_referential": """
            SELECT e.event_id, e.user_id
            FROM events e
            WHERE e.event_type = 'purchase'
              AND NOT EXISTS (
                SELECT 1 FROM events s
                WHERE s.event_type = 'signup' AND s.user_id % 7 != 0
                  AND s.user_id = e.user_id)
        """,
        "impute_values": """
            WITH src AS (
              SELECT event_id, event_type,
                     CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END
                       AS value
              FROM events),
            med AS (
              SELECT event_type, quantile_cont(value, 0.5) AS m
              FROM src GROUP BY event_type)
            SELECT s.event_id, s.event_type,
                   CAST(round(CAST(coalesce(s.value, m) AS DECIMAL(28,12)), 6)
                        AS DOUBLE) AS v,
                   (s.value IS NULL AND m IS NOT NULL) AS was_imputed
            FROM src s JOIN med USING (event_type)
        """,
        "fd_violations": """
            WITH pairs AS (
              SELECT DISTINCT user_id, event_type
              FROM events WHERE user_id < 60),
            c AS (
              SELECT user_id, count(*) AS n_conflicts
              FROM pairs GROUP BY user_id)
            SELECT p.user_id, p.event_type, c.n_conflicts
            FROM pairs p JOIN c USING (user_id)
            WHERE c.n_conflicts > 1
        """,
        "winsorized_values": """
            WITH b AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   CASE WHEN e.value IS NULL THEN NULL
                        ELSE CAST(round(CAST(least(greatest(e.value, lo), hi)
                                             AS DECIMAL(28,12)), 6) AS DOUBLE)
                   END AS vw
            FROM events e JOIN b USING (event_type)
        """,
        "chisq_drift": """
            WITH a AS (
              SELECT event_type AS cat, count(*) AS a
              FROM events WHERE event_id % 2 = 1 GROUP BY 1),
            e AS (
              SELECT event_type AS cat, count(*) AS e
              FROM events WHERE event_id % 2 = 0 GROUP BY 1),
            j AS (
              SELECT CAST(coalesce(a.a, 0) AS DOUBLE) AS a,
                     CAST(coalesce(e.e, 0) AS DOUBLE) AS e
              FROM a FULL OUTER JOIN e USING (cat)),
            t AS (SELECT sum(a) AS na, sum(e) AS ne,
                         sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS k FROM j)
            SELECT CAST(round(CAST(sum(pow(a - e * na / ne, 2) / (e * na / ne))
                                   AS DECIMAL(28,12)), 6) AS DOUBLE) AS chi2,
                   CAST(max(k) - 1 AS BIGINT) AS dof,
                   CAST(max(na) AS BIGINT) AS n
            FROM j CROSS JOIN t WHERE e > 0
        """,
        "ntile_buckets": """
            WITH binned AS (
              SELECT event_type,
                     ntile(4) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS quartile,
                     percent_rank() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS pr
              FROM events WHERE value IS NOT NULL)
            SELECT event_type, quartile, count(*) AS n,
                   CAST(round(CAST(min(pr) AS DECIMAL(28,12)), 6) AS DOUBLE)
                     AS min_pr,
                   CAST(round(CAST(max(pr) AS DECIMAL(28,12)), 6) AS DOUBLE)
                     AS max_pr
            FROM binned GROUP BY event_type, quartile
        """,
        "zscore_outliers": """
            WITH z AS (
              SELECT event_id, event_type, value,
                     (value - avg(value) OVER (PARTITION BY event_type))
                       / stddev_samp(value) OVER (PARTITION BY event_type)
                       AS zraw
              FROM events WHERE value IS NOT NULL)
            SELECT event_id, event_type, value,
                   CAST(round(CAST(zraw AS DECIMAL(28,12)), 6) AS DOUBLE) AS z
            FROM z WHERE abs(zraw) > 3.0
        """,
        "iqr_outliers": """
            WITH b AS (
              SELECT event_type,
                     quantile_cont(value, 0.25) AS q1,
                     quantile_cont(value, 0.75) AS q3
              FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type, e.value,
                   CAST(round(CAST(q1 - 1.5*(q3 - q1) AS DECIMAL(28,12)), 6)
                        AS DOUBLE) AS lo,
                   CAST(round(CAST(q3 + 1.5*(q3 - q1) AS DECIMAL(28,12)), 6)
                        AS DOUBLE) AS hi
            FROM events e JOIN b USING (event_type)
            WHERE e.value IS NOT NULL
              AND (e.value < q1 - 1.5*(q3 - q1) OR e.value > q3 + 1.5*(q3 - q1))
        """,
        "unpivot_measures": """
            WITH wide AS (
              SELECT l_returnflag,
                     round(sum(l_quantity), 4) AS sum_qty,
                     round(sum(l_discount), 4) AS sum_disc,
                     CAST(count(*) AS DOUBLE) AS n_rows
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
            UNION ALL
            SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
            UNION ALL
            SELECT l_returnflag, 'n_rows', n_rows FROM wide
        """,
        "correlation_stats": """
            SELECT CAST(round(CAST(corr(l_quantity, l_extendedprice)
                               AS DECIMAL(20,10)), 6) AS DOUBLE) AS corr_qty_price,
                   CAST(round(CAST(covar_samp(l_quantity, l_extendedprice)
                               AS DECIMAL(20,10)), 4) AS DOUBLE) AS covar_s,
                   CAST(round(CAST(covar_pop(l_quantity, l_extendedprice)
                               AS DECIMAL(20,10)), 4) AS DOUBLE) AS covar_p
            FROM lineitem
        """,
        "pivot_counts": """
            SELECT lang,
                   CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
                   CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
                   CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
                   CAST(sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3
            FROM documents
            WHERE source IN ('src0', 'src1', 'src2', 'src3')
            GROUP BY lang
        """,
        "split_assignment": """
            SELECT doc_id,
                   CASE WHEN u < 0.75 THEN 'train'
                        WHEN u < 0.875 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5(concat_ws('|', '11',
                              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                         / 1152921504606846976.0 AS u
                  FROM documents)
        """,
        "sample_per_group": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY CAST(('0x' || substr(md5(concat_ws('|', '7',
                                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                                    / 1152921504606846976.0 ASC,
                                    doc_id ASC
                       ) AS rn
                FROM documents
            ) WHERE rn <= 3
        """,
        # same deterministic old-snapshot construction, but classification
        # by direct column comparison instead of signatures
        "snapshot_diff": """
            WITH old AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 13 = 0 THEN text || ' CHANGED'
                          ELSE text END AS text,
                     lang
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text, lang
              FROM documents WHERE doc_id % 29 = 0),
            nw AS (SELECT doc_id, text, lang FROM documents)
            SELECT doc_id, change FROM (
              SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN (n.text IS DISTINCT FROM o.text)
                            OR (n.lang IS DISTINCT FROM o.lang) THEN 'changed'
                     END AS change
              FROM nw n FULL OUTER JOIN old o ON n.doc_id = o.doc_id)
            WHERE change IS NOT NULL
        """,
        "pii_redaction": _pii_oracle_sql(),
        # per-stratum keep fraction min(1, quota*N/N_s) from exact window
        # counts; same md5 uniform (seed 13) as the Spark sampler
        "quota_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     count(*) OVER () AS n,
                     count(*) OVER (PARTITION BY lang) AS ns
              FROM documents)
            WHERE CAST(('0x' || substr(md5(concat_ws('|', '13',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0
                < CASE lang
                    WHEN 'en' THEN least(1.0, 0.10 * n / ns)
                    WHEN 'zh' THEN least(1.0, 0.05 * n / ns)
                    ELSE 1.0 END
        """,
        # distinct shared word-3-grams per corpus doc vs the %37 benchmark
        # subset, same normalization as ngram_jaccard_exact
        "contamination": """
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN ws IS NULL OR len(ws) < 3
                          THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     END AS grams
              FROM w),
            bg AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id % 37 = 0),
            cg AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id % 37 <> 0)
            SELECT doc_id, count(*) AS n_shared
            FROM cg JOIN bg USING (gr)
            GROUP BY doc_id
        """,
        # the full five-stage corpus build replayed: filter -> dedup
        # survivors -> 3-gram decontamination -> 12/3 chunking -> 50%
        # content-hash sample
        "training_corpus_pipeline": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id % 37 <> 0 AND n_chars >= 50),
            surv AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY text) AS mid
                FROM corpus)
              WHERE doc_id = mid),
            bw AS (
              SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents WHERE doc_id % 37 = 0),
            bg AS (
              SELECT DISTINCT unnest(
                CASE WHEN ws IS NULL OR len(ws) < 3 THEN CAST([] AS VARCHAR[])
                     ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END) AS gr
              FROM bw),
            sw AS (
              SELECT doc_id, text,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM surv),
            sg AS (
              SELECT doc_id, unnest(
                CASE WHEN ws IS NULL OR len(ws) < 3 THEN CAST([] AS VARCHAR[])
                     ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END) AS gr
              FROM sw),
            bad AS (SELECT DISTINCT sg.doc_id FROM sg JOIN bg USING (gr)),
            clean AS (
              SELECT doc_id, text, ws FROM sw
              WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
            d2 AS (
              SELECT doc_id, ws,
                     greatest(0, CAST(floor((len(ws) - 4) / 9.0) AS INT)) AS max_k
              FROM clean
              WHERE text IS NOT NULL AND trim(text) <> '' AND len(ws) > 0),
            ks AS (SELECT doc_id, ws, unnest(range(0, max_k + 1)) AS k FROM d2)
            SELECT doc_id, CAST(k AS INT) AS chunk_id,
                   array_to_string(ws[k*9 + 1 : k*9 + 12], ' ') AS chunk_text,
                   CAST(len(ws[k*9 + 1 : k*9 + 12]) AS INT) AS n_words
            FROM ks
            WHERE CAST(('0x' || substr(md5(concat_ws('|', '21',
                        CAST(doc_id AS VARCHAR),
                        CAST(CAST(k AS INT) AS VARCHAR))), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0 < 0.5
        """,
        # 12-word windows, 3-word overlap, start step 9; trailing window
        # emitted iff start == 0 or start + 3 < n_words
        "chunk_documents": """
            WITH w AS (
              SELECT doc_id, text,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents),
            d2 AS (
              SELECT doc_id, ws,
                     greatest(0, CAST(floor((len(ws) - 4) / 9.0) AS INT)) AS max_k
              FROM w
              WHERE text IS NOT NULL AND trim(text) <> '' AND len(ws) > 0),
            ks AS (
              SELECT doc_id, ws, unnest(range(0, max_k + 1)) AS k FROM d2)
            SELECT doc_id,
                   CAST(k AS INT) AS chunk_id,
                   array_to_string(ws[k*9 + 1 : k*9 + 12], ' ') AS chunk_text,
                   CAST(len(ws[k*9 + 1 : k*9 + 12]) AS INT) AS n_words
            FROM ks
        """,
        # 1 - distinct/total word 3-grams over the same normalization as
        # ngram_jaccard_exact
        "repetition_scores": """
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents)
            SELECT doc_id,
                   CASE WHEN ws IS NULL OR len(ws) < 3 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(
                                 list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
                               * 1.0 / (len(ws) - 2), 4)
                   END AS rep_ratio
            FROM w
        """,
        # PPS Poisson: min(1, rate*weight) threshold on the same 60-bit
        # uniform — pure arithmetic, bit-identical across engines
        "weighted_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
              AND CAST(('0x' || substr(md5(concat_ws('|', '11',
                          CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0
                < least(1.0, 0.0005 * n_chars)
        """,
        # Efraimidis-Spirakis race replay: -ln(max(u,1e-18))/weight, rank
        # per lang, doc_id tie-break
        "weighted_sample_per_group": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY -ln(greatest(
                                        CAST(('0x' || substr(md5(concat_ws('|', '11',
                                            CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                                        / 1152921504606846976.0, 1e-18))
                                    / n_chars ASC,
                                    doc_id ASC
                       ) AS rn
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0
            ) WHERE rn <= 4
        """,
        # full-probe IVF == exact brute force (every cell probed), so the
        # ann_bruteforce oracle applies verbatim
        "ivf_full_probe": """
            SELECT query_id, item_id, round(cosine, 4) AS cosine_r, rank FROM (
                SELECT q.vec_id AS query_id, i.vec_id AS item_id,
                       list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])) AS cosine,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                                                          CAST(q.embedding AS DOUBLE[])) DESC,
                                                   i.vec_id ASC) AS rank
                FROM embeddings i CROSS JOIN
                     (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q)
            WHERE rank <= 5
        """,
        "ivf_incremental_full_probe": """
            SELECT query_id, item_id, round(cosine, 4) AS cosine_r, rank FROM (
                SELECT q.vec_id AS query_id, i.vec_id AS item_id,
                       list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])) AS cosine,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                                                          CAST(q.embedding AS DOUBLE[])) DESC,
                                                   i.vec_id ASC) AS rank
                FROM embeddings i CROSS JOIN
                     (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q)
            WHERE rank <= 5
        """,
        # planted exact copies -> the full LSH output is deterministic:
        # each vector pairs with its own copy at cosine 1.0, nothing else
        # reaches the 0.95 threshold (measured: no natural pair >= 0.8)
        "embedding_near_dups": """
            SELECT vec_id AS id_a, vec_id + 10000 AS id_b,
                   CAST(1.0 AS DOUBLE) AS cosine_r
            FROM embeddings
        """,
        # Python-side byte counts (through the mapInPandas Arrow round
        # trip) == octet_length of the same UTF-8 encoding; null text -> 0
        "multimodal_bytes": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   coalesce(octet_length(encode(text)), 0) AS n_bytes
            FROM documents
        """,
        # exact word-3-gram jaccard: normalize (lower, collapse whitespace,
        # trim), distinct 3-grams, |∩|/|∪|; docs with < 3 words get the
        # empty gram set and pair at jaccard 1.0 (mirrors dff.dedup)
        "ngram_jaccard_exact": f"""
            WITH {_NGRAM_PAIR_CTES}
            SELECT id_a, id_b, jaccard FROM njpairs
        """,
        # asymmetric containment over the same gram CTEs (w, g)
        "ngram_containment_exact": f"""
            WITH {_NGRAM_PAIR_CTES}
            SELECT id_small, id_big, containment FROM (
              SELECT a.doc_id AS id_small, b.doc_id AS id_big,
                     round(len(list_intersect(a.grams, b.grams)) * 1.0
                           / len(a.grams), 4) AS containment
              FROM g a JOIN g b ON a.doc_id != b.doc_id
              WHERE len(a.grams) > 0)
            WHERE containment >= 0.3
        """,
        # transitive closure of the same pair graph: min-label
        # reachability (comp = min doc_id reachable) == connected
        # components with min-id canonical labels; documents in no pair
        # are singleton components via the non-recursive seed
        "dup_clusters": f"""
            WITH RECURSIVE {_NGRAM_PAIR_CTES},
            edges AS (
              SELECT id_a AS u, id_b AS v FROM njpairs
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM njpairs),
            reach(node, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node)
            SELECT node, MIN(comp) AS component FROM reach GROUP BY node
        """,
        "dedup_survivors": f"""
            WITH RECURSIVE {_NGRAM_PAIR_CTES},
            edges AS (
              SELECT id_a AS u, id_b AS v FROM njpairs
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM njpairs),
            reach(node, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
            comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN comp c ON d.doc_id = c.node
            WHERE c.node = c.component
        """,
        "best_survivors": f"""
            WITH RECURSIVE {_NGRAM_PAIR_CTES},
            edges AS (
              SELECT id_a AS u, id_b AS v FROM njpairs
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM njpairs),
            reach(node, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node),
            comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node),
            ranked AS (
              SELECT d.doc_id, d.lang, d.n_chars,
                     row_number() OVER (PARTITION BY c.component
                                        ORDER BY d.n_chars DESC, d.doc_id ASC)
                       AS rn
              FROM documents d JOIN comp c ON d.doc_id = c.node)
            SELECT doc_id, lang, n_chars FROM ranked WHERE rn = 1
        """,
        "stream_window_counts": """
            SELECT day, verdict_id, count(*) AS n FROM (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       CASE WHEN value > 180 THEN 'E_high_value'
                            WHEN event_type = 'error' AND value > 150
                                 THEN 'E_error_mid'
                       END AS verdict_id
                FROM events)
            WHERE verdict_id IS NOT NULL
            GROUP BY day, verdict_id
        """,
        # gaps-and-islands sessionization mirroring session_window: a new
        # session starts when the gap to the previous same-user event is
        # >= 30 min; session end = last event + gap; append-mode emission
        # cutoff = sessions finalized by the final watermark (max ts)
        "session_counts": """
            WITH e AS (SELECT user_id, ts FROM events),
            d AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM d
            ),
            sess AS (
              SELECT user_id,
                     MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                     COUNT(*) AS n_events
              FROM s GROUP BY user_id, sid
            )
            SELECT user_id, session_start, session_end, n_events
            FROM sess
            WHERE session_end <= (SELECT MAX(ts) FROM events)
        """,
        # one UNION ALL branch per constraint: every triggered rule (no
        # first-win collapse) + the lang referential miss (NULL lang joins
        # to nothing -> violation, hence the IS NULL arm)
        "row_attribution": """
            SELECT doc_id, 'R1' AS constraint_id FROM documents
              WHERE text IS NULL OR length(text) = 0
            UNION ALL
            SELECT doc_id, 'R2' FROM documents WHERE n_chars < 40
            UNION ALL
            SELECT doc_id, 'R3' FROM documents
              WHERE lang = 'zh' AND n_chars > 400
            UNION ALL
            SELECT doc_id, 'lang_allowed' FROM documents
              WHERE lang IS NULL OR lang NOT IN ('en', 'de', 'fr')
        """,
        "salted_stats": """
            SELECT lang, count(*) AS rows, count(n_chars) AS non_null,
                   round(CAST(min(n_chars) AS DOUBLE), 4) AS min_v,
                   round(CAST(max(n_chars) AS DOUBLE), 4) AS max_v,
                   round(avg(n_chars), 4) AS mean_v,
                   round(stddev_samp(n_chars), 4) AS std_v
            FROM documents GROUP BY lang
        """,
        # mirrors dff.textops.quality_score term by term; regexp hit counts
        # via the split-array trick (n matches -> n+1 pieces)
        "quality_scores": r"""
            WITH f AS (
              SELECT doc_id, length(text) AS n,
                     length(regexp_split_to_array(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) - 1 AS toks,
                     length(regexp_split_to_array(text, '[!-/:-@\[-`{-~]')) - 1 AS punct,
                     length(regexp_split_to_array(text, '(?i)\b(the|and|of|to|is|in|that|it|for|with)\b')) - 1 AS stops
              FROM documents),
            s AS (
              SELECT doc_id,
                     least(1.0, n / 2000.0) AS length_score,
                     greatest(0.0, 1.0 - (CASE WHEN n > 0 THEN punct * 1.0 / n ELSE 0.0 END) * 4.0) AS punct_pen,
                     least(1.0, (CASE WHEN toks > 0 THEN stops * 1.0 / toks ELSE 0.0 END) * 5.0) AS stop_score
              FROM f)
            SELECT doc_id,
                   CAST(round(CAST(0.5 * length_score + 0.3 * punct_pen + 0.2 * stop_score
                                   AS DECIMAL(20,10)), 4) AS DOUBLE) AS q
            FROM s
        """,
        "word_entropy": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
              FROM documents),
            c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(round(CAST(ln(sum(c)) - sum(c * ln(c)) / sum(c)
                                   AS DECIMAL(20,10)), 4) AS DOUBLE) AS h
            FROM c GROUP BY doc_id
        """,
        "ann_bruteforce": """
            SELECT query_id, item_id, round(cosine, 4) AS cosine_r, rank FROM (
                SELECT q.vec_id AS query_id, i.vec_id AS item_id,
                       list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])) AS cosine,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(CAST(i.embedding AS DOUBLE[]),
                                                                          CAST(q.embedding AS DOUBLE[])) DESC,
                                                   i.vec_id ASC) AS rank
                FROM embeddings i CROSS JOIN
                     (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q)
            WHERE rank <= 5
        """,
        # replays dff/mixing.py end to end: exact BIGINT avail/budget,
        # the FIXED-order rate arithmetic (budget*w/wsum/avail, wsum the
        # sorted-order weight sum = 1.0 here), floor/frac epoch split,
        # and the md5(seed|epoch|doc_id) partial-epoch membership —
        # bit-identical doubles, so the row SET hash-matches
        "corpus_mixture": """
            WITH pool AS (
              SELECT doc_id, source, n_chars FROM documents
              WHERE source IN ('src1','src2','src3')
            ), avail AS (
              SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
              FROM pool GROUP BY source
            ), budget AS (
              SELECT (CAST(sum(n_chars) AS BIGINT) * 6) // 5 AS budget
              FROM pool
            ), plan AS (
              SELECT a.source,
                LEAST(CAST(b.budget AS DOUBLE)
                        * (CASE a.source WHEN 'src1' THEN 0.5
                                         WHEN 'src2' THEN 0.25
                                         ELSE 0.25 END)
                        / 1.0 / CAST(a.avail AS DOUBLE), 4.0) AS rate
              FROM avail a, budget b
            )
            SELECT d.doc_id, d.source, t.epoch
            FROM pool d
            JOIN plan p ON p.source = d.source
            CROSS JOIN generate_series(0, 3) t(epoch)
            WHERE t.epoch < CAST(floor(p.rate) AS BIGINT)
                            + CASE WHEN p.rate > floor(p.rate) THEN 1 ELSE 0 END
              AND (t.epoch < CAST(floor(p.rate) AS BIGINT)
                   OR CAST(('0x' || substr(md5(concat_ws('|', '11',
                             CAST(t.epoch AS VARCHAR),
                             CAST(d.doc_id AS VARCHAR))), 1, 15))
                           AS BIGINT) / 1152921504606846976.0
                      < p.rate - floor(p.rate))
        """,
        # corpus_mixture's derivation + the per-domain achieved-vs-target
        # rollup (dff/mixing.py::mixture_summary); target = budget*w/wsum
        # (NOT divided by avail), achieved = picked/target, both rounded
        # through the DECIMAL idiom to 6 decimals
        "mixture_summary_stats": """
            WITH pool AS (
              SELECT doc_id, source, n_chars FROM documents
              WHERE source IN ('src1','src2','src3')
            ), avail AS (
              SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
              FROM pool GROUP BY source
            ), budget AS (
              SELECT (CAST(sum(n_chars) AS BIGINT) * 6) // 5 AS budget
              FROM pool
            ), plan AS (
              SELECT a.source,
                CAST(b.budget AS DOUBLE)
                  * (CASE a.source WHEN 'src1' THEN 0.5
                                   WHEN 'src2' THEN 0.25
                                   ELSE 0.25 END) / 1.0 AS target,
                LEAST(CAST(b.budget AS DOUBLE)
                        * (CASE a.source WHEN 'src1' THEN 0.5
                                         WHEN 'src2' THEN 0.25
                                         ELSE 0.25 END)
                        / 1.0 / CAST(a.avail AS DOUBLE), 4.0) AS rate
              FROM avail a, budget b
            ), picked AS (
              SELECT d.doc_id, d.source, d.n_chars
              FROM pool d
              JOIN plan p ON p.source = d.source
              CROSS JOIN generate_series(0, 3) t(epoch)
              WHERE t.epoch < CAST(floor(p.rate) AS BIGINT)
                              + CASE WHEN p.rate > floor(p.rate)
                                     THEN 1 ELSE 0 END
                AND (t.epoch < CAST(floor(p.rate) AS BIGINT)
                     OR CAST(('0x' || substr(md5(concat_ws('|', '11',
                               CAST(t.epoch AS VARCHAR),
                               CAST(d.doc_id AS VARCHAR))), 1, 15))
                             AS BIGINT) / 1152921504606846976.0
                        < p.rate - floor(p.rate))
            )
            SELECT k.source,
                   count(*) AS picked_rows,
                   CAST(sum(k.n_chars) AS BIGINT) AS picked_weight,
                   CAST(round(CAST(p.target AS DECIMAL(28,12)), 6)
                        AS DOUBLE) AS target_weight,
                   CAST(round(CAST(CAST(CAST(sum(k.n_chars) AS BIGINT)
                                        AS DOUBLE) / p.target
                                   AS DECIMAL(28,12)), 6)
                        AS DOUBLE) AS achieved_frac
            FROM picked k JOIN plan p ON p.source = k.source
            GROUP BY k.source, p.target
        """,
        # replays dff/packing.py: same md5 stream hash, same shard split,
        # same deterministic-shuffle ORDER BY (u, doc_id), same exclusive
        # running sum — the whole packed layout hash-matches
        "sequence_packing": """
            WITH h AS (
              SELECT doc_id, n_chars,
                     CAST(('0x' || substr(md5(concat_ws('|', '4',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                       / 1152921504606846976.0 AS u
              FROM documents WHERE n_chars > 0
            ), s AS (
              SELECT doc_id, n_chars, u,
                     CAST(floor(u * 4.0) AS INT) AS shard
              FROM h
            ), o AS (
              SELECT doc_id, n_chars, shard,
                     sum(n_chars) OVER (PARTITION BY shard ORDER BY u, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - n_chars AS start_off
              FROM s
            )
            SELECT doc_id, shard,
                   CAST(start_off AS BIGINT) AS start_off,
                   CAST(start_off // 256 AS BIGINT) AS ctx_id,
                   CAST(start_off % 256 AS BIGINT) AS ctx_off,
                   CAST((start_off + n_chars - 1) // 256
                        - start_off // 256 + 1 AS BIGINT) AS n_ctx
            FROM o
        """,
        # replays pack_sequences AND context_fill: same layout CTEs, then
        # per-(shard, start-context) doc counts and boundary-clipped token
        # contributions
        "context_fill_stats": """
            WITH h AS (
              SELECT doc_id, n_chars,
                     CAST(('0x' || substr(md5(concat_ws('|', '4',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                       / 1152921504606846976.0 AS u
              FROM documents WHERE n_chars > 0
            ), s AS (
              SELECT doc_id, n_chars, u,
                     CAST(floor(u * 4.0) AS INT) AS shard
              FROM h
            ), o AS (
              SELECT doc_id, n_chars, shard,
                     sum(n_chars) OVER (PARTITION BY shard ORDER BY u, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - n_chars AS start_off
              FROM s
            )
            SELECT shard,
                   CAST(start_off // 256 AS BIGINT) AS ctx_id,
                   count(*) AS docs_starting,
                   CAST(sum(least(n_chars,
                                  256 - (start_off % 256))) AS BIGINT)
                     AS tokens_started_here
            FROM o
            GROUP BY shard, start_off // 256
        """,
        # invariant twin (cells are engine-internal): the self-check must
        # return zero disagreement rows on any input
        "semantic_dedup_violations": """
            SELECT CAST(NULL AS BIGINT) AS vec_id,
                   CAST(NULL AS BOOLEAN) AS kept,
                   CAST(NULL AS DOUBLE) AS max_earlier_cosine
            WHERE 1 = 0
        """,
    }
