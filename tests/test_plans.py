"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are free
must actually appear in the executed plans (pushdown, pruning, broadcast,
single-exchange aggregation, whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dff.compiler import compile_ruleset
from dff.referential import orphan_rows
from dff.ruleset import parse_json
from dff.sources import commits_dim, synthetic_source_files

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan, plan


def test_column_pruning_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_referential_check_is_broadcast(spark):
    df = synthetic_source_files(spark, 2000, n_repos=50)
    # commits_dim is unique on (repo, commit) by construction, so the dim
    # side skips distinct() entirely — the WHOLE plan must be shuffle-free.
    plan = _plan(
        orphan_rows(
            df, commits_dim(spark, 50), ["repo", "commit"], dim_is_distinct=True
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_referential_check_dim_distinct_shuffles_dim_side_only(spark):
    """With an un-trusted dim the distinct() shuffle must sit UNDER the
    BroadcastExchange (dim subtree), never on the fact side."""
    df = synthetic_source_files(spark, 2000, n_repos=50)
    plan = _plan(orphan_rows(df, commits_dim(spark, 50), ["repo", "commit"]))
    assert "BroadcastHashJoin" in plan
    # executedPlan prints the streamed (fact) subtree before the
    # BroadcastExchange build subtree: any hash Exchange before the
    # broadcast marker would be a fact-side shuffle.
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in fact_side, plan


def test_rule_pass_is_whole_stage_codegen_no_shuffle(spark):
    # plant_violations=False: no planted-dup unionAll branch, so the plan is
    # a single codegen'd projection over range.
    df = synthetic_source_files(spark, 2000, n_repos=50, plant_violations=False)
    rs = parse_json(
        {"rules": [
            {"id": "a", "name": "lang is null", "requires": []},
            {"id": "b", "name": "length(content) = 0", "requires": ["a"]},
        ]}
    )
    compiled = compile_ruleset(rs, df)
    plan = _plan(df.select("repo", compiled.verdict.alias("v")))
    # executedPlan().toString() renders codegen stages as '*(n)' prefixes
    assert "*(" in plan, plan
    assert "Exchange" not in plan  # pure map-side


def test_ann_topk_prunes_map_side_before_any_shuffle(spark):
    """brute_force_topk must never shuffle n_items x n_queries scored rows:
    scoring + per-partition top-k happen in ONE MapInPandas stage over the
    unshuffled item scan (no join anywhere), and the only downstream
    consumer is the final merge over its bounded n_parts x n_q x k output."""
    from dff.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(brute_force_topk(emb, q, k=5))
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan  # queries closed over, never joined
    # the window's input is MapInPandas output (<= n_parts*n_q*k rows):
    # everything below the Window marker must be the pruning stage + scan
    below_window = plan.split("Window")[-1]
    assert "MapInPandas" in below_window, plan


def test_ivf_merge_prunes_map_side_no_collect_list(spark):
    """The IVF merge (two_stage_topk) must never ship unbounded candidate
    buffers through an Exchange: round 2's collect_list partials buffered
    EVERY candidate row (the last flagged scale-killer).  The merge is now
    a MapInPandas running top-k per partition, so the plan has no
    collect_list at all and the window's input is the bounded pruned set."""
    from dff.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(ivf_topk(emb, q, k=5, n_centroids=8, nprobe=2))
    assert "collect_list" not in plan, plan
    assert "MapInPandas" in plan, plan
    # the final merge window reads the MapInPandas partials, not raw
    # candidates: below the Window marker the pruning stage must appear
    below_window = plan.split("Window")[-1]
    assert "MapInPandas" in below_window, plan


def test_multi_stat_agg_single_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.agg(
        F.count(F.lit(1)),
        F.avg("l_quantity"),
        F.stddev_samp("l_quantity"),
        F.min("l_quantity"),
        F.max("l_quantity"),
        F.approx_count_distinct("l_partkey"),
    )
    plan = _plan(agg)
    assert plan.count("Exchange") == 1, plan


def test_uniqueness_branch_shuffles_hash_not_strings(spark):
    """The hash-compressed uniqueness plan: the only full-table Exchange
    partitions on xxhash64(keys) (8 bytes/row), and the duplicated-hash
    semi join must execute as a BroadcastHashJoin when the set is small —
    r4 replaced the unconditional broadcast hint (ADVICE r03: can OOM on
    heavily-duplicated input) with a size-guarded one (persist + bounded
    count), so the raw key strings still never repartition over the
    network in the sparse-duplicate case."""
    from dff.runner import ValidationConfig, ValidationRunner

    df = synthetic_source_files(spark, 2000, n_repos=50)
    runner = ValidationRunner(
        ValidationConfig(ruleset=parse_json(
            {"rules": [{"id": "a", "name": "lang is null", "requires": []}]}
        ))
    )
    verdicts = runner.row_verdicts(df)
    out = runner.violations(df, verdicts)
    static_plan = _plan(out)
    assert "Exchange hashpartitioning(__h" in static_plan, static_plan
    # execute, then read the FINAL adaptive plan: AQE must have converted
    # the un-hinted semi join to broadcast at runtime
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed
    # the string prints "== Final Plan ==" then "== Initial Plan ==";
    # assert only on the final (post-AQE) section
    final_plan = executed.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final_plan, final_plan
    assert "LeftSemi" in final_plan, final_plan
    # the only string-key Exchange is the exact-confirm re-group, and its
    # subtree (printed beneath it) must be the LeftSemi survivor set —
    # i.e. the raw table's strings never shuffle in the final plan
    parts = final_plan.split("Exchange hashpartitioning(repo")
    assert len(parts) == 2, final_plan
    assert "LeftSemi" in parts[1], final_plan
