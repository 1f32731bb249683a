"""Hash sampling: partition-invariance, rate accuracy, strata, per-group n,
and the map-only / one-shuffle plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.sampling import (
    hash_sample,
    sample_n_per_group,
    stratified_sample,
    weighted_hash_sample,
    weighted_sample_n_per_group,
)


def _ids(df):
    return sorted(r[0] for r in df.select("id").collect())


@pytest.fixture(scope="module")
def base(spark):
    return spark.range(0, 20000).select(
        "id", (F.col("id") % 7).cast("string").alias("g")
    )


def test_partition_invariant_and_rate(base):
    a = _ids(hash_sample(base.repartition(3), ["id"], 0.3, seed=5))
    b = _ids(hash_sample(base.repartition(17), ["id"], 0.3, seed=5))
    assert a == b  # membership depends on content only
    assert abs(len(a) / 20000 - 0.3) < 0.02
    # a different seed picks a genuinely different subset
    c = _ids(hash_sample(base, ["id"], 0.3, seed=6))
    assert c != a and abs(len(c) / 20000 - 0.3) < 0.02


def test_stratified_rates_and_default(base):
    out = stratified_sample(
        base, "g", {"0": 1.0, "1": 0.5, "2": 0.0}, key_cols=["id"], seed=1
    )
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    per = 20000 / 7
    assert got["0"] == pytest.approx(per, rel=0.01)
    assert got["1"] == pytest.approx(per * 0.5, rel=0.1)
    assert "2" not in got
    assert set(got) == {"0", "1"}  # default=0 drops unlisted strata
    # default applies to unlisted strata
    out2 = stratified_sample(
        base, "g", {"0": 1.0}, key_cols=["id"], default=0.25, seed=1
    )
    n3 = out2.where(F.col("g") == "3").count()
    assert n3 == pytest.approx(per * 0.25, rel=0.15)


def test_sample_n_per_group_exact_and_deterministic(base):
    out = sample_n_per_group(base.repartition(5), ["g"], 10, key_cols=["id"], seed=3)
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert set(sizes.values()) == {10}
    again = sample_n_per_group(base.repartition(13), ["g"], 10, key_cols=["id"], seed=3)
    assert _ids(out) == _ids(again)
    # n larger than the group returns the whole group
    tiny = base.where(F.col("id") < 3)
    assert sample_n_per_group(tiny, ["g"], 10, key_cols=["id"]).count() == 3


def test_validation(base):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(base, ["id"], 1.5)
    with pytest.raises(ValueError, match="stratum"):
        stratified_sample(base, "g", {"0": -0.1}, key_cols=["id"])
    with pytest.raises(ValueError, match="n must"):
        sample_n_per_group(base, ["g"], 0, key_cols=["id"])


def test_plan_shapes(base):
    flat = hash_sample(base, ["id"], 0.5)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure map-side predicate
    strat = stratified_sample(base, "g", {"0": 0.5}, key_cols=["id"])
    plan = strat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    grp = sample_n_per_group(base, ["g"], 5, key_cols=["id"])
    plan = grp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_weighted_hash_sample_rate_proportional_and_deterministic(spark):
    n = 40000
    df = spark.range(n).select(
        F.col("id"),
        # two weight classes: heavy rows 4x the light rows' inclusion prob
        F.when(F.col("id") % 4 == 0, 0.8).otherwise(0.2).alias("wt"),
    )
    s = weighted_hash_sample(df, ["id"], rate=0.5, weight_col="wt", seed=3)
    heavy = s.where(F.col("id") % 4 == 0).count()
    light = s.where(F.col("id") % 4 != 0).count()
    # E[heavy] = 10000*0.4 = 4000, E[light] = 30000*0.1 = 3000
    assert 3500 < heavy < 4500, heavy
    assert 2600 < light < 3400, light
    # partition-invariant determinism
    s2 = weighted_hash_sample(df.repartition(7), ["id"], 0.5, "wt", seed=3)
    assert sorted(r["id"] for r in s.collect()) == sorted(
        r["id"] for r in s2.collect()
    )
    # null / non-positive weights excluded, validation raises
    bad = df.withColumn("wt", F.when(F.col("id") < 100, None).otherwise(-1.0))
    assert weighted_hash_sample(bad, ["id"], 0.5, "wt").count() == 0
    with pytest.raises(ValueError, match="rate"):
        weighted_hash_sample(df, ["id"], -0.1, "wt")


def test_weighted_sample_n_per_group_favors_heavy_rows(spark):
    rows = [(g, i, 100.0 if i < 5 else 0.01) for g in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, id bigint, wt double")
    s = weighted_sample_n_per_group(df, ["grp"], 5, ["grp", "id"], "wt", seed=1)
    per = {r["grp"]: r["n"] for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 5, "b": 5}
    # the 5 heavy rows (weight 10000x) dominate the selection
    heavy_picked = s.where(F.col("id") < 5).count()
    assert heavy_picked >= 8, heavy_picked
    # deterministic under repartition
    s2 = weighted_sample_n_per_group(df.repartition(5), ["grp"], 5, ["grp", "id"], "wt", seed=1)
    assert sorted((r["grp"], r["id"]) for r in s.collect()) == sorted(
        (r["grp"], r["id"]) for r in s2.collect()
    )
    with pytest.raises(ValueError, match="n must"):
        weighted_sample_n_per_group(df, ["grp"], 0, ["id"], "wt")


def test_quota_sample_caps_majority_stratum(spark):
    from dff.sampling import quota_sample

    df = spark.range(10000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("de").alias("lang"),
    )
    # en is 80% of the corpus; cap it at ~30% of total = 3000 rows
    s = quota_sample(df, "lang", {"en": 0.3}, key_cols=["id"], seed=5)
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 2000  # no quota -> untouched
    assert 2700 < counts["en"] < 3300, counts
    # quota above the stratum's share is a no-op (fraction clamps at 1)
    s2 = quota_sample(df, "lang", {"de": 0.9}, key_cols=["id"], seed=5)
    assert s2.count() == 10000
    with pytest.raises(ValueError, match="quota"):
        quota_sample(df, "lang", {"en": 0.0}, key_cols=["id"])


def test_assign_splits_disjoint_exhaustive_deterministic(spark):
    from dff.sampling import assign_splits

    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.75, "val": 0.125, "test": 0.125}
    got = assign_splits(df, ["doc_id"], w, seed=3)
    counts = {r["split"]: r["n"] for r in
              got.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 4000  # exhaustive, one label per row
    assert abs(counts["train"] / 4000 - 0.75) < 0.03
    assert abs(counts["val"] / 4000 - 0.125) < 0.02
    assert abs(counts["test"] / 4000 - 0.125) < 0.02
    # partition-invariant: repartitioned input gets the identical labels
    a = {(r["doc_id"], r["split"]) for r in got.collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in assign_splits(df.repartition(17), ["doc_id"], w, seed=3).collect()
    }
    assert a == b


def test_assign_splits_validation():
    from dff.sampling import assign_splits

    with pytest.raises(ValueError, match="at least two"):
        assign_splits(None, ["k"], {"train": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(None, ["k"], {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="positive"):
        assign_splits(None, ["k"], {"a": 1.5, "b": -0.5})
