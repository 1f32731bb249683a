"""Fuzzy edit-distance join (dff/fuzzy.py): FastSS deletion-neighborhood
blocking must be COMPLETE (superset of the true pair set) and the exact
levenshtein verify must make it precise — pinned against a driver-side
dynamic-programming oracle, plus plan shape (no cartesian product)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from dff.fuzzy import deletion_neighborhood, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _truth(rows, k):
    return {
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= k
    }


CORPUS = [
    (0, "kitten"), (1, "sitten"), (2, "sittin"), (3, "sitting"),
    (4, "apple"), (5, "appl"), (6, "apple"), (8, "x"), (9, ""),
    (10, "flaw"), (11, "lawn"), (12, "spark"), (13, "sparc"),
    (14, "park"), (15, "stark"), (16, "abcdef"), (17, "abdcef"),
]


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_pairs_exact_vs_dp_oracle(spark, k):
    df = spark.createDataFrame(CORPUS + [(7, None)], "id long, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=k).collect()
    }
    assert got == _truth(CORPUS, k)  # NULL row never pairs


def test_fuzzy_pairs_derived_strings_complete(spark):
    # 300 generated strings with planted 1-edit families — a larger
    # completeness sweep than the hand corpus
    df = spark.range(300).select(
        F.col("id"),
        F.concat(
            F.lit("u"),
            F.lpad((F.col("id") / 3).cast("int").cast("string"), 3, "0"),
            F.when(F.col("id") % 3 == 1, F.lit("x"))
            .when(F.col("id") % 3 == 2, F.lit("xy"))
            .otherwise(F.lit("")),
        ).alias("s"),
    )
    rows = [(r.id, r.s) for r in df.collect()]
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    }
    assert got == _truth(rows, 1)
    assert len(got) > 0


def test_no_cartesian_product_in_plan(spark):
    df = spark.createDataFrame(CORPUS, "id long, s string")
    plan = fuzzy_pairs(df, "id", "s", 1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deletion_neighborhood_sizes(spark):
    out = spark.createDataFrame([("abc",)], "s string").select(
        deletion_neighborhood(F.col("s"), 1).alias("d1"),
        deletion_neighborhood(F.col("s"), 2).alias("d2"),
    ).first()
    assert set(out.d1) == {"abc", "bc", "ac", "ab"}
    assert set(out.d2) == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_bad_k_raises(spark):
    df = spark.createDataFrame(CORPUS, "id long, s string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", 3)
