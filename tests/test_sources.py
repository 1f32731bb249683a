from __future__ import annotations

from pyspark.sql import functions as F

from dff.schema import SOURCE_SCHEMA, check_schema
from dff.sources import ALLOWED_LANGS, commits_dim, langs_dim, synthetic_source_files


def test_generator_schema_and_determinism(spark):
    df = synthetic_source_files(spark, 2000, n_repos=100, seed=42)
    assert check_schema(df, SOURCE_SCHEMA) == []
    # deterministic across invocations and partitioning
    a = df.orderBy("row_id").select("repo", "path", "commit", "lang").limit(50).collect()
    b = (
        synthetic_source_files(spark, 2000, n_repos=100, seed=42)
        .repartition(7)
        .orderBy("row_id")
        .select("repo", "path", "commit", "lang")
        .limit(50)
        .collect()
    )
    assert a == b


def test_planted_violation_counts(spark):
    n = 5000
    df = synthetic_source_files(spark, n, n_repos=100, seed=42).cache()
    tag = lambda t: F.array_contains(F.col("planted"), t)  # noqa: E731
    # planted tags exactly predict the observable violations
    assert df.where(F.col("lang").isNull()).count() == df.where(tag("null_lang")).count()
    assert df.where(F.col("content") == "").count() == df.where(tag("empty_content")).count()
    assert df.where(F.col("lang") == "cobol").count() == df.where(tag("bad_lang")).count()
    n_dups = len([i for i in range(n) if i % 499 == 21])
    assert df.count() == n + n_dups
    assert df.where(tag("dup")).count() == 2 * n_dups
    df.unpersist()


def test_dims_cover_valid_rows(spark):
    n = 3000
    df = synthetic_source_files(spark, n, n_repos=100, seed=42)
    commits = commits_dim(spark, n_repos=100)
    # non-orphan rows all join; orphan rows all miss
    orphan = F.array_contains(F.col("planted"), "orphan_commit")
    clean = df.where(~orphan)
    orphans = df.where(orphan)
    assert clean.join(commits, ["repo", "commit"], "left_anti").count() == 0
    assert orphans.join(commits, ["repo", "commit"], "left_semi").count() == 0
    allowed = langs_dim(spark)
    bad = df.where(F.col("lang").isNotNull()).join(allowed, ["lang"], "left_anti")
    assert set(r["lang"] for r in bad.select("lang").distinct().collect()) == {"cobol"}
    assert set(ALLOWED_LANGS) >= set(
        r["lang"]
        for r in df.where(F.col("lang").isNotNull() & (F.col("lang") != "cobol"))
        .select("lang")
        .distinct()
        .collect()
    )
