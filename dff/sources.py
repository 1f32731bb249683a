"""Deterministic synthetic source-code table generator (FIXTURES.md F3/F4).

Generates the north-star input table ``(repo, path, commit, lang, content)``
fully DISTRIBUTED — ``spark.range(n)`` plus hash expressions, no driver data,
no ``F.rand`` (hash-derived uniforms are reproducible independent of
partitioning).  Violations are planted at deterministic row ids so tests and
the pandas oracle can predict exact counts:

- ``id % 983 == 7``   -> NULL ``lang``             (null-rate constraint)
- ``id % 977 == 13``  -> empty ``content``         (empty-content constraint)
- ``id % 997 == 31``  -> orphan ``commit``         (referential repo->commit)
- ``id % 991 == 37``  -> ``lang = 'cobol'``        (referential lang->allowed)
- ``id % 499 == 21``  -> duplicated (repo,path,commit) triple (uniqueness)

The reference seeds nothing and fills missing inputs with
``random.uniform(1, 10)`` (/root/reference/02_dff_orchestration.py:331-334);
our fixtures are deterministic by construction (SURVEY.md §1.4 quirk list).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLOWED_LANGS = ["python", "java", "go", "ts", "rust", "c", "cpp"]

#: (language, cumulative probability) for the normal and skewed mixes.
_LANG_CDF = [
    ("python", 0.30), ("java", 0.50), ("go", 0.65), ("ts", 0.80),
    ("rust", 0.90), ("c", 0.95), ("cpp", 1.01),
]
_LANG_CDF_SKEW = [
    ("python", 0.90), ("java", 0.92), ("go", 0.94), ("ts", 0.96),
    ("rust", 0.98), ("c", 0.99), ("cpp", 1.01),
]
_EXT = {
    "python": "py", "java": "java", "go": "go", "ts": "ts",
    "rust": "rs", "c": "c", "cpp": "cc", "cobol": "cbl",
}

VALID_COMMITS_PER_REPO = 10
ORPHAN_COMMIT_IDX = 99


def _u(seed: int, tag: str) -> F.Column:
    """Deterministic uniform in [0,1) from the row id (partitioning-independent)."""
    return (
        F.pmod(F.xxhash64(F.col("id"), F.lit(tag), F.lit(seed)), F.lit(1_000_000))
        / 1_000_000.0
    )


def _lang_expr(u: F.Column, cdf: list[tuple[str, float]]) -> F.Column:
    """First-match when-chain over the cumulative distribution."""
    expr = F.lit(cdf[-1][0])
    for lang, cum in reversed(cdf[:-1]):
        expr = F.when(u < cum, F.lit(lang)).otherwise(expr)
    return expr


def synthetic_source_files(
    spark: SparkSession,
    n: int,
    n_repos: int = 1000,
    n_parts: int = 16,
    seed: int = 42,
    skew: bool = False,
    drift_part: int | None = None,
    plant_violations: bool = True,
) -> DataFrame:
    """Build the synthetic source-code table with a ``part_id`` lineage column.

    ``skew=True`` makes ``lang`` ~90% python (the skew-stress dataset required
    by SURVEY.md §7.3).  ``drift_part`` shifts the lang mix AND doubles content
    length within that partition (the drifted-partition fixture for PSI/KS).
    """
    df = spark.range(n)

    # Zipfian repo popularity: idx = floor(exp(u * ln(R))) gives density ~ 1/x.
    u_repo = _u(seed, "repo")
    repo_idx = F.least(
        F.lit(n_repos),
        F.floor(F.exp(u_repo * math.log(max(n_repos, 2)))),
    ).cast("long")
    repo = F.concat(
        F.lit("org"), F.pmod(repo_idx, F.lit(50)).cast("string"),
        F.lit("/repo"), repo_idx.cast("string"),
    )
    part_id = F.pmod(F.xxhash64(repo), F.lit(n_parts)).cast("int")

    # language mix, with optional per-partition drift
    u_lang = _u(seed, "lang")
    lang_normal = _lang_expr(u_lang, _LANG_CDF_SKEW if skew else _LANG_CDF)
    if drift_part is not None:
        # drifted mix: mass moves toward java/rust
        drift_cdf = [
            ("python", 0.10), ("java", 0.45), ("go", 0.50), ("ts", 0.55),
            ("rust", 0.90), ("c", 0.95), ("cpp", 1.01),
        ]
        lang = F.when(
            part_id == F.lit(int(drift_part)), _lang_expr(u_lang, drift_cdf)
        ).otherwise(lang_normal)
    else:
        lang = lang_normal

    # commit drawn from the per-repo valid commit dimension (idx 0..9)
    commit_idx = F.pmod(
        F.xxhash64(F.col("id"), F.lit("cidx"), F.lit(seed)),
        F.lit(VALID_COMMITS_PER_REPO),
    )

    # path: ext consistent with lang
    ext_expr = F.lit("txt")
    for lg, ext in _EXT.items():
        ext_expr = F.when(lang == lg, F.lit(ext)).otherwise(ext_expr)
    # key space sized so (repo, path, commit) collisions are planted-only:
    # the Zipf-hot repo holds ~n/ln(n_repos) rows, and birthday collisions
    # over (modules x files x commits) must stay << planted dup count
    module_idx = F.pmod(F.xxhash64(F.col("id"), F.lit("mod"), F.lit(seed)), F.lit(200))
    file_idx = F.pmod(
        F.xxhash64(F.col("id"), F.lit("file"), F.lit(seed)), F.lit(2_000_000)
    )
    path = F.concat(
        F.lit("src/module"), module_idx.cast("string"),
        F.lit("/file_"), file_idx.cast("string"),
        F.lit("."), ext_expr,
    )

    # content: deterministic pseudo-source, log-normal-ish length via
    # repeats = floor(exp(u * ln(64))) of a ~64-char unit (~64B .. ~4KB)
    u_len = _u(seed, "len")
    repeats = F.floor(F.exp(u_len * math.log(64.0))).cast("int")
    unit = F.concat(
        F.lit("def fn_"),
        F.substring(F.sha2(F.concat(repo, path, commit_idx.cast("string")), 256), 1, 8),
        F.lit("(x):\n    return x * "),
        F.pmod(F.xxhash64(F.col("id"), F.lit("body"), F.lit(seed)), F.lit(9973)).cast("string"),
        F.lit("  # "),
        F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 12),
        F.lit("\n"),
    )
    len_mult = (
        F.when(part_id == F.lit(int(drift_part)), F.lit(2)).otherwise(F.lit(1))
        if drift_part is not None
        else F.lit(1)
    )
    content = F.repeat(unit, repeats * len_mult)

    if plant_violations:
        lang = F.when(F.col("id") % 983 == 7, F.lit(None).cast("string")).otherwise(lang)
        content = F.when(F.col("id") % 977 == 13, F.lit("")).otherwise(content)
        commit_idx = F.when(
            F.col("id") % 997 == 31, F.lit(ORPHAN_COMMIT_IDX).cast("long")
        ).otherwise(commit_idx)
        lang = F.when(F.col("id") % 991 == 37, F.lit("cobol")).otherwise(lang)

    commit = F.substring(
        F.sha2(F.concat(repo, F.lit(":"), commit_idx.cast("string")), 256), 1, 40
    )

    # companion expected-violations tags (FIXTURES.md F3); dup copies inherit
    # their original's tags because the copy is filtered from the tagged rows.
    if plant_violations:
        planted = F.array_compact(
            F.array(
                F.when((F.col("id") % 983 == 7) & ~(F.col("id") % 991 == 37),
                       F.lit("null_lang")),
                F.when(F.col("id") % 977 == 13, F.lit("empty_content")),
                F.when(F.col("id") % 997 == 31, F.lit("orphan_commit")),
                F.when(F.col("id") % 991 == 37, F.lit("bad_lang")),
                F.when(F.col("id") % 499 == 21, F.lit("dup")),
            )
        )
    else:
        planted = F.array().cast("array<string>")

    out = df.select(
        F.col("id").alias("row_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        part_id.alias("part_id"),
        planted.alias("planted"),
    )

    if plant_violations:
        dups = out.where(F.array_contains(F.col("planted"), "dup")).withColumn(
            "row_id", F.col("row_id") + F.lit(n)
        )
        out = out.unionAll(dups)
    return out


def commits_dim(spark: SparkSession, n_repos: int = 1000) -> DataFrame:
    """Valid (repo, commit) dimension — the broadcast side of the
    repo->commit referential check.  Matches the generator's commit scheme."""
    repo_idx = F.col("id") + 1
    repo = F.concat(
        F.lit("org"), F.pmod(repo_idx, F.lit(50)).cast("string"),
        F.lit("/repo"), repo_idx.cast("string"),
    )
    return (
        spark.range(n_repos)
        .select(
            repo.alias("repo"),
            F.explode(
                F.sequence(F.lit(0), F.lit(VALID_COMMITS_PER_REPO - 1))
            ).alias("cidx"),
        )
        .select(
            "repo",
            F.substring(
                F.sha2(F.concat(F.col("repo"), F.lit(":"), F.col("cidx").cast("string")), 256),
                1,
                40,
            ).alias("commit"),
        )
    )


def langs_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(lg,) for lg in ALLOWED_LANGS], ["lang"])


def synthetic_documents(
    spark: SparkSession,
    n: int,
    n_words: int = 40,
    vocab: int = 5000,
    dup_every: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Deterministic document corpus for engine-scale dedup benchmarks
    (VERDICT r03 #1/#4: the LSH path must be timed above gate-table
    sizes without touching the read-only sf tables).

    Pure JVM expressions — ``n_words`` hash-picked vocab words per doc,
    and every ``dup_every``-th row copies the PREVIOUS row's text plus a
    one-word suffix, planting ~1/dup_every near-duplicate pairs whose
    Jaccard is high but < 1 (exercises the verify stage, not just exact
    hashing).  Columns: (doc_id, text).
    """
    src = F.when(
        (F.col("id") % dup_every == 1) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, F.lit(i), F.lit(seed)), F.lit(vocab)).cast(
                "string"
            ),
        )
        for i in range(n_words)
    ]
    text = F.concat_ws(" ", *words)
    text = F.when(
        (F.col("id") % dup_every == 1) & (F.col("id") > 0),
        F.concat(text, F.lit(" wdup")),
    ).otherwise(text)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def synthetic_embeddings(
    spark: SparkSession, n: int, dim: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic embedding corpus (vec_id, embedding array<double>)
    with hash-uniform components in [-1, 1] — JVM-side generation only."""
    comps = [
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(j), F.lit(seed)), F.lit(100_000))
            / F.lit(50_000.0)
            - F.lit(1.0)
        )
        for j in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )
