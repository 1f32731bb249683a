"""t-digest: core accuracy, mergeability, and the sketch-only shuffle shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dff.tdigest import TDigest, merge_digests, partition_digests, tdigest_quantiles

QS = (0.01, 0.25, 0.5, 0.75, 0.99)


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    v = np.sort(values)
    lo = np.searchsorted(v, est, side="left") / len(v)
    hi = np.searchsorted(v, est, side="right") / len(v)
    if lo <= q <= hi:
        return 0.0
    return min(abs(lo - q), abs(hi - q))


@pytest.fixture(scope="module")
def mixed():
    rng = np.random.default_rng(42)
    return np.concatenate(
        [rng.uniform(0, 100, 30000), rng.lognormal(3, 1, 20000), [0.0, 1e6]]
    )


def test_core_accuracy_and_exact_extremes(mixed):
    d = TDigest.of(mixed)
    for q in QS:
        assert _rank_error(mixed, d.quantile(q), q) <= 0.01, q
    assert d.quantile(0.0) == mixed.min()
    assert d.quantile(1.0) == mixed.max()
    # memory bound: centroid count ~ delta, not n
    assert len(d.means) <= 2 * 200


def test_merge_of_chunks_matches_whole(mixed):
    chunks = np.array_split(mixed, 7)
    merged = TDigest.of(chunks[0])
    for c in chunks[1:]:
        merged = merged.merge(TDigest.of(c))
    assert abs(merged.count - len(mixed)) < 1e-6
    for q in QS:
        assert _rank_error(mixed, merged.quantile(q), q) <= 0.015, q


def test_spark_global_quantiles_match_exact(spark, mixed):
    df = spark.createDataFrame([(float(x),) for x in mixed], ["v"]).repartition(8)
    out = {r["q"]: r["value"] for r in tdigest_quantiles(df, "v", QS).collect()}
    for q in QS:
        assert _rank_error(mixed, out[q], q) <= 0.015, (q, out[q])


def test_spark_grouped_skewed_quantiles(spark):
    """Per-group digests on the skewed lang column: accuracy must hold for
    the hot group AND the cold ones — the sketch shuffle costs the same."""
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = tdigest_quantiles(
        d, "n_chars", (0.25, 0.5, 0.75), key_col="lang"
    ).collect()
    pdf = d.select("lang", "n_chars").toPandas()
    for r in out:
        grp = pdf[pdf["lang"].astype(str) == r["group_key"]]["n_chars"].to_numpy()
        assert _rank_error(grp.astype(float), r["value"], r["q"]) <= 0.02, r


def test_shuffle_carries_sketches_not_rows(spark, mixed):
    """Plan shape: the map-side MapInPandas digest stage sits BELOW the only
    hash Exchange, so what shuffles is digest rows (≈delta doubles per
    partition), never the data."""
    df = spark.createDataFrame([(float(x),) for x in mixed[:5000]], ["v"]).repartition(8)
    merged = merge_digests(partition_digests(df, "v"))
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    below_exchange = plan.split("Exchange hashpartitioning(group_key", 1)[-1]
    assert "MapInPandas" in below_exchange, plan
    # and the digest rows are tiny: n_partitions rows with bounded arrays
    rows = partition_digests(df, "v").collect()
    assert 0 < len(rows) <= 8
    assert all(len(r["means"]) <= 400 for r in rows)


def test_null_group_key_forms_its_own_group(spark):
    """Code-review r03: pandas groupby silently drops NaN keys by default;
    NULL-keyed rows must surface as a NULL group_key row like groupBy."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    rows = [("a", float(i)) for i in range(100)] + [
        (None, float(1000 + i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, schema).repartition(4)
    out = {r["group_key"]: r["value"] for r in tdigest_quantiles(df, "v", (0.5,), key_col="k").collect()}
    assert set(out) == {"a", None}
    assert 40 <= out["a"] <= 60
    assert 1015 <= out[None] <= 1035


def test_digest_persist_and_merge_across_snapshots(spark, tmp_path, mixed):
    """The persistence story: partition digests written to parquet by one
    job merge with a later snapshot's digests — the combined quantiles are
    accurate for the UNION without rescanning the first snapshot."""
    from dff.tdigest import _row_digest

    half = len(mixed) // 2
    df1 = spark.createDataFrame([(float(x),) for x in mixed[:half]], ["v"]).repartition(4)
    df2 = spark.createDataFrame([(float(x),) for x in mixed[half:]], ["v"]).repartition(4)
    p = str(tmp_path / "digests")
    partition_digests(df1, "v").write.mode("overwrite").parquet(p)
    combined = merge_digests(
        spark.read.parquet(p).unionByName(partition_digests(df2, "v"))
    ).collect()
    assert len(combined) == 1
    d = _row_digest(combined[0])
    assert abs(d.count - len(mixed)) < 1e-6
    for q in QS:
        assert _rank_error(mixed, d.quantile(q), q) <= 0.015, q
