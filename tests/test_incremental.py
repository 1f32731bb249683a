"""Incremental MinHash dedup store (dff/incremental.py).

Contract under test (module docstring): with no bucket capping triggered,
``init(old) + probe(new)`` finds EXACTLY the pairs a full one-shot
:func:`dff.dedup.minhash_dedup_pairs` run over ``old U new`` finds,
restricted to pairs touching a new doc — same hash family, same banding,
same verification expression.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.dedup import minhash_dedup_pairs
from dff.incremental import MinHashStore

BASE = (
    "spark executes distributed dataframe pipelines with catalyst optimizing "
    "logical plans into whole stage generated code across many partitions "
    "while tungsten manages memory layout and shuffle services move blocks"
)
OTHER = (
    "completely unrelated text about cooking pasta with fresh basil and "
    "olive oil in a small kitchen on a sunday afternoon with good friends"
)


def _corpus(spark, ids, texts):
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


def _old_new(spark):
    """old: 0 (BASE), 1 (unrelated); new: 10 (near-dup of 0), 11 (exact dup
    of 0), 12 (unrelated), 13 (near-dup of 12's template)."""
    old = _corpus(spark, [0, 1], [BASE, OTHER])
    new = _corpus(
        spark,
        [10, 11, 12, 13],
        [
            BASE.replace("shuffle services", "the shuffle service"),
            BASE,
            OTHER + " and plenty of red wine",
            OTHER + " and plenty of white wine",
        ],
    )
    return old, new


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9) for r in df.collect()
    }


def test_probe_matches_full_run(spark, tmp_path):
    old, new = _old_new(spark)
    store = MinHashStore(spark, str(tmp_path / "s"), managed=False)
    store.init(old, "doc_id", "text")
    got = _pairs(
        store.probe(new, "doc_id", "text", threshold=0.5).drop("cross")
    )

    full = minhash_dedup_pairs(
        old.unionByName(new), "doc_id", "text", threshold=0.5
    )
    new_ids = {10, 11, 12, 13}
    want = {
        k: v
        for k, v in _pairs(full).items()
        if k[0] in new_ids or k[1] in new_ids
    }
    assert got == want
    assert len(got) >= 2  # planted: (0,10)/(0,11) cross, (12,13) internal


def test_cross_flag_and_internal_toggle(spark, tmp_path):
    old, new = _old_new(spark)
    store = MinHashStore(spark, str(tmp_path / "s"), managed=False)
    store.init(old, "doc_id", "text")
    rows = store.probe(new, "doc_id", "text", threshold=0.5).collect()
    cross = {(r["id_a"], r["id_b"]) for r in rows if r["cross"]}
    internal = {(r["id_a"], r["id_b"]) for r in rows if not r["cross"]}
    assert all(a < 10 for a, _ in cross)  # cross pairs touch a store doc
    assert (12, 13) in internal
    only_cross = store.probe(
        new, "doc_id", "text", threshold=0.5, include_internal=False
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in only_cross} == cross


def test_add_then_probe_sees_earlier_batches(spark, tmp_path):
    old, new = _old_new(spark)
    store = MinHashStore(spark, str(tmp_path / "s"), managed=False)
    store.init(old, "doc_id", "text")
    store.add(new, "doc_id", "text")
    # a later batch near-dups ONLY against docs from the appended batch
    batch2 = _corpus(
        spark, [20], [OTHER + " and plenty of red wine indeed"]
    )
    got = store.probe(batch2, "doc_id", "text", threshold=0.5)
    hits = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert (12, 20) in hits  # 12 lives in the appended batch, not in init


def test_store_identity_roundtrip(spark, tmp_path):
    old, _ = _old_new(spark)
    store = MinHashStore(spark, str(tmp_path / "s"), managed=False)
    assert not store.exists()
    store.init(old, "doc_id", "text")
    assert store.exists()
    assert store.load_sigs().count() == old.count()
    assert (
        store.load_bands().count() == old.count() * store.bands
    )  # one bb per band per doc


@pytest.mark.usefixtures("spark")
def test_managed_probe_store_side_skips_shuffle(spark, tmp_path):
    """The managed (bucketed-table) backend exists so the STORE side never
    shuffles: the probe plan must contain strictly fewer Exchanges than the
    same probe against the parquet backend, and a store-only groupBy on the
    bucket key must plan NO Exchange at all."""
    old, new = _old_new(spark)
    managed = MinHashStore(spark, "t_incr_store", managed=True)
    managed.init(old, "doc_id", "text")
    flat = MinHashStore(spark, str(tmp_path / "flat"), managed=False)
    flat.init(old, "doc_id", "text")
    try:
        agg = managed.load_bands().groupBy("bb").agg(F.count(F.lit(1)))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(bb" not in agg_plan, agg_plan

        def n_exchanges(store):
            p = store.probe(new, "doc_id", "text", threshold=0.5)
            return (
                p._jdf.queryExecution().executedPlan().toString()
            ).count("Exchange")

        n_managed, n_flat = n_exchanges(managed), n_exchanges(flat)
        assert n_managed < n_flat, (n_managed, n_flat)

        # and the managed backend returns the same pairs
        got_m = _pairs(managed.probe(new, "doc_id", "text", 0.5).drop("cross"))
        got_f = _pairs(flat.probe(new, "doc_id", "text", 0.5).drop("cross"))
        assert got_m == got_f
    finally:
        managed.drop()


def test_mismatched_family_is_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="bands must divide"):
        MinHashStore(spark, str(tmp_path / "x"), num_hashes=64, bands=13)


THIRD = (
    "a genuinely different document about distributed consensus protocols "
    "where leaders replicate ordered logs to follower quorums and commit "
    "entries once a majority of the cluster has durably acknowledged them"
)

_DOC_SCHEMA = "doc_id long, text string"


def _append_batch(spark, path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_ingest_dedup_stream_end_to_end(spark, tmp_path):
    """Two micro-batches: batch 0 bootstraps the store with its internal
    survivors; batch 1 drops a doc that cross-dups the store, keeps the
    canonical member of its internal cluster, and extends the store."""
    from dff.incremental import ingest_dedup_stream, read_ingested

    src = str(tmp_path / "src")
    _append_batch(
        spark, src, [(0, BASE), (1, OTHER), (2, BASE + " small tail")]
    )
    _append_batch(
        spark,
        src,
        [
            (10, BASE.replace("shuffle services", "the shuffle service")),
            (11, THIRD),
            (12, THIRD + " with a few extra words"),
        ],
    )
    store = MinHashStore(spark, str(tmp_path / "store"), managed=False)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen = []
    q = ingest_dedup_stream(
        stream, store, "doc_id", "text", out, str(tmp_path / "ck"),
        threshold=0.5, on_batch=lambda b, n, k: seen.append((b, n, k)),
    )
    assert q.awaitTermination(180)
    kept = sorted(r["doc_id"] for r in read_ingested(spark, out).collect())
    assert kept == [0, 1, 11]
    assert store.load_sigs().count() == 3  # store holds exactly the kept docs
    assert seen == [(0, 3, 2), (1, 3, 1)]


def test_ingest_marker_skips_redelivered_batch(spark, tmp_path):
    """A batch already committed (marker present) is skipped on redelivery
    from a fresh stream checkpoint: no duplicate store appends, no output
    changes, observer not called again."""
    from dff.incremental import ingest_dedup_stream, read_ingested

    src = str(tmp_path / "src")
    _append_batch(spark, src, [(0, BASE), (1, OTHER)])
    store = MinHashStore(spark, str(tmp_path / "store"), managed=False)
    out = str(tmp_path / "out")

    def run(ck, log):
        stream = spark.readStream.schema(_DOC_SCHEMA).parquet(src)
        q = ingest_dedup_stream(
            stream, store, "doc_id", "text", out, str(tmp_path / ck),
            threshold=0.5, on_batch=lambda b, n, k: log.append(b),
        )
        assert q.awaitTermination(180)

    first, second = [], []
    run("ck1", first)
    assert first == [0] and store.load_sigs().count() == 2
    run("ck2", second)  # fresh checkpoint -> batch 0 redelivered
    assert second == []  # marker short-circuits
    assert store.load_sigs().count() == 2
    assert sorted(
        r["doc_id"] for r in read_ingested(spark, out).collect()
    ) == [0, 1]
