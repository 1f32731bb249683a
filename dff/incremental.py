"""Incremental MinHash near-dup detection against a persisted signature store.

The reference dedups a corpus in one shot; a 100 TB training-data pipeline
cannot afford that — each arriving batch (a crawl snapshot, a repo sync)
must be checked against everything already ingested WITHOUT re-LSH-ing the
historical corpus.  This module persists the two MinHash artifacts once:

- ``{store}_sigs``  : (doc, sig array<bigint>)  — bucketed by ``doc``
- ``{store}_bands`` : (doc, bb bigint)          — bucketed by ``bb``

``bb`` collapses the (band, bucket) LSH pair into ONE 8-byte join key
(xxhash64 of both), so every probe join is a single-key equi-join that
Spark can satisfy from the table's bucketing: **the stored side never
shuffles** — only the new batch (m docs, m << N) moves.  Probe cost is
O(m·bands) shuffle + one map-side scan of the store bands; at 1000
executors the historical N·bands rows stay where they were written.

Two backends share all probe/ingest logic:

- managed bucketed tables (``managed=True``, via :mod:`dff.catalog`) — the
  scale path; plan-tested (no Exchange above the store-side scans);
- plain parquet directories (``managed=False``) — portable, used by the
  driver-gate query (no metastore writes under the driver); the probe
  joins then shuffle both sides, same results.

Hot buckets are handled at PROBE time on the touched subset only: the
batch's distinct ``bb`` set is broadcast, the store is semi-joined down to
touched buckets (map-side, no store shuffle), and only those buckets are
size-capped — so the cap sees true cumulative bucket sizes without
maintaining a counts table across appends.

Consistency contract (oracle-gated in ``incremental_dedup_violations`` and
asserted in tests/test_incremental.py): with no bucket capping triggered,
``init(old) + probe(new)`` finds EXACTLY the pairs a full
:func:`dff.dedup.minhash_dedup_pairs` run over ``old ∪ new`` finds,
restricted to pairs touching a new doc — same hash family, same banding,
same verification expression.

Reference scope: the reference has no incremental surface at all
(/root/reference/01_dff_model.py is a one-shot notebook); this is a
scale-path extension the north rule's continuous-ingest framing demands.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .catalog import drop_table, save_managed, table_exists
from .dedup import (
    drop_hot_buckets,
    lsh_bands,
    minhash_signature_arrow_udf,
    shingle_hashes_32,
    signature_agreement,
    widen_if_narrow,
)


class MinHashStore:
    """Persisted MinHash signature + LSH-band store for incremental dedup.

    Parameters pin the hash family; a probe against a store built with
    different (num_hashes, bands, k, seed) would silently find nothing,
    so they are part of the store identity and must match across sessions.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        num_hashes: int = 64,
        bands: int = 16,
        k: int = 9,
        seed: int = 42,
        n_buckets: int = 16,
        managed: bool = True,
    ) -> None:
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.spark = spark
        self.location = location
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.seed = seed
        self.n_buckets = n_buckets
        self.managed = managed

    # ------------------------------------------------------------ naming --
    def _name(self, part: str) -> str:
        if self.managed:
            return f"{self.location}_{part}"
        return f"{self.location}/{part}"

    def exists(self) -> bool:
        if self.managed:
            return table_exists(self.spark, self._name("sigs"))
        try:
            self.spark.read.parquet(self._name("sigs"))
            return True
        except Exception:
            return False

    # -------------------------------------------------------- featurizing --
    def _featurize(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(doc, sig): JVM shingle hashing + Arrow-batched affine mins —
        identical family to :func:`dff.dedup.minhash_dedup_pairs`."""
        sign = minhash_signature_arrow_udf(self.num_hashes, self.seed)
        return (
            widen_if_narrow(df.select(F.col(id_col), F.col(text_col)))
            .select(
                F.col(id_col).alias("doc"),
                shingle_hashes_32(text_col, self.k).alias("__h32"),
            )
            # double-reference guard: see dff/dedup.py minhash_dedup_pairs
            # (keeps the let_once shingle lambda out of the UDF argument)
            .select("doc", F.when(F.size("__h32") >= 0, sign("__h32")).alias("sig"))
        )

    def _bands_of(self, sigs: DataFrame) -> DataFrame:
        """(doc, bb): one 8-byte combined band+bucket key per band."""
        rows = self.num_hashes // self.bands
        return sigs.select(
            "doc", F.explode(lsh_bands("sig", self.bands, rows)).alias("b")
        ).select(
            "doc",
            F.xxhash64(F.col("b.band"), F.col("b.bucket")).alias("bb"),
        )

    # ------------------------------------------------------------ writing --
    def _write(self, sigs: DataFrame, bands: DataFrame, mode: str) -> None:
        if self.managed:
            if mode == "overwrite":
                save_managed(
                    sigs, self._name("sigs"), bucket_cols=["doc"],
                    n_buckets=self.n_buckets,
                )
                save_managed(
                    bands, self._name("bands"), bucket_cols=["bb"],
                    n_buckets=self.n_buckets,
                )
            else:
                # append with a MATCHING bucket spec keeps the tables'
                # shuffle-free probe property across ingests
                (sigs.write.mode("append").bucketBy(self.n_buckets, "doc")
                     .sortBy("doc").format("parquet")
                     .saveAsTable(self._name("sigs")))
                (bands.write.mode("append").bucketBy(self.n_buckets, "bb")
                      .sortBy("bb").format("parquet")
                      .saveAsTable(self._name("bands")))
        else:
            sigs.write.mode(mode).parquet(self._name("sigs"))
            bands.write.mode(mode).parquet(self._name("bands"))

    def init(self, df: DataFrame, id_col: str, text_col: str) -> None:
        """Bootstrap (or replace) the store from an initial corpus."""
        sigs = self._featurize(df, id_col, text_col).persist()
        sigs.count()  # one featurize pass feeds both tables
        try:
            self._write(sigs, self._bands_of(sigs), "overwrite")
        finally:
            sigs.unpersist()

    def add(self, df: DataFrame, id_col: str, text_col: str) -> None:
        """Append a batch (typically the probe survivors) to the store."""
        sigs = self._featurize(df, id_col, text_col).persist()
        sigs.count()
        try:
            self._write(sigs, self._bands_of(sigs), "append")
        finally:
            sigs.unpersist()

    # ------------------------------------------------------------ reading --
    def load_sigs(self) -> DataFrame:
        if self.managed:
            return self.spark.table(self._name("sigs"))
        return self.spark.read.parquet(self._name("sigs"))

    def load_bands(self) -> DataFrame:
        if self.managed:
            return self.spark.table(self._name("bands"))
        return self.spark.read.parquet(self._name("bands"))

    def drop(self) -> None:
        if self.managed:
            drop_table(self.spark, self._name("sigs"))
            drop_table(self.spark, self._name("bands"))

    # ------------------------------------------------------------ probing --
    def probe(
        self,
        batch: DataFrame,
        id_col: str,
        text_col: str,
        threshold: float = 0.7,
        max_bucket_size: int = 1000,
        include_internal: bool = True,
    ) -> DataFrame:
        """Near-dup pairs for a new batch: batch-vs-store AND (optionally)
        batch-internal.  Returns (id_a, id_b, est_jaccard, cross) with
        id_a < id_b; ``cross`` marks store-vs-batch pairs.

        Plan shape (managed backend): batch featurize (map-side) ->
        batch bands shuffle into the store's bucket layout -> sort-merge
        against the UNSHUFFLED store bands -> slim (id,id) candidate dedup
        -> verification joins where the store sigs side is again
        unshuffled (bucketed by doc).  The store is read twice, moved
        never.
        """
        # eager persist: several subplans below (bands explode, both
        # verification sides) reuse the featurized batch; without the
        # materialized cache they race and each recomputes the
        # shingle+signature pipeline (same realization as
        # minhash_dedup_pairs eager=True).  NOT unpersisted here — the
        # returned plan still references it; Spark's ContextCleaner
        # reclaims the cache once the plan is garbage-collected.
        sigs = self._featurize(batch, id_col, text_col).persist()
        sigs.count()
        batch_bands = drop_hot_buckets(
            self._bands_of(sigs), ["bb"], max_bucket_size
        )

        # store bands, narrowed to TOUCHED buckets map-side, then
        # size-capped on that subset only (true cumulative sizes)
        touched = batch_bands.select("bb").distinct()
        store_bands = self.load_bands().join(
            F.broadcast(touched), "bb", "left_semi"
        )
        store_bands = drop_hot_buckets(store_bands, ["bb"], max_bucket_size)

        cross = (
            store_bands.alias("s")
            .join(batch_bands.alias("n"), "bb")
            .where(F.col("s.doc") != F.col("n.doc"))
            .select(
                F.col("s.doc").alias("id_old"),
                F.col("n.doc").alias("id_new"),
            )
            .dropDuplicates(["id_old", "id_new"])
        )
        store_sigs = self.load_sigs().select(
            F.col("doc").alias("id_old"), F.col("sig").alias("__so")
        )
        new_sigs = sigs.select(
            F.col("doc").alias("id_new"), F.col("sig").alias("__sn")
        )
        cross_pairs = (
            cross.join(store_sigs, "id_old")
            .join(new_sigs, "id_new")
            .select(
                F.least("id_old", "id_new").alias("id_a"),
                F.greatest("id_old", "id_new").alias("id_b"),
                signature_agreement(F.col("__so"), F.col("__sn")).alias(
                    "est_jaccard"
                ),
                F.lit(True).alias("cross"),
            )
            .where(F.col("est_jaccard") >= threshold)
        )
        if not include_internal:
            return cross_pairs

        a = batch_bands.alias("a")
        b = batch_bands.alias("b")
        internal = (
            a.join(b, "bb")
            .where(F.col("a.doc") < F.col("b.doc"))
            .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sa = sigs.select(F.col("doc").alias("id_a"), F.col("sig").alias("__sa"))
        sb = sigs.select(F.col("doc").alias("id_b"), F.col("sig").alias("__sb"))
        internal_pairs = (
            internal.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                signature_agreement(F.col("__sa"), F.col("__sb")).alias(
                    "est_jaccard"
                ),
                F.lit(False).alias("cross"),
            )
            .where(F.col("est_jaccard") >= threshold)
        )
        return cross_pairs.unionByName(internal_pairs)


def ingest_dedup_stream(
    stream_df: DataFrame,
    store: MinHashStore,
    id_col: str,
    text_col: str,
    out_path: str,
    checkpoint_location: str,
    threshold: float = 0.7,
    max_bucket_size: int = 1000,
    trigger_seconds: int | None = None,
    on_batch: Callable[[int, int, int], None] | None = None,
) -> StreamingQuery:
    """Continuous-ingest near-dup filtering: each micro-batch is probed
    against the persisted store, survivors land in ``out_path`` and join
    the store, so every later batch is deduped against EVERYTHING kept
    so far — the streaming closure of :meth:`MinHashStore.probe`.

    Per batch: (1) probe -> near-dup pairs; (2) losers = batch docs that
    cross-dup a stored doc, plus non-canonical members (min-id survives)
    of batch-internal clusters via :func:`dff.cluster.connected_components`
    — transitive chains THROUGH a dropped doc are accepted, the standard
    pair-graph semantic; (3) survivors overwrite their own
    ``__batch=<id>`` partition of ``out_path`` (dynamic partition
    overwrite -> redelivered batches replace themselves: the SINK is
    exactly-once); (4) survivors enter the store; (5) an ``_ingested``
    marker commits the batch.

    Crash-window semantics (between survivor write and marker): the
    redelivered batch re-probes and recomputes the IDENTICAL survivor set
    — duplicate store rows from a half-done ``add`` cannot change it,
    because loser extraction is semi-join/distinct shaped — rewrites the
    same partition, and appends the signatures once more.  Store appends
    are therefore at-least-once (bounded: once per crash), which costs
    duplicate candidate rows in later probes but never changes any
    survivor set; the survivor OUTPUT stays exactly-once.

    First batch bootstraps the store (internal dedup only, then
    ``init``).  ``on_batch(batch_id, n_in, n_kept)`` is an optional
    observer hook for tests/metrics.
    """
    from .cluster import connected_components
    from .dedup import minhash_dedup_pairs

    os.makedirs(out_path, exist_ok=True)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        marker = os.path.join(out_path, f"_ingested_{batch_id}")
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        batch = batch.persist()
        n_in = batch.count()
        try:
            if store.exists():
                pairs = store.probe(
                    batch, id_col, text_col,
                    threshold=threshold, max_bucket_size=max_bucket_size,
                )
                cross_losers = (
                    pairs.where(F.col("cross"))
                    .select(
                        F.explode(F.array("id_a", "id_b")).alias(id_col)
                    )
                    .join(batch.select(id_col), id_col, "left_semi")
                )
                internal = pairs.where(~F.col("cross"))
            else:
                internal = minhash_dedup_pairs(
                    batch, id_col, text_col,
                    num_hashes=store.num_hashes, bands=store.bands,
                    k=store.k, threshold=threshold, seed=store.seed,
                    max_bucket_size=max_bucket_size,
                )
                cross_losers = None
            cc = connected_components(
                internal.select("id_a", "id_b"), "id_a", "id_b"
            )
            losers = cc.where(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
            if cross_losers is not None:
                losers = losers.unionByName(cross_losers)
            survivors = batch.join(
                losers.distinct(), id_col, "left_anti"
            ).persist()
            n_kept = survivors.count()

            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                (
                    survivors.withColumn("__batch", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .partitionBy("__batch")
                    .parquet(out_path)
                )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
            if n_kept:
                if store.exists():
                    store.add(survivors, id_col, text_col)
                else:
                    store.init(survivors, id_col, text_col)
            with open(marker, "w"):
                pass
            if on_batch is not None:
                on_batch(int(batch_id), n_in, n_kept)
            survivors.unpersist()
        finally:
            batch.unpersist()

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_location
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingested(spark: SparkSession, out_path: str) -> DataFrame:
    """The deduplicated, continuously-ingested corpus (all batches)."""
    return spark.read.parquet(out_path).drop("__batch")
