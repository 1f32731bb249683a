"""dff — a PySpark-native schema + constraint validation engine.

Re-expresses the rule-DAG semantics of the reference accelerator
(southworks/databricks-accelerator-fraud-orchestration, read at /root/reference) as
topologically-ordered, vectorized Catalyst expressions over DataFrames:

- ``dff.ruleset``    DMN / JSON rule-spec parsing -> Constraint DAG (topo order,
                     cycle check).  Reference: 02_dff_orchestration.py:68-144.
- ``dff.compiler``   DAG -> a single chained ``coalesce(when(...))`` verdict Column
                     (first-match-wins at a sensitivity threshold).
                     Reference: 02_dff_orchestration.py:215-250.
- ``dff.stats``      one-pass, skew-aware (salted) per-column statistics.
- ``dff.uniqueness`` hash-partitioned duplicate detection.
- ``dff.referential`` broadcast left-anti/semi referential checks.
- ``dff.drift``      PSI + binned KS + Jensen-Shannon drift vs a baseline snapshot
                     (array-HOF Catalyst expressions, one shuffle total).
- ``dff.checkpoint`` per-partition lineage + resume planning.
- ``dff.runner``     orchestration: validate -> verdicts/violations/metrics,
                     per-row multi-constraint attribution.
- ``dff.sources``    deterministic synthetic source-code table generator.
- ``dff.textops``    language-ID, quality scoring, token counting, fingerprinting.
- ``dff.dedup``      exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding dedup.
- ``dff.similarity`` brute-force and LSH/IVF approximate nearest-neighbor search,
                     persistable cell-partitioned IVF index with incremental adds.
- ``dff.asof``       as-of join (plain + skew-aware coarse-bucket realization).
- ``dff.rangejoin``  binned point-in-interval (inner/left) + interval-overlap joins.
- ``dff.streaming``  foreachBatch validation, watermarked window aggs, event-time
                     sessions, bounded-state dedup, exactly-once incremental rollup.
- ``dff.tdigest``    from-scratch mergeable t-digest quantile sketches.
- ``dff.heavyhitters`` from-scratch mergeable Misra-Gries frequent items.
- ``dff.sampling``   deterministic content-hash sampling: fraction,
                     stratified, exactly-n-per-group (engine-portable).
- ``dff.cluster``    duplicate-cluster closure: alternating-star connected
                     components + canonical-survivor dedup.
- ``dff.diff``       snapshot diff: added/removed/changed via payload-free
                     signature join.
- ``dff.contamination`` benchmark decontamination: broadcast n-gram
                     overlap vs a held-out eval set.
- ``dff.model``      distributed GBT scorer (train/CV/AUC) + DAG integration.
- ``dff.multimodal`` binary media columns: schema + Arrow-batched decode plumbing.
- ``dff.incremental`` persisted MinHash store: probe/ingest new batches without
                     re-LSH-ing the corpus; streaming ingest closure.
- ``dff.maintenance`` small-file compaction with crash-safe staged swap.
- ``dff.outliers``   data-derived anomaly constraints: per-group z-score and
                     IQR/Tukey fences (exact or t-digest), broadcast bounds.
- ``dff.relevance``  TF-IDF + Okapi BM25 lexical relevance; tokens shuffle,
                     text never does; query-term stats broadcast.
- ``dff.layout``     Z-order (Morton) clustering + per-file min/max skipping
                     stats: multi-column scan pruning, pure Catalyst bit ops.
- ``dff.hll``        persisted mergeable HyperLogLog rollups (DataSketches):
                     incremental distinct counts from kilobyte sketch rows.
- ``dff.repair``     null repair: per-group mean/median/constant imputation
                     with audit flag; broadcast fills, map-only fact side.
- ``dff.fd``         functional-dependency constraints (A -> B): violations
                     found over map-side-compressed distinct pairs.
- ``dff.bloom``      expression-level Bloom filter (xxhash64 k-probe, packed
                     longs); referential pre-filter emitting definite orphans
                     map-side before the exact anti-join.
- ``dff.vectorize``  signed feature-hashing document vectors (no vocabulary
                     state, pure Catalyst); feeds the ANN/near-dup stack.
- ``dff.projection`` persistable PCA basis for embedding columns (pyspark.ml
                     + array plumbing); recall-measured dim reduction for ANN.
- ``dff.env``        host-environment session helpers (capacity-gated tmpfs spill).
- ``dff.tablefmt``   native log-structured table format: snapshots, branches
                     (WAP), hidden partitioning, MOR deletes, schema/spec
                     evolution, CDC feed, CHECK constraints, streaming source.
- ``dff.cdc``        change-data-feed replication consumer (idempotent apply).
- ``dff.scd``        SCD type-2 interval builder.
- ``dff.fuzzy``      edit-distance self-join (FastSS deletion neighborhoods).
- ``dff.statsvalidate`` stats-only validation: manifest min/max/null decide
                     files without scanning; only undecidable pairs scanned.
- ``dff.mixing``     token-budget corpus mixture: weight spec + budget ->
                     per-domain rates; epoch-explode upsampling, map-only.
- ``dff.packing``    sequence packing: sharded deterministic shuffle + one
                     running-sum window lays docs into fixed-len contexts.
- ``dff.semdedup``   SemDeDup semantic dedup: IVF cells + per-cell blocked
                     BLAS upper-triangular cosine drop rule.

Everything hot-path is pyspark.sql expressions (whole-stage codegen); Python
appears only inside Arrow-batched pandas UDFs. No per-row Python anywhere.
"""

__version__ = "0.1.0"
