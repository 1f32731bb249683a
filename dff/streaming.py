"""Structured Streaming surface: foreachBatch incremental validation,
watermarked event-time violation windows, and a stateful session operator.

The reference scores request/response single records
(/root/reference/02_dff_orchestration.py:311-341, widget-driven) — there is
no true streaming there (SURVEY.md §2.6).  Our engine's incremental story is
checkpoint/resume; this module adds the optional streaming surface:

- :func:`validate_stream` — each micro-batch flows through the SAME compiled
  rule DAG (one vectorized select) and appends violations + checkpoint rows,
  so batch and streaming share one code path.
- :func:`windowed_violation_counts` — a streaming-NATIVE plan
  (readStream -> rule select -> withWatermark -> window groupBy): per
  event-time window per constraint violation counts, late data beyond the
  watermark dropped by the engine, state bounded by the watermark.
- :func:`sessionize_events` — custom stateful operator via
  ``applyInPandasWithState``: per-key session assembly with gap timeout,
  the Arrow-batched stand-in for any reference operator Spark lacks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .runner import ValidationRunner


def validate_stream(
    stream_df: DataFrame,
    runner: ValidationRunner,
    sink: Callable[[DataFrame, int], None],
    checkpoint_location: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Attach the validation engine to a streaming DataFrame.

    ``sink(violations_df, batch_id)`` receives each micro-batch's violation
    rows (already tagged with constraint ids).  Exactly-once is inherited
    from foreachBatch + the stream checkpoint; the engine's own lineage
    table is idempotent per (snapshot, partition, dag_version) on top.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = runner.row_verdicts(batch_df)
        violations = runner.violations(batch_df, verdicts)
        sink(violations, batch_id)

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_location
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_violation_counts(
    stream_df: DataFrame,
    runner: ValidationRunner,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Streaming-native windowed rollup of rule violations with late-data
    handling — no foreachBatch, so Spark manages the aggregation state.

    Plan: rule select (map-only, same compiled DAG as batch) ->
    ``withWatermark`` -> tumbling-``window`` groupBy count.  Events later
    than ``watermark_delay`` behind the max seen event time are DROPPED by
    the engine (asserted in tests), and window state older than the
    watermark is evicted — bounded state at unbounded runtime, which is
    what makes this shape safe on an infinite source.

    Returns an unstarted streaming DataFrame:
    ``(window struct, verdict_id, n)``; attach ``.writeStream`` (append
    output mode works because the watermark closes windows).
    """
    verdicts = stream_df.select(
        F.col(ts_col), runner_compiled_verdict_id(runner, stream_df).alias("verdict_id")
    )
    return (
        verdicts.where(F.col("verdict_id").isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration), "verdict_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def event_time_sessions(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Event-time gap sessionization via ``session_window`` — the
    DETERMINISTIC counterpart to ``sessionize_events``'s processing-time
    state (VERDICT r03 #8): a replay of the same input yields the same
    sessions, so it sits under the driver's oracle gate.

    Two events of a key belong to one session iff they are < ``gap``
    apart; the session spans [first event, last event + gap).  Watermark
    bounds state (sessions whose end falls behind it finalize + evict), so
    the shape is safe on an unbounded source; in append output mode only
    finalized sessions emit — on an ``availableNow`` replay that is every
    session whose end <= max event time, which an oracle reproduces with
    a plain gaps-and-islands SQL plus that cutoff.

    Returns an unstarted streaming DataFrame:
    ``(*key_cols, session_window struct, n_events)``.
    """
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols, F.session_window(ts_col, gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def runner_compiled_verdict_id(runner: ValidationRunner, df: DataFrame):
    """The rule DAG's first-violated-constraint column for ``df`` (streaming
    or batch — compilation is schema-driven and source-agnostic)."""
    from .compiler import compile_ruleset

    cfg = runner.config
    return compile_ruleset(cfg.ruleset, df, cfg.scorers).verdict_id


def incremental_rollup(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_location: str,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Continuously-maintained daily rollup (the "hypertable rollup" /
    continuous-aggregate pattern): each micro-batch appends its ALGEBRAIC
    partials (count, sum) per (day, keys) to a partial-aggregate table;
    :func:`read_rollup` folds partials into the final aggregate at read.

    Exactly-once without transactions: partials are partitioned by
    ``(__day, __batch_id)`` and written with DYNAMIC partition overwrite —
    a retried batch (foreachBatch may re-deliver after a crash) REPLACES
    its own partitions instead of double-counting, and never touches other
    batches' partitions.  At 10^12 rows the per-batch work is one map-side
    combine + a tiny shuffle of (days x keys) partials; the read-side fold
    is over partial rows, not events.  Compact by periodically rewriting
    old days' partials into one batch partition (same idempotent shape).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.groupBy(
                F.to_date(F.col(ts_col)).alias("__day"), *key_cols
            )
            .agg(
                F.count(F.lit(1)).alias("partial_n"),
                F.sum(value_col).alias("partial_sum"),
            )
            .withColumn("__batch_id", F.lit(batch_id))
        )
        delta.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("__day", "__batch_id").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark, out_path: str, key_cols: list[str]) -> DataFrame:
    """Fold the partial-aggregate table into the final daily rollup."""
    return (
        spark.read.parquet(out_path)
        .groupBy("__day", *key_cols)
        .agg(
            F.sum("partial_n").alias("n"),
            F.sum("partial_sum").alias("sum_value"),
        )
        .withColumnRenamed("__day", "day")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark_delay: str = "1 hour",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Watermarked stream-stream inner join: right events on the same key
    whose event time falls in ``[left_ts + lower, left_ts + upper]``.

    Both sides carry a watermark and the join condition bounds the two
    event times against each other, which is exactly what lets Spark evict
    buffered rows: state per side is bounded by ``watermark_delay`` +
    the interval width, not by the stream length.  Without the time-range
    conjunct the engine must buffer both streams forever — the classic
    stream-join scale trap this helper makes unrepresentable.

    Column collisions outside ``key_cols`` get ``suffixes``.  ``left_ts``
    / ``right_ts`` must be TIMESTAMP (cast TIMESTAMP_NTZ upstream).
    """
    lsfx, rsfx = suffixes
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    shared = (set(lw.columns) & set(rw.columns)) - set(key_cols)
    for c in shared:
        lw = lw.withColumnRenamed(c, f"{c}{lsfx}")
        rw = rw.withColumnRenamed(c, f"{c}{rsfx}")
    lts = f"{left_ts}{lsfx}" if left_ts in shared else left_ts
    rts = f"{right_ts}{rsfx}" if right_ts in shared else right_ts
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(rts) >= F.col(lts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, "inner")
    for k in key_cols:  # keep one copy of each join key
        joined = joined.drop(rw[k])
    return joined


def dedup_stream(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keyed on ``keys``.

    A plain ``dropDuplicates`` on a stream accumulates every key seen
    forever (state grows without bound on an infinite source); the
    within-watermark variant evicts key state once the event time passes
    ``watermark_delay``, so duplicates arriving within the delay are
    suppressed and state size is bounded by the watermark window — the
    streaming twin of :func:`dff.dedup.dedup_exact` for at-least-once
    ingestion (e.g. replayed Kafka partitions or re-delivered files).
    ``ts_col`` must be TIMESTAMP (cast TIMESTAMP_NTZ upstream)."""
    return stream_df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts_ms", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def sessionize_events(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-key session assembly via ``applyInPandasWithState`` — the custom
    stateful-operator escape hatch (Arrow-batched, GroupState + processing-
    time timeout) for semantics Spark's built-in operators can't express.

    Emits one row per key per trigger with the running session
    (``closed=false``) or the final session when the state times out after
    ``gap_minutes`` of silence (``closed=true``).  State is three longs per
    key — bounded by keys, not by events.
    """
    import pandas as pd  # local: executors import lazily inside the worker

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "closed": [True],
                }
            )
            return
        n, first_ms, last_ms = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            # normalize to ns first: Arrow may hand datetime64[us] batches
            ts_ms = (
                pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).to_numpy()
            n += len(ts_ms)
            first_ms = int(min(first_ms, ts_ms.min())) if first_ms is not None else int(ts_ms.min())
            last_ms = int(max(last_ms, ts_ms.max())) if last_ms is not None else int(ts_ms.max())
        state.update((n, first_ms, last_ms))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                "closed": [False],
            }
        )

    return (
        stream_df.select(F.col(key_col).alias("user_id"), F.col(ts_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_to_table(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_files: int | None = None,
    mode: str = "append",
    key_cols: list[str] | None = None,
) -> StreamingQuery:
    """Exactly-once streaming sink into the native table format
    (:class:`dff.tablefmt.Table`): every micro-batch lands as ONE atomic
    snapshot commit carrying ``idempotency_key = stream-batch-{id}``, so
    the crash window foreachBatch leaves open (batch committed, streaming
    checkpoint not yet advanced -> Spark redelivers the same batch id) is
    closed by the table's commit log itself — the replay finds its key
    committed and no-ops.  Downstream consumers tail the table with
    ``scan_added`` per snapshot, making the whole chain incremental:
    stream -> atomic table commits -> incremental validation
    (``jobs/validate.py --table-input --since``).

    The table is created from the first batch's schema if absent; later
    batches append under the committed schema (mismatched columns raise,
    as in batch appends).

    ``mode="upsert"`` (requires ``key_cols``) is the streaming CDC-apply
    path: each micro-batch lands as a merge-on-read MERGE — a tombstone
    file on the batch keys plus the batch rows, the TARGET never read —
    under the same idempotency key, so updates are exactly-once too.  A
    batch must carry at most one row per key (pre-aggregate a raw change
    stream to last-change-per-key upstream; redundant deliveries of the
    whole batch are the part this sink de-duplicates).
    """
    from .tablefmt import CommitConflict, Table

    if mode not in ("append", "upsert"):
        raise ValueError(f"mode must be 'append' or 'upsert', got {mode!r}")
    if mode == "upsert" and not key_cols:
        raise ValueError("mode='upsert' requires key_cols")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not Table.exists(table_root):
            try:
                Table.create(table_root, batch_df.schema)
            except (CommitConflict, FileExistsError):
                pass  # another delivery created it first
        key = f"stream-batch-{batch_id}"
        if mode == "upsert":
            Table(table_root).merge_upsert(
                batch_df.sparkSession,
                batch_df,
                list(key_cols),
                mode="mor",
                idempotency_key=key,
            )
        else:
            Table(table_root).append(
                batch_df, n_files=n_files, idempotency_key=key
            )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
