"""Structured Streaming wrapper: incremental validation via foreachBatch.

The reference scores request/response single records
(/root/reference/02_dff_orchestration.py:311-341, widget-driven) — there is
no true streaming there (SURVEY.md §2.6).  Our engine's incremental story is
checkpoint/resume; this module adds the optional streaming surface: each
micro-batch flows through the SAME compiled rule DAG (one vectorized select)
and appends violations + checkpoint rows, so batch and streaming share one
code path.  Watermark/event-time aggregation can be layered on the verdicts
stream by callers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
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
