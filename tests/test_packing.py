"""Sequence packing: stream-layout invariants, boundary-crossing spans,
partition invariance, context fill accounting, and the one-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.packing import context_fill, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    # 5000 docs, 1..300 tokens each (deterministic), a few zero/NULL rows
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 97 == 0, None)
        .when(F.col("id") % 89 == 0, 0)
        .otherwise((F.col("id") * 37 % 300) + 1)
        .cast("long")
        .alias("tokens"),
    )


def test_stream_layout_is_gapless_per_shard(docs):
    out = pack_sequences(docs, "tokens", 128, ["doc_id"], n_shards=8, seed=4)
    rows = out.select("shard", "start_off", "tokens").collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["start_off"], r["tokens"]))
    assert len(by_shard) == 8
    for shard, items in by_shard.items():
        items.sort()
        pos = 0
        for start, tok in items:
            assert start == pos, f"gap in shard {shard}"  # exclusive cumsum
            pos += tok


def test_ctx_columns_consistent(docs):
    seq = 128
    out = pack_sequences(docs, "tokens", seq, ["doc_id"], n_shards=8, seed=4)
    for r in out.collect():
        assert r["ctx_id"] == r["start_off"] // seq
        assert r["ctx_off"] == r["start_off"] % seq
        last = r["start_off"] + r["tokens"] - 1
        assert r["n_ctx"] == last // seq - r["ctx_id"] + 1
    # with 300-token docs and seq 128, some must span >= 2 contexts
    assert out.where(F.col("n_ctx") >= 2).count() > 0
    # zero-token and NULL docs are dropped
    assert out.where(F.col("tokens").isNull() | (F.col("tokens") == 0)).count() == 0


def test_partition_invariant(docs):
    a = pack_sequences(docs, "tokens", 128, ["doc_id"], n_shards=8, seed=4)
    b = pack_sequences(
        docs.repartition(13), "tokens", 128, ["doc_id"], n_shards=8, seed=4
    )
    ka = sorted(map(tuple, a.select("doc_id", "shard", "start_off").collect()))
    kb = sorted(map(tuple, b.select("doc_id", "shard", "start_off").collect()))
    assert ka == kb


def test_context_fill_accounting(docs):
    seq = 128
    packed = pack_sequences(docs, "tokens", seq, ["doc_id"], n_shards=8, seed=4)
    fill = {
        (r["shard"], r["ctx_id"]): r
        for r in context_fill(packed, "tokens", seq).collect()
    }
    # clipped contributions never exceed the context size
    assert all(0 < r["tokens_started_here"] <= seq for r in fill.values())
    # total clipped tokens == total tokens minus carry-over into later
    # contexts; carry-over = sum over docs of (tokens - in_this)
    tot = packed.agg(F.sum("tokens")).collect()[0][0]
    clipped = sum(r["tokens_started_here"] for r in fill.values())
    carry = packed.select(
        F.sum(
            F.col("tokens") - F.least(F.col("tokens"), F.lit(seq) - F.col("ctx_off"))
        )
    ).collect()[0][0]
    assert clipped + carry == tot


def test_validation_and_plan(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "tokens", 0, ["doc_id"])
    with pytest.raises(ValueError):
        pack_sequences(docs, "tokens", 128, ["doc_id"], n_shards=0)
    out = pack_sequences(docs, "tokens", 128, ["doc_id"], n_shards=8, seed=4)
    physical = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange: the shard window; text/payload never reshuffles
    assert physical.count("Exchange") == 1
