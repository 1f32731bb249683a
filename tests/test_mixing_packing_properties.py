"""Property-based invariants for mixture sampling and sequence packing
(hypothesis): random weight specs, budgets, and token distributions must
never break the structural contracts the oracle gates rely on.

Spark jobs are expensive per example, so the strategy space is kept
small (max_examples=8, tiny frames) and deadline checking is off — the
point is randomized STRUCTURE (weights that don't sum to 1, missing
domains, zero budgets, adversarial token sizes), not volume.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dff.mixing import mixture_plan, mixture_sample
from dff.packing import pack_sequences

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _grab_spark(spark):
    # hypothesis @given can't take pytest fixtures as strategy args;
    # stash the session for the property bodies
    global _spark
    _spark = spark
    yield


_weights = st.dictionaries(
    st.sampled_from(["a", "b", "c", "zz"]),  # zz never occurs in the data
    st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(weights=_weights, budget_frac=st.integers(min_value=0, max_value=3))
def test_mixture_plan_and_sample_invariants(weights, budget_frac):
    df = _spark.range(0, 600).select(
        "id",
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("dom"),
        ((F.col("id") % 50) + 1).cast("long").alias("tok"),
    )
    total = df.agg(F.sum("tok")).collect()[0][0]
    budget = int(total) * budget_frac // 2  # 0x, 0.5x, 1x, 1.5x of the pool
    plan = mixture_plan(df, "dom", "tok", weights, budget)
    # plan only covers present, positively-weighted domains
    assert all(d in {"a", "b", "c"} and weights.get(d, 0) > 0 for d in plan)
    # renormalized weights sum to 1 over the plan
    if plan:
        assert sum(s.weight for s in plan.values()) == pytest.approx(1.0)
    for s in plan.values():
        assert 0.0 <= s.rate <= 4.0
        assert s.epochs_full == int(s.rate // 1)
        assert 0.0 <= s.frac < 1.0
    out = mixture_sample(df, "dom", ["id"], plan, seed=9)
    got = {
        r["dom"]: r for r in out.groupBy("dom").agg(
            F.count(F.lit(1)).alias("n"), F.max("epoch").alias("maxe")
        ).collect()
    }
    # no rows from unplanned domains; epochs bounded by the plan's copies
    assert set(got) <= set(plan)
    for d, r in got.items():
        assert r["maxe"] <= plan[d].copies - 1
    # full epochs are complete: every planned domain with epochs_full >= 1
    # contributes at least domain_size rows
    sizes = {
        r["dom"]: r["n"]
        for r in df.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for d, s in plan.items():
        if s.epochs_full >= 1:
            assert got[d]["n"] >= sizes[d] * s.epochs_full


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seq_len=st.integers(min_value=1, max_value=500),
    n_shards=st.integers(min_value=1, max_value=9),
    tok_mod=st.integers(min_value=1, max_value=700),
)
def test_packing_stream_invariants(seq_len, n_shards, tok_mod):
    df = _spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % tok_mod)).cast("long").alias("tokens"),  # incl. zeros
    )
    out = pack_sequences(
        df, "tokens", seq_len, ["doc_id"], n_shards=n_shards, seed=2
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        assert r["tokens"] > 0  # zero-token rows dropped
        assert 0 <= r["shard"] < n_shards
        assert r["ctx_id"] == r["start_off"] // seq_len
        assert r["ctx_off"] == r["start_off"] % seq_len
        last = r["start_off"] + r["tokens"] - 1
        assert r["n_ctx"] == last // seq_len - r["ctx_id"] + 1 >= 1
        by_shard.setdefault(r["shard"], []).append((r["start_off"], r["tokens"]))
    # every shard's stream is gapless from offset 0
    for items in by_shard.values():
        pos = 0
        for start, tok in sorted(items):
            assert start == pos
            pos += tok
