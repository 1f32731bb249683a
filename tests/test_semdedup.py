"""Semantic dedup: planted duplicates dropped, earlier-id survivor kept,
the upper-triangular rule, cap exemption, and the empty self-check gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dff.semdedup import semantic_dedup, semantic_dedup_violations


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic pseudo-random direction per i (components in [-1, 1]
    # via the classic fract(sin) hash) — pairwise cosines are well spread,
    # so only PLANTED copies can exceed a 0.999 threshold
    raw = []
    for j in range(dim):
        x = math.sin(i * 12.9898 + j * 78.233) * 43758.5453
        raw.append((x - math.floor(x)) * 2.0 - 1.0)
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


@pytest.fixture(scope="module")
def emb(spark):
    rows = []
    for i in range(300):
        if i % 10 == 3:
            v = _vec(i - 1)  # exact copy of the previous doc's vector
        else:
            v = _vec(i)
        rows.append((i, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_planted_duplicates_dropped(emb):
    out = semantic_dedup(emb, "vec_id", "embedding", threshold=0.999, n_centroids=4)
    verdict = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert len(verdict) == 300  # every doc gets a verdict
    for i in range(300):
        if i % 10 == 3:
            # identical vector to doc i-1 -> same cell guaranteed -> dropped
            assert verdict[i] is False, i
            assert verdict[i - 1] is True, i - 1  # the earlier twin survives
    # only the planted copies are identical at threshold 0.999... others may
    # collide if directions are close; at minimum all 30 planted drop
    assert sum(1 for v in verdict.values() if not v) >= 30


def test_upper_triangular_rule_and_cap(emb):
    out = semantic_dedup(emb, "vec_id", "embedding", threshold=0.999, n_centroids=4)
    assert out.where(F.col("cell_capped")).count() == 0
    # cap = 1: every cell exceeds it -> everything kept + flagged
    capped = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.999, n_centroids=4, max_cell_size=1
    )
    assert capped.where(~F.col("kept")).count() == 0
    assert capped.where(~F.col("cell_capped")).count() == 0


def test_self_check_gate_empty(emb):
    v = semantic_dedup_violations(
        emb, "vec_id", "embedding", threshold=0.999, n_centroids=4
    )
    assert v.count() == 0


def test_validation(emb):
    with pytest.raises(ValueError):
        semantic_dedup(emb, "vec_id", "embedding", threshold=0.0)
    with pytest.raises(ValueError):
        semantic_dedup(emb, "vec_id", "embedding", threshold=1.5)
