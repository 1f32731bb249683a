"""Connected components (alternating star) + canonical-survivor dedup.

Oracle: a driver-side union-find replays every fixture; the gate queries
(`dup_clusters`, `dedup_survivors`) additionally replay the full pipeline
against a DuckDB recursive CTE at sf0.01.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dff.cluster import canonical_survivors, connected_components


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _assignments(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(20260817)
    nodes = list(range(240))
    edges = [
        (rng.randrange(240), rng.randrange(240)) for _ in range(260)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(nodes, edges)

    edf = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id bigint")
    got = _assignments(
        connected_components(edf, nodes=ndf, node_col="doc_id")
    )
    assert got == expected  # includes isolated nodes as singletons


def test_long_chain_converges_logarithmically(spark):
    # a 600-link path: label propagation would need ~600 rounds; the
    # alternating star must finish inside 12 (O(log^2 n) bound)
    n = 600
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    got = _assignments(connected_components(edf, max_iter=12))
    assert got == {i: 0 for i in range(n)}


def test_string_ids_and_duplicate_reversed_edges(spark):
    edf = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("b", "c"), ("x", "y"), (None, "z"), ("q", "q")],
        "id_a string, id_b string",
    )
    got = _assignments(connected_components(edf))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # null endpoints and self-loops contribute nothing ("z"/"q" absent
    # unless passed via nodes=)


def test_canonical_survivors_removes_cluster_losers_only(spark):
    df = spark.createDataFrame(
        [(i, f"text{i}") for i in range(10)], "doc_id bigint, text string"
    )
    # clusters {1,3,5} and {2,8}; others untouched
    pairs = spark.createDataFrame(
        [(3, 1), (3, 5), (8, 2)], "id_a bigint, id_b bigint"
    )
    kept = sorted(
        r["doc_id"] for r in canonical_survivors(df, pairs, "doc_id").collect()
    )
    assert kept == [0, 1, 2, 4, 6, 7, 9]


def test_best_survivors_keeps_highest_score_with_id_tiebreak(spark):
    from dff.cluster import best_survivors

    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate([9, 5, 7, 8, 1, 8, 3, 2, 7, 4])],
        "doc_id bigint, quality double",
    )
    # cluster {1,3,5}: scores 5/8/8 -> tie between 3 and 5, min id 3 wins;
    # cluster {2,8}: scores 7/7 -> tie, min id 2 wins; others untouched
    pairs = spark.createDataFrame(
        [(3, 1), (3, 5), (8, 2)], "id_a bigint, id_b bigint"
    )
    kept = sorted(
        r["doc_id"]
        for r in best_survivors(df, pairs, "doc_id", "quality").collect()
    )
    assert kept == [0, 2, 3, 4, 6, 7, 9]


def test_best_survivors_prefers_score_over_min_id(spark):
    from dff.cluster import best_survivors

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "doc_id bigint, quality double"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a bigint, id_b bigint")
    kept = [
        r["doc_id"]
        for r in best_survivors(df, pairs, "doc_id", "quality").collect()
    ]
    assert kept == [2]  # canonical_survivors would keep 0


def test_empty_edges_and_validation(spark):
    edf = spark.createDataFrame([], "id_a bigint, id_b bigint")
    ndf = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    got = _assignments(connected_components(edf, nodes=ndf, node_col="doc_id"))
    assert got == {1: 1, 2: 2}
    with pytest.raises(ValueError, match="node_col"):
        connected_components(edf, nodes=ndf)


def test_nonconvergence_raises(spark):
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(2000)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edf, max_iter=1)
