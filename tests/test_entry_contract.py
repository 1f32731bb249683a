"""Mirror of the driver's correctness gate: every ``queries()`` entry runs on
Spark and (when an oracle exists) its ``oracle_sql()`` runs on DuckDB over the
same sf0.01 parquet tables; row-count + column names + order-insensitive
values must match."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: a total order even when outer-join NULLs mix None with
    # values in the same column (None < int raises TypeError otherwise)
    return sorted(
        (tuple(_canon(row[i]) for i in order) for row in rows), key=repr
    ), [cols[i] for i in order]


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ"
    s_ms, _ = _rows_to_multiset([c.lower() for c in spark_cols], spark_rows)
    d_ms, _ = _rows_to_multiset([c.lower() for c in duck_cols], duck_rows)
    assert len(s_ms) == len(d_ms), f"{name}: row count {len(s_ms)} vs {len(d_ms)}"
    mism = [i for i, (a, b) in enumerate(zip(s_ms, d_ms)) if a != b]
    assert not mism, f"{name}: first mismatch {s_ms[mism[0]]} vs {d_ms[mism[0]]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
