"""Local stand-in for the driver's correctness gate: run queries() on Spark
and oracle_sql() on DuckDB at sf0.01, compare row count / schema / values.

Usage: python tools/check_oracle.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unit-insensitive timestamps: Spark toPandas yields datetime64[ns],
        # DuckDB fetchdf datetime64[us]; comparing raw asi8 across units
        # reads lossless-identical instants as different (the driver hash
        # canonicalizes, so unit is not part of parity)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    failures = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only) -> spark rows "
                  f"{qs[name](spark, SF_DIR).count()}")
            continue
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        s, o = normalize(sdf), normalize(odf)
        rows_ok = len(s) == len(o)
        # driver parity: compare column NAMES and VALUES; exact width
        # (int32 vs int64, timestamp unit) is not part of the driver hash —
        # but int-vs-float IS: DuckDB HUGEINT sums fetchdf as float64 and
        # the driver hashes 5 != 5.0 (CORRECTNESS_r04 json_extract_stats /
        # batch_sessions). Flag that class here so local green predicts
        # driver green.
        schema_ok = list(s.columns) == list(o.columns)
        vals_ok = False
        detail = ""
        if rows_ok and schema_ok:
            kind_bad = [
                c for c in s.columns
                if {s[c].dtype.kind, o[c].dtype.kind} == {"i", "f"}
            ]
            if kind_bad:
                detail = (
                    f"int-vs-float dtype divergence on {kind_bad} "
                    "(DuckDB HUGEINT sum? CAST(... AS BIGINT) in the oracle)"
                )
            else:
                try:
                    pd.testing.assert_frame_equal(
                        s, o, check_dtype=False, check_exact=False, rtol=1e-9
                    )
                    vals_ok = True
                except AssertionError as e:
                    detail = str(e).splitlines()[0]
        status = "OK" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} rows={rows_ok}({len(s)}/{len(o)}) "
              f"schema={schema_ok} values={vals_ok}")
        if not schema_ok:
            print(f"  spark  cols: {[(c, str(s[c].dtype)) for c in s.columns]}")
            print(f"  oracle cols: {[(c, str(o[c].dtype)) for c in o.columns]}")
        elif not vals_ok and rows_ok:
            print(f"  {detail}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
