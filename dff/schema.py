"""Expected schemas + schema-conformance check (constraint #0).

The reference trusts an inferred schema everywhere downstream
(/root/reference/01_dff_model.py:57, ``inferSchema=true``); our engine makes
the expected schema explicit and validates it against the physical table
before rule compilation (SURVEY.md §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: The north-star input table (BASELINE.json input_hint):
#: Iceberg table of source-code repositories.
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), nullable=False),
        T.StructField("path", T.StringType(), nullable=False),
        T.StructField("commit", T.StringType(), nullable=False),
        T.StructField("lang", T.StringType(), nullable=True),
        T.StructField("content", T.StringType(), nullable=True),
    ]
)

#: Dimension tables (FIXTURES.md F4).
COMMITS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), nullable=False),
        T.StructField("commit", T.StringType(), nullable=False),
    ]
)
LANGS_SCHEMA = T.StructType([T.StructField("lang", T.StringType(), nullable=False)])


@dataclass(frozen=True)
class SchemaViolation:
    column: str
    kind: str       # "missing" | "type_mismatch" | "unexpected"
    expected: str | None
    actual: str | None


def check_schema(
    df: DataFrame,
    expected: T.StructType,
    allow_extra: bool = True,
) -> list[SchemaViolation]:
    """Compare a DataFrame schema against the declared StructType.

    Nullability is advisory (parquet round-trips often relax it), so only
    names and types are enforced.  Returns [] when conformant.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out: list[SchemaViolation] = []
    for f in expected.fields:
        want = f.dataType.simpleString()
        if f.name not in actual:
            out.append(SchemaViolation(f.name, "missing", want, None))
        elif actual[f.name] != want:
            out.append(SchemaViolation(f.name, "type_mismatch", want, actual[f.name]))
    if not allow_extra:
        expected_names = {f.name for f in expected.fields}
        for name, typ in actual.items():
            if name not in expected_names:
                out.append(SchemaViolation(name, "unexpected", None, typ))
    return out


def assert_schema(df: DataFrame, expected: T.StructType) -> None:
    violations = check_schema(df, expected)
    if violations:
        raise ValueError(f"schema check failed: {violations}")
