from __future__ import annotations

from dff.ruleset import parse_json
from dff.runner import ValidationConfig, ValidationRunner
from dff.sources import synthetic_source_files
from dff.streaming import validate_stream

SPEC = {
    "version": "s1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "C_null_lang", "name": "lang is null", "requires": []},
        {"id": "C_empty", "name": "length(content) = 0", "requires": ["C_null_lang"]},
    ],
}


def test_stream_batches_match_batch_run(spark, tmp_path):
    src = synthetic_source_files(spark, 3000, n_repos=50)
    src_path = str(tmp_path / "src")
    src.write.mode("overwrite").parquet(src_path)

    cfg = ValidationConfig(ruleset=parse_json(SPEC), unique_keys=None)
    runner = ValidationRunner(cfg)

    collected: list[tuple] = []

    def sink(violations, batch_id):
        collected.extend(
            (r["repo"], r["path"], r["commit"], r["constraint_id"])
            for r in violations.collect()
        )

    stream = (
        spark.readStream.schema(spark.read.parquet(src_path).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_path)
    )
    q = validate_stream(stream, runner, sink, str(tmp_path / "sck"))
    q.awaitTermination(120)

    batch_df = spark.read.parquet(src_path)
    batch = runner.validate(batch_df, persist_violations=False)
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["constraint_id"])
        for r in batch.violations.collect()
    )
    assert sorted(collected) == want and len(want) > 0
