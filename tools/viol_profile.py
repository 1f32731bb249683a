"""Split timing of the two violation branches at one parallelism.

Usage: python tools/viol_profile.py <parallelism> [data_path]
Times, over the persisted slim base:
  A. fused rule+referential explode (map-only branch)
  B. uniqueness groupBy(keys) branch (the only fact shuffle)
to localize which branch stops scaling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jobs.validate import DEFAULT_RULES, build_session  # noqa: E402
from dff.ruleset import parse_json  # noqa: E402
from dff.runner import ReferentialCheck, ValidationConfig, ValidationRunner  # noqa: E402
from dff.sources import commits_dim  # noqa: E402


def main() -> None:
    p = int(sys.argv[1])
    data = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_data", "scaling_16000000.parquet"))
    spark = build_session(p, app=f"violprof{p}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data)
    cfg = ValidationConfig(
        ruleset=parse_json(DEFAULT_RULES),
        referential=[ReferentialCheck(commits_dim(spark, 2000),
                                      ["repo", "commit"], "C_ref_commit",
                                      dim_is_distinct=True)],
    )
    runner = ValidationRunner(cfg)
    result = runner.validate(df)
    t = time.time()
    result.base.count()
    print(f"VIOL p={p} base_fill {time.time()-t:.1f}s", flush=True)
    t = time.time()
    result.base.count()
    print(f"VIOL p={p} base_recount {time.time()-t:.1f}s", flush=True)

    # branch A: fused rule+referential explode, no uniqueness
    cfg_a = ValidationConfig(ruleset=cfg.ruleset, referential=cfg.referential,
                             unique_keys=None)
    va = ValidationRunner(cfg_a).violations(
        result.base, result.base.select("repo", "path", "commit", "part_id",
                                        "verdict_id", "verdict"))
    t = time.time()
    n = va.count()
    print(f"VIOL p={p} branchA_fused {time.time()-t:.1f}s rows={n}", flush=True)

    # branch B: uniqueness groupBy alone
    t = time.time()
    n = (result.base.select("repo", "path", "commit", "part_id")
         .groupBy("repo", "path", "commit")
         .agg(F.count(F.lit(1)).alias("n"), F.max("part_id").alias("part_id"))
         .where(F.col("n") > 1).count())
    print(f"VIOL p={p} branchB_uniq {time.time()-t:.1f}s rows={n}", flush=True)

    # branch B': hash-compressed uniqueness (candidate optimization)
    t = time.time()
    dup_hashes = (result.base
                  .select(F.xxhash64("repo", "path", "commit").alias("h"))
                  .groupBy("h").count().where(F.col("count") > 1))
    n = dup_hashes.count()
    print(f"VIOL p={p} branchB_hash {time.time()-t:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
