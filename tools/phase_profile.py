"""Per-phase wall timing of the validation pipeline at one parallelism.

Usage: python tools/phase_profile.py <parallelism> [data_path]
Prints PHASE/TOTAL lines; used to find which stage stops scaling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.validate import DEFAULT_RULES, build_session  # noqa: E402
from dff.drift import CategoricalBins, DriftSpec, NumericBins, snapshot  # noqa: E402
from dff.ruleset import parse_json  # noqa: E402
from dff.runner import ReferentialCheck, ValidationConfig, ValidationRunner  # noqa: E402
from dff.sources import ALLOWED_LANGS, commits_dim  # noqa: E402


def main() -> None:
    p = int(sys.argv[1])
    data = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_data", "scaling_8000000.parquet"))
    spark = build_session(p, app=f"phaseprof{p}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data)
    dspec = DriftSpec(
        numeric=[NumericBins("content_length",
                             tuple(float(2**i) for i in range(4, 14)),
                             expr="length(content)")],
        categorical=[CategoricalBins("lang", tuple(ALLOWED_LANGS))],
    )
    t = time.time()
    baseline = snapshot(df.sample(0.05, seed=1), dspec)
    print(f"PHASE p={p} baseline {time.time()-t:.1f}s", flush=True)
    cfg = ValidationConfig(
        ruleset=parse_json(DEFAULT_RULES),
        referential=[ReferentialCheck(commits_dim(spark, 2000),
                                      ["repo", "commit"], "C_ref_commit",
                                      dim_is_distinct=True)],
        drift_spec=dspec, drift_baseline=baseline,
    )
    runner = ValidationRunner(cfg)
    t = time.time()
    warm = runner.validate(df.limit(20000), persist_violations=False)
    warm.violations.write.format("noop").mode("overwrite").save()
    warm.partition_metrics.collect()
    print(f"PHASE p={p} warmup {time.time()-t:.1f}s", flush=True)
    T0 = time.time()
    result = runner.validate(df)
    t = time.time()
    if result.base is not None:
        result.base.count()
    print(f"PHASE p={p} base_fill {time.time()-t:.1f}s", flush=True)
    t = time.time(); result.violations.count()
    print(f"PHASE p={p} viol_cachefill {time.time()-t:.1f}s", flush=True)
    t = time.time(); result.verdicts.write.format("noop").mode("overwrite").save()
    print(f"PHASE p={p} verdicts_write {time.time()-t:.1f}s", flush=True)
    t = time.time(); result.violations.write.format("noop").mode("overwrite").save()
    print(f"PHASE p={p} viol_write {time.time()-t:.1f}s", flush=True)
    t = time.time(); result.partition_metrics.collect()
    print(f"PHASE p={p} metrics {time.time()-t:.1f}s", flush=True)
    print(f"TOTAL p={p} {time.time()-T0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
