"""End-to-end Write-Audit-Publish ingest (jobs/wap_ingest.py): the rule
DAG audits a branch delta and gates the publish — a failing batch never
becomes visible on main, and its violations are written for triage."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
    ),
)

from dff.sources import synthetic_source_files  # noqa: E402
from dff.tablefmt import Table  # noqa: E402


def _run_wap(t_root, src, **kw):
    import wap_ingest

    argv = ["--table", t_root, "--src", src, "--parallelism", "4"]
    for k, v in kw.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    return wap_ingest.main(argv)


@pytest.fixture()
def staged(spark, tmp_path):
    base = synthetic_source_files(spark, 3000, n_repos=40, seed=1)
    good = synthetic_source_files(spark, 1000, n_repos=40, seed=2)
    base_p, good_p = str(tmp_path / "base"), str(tmp_path / "good")
    base.write.parquet(base_p)
    good.write.parquet(good_p)
    return base_p, good_p, str(tmp_path / "tbl")


def test_green_audit_publishes(spark, staged, tmp_path):
    base_p, good_p, t_root = staged
    r0 = _run_wap(t_root, base_p, max_violation_rate="1.0", branch="b0")
    assert r0["published"] and r0["version"] is not None
    n0 = Table(t_root).scan(spark).count()
    r1 = _run_wap(t_root, good_p, max_violation_rate="1.0", branch="b1")
    assert r1["published"]
    t = Table(t_root)
    assert t.scan(spark).count() == n0 + r1["rows"]
    assert t.list_branches() == []  # published branches are cleaned up
    assert t.history()[-1]["operation"] == "publish"


def test_red_audit_never_publishes(spark, staged, tmp_path):
    base_p, good_p, t_root = staged
    _run_wap(t_root, base_p, max_violation_rate="1.0", branch="b0")
    t = Table(t_root)
    n0 = t.scan(spark).count()
    files0 = {e["path"] for e in t.entries()}
    # corrupt the batch: every lang NULL -> the built-in rules fire
    bad = spark.read.parquet(good_p).withColumn(
        "lang", F.lit(None).cast("string")
    )
    bad_p = str(tmp_path / "bad")
    bad.write.parquet(bad_p)
    viol_p = str(tmp_path / "viol")
    r = _run_wap(
        t_root, bad_p, max_violation_rate="0.0", branch="b1",
        violations=viol_p,
    )
    assert not r["published"] and r["violations"] > 0
    assert t.scan(spark).count() == n0  # main bit-identical
    assert {e["path"] for e in t.entries()} == files0
    assert t.list_branches() == []  # rejected branch dropped
    assert spark.read.parquet(viol_p).count() == r["violations"]
    assert json.loads(json.dumps(r))  # summary is one JSON-able dict
