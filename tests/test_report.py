"""DAG dump + per-constraint hit report (reference reporting analog,
02_dff_orchestration.py:104-127,362-405)."""

from __future__ import annotations

from dff.report import constraint_totals, dag_text, render_report
from dff.ruleset import parse_json
from dff.runner import ValidationConfig, ValidationRunner
from dff.sources import synthetic_source_files

RULES = {
    "version": "report-v1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "C_null_lang", "name": "lang is null", "requires": []},
        {"id": "C_empty", "name": "length(content) = 0", "requires": ["C_null_lang"]},
        {"id": "C_never", "name": "length(content) > 999999999", "requires": ["C_empty"]},
    ],
}


def test_dag_text_topological_with_edges():
    rs = parse_json(RULES)
    txt = dag_text(rs)
    lines = txt.splitlines()
    assert "report-v1" in lines[0] and "0.7" in lines[0]
    # topo order preserved, edges rendered
    assert lines[1].strip().startswith("C_null_lang")
    assert "<- C_null_lang" in lines[2]
    assert "sql" in lines[1]


def test_hit_totals_and_report(spark):
    rs = parse_json(RULES)
    df = synthetic_source_files(spark, 3000, n_repos=50, seed=42)
    result = ValidationRunner(ValidationConfig(ruleset=rs)).validate(df)
    totals = {
        r["constraint_id"]: r["hits"]
        for r in constraint_totals(result.partition_metrics).collect()
    }
    # planted: id%983==7 null lang (minus overlap with bad_lang), id%977==13 empty
    assert totals["C_null_lang"] > 0
    assert totals["C_empty"] > 0
    assert totals["uniqueness"] > 0
    assert "C_never" not in totals
    report = render_report(rs, result.partition_metrics)
    assert "rule DAG 'report-v1'" in report
    assert "hits by constraint:" in report
    assert "C_never" in report.split("rules never triggered:")[1]
    assert "PARTITIONS FAILED" in report  # planted violations fail partitions
