from __future__ import annotations

import math

import numpy as np

from dff.drift import (
    CategoricalBins,
    DriftSpec,
    NumericBins,
    drift_by_partition,
    ks_binned,
    ks_exact,
    psi,
    snapshot,
)
from dff.sources import synthetic_source_files


def test_psi_hand_computed():
    # two bins: 50/50 -> 60/40; psi = (0.6-0.5)ln(0.6/0.5)+(0.4-0.5)ln(0.4/0.5)
    expected = np.array([50.0, 50.0])
    actual = np.array([60.0, 40.0])
    want = 0.1 * math.log(1.2) + (-0.1) * math.log(0.8)
    assert abs(psi(expected, actual) - want) < 1e-9
    assert psi(expected, expected) == 0.0


def test_ks_hand_computed_and_binned_close_to_exact():
    p = np.array([10.0, 20.0, 70.0])
    q = np.array([30.0, 30.0, 40.0])
    # cdfs: [.1,.3,1] vs [.3,.6,1] -> max diff .3
    assert abs(ks_binned(p, q) - 0.3) < 1e-12
    rng = np.random.default_rng(7)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(0.5, 1, 4000)
    edges = np.linspace(-4, 4.5, 60)
    ha = np.histogram(a, bins=edges)[0].astype(float)
    hb = np.histogram(b, bins=edges)[0].astype(float)
    # pad under/overflow buckets to match bucket_index convention
    ha = np.concatenate([[0.0], ha, [0.0]])
    hb = np.concatenate([[0.0], hb, [0.0]])
    assert abs(ks_binned(ha, hb) - ks_exact(a, b)) < 0.03


def _spec() -> DriftSpec:
    return DriftSpec(
        numeric=[
            NumericBins(
                column="content_length",
                edges=tuple(float(2**i) for i in range(4, 14)),
                expr="length(content)",
            )
        ],
        categorical=[
            CategoricalBins(
                column="lang",
                categories=("python", "java", "go", "ts", "rust", "c", "cpp"),
            )
        ],
    )


def test_drifted_partition_flagged(spark):
    spec = _spec()
    base_df = synthetic_source_files(
        spark, 20000, n_repos=100, plant_violations=False
    )
    baseline = snapshot(base_df, spec)
    assert all(v.sum() > 0 for v in baseline.values())

    cur = synthetic_source_files(
        spark, 20000, n_repos=100, plant_violations=False, drift_part=3
    )
    drift = drift_by_partition(cur, "part_id", spec, baseline).toPandas()
    lang_psi = drift[drift["column"] == "lang"].set_index("part_id")["psi"]
    assert lang_psi[3] > 0.2, lang_psi.to_dict()
    assert (lang_psi.drop(3) < 0.05).all(), lang_psi.to_dict()
    len_ks = drift[drift["column"] == "content_length"].set_index("part_id")["ks"]
    assert len_ks[3] > 0.15
    # per-partition sampling noise ~1/sqrt(1200); stay clearly below the flag
    assert (len_ks.drop(3) < 0.12).all()


def test_expr_drift_matches_pandas_reference(spark):
    """The Catalyst-expression PSI/KS must agree with the numpy reference
    realization term for term (same clipping/renormalization), including on
    empty and single-bucket-dominated partitions."""
    from pyspark.sql import functions as F

    from dff.drift import (
        drift_from_histograms,
        drift_from_histograms_pandas,
        partition_histograms,
    )

    spec = _spec()
    base_df = synthetic_source_files(spark, 8000, n_repos=50, plant_violations=False)
    baseline = snapshot(base_df, spec)
    cur = synthetic_source_files(
        spark, 8000, n_repos=50, plant_violations=False, drift_part=2
    )
    hist = partition_histograms(cur, "part_id", spec)
    got = (
        drift_from_histograms(hist, "part_id", spec, baseline)
        .toPandas()
        .sort_values(["part_id", "column"])
        .reset_index(drop=True)
    )
    want = (
        drift_from_histograms_pandas(hist, "part_id", spec, baseline)
        .toPandas()
        .sort_values(["part_id", "column"])
        .reset_index(drop=True)
    )
    assert list(got["part_id"]) == list(want["part_id"])
    assert list(got["column"]) == list(want["column"])
    assert np.allclose(got["psi"], want["psi"], rtol=0, atol=1e-9)
    assert np.allclose(got["ks"], want["ks"], rtol=0, atol=1e-9)
    assert np.allclose(got["js"], want["js"], rtol=0, atol=1e-9)
    # all-empty histogram row: both sides must agree (qt clamps to 1)
    empty = hist.limit(1).select(
        F.lit(99).alias("part_id"),
        *[
            F.lit(0).cast("long").alias(c)
            for c in hist.columns
            if c.startswith("h__")
        ],
    )
    ge = drift_from_histograms(empty, "part_id", spec, baseline).toPandas()
    we = drift_from_histograms_pandas(empty, "part_id", spec, baseline).toPandas()
    ge = ge.sort_values("column").reset_index(drop=True)
    we = we.sort_values("column").reset_index(drop=True)
    assert np.allclose(ge["psi"], we["psi"], atol=1e-9)
    assert np.allclose(ge["ks"], we["ks"], atol=1e-9)
    assert np.allclose(ge["js"], we["js"], atol=1e-9)


def test_js_divergence_properties():
    """JS is zero on identical distributions, symmetric, and bounded by
    ln 2 even on disjoint supports (where PSI explodes)."""
    from dff.drift import js_divergence

    rng = np.random.default_rng(7)
    a = rng.integers(1, 100, size=12).astype(np.float64)
    b = rng.integers(1, 100, size=12).astype(np.float64)
    assert js_divergence(a, a) < 1e-12
    assert abs(js_divergence(a, b) - js_divergence(b, a)) < 1e-12
    disjoint_p = np.array([100.0, 0.0, 0.0, 0.0])
    disjoint_q = np.array([0.0, 0.0, 0.0, 100.0])
    js = js_divergence(disjoint_p, disjoint_q)
    assert 0.0 < js <= np.log(2) + 1e-9


def test_drift_projection_is_shuffle_free(spark):
    """drift_from_histograms on top of the histogram agg must add NO extra
    Exchange: the whole per-partition drift plan contains exactly the one
    histogram-aggregation shuffle and no Python evaluation node."""
    from dff.drift import drift_from_histograms, partition_histograms

    spec = _spec()
    base_df = synthetic_source_files(spark, 2000, n_repos=20, plant_violations=False)
    baseline = snapshot(base_df, spec)
    hist = partition_histograms(base_df, "part_id", spec)
    drift = drift_from_histograms(hist, "part_id", spec, baseline)
    plan = drift._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert "FlatMapGroupsInPandas" not in plan and "EvalPython" not in plan, plan


def test_chi_square_numpy_and_distributed_agree(spark):
    import numpy as np
    from dff.drift import chi_square, chisq_drift

    rng = np.random.default_rng(7)
    cats = ["a", "b", "c", "d"]
    base = {c: int(n) for c, n in zip(cats, rng.integers(50, 200, 4))}
    cur_rows = [(c,) for c in rng.choice(cats, 500, p=[0.4, 0.3, 0.2, 0.1])]
    df = spark.createDataFrame(cur_rows, "cat string")
    got = chisq_drift(df, "cat", base).first()
    e = np.array([base[c] for c in cats], dtype=float)
    a = np.array(
        [sum(1 for (x,) in cur_rows if x == c) for c in cats], dtype=float
    )
    assert abs(got["chi2"] - chi_square(e, a)) < 1e-9
    assert got["dof"] == 3 and got["n"] == 500


def test_chi_square_missing_and_extra_categories(spark):
    import numpy as np
    from dff.drift import chi_square, chisq_drift

    # baseline has 'c' which vanished; current has 'x' absent from baseline
    base = {"a": 100, "b": 100, "c": 50}
    df = spark.createDataFrame(
        [("a",)] * 120 + [("b",)] * 80 + [("x",)] * 10, "cat string"
    )
    got = chisq_drift(df, "cat", base).first()
    e = np.array([100.0, 100.0, 50.0])
    a = np.array([120.0, 80.0, 0.0])  # 'x' skipped (no baseline evidence)
    # numpy twin rescales by the FULL actual total incl. 'x' rows? No:
    # chisq_drift's na includes only rows, and 'x' contributes to na.
    scaled = e * (210.0 / e.sum())
    want = float(np.sum((a - scaled) ** 2 / scaled))
    assert abs(got["chi2"] - want) < 1e-9
    assert got["dof"] == 2
    # identical distribution => statistic 0
    same = spark.createDataFrame([("a",)] * 10 + [("b",)] * 10, "cat string")
    assert chisq_drift(same, "cat", {"a": 10, "b": 10}).first()["chi2"] == 0.0


def test_auto_numeric_bins_equalize_mass(spark):
    import numpy as np
    import pytest
    from dff.drift import DriftSpec, auto_numeric_bins, snapshot

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    bins = auto_numeric_bins(e, "value", n_buckets=8)
    assert bins.n_buckets <= 9  # dedup may collapse; never more
    spec = DriftSpec(numeric=[bins])
    counts = snapshot(e, spec)["value"]
    n = counts.sum()
    # interior buckets hold ~1/8 of the mass each (GK approx tolerance)
    assert (np.abs(counts / n - 1.0 / 8) < 0.05).all(), counts
    # degenerate: constant column collapses to one edge, two buckets
    const = spark.createDataFrame([(1.0,)] * 50, "v double")
    b2 = auto_numeric_bins(const, "v", n_buckets=8)
    assert b2.edges == (1.0,)
    with pytest.raises(ValueError):
        auto_numeric_bins(e, "value", n_buckets=1)
    allnull = spark.createDataFrame([(None,), (None,)], "v double")
    with pytest.raises(ValueError):
        auto_numeric_bins(allnull, "v")
