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
