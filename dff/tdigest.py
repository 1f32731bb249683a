"""From-scratch mergeable t-digest (north rule: "t-digest quantiles").

The merging t-digest of Dunning & Ertl ("Computing extremely accurate
quantiles using t-digests", arXiv:1902.04023): centroids (mean, weight)
kept fine near the tails and coarse in the middle via the k1 scale
function ``k(q) = δ/2π · asin(2q−1)``; two digests merge by concatenating
centroid lists and re-compressing — the merge is associative enough that
partition-wise digests combine into an exact-memory-bounded global sketch.

Distributed shape (the point at 10^12 rows):

- stage 1 ``partition_digests``: ONE ``mapInPandas`` pass computes a digest
  per (input partition, group) — Arrow-batched numpy, no shuffle, output is
  a few hundred (mean, weight) pairs per digest;
- stage 2 ``merge_digests``: ``applyInPandas`` groups the TINY digest rows
  by key (n_partitions rows per key, kilobytes) and merges — so the
  shuffle carries sketches, never data, and a skewed key costs the same as
  a uniform one (this is the sketch-native alternative to salting);
- digests serialize as plain (array<double>, array<double>, min, max,
  count) columns — storable in the checkpoint lineage table, so
  INCREMENTAL profiles merge across snapshots without rescanning history.

``pyspark``'s own ``percentile_approx`` (Greenwald-Khanna) remains the
JVM-native default inside ``dff.stats.column_stats``; this module is the
custom-sketch escape hatch the brief calls for (novel sketch -> Arrow-
batched ``applyInPandas``), and the one to use when digests must be
persisted and re-merged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DELTA = 200


def _k(q: float, delta: float) -> float:
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _k_inv(k: float, delta: float) -> float:
    return (math.sin(2.0 * math.pi * k / delta) + 1.0) / 2.0


@dataclass
class TDigest:
    """A t-digest: sorted centroid means/weights + exact min/max/count."""

    means: np.ndarray
    weights: np.ndarray
    vmin: float
    vmax: float

    @property
    def count(self) -> float:
        return float(self.weights.sum()) if len(self.weights) else 0.0

    @staticmethod
    def of(values: np.ndarray, delta: int = DEFAULT_DELTA) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return TDigest(np.empty(0), np.empty(0), math.nan, math.nan)
        return _compress(v, np.ones(len(v)), float(v.min()), float(v.max()), delta)

    def merge(self, other: "TDigest", delta: int = DEFAULT_DELTA) -> "TDigest":
        if not len(self.means):
            return other
        if not len(other.means):
            return self
        return _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            min(self.vmin, other.vmin),
            max(self.vmax, other.vmax),
            delta,
        )

    def quantile(self, q: float) -> float:
        """Interpolated quantile: centroids anchor at their mid-cumulative
        rank; the extremes anchor at the EXACT min/max the digest carries."""
        if not len(self.means):
            return math.nan
        q = min(max(q, 0.0), 1.0)
        total = self.count
        t = q * total
        # anchor ranks: min at 0, each centroid at cum + w/2, max at total
        cum = np.concatenate([[0.0], np.cumsum(self.weights)])
        anchors_x = np.concatenate([[0.0], cum[:-1] + self.weights / 2.0, [total]])
        anchors_y = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return float(np.interp(t, anchors_x, anchors_y))


def _compress(
    means: np.ndarray, weights: np.ndarray, vmin: float, vmax: float, delta: int
) -> TDigest:
    order = np.argsort(means, kind="mergesort")
    m, w = means[order], weights[order]
    total = w.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    acc_m, acc_w = m[0], w[0]
    cum = 0.0  # weight fully emitted so far
    q_limit = _k_inv(_k(0.0, delta) + 1.0, delta)
    for i in range(1, len(m)):
        q = (cum + acc_w + w[i]) / total
        if q <= q_limit:
            acc_w += w[i]
            acc_m += (m[i] - acc_m) * (w[i] / acc_w)  # stable running mean
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            cum += acc_w
            q_limit = _k_inv(_k(cum / total, delta) + 1.0, delta)
            acc_m, acc_w = m[i], w[i]
    out_m.append(acc_m)
    out_w.append(acc_w)
    return TDigest(np.array(out_m), np.array(out_w), vmin, vmax)


# ------------------------------------------------------------- spark side --

DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("means", T.ArrayType(T.DoubleType()), False),
        T.StructField("weights", T.ArrayType(T.DoubleType()), False),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def _digest_row(key: str, d: TDigest) -> dict:
    return {
        "group_key": key,
        "means": d.means.tolist(),
        "weights": d.weights.tolist(),
        "vmin": d.vmin,
        "vmax": d.vmax,
    }


def _row_digest(row) -> TDigest:
    return TDigest(
        np.asarray(row["means"], dtype=np.float64),
        np.asarray(row["weights"], dtype=np.float64),
        float(row["vmin"]),
        float(row["vmax"]),
    )


def partition_digests(
    df: DataFrame,
    value_col: str,
    key_col: str | None = None,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Stage 1: one digest per (input partition, group) via ``mapInPandas``
    — map-only, output a few hundred doubles per digest.  ``key_col=None``
    computes a single global digest per partition (group_key '')."""

    def build(batches):
        acc: dict[str | None, TDigest] = {}
        for pdf in batches:
            # dropna=False: NULL-keyed rows form their own group (a NULL
            # group_key row downstream), matching groupBy semantics —
            # pandas' default silently discards them
            groups = (
                [("", pdf)] if key_col is None
                else [
                    (None if pd.isna(k) else str(k), g)
                    for k, g in pdf.groupby(key_col, sort=False, dropna=False)
                ]
            )
            for key, g in groups:
                d = TDigest.of(g[value_col].to_numpy(dtype=np.float64), delta)
                if not len(d.means):
                    continue
                acc[key] = acc[key].merge(d, delta) if key in acc else d
        if acc:
            yield pd.DataFrame([_digest_row(k, d) for k, d in acc.items()])

    cols = [value_col] if key_col is None else [key_col, value_col]
    return df.select(*cols).mapInPandas(build, DIGEST_SCHEMA)


def merge_digests(
    digests: DataFrame, delta: int = DEFAULT_DELTA
) -> DataFrame:
    """Stage 2: merge per-partition digests by group — ``applyInPandas``
    over kilobyte sketch rows (n_partitions rows per key), never data."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        d = _row_digest(pdf.iloc[0])
        for _, row in pdf.iloc[1:].iterrows():
            d = d.merge(_row_digest(row), delta)
        return pd.DataFrame([_digest_row(pdf.iloc[0]["group_key"], d)])

    return digests.groupBy("group_key").applyInPandas(merge, DIGEST_SCHEMA)


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75, 0.99),
    key_col: str | None = None,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """End to end: partition digests -> sketch merge -> quantiles.

    Returns (group_key, q, value) rows.  The only shuffle in the plan
    carries digests (≈ delta doubles per partition per group): ``emit``
    merges AND queries in one grouped stage, so there is no separate
    merge_digests round-trip (that function exists for persisting merged
    digests as an artifact)."""
    partials = partition_digests(df, value_col, key_col, delta)
    out_schema = T.StructType(
        [
            T.StructField("group_key", T.StringType()),
            T.StructField("q", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        d = _row_digest(pdf.iloc[0])
        for _, row in pdf.iloc[1:].iterrows():
            d = d.merge(_row_digest(row), delta)
        return pd.DataFrame(
            {
                "group_key": pdf.iloc[0]["group_key"],
                "q": list(qs),
                "value": [d.quantile(q) for q in qs],
            }
        )

    return partials.groupBy("group_key").applyInPandas(emit, out_schema)
