"""Pure-pandas/Python oracle reproducing the reference's scoring semantics.

Independently re-implements /root/reference/02_dff_orchestration.py:215-250:
row-at-a-time, topological rule order, first rule with score >= sensitivity
wins, None verdict when nothing triggers.  Deliberately row-oriented (like
the reference's ``df.apply(axis=1)``) and algorithmically different from
``dff.ruleset`` (DFS vs Kahn) so shared bugs can't hide.

Only used in tests at small scale.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Mapping

import pandas as pd

_EQ_RE = re.compile(r"(?<![<>!=])=(?!=)")


def sql_to_python(sql: str) -> str:
    """Translate the reference's rule dialect to a Python expression.

    The rules use SQL comparison syntax (``=`` equality, ``and``/``or``);
    Python's ``and``/``or``/``not`` and chained comparisons match SQL
    semantics row-wise, so only ``=`` needs rewriting.
    """
    return _EQ_RE.sub("==", sql)


def topo_order_dfs(rules: list[dict]) -> list[dict]:
    """DFS-based topological order, declaration-order ties (independent of
    the engine's Kahn implementation)."""
    by_id = {r["id"]: r for r in rules}
    order_idx = {r["id"]: i for i, r in enumerate(rules)}
    visited: dict[str, int] = {}  # 0=visiting, 1=done
    out: list[dict] = []

    def visit(rid: str) -> None:
        state = visited.get(rid)
        if state == 1:
            return
        if state == 0:
            raise ValueError("cycle detected")
        visited[rid] = 0
        for parent in sorted(by_id[rid].get("requires", ()), key=order_idx.get):
            visit(parent)
        visited[rid] = 1
        out.append(by_id[rid])

    for r in sorted(rules, key=lambda r: order_idx[r["id"]]):
        visit(r["id"])
    return out


def oracle_verdicts(
    pdf: pd.DataFrame,
    rules: list[dict],
    sensitivity: float = 0.7,
    scorers: Mapping[str, Callable[[dict], float]] | None = None,
) -> pd.Series:
    """Per-row verdict (decision NAME of the first triggered rule, else None).

    ``rules``: [{"id", "name", "requires"}] in declaration order.
    ``scorers``: name -> fn(row_dict) -> float for score/model rules; an
    unregistered scorer scores 0.0 (reference fallback,
    02_dff_orchestration.py:203-212).
    """
    scorers = scorers or {}
    ordered = topo_order_dfs(rules)
    compiled = []
    for r in ordered:
        name = r["name"]
        if name.startswith(("models:/", "score:")):
            fn = scorers.get(name, lambda row: 0.0)
            compiled.append((name, fn))
        else:
            code = compile(sql_to_python(name), f"<rule {r['id']}>", "eval")
            def sql_fn(row, _code=code):
                try:
                    return 1.0 if eval(_code, {}, row) else 0.0
                except TypeError:  # NULL in comparison -> no trigger (SQL CASE ELSE 0)
                    return 0.0
            compiled.append((name, sql_fn))

    def process_record(row: pd.Series):
        d = row.to_dict()
        for name, fn in compiled:
            if fn(d) >= sensitivity:
                return name
        return None

    return pdf.apply(process_record, axis=1)


def oracle_sha256(pdf: pd.DataFrame, col: str = "content") -> pd.Series:
    """hashlib sha256 hexdigest per row (the per-row invariant vs F.sha2)."""
    return pdf[col].map(
        lambda s: None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest()
    )
