"""Rule-DAG -> Catalyst expression compiler.

The heart of the engine (SURVEY.md §1.4 / §3.2): instead of the reference's
per-record loop — one in-memory SQLite round-trip per SQL rule per row
(/root/reference/02_dff_orchestration.py:171-181,230-250) — we compile the
whole DAG ONCE on the driver into plain ``pyspark.sql.Column`` trees and
evaluate every rule column-vectorized in a single distributed ``select``:

- each SQL rule   ->  ``F.when(F.expr(sql), 1.0).otherwise(0.0)``
  (the reference emits 0/1 via ``CASE WHEN {sql} THEN 1 ELSE 0``,
  02_dff_orchestration.py:178; NULL predicates fall to 0, same as SQLite).
- each score rule ->  a registered scorer producing a float Column in [0,1]
  (the reference loads an MLflow pyfunc, 02_dff_orchestration.py:184-212);
  an unknown/unloadable scorer degrades to constant 0.0 with a warning and
  never triggers (reference fallback parity, 02_dff_orchestration.py:203-212).
- verdict = first-match-wins in topological order at ``score >= sensitivity``
  (02_dff_orchestration.py:239):
  ``F.coalesce(*[F.when(score_i >= lit(s), lit(name_i)) for i in topo])``.
  NULL verdict == pass ("VALID", 02_dff_orchestration.py:242,402-405).

No custom Catalyst rules are needed — Catalyst gives predicate pushdown,
common-subexpression elimination across rules (e.g. a column referenced by
several rules), and whole-stage codegen for free (SURVEY.md §4).

Rule SQL is parsed through ``F.expr`` against a validated column whitelist:
the reference's ``_create_sql_rule`` is documented as SQL-injectable
(02_dff_orchestration.py:174-176); we instead reject any rule referencing
identifiers outside the input schema (+ registered function names).
"""

from __future__ import annotations

import logging
import re
from collections.abc import Callable, Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ruleset import Constraint, RuleSet

log = logging.getLogger(__name__)

#: Scorer registry type: name -> function(DataFrame) -> float Column in [0,1].
ScorerRegistry = Mapping[str, Callable[[DataFrame], Column]]

# SQL keywords / functions allowed inside rule predicates beyond column names.
_SQL_ALLOWED = {
    "and", "or", "not", "in", "is", "null", "true", "false", "between",
    "like", "rlike", "case", "when", "then", "else", "end", "cast",
    "int", "bigint", "double", "float", "string", "boolean", "date",
    "timestamp", "abs", "length", "lower", "upper", "trim", "coalesce",
    "nvl", "greatest", "least", "round", "floor", "ceil", "substr",
    "substring", "concat", "split", "size", "regexp_like", "regexp_count",
    "sha2", "md5", "xxhash64", "log", "ln", "exp", "sqrt", "pow", "power",
    "if", "ifnull", "nullif", "startswith", "endswith", "contains", "instr",
}

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_STRING_LIT_RE = re.compile(r"'(?:[^'\\]|\\.)*'")


def referenced_identifiers(sql: str) -> set[str]:
    """Bare identifiers referenced by a rule predicate (string literals stripped)."""
    stripped = _STRING_LIT_RE.sub("''", sql)
    return {m.group(0) for m in _IDENT_RE.finditer(stripped)}


def validate_rule_sql(sql: str, columns: list[str]) -> None:
    """Reject identifiers outside the input schema + allowed SQL vocabulary."""
    if ";" in _STRING_LIT_RE.sub("''", sql):
        raise ValueError("rule predicate must be a single expression (no ';')")
    colset = {c.lower() for c in columns}
    unknown = {
        ident
        for ident in referenced_identifiers(sql)
        if ident.lower() not in colset and ident.lower() not in _SQL_ALLOWED
    }
    if unknown:
        raise ValueError(
            f"rule predicate references unknown identifiers {sorted(unknown)}; "
            f"allowed columns: {sorted(columns)}"
        )


@dataclass
class CompiledRules:
    """Compiled artifact: per-rule score columns + the fused verdict column."""

    ruleset: RuleSet
    scores: dict[str, Column]        # rule id -> float score Column
    verdict: Column                  # first-match decision name, NULL = pass
    verdict_id: Column               # first-match rule id, NULL = pass
    degraded: list[str]              # rule ids that fell back to constant 0.0

    def with_verdict(self, df: DataFrame, col: str = "verdict") -> DataFrame:
        return df.withColumn(col, self.verdict)

    def score_columns(self) -> list[Column]:
        return [
            self.scores[c.id].alias(f"score_{c.id}")
            for c in self.ruleset.topo_order
        ]

    def all_triggered(self) -> Column:
        """Array of EVERY rule id whose score meets sensitivity, in topo
        order — the per-row multi-constraint attribution the first-win
        ``verdict_id`` collapses (the engine's per-row analog of the
        reference's SHAP explain step, 01_dff_model.py:289-306; VERDICT
        r03 #5).  Empty array when nothing triggers.  ``requires`` edges
        order evaluation, they do not gate it (reference semantics:
        02_dff_orchestration.py:215-250), so triggers are independent and
        the column stays a plain vectorized expression."""
        if not self.ruleset.constraints:
            return F.array().cast("array<string>")
        sens = F.lit(float(self.ruleset.sensitivity))
        return F.array_compact(
            F.array(
                *[
                    F.when(self.scores[r.id] >= sens, F.lit(r.id))
                    for r in self.ruleset.topo_order
                ]
            )
        )


def compile_rule(
    rule: Constraint,
    df: DataFrame,
    scorers: ScorerRegistry | None = None,
) -> tuple[Column, bool]:
    """Compile one rule to a float score Column.

    Returns ``(column, degraded)`` where ``degraded`` marks the constant-0.0
    fallback used for unresolvable score rules
    (reference parity: 02_dff_orchestration.py:203-212).
    """
    if rule.kind == "score":
        scorers = scorers or {}
        scorer = scorers.get(rule.name)
        if scorer is None:
            log.warning(
                "scorer %r for rule %s not registered; degrading to constant "
                "0.0 (never triggers) — reference fallback parity "
                "(02_dff_orchestration.py:203-212)",
                rule.name,
                rule.id,
            )
            return F.lit(0.0), True
        try:
            return scorer(df).cast("double"), False
        except Exception:
            log.exception(
                "scorer %r failed to compile; degrading to constant 0.0",
                rule.name,
            )
            return F.lit(0.0), True
    validate_rule_sql(rule.name, df.columns)
    # CASE WHEN {sql} THEN 1 ELSE 0 (02_dff_orchestration.py:178); a NULL
    # predicate result falls through to 0.0, matching SQLite's CASE ELSE.
    return F.when(F.expr(rule.name), F.lit(1.0)).otherwise(F.lit(0.0)), False


def compile_ruleset(
    ruleset: RuleSet,
    df: DataFrame,
    scorers: ScorerRegistry | None = None,
) -> CompiledRules:
    """Compile the full DAG to one verdict expression (single vectorized pass)."""
    scores: dict[str, Column] = {}
    degraded: list[str] = []
    for rule in ruleset.topo_order:
        col, is_degraded = compile_rule(rule, df, scorers)
        scores[rule.id] = col
        if is_degraded:
            degraded.append(rule.id)
    sens = F.lit(float(ruleset.sensitivity))
    verdict = F.coalesce(
        *[
            F.when(scores[r.id] >= sens, F.lit(r.name))
            for r in ruleset.topo_order
        ]
    ) if ruleset.constraints else F.lit(None).cast("string")
    verdict_id = F.coalesce(
        *[
            F.when(scores[r.id] >= sens, F.lit(r.id))
            for r in ruleset.topo_order
        ]
    ) if ruleset.constraints else F.lit(None).cast("string")
    return CompiledRules(
        ruleset=ruleset,
        scores=scores,
        verdict=verdict,
        verdict_id=verdict_id,
        degraded=degraded,
    )
