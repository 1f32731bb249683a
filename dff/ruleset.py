"""Rule-spec parsing: DMN XML / JSON -> an ordered Constraint DAG.

Reproduces the semantics of the reference's ``parse_ruleset``
(/root/reference/02_dff_orchestration.py:68-97): one node per ``dmn:decision``
(id + ``name`` attribute), one edge per ``dmn:requiredDecision`` href
(parent -> child).  Validation mirrors 02_dff_orchestration.py:134-135
(raise on a cyclic graph) and the topological evaluation order of
02_dff_orchestration.py:215-227, with ties broken by declaration order
(NetworkX topological_sort follows insertion order for ties; we encode that
explicitly so verdict order is reproducible).

All of this is driver-side pure Python over <= dozens of nodes; the heavy
lifting happens later in :mod:`dff.compiler`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from xml.dom import minidom

DMN_NS = "http://www.omg.org/spec/DMN/20180521/MODEL/"

#: Prefixes that mark a rule as a *score* rule (a float in [0,1] thresholded
#: at ``sensitivity``) rather than a boolean SQL predicate.  The reference
#: uses ``models:/`` (02_dff_orchestration.py:223); our engine adds ``score:``
#: for registered non-ML scorers (stat / drift scores).
SCORE_PREFIXES = ("models:/", "score:")

DEFAULT_SENSITIVITY = 0.7  # 02_dff_orchestration.py:275


class CyclicRulesetError(ValueError):
    """Raised when the rule graph is not a DAG (02_dff_orchestration.py:134-135)."""


@dataclass(frozen=True)
class Constraint:
    """One decision node.

    ``name`` is either a SQL boolean expression over input columns or a
    scorer URI (``models:/...`` / ``score:...``); ``requires`` lists parent
    rule ids (informationRequirement edges).  ``order`` is the declaration
    index used for topological tie-breaking.
    """

    id: str
    name: str
    requires: tuple[str, ...] = ()
    order: int = 0

    @property
    def kind(self) -> str:
        return "score" if self.name.startswith(SCORE_PREFIXES) else "sql"


@dataclass
class RuleSet:
    constraints: list[Constraint]
    sensitivity: float = DEFAULT_SENSITIVITY
    version: str = "v1"
    _topo: list[Constraint] = field(default_factory=list, repr=False)

    def __post_init__(self) -> None:
        self._topo = self._topological_order()

    def by_id(self, rid: str) -> Constraint:
        for c in self.constraints:
            if c.id == rid:
                return c
        raise KeyError(rid)

    @property
    def topo_order(self) -> list[Constraint]:
        """Kahn's algorithm; ties broken by declaration order.

        Matches the observed reference order R1..R5 (SURVEY.md §1.4 note on
        NetworkX insertion-order ties).
        """
        return list(self._topo)

    def _topological_order(self) -> list[Constraint]:
        by_id = {c.id: c for c in self.constraints}
        for c in self.constraints:
            for parent in c.requires:
                if parent not in by_id:
                    raise ValueError(
                        f"rule {c.id!r} requires unknown rule {parent!r}"
                    )
        indeg = {c.id: len(set(c.requires)) for c in self.constraints}
        ready = sorted(
            (c for c in self.constraints if indeg[c.id] == 0),
            key=lambda c: c.order,
        )
        children: dict[str, list[Constraint]] = {c.id: [] for c in self.constraints}
        for c in self.constraints:
            for parent in set(c.requires):
                children[parent].append(c)
        out: list[Constraint] = []
        while ready:
            node = ready.pop(0)
            out.append(node)
            newly = []
            for child in children[node.id]:
                indeg[child.id] -= 1
                if indeg[child.id] == 0:
                    newly.append(child)
            # insertion-order ties: merge by declaration order
            ready = sorted(ready + newly, key=lambda c: c.order)
        if len(out) != len(self.constraints):
            raise CyclicRulesetError(
                "Invalid rule set: graph contains a cycle "
                "(reference parity: 02_dff_orchestration.py:134-135)"
            )
        return out


def parse_dmn(path: str | Path) -> RuleSet:
    """Parse a DMN XML ruleset into a :class:`RuleSet`.

    Mirrors /root/reference/02_dff_orchestration.py:68-97: a node per
    ``dmn:decision`` (document order), an edge per ``dmn:requiredDecision``.
    """
    doc = minidom.parse(str(path))
    decisions = doc.getElementsByTagNameNS(DMN_NS, "decision")
    id_to_name: dict[str, str] = {}
    requires: dict[str, list[str]] = {}
    order: list[str] = []
    for dec in decisions:
        did = dec.getAttribute("id")
        id_to_name[did] = dec.getAttribute("name")
        order.append(did)
        reqs: list[str] = []
        for info_req in dec.getElementsByTagNameNS(DMN_NS, "informationRequirement"):
            for req in info_req.getElementsByTagNameNS(DMN_NS, "requiredDecision"):
                href = req.getAttribute("href").lstrip("#")
                reqs.append(href)
        requires[did] = reqs
    constraints = [
        Constraint(id=did, name=id_to_name[did], requires=tuple(requires[did]), order=i)
        for i, did in enumerate(order)
    ]
    return RuleSet(constraints=constraints)


def parse_json(spec: str | Path | dict) -> RuleSet:
    """Parse the engine's native JSON rule spec (FIXTURES.md F2 shape).

    ``{"version": "v1", "sensitivity": 0.7,
       "rules": [{"id": ..., "name": ..., "requires": [...]}, ...]}``
    """
    if isinstance(spec, (str, Path)):
        spec = json.loads(Path(spec).read_text())
    rules = [
        Constraint(
            id=r["id"],
            name=r["name"],
            requires=tuple(r.get("requires", ())),
            order=i,
        )
        for i, r in enumerate(spec["rules"])
    ]
    return RuleSet(
        constraints=rules,
        sensitivity=float(spec.get("sensitivity", DEFAULT_SENSITIVITY)),
        version=str(spec.get("version", "v1")),
    )
