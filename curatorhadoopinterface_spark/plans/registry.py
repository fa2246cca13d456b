"""Annotation-mode registry: the dependency DAG of the reference,
re-encoded once (SURVEY.md section 2B).

Mirrors ``AnnotationMode`` (src/.../infrastructure/AnnotationMode.java:16,
dependencies :186-238, view names :105-131, view types :148-163) and the
Curator's per-view ``<requirement>`` lists (CuratorReducer.java:793-919).

The reference derives execution order per job by sampling input files
(JobHandler.java:264-331, 494-546); here the DAG is static and the
planner reads *exact* view presence from the DataFrame instead of a
25-file sample.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from graphlib import TopologicalSorter


class ViewType(Enum):
    """Which view-map family a mode writes into
    (src/.../infrastructure/ViewType.java:8-10)."""

    LABEL = "label_views"
    CLUSTER = "cluster_views"
    PARSE = "parse_views"


@dataclass(frozen=True)
class Mode:
    name: str
    view: str  # canonical Curator view name (AnnotationMode.java:105-131)
    view_type: ViewType
    depends_on: tuple[str, ...]  # ordered (AnnotationMode.java:186-238)
    version: str  # annotator version for staleness checks (A22)
    extra_views: tuple[str, ...] = field(default_factory=tuple)  # multi-view annotators


# Registry of the ten reference modes (AnnotationMode.java:16) with this
# engine's lightweight annotator versions as the `source` identifiers
# (the reference writes e.g. "illinoisner-2.1"; we write "enginener-1.0").
MODES: dict[str, Mode] = {
    m.name: m
    for m in (
        Mode("TOKEN", "tokens", ViewType.LABEL, (), "enginetok-1.0"),
        Mode("SENTENCE", "sentences", ViewType.LABEL, (), "enginesent-1.0"),
        Mode("POS", "pos", ViewType.LABEL, ("TOKEN",), "enginepos-1.0"),
        Mode("CHUNK", "chunk", ViewType.LABEL, ("TOKEN", "POS"), "enginechunk-1.0"),
        Mode("NER", "ner", ViewType.LABEL, (), "enginener-1.0"),
        Mode(
            "WIKI", "wikifier", ViewType.LABEL, ("TOKEN", "POS", "CHUNK", "NER"), "enginewiki-1.0"
        ),
        Mode("COREF", "coref", ViewType.CLUSTER, ("TOKEN", "POS", "NER"), "enginecoref-1.0"),
        Mode("PARSE", "charniak", ViewType.PARSE, ("TOKEN",), "engineparse-1.0"),
        Mode(
            "STANFORD_PARSE",
            "stanfordParse",
            ViewType.PARSE,
            ("TOKEN", "SENTENCE"),
            "enginestanford-1.0",
            extra_views=("stanfordDep",),
        ),
        Mode("VERB_SRL", "srl", ViewType.PARSE, ("TOKEN", "POS", "CHUNK", "PARSE"), "enginesrl-1.0"),
        Mode("NOM_SRL", "nom", ViewType.PARSE, ("TOKEN", "POS", "CHUNK", "PARSE"), "enginenom-1.0"),
    )
}

VIEW_TO_MODE: dict[str, str] = {m.view: m.name for m in MODES.values()}
for _m in MODES.values():
    for _v in _m.extra_views:
        VIEW_TO_MODE[_v] = _m.name


def dependency_closure(target: str) -> list[str]:
    """Ordered list of modes to run for ``target`` (target last).

    Replaces JobHandler.determineDependencies' sampled heuristic with an
    exact topological sort of the static DAG.
    """
    if target not in MODES:
        raise KeyError(f"unknown annotation mode: {target}")
    graph: dict[str, tuple[str, ...]] = {}
    stack = [target]
    while stack:
        mode = stack.pop()
        if mode in graph:
            continue
        graph[mode] = MODES[mode].depends_on
        stack.extend(MODES[mode].depends_on)
    order = [m for m in TopologicalSorter(graph).static_order()]
    return order


def forced_start_plan(target: str, force_start: str) -> tuple[list[str], set[str]]:
    """JobHandler's ``[START]`` forced-first-mode override
    (JobHandler.java:78-109; honored in determineDependencies,
    :264-331): the user names a dependency stage to start from, and the
    pipeline RE-RUNS that stage and everything downstream of it within
    the target's closure, reusing only the modes upstream of the forced
    start.

    Returns ``(ordered_modes, forced_modes)`` — the same topological
    order :func:`dependency_closure` yields, plus the subset whose
    existing views must be discarded (the forced start and its
    transitive dependents inside the closure).
    """
    order = dependency_closure(target)
    if force_start not in MODES:
        raise KeyError(f"unknown annotation mode: {force_start}")
    if force_start not in order:
        raise ValueError(
            f"forced start {force_start!r} is not in the dependency "
            f"closure of {target!r} ({order})"
        )
    start = MODES[force_start]
    stale_views = invalidation_closure({start.view, *start.extra_views})
    # a mode is forced if ANY of its outputs (primary view OR extra
    # views) is invalidated — a multi-view mode whose extra view feeds a
    # downstream mode must re-run too (r4 ADVICE registry.py:118)
    forced = {
        m
        for m in order
        if {MODES[m].view, *MODES[m].extra_views} & stale_views
    }
    return order, forced


def inverted_requirements() -> dict[str, set[str]]:
    """view -> set of modes that (directly) require it; the cascade-
    invalidation index (CuratorHandler.java:216-221, 600-644)."""
    inv: dict[str, set[str]] = {}
    for m in MODES.values():
        for dep in m.depends_on:
            inv.setdefault(MODES[dep].view, set()).add(m.name)
    return inv


def invalidation_closure(views: set[str]) -> set[str]:
    """All views that must be dropped if ``views`` are stale — transitive
    dependents (cascadeRemoveStaleFields, CuratorHandler.java:628-644)."""
    inv = inverted_requirements()
    out = set(views)
    frontier = list(views)
    while frontier:
        v = frontier.pop()
        for dependent_mode in inv.get(v, ()):  # modes requiring v
            dm = MODES[dependent_mode]
            for dv in (dm.view, *dm.extra_views):
                if dv not in out:
                    out.add(dv)
                    frontier.append(dv)
    return out


def parse_version(source: str) -> tuple[str, tuple[int, ...]]:
    """Split 'enginepos-1.0' -> ('enginepos', (1, 0)); the staleness
    comparison key (CuratorHandler.updateRequired, :816-896)."""
    name, _, ver = source.rpartition("-")
    try:
        nums = tuple(int(p) for p in ver.split("."))
    except ValueError:
        return (source, ())
    return (name, nums)
