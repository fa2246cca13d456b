"""Mode registry: DAG closure, toposort, cascade invalidation
(reference: AnnotationMode.java:186-238, CuratorHandler.java:600-644)."""

from curatorhadoopinterface_spark.plans.registry import (
    MODES,
    dependency_closure,
    invalidation_closure,
    parse_version,
)


def test_closure_order_respects_deps():
    for target in MODES:
        order = dependency_closure(target)
        assert order[-1] == target
        seen = set()
        for m in order:
            assert set(MODES[m].depends_on) <= seen, f"{m} before its deps in {order}"
            seen.add(m)


def test_srl_closure_matches_reference():
    # VERB_SRL needs TOKEN, POS, CHUNK, PARSE (AnnotationMode.java:223-228)
    order = dependency_closure("VERB_SRL")
    assert set(order) == {"TOKEN", "POS", "CHUNK", "PARSE", "VERB_SRL"}


def test_wiki_closure_matches_reference():
    order = dependency_closure("WIKI")
    assert set(order) == {"TOKEN", "POS", "CHUNK", "NER", "WIKI"}


def test_invalidation_cascades_transitively():
    # stale tokens invalidate everything that transitively needs them
    dropped = invalidation_closure({"tokens"})
    assert "pos" in dropped and "chunk" in dropped and "srl" in dropped
    assert "wikifier" in dropped
    # stale ner does NOT invalidate pos
    dropped_ner = invalidation_closure({"ner"})
    assert "pos" not in dropped_ner
    assert "wikifier" in dropped_ner and "coref" in dropped_ner


def test_parse_version():
    assert parse_version("enginepos-1.0") == ("enginepos", (1, 0))
    assert parse_version("illinoisner-2.1")[1] == (2, 1)
