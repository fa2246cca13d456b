"""provide() planner: dependency closure execution, per-row memoization,
view identity with the Spark identifier expression."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.functions.hashing import record_identifier_py
from curatorhadoopinterface_spark.plans.provide import provide


def test_provide_computes_closure(spark, corpus):
    out = provide(corpus, "VERB_SRL").collect()
    for r in out:
        assert {"tokens", "pos", "chunk"} <= set(r.label_views.keys())
        assert "charniak" in r.parse_views and "srl" in r.parse_views


def test_span_invariants_through_spark(spark, corpus):
    rows = provide(corpus, "POS").collect()
    for r in rows:
        text = r.raw_text
        for view in ("tokens", "pos"):
            for s in r.label_views[view].labels:
                assert 0 <= s.start < s.ending <= len(text)
        toks = r.label_views["tokens"].labels
        assert all(text[t.start : t.ending] == t.label for t in toks)


def test_chained_provide_memoizes(spark, corpus):
    # second provide() must not recompute tokens: source stamp unchanged
    # and payload identical (CuratorHandler.provide cache semantics)
    first = provide(corpus, "TOKEN")
    chained = provide(first, "POS").collect()
    direct = {r.identifier: r for r in provide(corpus, "POS").collect()}
    for r in chained:
        d = direct[r.identifier]
        assert r.label_views["tokens"] == d.label_views["tokens"]
        assert r.label_views["pos"] == d.label_views["pos"]


def test_multi_view_annotator(spark, corpus):
    rows = provide(corpus, "STANFORD_PARSE").collect()
    for r in rows:
        assert "stanfordParse" in r.parse_views and "stanfordDep" in r.parse_views


def test_identifier_matches_python_twin(spark, corpus):
    for r in corpus.collect():
        assert r.identifier == record_identifier_py(r.raw_text, r.whitespaced)


def test_provide_preserves_passthrough_columns(spark, corpus):
    with_extra = corpus.withColumn("corpus_tag", F.lit("t1"))
    out = provide(with_extra, "TOKEN")
    assert "corpus_tag" in out.columns
    assert out.filter(F.col("corpus_tag") == "t1").count() == corpus.count()


def test_determinism_same_input_same_output(spark, corpus):
    a = provide(corpus, "NER").select("identifier", "label_views").collect()
    b = provide(corpus, "NER").select("identifier", "label_views").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
