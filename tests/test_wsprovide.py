"""wsgetRecord/wsprovide parity: caller-supplied sentence lists
(curator.thrift:73-86; CuratorHandler.java:1054-1127, Whitespacer
semantics — rawText = join(sentences, ' '), views from the GIVEN splits)."""

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.functions.hashing import record_identifier_py
from curatorhadoopinterface_spark.io import records_from_sentence_lists
from curatorhadoopinterface_spark.plans.provide import provide

SENTS = [
    ["The fast Spark job runs quickly.", "Hadoop customers merged data!"],
    ["One-sentence document here."],
    ["Numbers like 42 appeared.", "Spark scaled.", "So did Hadoop."],
]


def test_ws_record_shape_and_identifier(spark):
    rows = records_from_sentence_lists(spark, SENTS).collect()
    assert len(rows) == len(SENTS)
    by_raw = {r.raw_text: r for r in rows}
    for sents in SENTS:
        raw = " ".join(sents)  # StringUtil.join(sentences, " ")
        r = by_raw[raw]
        assert r.whitespaced is True
        # whitespaced=true changes the identifier (Identifier.java:63-70)
        assert r.identifier == record_identifier_py(raw, True)
        assert r.identifier != record_identifier_py(raw, False)


def test_sentence_spans_are_the_given_splits(spark):
    rows = records_from_sentence_lists(spark, SENTS).collect()
    for r in rows:
        raw = r.raw_text
        spans = r.label_views["sentences"].labels
        # the spans reproduce the provided segmentation exactly
        given = next(s for s in SENTS if " ".join(s) == raw)
        assert [raw[s.start : s.ending] for s in spans] == given
        assert [s.label for s in spans] == [
            raw[s.start : s.ending] for s in spans
        ]
        # contiguous coverage: each sentence starts one space after the last
        for a, b in zip(spans, spans[1:]):
            assert b.start == a.ending + 1
        assert spans[0].start == 0 and spans[-1].ending == len(raw)


def test_token_spans_are_whitespace_tokens(spark):
    rows = records_from_sentence_lists(spark, SENTS).collect()
    for r in rows:
        raw = r.raw_text
        toks = r.label_views["tokens"].labels
        assert [t.label for t in toks] == raw.split(" ")
        assert all(raw[t.start : t.ending] == t.label for t in toks)


def test_provide_reuses_given_segmentation(spark):
    """wsprovide for a non-ws view (CuratorHandler.java:1096-1127):
    downstream annotators consume the caller's tokens, not the engine
    tokenizer's."""
    rec = records_from_sentence_lists(spark, SENTS)
    out = provide(rec, "POS").collect()
    for r in out:
        toks = r.label_views["tokens"].labels
        pos = r.label_views["pos"].labels
        # tokens unchanged (ws source stamp intact), one POS tag per token
        assert r.label_views["tokens"].source == "enginews-1.0"
        assert len(pos) == len(toks)
        assert [(p.start, p.ending) for p in pos] == [
            (t.start, t.ending) for t in toks
        ]


def test_ws_records_plan_is_map_only(spark):
    """The span construction must be a narrow per-row expression — no
    exchange anywhere in the plan (the 100 TB contract of the fast path)."""
    df = records_from_sentence_lists(spark, SENTS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
