"""Tests for best-effort annotation (A7 failure budget), text-integrity
validation (A15 — the reference's bugged check, implemented correctly),
and the verification re-run harness (A19)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_best_effort_isolates_poisoned_docs(spark, corpus):
    """One raising document (NULL text -> the tokenizer's regex raises)
    must not kill the stage in best_effort mode; strict mode must
    raise. Monkeypatching can't reach executor worker processes, so the
    poison travels in the data."""
    from curatorhadoopinterface_spark.plans.provide import provide

    poisoned = corpus.select("identifier", "raw_text", "whitespaced").unionByName(
        spark.createDataFrame(
            [("deadbeef", None, False)], "identifier string, raw_text string, whitespaced boolean"
        )
    )

    rows = provide(poisoned, "TOKEN", best_effort=True).collect()
    errs = [r for r in rows if r["annotation_error"] is not None]
    oks = [r for r in rows if r["annotation_error"] is None]
    assert len(errs) == 1 and errs[0]["identifier"] == "deadbeef"
    assert "TypeError" in errs[0]["annotation_error"]
    assert len(oks) == len(rows) - 1
    for r in oks:
        assert "tokens" in r["label_views"]
    # the poisoned row keeps its (empty) views rather than partials
    assert "tokens" not in (errs[0]["label_views"] or {})

    with pytest.raises(Exception):
        provide(poisoned, "TOKEN", best_effort=False).collect()


def test_validate_text_integrity_fires_correctly(spark, corpus):
    """The reference's A15 compares other to other and never fires
    (CuratorReducer.java:512-527); ours must fire on real drift and stay
    quiet within tolerance."""
    from curatorhadoopinterface_spark.plans.verify import validate_text_integrity

    drifted = corpus.withColumn(
        "raw_text",
        F.when(
            F.col("raw_text").contains("Lorem"),
            F.concat(F.col("raw_text"), F.lit(" THIS TEXT WAS CORRUPTED BADLY")),
        ).otherwise(F.col("raw_text")),
    )
    violations = validate_text_integrity(corpus, drifted).collect()
    assert len(violations) == 1
    assert violations[0]["edit_distance"] > 10

    # small drift within tolerance: no violations
    nudged = corpus.withColumn("raw_text", F.concat(F.col("raw_text"), F.lit("!")))
    assert validate_text_integrity(corpus, nudged).count() == 0


def test_verify_records_roundtrip_and_tamper(spark, corpus):
    """A19: fresh re-annotation matches an honest run view-for-view;
    a tampered record is caught."""
    from curatorhadoopinterface_spark.plans.provide import provide
    from curatorhadoopinterface_spark.plans.verify import verify_records

    ann = provide(corpus, ["POS", "NER"])
    report = verify_records(ann, ["POS", "NER"])
    assert report.filter(~F.col("ok")).count() == 0

    # tamper: drop the ner view from one record
    tampered = ann.withColumn(
        "label_views",
        F.when(
            F.col("raw_text").contains("Lorem"),
            F.map_filter(F.col("label_views"), lambda k, _: k != "ner"),
        ).otherwise(F.col("label_views")),
    )
    bad = verify_records(tampered, ["POS", "NER"]).filter(~F.col("ok"))
    assert bad.count() == 1


def test_failure_budget_gate(spark, corpus):
    """<=40% row failures pass (clean rows survive); above raises."""
    from curatorhadoopinterface_spark.plans.provide import provide
    from curatorhadoopinterface_spark.plans.verify import enforce_failure_budget

    one_bad = corpus.select("identifier", "raw_text", "whitespaced").unionByName(
        spark.createDataFrame(
            [("bad1", None, False)],
            "identifier string, raw_text string, whitespaced boolean",
        )
    )
    ann = provide(one_bad, "TOKEN", best_effort=True)
    ok = enforce_failure_budget(ann, max_fraction=0.4)
    assert ok.count() == one_bad.count() - 1
    assert "annotation_error" not in ok.columns

    mostly_bad = spark.createDataFrame(
        [(f"bad{i}", None, False) for i in range(9)]
        + [("good", "fine text here", False)],
        "identifier string, raw_text string, whitespaced boolean",
    )
    ann2 = provide(mostly_bad, "TOKEN", best_effort=True)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="failure budget"):
        enforce_failure_budget(ann2, max_fraction=0.4)
