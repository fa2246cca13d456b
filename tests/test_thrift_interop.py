"""Interop with the reference's on-disk Thrift corpus + golden fixtures.

The reference ships 4 raw docs (samplejob/doc1-4.txt), their serialized
Thrift Records (samplejob/serialized/<sha1>.txt, written by
SerializationHandler.java:39-117) and annotated outputs
(samplejob/output/, the CuratorClientTester.java:28-131 artifacts).
These tests read the ACTUAL reference files — the highest-fidelity
parity evidence available without running the reference stack.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from curatorhadoopinterface_spark.io import proc_scratch

SAMPLEJOB = "/root/reference/samplejob"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLEJOB), reason="reference samplejob fixtures not present"
)


def _ref_records(subdir: str) -> dict:
    from curatorhadoopinterface_spark.thrift_codec import decode_thrift_record

    out = {}
    for p in sorted(glob.glob(f"{SAMPLEJOB}/{subdir}/*.txt")):
        rec = decode_thrift_record(open(p, "rb").read())
        out[os.path.basename(p).removesuffix(".txt")] = rec
    return out


def _raw_docs() -> dict:
    return {
        os.path.basename(p): open(p, encoding="utf-8").read()
        for p in glob.glob(f"{SAMPLEJOB}/doc*.txt")
    }


def test_decode_all_reference_serialized_records():
    """Every reference-serialized Record decodes; its filename is its
    identifier, the identifier follows the sha1 rule
    (Identifier.java:63-70), and rawText round-trips to one of the raw
    doc files byte-for-byte."""
    from curatorhadoopinterface_spark.functions.hashing import record_identifier_py

    recs = _ref_records("serialized")
    raw = _raw_docs()
    assert len(recs) == 4
    matched = set()
    for fname, rec in recs.items():
        assert rec["identifier"] == fname
        assert record_identifier_py(rec["raw_text"], rec["whitespaced"]) == fname
        src = [d for d, t in raw.items() if t == rec["raw_text"]]
        assert len(src) == 1, f"rawText of {fname} matches no raw doc"
        matched.add(src[0])
    assert matched == set(raw)  # a bijection, all four docs covered


def test_reference_output_views_wellformed():
    """The annotated outputs carry sentences/tokens/pos label views with
    well-formed half-open spans (0 <= start < ending <= len(rawText)),
    |pos| == |tokens| (one tag per token), and sentence spans in order."""
    recs = _ref_records("output")
    assert len(recs) == 4
    for rec in recs.values():
        lv = rec["label_views"]
        assert {"sentences", "tokens", "pos"} <= set(lv)
        n = len(rec["raw_text"])
        for view in ("sentences", "tokens", "pos"):
            spans = lv[view]["labels"]
            assert spans, f"{view} empty"
            for s in spans:
                assert 0 <= s["start"] < s["ending"] <= n
        assert len(lv["pos"]["labels"]) == len(lv["tokens"]["labels"])
        sents = lv["sentences"]["labels"]
        assert all(
            a["ending"] <= b["start"] for a, b in zip(sents, sents[1:])
        ), "sentence spans overlap or out of order"


def test_codec_roundtrip_exact():
    """decode(encode(decode(blob))) == decode(blob) for every reference
    file — our encoder emits the same logical Record our decoder reads."""
    from curatorhadoopinterface_spark.thrift_codec import (
        decode_thrift_record,
        encode_thrift_record,
    )

    for p in glob.glob(f"{SAMPLEJOB}/serialized/*.txt"):
        rec = decode_thrift_record(open(p, "rb").read())
        assert decode_thrift_record(encode_thrift_record(rec)) == rec


def test_spark_reads_reference_corpus(spark):
    """read_thrift_records ingests the reference-produced corpus as a
    DataFrame in the engine RECORD schema."""
    from curatorhadoopinterface_spark.io import read_thrift_records

    df = read_thrift_records(spark, f"{SAMPLEJOB}/serialized")
    rows = {r["identifier"]: r.asDict(recursive=True) for r in df.collect()}
    assert len(rows) == 4
    raw_texts = set(_raw_docs().values())
    for ident, rec in rows.items():
        assert rec["raw_text"] in raw_texts
        assert set(rec["label_views"]) == {"sentences", "tokens", "pos"}
        toks = rec["label_views"]["tokens"]["labels"]
        assert toks and toks[0]["start"] == 0


def test_write_thrift_records_reference_readable(spark):
    """Engine-annotated records serialize back to TBinaryProtocol blobs
    that decode (as the reference would) to the same views."""
    from curatorhadoopinterface_spark.io import read_text_corpus, write_thrift_records
    from curatorhadoopinterface_spark.plans.provide import provide
    from curatorhadoopinterface_spark.thrift_codec import decode_thrift_record

    df = provide(read_text_corpus(spark, f"{SAMPLEJOB}/doc*.txt"), ["POS", "SENTENCE"])
    out = proc_scratch("thrift_out")
    write_thrift_records(df, out)
    files = glob.glob(f"{out}/*.txt")
    assert len(files) == 4
    originals = {r["identifier"]: r.asDict(recursive=True) for r in df.collect()}
    for p in files:
        rec = decode_thrift_record(open(p, "rb").read())
        orig = originals[rec["identifier"]]
        assert rec["raw_text"] == orig["raw_text"]
        assert set(rec["label_views"]) == set(orig["label_views"])
        for k, v in rec["label_views"].items():
            assert [s["start"] for s in v["labels"]] == [
                s["start"] for s in orig["label_views"][k]["labels"]
            ]


def test_golden_pipeline_vs_reference_output(spark):
    """The golden samplejob test (SURVEY §5 plan item d): run the engine
    pipeline on the ACTUAL raw docs and compare against the reference's
    own annotated outputs.

    Exact parity asserted: identifiers (so the memoization layer keys
    interoperate), view presence, dependency closure, span
    well-formedness, |pos| == |tokens|, and EXACT sentence/token counts
    on all 4 docs (the tokenizer reproduces illinoistokenizer-0.4 on
    this corpus: ellipsis/em-dash tokens, hyphenated compounds,
    apostrophe clitics, terminator+closing-quote sentence ends)."""
    from curatorhadoopinterface_spark.io import read_text_corpus
    from curatorhadoopinterface_spark.plans.provide import provide

    ref = _ref_records("output")
    df = provide(read_text_corpus(spark, f"{SAMPLEJOB}/doc*.txt"), ["POS", "SENTENCE"])
    rows = {r["identifier"]: r.asDict(recursive=True) for r in df.collect()}

    # identifier parity: engine keys == reference keys, exactly
    assert sorted(rows) == sorted(ref)

    exact = 0
    for ident, rec in rows.items():
        lv = rec["label_views"]
        # dependency closure: POS pulled TOKEN in; SENTENCE requested
        assert {"sentences", "tokens", "pos"} <= set(lv)
        n = len(rec["raw_text"])
        for view in ("sentences", "tokens", "pos"):
            for s in lv[view]["labels"]:
                assert 0 <= s["start"] < s["ending"] <= n
        assert len(lv["pos"]["labels"]) == len(lv["tokens"]["labels"])

        rl = ref[ident]["label_views"]
        t_ours, t_ref = len(lv["tokens"]["labels"]), len(rl["tokens"]["labels"])
        s_ours, s_ref = len(lv["sentences"]["labels"]), len(rl["sentences"]["labels"])
        assert (t_ours, s_ours) == (t_ref, s_ref)
        exact += 1
    assert exact == 4, "expected exact token+sentence parity on all 4 docs"


def test_multirecord_codec_roundtrip():
    """MultiRecord (curator.thrift:46-53) encode -> decode is lossless,
    including cluster views whose spans index the concatenated member
    texts — the unit annotate_crossdoc_coref models."""
    from curatorhadoopinterface_spark.thrift_codec import (
        decode_thrift_multirecord,
        encode_thrift_multirecord,
    )

    mr = {
        "identifier": "corpus-0",
        "records": ["a" * 40, "b" * 40],
        "label_views": None,
        "cluster_views": {
            "coref": {
                "clusters": [
                    {
                        "labels": [
                            {"start": 0, "ending": 5, "label": "M", "score": None,
                             "source": None, "attributes": None},
                            {"start": 120, "ending": 126, "label": "M", "score": None,
                             "source": None, "attributes": None},
                        ]
                    }
                ],
                "source": "enginecoref-1.0",
                "score": None,
            }
        },
        "parse_views": None,
    }
    assert decode_thrift_multirecord(encode_thrift_multirecord(mr)) == mr


def test_general_views_survive_codec_and_spark_roundtrip(spark, tmp_path):
    """The general ``views`` map (Record field 6, curator.thrift:41;
    View = spans + relations graph, View.java:42-46) round-trips
    LOSSLESSLY: synthesized blob -> decode -> Spark RECORD row ->
    write_thrift_records -> decode == original decode."""
    from curatorhadoopinterface_spark.io import read_thrift_records, write_thrift_records
    from curatorhadoopinterface_spark.thrift_codec import (
        decode_thrift_record,
        encode_thrift_record,
    )

    rec = {
        "identifier": "deadbeef",
        "raw_text": "Alice pays Bob.",
        "whitespaced": False,
        "label_views": None,
        "cluster_views": None,
        "parse_views": None,
        "views": {
            "semrel": {
                "spans": [
                    {"start": 0, "ending": 5, "label": "Alice", "score": 0.5,
                     "source": None, "attributes": {"type": "PER"}},
                    {"start": 11, "ending": 14, "label": "Bob", "score": None,
                     "source": None, "attributes": None},
                ],
                # relation endpoints INDEX into spans (Relation.java:42-43)
                "relations": [
                    {"start": 0, "ending": 1, "label": "pays",
                     "source": None, "score": 0.75}
                ],
                "source": "enginerel-1.0",
                "score": 1.0,
            }
        },
    }
    blob = encode_thrift_record(rec)
    assert decode_thrift_record(blob) == rec

    # through Spark: binary scan -> RECORD schema -> executor-side write
    src = tmp_path / "in"
    src.mkdir()
    (src / "deadbeef.txt").write_bytes(blob)
    df = read_thrift_records(spark, str(src))
    row = df.collect()[0].asDict(recursive=True)
    assert row["views"]["semrel"]["relations"][0]["label"] == "pays"
    assert row["views"]["semrel"]["spans"][0]["attributes"] == {"type": "PER"}
    out = tmp_path / "out"
    write_thrift_records(df, str(out))
    back = decode_thrift_record((out / "deadbeef.txt").read_bytes())
    assert back == rec
