"""Annotator unit tests: span well-formedness, determinism, reference
semantics (SURVEY.md section 5 test plan items a/d/e)."""

import hashlib

from curatorhadoopinterface_spark.annotators.light import (
    chunk_spans,
    ner_spans,
    pos_tag,
    pos_tag_word,
    sentence_spans,
    tokenize,
)
from curatorhadoopinterface_spark.functions.hashing import record_identifier_py

TEXT = "The fast Spark job runs quickly. Hadoop customers merged data!"


def test_token_spans_well_formed():
    toks = tokenize(TEXT)
    prev_end = -1
    for t in toks:
        assert 0 <= t["start"] < t["ending"] <= len(TEXT)
        assert TEXT[t["start"] : t["ending"]] == t["label"]
        assert t["start"] >= prev_end  # ordered, non-overlapping
        prev_end = t["ending"]


def test_sentence_spans_cover_terminators():
    sents = sentence_spans(TEXT)
    assert len(sents) == 2
    assert sents[0]["start"] == 0
    assert sents[-1]["ending"] == len(TEXT)


def test_unterminated_tail_is_a_sentence():
    sents = sentence_spans("no terminator here")
    assert len(sents) == 1


def test_pos_rules():
    assert pos_tag_word("42") == "CD"
    assert pos_tag_word("The") == "DT"
    assert pos_tag_word("quickly") == "RB"
    assert pos_tag_word("running") == "VBG"
    assert pos_tag_word("merged") == "VBD"
    assert pos_tag_word("Spark") == "NNP"
    assert pos_tag_word("customers") == "NNS"
    assert pos_tag_word(".") == "PUNCT"
    assert pos_tag_word("is") == "VB"


def test_chunk_merges_runs():
    toks = tokenize(TEXT)
    pos = pos_tag(TEXT, toks)
    chunks = chunk_spans(pos)
    assert all(c["label"] in ("NP", "VP") for c in chunks)
    # 'runs' tags NNS (suffix rule), so the first NP run is
    # 'The fast Spark job runs'; 'quickly' (RB) starts the VP run
    first = chunks[0]
    assert first["label"] == "NP"
    assert TEXT[first["start"] : first["ending"]] == "The fast Spark job runs"
    assert chunks[1]["label"] == "VP"


def test_ner_adjacent_merge():
    # adjacent same-type gazetteer tokens merge (BIO->span,
    # IllinoisNERHandler.java:150-189)
    text = "spark hadoop runs"
    spans = ner_spans(text)
    assert len(spans) == 1
    assert (spans[0]["start"], spans[0]["ending"], spans[0]["label"]) == (0, 12, "TECH")


def test_ner_non_adjacent_no_merge():
    spans = ner_spans("spark fast hadoop")
    assert len(spans) == 2


def test_identifier_reproduces_reference_semantics():
    # sha1("FLAG:" + flag + ":" + text), Identifier.java:63-70
    text = "hello world"
    expected = hashlib.sha1(b"FLAG:false:hello world").hexdigest()
    assert record_identifier_py(text, False) == expected
    assert record_identifier_py(text, True) == hashlib.sha1(b"FLAG:true:hello world").hexdigest()


def test_determinism():
    assert tokenize(TEXT) == tokenize(TEXT)
    assert ner_spans(TEXT) == ner_spans(TEXT)
