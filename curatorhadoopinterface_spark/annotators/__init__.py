"""Lightweight deterministic annotators (SURVEY.md section 2B).

Stand-ins for the reference's Curator-dispatched NLP tools (tokenizer,
sentence splitter, POS, chunker, NER, wikifier, coref, parsers, SRL)
with the same *dataflow* shape: per-document functions producing
Span/Labeling/Clustering/Forest payloads, executed as Arrow-vectorized
batches. Rule-based and deterministic so the DuckDB oracle can replicate
their semantics in SQL (the driver's correctness gate covers the whole
UDF pipeline, not just relational ops).
"""

from curatorhadoopinterface_spark.annotators.light import (
    ANNOTATORS,
    chunk_spans,
    ner_spans,
    pos_tag,
    sentence_spans,
    tokenize,
)

__all__ = [
    "ANNOTATORS",
    "tokenize",
    "sentence_spans",
    "pos_tag",
    "chunk_spans",
    "ner_spans",
]
