"""Planted-fixture semantics for the round-6 operators: incremental
near-dup ingest directionality, association-rule arithmetic, silhouette
separation, and the KL fixed-point chain replayed offline."""

import math
import os
import tempfile
from curatorhadoopinterface_spark.io import proc_scratch


def _write(spark, rows, schema, table, name):
    out_dir = proc_scratch(f"test_{name}")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )
    return out_dir


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_incremental_minhash_directionality(spark):
    """Only batch(odd) x store(even) near-dups are rejects: a batch doc
    identical to a store doc IS reported; two identical batch docs are
    NOT (within-batch dedup is dedup_incremental/_minhash's caller's
    next pass, this query is the store gate); identical store docs are
    NOT; a unique batch doc is absent. Identical text = J 1.0 = every
    LSH band collides, so the fixture is deterministic by construction
    (the round-5c planted-LSH lesson)."""
    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_incremental_minhash,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    batch_only_dup = "one two three four five six seven eight nine ten " * 3
    rows = [
        (2, dup, "en", "web", len(dup)),              # store copy
        (3, dup, "en", "web", len(dup)),              # batch copy -> reject
        (5, batch_only_dup, "en", "web", 1),          # batch pair ...
        (7, batch_only_dup, "en", "web", 1),          # ... never store-checked
        (9, "totally different words here entirely unlike others",
         "en", "web", 1),                             # unique batch doc
    ]
    out_dir = _write(spark, rows, DOC_SCHEMA, "documents", "incmh")
    got = {
        (r.batch_doc, r.store_doc): r.jaccard
        for r in dedup_incremental_minhash(spark, out_dir).collect()
    }
    assert got == {(3, 2): 1.0}


def test_association_rules_arithmetic(spark):
    """Hand-checkable basket: supports A=3 B=3 C=1, pair (A,B) together
    twice of 4 orders -> conf 666 permille each way, lift ppm
    2*1e6*4/(3*3) = 888888; (A,C) fails min support."""
    from curatorhadoopinterface_spark.operators.analytics import (
        basket_association_rules,
    )

    rows = [
        (1, 101), (1, 102),        # order 1: A B
        (2, 101), (2, 102),        # order 2: A B
        (3, 101), (3, 103),        # order 3: A C
        (4, 102),                  # order 4: B
    ]
    out_dir = _write(
        spark, rows, "l_orderkey long, l_partkey long", "lineitem", "assoc"
    )
    out = basket_association_rules(spark, out_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.p1, r.p2, r.together) == (101, 102, 2)
    assert r.conf_1to2_permille == 666 and r.conf_2to1_permille == 666
    assert r.lift_ppm == 2 * 1_000_000 * 4 // (3 * 3)


def test_silhouette_separated_clusters(spark):
    """Two tight clusters far apart: intra ~0, nearest centroid is the
    other label, separation per-mille enormous; each label's nearest is
    symmetric."""
    from curatorhadoopinterface_spark.operators.mlops import (
        _EMB_DIM,
        emb_silhouette,
    )

    def vec(base, jitter):
        return [float(base + (jitter if i == 0 else 0)) for i in range(_EMB_DIM)]

    rows = [
        (1, 0, vec(0.0, 0.001)),
        (2, 0, vec(0.0, -0.001)),
        (3, 1, vec(1.0, 0.001)),
        (4, 1, vec(1.0, -0.001)),
    ]
    out_dir = _write(
        spark,
        rows,
        "vec_id long, label int, embedding array<float>",
        "embeddings",
        "silh",
    )
    out = {r.label: r for r in emb_silhouette(spark, out_dir).collect()}
    assert set(out) == {0, 1}
    assert out[0].nearest_label == 1 and out[1].nearest_label == 0
    assert out[0].n_vecs == 2 and out[1].n_vecs == 2
    # centroids 1.0 apart in EVERY dim (base fills all 64): d2 = 64;
    # intra d2 ~ (1e-3 * 1e6)^2 = 1e6 raw -> separation ratio huge
    for r in out.values():
        assert r.separation_permille > 100_000
        assert abs(r.nearest_centroid_d2 - 64.0) < 0.01


def test_kl_divergence_replays_fixed_point_chain(spark):
    """Offline replay of the exact integer chain on a two-source corpus
    (math.log is the same IEEE double both engines compute)."""
    from curatorhadoopinterface_spark.operators.textstats import (
        text_kl_divergence,
    )

    rows = [
        (1, "a a b", "en", "s1", 5),
        (2, "a b b b", "en", "s2", 7),
    ]
    out_dir = _write(spark, rows, DOC_SCHEMA, "documents", "kl")
    got = {r.source: r for r in text_kl_divergence(spark, out_dir).collect()}

    counts = {"s1": {"a": 2, "b": 1}, "s2": {"a": 1, "b": 3}}
    c_w = {"a": 3, "b": 4}
    n_c = 7
    for src, sc in counts.items():
        n_s = sum(sc.values())
        tq = sum(
            c * math.floor(math.log((c * 1.0 * n_c) / (n_s * 1.0 * c_w[w])) * 1e9)
            for w, c in sc.items()
        )
        assert got[src].n_tokens == n_s
        assert got[src].kl_nats == round(tq / 1e9 / n_s, 6)
