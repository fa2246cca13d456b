"""Connected-components resolution of near-dup pairs (dedup_clusters).

The sf-data oracle check exercises real LSH clusters, but those are
dense (diameter ~1). These tests force the multi-hop shapes label
propagation exists for: chains where A~B and B~C but A,C never pair.
"""

from curatorhadoopinterface_spark.operators.dedup import connected_components


def _components(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
    return {r.node: r.comp for r in rows}


def test_chain_collapses_to_one_component(spark):
    # 1-2-3-4-5 chain, diameter 4: needs >1 propagation round
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_stay_apart(spark):
    got = _components(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_direction_irrelevant(spark):
    # labels must flow against edge direction too (symmetrization)
    got = _components(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(got.values()) == {1}


def test_star_and_cycle(spark):
    # star centered at 100 plus a cycle 1-2-3-1 sharing node 3 with it
    got = _components(spark, [(100, 7), (100, 8), (100, 3), (1, 2), (2, 3), (3, 1)])
    assert set(got.values()) == {1}
    assert got[100] == 1 and got[7] == 1


def test_keep_best_agrees_with_clusters_and_maximizes_quality(spark):
    """dedup_keep_best partitions exactly like dedup_clusters and its
    keeper is a member with the maximum classifier score (ties lowest
    doc_id) — checked by recomputing scores for every clustered doc."""
    import pyspark.sql.functions as F

    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_clusters,
        dedup_keep_best,
    )
    from curatorhadoopinterface_spark.operators.textstats import _FEAT_W_SPARK
    from curatorhadoopinterface_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    best = {r["cluster_id"]: r for r in dedup_keep_best(spark, sf_dir).collect()}
    members: dict[int, list[int]] = {}
    for r in dedup_clusters(spark, sf_dir).collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(best) == set(members)
    scores = {
        r["doc_id"]: r["score"]
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(
                "aggregate(transform(split(text, ' '),"
                f" w -> cast({_FEAT_W_SPARK} as bigint)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("score"),
        )
        .collect()
    }
    for cid, r in best.items():
        docs = members[cid]
        assert r["n_docs"] == len(docs) and r["n_dropped"] == len(docs) - 1
        assert r["keeper_doc_id"] in docs
        want = min(docs, key=lambda d: (-scores[d], d))
        assert r["keeper_doc_id"] == want
        assert r["keeper_score"] == scores[want]
