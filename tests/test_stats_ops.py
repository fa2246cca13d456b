"""Round-7b operator invariants: skyline, Benford, bootstrap,
winsorize/trim, KS drift, tree split, calibration, PIT features,
n-gram novelty (operators/stats.py)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_skyline_is_a_strict_staircase_and_non_dominated(spark):
    from curatorhadoopinterface_spark.operators.stats import skyline_pareto

    rows = skyline_pareto(spark, SF).collect()
    assert rows
    # frontier must be strictly increasing in size as price increases
    # across distinct price levels (the staircase invariant)
    by_price = {}
    for r in rows:
        by_price.setdefault(r.price_cents, set()).add(r.size_v)
    for cents, sizes in by_price.items():
        assert len(sizes) == 1  # ties share the SAME frontier size
    levels = sorted((c, next(iter(s))) for c, s in by_price.items())
    for (c1, s1), (c2, s2) in zip(levels, levels[1:]):
        assert c1 < c2 and s1 < s2
    # no frontier point dominates another (mutual non-dominance)
    for (c1, s1) in levels:
        for (c2, s2) in levels:
            if (c1, s1) != (c2, s2):
                assert not (c1 <= c2 and s1 >= s2)


def test_benford_census_covers_digits_and_shares_sum(spark):
    from curatorhadoopinterface_spark.operators.stats import (
        benford_digit_audit,
    )

    rows = benford_digit_audit(spark, SF).collect()
    digits = [r.digit for r in rows]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    # integer-floor shares under-sum 1e6 by at most |digits|
    tot = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - len(rows) <= tot <= 1_000_000
    exp = sum(r.exp_ppm for r in rows if r.exp_ppm is not None)
    assert exp <= 1_000_000
    for r in rows:
        assert r.dev_ppm == abs(r.obs_ppm - r.exp_ppm)


def test_bootstrap_interval_brackets_the_point_estimate(spark):
    from curatorhadoopinterface_spark.operators.stats import (
        stats_bootstrap_ci,
    )

    a = stats_bootstrap_ci(spark, SF).collect()[0]
    b = stats_bootstrap_ci(spark, SF).collect()[0]
    assert a == b  # md5-seeded -> fully reproducible
    assert a.n_replicas == 32
    assert (
        a.boot_min_centi
        <= a.boot_lo_centi
        <= a.boot_hi_centi
        <= a.boot_max_centi
    )
    # Poisson(1) replica means concentrate around the sample mean
    assert a.boot_min_centi <= a.point_mean_centi <= a.boot_max_centi


def test_winsorize_clamps_and_trim_drops_the_right_count(spark):
    from curatorhadoopinterface_spark.operators.stats import winsorize_stats

    for r in winsorize_stats(spark, SF).collect():
        assert r.lo_val_cents <= r.hi_val_cents
        # trimmed count = hi_rank - lo_rank + 1 exactly
        lo_rank = (r.n + 19) // 20
        hi_rank = (19 * r.n + 19) // 20
        assert r.trim_n == hi_rank - lo_rank + 1
        # winsorized mean lives inside the clamp interval
        assert r.lo_val_cents * 100 <= r.winsor_mean_centi <= r.hi_val_cents * 100
        assert r.lo_val_cents * 100 <= r.trim_mean_centi <= r.hi_val_cents * 100


def test_ks_distance_is_a_valid_sup_norm(spark):
    from curatorhadoopinterface_spark.operators.stats import drift_ks_test

    r = drift_ks_test(spark, SF).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    assert 0 <= r.d_num <= r.n1 * r.n2
    assert r.d_ppm == r.d_num * 1_000_000 // (r.n1 * r.n2)


def test_tree_split_beats_base_and_partitions_everything(spark):
    from curatorhadoopinterface_spark.operators.stats import ml_tree_split

    r = ml_tree_split(spark, SF).collect()[0]
    assert r.n_left > 0 and r.n_right > 0
    assert 0 <= r.gini_split_e12 <= r.gini_base_e12 <= 500_000_000_000
    assert r.gain_e12 == r.gini_base_e12 - r.gini_split_e12


def test_calibration_bins_are_consistent_and_ece_is_weighted(spark):
    from curatorhadoopinterface_spark.operators.stats import calibration_ece

    rows = calibration_ece(spark, SF).collect()
    assert rows
    n_tot = sum(r.n for r in rows)
    ece = sum(r.n * r.gap_ppm for r in rows) // n_tot
    for r in rows:
        assert 0 <= r.bin <= 9
        assert r.bin * 100_000 <= r.conf_ppm < (r.bin + 1) * 100_000
        assert 0 <= r.acc_ppm <= 1_000_000
        assert r.gap_ppm == abs(r.conf_ppm - r.acc_ppm)
        assert r.ece_ppm == ece
    # the synthetic generator draws o_orderstatus independently of the
    # date, so the age-ramp classifier must read as BADLY calibrated —
    # exactly what the audit exists to catch (flat ~35% positive rate
    # against a 0..1 confidence ramp -> large ECE)
    assert rows[0].ece_ppm >= 100_000


def test_pit_features_never_leak_the_label_day(spark):
    """Recompute one customer's trailing window in Python and compare —
    the strict-precedence frame must exclude same-day orders."""
    from curatorhadoopinterface_spark.operators.stats import (
        feature_pit_trailing,
    )
    from curatorhadoopinterface_spark.session import load_table
    import pyspark.sql.functions as F

    top = feature_pit_trailing(spark, SF).collect()
    assert len(top) <= 100
    assert all(r.trail_n >= 0 and r.trail_cents >= 0 for r in top)
    # non-increasing by trail_cents (the audit ordering)
    trails = [r.trail_cents for r in top]
    assert trails == sorted(trails, reverse=True)

    o = (
        load_table(spark, SF, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    by_key = {r.o_orderkey: r for r in o}
    probe = top[0]
    me = by_key[probe.o_orderkey]
    expect = [
        r.cents
        for r in o
        if r.o_custkey == me.o_custkey and me.day - 90 <= r.day <= me.day - 1
    ]
    assert probe.trail_cents == sum(expect)
    assert probe.trail_n == len(expect)


def test_novelty_conserves_shingles_and_first_doc_wins(spark):
    from curatorhadoopinterface_spark.operators.stats import (
        text_ngram_novelty,
    )

    rows = text_ngram_novelty(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_ppm == r.n_novel * 1_000_000 // r.n_shingles
    # every distinct shingle is novel in exactly one doc: the novel
    # total across sources equals the global distinct-shingle count
    from curatorhadoopinterface_spark.session import load_table
    import pyspark.sql.functions as F

    d = load_table(spark, SF, "documents")
    n_distinct = (
        d.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 5)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 4),"
                    " i -> array_join(slice(w, i, 5), ' '))"
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct


def test_psi_terms_are_smoothed_and_total_is_weighted(spark):
    from curatorhadoopinterface_spark.operators.stats import drift_psi

    rows = drift_psi(spark, SF).collect()
    assert rows
    psi = sum((r.p1_ppm - r.p2_ppm) * r.ln_nano for r in rows) // 10**9
    for r in rows:
        assert r.psi_micro == psi
        # sign coupling: ln of the smoothed odds agrees with the share gap
        if r.p1_ppm > r.p2_ppm:
            assert r.ln_nano >= 0
        # smoothing keeps every present bin finite
        assert r.ln_nano is not None
    # even/odd halves of one corpus: drift must read SMALL
    assert 0 <= psi < 250_000  # < 0.25 PSI


def test_conformal_coverage_is_consistent(spark):
    from curatorhadoopinterface_spark.operators.stats import (
        conformal_threshold,
    )

    r = conformal_threshold(spark, SF).collect()[0]
    assert r.n_cal > 0 and r.n_test > 0
    assert 1 <= r.q_rank <= r.n_cal
    assert r.target_ppm == 900_000
    # the 90% split-conformal threshold on a homogeneous split can't
    # stray far from nominal coverage
    assert 850_000 <= r.coverage_ppm <= 960_000


def test_coherent_sample_is_referentially_closed(spark):
    from curatorhadoopinterface_spark.operators.stats import sample_coherent

    r = sample_coherent(spark, SF).collect()[0]
    assert r.n_orphans == 0  # the A19 invariant
    assert 0 < r.n_cust_s < r.n_cust
    assert 0 < r.n_orders_s < r.n_orders
    # md5 is uniform: both shares near 20%
    assert 150_000 <= r.cust_share_ppm <= 250_000
    assert 150_000 <= r.order_share_ppm <= 250_000


def test_lpa_monotone_census_and_stable_labels(spark):
    from curatorhadoopinterface_spark.operators.analytics import (
        graph_community_lpa,
    )

    rows = graph_community_lpa(spark, SF).collect()
    assert [r.round for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.n_changed >= 0 and r.n_comms >= 1
    # communities can only merge or stabilize after round 1 on this
    # co-purchase topology (label mass concentrates)
    assert rows[-1].n_comms <= rows[0].n_comms


def test_dp_median_is_an_occurring_value_at_the_noisy_rank(spark):
    from curatorhadoopinterface_spark.operators.curation import (
        privacy_dp_median,
    )
    from curatorhadoopinterface_spark.session import load_table
    import pyspark.sql.functions as F

    r = privacy_dp_median(spark, SF).collect()[0]
    assert r.noise == -2  # seeded lattice draw, pinned
    assert r.noisy_rank == max(1, min(r.true_rank + r.noise, r.n))
    assert r.epsilon_milli == 693
    cents = sorted(
        x[0]
        for x in load_table(spark, SF, "orders")
        .select(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        )
        .collect()
    )
    assert r.true_median_cents == cents[r.true_rank - 1]
    assert r.dp_median_cents == cents[r.noisy_rank - 1]


def test_allpairs_prefix_has_zero_false_negatives(spark):
    """Brute-force every representative pair at sf0.001 and assert the
    prefix-filtered census counts EXACTLY the pairs at J >= 0.5 — the
    Bayardo prefix theorem checked against enumeration."""
    from itertools import combinations

    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_allpairs_prefix,
    )
    from curatorhadoopinterface_spark.session import load_table
    import pyspark.sql.functions as F

    row = dedup_allpairs_prefix(spark, SF).collect()[0]

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    by_text = {}
    for r in docs:
        by_text.setdefault(r.text, []).append(r.doc_id)
    reps = {min(ids): r_text for r_text, ids in
            ((t, ids) for t, ids in by_text.items())}
    shingles = {}
    for rep, text in reps.items():
        w = text.split(" ")
        if len(w) >= 3:
            ss = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        else:
            ss = {" ".join(w)}
        shingles[rep] = ss
    brute = 0
    brute_cross_docs = 0
    sizes = {min(ids): len(ids) for _, ids in by_text.items()}
    # recompute sizes keyed by rep correctly
    sizes = {min(ids): len(ids) for ids in by_text.values()}
    for ra, rb in combinations(sorted(shingles), 2):
        sa, sb = shingles[ra], shingles[rb]
        inter = len(sa & sb)
        jac_permille = inter * 1000 // (len(sa) + len(sb) - inter)
        if jac_permille >= 500:
            brute += 1
            brute_cross_docs += sizes[ra] * sizes[rb]
    assert row.n_rep_pairs == brute
    assert row.n_doc_pairs_cross == brute_cross_docs
    within = sum(n * (n - 1) // 2 for n in sizes.values())
    assert row.n_doc_pairs_within == within
    assert row.n_doc_pairs_total == brute_cross_docs + within
    assert row.n_classes == len(by_text)
    assert row.n_rep_candidates >= row.n_rep_pairs


def test_tree2_children_partition_the_root_split(spark):
    from curatorhadoopinterface_spark.operators.stats import (
        ml_tree_split,
        ml_tree_split2,
    )

    root = ml_tree_split(spark, SF).collect()[0]
    rows = ml_tree_split2(spark, SF).collect()
    assert [r.side for r in rows] == [0, 1]
    for r in rows:
        assert r.root_thr == root.thr  # same argmin, replayed
        assert r.n_left > 0 and r.n_right > 0
        assert 0 <= r.child_split_e12 <= r.node_gini_e12
        assert r.gain_e12 == r.node_gini_e12 - r.child_split_e12
    # child node sizes partition the corpus
    assert (
        sum(r.n_left + r.n_right for r in rows)
        == root.n_left + root.n_right
    )


def test_knn_class_form_coincides_on_deduplicated_corpus(spark):
    """On a corpus with no duplicate embeddings, the class form's rep
    graph IS sim_knn_graph's graph — cross-query identity (the
    containment_classes pinning discipline applied to vectors)."""
    from curatorhadoopinterface_spark.operators.similarity import (
        sim_knn_classes,
        sim_knn_graph,
    )

    g = sim_knn_graph(spark, SF).collect()[0]
    c = sim_knn_classes(spark, SF).collect()[0]
    assert c.n_classes == c.n_vectors == g.n_vectors  # no duplicates
    assert c.within_pairs == 0
    assert c.n_rep_edges == g.n_edges
    assert c.n_rep_mutual == g.n_mutual
    assert c.n_rep_nodes == g.n_nodes
    assert c.expanded_cross_pairs == g.n_edges  # all class sizes are 1
    assert c.mean_cosine_micro == g.mean_cosine_micro
