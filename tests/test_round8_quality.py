"""Round-8 QA/governance shelf: planted-fixture invariants."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    df = spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, t, lg, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_kendall_tau_sign_on_monotone_corpus(spark, tmp_path):
    """Docs engineered so length and lexical diversity move TOGETHER
    -> tau strongly positive; the mirrored corpus (diversity falls as
    length grows) -> tau strongly negative; |C - D| consistent with
    n_pairs."""
    from curatorhadoopinterface_spark.operators.quality import qa_kendall_tau

    def doc(i, d):
        # 10 words of width 4+8i (n_chars bucket rises with i), d of
        # them distinct (diversity bucket = 100*d // 64)
        ws = [chr(ord("a") + j) * (4 + 8 * i) for j in range(d)]
        return " ".join((ws * 10)[:10])

    pos = [(i, doc(i, i + 1), "en", "s") for i in range(8)]
    sf = _write_docs(spark, tmp_path, pos)
    r = qa_kendall_tau(spark, sf).collect()[0]
    assert r.n_docs == 8 and r.n_pairs == 28
    assert r.concordant > r.discordant and r.tau_a_ppm > 500_000
    assert r.concordant + r.discordant <= r.n_pairs

    neg = [(i, doc(i, 8 - i), "en", "s") for i in range(8)]
    sf2 = _write_docs(spark, tmp_path / "neg", neg)
    r2 = qa_kendall_tau(spark, sf2).collect()[0]
    assert r2.tau_a_ppm < -500_000


def test_kappa_perfect_and_chance_agreement(spark, tmp_path):
    """Labelers engineered to agree perfectly -> kappa 1e6; engineered
    so rule A fires on an independent half -> kappa near 0 (and well
    below raw agreement po)."""
    from curatorhadoopinterface_spark.operators.quality import (
        qa_kappa_agreement,
    )

    # both rules fire together: short AND repetitious docs vs long
    # diverse docs ("aa bb" repeated is <150 chars AND ratio<0.5)
    good = " ".join(f"w{i}" for i in range(40)).ljust(200, "y")
    bad = "aa aa aa aa aa aa aa aa"  # 8 words, 1 distinct, 23 chars
    rows = [(i, bad if i < 4 else good, "en", "s") for i in range(12)]
    sf = _write_docs(spark, tmp_path, rows)
    r = qa_kappa_agreement(spark, sf).collect()[0]
    assert (r.n_ll, r.n_oo, r.n_lo, r.n_ol) == (4, 8, 0, 0)
    assert r.po_ppm == 1_000_000 and r.kappa_ppm == 1_000_000

    # independence: A (repetition) fires on half of each B stratum.
    # B fires iff short; A iff 1-distinct-word text. 4 combos x 3 docs.
    combos = {
        (1, 1): "zz zz zz zz",  # repetitious + short
        (1, 0): " ".join(["zz"] * 80),  # repetitious + long (160 chars)
        (0, 1): "aa bb cc dd ee",  # diverse + short
        (0, 0): good,  # diverse + long
    }
    rows2 = []
    i = 0
    for (a, b), text in combos.items():
        for _ in range(3):
            rows2.append((i, text, "en", "s"))
            i += 1
    sf2 = _write_docs(spark, tmp_path / "ind", rows2)
    r2 = qa_kappa_agreement(spark, sf2).collect()[0]
    assert r2.po_ppm == 500_000 and abs(r2.kappa_ppm) < 1000


def test_filter_rule_ablation_identities(spark, tmp_path):
    """first-fail counts partition the killed docs; a rule that only
    fires alongside an earlier rule shows n_unique = 0 (fully
    shadowed); sums reconcile with filter_census semantics."""
    from curatorhadoopinterface_spark.operators.quality import (
        filter_rule_ablation,
    )

    good = " ".join(f"w{i}" for i in range(40)).ljust(200, "y")
    rows = [
        (0, "tiny doc", "en", "s"),  # too_short only
        (1, "aa aa aa aa " * 20, "en", "s"),  # repetitious only (>=150c)
        (2, "zz zz zz", "en", "s"),  # too_short AND repetitious
        (3, ("superlongword " * 16).strip(), "en", "s"),  # long_words+rep
        (4, good, "en", "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.rule: r for r in filter_rule_ablation(spark, sf).collect()}
    assert set(out) == {"too_short", "long_words", "repetitious"}
    assert out["too_short"].n_docs == 5
    # doc3: mean word len 13 -> long_words fires; 1 distinct/16 -> rep too
    assert out["too_short"].n_any == 2  # docs 0, 2
    assert out["repetitious"].n_any == 3  # docs 1, 2, 3
    assert out["long_words"].n_any == 1  # doc 3
    # cascade: first-fail partitions the 4 killed docs
    assert (
        out["too_short"].n_first
        + out["long_words"].n_first
        + out["repetitious"].n_first
        == 4
    )
    # unique kills: doc1 only rep; doc0 only short; long_words never alone
    assert out["repetitious"].n_unique == 1
    assert out["too_short"].n_unique == 1
    assert out["long_words"].n_unique == 0


def test_dup_inflation_shares_partition_the_corpus(spark, tmp_path):
    """Bucket doc/char shares sum to ~1e6 and counts reconcile: a
    5x class lands in k3_5, a pair in k2, singletons in k1_unique."""
    from curatorhadoopinterface_spark.operators.quality import (
        dup_inflation_curve,
    )

    rows = []
    i = 0
    for copies, text in ((5, "penta " * 10), (2, "duo " * 12), (1, "solo one"), (1, "solo two xyz")):
        for _ in range(copies):
            rows.append((i, text.strip(), "en", "s"))
            i += 1
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.bucket: r for r in dup_inflation_curve(spark, sf).collect()}
    assert out["k3_5"].n_classes == 1 and out["k3_5"].n_docs == 5
    assert out["k2"].n_classes == 1 and out["k2"].n_docs == 2
    assert out["k1_unique"].n_classes == 2 and out["k1_unique"].n_docs == 2
    assert 999_998 <= sum(r.doc_share_ppm for r in out.values()) <= 1_000_000
    assert 999_998 <= sum(r.char_share_ppm for r in out.values()) <= 1_000_000
    assert sum(r.n_docs for r in out.values()) == 9


def test_apriori_triples_match_bruteforce(spark):
    """Top-20 Apriori triples at sf0.001 equal brute-force enumeration
    of all 3-subsets per basket (support >= 2), proving the prune
    drops no frequent triple (downward closure)."""
    from curatorhadoopinterface_spark.operators.quality import (
        _TRIPLE_MINSUP,
        basket_apriori_triples,
    )
    from curatorhadoopinterface_spark.session import load_table

    got = [
        (r.i1, r.i2, r.i3, r.support)
        for r in basket_apriori_triples(spark, SF).collect()
    ]

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        .collect()
    )
    from collections import Counter

    support = Counter()
    for r in basket:
        for t in itertools.combinations(r["items"], 3):
            support[t] += 1
    want = sorted(
        (
            (t[0], t[1], t[2], s)
            for t, s in support.items()
            if s >= _TRIPLE_MINSUP
        ),
        key=lambda x: (-x[3], x[0], x[1], x[2]),
    )[:20]
    assert got == want


def test_blocklist_leet_folding_counts_obfuscations(spark, tmp_path):
    """'b1g', 'B!G', '5low', 'sl0w' all fold to blocklist words; a
    clean doc scores zero; per-source rates are exact."""
    from curatorhadoopinterface_spark.operators.quality import (
        qa_blocklist_leet,
    )

    rows = [
        (0, "the b1g table", "en", "s1"),
        (1, "B!G and 5low queries", "en", "s1"),
        (2, "sl0w v3ctor scan", "en", "s1"),
        (3, "clean document here", "en", "s1"),
        (4, "nothing to see", "en", "s2"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in qa_blocklist_leet(spark, sf).collect()}
    assert out["s1"].n_docs == 4 and out["s1"].n_docs_hit == 3
    # doc1 has two hits (big, slow); doc2 has two (slow, vector)
    assert out["s1"].total_hits == 5
    assert out["s1"].hit_permille == 750
    assert out["s2"].n_docs_hit == 0 and out["s2"].total_hits == 0
