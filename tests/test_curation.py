"""Semantics of the training-data curation operators (operators/curation.py).

The oracle sweep proves Spark==DuckDB; these pytests prove the
operators mean what they claim (packing conservation, exact stratum
cuts, hash-sample determinism, contamination bounds) — invariants a
value-hash can't express.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from curatorhadoopinterface_spark.operators.curation import (
    EVAL_MOD,
    MIX_DEFAULT,
    MIX_PCT,
    SEQ_BUDGET,
    contamination_minhash,
    contamination_ngram,
    eval_split,
    mixture_sample,
    pack_sequences,
)
from curatorhadoopinterface_spark.session import load_table


def test_pack_sequences_conserves_tokens_and_is_contiguous(spark, sf_dir):
    out = pack_sequences(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r["lang"]: (r["n"], r["toks"])
        for r in docs.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.size(F.split("text", " "))).alias("toks"),
        )
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(truth)
    for lang, rows in by_lang.items():
        # conservation: every document lands in exactly one sequence
        assert sum(r["n_docs"] for r in rows) == truth[lang][0]
        assert sum(r["total_tokens"] for r in rows) == truth[lang][1]
        # sequence ids are the contiguous prefix 0..max (greedy packer
        # never skips a bin: a doc starting in bin k fills it past k)
        ids = sorted(r["seq_id"] for r in rows)
        assert ids == list(range(len(ids)))
        # every sequence that is not the last one is filled to at least
        # the budget boundary by construction of the running sum
        for r in rows:
            if r["seq_id"] < ids[-1]:
                assert r["fill"] > 0


def test_eval_split_exact_stratum_cuts(spark, sf_dir):
    out = eval_split(spark, sf_dir).collect()
    strata: dict[tuple, dict] = {}
    for r in out:
        strata.setdefault((r["lang"], r["source"]), {})[r["split"]] = r["n_docs"]
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    assert set(strata) == set(truth)
    for key, counts in strata.items():
        n = truth[key]
        # the integer cut: rk*10 <= n*8 keeps exactly floor(0.8n) rows
        assert counts.get("train", 0) == (8 * n) // 10
        assert counts.get("val", 0) == (9 * n) // 10 - (8 * n) // 10
        assert counts.get("test", 0) == n - (9 * n) // 10
        assert sum(counts.values()) == n


def test_mixture_sample_deterministic_and_subset(spark, sf_dir):
    a = {r["doc_id"] for r in mixture_sample(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in mixture_sample(spark, sf_dir).collect()}
    assert a == b  # no RNG state: re-run keeps exactly the same rows
    docs = load_table(spark, sf_dir, "documents")
    rates = {
        r["lang"]: r["kept"] / r["n"]
        for r in docs.join(
            mixture_sample(spark, sf_dir).select("doc_id").withColumn("k", F.lit(1)),
            "doc_id",
            "left",
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("k").alias("kept"))
        .collect()
    }
    for lang, rate in rates.items():
        target = MIX_PCT.get(lang, MIX_DEFAULT) / 100
        # hash-uniform: observed rate within a loose binomial envelope
        assert abs(rate - target) < 0.35


def test_contamination_bounds_and_eval_exclusion(spark, sf_dir):
    rows = contamination_ngram(spark, sf_dir).collect()
    assert rows, "synthetic fixture shares vocabulary; expect hits"
    for r in rows:
        assert r["doc_id"] % EVAL_MOD != 0  # eval docs never self-report
        assert 1 <= r["n_contaminated"] <= r["n_shingles"]
        assert 0 < r["contamination"] <= 1.0
        assert abs(r["contamination"] - r["n_contaminated"] / r["n_shingles"]) < 1e-12
    assert SEQ_BUDGET > 0  # imported constants stay wired


def test_contamination_minhash_is_the_cross_boundary_dedup_slice(spark, sf_dir):
    """Consistency planted check: the doc-level decontamination report
    must be EXACTLY dedup_minhash's verified near-dup pairs restricted
    to train-vs-eval boundary crossings (same shingles, same LSH, same
    Jaccard threshold) — reorientated as (train_id, eval_id)."""
    from curatorhadoopinterface_spark.operators.dedup import VERIFY_J, dedup_minhash

    got = {
        (r["train_id"], r["eval_id"]): r["jaccard"]
        for r in contamination_minhash(spark, sf_dir).collect()
    }
    want = {}
    for r in dedup_minhash(spark, sf_dir).collect():
        a, b, j = r["doc_a"], r["doc_b"], r["jaccard"]
        if a % EVAL_MOD == 0 and b % EVAL_MOD != 0:
            want[(b, a)] = j
        elif b % EVAL_MOD == 0 and a % EVAL_MOD != 0:
            want[(a, b)] = j
    assert got == want and got, "expect non-empty boundary-crossing near-dups"
    for (t, e), j in got.items():
        assert t % EVAL_MOD != 0 and e % EVAL_MOD == 0 and VERIFY_J <= j <= 1.0


def test_mixture_quality_census_is_consistent(spark, sf_dir):
    """Planted invariants the value-hash can't express: the census must
    agree with text_quality_linear's bucket counts exactly; the high
    bucket (keep=100%) retains every doc; kept counts and token budgets
    are bounded by their bucket totals."""
    from curatorhadoopinterface_spark.operators.curation import mixture_quality
    from curatorhadoopinterface_spark.operators.textstats import (
        text_quality_linear,
    )

    census = {(r["lang"], r["bucket"]): r for r in mixture_quality(spark, sf_dir).collect()}
    linear = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in text_quality_linear(spark, sf_dir).collect()
    }
    assert set(census) == set(linear)
    for key, r in census.items():
        assert r["n_docs"] == linear[key]
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"]
        if key[1] == "high":
            assert r["n_kept"] == r["n_docs"]  # u100 < 100 always
        if r["n_kept"] == 0:
            assert r["kept_tokens"] == 0


def test_filter_optout_conserves_and_blocks_whole_domains(spark, sf_dir):
    """Disposition is exhaustive (kept+blocked == corpus per lang) and
    domain-atomic: a blocked domain loses ALL its docs in every lang."""
    from curatorhadoopinterface_spark.operators.curation import filter_optout

    census = {r["lang"]: r for r in filter_optout(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r["lang"]: (r["n"], r["chars"])
        for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert set(census) == set(totals)
    blocked_any = 0
    for lang, r in census.items():
        n, chars = totals[lang]
        assert r["n_kept"] + r["n_blocked"] == n
        assert 0 <= r["kept_chars"] <= chars
        blocked_any += r["n_blocked"]
    assert 0 < blocked_any < sum(n for n, _ in totals.values())
    # domain-atomicity: recompute kept chars from the raw disposition
    u100 = F.expr(
        "pmod(cast(conv(substring(md5(concat(lower(source), '.example.com')),"
        " 1, 7), 16, 10) as bigint), 100)"
    )
    raw = {
        r["lang"]: r["kc"]
        for r in docs.withColumn("blocked", u100 < 25)
        .groupBy("lang")
        .agg(F.sum(F.when(~F.col("blocked"), F.col("n_chars")).otherwise(0)).alias("kc"))
        .collect()
    }
    assert {k: v["kept_chars"] for k, v in census.items()} == raw


def test_table_diff_census_is_exhaustive_and_correct(spark, sf_dir):
    """Every disposition count recomputed from first principles on the
    driver: union of keys partitions exactly into the four classes."""
    from curatorhadoopinterface_spark.operators.curation import table_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    want: dict[tuple, int] = {}
    for r in docs:
        i, lang = r["doc_id"], r["lang"]
        in_old, in_new = i % 17 != 0, i % 13 != 0
        if not in_old and not in_new:
            continue
        if not in_old:
            disp = "added"
        elif not in_new:
            disp = "removed"
        elif i % 5 == 0:
            disp = "changed"
        else:
            disp = "unchanged"
        want[(lang, disp)] = want.get((lang, disp), 0) + 1
    got = {
        (r["lang"], r["disposition"]): r["n_docs"]
        for r in table_diff(spark, sf_dir).collect()
    }
    assert got == want
    assert {d for _, d in got} == {"added", "removed", "changed", "unchanged"}


def test_pack_chunks_full_sequences_and_conservation(spark, sf_dir):
    """Concat-then-chunk contracts: every sequence except each
    language's LAST holds exactly SEQ_BUDGET tokens (zero padding
    waste), seq_ids are contiguous from 0, and total tokens are
    conserved against the raw corpus."""
    from curatorhadoopinterface_spark.operators.curation import pack_chunks

    out = pack_chunks(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r["lang"]: r["toks"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("toks"))
        .collect()
    }
    by_lang: dict[str, dict] = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["seq_id"]] = r["seq_tokens"]
    assert set(by_lang) == set(truth)
    for lang, seqs in by_lang.items():
        ids = sorted(seqs)
        assert ids == list(range(len(ids)))  # contiguous from 0
        for sid in ids[:-1]:
            assert seqs[sid] == SEQ_BUDGET  # every non-final seq full
        assert 0 < seqs[ids[-1]] <= SEQ_BUDGET
        assert sum(seqs.values()) == truth[lang]  # conservation


def test_pack_sequences_hier_identical_to_flat(spark, sf_dir):
    """The telescoping identity: hierarchical packing must reproduce the
    flat global-window packing BIT-FOR-BIT (same seq assignment, same
    fill report) — global_before == bucket_offset + within_before."""
    from curatorhadoopinterface_spark.operators.curation import pack_sequences_hier

    flat = {
        (r.lang, r.seq_id): (r.n_docs, r.total_tokens, r.fill)
        for r in pack_sequences(spark, sf_dir).collect()
    }
    hier = {
        (r.lang, r.seq_id): (r.n_docs, r.total_tokens, r.fill)
        for r in pack_sequences_hier(spark, sf_dir).collect()
    }
    assert flat == hier
    assert len(flat) > 0


def test_shuffle_deterministic_is_a_stable_permutation(spark, sf_dir):
    """global_pos must be exactly 1..N (a bijection), and the entire
    assignment must be IDENTICAL when the input arrives partitioned
    differently — the reproducibility contract a seeded df.sample/
    rangepartitioner sort cannot give."""
    from curatorhadoopinterface_spark.operators.curation import (
        shuffle_deterministic,
    )

    rows = shuffle_deterministic(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.global_pos for r in rows) == list(range(1, n + 1))
    # shard is the first hex byte of the seeded hash: order within the
    # permutation groups by shard prefix
    by_pos = sorted(rows, key=lambda r: r.global_pos)
    shards = [r.shard for r in by_pos]
    assert shards == sorted(shards), "shard blocks must be contiguous"

    # same result off a differently-partitioned copy of the table
    import tempfile, shutil, os
    from curatorhadoopinterface_spark.session import load_table

    tmp = tempfile.mkdtemp(prefix="shuffle_repart_")
    try:
        load_table(spark, sf_dir, "documents").repartition(7).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "documents.parquet"))
        rows2 = shuffle_deterministic(spark, tmp).collect()
        assert {(r.doc_id, r.global_pos) for r in rows2} == {
            (r.doc_id, r.global_pos) for r in rows
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_dedup_incremental_plants_and_drops(spark, tmp_path):
    """Planted fixture: store holds hashes A,B; batch arrives with a
    store-dup (A), an in-batch dup pair (C,C), and a fresh doc (D).
    Kept = first C + D."""
    from curatorhadoopinterface_spark.operators.dedup import dedup_incremental

    docs = [
        # even doc_ids = store half
        (0, "text A", "en", "web", 6),
        (2, "text B", "en", "web", 6),
        # odd doc_ids = batch
        (1, "text A", "en", "web", 6),   # dup of store
        (3, "text C", "en", "web", 6),   # first of in-batch pair
        (5, "text C", "en", "web", 6),   # in-batch dup
        (7, "text D", "en", "web", 6),   # fresh
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    kept = {
        r.doc_id for r in dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert kept == {3, 7}
