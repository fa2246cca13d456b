"""Planted-fixture semantics for the round-5b operators: RRF fusion
ordering, k-anonymity suppression reconciliation, OHLC endpoint
selection, grouped-holdout atomicity, binary-dedup redundancy math."""

import hashlib
import os
import tempfile

import pytest
from curatorhadoopinterface_spark.io import proc_scratch


def _write(spark, rows, schema, table, name):
    out_dir = proc_scratch(f"test_{name}")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )
    return out_dir


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_hybrid_rrf_fusion_order(spark):
    """A doc ranked well in BOTH lists outranks the single-list winner
    of either side; list-absent docs contribute zero for that side."""
    from curatorhadoopinterface_spark.operators.retrieval import query_hybrid_rrf

    docs = [
        (0, "nothing here", "en", "s", 12),          # the query vector's doc
        (1, "spark join filter spark", "en", "s", 23),  # BM25 rank 1
        (2, "spark", "en", "s", 5),                  # BM25 rank 2, cos rank 1
        (3, "unrelated words", "en", "s", 15),       # cos rank 2 only
        (4, "join", "en", "s", 4),                   # BM25 rank 3
    ]
    embs = [
        (0, [1.0, 0.0, 0.0], 0),  # query
        (1, [0.0, 1.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0], 0),  # cosine 1.0 vs query
        (3, [0.9, 0.1, 0.0], 0),  # high cosine
        (4, [0.0, 0.0, 1.0], 0),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "rrf")
    _write(spark, embs, "vec_id long, embedding array<float>, label int",
           "embeddings", "rrf")
    rows = query_hybrid_rrf(spark, out_dir).collect()
    order = [r.doc_id for r in rows]
    # dense ranks: 2 (cos 1.0), 3 (0.994), then cos-0 ties 1, 4 by id
    # sparse ranks: 1, then the dl-1 tie 2 before 4 by id
    assert order == [2, 1, 4, 3], rows
    by_id = {r.doc_id: r for r in rows}
    assert (by_id[2].bm25_rank, by_id[2].dense_rank) == (2, 1)
    assert by_id[2].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
    assert by_id[3].bm25_rank is None  # dense-only doc: no sparse term
    assert by_id[3].rrf_score == pytest.approx(1 / 62, abs=1e-9)
    assert 0 not in by_id  # the query vector itself never fuses


def test_privacy_kanon_suppression_reconciles(spark):
    """Cells below k collapse into ONE residual row whose count and
    balance make the release sum to the full population."""
    from curatorhadoopinterface_spark.operators.curation import (
        KANON_K,
        privacy_kanon,
    )

    rows = [(i, f"c{i}", 1, 100.10, "A") for i in range(KANON_K)]
    rows += [(100 + i, f"d{i}", 2, 50.01, "B") for i in range(3)]
    out_dir = _write(
        spark, rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
        "customer", "kanon",
    )
    out = {(r.c_nationkey, r.c_mktsegment): r for r in privacy_kanon(spark, out_dir).collect()}
    assert set(out) == {(1, "A"), (-1, "*")}
    assert out[(1, "A")].n_members == KANON_K
    assert out[(1, "A")].sum_acctbal == pytest.approx(1001.00, abs=1e-9)
    assert out[(-1, "*")].n_members == 3
    assert out[(-1, "*")].sum_acctbal == pytest.approx(150.03, abs=1e-9)


def test_ohlc_endpoints_and_volume(spark):
    """Open/close come from (ts, event_id) order — including a same-ts
    tie broken by event_id — and volume sums exactly."""
    import datetime as dt

    from curatorhadoopinterface_spark.operators.windows import ts_resample_ohlc

    h = dt.datetime(2024, 1, 1, 5)
    rows = [
        (1, h + dt.timedelta(minutes=10), 7, "click", 5.00, "{}"),
        (2, h + dt.timedelta(minutes=5), 7, "click", 3.00, "{}"),
        (3, h + dt.timedelta(minutes=50), 7, "click", 1.00, "{}"),
        # same-ts tie as row 3: higher event_id wins "last"
        (4, h + dt.timedelta(minutes=50), 7, "click", 2.00, "{}"),
    ]
    out_dir = _write(
        spark, rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        "events", "ohlc",
    )
    out = ts_resample_ohlc(spark, out_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close) == (3.00, 5.00, 1.00, 2.00)
    assert (r.n_events, r.volume) == (4, 11.00)


def test_grouped_split_is_atomic_and_hash_stable(spark):
    """Every source lands in exactly one split, and that split is the
    one the documented md5-bucket formula predicts."""
    from curatorhadoopinterface_spark.operators.curation import (
        SPLIT_SEED,
        eval_split_grouped,
    )

    def expected_split(source: str) -> str:
        b = int(hashlib.md5((SPLIT_SEED + source).encode()).hexdigest()[:2], 16)
        return "train" if b < 204 else ("val" if b < 230 else "test")

    sources = [f"dom{i}" for i in range(40)]
    rows = [
        (i * 10 + j, "text", lang, src, 4)
        for i, src in enumerate(sources)
        for j, lang in enumerate(["en", "de"])
    ]
    out_dir = _write(spark, rows, DOC_SCHEMA, "documents", "gsplit")
    out = eval_split_grouped(spark, out_dir).collect()
    want = {s: expected_split(s) for s in sources}
    # census totals per (split, lang) match the python-side assignment
    import collections

    exp = collections.Counter((want[s], lang) for s in sources for lang in ["en", "de"])
    got = {(r.split, r.lang): (r.n_sources, r.n_docs) for r in out}
    assert {k: v[1] for k, v in got.items()} == dict(exp)
    # atomicity: summed distinct-source counts equal the true number of
    # (split, source) assignments — no source straddles splits
    per_split = collections.Counter()
    for r in out:
        per_split[r.split] += r.n_sources
    # each source contributes its n_sources once per lang it appears in
    assert per_split == collections.Counter(
        {sp: 2 * n for sp, n in collections.Counter(want.values()).items()}
    )


def test_mm_dedup_binary_redundancy_math(spark):
    """copies-1 of each duplicated blob are redundant; reclaimable bytes
    count every non-canonical copy at its payload size."""
    from curatorhadoopinterface_spark.operators.multimodal import mm_dedup_binary

    # doc_id % 3 == 0 -> 'image' for ids 0, 3, 6, 9
    docs = [
        (0, "samepayload", "en", "s", 11),
        (3, "samepayload", "en", "s", 11),
        (6, "samepayload", "en", "s", 11),
        (9, "unique", "en", "s", 6),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "mmdedup")
    out = {r.modality: r for r in mm_dedup_binary(spark, out_dir).collect()}
    img = out["image"]
    assert (img.n_payloads, img.n_distinct) == (4, 2)
    assert (img.n_dup_groups, img.n_redundant) == (1, 2)
    assert img.redundant_bytes == 2 * len("samepayload")


def test_waterfill_level_and_remainder(spark):
    """jstar/level/remainder math: small lang fully funded, capped langs
    share the level, remainder +1 goes to the first capped lang by name,
    and the allocations sum exactly to the budget."""
    from curatorhadoopinterface_spark.operators.curation import mixture_waterfill

    # tokens per lang: aa=1, bb=5, cc=6 -> total 12, budget 6
    # jstar=1 (fund aa), level=(6-1) div 2 = 2, rem=1 -> bb 3, cc 2
    docs = [
        (1, "t", "aa", "s", 1),
        (2, "t t t t t", "bb", "s", 9),
        (3, "t t t", "cc", "s", 5),
        (4, "t t t", "cc", "s", 5),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "waterfill")
    out = {r.lang: r for r in mixture_waterfill(spark, out_dir).collect()}
    assert (out["aa"].allocated, out["aa"].capped) == (1, False)
    assert (out["bb"].allocated, out["bb"].capped) == (3, True)
    assert (out["cc"].allocated, out["cc"].capped) == (2, True)
    assert sum(r.allocated for r in out.values()) == 6


def test_attribution_window_and_tie(spark):
    """A purchase credits the most recent PRIOR touch inside the window;
    stale touches fall to organic; a same-ts touch with a smaller
    event_id still counts as prior."""
    import datetime as dt

    from curatorhadoopinterface_spark.operators.windows import (
        ATTR_WINDOW_HOURS,
        attribution_last_touch,
    )

    t0 = dt.datetime(2024, 1, 10, 12)
    rows = [
        # user 1: click 1h before purchase -> attributed to click
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "purchase", 10.0, "{}"),
        # user 2: view OUTSIDE the window -> organic
        (3, t0 - dt.timedelta(hours=ATTR_WINDOW_HOURS + 1), 2, "view", 0.0, "{}"),
        (4, t0, 2, "purchase", 5.0, "{}"),
        # user 3: signup at the SAME ts as the purchase, smaller id -> prior
        (5, t0, 3, "signup", 0.0, "{}"),
        (6, t0, 3, "purchase", 2.0, "{}"),
        # user 4: later click is AFTER the purchase -> organic
        (7, t0 + dt.timedelta(hours=1), 4, "click", 0.0, "{}"),
        (8, t0, 4, "purchase", 1.0, "{}"),
    ]
    out_dir = _write(
        spark, rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        "events", "attrib",
    )
    out = {r.touch_type: r for r in attribution_last_touch(spark, out_dir).collect()}
    assert out["click"].n_purchases == 1 and out["click"].attributed_value == 10.0
    assert out["signup"].n_purchases == 1 and out["signup"].attributed_value == 2.0
    assert out["organic"].n_purchases == 2 and out["organic"].attributed_value == 6.0


def test_vocab_growth_first_occurrence(spark):
    """Vocabulary at a checkpoint counts words whose FIRST occurrence
    falls inside it; later re-occurrences never recount."""
    from curatorhadoopinterface_spark.operators.textstats import text_vocab_growth

    docs = [
        (0, "a b", "en", "s", 3),
        (1, "b c", "en", "s", 3),
        (2, "c d", "en", "s", 3),
        (3, "a e", "en", "s", 3),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "heaps")
    out = {r.pct: r for r in text_vocab_growth(spark, out_dir).collect()}
    assert (out[1].n_docs, out[1].n_tokens, out[1].vocab_size) == (1, 2, 2)
    assert (out[50].n_docs, out[50].n_tokens, out[50].vocab_size) == (2, 4, 3)
    assert (out[100].n_docs, out[100].n_tokens, out[100].vocab_size) == (4, 8, 5)


def test_length_buckets_pow2_and_waste(spark):
    """next_pow2 via the BIN-length identity: 1->1, 2->2, 3->4, 5->8;
    waste is exact floor per-mille."""
    from curatorhadoopinterface_spark.operators.curation import pack_length_buckets

    docs = [
        (1, "t", "en", "s", 1),
        (2, "t t", "en", "s", 3),
        (3, "t t t", "en", "s", 5),
        (4, "t t t t t", "en", "s", 9),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "lenbuck")
    out = {r.bucket: r for r in pack_length_buckets(spark, out_dir).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[4].waste_permille == 250   # (4-3)*1000 // 4
    assert out[8].waste_permille == 375   # (8-5)*1000 // 8
    assert out[1].waste_permille == 0 and out[2].waste_permille == 0


def test_span_corruption_mask_and_spans(spark):
    """The mask replays the documented md5 formula position-by-position,
    and adjacent masked tokens count as ONE span."""
    from curatorhadoopinterface_spark.operators.textstats import (
        MASK_PCT,
        text_span_corruption,
    )

    n_tok, doc_id = 60, 42
    docs = [(doc_id, " ".join(f"w{i}" for i in range(n_tok)), "en", "s", 100)]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "spancorr")
    r = text_span_corruption(spark, out_dir).collect()[0]

    mask = [
        int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:7], 16) % 100
        < MASK_PCT
        for i in range(1, n_tok + 1)
    ]
    n_masked = sum(mask)
    n_spans = sum(
        1 for i in range(n_tok) if mask[i] and (i == 0 or not mask[i - 1])
    )
    assert n_masked > 0  # fixture long enough to mask something
    assert (r.n_tokens, r.n_masked, r.n_spans) == (n_tok, n_masked, n_spans)
