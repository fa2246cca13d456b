"""Planted-fixture semantics for the round-5c operators: boilerplate
segment flagging thresholds, lede-fingerprint source-overlap pairing."""

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


def test_boilerplate_same_doc_repeat_not_flagged(spark):
    """A segment repeated WITHIN one doc is not boilerplate (distinct-doc
    threshold); the same segment in two docs of one source is; a shared
    segment across DIFFERENT sources never is."""
    from curatorhadoopinterface_spark.operators.textstats import text_boilerplate

    nav = "home about contact login search"  # exactly one 5-word segment
    docs = [
        # srcA doc 1+2 share the nav segment -> boilerplate in srcA
        (0, nav + " alpha beta gamma delta eps", "en", "srcA", 1),
        (1, nav + " one two three four five", "en", "srcA", 1),
        # srcB: nav appears TWICE in the SAME doc -> occ 2, docs 1 -> clean
        (2, nav + " " + nav, "en", "srcB", 1),
        # srcC has the nav once -> no second doc, clean
        (3, nav, "en", "srcC", 1),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "boiler")
    out = {r.source: r for r in text_boilerplate(spark, out_dir).collect()}
    a, b, c = out["srcA"], out["srcB"], out["srcC"]
    # srcA: 2 docs x 2 segments; the nav segment flagged in both docs
    assert (a.n_segments, a.n_boiler_segments, a.n_boiler_occurrences) == (4, 1, 2)
    assert a.boiler_ratio == 0.5
    # srcB: two occurrences of one segment but ONE doc -> nothing flagged
    assert (b.n_segments, b.n_distinct_segments, b.n_boiler_occurrences) == (2, 1, 0)
    assert (c.n_boiler_segments, c.n_boiler_occurrences) == (0, 0)


def test_boilerplate_short_tail_segment(spark):
    """Docs shorter than one segment width still produce exactly one
    (clipped) segment — ceil sizing, slice clipping."""
    from curatorhadoopinterface_spark.operators.textstats import text_boilerplate

    docs = [(0, "just three words", "en", "s", 1),
            (1, "just three words", "en", "s", 1)]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "boiler_tail")
    r = text_boilerplate(spark, out_dir).collect()[0]
    assert (r.n_segments, r.n_distinct_segments) == (2, 1)
    assert r.n_boiler_occurrences == 2  # the clipped segment matched across docs


def test_source_overlap_lede_fingerprint(spark):
    """Overlap keys on the FIRST-10-WORD lede: two sources sharing a lede
    with different tails still pair; differing ledes never pair; the pair
    is emitted once with src_a < src_b and per-side doc counts."""
    from curatorhadoopinterface_spark.operators.dedup import dedup_source_overlap

    lede = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = [
        (0, lede + " tail from feedA", "en", "feedA", 1),
        (1, lede + " completely different tail", "en", "feedB", 1),
        (2, lede + " third copy same feedB", "en", "feedB", 1),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 unique", "en", "feedC", 1),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "overlap")
    rows = dedup_source_overlap(spark, out_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b) == ("feedA", "feedB")
    assert (r.n_shared_contents, r.n_docs_a, r.n_docs_b) == (1, 1, 2)


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_emb_outliers_fixed_point_census(spark):
    """Centroid is the per-dim floor-mean of quantized components; the
    planted far vector is flagged, the tight cluster is not."""
    from curatorhadoopinterface_spark.operators.mlops import (
        _EMB_DIM,
        emb_outliers,
    )

    # centroid of cluster 0 = 0.2 per dim; base dist2 = 64*0.1^2 = 0.64
    # (under the 1.03 cut), far dist2 = 64*0.3^2 = 5.76 (flagged)
    base = [0.1] * _EMB_DIM
    far = [0.5] * _EMB_DIM
    embs = [
        (0, base, 0),
        (1, base, 0),
        (2, base, 0),
        (3, far, 0),
        (4, base, 1),  # singleton cluster: zero distance, never flagged
    ]
    out_dir = _write(spark, embs, EMB_SCHEMA, "embeddings", "outliers")
    out = {r.label: r for r in emb_outliers(spark, out_dir).collect()}
    assert out[0].n_vecs == 4 and out[0].n_outliers == 1
    assert out[1].n_vecs == 1 and out[1].n_outliers == 0
    assert out[1].min_dist2 == 0.0 and out[1].max_dist2 == 0.0
    # cluster 0 centroid sits 1/4 of the way to the far vector; the
    # three base vectors share one exact min distance
    assert out[0].min_dist2 < out[0].max_dist2


def test_pmi_collocation_outranks_frequency(spark):
    """A pair that ALWAYS co-occurs (low unigram counts) outranks a
    frequent-but-independent pair; support < 5 is dropped."""
    from curatorhadoopinterface_spark.operators.textstats import text_pmi_bigrams

    # "hong kong" appears 5x, each word ONLY in that bigram;
    # "the cat" appears 6x but 'the' also floods the corpus solo-adjacent
    # to other words; "rare pair" appears 4x -> below support floor.
    docs = []
    for i in range(5):
        docs.append((i, "hong kong filler" + str(i) + " end", "en", "s", 1))
    for i in range(6):
        docs.append((10 + i, "the cat the dog the fox", "en", "s", 1))
    for i in range(4):
        docs.append((20 + i, "rare pair", "en", "s", 1))
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "pmi")
    rows = text_pmi_bigrams(spark, out_dir).collect()
    names = [(r.w1, r.w2) for r in rows]
    assert ("rare", "pair") not in names           # support floor
    assert names.index(("hong", "kong")) < names.index(("the", "cat"))
    hk = next(r for r in rows if (r.w1, r.w2) == ("hong", "kong"))
    assert hk.c_ab == 5 and hk.c_a == 5 and hk.c_b == 5


def test_contamination_semantic_bucket_gate(spark):
    """A corpus vector identical to a benchmark vector is contaminated;
    one in a DIFFERENT sign bucket is invisible even at cosine 1.0 with
    nothing; census per-mille is exact integer division."""
    from curatorhadoopinterface_spark.operators.curation import (
        contamination_semantic,
    )
    from curatorhadoopinterface_spark.operators.mlops import _EMB_DIM

    bench = [1.0] * _EMB_DIM            # vec_id 100 -> eval slice
    same = [1.0] * _EMB_DIM             # exact copy -> contaminated
    flipped = [-1.0] * 8 + [1.0] * (_EMB_DIM - 8)  # other bucket
    embs = [
        (100, bench, 0),   # benchmark (vec_id % 100 == 0)
        (1, same, 0),      # hit
        (2, flipped, 0),   # bucket-gated away despite high |cos|
        (3, same, 1),      # hit in another label
    ]
    out_dir = _write(spark, embs, EMB_SCHEMA, "embeddings", "sem_contam")
    out = {r.label: r for r in contamination_semantic(spark, out_dir).collect()}
    assert (out[0].n_corpus, out[0].n_contaminated) == (2, 1)
    assert out[0].contamination_permille == 500
    assert (out[1].n_corpus, out[1].n_contaminated) == (1, 1)
    assert out[1].contamination_permille == 1000


CUST_SCHEMA = (
    "c_custkey long, c_name string, c_address string, c_nationkey int,"
    " c_phone string, c_acctbal double, c_mktsegment string, c_comment string"
)


def test_ldiversity_homogeneity_gate(spark):
    """A cell with k members but ONE balance bracket is NOT released
    (homogeneity attack); the same size with 3 brackets is."""
    from curatorhadoopinterface_spark.operators.curation import (
        KANON_K,
        privacy_ldiversity,
    )

    rows = []
    # cell (1, HOMOG): k members, all in bracket 1 -> suppressed
    for i in range(KANON_K):
        rows.append((i, "n", "a", 1, "p", 1500.0, "HOMOG", "c"))
    # cell (2, DIVERSE): k members across brackets 0/1/2 -> released
    for i in range(KANON_K):
        rows.append((100 + i, "n", "a", 2, "p", float(500 + (i % 3) * 1000), "DIVERSE", "c"))
    # cell (3, SMALL): diverse but k-1 members -> suppressed
    for i in range(KANON_K - 1):
        rows.append((200 + i, "n", "a", 3, "p", float(500 + (i % 3) * 1000), "SMALL", "c"))
    out_dir = _write(spark, rows, CUST_SCHEMA, "customer", "ldiv")
    out = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in privacy_ldiversity(spark, out_dir).collect()
    }
    assert out[(1, "HOMOG")].n_sensitive_values == 1
    assert out[(1, "HOMOG")].released is False
    assert out[(2, "DIVERSE")].n_sensitive_values == 3
    assert out[(2, "DIVERSE")].released is True
    assert out[(3, "SMALL")].released is False


EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_events_debounce_window(spark):
    """An event 60s or less after its same-key predecessor is suppressed;
    the gap chains off the PREVIOUS event (not the last kept one), and
    other keys never interact."""
    from curatorhadoopinterface_spark.operators.windows import events_dedup_window

    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "click", 10.0, "{}"),
        (2, _ts("2024-01-01 00:00:30"), 1, "click", 5.0, "{}"),   # +30s dup
        (3, _ts("2024-01-01 00:01:15"), 1, "click", 7.0, "{}"),   # +45s after PREV dup -> dup
        (4, _ts("2024-01-01 00:05:00"), 1, "click", 2.0, "{}"),   # +225s kept
        (5, _ts("2024-01-01 00:00:10"), 2, "click", 1.0, "{}"),   # other user: kept
        (6, _ts("2024-01-01 00:00:20"), 1, "view", 3.0, "{}"),    # other type: kept
    ]
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "debounce")
    out = {r.event_type: r for r in events_dedup_window(spark, out_dir).collect()}
    c = out["click"]
    assert (c.n_events, c.n_suppressed, c.n_kept) == (5, 2, 3)
    assert c.kept_value == 13.0  # 10 + 2 + 1
    assert out["view"].n_suppressed == 0


def test_gap_census_shard_boundaries(spark):
    """Gaps that straddle the 1-hour shard boundary are found by the
    summary-table lag — the two-level plan reproduces the global-window
    multiset (events placed in different hours on purpose)."""
    from curatorhadoopinterface_spark.operators.windows import ts_gap_census

    rows = [
        (1, _ts("2024-01-01 00:10:00"), 1, "ping", 0.0, "{}"),
        (2, _ts("2024-01-01 00:12:00"), 1, "ping", 0.0, "{}"),   # 2min intra
        # 3h48m boundary gap spanning three empty shards
        (3, _ts("2024-01-01 04:00:00"), 1, "ping", 0.0, "{}"),
        (4, _ts("2024-01-01 04:59:59"), 1, "ping", 0.0, "{}"),   # 59m59s intra
        (5, _ts("2024-01-01 05:00:01"), 1, "ping", 0.0, "{}"),   # 2s boundary
    ]
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "gaps")
    r = ts_gap_census(spark, out_dir).collect()[0]
    assert r.n_events == 5
    # gaps: 120s, 13680s, 3599s, 2s -> two above the 600s cut
    assert r.n_gaps_over == 2
    assert r.max_gap_us == 13_680 * 1_000_000


def test_method_agreement_pair_set_jaccard(spark):
    """Planted corpus where one pair is a text near-dup AND an embedding
    near-dup, one is text-only, one is embedding-only: agreement is
    exactly 1/3 in per-mille."""
    from curatorhadoopinterface_spark.operators.dedup import dedup_method_agreement
    from curatorhadoopinterface_spark.operators.mlops import _EMB_DIM

    dup_text = "spark shuffles partitions across the cluster " * 4
    docs = [
        (0, dup_text, "en", "s", 1),
        (1, dup_text, "en", "s", 1),          # text pair (0,1)
        (2, "totally different words here one", "en", "s", 1),
        (3, "unrelated corpus text two three four", "en", "s", 1),
    ]
    v = [1.0] * _EMB_DIM
    far = [1.0] * 8 + [-1.0] * (_EMB_DIM - 8)   # same bucket as v, cos < 0
    other = [-1.0] * _EMB_DIM                   # different bucket
    embs = [
        (0, v, 0),
        (1, v, 0),       # embed pair (0,1) -> agreement with text
        (2, v, 0),       # embed pairs (0,2) and (1,2) -> embed-only
        (3, other, 0),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "agree")
    _write(spark, embs, EMB_SCHEMA, "embeddings", "agree")
    r = dedup_method_agreement(spark, out_dir).collect()[0]
    assert r.n_minhash_pairs == 1
    assert r.n_embed_pairs == 3
    assert r.n_both == 1
    assert r.agreement_permille == 1000 // 3


def test_rolling_actives_coverage_trick(spark):
    """A user active on two days inside one 3-day window counts ONCE in
    the rolling distinct; phantom days past the data edge are dropped."""
    from curatorhadoopinterface_spark.operators.advanced import (
        events_rolling_actives,
    )

    rows = [
        # user 1 active on day1 AND day2; user 2 only day1; user 3 only day3
        (1, _ts("2024-01-01 10:00:00"), 1, "click", 0.0, "{}"),
        (2, _ts("2024-01-02 10:00:00"), 1, "click", 0.0, "{}"),
        (3, _ts("2024-01-01 11:00:00"), 2, "click", 0.0, "{}"),
        (4, _ts("2024-01-03 09:00:00"), 3, "click", 0.0, "{}"),
    ]
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "rolling")
    out = {str(r.day): r for r in events_rolling_actives(spark, out_dir).collect()}
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert out["2024-01-01"].dau == 2 and out["2024-01-01"].actives_3d == 2
    # day2 window covers day1+day2: users {1,2} -> user 1 counted once
    assert out["2024-01-02"].dau == 1 and out["2024-01-02"].actives_3d == 2
    # day3 window covers days 1-3: users {1,2,3}
    assert out["2024-01-03"].dau == 1 and out["2024-01-03"].actives_3d == 3
    assert out["2024-01-03"].stickiness_permille == 333


def test_partition_balance_planted_skew(spark):
    """All rows on one key -> one bucket holds everything: the census
    reports 1 bucket used and 1000 per-mille top share."""
    from curatorhadoopinterface_spark.operators.advanced import (
        diag_partition_balance,
    )

    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate date"
    )
    import datetime

    d = datetime.date(2024, 1, 1)
    rows = [(7, i, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d) for i in range(50)]
    out_dir = _write(spark, rows, li_schema, "lineitem", "balance")
    r = diag_partition_balance(spark, out_dir).collect()[0]
    assert r.n_buckets_used == 1
    assert r.n_rows == 50 and r.max_rows == 50
    assert r.top_share_permille == 1000
    # max vs the even share (50/32 -> floor 1): heavily over
    assert r.max_vs_even_permille == 50 * 1000


def test_orders_backlog_eventization(spark):
    """Backlog = running sum of +1 at placement month / -1 the month
    after last shipment; an order spanning several months stays open in
    each; multi-lineitem orders close at the LATEST ship month."""
    from curatorhadoopinterface_spark.operators.analytics import orders_backlog

    import datetime

    O_SCHEMA = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    L_SCHEMA = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date"
    )

    def ts(y, m, d):
        return datetime.datetime(y, m, d)

    def dt(y, m, d):
        return datetime.date(y, m, d)

    orders = [
        (1, 1, "O", 1.0, ts(2024, 1, 5), "1-URGENT"),   # ships Jan+Mar
        (2, 1, "O", 1.0, ts(2024, 2, 1), "1-URGENT"),   # ships Feb
    ]
    items = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 1, 20)),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 3, 10)),
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 2, 15)),
    ]
    out_dir = _write(spark, orders, O_SCHEMA, "orders", "backlog")
    _write(spark, items, L_SCHEMA, "lineitem", "backlog")
    out = {str(r.month): r for r in orders_backlog(spark, out_dir).collect()}
    # Jan: order 1 opens. Feb: order 2 opens. Mar: order 2 closed.
    # Apr: order 1 closed (latest ship month Mar -> -1 lands in Apr).
    assert out["2024-01-01"].backlog == 1
    assert out["2024-02-01"].backlog == 2
    assert out["2024-03-01"].backlog == 1   # order 2 closed, order 1 open
    assert out["2024-04-01"].backlog == 0
    assert out["2024-04-01"].closed == 1


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: Jaccard is tiny but
    containment fires; two unrelated docs never pair."""
    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_containment,
        dedup_minhash,
    )

    # Fixture chosen so the pair IS an LSH candidate (bands 0 and 2 of
    # the minhash signatures match — verified by replaying the md5+
    # affine chain offline) while Jaccard = 8/17 = 0.471 < 0.5, i.e.
    # below dedup_minhash's emit threshold. Containment of the quote
    # is 8/8 = 1.0. LSH banding is deterministic (md5), so this holds
    # on every run.
    quote = "the quick brown fox jumps over the lazy dog today"
    filler = " ".join(f"w0x{i}" for i in range(9))
    docs = [
        (0, quote, "en", "s", 1),                      # the short original
        (1, quote + " " + filler, "en", "s", 1),       # quotes doc 0 verbatim
        (2, "completely unrelated text body here now", "en", "s", 1),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "contain")
    rows = dedup_containment(spark, out_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r.contain_a == 1.0           # every shingle of the quote is in doc 1
    assert r.contain_b < 0.5
    assert not any(2 in p for p in pairs)
    # and symmetric Jaccard at 0.5 does NOT pair them
    jrows = dedup_minhash(spark, out_dir).collect()
    assert all((r.doc_a, r.doc_b) != (0, 1) for r in jrows)


def test_degree_distribution_buckets(spark):
    """Floor-pow2 bucketing of degrees on a planted K4 + pendant-free
    graph: every K4 node has degree 3 -> bucket 2."""
    from curatorhadoopinterface_spark.operators.analytics import (
        graph_degree_distribution,
    )

    import datetime

    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate date"
    )
    d = datetime.date(2024, 1, 1)
    rows = []
    oid = 0
    # each pair of parts {1..4} co-occurs in TWO orders -> K4, degree 3 each
    for a in range(1, 5):
        for b in range(a + 1, 5):
            for _ in range(2):
                rows.append((oid, a, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
                rows.append((oid, b, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
                oid += 1
    out_dir = _write(spark, rows, li_schema, "lineitem", "degdist")
    out = {r.degree_bucket: r for r in graph_degree_distribution(spark, out_dir).collect()}
    assert set(out) == {2}
    assert out[2].n_nodes == 4
    assert out[2].min_degree == 3 and out[2].max_degree == 3
    assert out[2].sum_degree == 12


def test_zipf_slope_planted_power_law(spark):
    """A corpus built so count(rank r) = 2^(10-r) has slope exactly
    -ln(2) on the log-log fit (perfect power law with base-2 decay)."""
    from curatorhadoopinterface_spark.operators.textstats import text_zipf_slope

    import math

    docs = []
    did = 0
    for r in range(1, 9):          # 8 terms, counts 2^8 .. 2^1
        word = f"t{r}"
        text = " ".join([word] * (2 ** (9 - r)))
        docs.append((did, text, "en", "s", 1))
        did += 1
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "zipf")
    r = text_zipf_slope(spark, out_dir).collect()[0]
    assert r.n_terms == 8
    # ln(count) = ln(2)*(9-rank)... but x-axis is ln(rank), not rank:
    # this fixture is geometric in RANK, so the fit slope is the
    # regression of a convex curve — pin the sign and the exact value
    # computed offline from the same closed-form sums
    xs = [math.log(i) for i in range(1, 9)]
    ys = [math.log(2 ** (9 - i)) for i in range(1, 9)]
    n = 8
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    expect = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert abs(r.zipf_slope - expect) < 1e-5
    assert r.zipf_slope < 0


def test_prf_expansion_changes_ranking(spark):
    """A doc with NO original query terms but saturated in the feedback
    set's co-occurring vocabulary enters the PRF top-10; expansion terms
    are the most frequent NEW terms of the pass-1 winners."""
    from curatorhadoopinterface_spark.operators.retrieval import (
        query_bm25,
        query_bm25_prf,
    )

    docs = []
    # 5 feedback winners: original terms + the co-occurring term "shuffle"
    for i in range(5):
        docs.append((i, "spark join filter shuffle shuffle", "en", "s", 1))
    # the PRF catch: no original term at all, pure "shuffle"
    docs.append((10, "shuffle shuffle shuffle shuffle", "en", "s", 1))
    # background noise docs (unique words, no overlap)
    for i in range(20, 40):
        docs.append((i, f"n{i}a n{i}b n{i}c n{i}d", "en", "s", 1))
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "prf")
    base_ids = {r.doc_id for r in query_bm25(spark, out_dir).collect()}
    prf = query_bm25_prf(spark, out_dir).collect()
    prf_ids = {r.doc_id for r in prf}
    assert 10 not in base_ids          # invisible to the fixed query
    assert 10 in prf_ids               # surfaced by the expansion
    ten = next(r for r in prf if r.doc_id == 10)
    assert ten.n_terms_matched == 1    # matched only the expansion term
    assert ten.score > 0


def test_referential_audit_counts_orphans(spark):
    """A lineitem pointing at a missing order is an orphan; intact edges
    report zero."""
    from curatorhadoopinterface_spark.operators.relational import (
        audit_referential,
    )

    import datetime

    d, t = datetime.date(2024, 1, 1), datetime.datetime(2024, 1, 1)
    _write(spark, [(1, 1, "O", 1.0, t, "1-URGENT")],
           "o_orderkey long, o_custkey long, o_orderstatus string,"
           " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
           "orders", "fk")
    out_dir = _write(
        spark,
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
         (9, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)],  # order 9 missing
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
        "lineitem", "fk")
    _write(spark, [(1, "n", "a", 0, "p", 1.0, "B", "c")],
           "c_custkey long, c_name string, c_address string, c_nationkey int,"
           " c_phone string, c_acctbal double, c_mktsegment string,"
           " c_comment string", "customer", "fk")
    _write(spark, [(0, "NATION", 0, "c")],
           "n_nationkey int, n_name string, n_regionkey int, n_comment string",
           "nation", "fk")
    _write(spark, [(1, "s", "a", 7, "p", 1.0, "c")],
           "s_suppkey long, s_name string, s_address string, s_nationkey int,"
           " s_phone string, s_acctbal double, s_comment string",
           "supplier", "fk")
    out = {r.relation: r for r in audit_referential(spark, out_dir).collect()}
    assert out["lineitem->orders"].n_orphans == 1
    assert out["orders->customer"].n_orphans == 0
    assert out["customer->nation"].n_orphans == 0
    assert out["supplier->nation"].n_orphans == 1  # nation 7 missing


def test_fulfillment_latency_and_anomaly(spark):
    """First-ship (not last-ship) defines latency; a line shipped before
    its order date counts as a pre-ship anomaly with negative days."""
    from curatorhadoopinterface_spark.operators.analytics import (
        orders_fulfillment_latency,
    )

    import datetime

    t, dt = datetime.datetime, datetime.date
    _write(spark, [
        (1, 1, "O", 1.0, t(2024, 1, 10), "1-URGENT"),
        (2, 1, "O", 1.0, t(2024, 1, 10), "1-URGENT"),
    ], "o_orderkey long, o_custkey long, o_orderstatus string,"
       " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
       "orders", "sla")
    out_dir = _write(spark, [
        # order 1: ships day+5 and day+20 -> latency 5
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 1, 15)),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 1, 30)),
        # order 2: shipped 3 days BEFORE the order date -> anomaly, -3
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt(2024, 1, 7)),
    ], "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
       " l_quantity double, l_extendedprice double, l_discount double,"
       " l_tax double, l_returnflag string, l_linestatus string,"
       " l_shipdate date", "lineitem", "sla")
    r = orders_fulfillment_latency(spark, out_dir).collect()[0]
    assert (r.n_orders, r.min_days, r.max_days) == (2, -3, 5)
    assert r.median_days == 1.0      # (-3 + 5) / 2
    assert r.n_preship_anomalies == 1


def test_mixture_drift_duplicated_language_shrinks(spark):
    """A language whose corpus is pure duplicates loses share after
    dedup; shares are integer per-mille of the respective totals."""
    from curatorhadoopinterface_spark.operators.curation import (
        mixture_dedup_drift,
    )

    docs = [
        (0, "a b c d", "en", "s", 1),      # en: 3 copies of 4 tokens
        (1, "a b c d", "en", "s", 1),
        (2, "a b c d", "en", "s", 1),
        (3, "x y z w", "zh", "s", 1),      # zh: 1 unique doc of 4 tokens
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "mixdrift")
    out = {r.lang: r for r in mixture_dedup_drift(spark, out_dir).collect()}
    en, zh = out["en"], out["zh"]
    assert (en.toks_before, en.toks_after) == (12, 4)
    assert (zh.toks_before, zh.toks_after) == (4, 4)
    assert en.share_before_permille == 750 and en.share_after_permille == 500
    assert zh.share_before_permille == 250 and zh.share_after_permille == 500
    assert en.drift_permille == -250 and zh.drift_permille == 250


def test_asof_nearest_direction_and_ties(spark):
    """Nearest picks the closer side; exact ties go backward; an order
    at the event instant is backward with delta 0; outside the 7-day
    tolerance on both sides -> none."""
    from curatorhadoopinterface_spark.operators.relational import (
        join_asof_nearest,
    )

    import datetime

    t = datetime.datetime
    _write(spark, [
        (1, 7, "O", 1.0, t(2024, 1, 1, 0, 0, 0), "1"),   # uid 7
        (2, 7, "O", 1.0, t(2024, 1, 1, 4, 0, 0), "1"),
        (3, 8, "O", 1.0, t(2024, 1, 1, 0, 0, 0), "1"),   # uid 8: tie setup
        (4, 8, "O", 1.0, t(2024, 1, 1, 2, 0, 0), "1"),
        (5, 9, "O", 1.0, t(2023, 1, 1, 0, 0, 0), "1"),   # uid 9: far away
    ], "o_orderkey long, o_custkey long, o_orderstatus string,"
       " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
       "orders", "asofn")
    out_dir = _write(spark, [
        # uid 7 at 03:00 -> backward 3h vs forward 1h: forward wins
        (100, t(2024, 1, 1, 3, 0, 0), 7, "click", 0.0, "{}"),
        # uid 8 at 01:00 -> 1h both sides: tie -> backward
        (101, t(2024, 1, 1, 1, 0, 0), 8, "click", 0.0, "{}"),
        # uid 8 at exactly an order instant -> backward, delta 0
        (102, t(2024, 1, 1, 2, 0, 0), 8, "click", 0.0, "{}"),
        # uid 9: only order is a year away -> none
        (103, t(2024, 1, 1, 0, 0, 0), 9, "click", 0.0, "{}"),
    ], EVENT_SCHEMA, "events", "asofn")
    out = {r.event_id: r for r in join_asof_nearest(spark, out_dir).collect()}
    assert out[100].direction == "forward"
    assert out[100].delta_us == 3600 * 1_000_000
    assert out[101].direction == "backward"
    assert out[101].delta_us == 3600 * 1_000_000
    assert out[102].direction == "backward" and out[102].delta_us == 0
    assert out[103].direction == "none" and out[103].delta_us is None


def test_minhash_recall_counts(spark):
    """Exact-duplicate pairs in the sample are both truth and LSH-found
    (identical signatures always share every band): recall 1000 on a
    pure-duplicate fixture; a near-miss pair (J < 0.5) is neither."""
    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_minhash_recall,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (0, dup, "en", "s", 1),          # doc 0 -> in the 10% sample
        (1, dup, "en", "s", 1),          # exact dup of 0
        (10, dup, "en", "s", 1),         # also sampled, also dup
        (3, "one two three four five six seven", "en", "s", 1),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "mhrecall")
    r = dedup_minhash_recall(spark, out_dir).collect()[0]
    # directed truth pairs from sampled docs {0, 10}: 0->1, 0->10,
    # 10->0, 10->1 = 4; identical sigs band-match, so all are found
    assert r.n_truth == 4
    assert r.n_found == 4
    assert r.recall_permille == 1000


def test_langid_confusion_cells(spark):
    """Diagonal cells carry the correctly-identified docs; an en-looking
    doc labeled zh lands in the (zh, en) off-diagonal cell with an exact
    per-mille rate."""
    from curatorhadoopinterface_spark.operators.textstats import (
        text_langid_confusion,
    )

    en_text = "the of and to in is it for " * 3       # English stopwords
    docs = [
        (0, en_text, "en", "s", 1),
        (1, en_text, "en", "s", 1),
        (2, en_text, "zh", "s", 1),   # mislabeled: predicted en
        (3, en_text, "zh", "s", 1),
        (4, en_text + " extra", "zh", "s", 1),
    ]
    out_dir = _write(spark, docs, DOC_SCHEMA, "documents", "langconf")
    out = {(r.actual_lang, r.pred_lang): r
           for r in text_langid_confusion(spark, out_dir).collect()}
    assert out[("en", "en")].n_docs == 2
    assert out[("en", "en")].correct is True
    assert out[("zh", "en")].n_docs == 3
    assert out[("zh", "en")].cell_permille == 1000
    assert out[("zh", "en")].correct is False


def test_cohort_ltv_accumulation(spark):
    """Age is integer month arithmetic from the customer's FIRST order;
    cum_revenue accumulates exactly within the cohort."""
    from curatorhadoopinterface_spark.operators.analytics import (
        orders_cohort_ltv,
    )

    import datetime

    t = datetime.datetime
    out_dir = _write(spark, [
        # customer 1: first order Jan, repeat in Mar (age 2)
        (1, 1, "O", 100.00, t(2024, 1, 15), "1"),
        (2, 1, "O", 50.00, t(2024, 3, 2), "1"),
        # customer 2: first order Jan too -> same cohort, age 0
        (3, 2, "O", 25.00, t(2024, 1, 31), "1"),
        # customer 3: cohort Feb
        (4, 3, "O", 10.00, t(2024, 2, 1), "1"),
    ], "o_orderkey long, o_custkey long, o_orderstatus string,"
       " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
       "orders", "ltv")
    out = {(str(r.cohort_month), r.age_months): r
           for r in orders_cohort_ltv(spark, out_dir).collect()}
    jan0 = out[("2024-01-01", 0)]
    assert jan0.n_orders == 2 and jan0.revenue == 125.0
    assert jan0.cum_revenue == 125.0
    jan2 = out[("2024-01-01", 2)]
    assert jan2.revenue == 50.0 and jan2.cum_revenue == 175.0
    feb0 = out[("2024-02-01", 0)]
    assert feb0.cum_revenue == 10.0
    assert ("2024-01-01", 1) not in out   # no orders at age 1


def test_ab_test_planted_effect(spark):
    """A planted mean shift between the parity groups produces the
    closed-form Welch t (replayed offline from the same integer
    sufficient statistics); equal groups are not significant."""
    from curatorhadoopinterface_spark.operators.advanced import events_ab_test

    import math

    rows = []
    # group A (even users): values 10.00 +- 1; group B (odd): 12.00 +- 1
    eid = 0
    for i in range(50):
        rows.append((eid, _ts("2024-01-01 00:00:00"), 2 * i, "x",
                     10.0 + (i % 3) - 1, "{}")); eid += 1
        rows.append((eid, _ts("2024-01-01 00:00:00"), 2 * i + 1, "x",
                     12.0 + (i % 3) - 1, "{}")); eid += 1
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "abtest")
    r = events_ab_test(spark, out_dir).collect()[0]
    assert (r.n_a, r.n_b) == (50, 50)
    # offline replay: qv cents, var of {900,1000,1100}-ish pattern
    qa = [1000 + ((i % 3) - 1) * 100 for i in range(50)]
    qb = [1200 + ((i % 3) - 1) * 100 for i in range(50)]
    def stats(q):
        n, s, ss = len(q), sum(q), sum(x * x for x in q)
        m = s * 1.0 / n
        v = (ss - s * 1.0 * s / n) / (n - 1)
        return n, m, v
    na, ma, va = stats(qa); nb, mb, vb = stats(qb)
    assert r.mean_a == round(ma / 100, 6)   # 9.98: 50 % 3 != 0
    assert r.mean_b == round(mb / 100, 6)
    expect = round((ma - mb) / math.sqrt(va / na + vb / nb), 6)
    assert r.t_stat == expect
    assert r.significant is True


def test_ab_test_degenerate_split_yields_null_t(spark):
    """An arm with a single observation (variance undefined) and a
    zero-variance split must both report t_stat NULL and
    significant=False — never Inf/NaN (the ADVICE r5 guard)."""
    from curatorhadoopinterface_spark.operators.advanced import events_ab_test

    # B arm has exactly one row: n_b = 1 -> v_b undefined
    rows = [
        (0, _ts("2024-01-01 00:00:00"), 0, "x", 10.0, "{}"),
        (1, _ts("2024-01-01 00:00:00"), 2, "x", 11.0, "{}"),
        (2, _ts("2024-01-01 00:00:00"), 1, "x", 12.0, "{}"),
    ]
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "abtest_degen")
    r = events_ab_test(spark, out_dir).collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.t_stat is None and r.significant is False

    # both arms constant: variances exactly zero -> guard trips on the
    # pooled-variance > 0 clause
    rows = [
        (0, _ts("2024-01-01 00:00:00"), 0, "x", 10.0, "{}"),
        (1, _ts("2024-01-01 00:00:00"), 2, "x", 10.0, "{}"),
        (2, _ts("2024-01-01 00:00:00"), 1, "x", 12.0, "{}"),
        (3, _ts("2024-01-01 00:00:00"), 3, "x", 12.0, "{}"),
    ]
    out_dir = _write(spark, rows, EVENT_SCHEMA, "events", "abtest_zerovar")
    r = events_ab_test(spark, out_dir).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.t_stat is None and r.significant is False
