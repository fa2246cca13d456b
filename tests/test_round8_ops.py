"""Round-8 invariants: short-doc shingle guard, PSI integer path."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def test_shingle_explode_drops_sub3_word_docs(spark):
    """Docs under 3 words have NO 3-gram: both the engine and the
    oracle recipe must emit zero shingles for them (r7 ADVICE
    dedup.py:1974 — unguarded, Spark's concat_ws emitted a degenerate
    short gram while DuckDB's || NULL-propagated into zero rows)."""
    from curatorhadoopinterface_spark.operators.dedup import (
        _SHINGLES_ORACLE,
        shingle_explode,
    )

    docs = [(1, "one two"), (2, "solo"), (3, "alpha beta gamma delta")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.doc_id, r.shingle) for r in shingle_explode(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {_SHINGLES_ORACLE} SELECT doc_id, shingle FROM shingles"
        ).fetchall()
    }
    assert got == want
    assert got == {
        (3, "alpha beta gamma"),
        (3, "beta gamma delta"),
    }


def test_drift_psi_integer_end_to_end(spark):
    """psi_micro must stay BIGINT through the window sum — no double
    hop that would lose exactness past 2^53 (r7 ADVICE stats.py:953)."""
    from curatorhadoopinterface_spark.operators.stats import drift_psi

    df = drift_psi(spark, SF)
    dtypes = dict(df.dtypes)
    assert dtypes["psi_micro"] == "bigint"
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(psi_micro" not in plan.lower()
    rows = df.collect()
    assert len(rows) >= 2
    psi = {r.psi_micro for r in rows}
    assert len(psi) == 1  # window over () -> one global PSI


def test_minhash_class_form_equals_pair_form_under_duplication(spark, tmp_path):
    """The class-form expansion is EXACT: on a corpus where every doc
    appears 3x, sum(n_doc_pairs) of dedup_minhash_classes equals the
    pair dump's row count, and every dumped pair maps into a class row."""
    import pyspark.sql.functions as F

    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_minhash,
        dedup_minhash_classes,
    )
    from curatorhadoopinterface_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    n = docs.count()
    tripled = docs
    for k in (1, 2):
        tripled = tripled.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000 * k))
        )
    sf = str(tmp_path)
    tripled.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    pairs = dedup_minhash(spark, sf).collect()
    classes = dedup_minhash_classes(spark, sf).collect()

    assert sum(r.n_doc_pairs for r in classes) == len(pairs)
    # duplication produced within-class rows: 3 copies -> C(3,2)=3 each
    within = [r for r in classes if r.rep_a == r.rep_b]
    assert within and all(
        r.jac_permille == 1000 and r.n_doc_pairs == 3 for r in within
    )
    assert len(within) <= n
    # every dumped doc pair lands in exactly the class row its reps name
    rep_of = {
        r.doc_id: r.rep
        for r in tripled.groupBy("text")
        .agg(
            F.min("doc_id").alias("rep"),
            F.collect_list("doc_id").alias("ids"),
        )
        .select(F.explode("ids").alias("doc_id"), "rep")
        .collect()
    }
    class_rows = {(r.rep_a, r.rep_b) for r in classes}
    for p in pairs:
        ra, rb = sorted((rep_of[p.doc_a], rep_of[p.doc_b]))
        assert (ra, rb) in class_rows
    # cross rows respect the verify threshold and canonical ordering
    for r in classes:
        if r.rep_a != r.rep_b:
            assert r.jac_permille >= 500 and r.rep_a < r.rep_b


def test_jpeg_codec_roundtrip_and_structure():
    """The baseline JPEG codec: exact roundtrip on the fixture contract
    (block-constant + planted AC decodes to the precomputed block sums),
    byte stuffing exercised on real streams, general-decoder guards."""
    import pytest

    from curatorhadoopinterface_spark.operators.multimodal import (
        _jpeg_lut,
        _jpg_block_params,
        decode_jpeg_pixels,
        make_jpeg,
    )

    lut = {(ci, ai, par): s for ci, ai, par, s in _jpeg_lut()}
    stuffed = 0
    for doc_id in range(0, 120):
        w, h = 8 * (1 + doc_id % 4), 8 * (1 + doc_id % 3)
        data = make_jpeg(w, h, doc_id)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        if b"\xff\x00" in data[data.find(b"\xff\xda"):]:
            stuffed += 1
        w2, h2, px = decode_jpeg_pixels(data)
        assert (w2, h2) == (w, h)
        want = sum(
            lut[(*_jpg_block_params(bx, by, doc_id)[:2], doc_id % 2)]
            for by in range(h // 8)
            for bx in range(w // 8)
        )
        assert sum(px) == want
    # the 0xFF-stuffing decode path runs on a majority of real streams
    # (EOB carries the all-ones code so flush padding completes 0xFF)
    assert stuffed > 40

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x00\x01")
    # progressive (SOF2) must be rejected, not mis-decoded
    prog = bytearray(make_jpeg(8, 8, 0))
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_pixels(bytes(prog))


def test_jpeg_decoder_handles_negative_and_run_ac():
    """Odd doc_ids plant the AC at zigzag 5 via a run-4 symbol; even at
    zigzag 1 run-0; both signs of the magnitude occur across blocks —
    check a decoded image pixel-by-pixel against the IDCT replay."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        _ZIGZAG,
        _idct_block,
        _JPG_QAC,
        _JPG_QDC,
        _jpg_block_params,
        decode_jpeg_pixels,
        make_jpeg,
    )

    for doc_id in (7, 16):  # odd: run-4 path; even: run-0 path
        w, h = 8 * (1 + doc_id % 4), 8 * (1 + doc_id % 3)
        _, _, px = decode_jpeg_pixels(make_jpeg(w, h, doc_id))
        for by in range(h // 8):
            for bx in range(w // 8):
                ci, ai, pos = _jpg_block_params(bx, by, doc_id)
                zz = [0] * 64
                zz[0] = (ci * 37) % 193 - 96
                zz[pos] = ai - 2
                coef = [0] * 64
                for idx in range(64):
                    coef[_ZIGZAG[idx]] = zz[idx] * (
                        _JPG_QDC if idx == 0 else _JPG_QAC
                    )
                want = _idct_block(coef)
                got = [
                    px[(by * 8 + y) * w + bx * 8 + x]
                    for y in range(8)
                    for x in range(8)
                ]
                assert got == want


def test_source_reputation_verdicts(spark, tmp_path):
    """Planted sources hit each verdict arm with exact per-milles."""
    import pyspark.sql.functions as F

    from curatorhadoopinterface_spark.operators.curation import (
        source_reputation,
    )

    long = "x" * 200
    rows = []
    # dupfarm: 10 docs, only 4 distinct texts -> dup_permille 600 -> drop
    for i in range(10):
        rows.append((100 + i, f"{long} v{i % 4}", "en", "dupfarm"))
    # shortish: 10 distinct docs, 3 short -> short_permille 300 -> review
    for i in range(10):
        t = ("s" * 50 if i < 3 else long) + f" u{i}"
        rows.append((200 + i, t, "en", "shortish"))
    # clean: 10 long distinct docs -> keep
    for i in range(10):
        rows.append((300 + i, f"{long} clean{i}", "en", "clean"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {r.source: r for r in source_reputation(spark, sf).collect()}
    assert got["dupfarm"].dup_permille == 600
    assert got["dupfarm"].verdict == "drop"
    assert got["shortish"].short_permille == 300
    assert got["shortish"].verdict == "review"
    assert got["clean"].verdict == "keep"
    assert got["clean"].dup_permille == 0
    for r in got.values():
        assert r.n_docs == 10 and r.mean_doc_chars > 0


def test_curriculum_global_order_is_a_permutation(spark):
    """Bucket position ranges tile 1..N with no gap or overlap, and
    bucket sizes are within one decile rounding step of N/10."""
    from curatorhadoopinterface_spark.operators.curation import (
        curriculum_global_order,
    )
    from curatorhadoopinterface_spark.session import load_table

    n = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    rows = sorted(
        curriculum_global_order(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n_docs for r in rows) == n
    assert rows[0].min_pos == 1 and rows[-1].max_pos == n
    for prev, cur in zip(rows, rows[1:]):
        assert cur.min_pos == prev.max_pos + 1
    for r in rows:
        assert r.max_pos - r.min_pos + 1 == r.n_docs
        assert r.pos_checksum > 0


def test_dedup_substring_windows_planted_overlap(spark, tmp_path):
    """Two docs sharing a 9-word run produce exactly 2 duplicated
    8-windows each; sub-8-word docs never enter the census."""
    from curatorhadoopinterface_spark.operators.dedup import (
        dedup_substring_windows,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota"  # 9 words
    rows = [
        (1, shared + " uniqueone tail1 tail2", "en", "web"),
        (2, "head1 head2 " + shared + " uniquetwo", "en", "web"),
        (3, "totally different words " + " ".join(f"w{i}" for i in range(8)), "en", "web"),
        (4, "too short doc", "en", "web"),  # 3 words -> no windows
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {r.source: r for r in dedup_substring_windows(spark, sf).collect()}
    web = got["web"]
    # doc1: 12 words -> 5 windows; doc2: 12 -> 5; doc3: 11 -> 4; doc4: none
    assert web.n_docs == 3
    assert web.n_windows == 14
    # the 9-word shared run yields exactly its two 8-word sub-windows
    # in each doc -> 4 duplicated window occurrences corpus-wide
    assert web.n_dup_windows == 4
    assert web.n_docs_flagged == 0
    assert web.dup_window_ppm == 4 * 1_000_000 // 14


def test_emb_kmeans_balanced_respects_cap(spark):
    """No cluster keeps more than cap primaries; totals tile the corpus;
    fill per-mille is the exact integer ratio."""
    import math

    from curatorhadoopinterface_spark.operators.mlops import (
        emb_kmeans_balanced,
    )
    from curatorhadoopinterface_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    k = emb.select("label").distinct().count()
    cap = math.ceil(n * 125 / (k * 100.0))
    rows = emb_kmeans_balanced(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_total for r in rows) == n
    for r in rows:
        assert r.n_primary <= cap
        assert r.n_total == r.n_primary + r.n_spill_in
        assert r.fill_permille == r.n_total * 1000 // cap
    # spill only exists if some cluster actually overflowed
    if any(r.n_spill_in for r in rows):
        assert any(r.n_primary == cap for r in rows)
