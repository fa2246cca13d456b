"""UDF-surface and multimodal plumbing tests.

The oracle harness checks values; these tests pin the CONTRACTS — Arrow
batch shapes, binary round-trip fidelity, decode-stub gating — that the
oracle can't see.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


def test_udf_scalar_matches_jvm_expression(spark, sf_dir):
    """Python-path result must equal the JVM built-in expression row-for-row
    (the trust condition for any annotator UDF)."""
    from curatorhadoopinterface_spark.operators.udfs import udf_scalar
    from curatorhadoopinterface_spark.session import load_table

    got = udf_scalar(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    want = li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
                + 0.5
            )
            / 100
        ).alias("charge"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_udtf_explode_conserves_words(spark, sf_dir):
    from curatorhadoopinterface_spark.operators.udfs import udtf_explode
    from curatorhadoopinterface_spark.session import load_table

    got = udtf_explode(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_words = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert got.count() == n_words
    # per-doc counts survive the 1->N expansion
    per_doc = got.groupBy("doc_id").count()
    want = docs.select("doc_id", F.size(F.split("text", " ")).alias("count"))
    assert per_doc.exceptAll(want).count() == 0


def test_mm_payload_roundtrips_bytes(spark, sf_dir):
    """BINARY column must carry the exact UTF-8 bytes through Arrow."""
    from curatorhadoopinterface_spark.operators.multimodal import manifest
    from curatorhadoopinterface_spark.session import load_table

    m = manifest(spark, sf_dir).limit(50).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").limit(50).collect()
    }
    assert m
    for row in m:
        assert bytes(row["payload"]) == texts[row["doc_id"]].encode("utf-8")
        assert row["modality"] in ("image", "audio", "video")


def test_mm_decode_refuses_undecodable(spark):
    """decode_media must refuse (ValueError) containers it cannot truly
    parse (PNG needs a codec lib) — never silently fake in the real
    path; the fake fallback happens only in try_decode."""
    from curatorhadoopinterface_spark.operators.multimodal import decode_media

    with pytest.raises(ValueError):
        decode_media(b"\x89PNG", "image")


def test_decode_media_real_ppm_bmp_wav():
    """The stdlib decoder recovers the EXACT dimensions the stdlib
    encoders wrote — real bytes in, real header/pixel parse out."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        decode_media,
        make_bmp,
        make_ppm,
        make_wav,
    )

    ppm = decode_media(make_ppm(17, 9))
    assert (ppm["width"], ppm["height"], ppm["channels"]) == (17, 9, 3)
    bmp = decode_media(make_bmp(33, 21))
    assert (bmp["width"], bmp["height"], bmp["channels"]) == (33, 21, 3)
    wav = decode_media(make_wav(480, sample_rate=8000, channels=2))
    assert (wav["width"], wav["height"], wav["channels"]) == (480, 8000, 2)
    # truncated pixel data must not parse as a valid image
    with pytest.raises(ValueError):
        decode_media(make_ppm(17, 9)[:-10])


def test_mm_decode_features_real_pixels_through_spark(spark):
    """The mapInPandas decode stage computes width/height/channels from
    REAL decoded pixels when payloads are genuine containers, and falls
    back to the deterministic fake for plain text bytes — in one batch,
    through the same Arrow plumbing mm_decode_features uses."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        decode_features,
        fake_decode,
        make_bmp,
        make_ppm,
        make_wav,
    )

    rows = [
        (1, "image", make_ppm(31, 7)),
        (2, "image", make_bmp(12, 50)),
        (3, "audio", make_wav(1600, sample_rate=16000, channels=1)),
        (4, "image", b"just some text bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, modality string, payload binary")
    got = {r["doc_id"]: r for r in decode_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (31, 7, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (12, 50, 3)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"]) == (1600, 16000, 1)
    fk = fake_decode(b"just some text bytes")
    assert (got[4]["width"], got[4]["height"]) == (fk["width"], fk["height"])


def test_mm_frame_sample_covers_payload(spark, sf_dir):
    """Frame slices must tile the payload exactly: sum(frame_len) == n_bytes."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        manifest,
        mm_frame_sample,
    )

    frames = mm_frame_sample(spark, sf_dir)
    tot = frames.groupBy("doc_id").agg(F.sum("frame_len").alias("covered"))
    vids = manifest(spark, sf_dir).filter(F.col("modality") == "video").select(
        "doc_id", F.length("payload").alias("n_bytes")
    )
    bad = tot.join(vids, "doc_id").filter(F.col("covered") != F.col("n_bytes"))
    assert bad.count() == 0
    assert tot.count() == vids.count()


def test_write_parquet_roundtrip(spark, sf_dir):
    from curatorhadoopinterface_spark.operators.sources import write_parquet
    from curatorhadoopinterface_spark.session import load_table

    back = write_parquet(spark, sf_dir)
    orig = load_table(spark, sf_dir, "documents")
    assert back.exceptAll(orig).count() == 0 and orig.exceptAll(back).count() == 0


def test_png_roundtrip_all_filter_types():
    """make_png rotates filter types 0-4 across scanlines (height >= 5
    exercises every branch); the decoder must recover the exact
    gradient bytes through inflate + unfilter."""
    from curatorhadoopinterface_spark.operators.multimodal import (
        decode_media,
        decode_png_pixels,
        make_png,
    )

    for w, h in [(1, 1), (4, 3), (16, 13), (7, 11)]:
        png = make_png(w, h)
        w2, h2, ch, px = decode_png_pixels(png)
        assert (w2, h2, ch) == (w, h, 3)
        want = bytes(
            b
            for y in range(h)
            for x in range(w)
            for b in ((x * 7) % 256, (y * 13) % 256, (x + y) % 256)
        )
        assert px == want
        d = decode_media(png)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["n_bytes"] == len(png)


def test_png_grayscale_and_rgba_color_types():
    """Hand-built minimal PNGs for color types 0 (gray) and 6 (RGBA):
    channels must come from IHDR and the pixel bytes through filter-0
    scanlines unchanged."""
    import struct
    import zlib
    from binascii import crc32

    from curatorhadoopinterface_spark.operators.multimodal import decode_png_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(w, h, color, ch, rows):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    gray = png(3, 2, 0, 1, [bytes([10, 20, 30]), bytes([40, 50, 60])])
    w, h, ch, px = decode_png_pixels(gray)
    assert (w, h, ch) == (3, 2, 1) and px == bytes([10, 20, 30, 40, 50, 60])

    rgba_row = bytes([1, 2, 3, 255, 4, 5, 6, 128])
    rgba = png(2, 1, 6, 4, [rgba_row])
    w, h, ch, px = decode_png_pixels(rgba)
    assert (w, h, ch) == (2, 1, 4) and px == rgba_row


def test_png_rejects_interlace_and_truncation():
    import pytest as _pytest

    from curatorhadoopinterface_spark.operators.multimodal import (
        decode_png_pixels,
        make_png,
        try_decode,
    )

    good = make_png(6, 6)
    # flip the IHDR interlace byte (offset: 8 sig + 8 chunk hdr + 12)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    with _pytest.raises(ValueError, match="interlace"):
        decode_png_pixels(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png_pixels(good[:40])  # truncated mid-chunk
    # try_decode falls back to the deterministic fake instead of dying
    feats = try_decode(bytes(bad))
    assert feats["n_bytes"] == len(bad)


def test_gif_lzw_roundtrips_with_table_reset():
    """The LZW decoder must survive width growth to 12 bits AND a
    mid-stream CLEAR/table reset (a 20k-byte noisy stream overflows
    the 4096-entry space)."""
    import random

    from curatorhadoopinterface_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(7)
    noisy = bytes(rng.randrange(256) for _ in range(20000))
    assert _lzw_decode(_lzw_encode(noisy)) == noisy
    runs = b"".join(bytes([i % 17] * 50) for i in range(200))
    assert _lzw_decode(_lzw_encode(runs)) == runs
    assert _lzw_decode(_lzw_encode(b"")) == b""


def test_gif_decoder_matches_hand_packed_stream():
    """Independent check against a HAND-built code stream (not the
    encoder): codes CLEAR,1,2,3,4,EOI packed LSB-first at 9 bits must
    decode to the four root pixels — pins the bit order and the
    special codes without trusting _lzw_encode."""
    from curatorhadoopinterface_spark.operators.multimodal import _lzw_decode

    codes = [256, 1, 2, 3, 4, 257]
    acc = nbits = 0
    packed = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    assert _lzw_decode(bytes(packed)) == bytes([1, 2, 3, 4])


def test_gif_decode_recovers_the_exact_palette_gradient():
    from curatorhadoopinterface_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_media,
        make_gif,
    )

    w, h, rgb = decode_gif_pixels(make_gif(9, 5))
    assert (w, h) == (9, 5)
    expect = bytearray()
    for y in range(5):
        for x in range(9):
            i = (x * 7 + y * 13) % 256
            expect += bytes((i, (i * 3) % 256, (i * 7) % 256))
    assert rgb == bytes(expect)
    meta = decode_media(make_gif(9, 5))
    assert (meta["width"], meta["height"], meta["channels"]) == (9, 5, 3)
