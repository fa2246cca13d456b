"""Multimodal columns (LLM-pipeline extension: image/audio/video as opaque
``binary`` payloads with typed metadata).

The pattern: a multimodal corpus at 100 TB is a parquet table whose media
column is BINARY (or a pointer column into object storage) plus typed
metadata columns; every media op is a Pandas-batched UDF over
``mapInPandas`` so payload bytes stream through the Python worker in
Arrow batches without ever materializing on the driver.

The decode step itself is STUBBED here — the image/audio libraries are
not in this container (see ``decode_media``: raises NotImplementedError
unless a decoder import succeeds) — but everything Spark-side is real and
oracle-checked: binary column construction, schema, Arrow batch shape,
the byte-slicing frame sampler, and the metadata arithmetic that a real
decoder would replace. The deterministic fake derives every "decoded"
field from the payload byte count so DuckDB can replay it
(``octet_length(encode(text))``), which pins the full Python byte-path
(Arrow BINARY → bytes → compute → struct out) against the JVM value.

Payloads are synthesized in-query as the UTF-8 encoding of the document
text (DuckDB: ``encode(text)``) — the fixtures carry no real media, and
synthesizing inside the query keeps the oracle able to rebuild the exact
bytes. Reference tie-in: binary-payload-per-document is exactly the
reference's on-disk unit (one Thrift-binary blob per doc,
src/.../CuratorClient.java:499-519); here the blob is a media payload
instead of a serialized Record.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table

FRAME_SIZE = 256  # bytes per sampled "frame" of a fake video payload

_MODALITY = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


def decode_media(payload: bytes, modality: str) -> dict:
    """Real decoder hook — image/audio libs are not installed in this
    container, so this raises unless one is importable. Production
    deployments swap the import for PIL / torchaudio / pyav; the UDFs
    below fall back to :func:`fake_decode` (deterministic, oracle-
    replayable) when no decoder is present.
    """
    try:  # pragma: no cover - decoder libs absent by design
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "no media decoder available in this environment; "
            "use fake_decode() for deterministic plumbing tests"
        ) from None
    raise NotImplementedError("real decode path not wired yet")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder: every field is a pure
    function of the payload bytes (here: the byte count), so the DuckDB
    oracle can recompute it without a decoder."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "channels": 3,
        # half-up rounding: n/1024 produces exact .00005 ties where
        # Python's banker's round() and SQL ROUND diverge
        "est_kb": math.floor(n / 1024.0 * 10000 + 0.5) / 10000,
    }


def manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table: binary payload + typed metadata columns."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(_MODALITY).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )


@query(
    "mm_manifest",
    oracle=f"""
    SELECT doc_id,
           {_MODALITY} AS modality,
           encode(text) AS payload,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def mm_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload manifest: the storage schema for a multimodal
    corpus. The payload column round-trips bytes exactly (UTF-8 text ->
    BINARY) — at 100 TB this column is what you'd partition by modality
    and size-bucket so scans of one modality prune the rest."""
    return manifest(spark, sf_dir).withColumn("n_bytes", F.length("payload"))


@query(
    "mm_decode_features",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, {_MODALITY} AS modality,
               octet_length(encode(text)) AS n
        FROM documents)
    SELECT doc_id, modality,
           n AS n_bytes,
           n % 640 + 1 AS width,
           (n * 7) % 480 + 1 AS height,
           3 AS channels,
           ROUND(n / 1024.0, 4) AS est_kb
    FROM m
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Decode' each payload in Arrow-batched Python (mapInPandas) —
    bytes in, feature struct out, zero shuffle. The fake decoder's
    fields are byte-count arithmetic so the oracle replays them; a real
    decoder drops into the same signature (see decode_media)."""
    out_schema = StructType.fromDDL(
        "doc_id bigint, modality string, n_bytes int, width int, height int,"
        " channels int, est_kb double"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "modality", pdf["modality"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return manifest(spark, sf_dir).mapInPandas(decode_batches, out_schema)


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
        SELECT doc_id, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 3 = 2),
    f AS (
        SELECT doc_id, n,
               UNNEST(GENERATE_SERIES(0, CAST(CEIL(n / {FRAME_SIZE}.0) AS INT) - 1))
                   AS frame_idx
        FROM v)
    SELECT doc_id, frame_idx,
           frame_idx * {FRAME_SIZE} AS byte_offset,
           LEAST({FRAME_SIZE}, n - frame_idx * {FRAME_SIZE}) AS frame_len
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads: Python slices the actual
    bytes every FRAME_SIZE offsets and reports each slice's length —
    which the oracle cross-checks arithmetically. 1→N expansion with no
    shuffle; a real frame decoder would replace the slice with
    pyav/ffmpeg on the same byte windows."""
    out_schema = StructType.fromDDL(
        "doc_id bigint, frame_idx int, byte_offset int, frame_len int"
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range(0, max(1, -(-len(b) // FRAME_SIZE))):
                    off = idx * FRAME_SIZE
                    rows.append((doc_id, idx, off, len(b[off : off + FRAME_SIZE])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_offset", "frame_len"]
            )

    vids = manifest(spark, sf_dir).filter(F.col("modality") == "video")
    return vids.mapInPandas(sample_frames, out_schema)


TARGET_W, TARGET_H = 224, 224


@query(
    "mm_resize",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, {_MODALITY} AS modality,
               octet_length(encode(text)) AS n
        FROM documents),
    dims AS (
        SELECT doc_id, modality,
               n % 640 + 1 AS width, (n * 7) % 480 + 1 AS height
        FROM m WHERE modality = 'image')
    SELECT doc_id, width, height,
           {TARGET_W} AS out_w, {TARGET_H} AS out_h,
           ROUND(LEAST({TARGET_W} * 1.0 / width, {TARGET_H} * 1.0 / height), 6)
               AS scale,
           CAST(FLOOR(width * ROUND(LEAST({TARGET_W} * 1.0 / width,
                                          {TARGET_H} * 1.0 / height), 6)) AS INT)
               AS fit_w,
           CAST(FLOOR(height * ROUND(LEAST({TARGET_W} * 1.0 / width,
                                           {TARGET_H} * 1.0 / height), 6)) AS INT)
               AS fit_h
    FROM dims
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for image payloads: aspect-preserving fit into
    224x224 computed in Arrow-batched Python from the decoded (fake)
    dimensions — the letterbox arithmetic every vision-model ingest
    performs, with the actual pixel resample stubbed like decode_media.
    The scale factor is rounded in-query before the floor in BOTH
    engines so fit dims can't flip on float dust."""
    out_schema = StructType.fromDDL(
        "doc_id bigint, width int, height int, out_w int, out_h int,"
        " scale double, fit_w int, fit_h int"
    )

    def plan_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                f = fake_decode(bytes(payload))
                w, h = f["width"], f["height"]
                scale = math.floor(min(TARGET_W / w, TARGET_H / h) * 10**6 + 0.5) / 10**6
                rows.append(
                    (doc_id, w, h, TARGET_W, TARGET_H, scale,
                     int(w * scale), int(h * scale))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_w", "out_h",
                         "scale", "fit_w", "fit_h"],
            )
            rows = []

    imgs = manifest(spark, sf_dir).filter(F.col("modality") == "image")
    return imgs.mapInPandas(plan_resize, out_schema)
