"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — parquet stores binary natively, partition pruning and column
projection still apply, and only the stages that *decode* pay for the
bytes. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the Python worker sees whole record batches, never
single rows.

The actual codec step is STUBBED (`NotImplementedError` or the
deterministic fake) because no image/audio libraries ship in this
container — the Spark-side plumbing (schema, batch iteration,
partitioning, output schema) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real codec hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. Pillow) not present "
        "in this environment; wire it here when available"
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: bytes of repeated sha256."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.sha256(seed).digest()
    while len(out) < dim:
        out.extend(b / 255.0 for b in h)
        h = hashlib.sha256(h).digest()
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Output schema: ``media_id long, feature array<float>``. The
    per-batch body is where a real decoder (resize, frame-sample,
    spectrogram) would run; the deterministic fake keeps the plumbing
    testable.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        _fake_feature(p if p is not None else b"", dim)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return media.select("media_id", payload_col).mapInPandas(batches, out_schema)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic frame sampling over binary payloads: the payload
    is treated as a contiguous sequence of fixed-size ``frame_bytes``
    chunks (a real container parser — mp4 boxes, wav blocks — would
    slot in where the slicing happens) and every ``stride``-th frame is
    emitted with its index, byte length, and content hash.

    This is the decode-side shape of video/audio ingestion at scale:
    ``mapInPandas`` streams Arrow batches through the Python worker, the
    output explodes ~``1/stride`` of the payload volume, and nothing is
    collected driver-side. Emitting the md5 rather than the frame bytes
    keeps the result hashable for the oracle comparison; a real
    pipeline would emit the frame tensor here.

    Output: ``media_id, frame_idx, frame_len, frame_md5``.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_len", T.IntegerType(), False),
            T.StructField("frame_md5", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            hashes: list[str] = []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_md5": hashes,
                }
            )

    return media.select("media_id", payload_col).mapInPandas(batches, out_schema)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no payload decode): per mime type,
    count / total bytes / max dims — the cheap pre-decode audit pass."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: payload =
    UTF-8 bytes of the text, mime/dims from doc_id arithmetic.

    This gives the binary-column path a parquet-backed, oracle-checkable
    input (the same derivation is expressible in ANSI SQL) while the
    real decode step stays stubbed.
    """
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
        (32 * (1 + F.col("doc_id") % 8)).cast("int").alias("width"),
        (32 * (1 + (F.col("doc_id") * 3) % 8)).cast("int").alias("height"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codec needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 4)
        rows.append(
            (
                i,
                ["image/png", "audio/wav", "video/mp4"][i % 3],
                32 * (1 + i % 8),
                32 * (1 + (i * 3) % 8),
                len(payload),
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def shard_assign(
    media: DataFrame,
    shard_bytes: int = 1 << 30,
    stream_col: str = "mime",
    order_col: str = "media_id",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """WebDataset-style shard assignment: within each stream (mime by
    default), media items fill byte-bounded shards in stable id order —
    the layout step before writing balanced tar/parquet shards for
    multimodal training loaders.

    Same two-phase distributed prefix sum as sequence packing
    (``curation.pack_by_weight``): no single executor ever sorts a
    whole stream. Output: ``media_id, mime, n_bytes, shard``.
    """
    from changedatacapture_spark.operators.curation import pack_by_weight

    out = pack_by_weight(
        media.select(order_col, stream_col, bytes_col),
        bytes_col,
        shard_bytes,
        stream_col,
        order_col,
    )
    return out.withColumnRenamed("bin", "shard")
