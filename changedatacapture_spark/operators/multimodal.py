"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — parquet stores binary natively, partition pruning and column
projection still apply, and only the stages that *decode* pay for the
bytes. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the Python worker sees whole record batches, never
single rows.

Three genuine image codecs (24-bit BMP, binary PGM/P5, and 8-bit
grayscale PNG — PNG's inflate+unfilter rides stdlib ``zlib``) run end
to end behind a magic-byte dispatch; formats needing a codec library
not in this container (JPEG/video) raise ``NotImplementedError`` so
callers fall back to the clearly-marked deterministic fake — the
Spark-side plumbing (schema, batch iteration, partitioning, output
schema) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from changedatacapture_spark.operators.layout import fan_out_scan
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


def encode_bmp(raster: bytes, width: int, height: int) -> bytes:
    """Real (minimal) 24-bit uncompressed BMP writer: 14-byte file
    header + 40-byte BITMAPINFOHEADER, bottom-up rows, BGR pixels,
    rows zero-padded to 4-byte multiples. Grayscale input: each raster
    byte becomes an R=G=B pixel. Pure stdlib — no codec dependency."""
    import struct

    if len(raster) != width * height:
        raise ValueError(f"raster length {len(raster)} != {width}x{height}")
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    img_size = (row_len + pad) * height
    body = bytearray()
    for y in range(height - 1, -1, -1):  # BMP stores rows bottom-up
        for x in range(width):
            v = raster[y * width + x]
            body += bytes((v, v, v))
        body += b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Real (minimal) BMP decoder for the format ``encode_bmp`` writes
    plus the common top-down (negative height) variant: validates the
    magic/bpp/compression, honors the pixel-data offset from the file
    header, strips row padding, converts BGR back to a top-down
    grayscale raster. Returns ``(width, height, raster)``."""
    import struct

    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsize, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
    hgt = abs(height)
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    out = bytearray(width * hgt)
    for y in range(hgt):
        src_row = (hgt - 1 - y) if height > 0 else y
        base = offset + src_row * (row_len + pad)
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            out[y * width + x] = (r + g + b) // 3
    return width, hgt, bytes(out)


def encode_pgm(raster: bytes, width: int, height: int) -> bytes:
    """Real binary PGM (P5) writer: ASCII header (magic, a comment
    line — the part naive parsers break on — dimensions, maxval) then
    the raw grayscale bytes row-major top-down. Pure stdlib."""
    if len(raster) != width * height:
        raise ValueError(f"raster length {len(raster)} != {width}x{height}")
    header = f"P5\n# synthetic corpus raster\n{width} {height}\n255\n"
    return header.encode("ascii") + raster


def decode_pgm(payload: bytes) -> tuple[int, int, bytes]:
    """Real binary PGM (P5) decoder: tokenizes the ASCII header
    (whitespace-separated ints, ``#`` comments to end-of-line per the
    netpbm spec), validates maxval 255, and slices the raster that
    follows the single whitespace byte after maxval. Returns
    ``(width, height, raster)`` top-down grayscale."""
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        c = payload[pos : pos + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        elif c == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
        elif c.isdigit():
            start = pos
            while payload[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PGM header byte at offset {pos}: {c!r}")
    width, height, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PGM maxval {maxval} (want 255)")
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    raster = payload[pos : pos + width * height]
    if len(raster) != width * height:
        raise ValueError(
            f"truncated PGM raster: {len(raster)} of {width * height} bytes"
        )
    return width, height, bytes(raster)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Codec dispatch over the payload's magic bytes. BMP, binary PGM
    and 8-bit grayscale PNG decode for real (``decode_bmp`` /
    ``decode_pgm`` / ``decode_png`` — all pure stdlib; PNG's inflate
    is ``zlib``); other formats need a codec library not present in
    this container — the hook raises so callers fall back to the
    deterministic fake, never silently mis-decode."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only BMP/PGM/PNG decode without a codec library (e.g. Pillow); "
        "wire other formats here when one is available"
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


#: width table for the synthetic BMP corpus: every divisor of 24 that
#: yields a distinct row padding (6->pad2, 9->pad3, 12->pad0, 18->pad2,
#: 24->pad0, 36->pad0) so the decoder's padding logic is exercised
_BMP_WIDTHS = (2, 3, 4, 6, 8, 12)
_BMP_PIXELS = 24


def _bmp_raster(doc_id: int) -> bytes:
    """Deterministic 24-pixel grayscale raster — pure arithmetic on
    doc_id, so an ANSI-SQL oracle can state the decoded stats exactly."""
    return bytes((doc_id * 37 + i * 101) % 256 for i in range(_BMP_PIXELS))


def bmp_decode_stats(docs: DataFrame) -> DataFrame:
    """REAL end-to-end image decode through Arrow batches: per document,
    build a deterministic grayscale raster, wrap it in a genuine 24-bit
    BMP (``encode_bmp`` — headers, bottom-up rows, row padding), then
    decode it back via the ``decode_image`` dispatch and aggregate
    pixel statistics per image.

    Unlike ``extract_features`` (whose codec step is a fake), this path
    round-trips actual image bytes: a decoder bug (padding, row order,
    offset) breaks the oracle hash. Both encode and decode run inside
    ONE ``mapInPandas`` pass, so payloads never shuffle — the plan is a
    map-only projection, embarrassingly parallel at any scale.

    Output: ``doc_id, width, height, n_px, sum_px, min_px, max_px,
    mean_px``.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_px", T.IntegerType(), False),
            T.StructField("sum_px", T.LongType(), False),
            T.StructField("min_px", T.IntegerType(), False),
            T.StructField("max_px", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
                h = _BMP_PIXELS // w
                payload = encode_bmp(_bmp_raster(did), w, h)
                dw, dh, px = decode_image(payload)
                rows["doc_id"].append(did)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_px"].append(len(px))
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["mean_px"].append(sum(px) / float(len(px)))
            yield pd.DataFrame(rows)

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)


def mixed_decode_stats(docs: DataFrame) -> DataFrame:
    """Mixed-codec decode through the dispatch registry: even doc_ids
    wrap their raster in a real 24-bit BMP, odd doc_ids in a real
    binary PGM (P5) — two genuinely different wire formats (bottom-up
    padded BGR rows vs ASCII header + raw top-down bytes) — and BOTH
    decode back through the same ``decode_image`` magic-byte dispatch
    in one Arrow ``mapInPandas`` pass. A bug in either codec or in the
    dispatch itself breaks the oracle hash. Payloads never shuffle.

    Output: ``doc_id, codec, width, height, n_px, sum_px, min_px,
    max_px, mean_px``.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("codec", T.StringType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_px", T.IntegerType(), False),
            T.StructField("sum_px", T.LongType(), False),
            T.StructField("min_px", T.IntegerType(), False),
            T.StructField("max_px", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
                h = _BMP_PIXELS // w
                raster = _bmp_raster(did)
                if did % 2 == 0:
                    payload, codec = encode_bmp(raster, w, h), "bmp"
                else:
                    payload, codec = encode_pgm(raster, w, h), "pgm"
                dw, dh, px = decode_image(payload)
                rows["doc_id"].append(did)
                rows["codec"].append(codec)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_px"].append(len(px))
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["mean_px"].append(sum(px) / float(len(px)))
            yield pd.DataFrame(rows)

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)


def resize_nearest(
    px: bytes, width: int, height: int, factor: int = 2
) -> tuple[int, int, bytes]:
    """Nearest-neighbor downsample of a grayscale raster by an integer
    factor: keep the pixel at every ``factor``-th row and column.
    Output dims are ceil(dim / factor)."""
    out = bytes(
        px[r * width + c]
        for r in range(0, height, factor)
        for c in range(0, width, factor)
    )
    return (width + factor - 1) // factor, (height + factor - 1) // factor, out


def bmp_resize_stats(docs: DataFrame, factor: int = 2) -> DataFrame:
    """Decode → RESIZE → aggregate, end-to-end through Arrow: the
    synthetic BMP corpus (see ``bmp_decode_stats``) decodes for real,
    then a nearest-neighbor downsample runs on the decoded raster —
    the standard image-preprocessing step of a multimodal training
    pipeline — and per-image statistics of the RESIZED raster come
    back. Same map-only plan as the decode path: payloads never
    shuffle, and the resize kernel is pure per-row compute.

    Output: ``doc_id, width, height, n_px, sum_px, mean_px`` where the
    dims are the post-resize dims.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_px", T.IntegerType(), False),
            T.StructField("sum_px", T.LongType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
                h = _BMP_PIXELS // w
                payload = encode_bmp(_bmp_raster(did), w, h)
                dw, dh, px = decode_image(payload)
                rw, rh, rpx = resize_nearest(px, dw, dh, factor)
                rows["doc_id"].append(did)
                rows["width"].append(rw)
                rows["height"].append(rh)
                rows["n_px"].append(len(rpx))
                rows["sum_px"].append(sum(rpx))
                rows["mean_px"].append(sum(rpx) / float(len(rpx)))
            yield pd.DataFrame(rows)

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)


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


def average_hash(pixels: bytes) -> int:
    """Perceptual average-hash of a grayscale raster: bit i is set iff
    pixel i exceeds the image mean. The comparison is the integer
    cross-multiplication ``px * n > sum`` — no float mean, so the hash
    is exactly reproducible in any engine (including an ANSI-SQL
    oracle). For real images the raster would be the 8x8 resize of the
    decoded frame; the synthetic corpus rasters are already 24 px."""
    n = len(pixels)
    s = sum(pixels)
    h = 0
    for i, v in enumerate(pixels):
        if v * n > s:
            h |= 1 << i
    return h


def average_hash_batch(rasters) -> "object":
    """Vectorized ``average_hash`` over a ``(B, N)`` uint8 matrix
    (N <= 63): one numpy pass hashes the whole Arrow batch — same
    integer cross-multiplication semantics, ~10x faster than the
    per-pixel Python loop on real 8x8 rasters. The scalar
    ``average_hash`` stays as the property-test oracle."""
    import numpy as np

    _, n = rasters.shape
    px = rasters.astype(np.int64)
    s = px.sum(axis=1, keepdims=True)
    bits = (px * np.int64(n)) > s
    weights = np.int64(1) << np.arange(n, dtype=np.int64)
    return (bits * weights).sum(axis=1)


def bmp_ahash(docs: DataFrame) -> DataFrame:
    """Binary -> decode -> perceptual hash, end to end through Arrow:
    each document's synthetic raster is wrapped in a REAL 24-bit BMP,
    decoded back via the codec dispatch, and reduced to its average
    hash — the content fingerprint image dedup clusters on. One
    ``mapInPandas`` pass; payload bytes never shuffle; the downstream
    group-by moves only (doc_id, 8-byte hash) rows.

    Output: ``doc_id, ahash``.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("ahash", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].astype("int64").to_numpy()
            rasters = np.empty((len(ids), _BMP_PIXELS), dtype=np.uint8)
            for j, did in enumerate(ids):
                did = int(did)
                w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
                payload = encode_bmp(_bmp_raster(did), w, _BMP_PIXELS // w)
                _, _, px = decode_image(payload)
                rasters[j] = np.frombuffer(px, dtype=np.uint8)
            yield pd.DataFrame(
                {"doc_id": ids, "ahash": average_hash_batch(rasters)}
            )

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)


# --------------------------------------------------------------- audio


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode signed 16-bit mono PCM samples as a genuine RIFF/WAVE
    file: RIFF header with correct chunk sizes, canonical ``fmt ``
    chunk (PCM tag 1, mono, byte rate and block align derived, 16 bits
    per sample), then the little-endian ``data`` chunk — the same
    bytes any audio tool would accept."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a RIFF/WAVE payload to ``(sample_rate, samples)`` by
    actually WALKING the chunk list (unknown chunks such as LIST/INFO
    are skipped by their declared size, the way a real parser must),
    validating PCM / mono / 16-bit, and raising ``ValueError`` on
    malformed input — truncated chunks, missing fmt/data, or a
    non-PCM encoding."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 != len(payload):
        raise ValueError("truncated RIFF payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError("truncated chunk " + cid.decode("latin1"))
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if tag != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM mono 16-bit supported")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n = len(data) // 2
    return rate, list(struct.unpack(f"<{n}h", data))


def decode_audio(payload: bytes) -> tuple[int, list[int]]:
    """Audio codec dispatch by magic bytes: RIFF/WAVE decodes for real
    (pure stdlib); compressed formats (MP3/OGG/FLAC) need a codec
    library not present in this container — the hook raises so callers
    fall back to the deterministic fake, never silently mis-decode."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only RIFF/WAVE decodes without an audio codec library; wire "
        "MP3/OGG/FLAC here when one is available"
    )


#: deterministic per-document sample-count table (20..60 samples)
_WAV_RATE = 8000


def _wav_samples(doc_id: int) -> list[int]:
    """Deterministic signed 16-bit test signal for document ``doc_id``:
    ``((doc_id*73 + i*129) % 4096) - 2048`` over ``20 + (doc_id % 5) *
    10`` samples — pure integer arithmetic, replayable in any engine."""
    n = 20 + (doc_id % 5) * 10
    return [((doc_id * 73 + i * 129) % 4096) - 2048 for i in range(n)]


def wav_decode_stats(docs: DataFrame) -> DataFrame:
    """REAL end-to-end audio decode through Arrow batches: per
    document, synthesize the deterministic PCM signal, wrap it in a
    genuine RIFF/WAVE file (``encode_wav``), decode it back via the
    ``decode_audio`` dispatch — chunk walking, PCM validation — and
    aggregate sample statistics. Encode and decode run inside ONE
    ``mapInPandas`` pass; payload bytes never shuffle (map-only plan,
    embarrassingly parallel at any scale).

    Output: ``doc_id, sample_rate, n_samples, duration_ms, sum_s,
    sum_sq, peak`` — all exact integers (``sum_sq`` stands in for RMS
    so the oracle comparison needs no float sqrt; ``duration_ms`` is
    integer DIV).
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("sum_s", T.LongType(), False),
            T.StructField("sum_sq", T.LongType(), False),
            T.StructField("peak", T.IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                payload = encode_wav(_wav_samples(did), _WAV_RATE)
                rate, s = decode_audio(payload)
                rows["doc_id"].append(did)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["duration_ms"].append(len(s) * 1000 // rate)
                rows["sum_s"].append(sum(s))
                rows["sum_sq"].append(sum(x * x for x in s))
                rows["peak"].append(max(abs(x) for x in s))
            yield pd.DataFrame(rows)

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate, ties resolved left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(raster: bytes, width: int, height: int) -> bytes:
    """Real (minimal) PNG writer for 8-bit grayscale: signature,
    IHDR/IDAT/IEND chunks with CRC-32, scanlines zlib-compressed with
    a REAL filter per row — cycling None/Sub/Up/Average/Paeth so a
    decoder that skips unfiltering cannot round-trip. Pure stdlib
    (struct + zlib), no codec dependency."""
    import struct
    import zlib

    if len(raster) != width * height:
        raise ValueError(f"raster length {len(raster)} != {width}x{height}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    lines = bytearray()
    prior = bytes(width)
    for y in range(height):
        row = raster[y * width : (y + 1) * width]
        ft = y % 5
        lines.append(ft)
        for x in range(width):
            left = row[x - 1] if x > 0 else 0
            up = prior[x]
            upleft = prior[x - 1] if x > 0 else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - left
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - (left + up) // 2
            else:
                v = row[x] - _paeth(left, up, upleft)
            lines.append(v % 256)
        prior = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Real (minimal) PNG decoder for the 8-bit grayscale profile
    ``encode_png`` writes: validates the signature and every chunk's
    CRC-32, walks the chunk stream (tolerating ancillary chunks),
    concatenates multi-IDAT data, zlib-inflates, and UNFILTERS each
    scanline (all five spec filters — None/Sub/Up/Average/Paeth).
    Returns ``(width, height, raster)`` top-down grayscale. Inflate +
    unfilter are the whole codec; both are pure stdlib."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG profile: want 8-bit grayscale, "
                    f"got depth={depth} color={color} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    lines = zlib.decompress(bytes(idat))
    if len(lines) != (width + 1) * height:
        raise ValueError(
            f"PNG scanline stream is {len(lines)} bytes, "
            f"want {(width + 1) * height}"
        )
    out = bytearray(width * height)
    prior = bytes(width)
    for y in range(height):
        ft = lines[y * (width + 1)]
        row = bytearray(lines[y * (width + 1) + 1 : (y + 1) * (width + 1)])
        for x in range(width):
            left = row[x - 1] if x > 0 else 0
            up = prior[x]
            upleft = prior[x - 1] if x > 0 else 0
            if ft == 0:
                pass
            elif ft == 1:
                row[x] = (row[x] + left) % 256
            elif ft == 2:
                row[x] = (row[x] + up) % 256
            elif ft == 3:
                row[x] = (row[x] + (left + up) // 2) % 256
            elif ft == 4:
                row[x] = (row[x] + _paeth(left, up, upleft)) % 256
            else:
                raise ValueError(f"bad PNG filter type {ft}")
        out[y * width : (y + 1) * width] = row
        prior = bytes(row)
    return width, height, bytes(out)


def png_decode_stats(docs: DataFrame) -> DataFrame:
    """REAL PNG decode end-to-end, the inflate+unfilter twin of
    ``bmp_decode_stats``: per document, the same deterministic raster
    wraps in a genuine PNG (zlib IDAT, per-row cycling filters,
    CRC-checked chunks), decodes back through the ``decode_image``
    magic-byte dispatch, and reduces to per-image pixel statistics —
    the oracle states them as pure arithmetic, so a bug anywhere in
    chunk walking, inflate, or any of the five unfilters breaks the
    hash. One Arrow ``mapInPandas`` pass; payloads never shuffle.

    Output: ``doc_id, width, height, n_px, sum_px, min_px, max_px,
    mean_px``.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_px", T.IntegerType(), False),
            T.StructField("sum_px", T.LongType(), False),
            T.StructField("min_px", T.IntegerType(), False),
            T.StructField("max_px", T.IntegerType(), False),
            T.StructField("mean_px", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
                h = _BMP_PIXELS // w
                payload = encode_png(_bmp_raster(did), w, h)
                dw, dh, px = decode_image(payload)
                rows["doc_id"].append(did)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_px"].append(len(px))
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["mean_px"].append(sum(px) / float(len(px)))
            yield pd.DataFrame(rows)

    # the Python decode is the whole cost and its input is one bare id
    # column: fan a narrow scan out so every worker decodes a slice
    # (payload synthesis happens inside the worker — nothing heavy
    # crosses this exchange)
    return fan_out_scan(docs.select("doc_id")).mapInPandas(batches, out_schema)
