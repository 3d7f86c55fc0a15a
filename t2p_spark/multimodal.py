"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / resize / frame-sample run as Arrow-batched kernels over
``mapInArrow``/``mapInPandas``. The decode step itself is STUBBED offline
(no image/audio libraries in this container — clearly marked below); the
Spark-side plumbing — schema, partitioning, kernel signature, batch shape —
is real and tested.

Deterministic fake codec ("T2PIMG"): a 16-byte header
``b"T2PIMG" + uint32_be(width) + uint32_be(height) + uint16_be(channels)``
followed by pseudo-pixel bytes. ``media_meta`` parses the header
vectorized; ``decode_media`` raises NotImplementedError unless the payload
is the fake codec.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pyarrow as pa

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MAGIC = b"T2PIMG"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), nullable=False),
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("content", T.BinaryType()),
])

META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("valid", T.BooleanType()),
])

META_ARROW = pa.schema([
    ("media_id", pa.string()),
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("n_bytes", pa.int64()),
    ("valid", pa.bool_()),
])


def encode_fake_image(width: int, height: int, channels: int = 3,
                      seed: int = 0) -> bytes:
    header = MAGIC + struct.pack(">IIH", width, height, channels)
    n = min(width * height * channels, 4096)  # truncated pseudo-pixels
    # numpy-vectorized: identical bytes to the per-byte Python loop
    # ((seed*1103515245 + i*12345) % 256), at array speed
    idx = np.arange(n, dtype=np.int64)
    body = ((seed * 1103515245 + idx * 12345) % 256).astype(np.uint8).tobytes()
    return header + body


def _meta_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("content").to_pylist()
        fmt, w, h, c, nb, ok = [], [], [], [], [], []
        for blob in blobs:
            if blob is not None and blob[:6] == MAGIC and len(blob) >= 16:
                width, height, channels = struct.unpack(">IIH", blob[6:16])
                fmt.append("t2pimg")
                w.append(width)
                h.append(height)
                c.append(channels)
                ok.append(True)
            else:
                fmt.append("unknown")
                w.append(None)
                h.append(None)
                c.append(None)
                ok.append(False)
            nb.append(len(blob) if blob is not None else 0)
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(fmt), pa.array(w, pa.int32()),
             pa.array(h, pa.int32()), pa.array(c, pa.int32()),
             pa.array(nb, pa.int64()), pa.array(ok)],
            schema=META_ARROW,
        )


def media_meta(media: DataFrame) -> DataFrame:
    """Vectorized header parse: (media_id, format, width, height, channels,
    n_bytes, valid). One Arrow cross per batch; binary never leaves the
    executor."""
    return media.select("media_id", "content").mapInArrow(
        _meta_kernel, schema=META_SCHEMA
    )


def decode_media(blob: bytes):
    """Decode a media payload to a pixel array.

    OFFLINE STUB: real codecs (PIL/libjpeg/ffmpeg) are not available in
    this container. The fake codec decodes deterministically; everything
    else raises. On a real cluster this body swaps for PIL/torchvision
    inside the same mapInArrow kernel — the plumbing does not change.
    """
    if blob[:6] == MAGIC:
        width, height, channels = struct.unpack(">IIH", blob[6:16])
        return {"width": width, "height": height, "channels": channels,
                "pixels": blob[16:]}
    raise NotImplementedError(
        "real image decoding unavailable offline (no PIL/ffmpeg); "
        "only the deterministic T2PIMG fake codec is supported"
    )


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Derive a media table from the interleaved docs table: one row per
    media span, with deterministic fake content sized from the 'WxH' dims."""
    exploded = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media")
    dims = F.split(F.col("s.text"), "x")
    with_dims = exploded.select(
        F.concat_ws("#", "doc_id", F.col("s.media_ref")).alias("media_id"),
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.element_at(dims, 1).cast("int").alias("w"),
        F.element_at(dims, 2).cast("int").alias("h"),
    )

    def _encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out_schema = pa.schema([
            ("media_id", pa.string()), ("doc_id", pa.string()),
            ("media_ref", pa.string()), ("content", pa.binary()),
        ])
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            dids = batch.column("doc_id").to_pylist()
            refs = batch.column("media_ref").to_pylist()
            ws = batch.column("w").to_pylist()
            hs = batch.column("h").to_pylist()
            blobs = [
                encode_fake_image(w or 1, h or 1, seed=len(i))
                for i, w, h in zip(ids, ws, hs)
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(dids), pa.array(refs),
                 pa.array(blobs, pa.binary())],
                schema=out_schema,
            )

    return with_dims.mapInArrow(_encode, schema=MEDIA_SCHEMA)


# --- transform kernels -------------------------------------------------------

RESIZED_ARROW = pa.schema([
    ("media_id", pa.string()),
    ("content", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_media(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Proportional downscale to max_side. Real resampling is stubbed
    offline (PIL absent): the fake codec's header is rewritten and the
    pseudo-pixel payload deterministically subsampled; unknown formats pass
    through unchanged. The kernel shape (binary in -> binary out, Arrow
    batches) is exactly what a PIL/libvips body would use."""

    def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("content").to_pylist()
            out_blobs, ws, hs = [], [], []
            for blob in blobs:
                if blob is None or blob[:6] != MAGIC:
                    out_blobs.append(blob)
                    ws.append(None)
                    hs.append(None)
                    continue
                w, h, c = struct.unpack(">IIH", blob[6:16])
                scale = max(w, h) / max_side
                if scale <= 1:
                    nw, nh = w, h
                    body = blob[16:]
                else:
                    nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                    step = max(1, int(scale))
                    body = blob[16::step]
                out_blobs.append(
                    MAGIC + struct.pack(">IIH", nw, nh, c) + body
                )
                ws.append(nw)
                hs.append(nh)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(out_blobs, pa.binary()),
                 pa.array(ws, pa.int32()), pa.array(hs, pa.int32())],
                schema=RESIZED_ARROW,
            )

    return media.select("media_id", "content").mapInArrow(
        _kernel, schema=RESIZED_SCHEMA
    )


FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURES_ARROW = pa.schema([
    ("media_id", pa.string()),
    ("feature", pa.list_(pa.float32())),
])


def media_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-histogram feature per media row (stand-in for a
    real vision encoder — offline stub; the Arrow plumbing, batch shape and
    array<float> output column are production-real and feed t2p_spark.ann)."""

    def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("content").to_pylist()
            feats = []
            for blob in blobs:
                body = (blob or b"")[16:2048 + 16]
                # numpy bincount == the per-byte `hist[b % 8] += 1` loop
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(1, int(hist.sum()))
                feats.append([round(int(v) / total, 6) for v in hist])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(feats, pa.list_(pa.float32()))],
                schema=FEATURES_ARROW,
            )

    return media.select("media_id", "content").mapInArrow(
        _kernel, schema=FEATURES_SCHEMA
    )


PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("phash", T.LongType()),
])
PHASH_ARROW = pa.schema([
    ("media_id", pa.string()),
    ("phash", pa.int64()),
])


# dHash sample positions: bit b compares body[233*b] vs body[233*b + 97].
# Odd stride/offset on purpose — the fake codec's byte stream has period
# 256 in i (12345 ≡ 57 mod 256, full cycle), so any 256-aligned sampling
# (and any histogram of a 256-multiple window) is seed-invariant and
# degenerate; 233/97 break the alignment and the 8 fixture media yield 6
# distinct hashes with two 2-member collision clusters.
PHASH_STRIDE, PHASH_OFFSET = 233, 97


def media_phash(media: DataFrame) -> DataFrame:
    """Perceptual-hash-style media fingerprint — the dHash recipe (bit =
    sampled cell brighter than its neighbor) over the decoded byte stream;
    with the offline-stub codec the 'pixels' are the fake payload bytes,
    but the kernel shape (binary column in, integer fingerprint out,
    Arrow-batched) and the downstream cluster-groupBy are production-real.
    Pure integer comparisons, so the DuckDB oracle replays it bit-for-bit
    from (media_id, W, H). Near-dup media dedup then clusters on the
    fingerprint — no pairwise compare anywhere."""

    def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("content").to_pylist()
            hashes = []
            for blob in blobs:
                body = (blob or b"")[16:2048 + 16]
                ph = 0
                for b in range(FEATURE_DIM):
                    p = PHASH_STRIDE * b
                    q = p + PHASH_OFFSET
                    if q < len(body) and body[p] > body[q]:
                        ph |= 1 << b
                hashes.append(ph)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(hashes, pa.int64())],
                schema=PHASH_ARROW,
            )

    return media.select("media_id", "content").mapInArrow(
        _kernel, schema=PHASH_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 4,
                 frame_bytes: int = 256) -> DataFrame:
    """Sample every Nth fixed-size frame from a (fake) video payload:
    one output row per sampled frame with its index. Real demuxing is
    stubbed offline (ffmpeg absent); the explode-shaped kernel (1 row in ->
    k rows out) is the production pattern."""
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])
    out_arrow = pa.schema([
        ("media_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame", pa.binary()),
    ])

    def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("content").to_pylist()
            o_ids, o_idx, o_frames = [], [], []
            for mid, blob in zip(ids, blobs):
                body = (blob or b"")[16:]
                n_frames = len(body) // frame_bytes
                for i in range(0, n_frames, every_n):
                    o_ids.append(mid)
                    o_idx.append(i)
                    o_frames.append(body[i * frame_bytes:(i + 1) * frame_bytes])
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_ids), pa.array(o_idx, pa.int32()),
                 pa.array(o_frames, pa.binary())],
                schema=out_arrow,
            )

    return media.select("media_id", "content").mapInArrow(
        _kernel, schema=out_schema
    )
