"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched UDF plumbing.

The image/audio codec libraries are not in this container, so the
actual byte decoding is STUBBED (clearly marked below): real formats
raise NotImplementedError unless PIL/soundfile are importable, and the
test fixtures use a self-describing deterministic fake payload
(`CLNN` header + metadata + hash-derived body). Everything Spark-side
— schemas, Arrow batch shapes, explode semantics, partitioning — is
real and tested; swapping the stub for PIL.Image.open is a one-line
change inside the UDF.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"CLNN"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def fake_payload(media_id: int, kind: str, width: int = 64, height: int = 48, duration_ms: int = 0) -> bytes:
    """Deterministic self-describing payload: MAGIC + dims + seeded body."""
    body = hashlib.md5(f"{kind}-{media_id}".encode()).digest() * 4
    return MAGIC + struct.pack("<iii", width, height, duration_ms) + body


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 32 + (i % 5) * 16, 24 + (i % 3) * 16
        dur = 1000 + (i % 7) * 500 if kind != "image" else 0
        rows.append(
            (i, kind, fake_payload(i, kind, w, h, dur),
             f"x-clann/{kind}", w, h, dur)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_header(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: parse the fake header; real formats need PIL etc."""
    if payload[:4] != MAGIC:
        try:  # real image path, only if the codec lib exists
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "real media decoding requires PIL/soundfile (not in this "
                "container); payload is not a CLNN fixture"
            ) from None
        raise NotImplementedError("real decoder wiring is a stub in this build")
    w, h, dur = struct.unpack("<iii", payload[4:16])
    return w, h, dur


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_and_featurize(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas decode + feature extraction (deterministic fake
    embedding: seeded bytes -> unit vector). Batch-columnar end to end."""

    def _batches(it):
        for pdf in it:
            feats, widths, heights, nbytes = [], [], [], []
            for p in pdf["payload"]:
                w, h, _ = _decode_header(bytes(p))
                widths.append(w)
                heights.append(h)
                nbytes.append(len(p))
                raw = np.frombuffer(
                    hashlib.md5(bytes(p)).digest() + hashlib.md5(bytes(p) + b"x").digest(),
                    dtype=np.uint8,
                )[:dim].astype(np.float32)
                v = raw - raw.mean()
                n = np.linalg.norm(v)
                feats.append((v / n if n > 0 else v).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    return media.mapInPandas(_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """STUB resize: recompute target dims (aspect-preserving) and emit a
    re-headered payload; a real build would re-encode pixels here."""

    def _batches(it):
        for pdf in it:
            out_w, out_h, payloads = [], [], []
            for p in pdf["payload"]:
                w, h, dur = _decode_header(bytes(p))
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out_w.append(nw)
                out_h.append(nh)
                payloads.append(MAGIC + struct.pack("<iii", nw, nh, dur) + bytes(p)[16:])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "width": out_w, "height": out_h, "payload": payloads}
            )

    return media.where("kind = 'image'").mapInPandas(_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling for video: one output row per sampled timestamp
    (flat-map via mapInPandas; frame bytes are stub-derived)."""

    def _batches(it):
        for pdf in it:
            mids, idxs, tss, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, dur = _decode_header(bytes(p))
                for k, ts in enumerate(range(0, max(1, dur), every_ms)):
                    mids.append(mid)
                    idxs.append(k)
                    tss.append(ts)
                    frames.append(hashlib.md5(bytes(p) + ts.to_bytes(4, "little")).digest())
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.where("kind = 'video'").mapInPandas(_batches, FRAME_SCHEMA)
