"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas plumbing.

All three kinds use REAL public container formats that decode with
nothing beyond NumPy + struct (no codec libraries needed):

  image : binary PPM (P6)    — ASCII header + raw RGB24
  audio : WAV (RIFF PCM s16) — 44-byte canonical header + samples
  video : YUV4MPEG2 (.y4m)   — text header + FRAME-delimited raw
                               4:2:0 planar frames

Compressed formats (PNG/JPEG/...) raise NotImplementedError unless PIL
is importable — that path is honestly gated, not faked. The reference
has no media pipeline; this is the target-side extension for
LLM-training-data work (driver instruction: multimodal columns), with
schemas/batching designed so payloads never leave the executors.
"""

from __future__ import annotations

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

WAV_RATE = 8000      # samples/s, mono s16le
Y4M_FPS = 4          # frames/s (F4:1)


# ---------------------------------------------------------------------------
# encoders (deterministic synthetic content for fixtures/benchmarks)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE PCM."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def encode_y4m(frames: np.ndarray, fps: int = Y4M_FPS) -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 4:2:0 (chroma = 128)."""
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode("ascii")]
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    for i in range(n):
        out.append(b"FRAME\n" + frames[i].astype(np.uint8).tobytes() + chroma + chroma)
    return b"".join(out)


def synth_payload(media_id: int, kind: str, width: int, height: int, duration_ms: int) -> bytes:
    """Deterministic real-format payload — a pure function of the args."""
    if kind == "image":
        y, x = np.mgrid[0:height, 0:width]
        px = np.stack(
            [(x * 3 + y * 7 + media_id * 11 + c * 29) % 256 for c in range(3)], axis=-1
        )
        return encode_ppm(px)
    if kind == "audio":
        n = duration_ms * WAV_RATE // 1000
        t = np.arange(n, dtype=np.float64) / WAV_RATE
        f = 200.0 + (media_id % 20) * 50.0
        return encode_wav((16000 * np.sin(2 * np.pi * f * t)).astype(np.int16))
    if kind == "video":
        n_frames = max(1, duration_ms * Y4M_FPS // 1000)
        y, x = np.mgrid[0:height, 0:width]
        frames = np.stack(
            [(x + y + 13 * k + media_id) % 256 for k in range(n_frames)]
        )
        return encode_y4m(frames)
    raise ValueError(f"unknown kind {kind!r}")


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table: kinds cycle image/audio/video; dims
    and durations are pure functions of the row index (which is what
    makes the media stats DuckDB-oracle-checkable)."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/x-portable-pixmap", "audio": "audio/wav", "video": "video/x-yuv4mpeg"}
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 32 + (i % 5) * 16, 24 + (i % 3) * 16
        dur = 1000 + (i % 7) * 500 if kind != "image" else 0
        rows.append((i, kind, synth_payload(i, kind, w, h, dur), mimes[kind], w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decoders (pure NumPy/struct)
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """binary PPM (P6) -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated ASCII
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while payload[pos] in b" \t\n\r":
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while payload[end] not in b" \t\n\r":
            end += 1
        fields.append(payload[pos:end])
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (int16 samples, rate). Walks chunks properly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, channels = 12, None, None, None
    samples = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM s16 WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if samples is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples, rate


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """YUV4MPEG2 -> (luma frames (n, h, w) uint8, w, h, fps)."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = int(num) // int(den)
    if not (w and h and fps):
        raise ValueError("incomplete y4m header")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)  # 4:2:0
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos).reshape(h, w)
        )
        pos += frame_bytes
    return np.stack(frames), w, h, fps


def _decode_any(kind: str, payload: bytes):
    """Dispatch on content magic. Compressed formats need PIL —
    honestly gated, never faked."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:9] == b"YUV4MPEG2":
        return decode_y4m(payload)
    try:
        import PIL.Image  # noqa: F401  (optional; absent in this container)
    except ImportError:
        raise NotImplementedError(
            f"{kind}: compressed formats (PNG/JPEG/...) require PIL, "
            "which is not in this container; raw PPM/WAV/Y4M decode natively"
        ) from None
    raise NotImplementedError("PIL wiring for compressed formats is not built")


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas, batch-columnar end to end)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _featurize(kind: str, decoded, dim: int) -> np.ndarray:
    """Real content statistics, padded/truncated to dim floats."""
    if kind == "image":
        px = decoded.astype(np.float64)
        v = np.concatenate(
            [px.mean(axis=(0, 1)), px.std(axis=(0, 1)), [px.shape[1], px.shape[0]]]
        )
    elif kind == "audio":
        samples, rate = decoded
        s = samples.astype(np.float64) / 32768.0
        zc = np.mean(np.abs(np.diff(np.sign(s)))) / 2.0 if s.size > 1 else 0.0
        spec = np.abs(np.fft.rfft(s[: min(s.size, 4096)]))
        bands = [b.mean() if b.size else 0.0 for b in np.array_split(spec, 8)]
        v = np.concatenate([[s.std(), zc, float(rate)], bands])
    else:  # video
        frames, w, h, fps = decoded
        first = frames[0].astype(np.float64)
        motion = (
            np.abs(frames[1:].astype(np.float64) - frames[:-1]).mean()
            if frames.shape[0] > 1
            else 0.0
        )
        v = np.array([first.mean(), first.std(), motion, float(len(frames)), w, h, fps])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, v.size)] = v[:dim]
    return out


def decode_and_featurize(media: DataFrame, dim: int = 16) -> DataFrame:
    """Real decode + per-kind content features via mapInPandas."""

    def _batches(it):
        for pdf in it:
            widths, heights, nbytes, feats = [], [], [], []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                p = bytes(p)
                dec = _decode_any(kind, p)
                if kind == "image":
                    h, w = dec.shape[:2]
                elif kind == "video":
                    _, w, h, _ = dec
                else:
                    w = h = 0
                widths.append(w)
                heights.append(h)
                nbytes.append(len(p))
                feats.append(_featurize(kind, dec, dim).tolist())
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
    """True nearest-neighbor downsample of PPM pixel data (aspect
    preserved), re-encoded as PPM."""

    def _batches(it):
        for pdf in it:
            out_w, out_h, payloads = [], [], []
            for p in pdf["payload"]:
                px = decode_ppm(bytes(p))
                h, w = px.shape[:2]
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ys = (np.arange(nh) * (h / nh)).astype(np.int64)
                xs = (np.arange(nw) * (w / nw)).astype(np.int64)
                payloads.append(encode_ppm(px[ys][:, xs]))
                out_w.append(nw)
                out_h.append(nh)
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
    """Frame sampling for video: decode the y4m stream and emit the raw
    luma plane of the frame nearest each sampled timestamp (flat-map
    via mapInPandas; one output row per sampled ts)."""

    def _batches(it):
        for pdf in it:
            mids, idxs, tss, frames = [], [], [], []
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                luma, w, h, fps = decode_y4m(bytes(p))
                for ts in range(0, max(1, int(dur)), every_ms):
                    fi = min(ts * fps // 1000, luma.shape[0] - 1)
                    mids.append(mid)
                    idxs.append(fi)
                    tss.append(ts)
                    frames.append(luma[fi].tobytes())
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.where("kind = 'video'").mapInPandas(_batches, FRAME_SCHEMA)
