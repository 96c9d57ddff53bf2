"""Multimodal column conventions (E22): image/audio/video ride DataFrames as
opaque ``binary`` payloads plus a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas functions over ``mapInPandas``.

Two decode paths share every piece of Spark plumbing (schema, partitioning,
UDF signature, Arrow batch shape):

  * ``decode_stub=True`` (default, the oracle gate): deterministic
    digest-derived outputs an external SQL oracle can replay byte-for-byte.
  * ``decode_stub=False`` (the REAL pixel path): payloads are decoded as a
    synthetic RGB8 raster (``encode_rgb_grid``/``decode_rgb_grid`` — an
    8-byte width/height header + raw H*W*3 bytes; headerless payloads wrap
    deterministically into a square grid) and every operator runs genuine
    numpy pixel work: nearest-neighbor resize by integer index maps,
    horizontal-band frame extraction, channel-statistics embeddings. The
    codec stands in for PIL/av (absent from this container) — swapping in a
    real media library changes only encode/decode, not one line of Spark.

Scale notes: payload columns should be read with
``spark.sql.parquet.columnarReaderBatchSize`` lowered if payloads are MBs
(batch bytes = batchSize x payload); feature extraction parallelism is the
file-split parallelism of the scan — no shuffle at all.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Synthetic RGB8 raster codec — the container-friendly stand-in for PIL/av
# ---------------------------------------------------------------------------
_RGB_MAGIC = b"RG8\x00"
_HEADER = struct.Struct(">4sII")  # magic, width, height


def encode_rgb_grid(arr: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as magic + width + height + raw
    row-major RGB bytes."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"expected (H, W, 3), got {arr.shape}")
    return _HEADER.pack(_RGB_MAGIC, w, h) + arr.astype(np.uint8).tobytes()


def decode_rgb_grid(payload: bytes) -> np.ndarray:
    """Decode bytes to an (H, W, 3) uint8 raster. Payloads carrying a valid
    header round-trip exactly; arbitrary bytes (e.g. UTF-8 text fixtures)
    wrap deterministically into the smallest square grid that holds them,
    zero-padded — so the real pixel path is total over any input."""
    raw = bytes(payload)
    if len(raw) >= _HEADER.size:
        magic, w, h = _HEADER.unpack_from(raw)
        if magic == _RGB_MAGIC and len(raw) == _HEADER.size + w * h * 3:
            return np.frombuffer(raw, np.uint8, count=w * h * 3, offset=_HEADER.size).reshape(h, w, 3)
    side = max(1, math.isqrt(max(len(raw) - 1, 0) // 3) + 1)
    buf = np.zeros(side * side * 3, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    return buf.reshape(side, side, 3)


def _nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — the real algorithm,
    vectorized (two gathers, no Python pixel loop)."""
    h, w, _ = img.shape
    ys = np.minimum((np.arange(height) * h // height), h - 1)
    xs = np.minimum((np.arange(width) * w // width), w - 1)
    return img[ys][:, xs]

MEDIA_KINDS = {"image", "audio", "video", "text"}


def _raw(payload) -> bytes | None:
    """NULL-safe payload access: a NULL source column (text NULL ->
    F.encode NULL) arrives in the Arrow batch as None; every batch body
    must degrade to a marked row (or zero fan-out rows), never crash the
    whole task on len(None)/bytes(None)."""
    return None if payload is None else bytes(payload)

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, md5_prefix string, feature_ok boolean"
)


def attach_payload(df: DataFrame, text_col: str, id_col: str, kind: str = "text") -> DataFrame:
    """Fixture adapter: treat the UTF-8 bytes of a text column as the opaque
    media payload, with the typed metadata struct every multimodal column
    carries: (kind, n_bytes, source)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("media_meta"),
    )


def _featurize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over the RAW payload bytes —
    deterministic digests the oracle can replay."""
    for pdf in batches:
        raws = [_raw(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": [m["kind"] for m in pdf["media_meta"]],
                "n_bytes": [len(r) if r is not None else None for r in raws],
                "md5_prefix": [
                    hashlib.md5(r).hexdigest()[:8] if r is not None else None
                    for r in raws
                ],
                "feature_ok": [r is not None for r in raws],
            }
        )
        yield out


def _featurize_batch_decoded(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real pixel path: decode every payload to an RGB raster and report
    DECODED properties (pixel-buffer size, digest of the decoded pixels) —
    the same schema, so downstream consumers don't care which path ran."""
    for pdf in batches:
        imgs = [
            decode_rgb_grid(r) if r is not None else None
            for r in (_raw(p) for p in pdf["payload"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": [m["kind"] for m in pdf["media_meta"]],
                "n_bytes": [img.nbytes if img is not None else None for img in imgs],
                "md5_prefix": [
                    hashlib.md5(img.tobytes()).hexdigest()[:8] if img is not None else None
                    for img in imgs
                ],
                "feature_ok": [img is not None for img in imgs],
            }
        )


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Run feature extraction over the payload column via mapInPandas.
    ``decode_stub=False`` runs the real pixel path (decode to an RGB raster,
    feature the decoded buffer); the default digests the raw payload so the
    SQL oracle can replay it."""
    fn = _featurize_batch if decode_stub else _featurize_batch_decoded
    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, "
    "media_meta struct<kind:string, n_bytes:bigint, width:int, height:int>"
)


def image_resize(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Resize: payload -> decoded image -> resize -> re-encoded payload with
    updated (width, height) metadata; one row in / one row out, pure
    projection — no shuffle, parallelism = input splits.

    ``decode_stub=False`` is the REAL path: decode to an (H, W, 3) raster,
    nearest-neighbor resize via vectorized integer index maps, re-encode
    with the codec header. The default keeps the digest-derived payload the
    SQL oracle replays (md5 of payload + 'WxH')."""

    def fn_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fake = [
                hashlib.md5(r + f"{width}x{height}".encode()).digest()
                if r is not None
                else None
                for r in (_raw(p) for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": fake,
                    "media_meta": [
                        {
                            "kind": "image",
                            "n_bytes": len(b) if b is not None else None,
                            "width": width,
                            "height": height,
                        }
                        for b in fake
                    ],
                }
            )

    def fn_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                encode_rgb_grid(_nn_resize(decode_rgb_grid(r), width, height))
                if r is not None
                else None
                for r in (_raw(p) for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "media_meta": [
                        {
                            "kind": "image",
                            "n_bytes": len(b) if b is not None else None,
                            "width": width,
                            "height": height,
                        }
                        for b in resized
                    ],
                }
            )

    return df.mapInPandas(fn_stub if decode_stub else fn_real, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_no int, ts_ms bigint, frame_payload binary"


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Video/audio frame sampling: ONE payload row fans out to N frame rows
    — the mapInPandas contract where output row count differs from input
    (the batch-shape detail real decoders need).

    Stub path (default, oracle-replayable): frame count derives from
    payload size (~1 frame/KB, capped), each frame payload is a digest of
    (payload, ascii frame_no). Real path (``decode_stub=False``): decode
    the raster and emit horizontal bands as frames — frame i is rows
    [i*H/n, (i+1)*H/n) re-encoded with the codec, the synthetic analogue of
    av/ffmpeg keyframe extraction at ``every_ms`` intervals."""

    def fn_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "ts_ms": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = _raw(payload)
                if raw is None:
                    continue  # NULL payload: zero frames, not a task crash
                n_frames = min(max(len(raw) // 1000, 1), max_frames)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_payload"].append(
                        hashlib.md5(raw + str(i).encode()).digest()
                    )
            yield pd.DataFrame(rows)

    def fn_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "ts_ms": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = _raw(payload)
                if raw is None:
                    continue  # NULL payload: zero frames
                img = decode_rgb_grid(raw)
                h = img.shape[0]
                n_frames = min(h, max_frames)
                for i in range(n_frames):
                    lo, hi = i * h // n_frames, (i + 1) * h // n_frames
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_payload"].append(encode_rgb_grid(img[lo:hi]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn_stub if decode_stub else fn_real, schema=FRAME_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = "doc_id bigint, embedding array<float>"


def embed_payload(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Embedding plumbing: payload -> model -> array<float> column ready for
    the similarity operators (operators/similarity.py).

    Stub path (default, oracle-replayable): 8 floats from the payload
    digest, L2-normalized — deterministic and unit-length like real encoder
    output. Real path (``decode_stub=False``): decode the raster and embed
    its PIXEL STATISTICS — per-channel mean and standard deviation plus
    log-size and aspect ratio, L2-normalized — a genuine (if tiny) visual
    descriptor computed with vectorized numpy; a learned encoder would
    replace only this batch body (the mapInPandas Arrow batch IS the model
    batch)."""

    def fn_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                r = _raw(p)
                if r is None:
                    embs.append(None)  # NULL payload -> NULL embedding
                    continue
                dg = hashlib.md5(r).digest()
                v = [int.from_bytes(dg[2 * i : 2 * i + 2], "big") - 32768 for i in range(EMBED_DIM)]
                norm = math.sqrt(sum(x * x for x in v)) or 1.0
                embs.append([float(x) / norm for x in v])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    def fn_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                r = _raw(p)
                if r is None:
                    embs.append(None)
                    continue
                img = decode_rgb_grid(r).astype(np.float32)
                h, w, _ = img.shape
                v = np.concatenate(
                    [
                        img.mean(axis=(0, 1)) / 255.0,          # 3: channel means
                        img.std(axis=(0, 1)) / 255.0,           # 3: channel spreads
                        [np.log1p(h * w) / 20.0, w / (h + w)],  # 2: size, aspect
                    ]
                )
                norm = float(np.linalg.norm(v)) or 1.0
                embs.append([float(x) / norm for x in v])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return df.mapInPandas(fn_stub if decode_stub else fn_real, schema=EMBED_SCHEMA)
