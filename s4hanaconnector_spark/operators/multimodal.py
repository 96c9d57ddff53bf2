"""Multimodal column conventions (E22): image/audio/video ride DataFrames as
opaque ``binary`` payloads plus a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas functions over ``mapInPandas``.

The media libraries (PIL/librosa/av) are NOT in this container, so the
decode step is STUBBED: ``decode_stub=True`` computes deterministic fake
features (byte length, md5 prefix) through the exact same mapInPandas
plumbing — schema, partitioning, UDF signature and Arrow batch shape are
real and tested; swapping in a real decoder changes only the body of
``_featurize_batch``.

Scale notes: payload columns should be read with
``spark.sql.parquet.columnarReaderBatchSize`` lowered if payloads are MBs
(batch bytes = batchSize x payload); feature extraction parallelism is the
file-split parallelism of the scan — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = {"image", "audio", "video", "text"}

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
    """Arrow-batched feature extraction. STUB: real decode would go here
    (PIL.Image.open / librosa.load on payload bytes); the deterministic
    stand-in hashes the payload so outputs are verifiable."""
    for pdf in batches:
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": [m["kind"] for m in pdf["media_meta"]],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "md5_prefix": [hashlib.md5(bytes(p)).hexdigest()[:8] for p in pdf["payload"]],
                "feature_ok": True,
            }
        )
        yield out


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Run feature extraction over the payload column via mapInPandas.
    ``decode_stub=False`` is the hook for real decoders; it raises until a
    media library is available."""
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/av — not present in this "
            "container; use decode_stub=True (same plumbing, fake features)"
        )
    return df.mapInPandas(_featurize_batch, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, "
    "media_meta struct<kind:string, n_bytes:bigint, width:int, height:int>"
)


def image_resize(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing: payload -> decoded image -> resize -> re-encoded
    payload with updated (width, height) metadata. STUB: the 'resized'
    payload is a deterministic digest-derived byte string (real body:
    PIL.Image.open(payload).resize((w, h)).tobytes()); schema, metadata
    update and one-row-in/one-row-out batch shape are the real contract.
    Pure projection — no shuffle, parallelism = input splits."""
    if not decode_stub:
        raise NotImplementedError("real image resize requires PIL")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fake = [
                hashlib.md5(bytes(p) + f"{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": fake,
                    "media_meta": [
                        {"kind": "image", "n_bytes": len(b), "width": width, "height": height}
                        for b in fake
                    ],
                }
            )

    return df.mapInPandas(fn, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_no int, ts_ms bigint, frame_payload binary"


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Video/audio frame sampling: ONE payload row fans out to N frame rows
    — the mapInPandas contract where output row count differs from input
    (the batch-shape detail real decoders need). STUB: frame count derives
    deterministically from payload size (~1 frame/KB, capped), each frame
    payload is a digest of (payload, ascii frame_no) — an ASCII suffix so an
    external oracle can replay the hash over text; real body: av/ffmpeg
    keyframe extraction at ``every_ms`` intervals."""
    if not decode_stub:
        raise NotImplementedError("real frame sampling requires av/ffmpeg")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "ts_ms": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = min(max(len(raw) // 1000, 1), max_frames)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_payload"].append(
                        hashlib.md5(raw + str(i).encode()).digest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=FRAME_SCHEMA)


EMBED_DIM = 8
EMBED_SCHEMA = "doc_id bigint, embedding array<float>"


def embed_payload(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Embedding plumbing: payload -> model -> array<float> column ready for
    the similarity operators (operators/similarity.py). STUB: 8 floats
    derived from the payload digest, L2-normalized — deterministic and
    unit-length like real encoder output; real body: a batched model
    forward pass (the mapInPandas Arrow batch IS the model batch)."""
    if not decode_stub:
        raise NotImplementedError("real embedding requires a model runtime")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                dg = hashlib.md5(bytes(p)).digest()
                v = [int.from_bytes(dg[2 * i : 2 * i + 2], "big") - 32768 for i in range(EMBED_DIM)]
                norm = math.sqrt(sum(x * x for x in v)) or 1.0
                embs.append([float(x) / norm for x in v])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return df.mapInPandas(fn, schema=EMBED_SCHEMA)
