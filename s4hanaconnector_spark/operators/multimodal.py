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
