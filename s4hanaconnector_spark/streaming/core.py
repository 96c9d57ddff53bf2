"""Streaming operator implementations.

Scale notes: every stateful operator here carries a watermark so state is
TTL'd, never unbounded (SURVEY §7 risk list). State lives in the HDFS/RocksDB
state store keyed by the groupBy columns — partitioned by key hash, so a
1000-executor cluster shards it linearly. ``foreachBatch`` output is made
idempotent with a commit log, because Spark guarantees at-least-once delivery
of a batch to the sink function.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PKLOG_DDL = (
    "change_ts timestamp, schema_name string, change_type string, "
    "pk1 string, pk2 string, pk3 string, pk4 string, pk5 string, pk6 string, "
    "transactionid bigint, transaction_seq int, table_name string"
)


def changes_stream(
    spark: SparkSession,
    log_dir: str,
    schema: str | T.StructType = PKLOG_DDL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """E17: a change feed as a streaming DataFrame — file-based source where
    each dropped parquet file is one producer poll's worth of PKLOG rows.
    ``maxFilesPerTrigger`` is the streaming analogue of the reference's
    per-poll txid range: it bounds how much log one micro-batch ingests."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)


# ---------------------------------------------------------------------------
# E16 — transactional sink: foreachBatch + idempotent commit log
# ---------------------------------------------------------------------------


class transactional_sink:
    """Exactly-once-per-batch semantics over an at-least-once channel,
    mirroring the reference's delta transactions: a batch is (1) written to
    ``out_dir/batch_id=N/``, (2) recorded in ``out_dir/_commits/N.json``.
    A replayed batch id that is already committed is skipped — the same
    "this txid range was already emitted" idempotency the reference gets
    from tagging Kafka transactions with the hi-watermark
    (beginDeltaTransaction(hi, ...), S4HanaProducer.java:424).

    Use as: ``stream.writeStream.foreachBatch(transactional_sink(out))``.
    """

    def __init__(
        self,
        out_dir: str,
        transform: Callable[[DataFrame, int], DataFrame] | None = None,
    ) -> None:
        self.out_dir = out_dir
        self.transform = transform
        os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "_commits", f"{batch_id}.json")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.committed(batch_id):
            return  # replay of an already-committed transaction: no-op
        df = self.transform(batch_df, batch_id) if self.transform else batch_df
        n = df.count()
        df.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={batch_id}")
        )
        tmp = self._commit_path(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": n}, f)
        os.rename(tmp, self._commit_path(batch_id))  # atomic commit point


# ---------------------------------------------------------------------------
# E24 — windowed aggregations
# ---------------------------------------------------------------------------


def tumbling_window_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *keys)
        .agg(*aggs)
    )
    return (
        out.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding windows — each event lands in window/slide buckets."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), *keys)
        .agg(*aggs)
    )
    return (
        out.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) — state closes once the watermark passes
    session end + gap, so memory is bounded by active sessions only."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
    )
    return (
        out.withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


# ---------------------------------------------------------------------------
# E25/E26 — stateful dedup with TTL
# ---------------------------------------------------------------------------


def stateful_dedup(stream: DataFrame, keys: list[str], ts_col: str, ttl: str) -> DataFrame:
    """E25: drop duplicate keys across micro-batches with watermark-bounded
    state (``dropDuplicatesWithinWatermark``): a key is remembered only
    until the watermark passes its event time + ttl — the streaming
    equivalent of the reference's 7-day PKLOG retention (state that old can
    no longer produce a duplicate and is dropped)."""
    return stream.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(keys)
