"""Structured Streaming layer (E16-E17, E24-E26).

The reference's runtime is a poll loop: every ``pollinterval`` seconds it
computes a safe watermark, runs the delta query for the txid range since the
last poll, and emits the rows inside one Kafka transaction
(S4HanaProducer.java:391-469 — SURVEY §3.1). In Spark this maps 1:1 onto
micro-batch Structured Streaming:

  poll interval            -> trigger(processingTime=...)
  (lo, hi] txid range      -> source offsets / checkpoint
  Kafka delta transaction  -> foreachBatch + idempotent commit log keyed by
                              batch_id (replays of a committed batch no-op)
  PKLOG retention          -> watermark TTL on state

All operators applied inside a micro-batch are the SAME DataFrame
compositions as the batch engine (operators/cdc.py) — one implementation,
two execution modes.
"""

from s4hanaconnector_spark.streaming.core import (  # noqa: F401
    changes_stream,
    session_window_agg,
    sliding_window_agg,
    stateful_dedup,
    stateful_latest_by_key,
    transactional_sink,
    tumbling_window_agg,
)
