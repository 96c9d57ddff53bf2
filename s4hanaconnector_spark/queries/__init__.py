"""Declared query registry — the correctness surface of the engine.

Every implemented operator from SURVEY §2 is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet
tables. The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).

Determinism rules (see tests/test_oracle_parity.py, which enforces them at
sf0.001 before the driver ever sees the queries):
  * Aggregates over DOUBLE columns go through exact DECIMAL arithmetic and
    are cast back to DOUBLE at the end — float summation order differs
    between engines, decimal addition does not.
  * Column names are aliased identically on both sides (the driver sorts
    columns by name before hashing).
  * Any ORDER BY carries a unique tiebreak column so limit frontiers are
    set-deterministic.
"""

from __future__ import annotations

from s4hanaconnector_spark.queries.registry import REGISTRY, QueryDef, register  # noqa: F401
from s4hanaconnector_spark.queries import cdc as _cdc  # noqa: F401,E402

_MODULES = [_cdc]

# Registry order is VISIBILITY order: the driver's per-round correctness
# harness samples the first 50 entries. The head is ROTATED each round so
# driver verification accumulates across the registry (VERDICT r8 next #2:
# 165 of 215 queries had never had a driver-produced CORRECTNESS row).
#
# Round-9 cohort: 47 first-time queries (streaming family, graph,
# multimodal, full dedup + similarity ladders, text analysis, asof/range
# joins) + regression canaries (cdc_delta, source_jdbc_roundtrip), the
# round's one red r8 row re-pinned after its fix (source_jdbc_type_gallery),
# and the round's new queries (similarity_topk_ivf_int8, similarity_topk_pq).
#
# Displaced from the r8 head (coverage trade, explicit per ADVICE r8):
# cdc_poll_jdbc_wire, source_jdbc_predicates, source_jdbc_pushdown,
# cdc_materialize_evolving — all carry green r8 driver rows and stay covered
# by CORRECTNESS_FULL.json + tests/test_oracle_parity.py every round.
# Mid-r9 trade: the round's four NEW queries (dedup_semdedup,
# dedup_semantic_incremental, similarity_topk_ivf_pq,
# similarity_ivf_pq_recall) take the slots of text_token_count /
# text_quality / text_fingerprint / window_value_functions — each displaced
# query keeps an in-head family sibling (text_stats+text_lang_id,
# window_rank_functions) and full coverage in CORRECTNESS_FULL.json +
# tests/test_oracle_parity.py.
# Queries never driver-sampled in ANY round are tracked against the union of
# committed CORRECTNESS_r0*.json keys (see tools/rotate_head.py).
_SAMPLE_HEAD = [
    # canaries (driver-green in r8; regression tripwire)
    "cdc_delta",
    "source_jdbc_roundtrip",
    # r8's one red row, re-pinned after the hex-projection fix
    "source_jdbc_type_gallery",
    # new this round: IVF cells + int8 rescore composition; PQ + exact rerank
    "similarity_topk_ivf_int8",
    "similarity_topk_pq",
    # streaming family (first driver rows)
    "streaming_stream_stream_join",
    "streaming_dim_enrich",
    "streaming_sliding_value",
    "streaming_stateful_dedup",
    "streaming_session_windows",
    "streaming_late_data_drop",
    "streaming_ss_join_cross_batch",
    "streaming_incremental_dedup",
    # graph / clustering
    "graph_pagerank",
    "graph_label_propagation",
    "dedup_clusters",
    # multimodal
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_resize",
    "multimodal_shard_manifest",
    # dedup ladder
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_minhash_estimate_quality",
    "dedup_jaccard",
    "dedup_simhash",
    "dedup_ngram_coverage",
    "dedup_embedding_cosine",
    "dedup_edit_distance",
    "dedup_keep_best",
    "dedup_incremental_corpus",
    "dedup_incremental_neardup",
    # new mid-r9: cell-partitioned semantic dedup (SemDeDup) + its
    # incremental batch-vs-corpus variant + char-level winnowing substring
    # dedup (displacing asof_forward_next_click — two asof siblings stay)
    "dedup_semdedup",
    "dedup_semantic_incremental",
    "dedup_substring_winnow",
    # similarity ladder
    "similarity_topk_bruteforce",
    "similarity_lsh_pairs",
    "similarity_topk_ivf",
    "similarity_ivf_recall",
    "similarity_topk_int8",
    "similarity_int8_recall",
    "similarity_topk_auto",
    # new mid-r9: the composed IVFADC rung + its recall gate
    "similarity_topk_ivf_pq",
    "similarity_ivf_pq_recall",
    # text analysis
    "text_stats",
    "text_lang_id",
    # asof / range joins + window + null-safe join
    "asof_error_last_click",
    "asof_nearest_click",
    "range_join_error_clicks",
    "window_rank_functions",
]


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (side-effect: registration) and return a
    REORDERED COPY of the full registry with the declared sample head pinned
    first. The global REGISTRY keeps module registration order (ADVICE r8:
    no mutate-in-place side effects)."""
    from s4hanaconnector_spark.queries import analytics as _an  # noqa: F401
    from s4hanaconnector_spark.queries import jdbc_derby as _jd  # noqa: F401
    from s4hanaconnector_spark.queries import llmops as _llm  # noqa: F401
    from s4hanaconnector_spark.queries import partsupp as _ps  # noqa: F401
    from s4hanaconnector_spark.queries import surface as _surf  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _SAMPLE_HEAD if n in REGISTRY}
    ordered.update((n, d) for n, d in REGISTRY.items() if n not in ordered)
    return ordered
