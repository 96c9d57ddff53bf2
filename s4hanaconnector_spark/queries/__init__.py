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
# Round-10 cohort: 45 first-timers — the TPC-H tail (q2/q4/q11/q12/q16/
# q17/q20/q21/q22), window_* / agg_* families, hash-sampling + splits,
# text analysis, catalog/nesting/SAP-type surface, the three r9 recall/
# probe gates that had only local rows, salted + null-safe joins, the six
# queries whose oracles carried the latent HUGEINT dtype drift fixed this
# round (user_retention_daily, cumulative_adopters, skew_diagnostics,
# pipeline_pretraining_corpus, pack_training_sequences,
# mixture_token_budget — driver rows prove the fixes), and the round's seven
# NEW queries (dedup_semdedup_indexed, similarity_index_stream_ingest,
# similarity_index_compact, dedup_semdedup_multiprobe,
# dedup_semdedup_recall, streaming_semantic_ingest,
# dedup_semantic_incremental_multiprobe).
# Retained canaries: cdc_delta, source_jdbc_roundtrip,
# source_jdbc_type_gallery. Re-pinned after their oracle-dtype fix:
# multimodal_shard_manifest, dedup_minhash_estimate_quality.
#
# Displaced from the r9 head (coverage trade, explicit per ADVICE r8): the
# full r9 streaming/graph/dedup/similarity-ladder cohort — every displaced
# query carries a green r9 driver row and stays covered by
# CORRECTNESS_FULL.json + tests/test_oracle_parity.py every round.
# Mid-r10 trade: the round's five LATER new queries
# (similarity_index_compact, dedup_semdedup_multiprobe,
# dedup_semdedup_recall, streaming_semantic_ingest,
# dedup_semantic_incremental_multiprobe) take the slots of
# catalog_table_exists / nest_customer_orders_items / sap_type_edges /
# window_rolling_distinct / sample_stratified_by_lang (window_rolling_1h,
# window_value_functions, window_percent_of_total and sample_k_per_lang
# stay in-head for their families) — each displaced query keeps
# an in-head family sibling (catalog_list_tables + catalog_pk_fallback,
# nest_orders_items, sap_type_casts) and full coverage in
# CORRECTNESS_FULL.json + tests/test_oracle_parity.py.
# Queries never driver-sampled in ANY round are tracked against the union
# of committed CORRECTNESS_r0*.json keys (see tools/rotate_head.py).
_SAMPLE_HEAD = [
    # canaries (driver-green in r9; regression tripwire)
    "cdc_delta",
    "source_jdbc_roundtrip",
    "source_jdbc_type_gallery",
    # r9's two red rows, re-pinned after the CAST(... AS BIGINT) oracle fix
    "multimodal_shard_manifest",
    "dedup_minhash_estimate_quality",
    # new this round: SemDeDup off the persisted ANN index's quantizer;
    # streaming foreachBatch ingest into the index + bit-identical probe;
    # index compaction (fold append files, probe unchanged); multi-probe
    # SemDeDup + the cell-recall gate that motivated it
    "dedup_semdedup_indexed",
    "similarity_index_stream_ingest",
    "similarity_index_compact",
    "dedup_semdedup_multiprobe",
    "dedup_semdedup_recall",
    "streaming_semantic_ingest",
    "dedup_semantic_incremental_multiprobe",
    # TPC-H tail (first driver rows)
    "q2_min_cost_supplier",
    "q4_late_shipment_priority",
    "q11_important_stock",
    "q12_priority_shipping",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q20_promotion_parts",
    "q21_waiting_supplier",
    "q22_wealthy_inactive",
    # window / agg families
    "window_value_functions",
    "window_rolling_1h",
    "window_percent_of_total",
    "agg_latest_event_by_user",
    "agg_approx_quantiles",
    # deterministic hash sampling + leakage-safe splits
    "sample_documents",
    "sample_k_per_lang",
    "split_train_val_test",
    "split_leakage_free",
    # text analysis
    "text_token_count",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    # catalog / nesting / SAP type surface
    "catalog_list_tables",
    "catalog_pk_fallback",
    "nest_orders_items",
    "sap_type_casts",
    "scalar_surface",
    # recall / persisted-probe gates (local-pass only until now)
    "similarity_ivf_int8_recall",
    "similarity_pq_recall",
    "similarity_index_probe",
    # join strategies
    "join_salted_supplier_revenue",
    "join_null_safe",
    # oracles fixed this round (latent HUGEINT drift) — driver-proof them
    "user_retention_daily",
    "cumulative_adopters",
    "skew_diagnostics",
    "pipeline_pretraining_corpus",
    "pack_training_sequences",
    "mixture_token_budget",
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
