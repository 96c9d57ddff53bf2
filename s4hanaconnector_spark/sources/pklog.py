"""Deterministic synthetic PKLOG + in-flight-transaction fixtures.

The reference's change log is populated by database triggers
(S4HanaTableMapping.java:176-238) writing into PKLOG
(S4HanaProducer.java:99-111). There is no HANA here, so tests and declared
queries synthesize a change feed ARITHMETICALLY from the immutable ``orders``
fixture — every derivation is pure modulo math on ``o_orderkey``, so the
exact same feed is reproducible in DuckDB SQL (see ``PKLOG_ORACLE_CTE``) for
the correctness oracle.

Feed design (exercises every delta-query corner, SURVEY §5.2):
  * ``o_orderkey % 7 == 0``  -> 'U' update,  txid 1000 + key % 50, seq 1
  * ``o_orderkey % 21 == 0`` -> second 'U',  txid 1000 + key % 50 + 7, seq 2
      (same PK, higher txid — exercises per-PK latest-only dedup, O11)
  * ``o_orderkey % 5 == 0``  -> 'I' insert,  txid 1000 + key % 45, seq 1
  * ``o_orderkey % 11 == 0`` -> 'D' delete of key + 1_000_000 (a PK that
      does NOT exist in the source — the outer join must classify it 'D'
      and still carry the PK from the log side, O13/O14)

PK values are stringified into pk1 (PKLOG stores nvarchar(256) keys,
S4HanaProducer.java:104-109); change_ts reuses o_orderdate for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _leg(orders: DataFrame, mod: int, ctype: str, key_expr, txid_expr, seq: int) -> DataFrame:
    null_pks = [F.lit(None).cast("string").alias(f"pk{i}") for i in range(2, 7)]
    return orders.filter(F.col("o_orderkey") % mod == 0).select(
        F.col("o_orderdate").alias("change_ts"),
        F.lit("S4").alias("schema_name"),
        F.lit(ctype).alias("change_type"),
        key_expr.cast("string").alias("pk1"),
        *null_pks,
        txid_expr.cast("bigint").alias("transactionid"),
        F.lit(seq).cast("int").alias("transaction_seq"),
        F.lit("orders").alias("table_name"),
    )


def synthetic_pklog(orders: DataFrame) -> DataFrame:
    """Build the deterministic change log from ``orders``."""
    k = F.col("o_orderkey")
    legs = [
        _leg(orders, 7, "U", k, F.lit(1000) + k % 50, 1),
        _leg(orders, 21, "U", k, F.lit(1000) + k % 50 + 7, 2),
        _leg(orders, 5, "I", k, F.lit(1000) + k % 45, 1),
        _leg(orders, 11, "D", k + 1000000, F.lit(1000) + k % 40, 1),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# DuckDB transliteration of synthetic_pklog — keep in lockstep with the above.
PKLOG_ORACLE_CTE = """
pklog AS (
    SELECT o_orderdate AS change_ts, 'S4' AS schema_name, 'U' AS change_type,
           CAST(o_orderkey AS VARCHAR) AS pk1,
           CAST(NULL AS VARCHAR) AS pk2, CAST(NULL AS VARCHAR) AS pk3, CAST(NULL AS VARCHAR) AS pk4, CAST(NULL AS VARCHAR) AS pk5, CAST(NULL AS VARCHAR) AS pk6,
           CAST(1000 + o_orderkey % 50 AS BIGINT) AS transactionid,
           1 AS transaction_seq, 'orders' AS table_name
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderdate, 'S4', 'U', CAST(o_orderkey AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(1000 + o_orderkey % 50 + 7 AS BIGINT), 2, 'orders'
    FROM orders WHERE o_orderkey % 21 = 0
    UNION ALL
    SELECT o_orderdate, 'S4', 'I', CAST(o_orderkey AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(1000 + o_orderkey % 45 AS BIGINT), 1, 'orders'
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderdate, 'S4', 'D', CAST(o_orderkey + 1000000 AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(1000 + o_orderkey % 40 AS BIGINT), 1, 'orders'
    FROM orders WHERE o_orderkey % 11 = 0
)
"""


def synthetic_transactions(orders: DataFrame) -> DataFrame:
    """Deterministic in-flight transaction table (mirrors HANA
    ``m_transactions`` for the watermark query, S4HanaProducer.java:317-368).
    Every 97th order key simulates an open write transaction whose id is in
    the middle of the synthetic txid range and whose start_time is the
    order date."""
    k = F.col("o_orderkey")
    return orders.filter(k % 97 == 0).select(
        (F.lit(1000) + k % 60).cast("bigint").alias("update_transaction_id"),
        F.col("o_orderdate").alias("start_time"),
    )


TRANSACTIONS_ORACLE_CTE = """
transactions AS (
    SELECT CAST(1000 + o_orderkey % 60 AS BIGINT) AS update_transaction_id,
           o_orderdate AS start_time
    FROM orders WHERE o_orderkey % 97 = 0
)
"""


def synthetic_pklog_customer(customer: DataFrame) -> DataFrame:
    """Deterministic customer-table change legs for multi-table poll tests
    (the reference's single poll loop walks EVERY impacted table,
    S4HanaProducer.java:400-420): every 6th customer updates, every 13th
    emits a delete for a key that no longer exists in the source."""
    k = F.col("c_custkey")
    null_pks = [F.lit(None).cast("string").alias(f"pk{i}") for i in range(2, 7)]

    def leg(mod: int, ctype: str, key_expr, txid_expr):
        return customer.filter(k % mod == 0).select(
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz").alias("change_ts"),
            F.lit("S4").alias("schema_name"),
            F.lit(ctype).alias("change_type"),
            key_expr.cast("string").alias("pk1"),
            *null_pks,
            txid_expr.cast("bigint").alias("transactionid"),
            F.lit(1).cast("int").alias("transaction_seq"),
            F.lit("customer").alias("table_name"),
        )

    return leg(6, "U", k, F.lit(1000) + k % 50).unionByName(
        leg(13, "D", k + 1000000, F.lit(1000) + k % 40)
    )


# keep in lockstep with synthetic_pklog_customer: FULL 12-column shape
# (pk2..pk6 included), so SELECT * / UNION with the main pklog CTE aligns
CUSTOMER_PKLOG_ORACLE_CTE = """
pklog_c AS (
    SELECT TIMESTAMP '1995-01-01 00:00:00' AS change_ts, 'S4' AS schema_name,
           'U' AS change_type, CAST(c_custkey AS VARCHAR) AS pk1,
           CAST(NULL AS VARCHAR) AS pk2, CAST(NULL AS VARCHAR) AS pk3,
           CAST(NULL AS VARCHAR) AS pk4, CAST(NULL AS VARCHAR) AS pk5,
           CAST(NULL AS VARCHAR) AS pk6,
           CAST(1000 + c_custkey % 50 AS BIGINT) AS transactionid,
           1 AS transaction_seq, 'customer' AS table_name
    FROM customer WHERE c_custkey % 6 = 0
    UNION ALL
    SELECT TIMESTAMP '1995-01-01 00:00:00', 'S4', 'D',
           CAST(c_custkey + 1000000 AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(1000 + c_custkey % 40 AS BIGINT), 1, 'customer'
    FROM customer WHERE c_custkey % 13 = 0
)
"""
