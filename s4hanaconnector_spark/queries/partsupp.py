"""Declared queries: the four TPC-H join topologies that need ``partsupp``
(SURVEY §2.2 E4/E23 — prior-verdict gap item 2).

The fixture set has no partsupp.parquet, so these run over the deterministic
in-query derivation in :mod:`s4hanaconnector_spark.sources.partsupp` — the
same arithmetic inlined as a CTE on the DuckDB side, keeping all four shapes
under the hash gate.

Shapes covered (reference anchors are the generated-SQL join topologies the
connector emits for business-object views, SURVEY §2.2):

  * ``q2_min_cost_supplier``  — correlated-min supplier selection (TPC-H Q2)
  * ``q11_important_stock``   — scalar-subquery-over-agg threshold (Q11)
  * ``q16_supplier_count``    — agg over anti-join (Q16)
  * ``q20_promotion_parts``   — nested semi-join with correlated agg (Q20)

Cross-engine determinism: monetary values live in integer cents
(``ps_supplycost_cents``), quantities in BIGINT — every threshold compare is
exact integer arithmetic on both engines; division by 100.0 happens only in
the final projection. l_quantity sums go through DECIMAL(18,2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from s4hanaconnector_spark.queries.registry import register, t
from s4hanaconnector_spark.sources.partsupp import PARTSUPP_CTE, derive_partsupp

_D = "decimal(18,2)"


@register(
    "q2_min_cost_supplier",
    f"""
WITH {PARTSUPP_CTE}
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(ps.ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND p.p_size BETWEEN 10 AND 30
  AND p.p_type IN ('LARGE', 'STANDARD')
  AND ps.ps_supplycost_cents = (
    SELECT min(ps2.ps_supplycost_cents)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min supplier selection. The correlated
    scalar subquery is re-expressed as a window MIN over ps_partkey on the
    region-filtered candidate set — identical semantics (the part-side
    filter only removes whole partitions), one shuffle instead of a
    re-evaluated subquery. Dimensions (part subset, supplier x nation x
    region) broadcast; partsupp never shuffles until the window."""
    ps = derive_partsupp(spark, sf_dir)
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 30) & F.col("p_type").isin("LARGE", "STANDARD"))
        .select("p_partkey", "p_type")
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # European candidates first (the window must range over exactly the
    # suppliers the correlated subquery sees), part filter second.
    cand = ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
    w = W.partitionBy("ps_partkey")
    cand = cand.withColumn("__min_cost", F.min("ps_supplycost_cents").over(w))
    return (
        cand.filter(F.col("ps_supplycost_cents") == F.col("__min_cost"))
        .join(F.broadcast(p), cand.ps_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "q11_important_stock",
    f"""
WITH {PARTSUPP_CTE},
scoped AS (
  SELECT ps.ps_partkey,
         sum(ps.ps_supplycost_cents * ps.ps_availqty) AS value_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY ps.ps_partkey
)
SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS total_value
FROM scoped
WHERE value_cents * (SELECT count(*) FROM scoped) * 5 > (SELECT sum(value_cents) FROM scoped) * 6
ORDER BY value_cents DESC, ps_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: scalar-subquery-over-agg threshold. Per-part value
    is compared against 1.2x the average part value (exact BIGINT cross-
    multiplication — value * n_parts * 5 > total * 6 — so no float division
    enters the predicate; scale-stable unlike a fixed fraction of total).
    The grand total is a 1-row aggregate broadcast back over the per-part
    aggregate — never a correlated re-scan."""
    ps = derive_partsupp(spark, sf_dir)
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    scoped = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents")
        )
    )
    totals = scoped.agg(
        F.sum("value_cents").alias("__total"), F.count(F.lit(1)).alias("__nparts")
    )
    return (
        scoped.crossJoin(F.broadcast(totals))
        .filter(F.col("value_cents") * F.col("__nparts") * 5 > F.col("__total") * 6)
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy(F.desc((F.col("total_value"))), F.asc("ps_partkey"))
    )


@register(
    "q16_supplier_count",
    f"""
WITH {PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#15'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: aggregate over an anti-join. The excluded-supplier
    set (the reference query's comment-LIKE '%Complaints%' predicate has no
    fixture column; ``s_suppkey % 7 = 0`` is the deterministic surrogate)
    anti-joins partsupp via broadcast, then COUNT(DISTINCT) groups on the
    part attributes. The distinct-aggregate is Spark's two-phase partial
    distinct — no extra self-join."""
    ps = derive_partsupp(spark, sf_dir)
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#15")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 == 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@register(
    "q20_promotion_parts",
    f"""
WITH {PARTSUPP_CTE}
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT ps.ps_suppkey
  FROM partsupp ps
  WHERE ps.ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '%widget')
    AND 2 * ps.ps_availqty > (
      SELECT sum(CAST(l.l_quantity AS DECIMAL(18,2)))
      FROM lineitem l
      WHERE l.l_partkey = ps.ps_partkey
        AND l.l_suppkey = ps.ps_suppkey
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
ORDER BY s.s_name, n.n_name
""",
)
def q20_promotion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join with a correlated aggregate. The
    correlated per-(part,supplier) shipped-quantity sum becomes one grouped
    aggregate over the filtered year of lineitem, inner-joined to partsupp
    on both keys (an empty correlated SUM yields NULL > comparison = false,
    which the inner join reproduces exactly). The widget-part set and the
    final distinct supplier set broadcast; lineitem aggregates map-side
    before its single shuffle. DECIMAL(18,2) keeps the quantity sum
    bit-identical to the oracle; the threshold compares 2*availqty (BIGINT)
    against the decimal sum — exact on both engines."""
    widget = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget"))
        .select("p_partkey")
    )
    shipped = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("__qty"))
    )
    ps = derive_partsupp(spark, sf_dir).join(
        F.broadcast(widget), F.col("ps_partkey") == F.col("p_partkey")
    )
    promo_supp = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
            "inner",
        )
        .filter(F.col("ps_availqty") * 2 > F.col("__qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(promo_supp), s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )
