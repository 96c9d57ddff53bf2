"""Relational surface (E1-E4, E23, E27, E28) — thin, explicit wrappers over
DataFrame primitives so the engine's declared operator inventory (SURVEY §2.2)
has one canonical, plan-aware implementation each.

Everything here is a logical-plan construction; Catalyst handles pushdown,
pruning, join selection and AQE re-planning. The wrappers encode only the
decisions Catalyst can NOT make for us: broadcast hints, agg-before-join
shapes, deterministic tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- E2/E3: projection & filter ---------------------------------------------


def project(df: DataFrame, exprs: dict[str, str]) -> DataFrame:
    """Computed-column projection (O30): ``{alias: sql_expr}``."""
    return df.select([F.expr(sql).alias(alias) for alias, sql in exprs.items()])


def filter_(df: DataFrame, predicate: str) -> DataFrame:
    """Arbitrary boolean SQL predicate (``initialloadwhere``, O16)."""
    return df.filter(F.expr(predicate))


# -- E4: equi-join -----------------------------------------------------------


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Conjunctive multi-key equi-join (O12), ``how`` in {inner, left, right,
    full, semi, anti}. ``broadcast_right`` forces a broadcast-hash join when
    the caller KNOWS the right side is small (dimension tables, delta sets) —
    worth stating explicitly rather than trusting size estimates at 100 TB,
    where a mis-estimated sort-merge join shuffles the fact table."""
    how = {"semi": "left_semi", "anti": "left_anti"}.get(how, how)
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


# -- E23: grouped aggregation ------------------------------------------------

_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "first": F.first,
    "collect_set": F.collect_set,
}


def grouped_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    grouping: str = "groupby",
) -> DataFrame:
    """``aggs`` = [(fn, column_expr, alias)], fn from the E23 surface.
    ``grouping`` in {groupby, rollup, cube} (grouping sets).

    Spark executes this as partial (map-side) + final hash aggregation —
    the same two-phase shape for 6k rows or 100 TB; rollup/cube expand via
    Expand + single shuffle, not one pass per grouping set."""
    cols = [_AGG_FNS[fn](F.expr(e)).alias(alias) for fn, e, alias in aggs]
    g = {
        "groupby": df.groupBy,
        "rollup": df.rollup,
        "cube": df.cube,
    }[grouping](*keys)
    return g.agg(*cols)


# -- E27: analytic windows ---------------------------------------------------


def top_k_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column], k: int, rank_alias: str = "rn"
) -> DataFrame:
    """Top-k per group via row_number — ``order_by`` MUST end with a unique
    tiebreak column for deterministic frontiers. Window shuffles once on
    ``keys``; at scale prefer this over a self-join-with-max formulation."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def quantile_disc_per_group(
    df: DataFrame, keys: list[str], value_col: str, q: float, id_col: str
) -> DataFrame:
    """Exact DISCRETE per-group quantile: the actual data value at sorted
    position ``ceil(q * n)`` (1-based). Unlike interpolated ``percentile``,
    the result is always a member of the group — and the positional
    definition is engine-independent, so an oracle can replay it with the
    identical window instead of trusting two engines' quantile conventions
    to agree. ``id_col`` breaks sort ties deterministically (the VALUE at
    the position is unaffected by tie order; the tiebreak just pins the
    physical sort). One shuffle on ``keys``; per-group state is the sort —
    at 100 TB prefer high-cardinality keys or approx_percentile."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    wn = W.partitionBy(*keys)
    ranked = df.select(
        *keys,
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    # epsilon guard before ceil: IEEE doubles make q*n land a hair ABOVE
    # an exact integer for some (q, n) — e.g. 0.07*100 = 7.000000000000001,
    # ceil -> 8, one position off the mathematical spec. The error is
    # RELATIVE (~ULP of q*n), so the guard must be too: a fixed 1e-9 would
    # be swamped once q*n > ~1e7 (billion-row groups at 100 TB). Scaling by
    # (1 - 1e-12) shaves ~few-ULP off any magnitude while staying far below
    # the 1/n gap between adjacent positions (n < 1e12); oracles replay the
    # same expression. round() (not int()) for the label: int(0.29*100)==28.
    return ranked.filter(
        F.col("__rn")
        == F.ceil((F.lit(q) * F.col("__n")) * F.lit(1.0 - 1e-12)).cast("long")
    ).select(*keys, F.col(value_col).alias(f"p{round(q * 100)}"))


def quantile_outlier_filter(
    df: DataFrame, keys: list[str], value_col: str, q: float, id_col: str
) -> DataFrame:
    """Keep rows whose ``value_col`` exceeds their group's discrete
    q-quantile — the outlier-detection half of a length/score-based corpus
    filter. The threshold table is tiny (one row per group) and broadcasts
    into the probe join; the base scan is touched twice but never
    shuffled on the probe side."""
    thr = quantile_disc_per_group(df, keys, value_col, q, id_col)
    pcol = f"p{round(q * 100)}"
    return df.join(F.broadcast(thr), on=keys, how="inner").filter(
        F.col(value_col) > F.col(pcol)
    )


# -- E28: set operators ------------------------------------------------------


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (DISTINCT) — the dual of :func:`intersect`. For multiset
    semantics (EXCEPT ALL) call ``a.exceptAll(b)`` directly; pairing a
    distinct intersect with a multiset except skews any set-algebra
    consumer's counts."""
    return a.subtract(b)


def observed(df: DataFrame, name: str, metrics: dict[str, Column]):
    """Attach single-pass observability metrics to a DataFrame: the named
    aggregate expressions are computed DURING whatever action consumes the
    frame (``Observation`` / ``CollectMetrics``), so row counts, null
    counts and value ranges cost zero extra scans — the monitoring pattern
    for 100 TB loads, where a separate ``df.count()`` doubles the I/O bill
    (and the reference's rows-processed accounting,
    S4HanaProducer.java:551,627, done Spark-natively).

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has run the frame."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(a) for a, c in metrics.items()]), obs


def broadcast_if_small(df: DataFrame, max_bytes: int = 64 << 20) -> DataFrame:
    """Size-aware broadcast hint — the overflow guard for derived-aggregate
    joins (the TPC-H Q15/Q18 HAVING-set shape).

    A hard ``F.broadcast`` on a DERIVED set (a HAVING-filtered aggregate, a
    max-revenue frontier) is right in the normal regime but becomes an
    executor-OOM at some scale factor: the set grows with the data, and a
    broadcast hint overrides Spark's own size protection unconditionally.
    This helper consults Catalyst's optimized-plan size estimate (driver-
    side, no job): under ``max_bytes`` it applies the hint; over it, it
    returns the plan UNhinted — at which point AQE decides at runtime from
    the TRUE size, converting to broadcast when the actual output is small
    and keeping sort-merge when it isn't. Estimate wrong in either
    direction => AQE still lands the right physical join; the hint is only
    ever an optimization, never a correctness or stability risk.
    """
    est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    return F.broadcast(df) if est <= max_bytes else df


# -- E23 extension: mergeable distinct sketches ------------------------------
#
# Exact COUNT DISTINCT is the one aggregate that cannot partial-aggregate:
# every distinct key must reach one reducer, so at 100 TB the shuffle IS the
# query. The mergeable-sketch discipline (Apache DataSketches HLL, shipped
# as Spark's hll_* expressions; Flajolet et al. HyperLogLog, AofA'07)
# replaces it with a three-verb algebra whose state is a few KiB per group:
#
#   sketch:   one scan -> per-group HLL state (binary, order-independent);
#   union:    state x state -> state (commutative register-max merge — the
#             map-side combine COUNT DISTINCT never had, and the reason
#             per-partition / per-day sketches can be PERSISTED and merged
#             at query time without rescanning history);
#   estimate: state -> bigint, deterministic in the input SET.
#
# Estimates from different BUILD PATHS over the same set (one-shot vs
# union-of-partials) may differ by a hair — sparse-mode promotion points
# differ — but each path is bit-deterministic, so gates pin (a) each
# estimate within tolerance of exact and (b) re-merging the same partials
# any way yields the same state estimate (associativity).


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
    out: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch state over ``key_col`` — the persistable unit
    of the distinct-sketch algebra (build once per partition/day/batch,
    union later instead of rescanning)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(out)
    )


def union_distinct_sketches(
    states: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fold any number of per-group sketch-state rows (different
    partitions, days, ingest batches) into one state row per group —
    O(|groups| x sketch KiB), no base-data access. This is the
    append-only incremental-maintenance verb: new batch -> sketch ->
    union with stored state -> store back."""
    return states.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def estimate_distinct(
    states: DataFrame,
    sketch_col: str = "sketch",
    out: str = "n_distinct_est",
) -> DataFrame:
    """Deterministic cardinality estimate of each group's sketch state."""
    return states.withColumn(
        out, F.hll_sketch_estimate(F.col(sketch_col)).cast("bigint")
    ).drop(sketch_col)
