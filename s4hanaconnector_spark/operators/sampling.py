"""Deterministic hash sampling and dataset splitting — training-data
pipeline operators with reproducibility as the contract.

``df.sample()`` is non-deterministic across retries, partitionings and
engines; at 100 TB a task retry silently changes the sample, and a
train/test split computed twice overlaps. Everything here derives the
keep/split decision purely from ``md5(key, seed)`` — the only hash both
Spark and DuckDB (and most other engines) produce bit-for-bit — so any
engine, any partitioning, any rerun selects the exact same rows. The first
8 hex chars give a uniform 32-bit bucket; rates are exact to 1/2^32.

No shuffle is introduced: sampling and splitting are pure row-local
projections/filters that pipeline into the enclosing scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BUCKET_SPACE",
    "cluster_safe_split",
    "hash_bucket",
    "hash_sample",
    "hash_split",
    "stratified_hash_sample",
]

BUCKET_SPACE = 16**8  # first 8 md5 hex chars -> uniform [0, 2^32)

_SEP = "\x1f"  # unit separator: keeps ("ab","c") and ("a","bc") distinct


def hash_bucket(keys: list[str], seed: int = 42) -> Column:
    """Uniform [0, 2^32) bucket from md5 over the key columns + seed.
    Changing the seed produces an independent sample/split."""
    parts = [F.col(c).cast("string") for c in keys] + [F.lit(str(seed))]
    return F.conv(F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 8), 16, 10).cast("bigint")


def threshold(fraction: float) -> int:
    return int(fraction * BUCKET_SPACE)


def hash_sample(df: DataFrame, keys: list[str], fraction: float, seed: int = 42) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.
    Rows sharing the key columns are kept or dropped together (sampling
    users, not events, when keyed on user_id)."""
    return df.filter(hash_bucket(keys, seed) < F.lit(threshold(fraction)))


def hash_split(
    df: DataFrame, keys: list[str], weights: dict[str, float], seed: int = 42, alias: str = "split"
) -> DataFrame:
    """Label every row with a split name (train/val/test, ...) by cumulative
    hash-bucket ranges. Splits are disjoint, exhaustive, and stable under
    reruns and repartitioning; weights must sum to ~1."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(keys, seed)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        branch = F.when(b < F.lit(threshold(cum)), F.lit(name))
        expr = branch if expr is None else expr.when(b < F.lit(threshold(cum)), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(alias, expr)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    keys: list[str],
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep 100% of rare languages, 1% of
    English) — the standard corpus-rebalancing primitive. ``fractions``
    maps stratum value -> keep rate; unlisted strata use
    ``default_fraction``. Row-local like the rest: no shuffle, no
    per-stratum pass."""
    b = hash_bucket(keys, seed)
    thr: Column = F.lit(threshold(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata_col) == value, F.lit(threshold(frac))).otherwise(thr)
    return df.filter(b < thr)


def cluster_safe_split(
    df: DataFrame,
    cluster_col: str,
    weights: dict[str, float],
    seed: int = 42,
    alias: str = "split",
) -> DataFrame:
    """Leakage-free splitting: the split decision hashes the CLUSTER id
    (near-dup canonical, source domain, user id, …) instead of the row id,
    so every member of a duplicate cluster lands in the SAME split — the
    property that keeps eval sets honest (a near-copy of a training doc in
    the test split silently inflates every metric). Row-local once the
    cluster id exists; upstream the canonical id comes from the dedup
    ladder (fingerprint window or connected components)."""
    return hash_split(df, [cluster_col], weights, seed=seed, alias=alias)


def hash_topk_per_group(
    df: DataFrame, group_cols: list[str], keys: list[str], k: int, seed: int = 42
) -> DataFrame:
    """EXACTLY k rows per group (fewer if the group is smaller), selected
    deterministically: rank rows inside each group by md5(key, seed) and
    keep the k smallest — a reproducible stand-in for per-group reservoir
    sampling. Unlike fraction-based sampling, the output size per group is
    fixed, which is what eval-set carving and per-source quota sampling
    need. Changing the seed draws an independent sample; reruns, retries
    and other engines select the identical rows.

    One shuffle on the group columns (the window); the rank prunes to k
    before anything downstream, so the post-sample data is |groups|·k."""
    from pyspark.sql import Window as W

    h = F.md5(
        F.concat_ws(
            _SEP, *[F.col(c).cast("string") for c in keys], F.lit(str(seed))
        )
    )
    w = W.partitionBy(*group_cols).orderBy(
        h.asc(), *[F.col(c).asc() for c in keys]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_hash_sample(
    df: DataFrame, keys: list[str], weight_col: str, max_weight: int, seed: int = 42
) -> DataFrame:
    """Importance sampling, deterministically: keep each row with
    probability ``min(1, weight/max_weight)`` where the accept decision is
    the row's md5 bucket — upweighting long/high-quality documents in a
    training mixture without randomness. The comparison is cross-multiplied
    (``bucket·max_weight < SPACE·min(weight, max_weight)``) so it stays in
    exact BIGINT arithmetic: no division, no float threshold, bit-identical
    on any engine or rerun. Row-local filter; weights must be integers
    (scale fractional weights up by a constant first)."""
    b = hash_bucket(keys, seed)
    w = F.least(F.col(weight_col), F.lit(max_weight)).cast("bigint")
    return df.filter(b * F.lit(max_weight) < F.lit(BUCKET_SPACE) * w)
