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
    "hash_topk_per_group",
    "stratified_hash_sample",
    "weighted_hash_sample",
]

BUCKET_SPACE = 16**8  # first 8 md5 hex chars -> uniform [0, 2^32)

_SEP = "\x1f"  # unit separator: keeps ("ab","c") and ("a","bc") distinct
_NULL = "\x00"  # NULL sentinel: concat_ws silently DROPS null parts, which
# would hash ("a", NULL, "b"), ("a", "b", NULL) and (NULL, "a", "b") — and
# every all-NULL key — onto the same bucket, correlating rows that must
# sample independently; coalescing to a sentinel keeps positions distinct
# while leaving non-NULL keys' hashes (and their DuckDB oracles) unchanged


def _key_parts(keys: list[str], seed: int) -> list[Column]:
    return [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in keys] + [
        F.lit(str(seed))
    ]


def hash_bucket(keys: list[str], seed: int = 42) -> Column:
    """Uniform [0, 2^32) bucket from md5 over the key columns + seed.
    Changing the seed produces an independent sample/split. NULL key values
    hash via a sentinel, so distinct keys stay distinct (see _NULL)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *_key_parts(keys, seed))), 1, 8), 16, 10
    ).cast("bigint")


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
    before anything downstream, so the post-sample data is |groups|·k.

    Determinism holds even when ``keys`` does not uniquely identify rows:
    ties on (hash, keys) break on every remaining orderable column, so the
    surviving row at the k-boundary is the same on any rerun, partitioning
    or engine (fully-identical rows are interchangeable by definition;
    unorderable map columns are excluded from the tie-break)."""
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    def _has_map(dt) -> bool:
        # maps are unorderable at ANY nesting depth — a map inside a struct
        # or array poisons the whole column for orderBy (AnalysisException),
        # so the exclusion must recurse, not just check the top level
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    h = F.md5(F.concat_ws(_SEP, *_key_parts(keys, seed)))
    named = set(keys) | set(group_cols)
    tiebreak = [
        F.col(f.name).asc()
        for f in df.schema.fields
        if f.name not in named and not _has_map(f.dataType)
    ]
    w = W.partitionBy(*group_cols).orderBy(
        h.asc(), *[F.col(c).asc() for c in keys], *tiebreak
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
    exact integer arithmetic: no division, no float threshold, bit-identical
    on any engine or rerun. Row-local filter; weights must be integers
    (scale fractional weights up by a constant first). The products are
    computed in DECIMAL(38,0): bucket is 10 digits and the clamped weight
    at most 19, so the 29-digit products are exact — plain BIGINT would
    silently wrap (or throw under ANSI) once ``max_weight`` exceeds 2^31."""
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive, got {max_weight}")
    d38 = "decimal(38,0)"
    b = hash_bucket(keys, seed).cast(d38)
    w = F.least(F.col(weight_col), F.lit(max_weight)).cast(d38)
    return df.filter(
        b * F.lit(max_weight).cast(d38) < F.lit(BUCKET_SPACE).cast(d38) * w
    )
