"""Skew mitigation — salted joins for hot keys.

When one join key holds a disproportionate share of rows (the classic: one
mega-customer, one default date), hash-partitioning sends the whole hot key
to ONE task and the stage runs at straggler speed. AQE's skew-join splitting
(on in session.py) handles sort-merge joins it can re-plan; salting is the
explicit fallback for the shapes AQE cannot rescue — stream-static joins,
joins feeding a same-key aggregation, or engines/configs without AQE.

Mechanics: the big side gets a deterministic salt in [0, n) derived from a
row hash, splitting each hot key into n sub-keys; the small side is
replicated n times (one copy per salt) so every sub-key still finds its
match. Join on (keys + salt); the salt never reaches the output. Cost:
small side x n — use only when the small side is genuinely small and
broadcast is unavailable (e.g., it exceeds the broadcast threshold but is
still << the big side).

For aggregations, note that plain ``groupBy().agg(max/sum/count)`` does NOT
need salting: partial (map-side) aggregation already collapses a hot key to
one row per input partition before the shuffle. Salting aggregation only
pays for ALL-ROWS aggregates like collect_list where partials stay large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n): a hash over ``cols`` (default: all
    columns) — rows of one hot key spread across n sub-keys, and re-running
    the job salts identically (no rand(), so retries/speculative tasks
    agree)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(n)).cast("int"))


def replicate_small_side(df: DataFrame, n: int) -> DataFrame:
    """Cross the small side with salts 0..n-1 (explode of a literal array —
    no shuffle, just a n-fold flatMap)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side. Semantically
    identical to ``big.join(small, on, how)`` for how in {inner, left,
    semi, anti}: every (key, salt) pair on the big side meets exactly one
    replica of the small side's key."""
    if how not in {"inner", "left", "semi", "anti"}:
        raise ValueError(f"salted_join supports inner/left/semi/anti, got {how!r}")
    b = salt_big_side(big, n)
    s = replicate_small_side(small, n)
    out = b.join(s, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)
