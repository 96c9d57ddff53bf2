"""As-of and range (interval) joins — temporal operators the reference's
HANA-pushdown surface never needed but any event/CDC analytics engine does.

Spark has no native ASOF JOIN (Databricks' range-join optimization is
proprietary); the naive formulation — non-equi theta join + latest-per-left
window — degenerates to BroadcastNestedLoop or a per-left-row range scan.
Both operators here are re-expressed as single-shuffle compositions that
survive 100 TB:

* ``asof_join`` — union the two inputs on the key, sort each key partition
  once by time, and carry the most recent right payload forward with a
  running ``last(ignorenulls)`` window. One shuffle on the join keys, one
  sort, O(1) running state per payload column — identical cost profile to a
  sort-merge join, with no row-pair explosion regardless of time density.
* ``range_join_binned`` — the standard bin-bucketing rewrite for
  point-in-interval joins: intervals explode to the fixed-width time bins
  they overlap, points compute their bin, the join becomes an equi-join on
  (keys, bin) followed by an exact containment filter. Bin width trades
  duplication factor against join selectivity; at scale pick it near the
  median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    direction: str = "backward",
    tolerance_interval: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the single right row with
    the greatest ``right_ts`` <= ``left_ts`` (``direction='backward'``;
    ``'forward'`` matches the smallest ``right_ts`` >= ``left_ts``) within
    the same ``on`` key group — DuckDB/pandas ``ASOF LEFT JOIN`` semantics,
    ties on the time column inclusive.

    ``payload`` maps right-column -> output-alias. ``tolerance_interval``
    (SQL interval literal body, e.g. ``'30 minutes'``) nulls the payload
    when the matched row is further than the tolerance from the left row.
    ``right_tiebreak`` names a right column whose LARGEST value wins among
    right rows sharing (key, ts) — pass a unique id for determinism when
    such ties can occur.

    Scale notes: the union keeps both sides' partitioning irrelevant — the
    only shuffle is the window's hash partition on ``on``. A pathologically
    hot key serializes into one task; that is inherent to ordered as-of
    semantics (the running state cannot be split), and AQE cannot help —
    pre-filter right to the needed time range instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    left_cols = left.columns
    tag = "__asof_"
    ts_c, side_c, tb_c = f"{tag}ts", f"{tag}side", f"{tag}tb"
    rts_c = f"{tag}rts"
    payload_tmp = {rc: f"{tag}p_{i}" for i, rc in enumerate(payload)}

    # Right rows carry (key, ts, tiebreak, payload); left columns are null.
    r_sel = (
        [F.col(k) for k in on]
        + [F.col(right_ts).alias(ts_c), F.lit(0).alias(side_c)]
        + [
            (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias(tb_c),
            F.col(right_ts).alias(rts_c),
        ]
        + [F.col(rc).alias(tmp) for rc, tmp in payload_tmp.items()]
        + [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on]
    )
    # Left rows carry their full row; payload slots are null.
    r_schema = {f.name: f.dataType for f in right.schema.fields}
    l_sel = (
        [F.col(k) for k in on]
        + [F.col(left_ts).alias(ts_c), F.lit(1).alias(side_c)]
        + [
            F.lit(None).cast(r_schema[right_tiebreak] if right_tiebreak else "int").alias(tb_c),
            F.lit(None).cast(r_schema[right_ts]).alias(rts_c),
        ]
        + [F.lit(None).cast(r_schema[rc]).alias(tmp) for rc, tmp in payload_tmp.items()]
        + [F.col(c) for c in left_cols if c not in on]
    )
    unioned = right.select(*r_sel).unionByName(left.select(*l_sel))

    # Backward: ascending time, right (side 0) before left at equal ts makes
    # the match inclusive; the running last(ignorenulls) IS "greatest <= ts".
    # Forward is the mirror image on descending time.
    if direction == "backward":
        order = [F.col(ts_c).asc(), F.col(side_c).asc(), F.col(tb_c).asc_nulls_first()]
    else:
        order = [F.col(ts_c).desc(), F.col(side_c).asc(), F.col(tb_c).desc_nulls_first()]
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    matched_rts = F.last(rts_c, ignorenulls=True).over(w)
    within: Column = F.lit(True)
    if tolerance_interval is not None:
        gap = (
            F.col(left_ts) - matched_rts
            if direction == "backward"
            else matched_rts - F.col(left_ts)
        )
        within = gap <= F.expr(f"INTERVAL {tolerance_interval}")

    out = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col(side_c),
        *[
            F.when(within, F.last(tmp, ignorenulls=True).over(w)).alias(alias)
            for (rc, alias), tmp in zip(payload.items(), payload_tmp.values())
        ],
    )
    return out.filter(F.col(side_c) == 1).drop(side_c)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bin_width: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row containing them
    (``start <= ts <= end``, plus equality on ``on``), via bin bucketing.

    Intervals are exploded to each ``bin_width`` bucket they overlap
    (``sequence()`` — no driver loop), points compute one bucket, and the
    containment predicate runs AFTER an ordinary equi-join on
    (keys, bucket). Catalyst sees a hash join, not a theta join — no
    BroadcastNestedLoop, no cartesian blow-up; the worst case is the
    duplication factor ceil(interval_len / bin_width) on the interval side,
    which the caller controls.  ``how='left'`` keeps unmatched points.
    """
    bin_c = "__range_bin"
    # interval length in seconds: Spark can't extract(EPOCH FROM interval),
    # but epoch + interval cast to BIGINT is exactly that (session tz is UTC)
    sec = F.expr(f"CAST(timestamp'1970-01-01 00:00:00' + INTERVAL {bin_width} AS BIGINT)")
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c).cast("timestamp")) / sec)  # noqa: E731

    iv = intervals.withColumn(
        bin_c,
        F.explode(F.sequence(bucket(interval_start), bucket(interval_end))),
    )
    pt = points.withColumn(bin_c, bucket(point_ts))
    joined = pt.join(iv, on=on + [bin_c], how="inner").filter(
        (F.col(point_ts) >= F.col(interval_start))
        & (F.col(point_ts) <= F.col(interval_end))
    )
    if how == "inner":
        return joined.drop(bin_c)
    if how == "left":
        # Left rows that matched nothing: anti-join back in with null interval cols.
        iv_cols = [c for c in intervals.columns if c not in on]
        matched = joined.drop(bin_c)
        # an anti-join on (keys, bin) would miss points whose bin matched but
        # containment failed — anti-join against matched point identity instead
        # (duplicate point rows match or miss as a block, so identity is safe).
        unmatched = points.join(
            matched.select(*points.columns).distinct(), on=points.columns, how="left_anti"
        )
        for c in iv_cols:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(unmatched)
    raise ValueError(f"how must be inner|left, got {how!r}")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-in-time as-of (pandas ``merge_asof direction='nearest'``):
    each left row takes the right row with the SMALLEST absolute time gap,
    looking both backward and forward; exact ties prefer the backward
    match (the pandas convention). Composed as the backward pass feeding
    the forward pass — ``asof_join`` preserves all left columns, so
    chaining costs one extra shuffle on the same keys, not a new
    algorithm — then a row-local gap comparison picks the winner. Adds
    ``__asof_direction`` ('backward'/'forward', NULL when no match)."""
    b_payload = {rc: f"__b_{alias}" for rc, alias in payload.items()}
    b_payload[right_ts] = "__b_ts"
    f_payload = {rc: f"__f_{alias}" for rc, alias in payload.items()}
    f_payload[right_ts] = "__f_ts"

    both = asof_join(
        asof_join(left, right, on, left_ts, right_ts, b_payload,
                  direction="backward", right_tiebreak=right_tiebreak),
        right, on, left_ts, right_ts, f_payload,
        direction="forward", right_tiebreak=right_tiebreak,
    )
    # timestamp subtraction yields comparable intervals (NTZ won't cast to
    # long in Spark 4; numeric ts columns subtract to numerics — both compare)
    gb = F.col(left_ts) - F.col("__b_ts")
    gf = F.col("__f_ts") - F.col(left_ts)
    take_backward = F.col("__b_ts").isNotNull() & (
        F.col("__f_ts").isNull() | (gb <= gf)
    )
    out_cols = [F.col(c) for c in left.columns]
    for rc, alias in payload.items():
        out_cols.append(
            F.when(take_backward, F.col(f"__b_{alias}"))
            .otherwise(F.col(f"__f_{alias}"))
            .alias(alias)
        )
    out_cols.append(
        F.when(take_backward, F.lit("backward"))
        .when(F.col("__f_ts").isNotNull(), F.lit("forward"))
        .alias("__asof_direction")
    )
    return both.select(*out_cols)
