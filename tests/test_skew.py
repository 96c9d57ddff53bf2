"""Salted-join tests: semantic equivalence with the plain join on a skewed
fixture (one hot key holding most rows), salt determinism, and the salt
never leaking into output columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s4hanaconnector_spark.operators.skew import (
    SALT_COL,
    salt_big_side,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 1 (the hot key), the rest spread over 2..10
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise((F.col("id") % 9) + 2).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "k int, dim string"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_matches_plain_join(spark, skewed, how):
    big, small = skewed
    plain = big.join(small, ["k"], how)
    salted = salted_join(big, small, ["k"], how=how, n=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    # row-multiset equality
    key_cols = [c for c in plain.columns]
    p = plain.groupBy(key_cols).count().collect()
    s = salted.groupBy(key_cols).count().collect()
    assert sorted(map(tuple, p)) == sorted(map(tuple, s))


def test_salt_is_deterministic_and_spreads_hot_key(spark, skewed):
    big, _ = skewed
    a = salt_big_side(big, 8).groupBy("k", SALT_COL).count()
    b = salt_big_side(big, 8).groupBy("k", SALT_COL).count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    hot = a.filter(F.col("k") == 1)
    # the hot key occupies (nearly) all 8 sub-keys, and no sub-key holds
    # more than half the hot rows — the straggler is gone
    n_buckets = hot.count()
    assert n_buckets >= 6
    total = sum(r["count"] for r in hot.collect())
    assert max(r["count"] for r in hot.collect()) < total * 0.5


def test_salted_join_rejects_outer(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner/left/semi/anti"):
        salted_join(big, small, ["k"], how="full")
