"""Deterministic sampling/splitting invariants (operators/sampling.py):
stability under repartitioning and rerun, split disjointness/exhaustiveness,
key-coherent selection, approximate rate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from s4hanaconnector_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_rerun_and_partitioning_invariant(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in hash_sample(d, ["doc_id"], 0.2).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(d.repartition(13), ["doc_id"], 0.2).select("doc_id").collect()
    }
    assert a == b and a  # same rows regardless of physical layout


def test_sample_rate_within_tolerance(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.count()
    k = hash_sample(d, ["doc_id"], 0.5).count()
    assert abs(k / n - 0.5) < 0.2  # 500-doc fixture: loose binomial bound


def test_sample_seed_changes_selection(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in hash_sample(d, ["doc_id"], 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(d, ["doc_id"], 0.3, seed=2).collect()}
    assert a != b


def test_split_disjoint_exhaustive(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s = hash_split(d, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == d.count()
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_agrees_with_sample_prefix(spark, sf_dir):
    # hash_sample(f) == rows whose split-bucket falls in the first f mass:
    # the same bucket function drives both, so a 0.8 sample IS the train set.
    d = _docs(spark, sf_dir)
    train = {
        r["doc_id"]
        for r in hash_split(d, ["doc_id"], {"train": 0.8, "rest": 0.2})
        .filter(F.col("split") == "train")
        .collect()
    }
    sample = {r["doc_id"] for r in hash_sample(d, ["doc_id"], 0.8).collect()}
    assert train == sample


def test_split_weights_must_sum_to_one(spark, sf_dir):
    d = _docs(spark, sf_dir)
    try:
        hash_split(d, ["doc_id"], {"a": 0.5, "b": 0.2})
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for weights summing to 0.7")


def test_stratified_rates(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s = stratified_hash_sample(d, "lang", ["doc_id"], {"en": 0.0}, default_fraction=1.0)
    langs = {r["lang"] for r in s.select("lang").distinct().collect()}
    assert "en" not in langs and langs  # en fully dropped, others fully kept
    assert s.count() == d.filter(F.col("lang") != "en").count()


def test_key_coherence_multirow_keys(spark):
    # rows sharing the key are kept/dropped as a unit (user-level sampling)
    df = spark.createDataFrame(
        [(u, i) for u in range(200) for i in range(3)], "user_id int, seq int"
    )
    kept = hash_sample(df, ["user_id"], 0.4).groupBy("user_id").agg(F.count("*").alias("n"))
    assert kept.filter(F.col("n") != 3).count() == 0


def test_sampling_adds_no_shuffle(spark, sf_dir):
    d = _docs(spark, sf_dir)
    plan = (
        hash_sample(d, ["doc_id"], 0.3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


class TestHashTopKPerGroup:
    def test_exact_k_and_deterministic(self, spark):
        from s4hanaconnector_spark.operators.sampling import hash_topk_per_group

        df = spark.createDataFrame(
            [(i, "g" if i % 2 == 0 else "h") for i in range(100)], "id long, g string"
        )
        a = hash_topk_per_group(df, ["g"], ["id"], k=7).collect()
        b = hash_topk_per_group(df.repartition(13), ["g"], ["id"], k=7).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-invariant
        per = {}
        for r in a:
            per[r["g"]] = per.get(r["g"], 0) + 1
        assert per == {"g": 7, "h": 7}

    def test_small_group_returns_all(self, spark):
        from s4hanaconnector_spark.operators.sampling import hash_topk_per_group

        df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
        assert hash_topk_per_group(df, ["g"], ["id"], k=10).count() == 2

    def test_seed_changes_selection(self, spark):
        from s4hanaconnector_spark.operators.sampling import hash_topk_per_group

        df = spark.createDataFrame([(i, "g") for i in range(1000)], "id long, g string")
        a = {r["id"] for r in hash_topk_per_group(df, ["g"], ["id"], 20, seed=1).collect()}
        b = {r["id"] for r in hash_topk_per_group(df, ["g"], ["id"], 20, seed=2).collect()}
        assert a != b


def test_null_keys_hash_distinctly(spark):
    """concat_ws drops NULL parts, so without the sentinel ('a',NULL,'b'),
    ('a','b',NULL) and (NULL,'a','b') — and every all-NULL key — would
    share one bucket, correlating rows that must sample independently
    (e.g. unclustered docs in cluster_safe_split all landing in ONE
    split). The sentinel keeps positions distinct."""
    from s4hanaconnector_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None), (None, "a", "b"), (None, None, None)],
        "k1 string, k2 string, k3 string",
    )
    buckets = [
        r["b"] for r in df.select(hash_bucket(["k1", "k2", "k3"]).alias("b")).collect()
    ]
    assert len(set(buckets)) == 4  # all distinct


def test_weighted_sample_survives_huge_max_weight(spark):
    """The cross-multiplied accept test must not wrap BIGINT: with
    max_weight > 2^31 the products exceed 2^63 and a BIGINT comparison
    silently inverts (or throws under ANSI); DECIMAL(38,0) keeps the
    29-digit products exact. A row at full weight must always be kept."""
    from s4hanaconnector_spark.operators.sampling import weighted_hash_sample

    big = 2**40
    df = spark.createDataFrame(
        [(i, big if i % 2 == 0 else 1) for i in range(100)], "id bigint, w bigint"
    )
    kept = weighted_hash_sample(df, ["id"], "w", max_weight=big)
    ids = {r["id"] for r in kept.collect()}
    assert {i for i in range(100) if i % 2 == 0} <= ids  # weight==max always kept


def test_topk_tiebreak_skips_nested_maps(spark):
    """Maps are unorderable at ANY depth: a map inside a struct or array
    must be excluded from the full-row tie-break too, else the window
    orderBy raises AnalysisException at analysis time — a regression for
    schemas whose keys already uniquely identify rows."""
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.operators.sampling import hash_topk_per_group

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4)], "g string, id int"
    ).select(
        "g", "id",
        F.struct(F.create_map(F.lit("x"), F.col("id")).alias("m")).alias("s"),
        F.array(F.create_map(F.lit("y"), F.col("id"))).alias("am"),
    )
    out = hash_topk_per_group(df, ["g"], ["id"], k=2)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 2, "b": 1}
