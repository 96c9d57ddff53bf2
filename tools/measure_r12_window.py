#!/usr/bin/env python
"""One-off r12 measurement: old (join-back / no-checkpoint) vs new (window /
checkpointed) shapes of ngram_coverage, substring_duplication and
minhash_lsh_candidates, same session, noop sink, 3 samples each at
$SPARK_GRAFT_SF_DIR (default sf0.1).

Usage: python tools/measure_r12_window.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.operators.dedup import (
        band_signatures,
        minhash_lsh_candidates,
        ngram_coverage,
        shingle_table,
        substring_duplication,
        winnowed_fingerprints,
    )
    from s4hanaconnector_spark.queries.llmops import docs_aug
    from s4hanaconnector_spark.session import get_spark

    spark = get_spark("r12-window-measure")
    docs = docs_aug(spark, sf_dir)

    def join_back(rows_df, key, names, min_df=2):
        counts = rows_df.groupBy(key).agg(F.count(F.lit(1)).alias("df_count"))
        return (
            rows_df.join(counts, on=key)
            .groupBy("doc")
            .agg(
                F.count(F.lit(1)).alias(names[0]),
                F.sum(F.when(F.col("df_count") >= min_df, 1).otherwise(0))
                .cast("bigint")
                .alias(names[1]),
            )
            .withColumn(
                "coverage", F.col(names[1]).cast("double") / F.col(names[0])
            )
        )

    def old_minhash(d):
        sigs = band_signatures(d, "text", "doc_id", 3)
        sigs = (
            sigs.withColumn(
                "__bucket_n",
                F.count(F.lit(1)).over(W.partitionBy("band", "sig")),
            )
            .filter(F.col("__bucket_n") <= 64)
            .drop("__bucket_n")
        )
        a, b = sigs.alias("a"), sigs.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig")),
            )
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )

    cases = {
        "ngram_old": lambda: join_back(
            shingle_table(docs, "text", "doc_id"),
            "shingle",
            ("total_shingles", "dup_shingles"),
        ),
        "ngram_new": lambda: ngram_coverage(docs, "text", "doc_id"),
        "winnow_old": lambda: join_back(
            winnowed_fingerprints(docs, "text", "doc_id"),
            "fp",
            ("total_fps", "dup_fps"),
        ),
        "winnow_new": lambda: substring_duplication(docs, "text", "doc_id"),
        "minhash_old": lambda: old_minhash(docs),
        "minhash_new": lambda: minhash_lsh_candidates(docs, "text", "doc_id"),
    }
    # warm once
    for name, fn in cases.items():
        fn().write.format("noop").mode("overwrite").save()
    out = {}
    for name, fn in cases.items():
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"r12-measure {name}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"min": min(runs), "samples": runs}
        print(name, out[name], flush=True)
    print({"sf_dir": sf_dir, "loadavg": [round(x, 1) for x in os.getloadavg()]})
    spark.stop()


if __name__ == "__main__":
    main()
