"""Non-triviality checks for the LLM-pipeline operators: the oracle parity
test would also pass on trivially-empty outputs, so assert the synthesized
duplicates/neighbors are actually FOUND."""

from __future__ import annotations

from pyspark.sql import functions as F

from s4hanaconnector_spark.queries import load_all
from s4hanaconnector_spark.queries.llmops import docs_aug


def test_exact_dedup_finds_synthesized_copies(spark, sf_dir):
    reg = load_all()
    out = reg["dedup_exact"].fn(spark, sf_dir)
    dup_groups = out.filter(F.col("n_dups") > 1)
    assert dup_groups.count() > 0
    # canonical id is always the original (< 100000 offset)
    assert dup_groups.filter(F.col("canonical_id") >= 100000).count() == 0


def test_fingerprint_dedup_catches_case_variants(spark, sf_dir):
    reg = load_all()
    exact = reg["dedup_exact"].fn(spark, sf_dir).filter(F.col("n_dups") > 1).count()
    fp = reg["dedup_fingerprint"].fn(spark, sf_dir).filter(F.col("n_dups") > 1).count()
    assert fp > exact  # the upper() variants only fold under normalization


def test_minhash_recovers_near_duplicates(spark, sf_dir):
    """Every synthesized near-dup pair (original, original+300000) must be a
    MinHash candidate — they share almost all shingles."""
    reg = load_all()
    cands = reg["dedup_minhash_lsh"].fn(spark, sf_dir)
    near_ids = [
        r["doc_id"]
        for r in docs_aug(spark, sf_dir).filter(F.col("doc_id") >= 300000).collect()
    ]
    found = {
        (r["doc_a"], r["doc_b"])
        for r in cands.filter(F.col("doc_b") >= 300000).collect()
    }
    missing = [i for i in near_ids if (i - 300000, i) not in found]
    assert not missing, f"near-dup pairs missed by LSH: {missing[:5]}"


def test_jaccard_scores_near_dups_high(spark, sf_dir):
    reg = load_all()
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in reg["dedup_jaccard"].fn(spark, sf_dir).collect()
    }
    near = {k: v for k, v in pairs.items() if k[1] == k[0] + 300000}
    assert near and min(near.values()) > 0.6


def test_simhash_near_dups_hamming_close(spark, sf_dir):
    reg = load_all()
    sh = {r["doc"]: r["simhash"] for r in reg["dedup_simhash"].fn(spark, sf_dir).collect()}
    ham = [
        sum(a != b for a, b in zip(sh[i], sh[i - 300000]))
        for i in sh
        if i >= 300000 and (i - 300000) in sh
    ]
    assert ham and max(ham) <= 4  # near-dups differ in at most 4 of 16 bits


def test_similarity_topk_shape(spark, sf_dir):
    reg = load_all()
    out = reg["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        assert len(rows) == 10
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rn"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["c_id"] != q for r in rows)


def test_multimodal_stub_raises_without_decoder(spark, sf_dir):
    import pytest

    from s4hanaconnector_spark.operators import multimodal as M
    from s4hanaconnector_spark.queries.registry import t

    payload = M.attach_payload(t(spark, sf_dir, "documents"), "text", "doc_id")
    with pytest.raises(NotImplementedError, match="decode"):
        M.extract_features(payload, decode_stub=False)


class TestMultimodalPlumbing:
    """E22: resize / frame-sample / embed run through real mapInPandas
    plumbing (schema, Arrow batches, fan-out) with stubbed decode."""

    def _payloads(self, spark, sf_dir):
        from s4hanaconnector_spark.operators.multimodal import attach_payload

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        return attach_payload(d, "text", "doc_id", kind="video")

    def test_image_resize_schema_and_meta(self, spark, sf_dir):
        from s4hanaconnector_spark.operators.multimodal import image_resize

        out = image_resize(self._payloads(spark, sf_dir), 224, 224)
        rows = out.collect()
        assert out.schema["media_meta"].dataType.fieldNames() == [
            "kind", "n_bytes", "width", "height",
        ]
        assert all(r["media_meta"]["width"] == 224 for r in rows)
        assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)

    def test_frame_sample_fans_out_deterministically(self, spark, sf_dir):
        from s4hanaconnector_spark.operators.multimodal import frame_sample

        src = self._payloads(spark, sf_dir)
        out1 = frame_sample(src, every_ms=500).collect()
        out2 = frame_sample(src, every_ms=500).collect()
        assert len(out1) >= src.count()  # >= 1 frame per doc
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
        by_doc = {}
        for r in out1:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for frames in by_doc.values():
            assert [f["frame_no"] for f in sorted(frames, key=lambda x: x["frame_no"])] == list(
                range(len(frames))
            )
            assert all(f["ts_ms"] == f["frame_no"] * 500 for f in frames)

    def test_embed_payload_feeds_similarity(self, spark, sf_dir):
        from s4hanaconnector_spark.operators.multimodal import EMBED_DIM, embed_payload
        from s4hanaconnector_spark.operators.similarity import brute_force_topk

        emb = embed_payload(self._payloads(spark, sf_dir))
        rows = emb.collect()
        assert all(len(r["embedding"]) == EMBED_DIM for r in rows)
        norms = [sum(x * x for x in r["embedding"]) for r in rows]
        assert all(abs(n - 1.0) < 1e-3 for n in norms)  # unit length
        # plugs straight into the similarity operator surface
        q = emb.limit(2).withColumnRenamed("doc_id", "q_id")
        c = emb.withColumnRenamed("doc_id", "c_id")
        topk = brute_force_topk(q, c, k=3)
        assert topk.count() == 2 * 3

    def test_no_shuffle_in_featurize(self, spark, sf_dir):
        from s4hanaconnector_spark.operators.multimodal import attach_payload, extract_features

        # no .limit() here: a global limit inserts its own single-partition
        # exchange and would mask what this asserts — that the featurize
        # pipeline itself is scan -> project -> mapInPandas with no shuffle
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            extract_features(attach_payload(d, "text", "doc_id"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
