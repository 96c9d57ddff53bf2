"""Property-based tests (hypothesis) for the CDC delta core — random change
feeds and snapshots, invariants from the reference semantics
(S4HanaTableMapping.java:444-471):

  P1  one output row per distinct in-range changed PK, exactly
  P2  _transactionid == max txid of that PK within (lo, hi]
  P3  _change_type is 'D' iff the PK is absent from the source; 'A' otherwise
  P4  PK columns are never NULL (they ride the log side)
  P5  'A' rows carry current source values; 'D' rows carry NULL non-PK cols
  P6  both join strategies (outer, broadcast) emit identical row sets

Small bounded examples (deadline disabled — Spark latency, not logic, is the
slow part), many shapes: empty feeds, all-deletes, PKs changed many times,
out-of-range txids.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping
from s4hanaconnector_spark.operators import cdc as C

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)

MAPPING = TableMapping(
    name="t",
    mastertable="t",
    columnmappings=[
        ColumnMapping("id", '"L1"."id"'),
        ColumnMapping("val", '"L1"."val"'),
    ],
    pkcolumns=["id"],
)

LO, HI = 10, 20

# a change event: (pk 0..5, txid 5..25, change_type)
events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=5, max_value=25),
        st.sampled_from(["I", "U", "D"]),
    ),
    max_size=12,
)
# snapshot: subset of pks present in the source
snapshots = st.sets(st.integers(min_value=0, max_value=5), max_size=6)


def _run(spark, feed, present):
    log = spark.createDataFrame(
        [
            Row(
                change_ts=TS, schema_name="S4", change_type=ct, pk1=str(pk),
                pk2=None, pk3=None, pk4=None, pk5=None, pk6=None,
                transactionid=tx, transaction_seq=1, table_name="t",
            )
            for pk, tx, ct in feed
        ],
        schema="change_ts timestamp, schema_name string, change_type string, "
        "pk1 string, pk2 string, pk3 string, pk4 string, pk5 string, pk6 string, "
        "transactionid bigint, transaction_seq int, table_name string",
    )
    src = spark.createDataFrame(
        [Row(id=i, val=f"v{i}") for i in sorted(present)], "id bigint, val string"
    )
    out = {}
    for strategy in ["outer", "broadcast"]:
        rows = C.cdc_delta(src, log, MAPPING, LO, HI, strategy=strategy).collect()
        out[strategy] = {(r["id"], r["_transactionid"], r["_change_type"], r["val"]) for r in rows}
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=events, present=snapshots)
def test_cdc_delta_invariants(spark, feed, present):
    result = _run(spark, feed, present)

    # P6: strategy equivalence
    assert result["outer"] == result["broadcast"]

    rows = result["outer"]
    in_range = {}
    for pk, tx, _ in feed:
        if LO < tx <= HI:
            in_range[pk] = max(in_range.get(pk, 0), tx)

    # P1: exactly one row per distinct in-range changed PK
    assert {r[0] for r in rows} == set(in_range)
    assert len(rows) == len(in_range)

    for pk, tx, ct, val in rows:
        # P4: PK never NULL
        assert pk is not None
        # P2: latest txid in range wins
        assert tx == in_range[pk]
        if pk in present:
            # P3/P5: present => 'A' with current value
            assert ct == "A"
            assert val == f"v{pk}"
        else:
            # P3/P5: vanished => 'D' with NULL non-PK columns
            assert ct == "D"
            assert val is None


# ---------------------------------------------------------------------------
# E13 apply_changes invariants
# ---------------------------------------------------------------------------

batches = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # pk
        st.integers(min_value=1, max_value=30),  # txid
        st.sampled_from(["A", "D"]),             # change type
        st.integers(min_value=0, max_value=9),   # payload variant
    ),
    max_size=10,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=batches, present=snapshots)
def test_apply_changes_invariants(spark, feed, present):
    """Applying a CDC batch to a snapshot must equal the dict-semantics
    model: per PK the max-txid change wins; 'D' removes, 'A' upserts;
    untouched snapshot rows survive unchanged."""
    # drop (pk, txid) ties first: two conflicting changes with the same
    # txid have no defined winner in either the model or the engine
    txids_per_pk: dict[int, list] = {}
    for pk, tx, ct, v in feed:
        txids_per_pk.setdefault(pk, []).append(tx)
    feed = [e for e in feed if txids_per_pk[e[0]].count(e[1]) == 1]

    # model (driver-side reference semantics): max-txid change per PK wins
    latest: dict[int, tuple] = {}
    for pk, tx, ct, v in feed:
        if pk not in latest or tx > latest[pk][0]:
            latest[pk] = (tx, ct, v)

    expected = {pk: f"s{pk}" for pk in present}
    for pk, (tx, ct, v) in latest.items():
        if ct == "D":
            expected.pop(pk, None)
        else:
            expected[pk] = f"b{v}"

    snapshot = spark.createDataFrame(
        [Row(id=pk, val=f"s{pk}") for pk in sorted(present)], "id bigint, val string"
    )
    batch = spark.createDataFrame(
        [
            Row(_change_type=ct, _transactionid=tx, id=pk, val=f"b{v}")
            for pk, tx, ct, v in feed
        ],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    out = C.apply_changes(snapshot, batch, ["id"]).collect()
    got = {r["id"]: r["val"] for r in out}
    assert got == expected
    assert len(out) == len(expected)  # no duplicate PKs materialized


# ---------------------------------------------------------------------------
# Chunking + sampling invariants
# ---------------------------------------------------------------------------

texts = st.lists(
    st.text(alphabet="abc XY1 ", min_size=0, max_size=120), min_size=1, max_size=12
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts, chunk_size=st.integers(min_value=1, max_value=7))
def test_chunking_partitions_the_token_stream(spark, docs, chunk_size):
    """For ANY text: chunks reassemble to the exact token stream, every
    chunk except possibly the last is full, and empty docs vanish."""
    from s4hanaconnector_spark.operators.text import chunk_by_tokens

    df = spark.createDataFrame(list(enumerate(docs)), "id long, text string")
    out = chunk_by_tokens(df, "text", "id", chunk_size=chunk_size, keep_text=True).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for i, text in enumerate(docs):
        toks = [t for t in text.split() if t]
        if not toks:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # contiguous ids, full chunks except the tail, exact reassembly
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert all(c["n_chunk_tokens"] == chunk_size for c in chunks[:-1])
        assert 1 <= chunks[-1]["n_chunk_tokens"] <= chunk_size
        assert " ".join(c["chunk_text"] for c in chunks) == " ".join(toks)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_hash_split_disjoint_exhaustive_stable(spark, ids, seed):
    """For ANY id set and seed: every row lands in exactly one split, and
    re-splitting (any partitioning) reproduces the identical assignment."""
    from s4hanaconnector_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    w = {"train": 0.7, "val": 0.2, "test": 0.1}
    a = {r["id"]: r["split"] for r in hash_split(df, ["id"], w, seed=seed).collect()}
    b = {
        r["id"]: r["split"]
        for r in hash_split(df.repartition(7), ["id"], w, seed=seed).collect()
    }
    assert a == b
    assert set(a) == set(ids)
    assert set(a.values()) <= {"train", "val", "test"}


# ---------------------------------------------------------------------------
# E80/E82 — view maintenance and snapshot-diff invariants
# ---------------------------------------------------------------------------

_diff_tables = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),            # pk
        st.integers(min_value=0, max_value=3),            # group variant
        st.one_of(st.none(), st.integers(0, 99)),         # value (None = NULL)
    ),
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_diff_tables, new=_diff_tables)
def test_snapshot_diff_and_maintenance_agree_with_recompute(spark, old, new):
    """Two random table versions: (1) snapshot_diff must round-trip through
    apply_changes back to the new version; (2) maintain_grouped_agg under
    that same diff must equal the aggregate recomputed from scratch on the
    new version — the algebra holds for ANY old/new pair, including NULL
    measures, group moves, pure inserts and pure deletes."""
    schema = "id bigint, grp string, v double"
    old_df = spark.createDataFrame(
        [Row(id=pk, grp=f"g{g}", v=float(v) if v is not None else None) for pk, g, v in old],
        schema,
    )
    new_df = spark.createDataFrame(
        [Row(id=pk, grp=f"g{g}", v=float(v) if v is not None else None) for pk, g, v in new],
        schema,
    )
    diff = C.snapshot_diff(old_df, new_df, ["id"])

    # (1) round trip
    applied = C.apply_changes(
        old_df, diff.withColumn("_transactionid", F.lit(1)), ["id"]
    )
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new_df.collect()))

    # (2) incremental aggregate == recompute (counts include NULL-measure
    # rows; sums skip them, exactly like the recompute)
    maintained = {
        r["grp"]: (r["n_rows"], r["measure_sum"])
        for r in C.maintain_grouped_agg(old_df, diff, ["id"], ["grp"], "v").collect()
    }
    recomputed = {
        r["grp"]: (r["n_rows"], r["measure_sum"])
        for r in new_df.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("measure_sum"),
        )
        .collect()
    }
    assert maintained == recomputed


# ---------------------------------------------------------------------------
# incremental dedup: composition law
# ---------------------------------------------------------------------------

# docs: (id, text) with texts drawn from a tiny alphabet so collisions are
# common; ids unique by construction
_texts = st.sampled_from(["alpha beta", "ALPHA beta", "gamma", "delta eps", "zzz"])
_doc_lists = st.lists(_texts, min_size=0, max_size=10)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_texts=_doc_lists, b1=_doc_lists, b2=_doc_lists)
def test_incremental_dedup_composes_across_batches(spark, corpus_texts, b1, b2):
    """Composition law: draining the feed batch-by-batch with accumulated
    fingerprint state equals the one-shot classification of the whole
    feed — for ANY corpus/batch contents, including fingerprint collisions
    (case variants), within-batch twins and cross-batch twins."""
    from s4hanaconnector_spark.operators.dedup import incremental_dedup
    from s4hanaconnector_spark.operators.text import fingerprint

    def df_of(texts, base):
        rows = [(base + i, t) for i, t in enumerate(texts)]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    corpus = df_of(corpus_texts, 0)
    batch1 = df_of(b1, 100)
    batch2 = df_of(b2, 200)

    # one-shot over the concatenated feed
    feed = batch1.unionAll(batch2)
    oneshot = {
        r["batch_id"]: (r["status"], r["canonical_id"])
        for r in incremental_dedup(corpus, feed, "text", "doc_id").collect()
    }

    # batch-by-batch with state
    out1 = incremental_dedup(corpus, batch1, "text", "doc_id")
    seen1 = (
        out1.filter(F.col("status") == "new")
        .join(
            batch1.select(
                F.col("doc_id").alias("batch_id"), fingerprint(F.col("text")).alias("fp")
            ),
            "batch_id",
        )
        .select("fp", F.col("batch_id").alias("canonical_id"))
    )
    out2 = incremental_dedup(corpus, batch2, "text", "doc_id", seen=seen1)
    streamed = {
        r["batch_id"]: (r["status"], r["canonical_id"])
        for r in out1.unionByName(out2).collect()
    }
    assert streamed == oneshot


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=events, cut=st.integers(min_value=5, max_value=25))
def test_scd2_composes_across_txid_split(spark, feed, cut):
    """The invariant streaming_scd2_history relies on, as a law over RANDOM
    feeds and cut points: close-open-versions-then-chain over the two
    txid-ordered halves equals the one-shot scd2_versions window over the
    whole feed. Ties (same pk, same txid, different types) and keys whose
    only later change is a delete are the interesting shapes hypothesis
    finds."""
    from s4hanaconnector_spark.operators.cdc import scd2_versions

    rows = [
        Row(o_orderkey=pk, change_type=ct, _transactionid=tx) for pk, tx, ct in feed
    ]
    # scd2 chains assume one change per (pk, txid): keep the max type per
    # pair so the precondition holds (matches latest_per_pk's dedup)
    schema = "o_orderkey bigint, change_type string, _transactionid bigint"
    cv = (
        spark.createDataFrame(rows, schema)
        .groupBy("o_orderkey", "_transactionid")
        .agg(F.max("change_type").alias("change_type"))
        if rows
        else spark.createDataFrame([], schema)
    )
    cols = ["o_orderkey", "change_type", "_transactionid", "__valid_from", "__valid_to", "__is_current"]

    oneshot = {tuple(r) for r in scd2_versions(cv, ["o_orderkey"]).select(cols).collect()}

    lo_half = cv.filter(F.col("_transactionid") <= cut)
    hi_half = cv.filter(F.col("_transactionid") > cut)
    state = scd2_versions(lo_half, ["o_orderkey"]).select(cols)
    firsts = hi_half.groupBy("o_orderkey").agg(
        F.min("_transactionid").alias("__next_txid")
    )
    closed = state.join(firsts, "o_orderkey", "left").select(
        "o_orderkey", "change_type", "_transactionid", "__valid_from",
        F.when(
            F.col("__is_current") & F.col("__next_txid").isNotNull(),
            F.col("__next_txid"),
        ).otherwise(F.col("__valid_to")).alias("__valid_to"),
        (F.col("__is_current") & F.col("__next_txid").isNull()).alias("__is_current"),
    )
    chained = scd2_versions(hi_half, ["o_orderkey"]).select(cols)
    composed = {tuple(r) for r in closed.unionByName(chained).collect()}
    assert composed == oneshot


# ---------------------------------------------------------------------------
# nested-BO maintenance: incremental == full re-nest, for random batches
# ---------------------------------------------------------------------------

_m_updates = st.sets(st.integers(min_value=0, max_value=5), max_size=3)
_m_deletes = st.sets(st.integers(min_value=0, max_value=5), max_size=2)
_d_changes = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # master key
        st.integers(min_value=1, max_value=3),   # line number
        st.sampled_from(["U", "D"]),
    ),
    max_size=5,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(mu=_m_updates, md=_m_deletes, dc=_d_changes)
def test_nested_maintenance_equals_full_renest(spark, mu, md, dc):
    """For ANY master/detail change batches (updates, deletes, overlapping
    keys, details of deleted masters, empty batches), incrementally
    maintaining the nested snapshot equals nesting the merged tables from
    scratch — the delta-sized path may prune aggressively but must never
    prune wrong."""
    from s4hanaconnector_spark.operators.cdc import apply_changes
    from s4hanaconnector_spark.operators.nesting import maintain_nested_docs, nest

    mu = mu - md  # a key is updated OR deleted in one batch, not both
    dc = {
        (k, ln) : ct for (k, ln, ct) in sorted(dc)
    }  # one change per detail PK (last wins deterministically)

    master = spark.createDataFrame(
        [(i, f"m{i}") for i in range(6)], "mid bigint, mval string"
    )
    detail = spark.createDataFrame(
        [(i, ln, float(i * 10 + ln)) for i in range(6) for ln in (1, 2)],
        "dmid bigint, lineno int, qty double",
    )
    jc = [{"left": "mid", "right": "dmid"}]
    dcols = ["lineno", "qty"]

    mb_rows = [("U", 1, k, f"m{k}x") for k in sorted(mu)] + [
        ("D", 1, k, None) for k in sorted(md)
    ]
    db_rows = [
        ("U", 2, k, ln, 999.0) if ct == "U" else ("D", 2, k, ln, None)
        for (k, ln), ct in dc.items()
    ]
    mb = spark.createDataFrame(
        mb_rows, "_change_type string, _transactionid bigint, mid bigint, mval string"
    )
    db = spark.createDataFrame(
        db_rows,
        "_change_type string, _transactionid bigint, dmid bigint, lineno int, qty double",
    )

    merged_m = apply_changes(master, mb, ["mid"])
    merged_d = apply_changes(detail, db, ["dmid", "lineno"])
    snap0 = nest(master, detail, joincondition=jc, schemafield="items",
                 detail_cols=dcols, sort_detail_by=["lineno"])
    maintained = maintain_nested_docs(
        snap0, merged_m, merged_d, mb, db,
        master_pk=["mid"], joincondition=jc, schemafield="items",
        detail_cols=dcols, sort_detail_by=["lineno"],
    )
    full = nest(merged_m, merged_d, joincondition=jc, schemafield="items",
                detail_cols=dcols, sort_detail_by=["lineno"])

    def canon(df):
        return sorted(
            (r["mid"], r["mval"], tuple((x["lineno"], x["qty"]) for x in r["items"]))
            for r in df.collect()
        )

    assert canon(maintained) == canon(full)


_seed_sets = st.sets(st.integers(min_value=0, max_value=9), max_size=4)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=_seed_sets, b=_seed_sets)
def test_forget_cascade_composes_across_polls(spark, a, b):
    """The law streaming_forget_cascade relies on: erasing seed set A, then
    erasing B against the already-erased state, equals erasing A ∪ B in one
    shot — including overlapping seeds, seeds with no orders, and empty
    polls. Deletion is idempotent and monotone, so cascade expansion
    against partially-erased state can never resurrect or miss a row."""
    from s4hanaconnector_spark.operators.cdc import apply_changes

    cust = spark.createDataFrame(
        [(i, f"c{i}") for i in range(10)], "c_custkey bigint, c_name string"
    )
    orders = spark.createDataFrame(
        [(100 + i, i % 10) for i in range(30)], "o_orderkey bigint, o_custkey bigint"
    )

    def erase(c, o, seeds):
        if not seeds:
            return c, o
        keys = spark.createDataFrame([(k,) for k in sorted(seeds)], "c_custkey bigint")
        o_del = o.join(F.broadcast(keys), o.o_custkey == keys.c_custkey, "leftsemi")
        c_batch = keys.select(
            F.lit("D").alias("_change_type"), F.lit(1).alias("_transactionid"),
            "c_custkey", F.lit(None).cast("string").alias("c_name"),
        )
        o_batch = o_del.select(
            F.lit("D").alias("_change_type"), F.lit(1).alias("_transactionid"),
            "o_orderkey", F.lit(None).cast("bigint").alias("o_custkey"),
        )
        return (
            apply_changes(c, c_batch, ["c_custkey"]),
            apply_changes(o, o_batch, ["o_orderkey"]),
        )

    c1, o1 = erase(*erase(cust, orders, a), b)
    c2, o2 = erase(cust, orders, a | b)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    assert sorted(map(tuple, o1.collect())) == sorted(map(tuple, o2.collect()))


# -- classify_malformed: severity-ordered dead-letter classification ---------

# a raw log row: pk may be NULL/garbage/number-string, change_type may be
# NULL/valid/unknown, txid may be NULL
_raw_rows = st.lists(
    st.tuples(
        st.sampled_from([None, "7", "42", "garbage", ""]),
        st.sampled_from([None, "I", "U", "D", "A", "B", "X", "u"]),
        st.sampled_from([None, 1, 1000]),
    ),
    max_size=10,
)


def _model_reason(pk, ct, tx):
    """Reference model of the severity order (missing PK > uncastable PK >
    bad change type > missing txid); None == valid row."""
    if pk is None:
        return "missing_pk"
    try:
        int(pk)
    except ValueError:
        return "pk_uncastable"
    if ct is None or ct not in ("I", "U", "D", "A", "B"):
        return "bad_change_type"
    if tx is None:
        return "missing_txid"
    return None


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_raw_rows)
def test_classify_malformed_matches_severity_model(spark, rows):
    """Every (pk, change_type, txid) combination — including the NULL
    change_type that a bare ~isin() silently passes (r4 ADVICE) — classifies
    exactly like the severity-ordered reference model, and a row is valid
    (reason NULL) iff the model says so."""
    log = spark.createDataFrame(
        [
            Row(
                change_ts=TS, schema_name="S4", change_type=ct, pk1=pk,
                pk2=None, pk3=None, pk4=None, pk5=None, pk6=None,
                transactionid=tx, transaction_seq=1, table_name="t",
            )
            for pk, ct, tx in rows
        ],
        schema="change_ts timestamp, schema_name string, change_type string, "
        "pk1 string, pk2 string, pk3 string, pk4 string, pk5 string, pk6 string, "
        "transactionid bigint, transaction_seq int, table_name string",
    )
    got = [
        (r["pk1"], r["change_type"], r["transactionid"], r["_quarantine_reason"])
        for r in C.classify_malformed(log).collect()
    ]
    for pk, ct, tx, reason in got:
        assert reason == _model_reason(pk, ct, tx), (pk, ct, tx, reason)


# ---------------------------------------------------------------------------
# 2-LEVEL nested-BO maintenance: incremental == full re-nest, random batches
# ---------------------------------------------------------------------------

_c_upd = st.sets(st.integers(min_value=0, max_value=3), max_size=2)
_c_del = st.sets(st.integers(min_value=0, max_value=3), max_size=1)
_o_upd = st.sets(st.integers(min_value=0, max_value=7), max_size=3)
_o_move = st.sets(st.integers(min_value=0, max_value=7), max_size=2)
_o_del = st.sets(st.integers(min_value=0, max_value=7), max_size=2)
_i_chg = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=2),
        st.sampled_from(["U", "D"]),
    ),
    max_size=4,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cu=_c_upd, cd=_c_del, ou=_o_upd, om=_o_move, od=_o_del, ic=_i_chg)
def test_2level_nested_maintenance_equals_full_renest(spark, cu, cd, ou, om, od, ic):
    """customer -> orders[] -> items[]: for ANY change batches on all three
    levels — including ORDER REASSIGNMENT to another customer, deletes at
    every level, and item changes under deleted parents — composing the two
    maintenance levels (inner orders+items, then outer with old+new custkey
    fan-out) equals re-nesting the merged flat tables from scratch. This is
    the batch kernel of the streaming_nested_bo_2level query."""
    from s4hanaconnector_spark.operators.cdc import apply_changes
    from s4hanaconnector_spark.operators.nesting import maintain_nested_docs, nest

    cu = cu - cd
    ou = ou - od
    om = om - od - ou  # one change class per order
    ic = {(k, ln): ct for (k, ln, ct) in sorted(ic)}

    cust = spark.createDataFrame(
        [(i, f"c{i}") for i in range(4)], "cid bigint, cval string"
    )
    orders = spark.createDataFrame(
        [(o, o % 4, float(100 + o)) for o in range(8)],
        "oid bigint, cid bigint, price double",
    )
    items = spark.createDataFrame(
        [(o, ln, float(o * 10 + ln)) for o in range(8) for ln in (1, 2)],
        "ioid bigint, lineno int, qty double",
    )
    jc1 = [{"left": "oid", "right": "ioid"}]
    d1 = ["lineno", "qty"]
    jc2 = [{"left": "cid", "right": "cid"}]
    d2 = ["oid", "price", "items"]

    cb = spark.createDataFrame(
        [("U", 1, k, f"c{k}x") for k in sorted(cu)]
        + [("D", 1, k, None) for k in sorted(cd)],
        "_change_type string, _transactionid bigint, cid bigint, cval string",
    )
    ob = spark.createDataFrame(
        [("U", 2, o, o % 4, 999.0) for o in sorted(ou)]
        + [("U", 2, o, (o % 4 + 1) % 4, float(100 + o)) for o in sorted(om)]
        + [("D", 2, o, None, None) for o in sorted(od)],
        "_change_type string, _transactionid bigint, oid bigint, cid bigint, price double",
    )
    ib = spark.createDataFrame(
        [
            ("U", 3, k, ln, 777.0) if ct == "U" else ("D", 3, k, ln, None)
            for (k, ln), ct in ic.items()
        ],
        "_change_type string, _transactionid bigint, ioid bigint, lineno int, qty double",
    )

    merged_c = apply_changes(cust, cb, ["cid"])
    merged_o = apply_changes(orders, ob, ["oid"])
    merged_i = apply_changes(items, ib, ["ioid", "lineno"])

    def nest1(m, d):
        return nest(m, d, joincondition=jc1, schemafield="items",
                    detail_cols=d1, sort_detail_by=["lineno"])

    def nest2(c, s1):
        return nest(c, s1, joincondition=jc2, schemafield="orders",
                    detail_cols=d2, sort_detail_by=["oid"])

    s1_0 = nest1(orders, items)
    s2_0 = nest2(cust, s1_0)
    s1 = maintain_nested_docs(
        s1_0, merged_o, merged_i, ob, ib,
        master_pk=["oid"], joincondition=jc1, schemafield="items",
        detail_cols=d1, sort_detail_by=["lineno"],
    )
    aff = (
        ob.select("oid")
        .unionByName(ib.select(F.col("ioid").alias("oid")))
        .distinct()
    )
    l2b = (
        orders.join(aff, "oid", "left_semi").select("cid", "oid")
        .unionByName(merged_o.join(aff, "oid", "left_semi").select("cid", "oid"))
        .distinct()
        .select(
            F.lit("U").alias("_change_type"),
            F.lit(None).cast("bigint").alias("_transactionid"),
            "cid", "oid",
        )
    )
    maintained = maintain_nested_docs(
        s2_0, merged_c, s1, cb, l2b,
        master_pk=["cid"], joincondition=jc2, schemafield="orders",
        detail_cols=d2, sort_detail_by=["oid"],
    )
    full = nest2(merged_c, nest1(merged_o, merged_i))

    def canon(df):
        return sorted(
            (
                r["cid"], r["cval"],
                tuple(
                    (o["oid"], o["price"],
                     tuple((x["lineno"], x["qty"]) for x in o["items"]))
                    for o in r["orders"]
                ),
            )
            for r in df.collect()
        )

    assert canon(maintained) == canon(full)


# ---------------------------------------------------------------------------
# DLQ fingerprint retention: ships-iff-outside-window, for random poll times
# ---------------------------------------------------------------------------

_poll_offsets = st.lists(
    st.integers(min_value=0, max_value=20), min_size=1, max_size=4
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(offsets=_poll_offsets)
def test_quarantine_retention_ships_iff_outside_window(spark, offsets, tmp_path_factory):
    """For ANY sequence of poll times (day offsets, repeats and
    out-of-order draws included), a malformed row ships on a poll exactly
    when its latest prior ship lies STRICTLY more than the retention
    window in the past (a stamp equal to the cutoff still dedups) — the
    greedy model of the stamped-fingerprint contract. Catches boundary
    regressions (>= vs >), stamp-maxing mistakes after re-ships, and
    accidental dedup loss across compactions."""
    import datetime as _dt
    import os

    from tests.test_poll import MAPPING, _pklog, _src, _txns
    from s4hanaconnector_spark.poll import RangeCommitSink, poll

    R_DAYS = 7
    times = sorted(set(offsets))  # poll times advance; duplicates collapse
    base = _dt.datetime(2026, 1, 1, 12, 0, 0)
    src = _src(spark, [(1, "a")])
    bad = spark.createDataFrame(
        [
            (base, "S4", "U", None, None, None, None, None, None, None, 1, "t"),
        ],
        _pklog(spark, []).schema,
    )
    log = _pklog(spark, [("U", 1, 10)]).unionByName(bad)
    out = str(tmp_path_factory.mktemp("q_ret_prop"))
    sink = RangeCommitSink(out)

    expected_ships, last_ship = 0, None
    for t_days in times:
        now = (base + _dt.timedelta(days=t_days)).strftime("%Y-%m-%d %H:%M:%S")
        poll(
            spark, [MAPPING], lambda n: src, log, _txns(spark, []),
            0, sink, now, quarantine=True,
            quarantine_retention_seconds=R_DAYS * 86400,
        )
        if last_ship is None or (t_days - last_ship) > R_DAYS:
            expected_ships += 1
            last_ship = t_days
    dlq_dir = os.path.join(out, "_quarantine")
    got = (
        spark.read.parquet(dlq_dir).count() if os.path.isdir(dlq_dir) else 0
    )
    assert got == expected_ships, (
        f"poll days {times}: expected {expected_ships} ships, got {got}"
    )


# change rows for compaction: (pk, txid, seq, change_type)
_compact_feeds = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=3),
        st.sampled_from(["I", "U", "A", "D"]),
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=_compact_feeds, split=st.integers(min_value=0, max_value=13))
def test_log_compaction_is_split_invariant(spark, feed, split):
    """Kafka-compaction compositionality: compacting the UNION of any
    txid-split emission pair equals compacting the whole feed, and
    re-compacting a compacted topic is a no-op (idempotence) — the two
    algebraic laws that let a compactor run incrementally at any cadence
    without consumers being able to tell."""

    def df(rows):
        return spark.createDataFrame(
            [
                Row(
                    _change_type=ct, _transactionid=tx, transaction_seq=seq,
                    id=pk, val=f"{ct}{tx}.{seq}",
                )
                for pk, tx, seq, ct in rows
            ],
            "_change_type string, _transactionid bigint, transaction_seq int, "
            "id bigint, val string",
        )

    whole = df(feed)
    lo = df([r for r in feed if r[1] <= split])
    hi = df([r for r in feed if r[1] > split])

    def key(frame):
        return {
            (r["id"], r["_transactionid"], r["transaction_seq"], r["_change_type"], r["val"])
            for r in frame.collect()
        }

    compact_whole = C.compact_changes(whole, ["id"])
    # split-invariance: each side pre-compacted (a committed range IS a
    # compacted emission), then folded
    pre = C.compact_changes(lo, ["id"]).unionByName(C.compact_changes(hi, ["id"]))
    assert key(C.compact_changes(pre, ["id"])) == key(compact_whole)
    # idempotence
    assert key(C.compact_changes(compact_whole, ["id"])) == key(compact_whole)


# --------------------------------------------------------------------------
# drift gate × straggler recovery (r8 VERDICT next #7): random column-add
# sequences interleaved with straggler batches produced against OLDER
# schemas, every batch passing the 'full' drift gate, must land exactly
# where a pure-Python recompute of the additive-evolution contract lands:
#   * an evolved batch adds its new column to the output schema
#     (evolve_schema=True); untouched rows read NULL for it;
#   * a straggler batch (missing newer columns) means UNCHANGED, not
#     removed — the missing columns recover from the snapshot row per PK,
#     NULL for brand-new PKs;
#   * 'D' removes the row regardless of which schema stage emitted it.
# --------------------------------------------------------------------------

# column stages: every batch is emitted at some stage of the rolling DDL
# history (0 = original, 2 = fully evolved). Stages may go BACKWARD between
# batches — that is the straggler racing an evolved snapshot.
_STAGE_COLS = [["a"], ["a", "b"], ["a", "b", "c"]]

_evolving_batches = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # schema stage of this batch
        st.lists(  # (pk, change_type) events, applied in order
            st.tuples(
                st.integers(min_value=0, max_value=4),
                st.sampled_from(["I", "U", "D"]),
            ),
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_evolving_batches, present=snapshots)
def test_drift_gate_straggler_apply_equals_recompute(spark, batches, present):
    snap = spark.createDataFrame(
        [Row(id=i, a=f"base{i}") for i in sorted(present)], "id bigint, a string"
    )
    # python model of the snapshot: pk -> {col: value}
    model = {i: {"a": f"base{i}"} for i in sorted(present)}
    model_cols = ["a"]

    txid = 100
    for stage, events in batches:
        cols = _STAGE_COLS[stage]
        rows, batch_model = [], {}
        for pk, ct in events:
            txid += 1
            rows.append(
                Row(
                    _change_type=ct,
                    _transactionid=txid,
                    transaction_seq=1,
                    id=pk,
                    **{c: f"{c}{pk}t{txid}" for c in cols},
                )
            )
            batch_model[pk] = (ct, txid)  # later event in batch wins (txid asc)
        schema = (
            "_change_type string, _transactionid bigint, transaction_seq int, "
            "id bigint, " + ", ".join(f"{c} string" for c in cols)
        )
        batch = spark.createDataFrame(rows, schema)
        # the gate must approve every additive/straggler step under FULL
        snap = C.apply_changes(
            snap, batch, ["id"], evolve_schema=True, drift_mode="full"
        )
        for c in cols:
            if c not in model_cols:
                model_cols.append(c)
        for pk, (ct, tx) in batch_model.items():
            if ct == "D":
                model.pop(pk, None)
            else:
                old = model.get(pk, {})
                model[pk] = {
                    c: (f"{c}{pk}t{tx}" if c in cols else old.get(c))
                    for c in model_cols
                }

    got = {
        r["id"]: {c: r[c] for c in model_cols if c in snap.columns}
        for r in snap.collect()
    }
    want = {
        pk: {c: vals.get(c) for c in model_cols if c in snap.columns}
        for pk, vals in model.items()
    }
    assert got == want
    # the output schema is exactly base + the union of evolved columns, in
    # first-seen order (additive evolution only — nothing dropped)
    assert [c for c in snap.columns] == ["id", *model_cols]
    # and the evolved snapshot itself re-registers cleanly against the gate
    assert C.apply_changes(
        snap,
        spark.createDataFrame(
            [],
            "_change_type string, _transactionid bigint, transaction_seq int, "
            "id bigint, " + ", ".join(f"{c} string" for c in model_cols),
        ),
        ["id"],
        evolve_schema=True,
        drift_mode="full",
    ).columns == ["id", *model_cols]
