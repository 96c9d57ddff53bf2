"""Text-analysis operators (E21) for large-scale training-data pipelines:
normalization, token/char stats, quality scoring, language-ID heuristic,
document fingerprinting, shingling.

Design rules: everything is built from JVM-side ``pyspark.sql.functions``
(regexp/hash/array builtins) — zero Python UDFs, so these run inside
whole-stage codegen at 100 TB. Cross-engine determinism (for the DuckDB
oracle) comes from md5 as the shared hash and explicit regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small in-query stopword lists for the language-ID heuristic; marker words
# per language, matched as whole tokens
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "pas"],
    "es": ["el", "y", "no"],
    "zh": ["de", "shi", "bu"],
}

ENGLISH_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def normalize_text(c: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip everything
    but [a-z0-9 ], collapse runs of whitespace, trim."""
    x = F.lower(c)
    x = F.regexp_replace(x, "[^a-z0-9 ]", "")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def tokens(c: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty array for empty/blank
    strings, not [''])."""
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def word_tokens(c: Column) -> Column:
    """Normalized word tokenization in ONE regex pass: lowercase, split on
    any non-alphanumeric run. Equals ``tokens(normalize_text(c))`` except
    that punctuation SPLITS fragments ("don't" -> [don, t]) instead of
    joining them ("dont") — the standard tokenizer behavior, and 2x faster
    on the dedup hot path (one regex evaluation per doc instead of three;
    measured 0.32s -> 0.16s per shingle pass at sf0.1). The DuckDB oracle
    mirrors the same single-regex split."""
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


# GPT-2-style pre-tokenizer shape: letter runs, digit runs, and single
# non-alphanumeric marks each become one token — the unit BPE merges start
# from. Shared verbatim with the DuckDB oracle (both engines use RE2-compatible
# syntax for this class).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(c: Column) -> Column:
    """BPE-ish pre-tokenization -> array<string>: a closer token-count proxy
    for LLM budgeting than whitespace splitting (punctuation and number runs
    count separately)."""
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, mean token length, punctuation and
    digit ratios, uppercase ratio — the standard quality-filter features."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))).alias("chars_per_token"),
        (
            F.length(F.regexp_replace(c, "[^!-/:-@\\[-`{-~]", "")).cast("double")
            / F.greatest(n_chars, F.lit(1))
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(c, "[^0-9]", "")).cast("double")
            / F.greatest(n_chars, F.lit(1))
        ).alias("digit_ratio"),
    )


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal
    (low ratio => word-salad / non-natural text)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite 0..1 quality heuristic: length in a sane band, low digit
    ratio, stopword presence. Deliberately simple and deterministic — the
    shape (weighted bounded features) is what matters for the pipeline."""
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    digit = F.length(F.regexp_replace(c, "[^0-9]", "")).cast("double") / F.greatest(n, F.lit(1))
    sw = stopword_ratio(c)
    return (0.4 * len_ok + 0.3 * (1 - F.least(digit * 5, F.lit(1.0))) + 0.3 * F.least(sw * 5, F.lit(1.0))).alias(
        "quality"
    )


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-token counts per language."""
    toks = tokens(F.lower(c))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    return out


def lang_id(c: Column) -> Column:
    """Argmax over marker-token counts with deterministic tie order
    (en > de > fr > es > zh). An n-gram-frequency heuristic, not a model —
    the operator contract (string label per doc, computed distributed) is
    the point; swap in a real classifier as a pandas_udf when libs exist."""
    s = lang_scores(c)
    best = F.greatest(*s.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in ["en", "de", "fr", "es", "zh"]:
        expr = expr.when(s[lang] == best, F.lit(lang))
    return expr


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical in any engine that md5s UTF-8 bytes — the cross-engine
    stand-in for a rolling hash."""
    return F.md5(normalize_text(c))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a PRE-MATERIALIZED token-array
    column -> array<string>. Documents shorter than n words yield a single
    whole-text shingle so they still participate in dedup.

    ``toks`` must be a plain column reference (not the tokenization
    expression itself): referencing an expression inside the ``transform``
    lambda would re-evaluate the full normalize+split pipeline once per
    shingle position — O(words²) regex work per document. Materializing the
    array in a prior projection keeps shingling O(words)."""
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles -> array<string>, tokenizing inline.
    Prefer ``shingles_from_tokens`` over a materialized token column in hot
    paths (see its docstring for the re-evaluation pitfall)."""
    return shingles_from_tokens(word_tokens(c), n)


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    keep_text: bool = False,
) -> DataFrame:
    """Split each document into consecutive ``chunk_size``-token chunks —
    the context-window packing step of a training-data pipeline. Output:
    one row per (doc, chunk) with ``chunk_id`` (0-based), ``n_chunk_tokens``
    and ``chunk_md5`` (md5 of the space-rejoined chunk; pass
    ``keep_text=True`` to also carry the chunk text).

    All row-local: tokenization is materialized once per document (see the
    ``shingles_from_tokens`` re-evaluation pitfall), chunk ids come from
    ``explode(sequence(...))`` and each chunk is an O(chunk_size)
    ``slice`` — no shuffle, pipelines straight out of the scan, and the
    explode fan-out (~tokens/chunk_size per doc) is bounded by document
    length, never by corpus size. Zero-token documents yield no rows
    (mirrors an empty ``range()``; Spark's ``sequence(0, -1)`` would emit a
    descending sequence, so they are filtered explicitly).
    """
    toks_df = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w")).filter(
        F.size("__w") > 0
    )
    n_chunks = F.ceil(F.size("__w") / F.lit(float(chunk_size))).cast("long")
    exploded = toks_df.select(
        id_col,
        "__w",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(F.col("__w"), F.col("chunk_id") * chunk_size + 1, chunk_size)
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        *([F.concat_ws(" ", chunk).alias("chunk_text")] if keep_text else []),
    )


def vocab_stats(df: DataFrame, text_col: str, id_col: str, min_doc_freq: int = 1) -> DataFrame:
    """Corpus vocabulary with document frequency, total term frequency and
    idf — the term-statistics pass feeding tokenizer training, stopword
    discovery and tf-idf. One explode + one hash aggregation keyed on the
    token (Spark plans partial count/count-distinct map-side, so the
    shuffle carries per-partition partials, not one row per occurrence).
    ``idf = ln(n_docs / doc_freq)``, rounded to 6 digits so IEEE libm
    differences across engines cannot flip a value. The corpus size joins
    in as a broadcast 1-row aggregate — no driver collect()."""
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    return toks.groupBy("tok").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_freq"),
    ).filter(F.col("doc_freq") >= min_doc_freq).crossJoin(F.broadcast(n_docs)).select(
        "tok",
        "doc_freq",
        "total_freq",
        F.round(
            F.log(F.col("__n_docs").cast("double") / F.col("doc_freq")), 6
        ).alias("idf"),
    )


# PII patterns shared verbatim with the DuckDB oracle — restricted to the
# regex-class/quantifier subset where Java regex and RE2 agree exactly.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUMBER_ID_RE = r"\d{3}-\d{2}-\d{4}"  # SSN-shaped; also catches phone-ish ids


def pii_redact(c: Column) -> Column:
    """Mask email addresses and SSN-shaped number ids with typed
    placeholder tags — the standard pre-training PII scrub. Pure
    ``regexp_replace`` (global, JVM-side, codegen'd); order matters only
    if patterns overlap, which these cannot (emails contain '@')."""
    x = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(x, PII_NUMBER_ID_RE, "<ID>")


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-document PII hit counts (for filtering/reporting)."""
    return {
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL_RE)),
        "n_number_ids": F.regexp_count(c, F.lit(PII_NUMBER_ID_RE)),
    }


def repetition_stats(df: DataFrame, text_col: str, id_col: str, n: int = 2) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText repetition
    filters): for each document, the fraction of all word n-grams taken by
    the single most frequent one (``top_ngram_frac``) and the fraction of
    n-gram occurrences that are repeats of an earlier one
    (``dup_ngram_frac``). High values mean boilerplate/keyword-stuffing.

    Tokens materialize once, n-grams explode row-locally, and the counts
    are two hash aggregations keyed by (doc, gram) then doc — both shuffles
    are on the document id, so the pipeline scales with corpus size, not
    vocabulary. Documents with fewer than ``n`` tokens are dropped (no
    n-grams exist; both engines agree by construction)."""
    toksed = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__w")).filter(
        F.size("__w") >= n
    )
    grams = toksed.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, n)),
            )
        ).alias("g"),
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"),
        F.round(1 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_ngram_frac"),
    )


def tfidf_search(df: DataFrame, text_col: str, id_col: str, terms: list[str]) -> DataFrame:
    """Score every document against a bag-of-words query with tf·idf — the
    retrieval/relevance-scoring shape (idf as in ``vocab_stats``, unrounded
    until the final score so both engines round the same product sum).

    ONE token explode feeds everything: the (id, term) frequency table is
    the only aggregate of the explode output (an ``isin`` filter prunes it
    before any shuffle), and per-term document frequency is a count window
    over the tf table's term partitioning — tf has exactly one row per
    (doc, term), so the window count IS the old idf leg's
    count_distinct(id), without re-evaluating the explode subtree for a
    second aggregation (the r12 df_count rewrite, same as ngram_coverage).
    idf = log(n_docs/df) evaluates per tf row — a deterministic function
    of two integers, bit-identical to computing it once per term and
    joining. Only documents containing at least one query term survive —
    output is (id, score)."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    hits = toks.filter(F.col("tok").isin(terms))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "__df", F.count(F.lit(1)).over(W.partitionBy("tok"))
    ).crossJoin(F.broadcast(n_docs))
    idf = F.log(F.col("__n_docs").cast("double") / F.col("__df"))
    return scored.groupBy(id_col).agg(
        F.round(F.sum(F.col("tf") * idf), 6).alias("score")
    )


def bm25_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance scoring (the Robertson-Sparck Jones ranking function
    every lexical retrieval stack uses):
    ``idf·tf(k1+1) / (tf + k1(1−b + b·dl/avgdl))`` summed over query terms.
    Extends ``tfidf_search`` with document-length normalization: long
    documents stop winning on raw term count.

    Parity discipline: every input to the float formula is an exact
    integer aggregate (tf, dl, Σdl, N, df), the formula is mirrored
    token-for-token in the oracle so both engines execute the same IEEE
    operation tree, and only the final summed score rounds (6 digits).

    The explode is evaluated ONCE (the tf leg). Document length needs no
    explode at all: ``dl = size(token array)`` is row-local and equals the
    old explode->groupBy(id) count exactly (explode emits one row per
    element incl. nulls; docs with empty/null arrays produced no rows and
    are filtered the same way here), so both dl legs (the 1-row corpus
    stats and the per-doc re-attachment join) are cheap projection scans
    instead of explode+shuffle rounds. Per-term df is a count window over
    the (doc, term) tf table (one row per pair = the old
    count_distinct(id)); idf evaluates per tf row — a deterministic
    function of two integers, bit-identical to the old |terms|-row
    broadcast table. The historical shape re-evaluated the token explode
    six times (dl, corpus, idf, tf, and the two re-attachment legs)."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__w")
    )
    dl = base.select(
        F.col(id_col), F.size("__w").alias("__dl")
    ).filter(F.col("__dl") > 0)
    corpus = dl.agg(
        F.sum("__dl").alias("__total_dl"), F.count(F.lit(1)).alias("__n_docs")
    )
    hits = base.select(F.col(id_col), F.explode("__w").alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("__tf"))
    scored = (
        tf.withColumn("__df", F.count(F.lit(1)).over(W.partitionBy("tok")))
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "__idf", F.log(F.col("__n_docs").cast("double") / F.col("__df"))
        )
    )
    norm_dl = (
        F.col("__dl").cast("double")
        * F.col("__n_docs").cast("double")
        / F.col("__total_dl").cast("double")
    )
    contrib = (
        F.col("__idf")
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (F.col("__tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm_dl))
    )
    return scored.groupBy(id_col).agg(F.round(F.sum(contrib), 6).alias("bm25"))


def pmi_collocations(
    df: DataFrame, text_col: str, id_col: str, min_count: int = 5
) -> DataFrame:
    """Collocation mining by pointwise mutual information:
    ``pmi(a,b) = ln( P(ab) / (P(a)·P(b)) )`` over corpus bigrams — the
    classic phrase-detection signal (high PMI = 'new york', not 'of the').

    Parity discipline: every probability input is an exact integer count
    (bigram count, unigram counts, corpus totals); the single float
    expression evaluates per-row on those integers, so there is no
    cross-partition float accumulation anywhere — the oracle mirrors the
    identical operation tree and both engines produce the same double
    before the final 6-digit round. Corpus totals ride along as broadcast
    1-row aggregates. ``min_count`` drops noise bigrams (standard PMI
    practice; also bounds the output)."""
    toksed = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__w"))
    uni = (
        toksed.select(F.explode("__w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toksed.filter(F.size("__w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.struct(
                        F.get(F.col("__w"), i - 1).alias("a"),
                        F.get(F.col("__w"), i).alias("b"),
                    ),
                )
            ).alias("g")
        )
        .select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    # total unigram count from the token arrays directly (sum of per-doc
    # lengths) — summing the unigram table would re-evaluate the whole
    # tokenize+explode+groupBy subtree for the same number (explode emits
    # one row per element, so sum(size) == sum of unigram counts exactly)
    tot_u = toksed.agg(F.sum(F.size("__w")).alias("__tu"))
    # total bigram count must include the min_count-dropped rare bigrams, so
    # it comes from the token arrays directly (sum of per-doc len-1), not
    # from summing the filtered bigram table
    tot_bi = toksed.filter(F.size("__w") >= 2).agg(
        F.sum(F.size("__w") - 1).alias("__tb")
    )
    # unigram table is vocab-sized (can be millions of rows at corpus scale)
    # — join on the token and let AQE pick broadcast when it actually fits;
    # only the 1-row totals are forced broadcasts
    scored = (
        bi.join(uni.withColumnRenamed("t", "a").withColumnRenamed("c", "c_a"), on="a")
        .join(uni.withColumnRenamed("t", "b").withColumnRenamed("c", "c_b"), on="b")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_bi))
    )
    p_ab = F.col("c_ab").cast("double") / F.col("__tb").cast("double")
    p_a = F.col("c_a").cast("double") / F.col("__tu").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("__tu").cast("double")
    return scored.select(
        "a", "b", "c_ab",
        F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
    )


def rank_by_score(
    df: DataFrame, score_col: str, id_col: str, rank_col: str = "rank"
) -> DataFrame:
    """row_number ranking (ties broken by id) of a scored result — NOT
    dense_rank, deliberately: RRF's 1/(k+rank) needs every row to hold a
    distinct rank, and duplicate ranks under score ties would change
    rrf_fuse results. The id tiebreak makes the frontier deterministic on
    any engine. Single
    window over one (empty-key) partition is fine for RANKING OUTPUTS
    (top-k lists, per-query candidates), which are bounded; never apply to
    corpus-sized relations."""
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn(rank_col, F.row_number().over(w).cast("long"))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two rankings:
    ``rrf = 1/(k + rank_a) + 1/(k + rank_b)``, missing membership
    contributes 0 — the standard score-free combiner for lexical +
    semantic retrieval (BM25 list fused with an embedding-cosine list).

    The fusion is a WIDE full-outer join rather than union+groupBy-sum:
    with the two addends in fixed expression order the float result is
    bit-deterministic on any engine, whereas a grouped SUM over an
    exploded union would depend on partition arrival order. Ranks are
    exact ints; both rank lists are top-k-bounded, so the join is
    broadcast-sized by construction."""
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    fused = a.join(b, on=id_col, how="full_outer")
    term = lambda c: F.coalesce(
        F.lit(1.0) / (F.lit(float(k)) + F.col(c).cast("double")), F.lit(0.0)
    )
    return fused.select(
        id_col,
        "rank_a",
        "rank_b",
        F.round(term("rank_a") + term("rank_b"), 9).alias("rrf_score"),
    )


def pack_sequences(
    chunks: DataFrame,
    token_col: str,
    order_cols: list[str],
    budget: int,
    shard_col=None,
) -> DataFrame:
    """Greedy contiguous sequence packing — assign consecutive chunks to
    fixed-token-budget training sequences (the packing step between
    chunking and batch assembly in a pretraining pipeline).

    ``seq_id = floor((running_sum - own_tokens) / budget)``: a chunk starts
    a new sequence exactly when the tokens BEFORE it fill the current
    budget, so sequences are ~``budget`` tokens with at most one chunk of
    overflow at each boundary (the streaming-friendly greedy packing used
    in practice; exact first-fit bin packing is inherently sequential).
    Integer-only arithmetic — bit-identical on any engine.

    Scale: the running sum is a window over ``shard_col`` — pass a shard
    (source, date, id-bucket) so packing parallelizes and sequences never
    cross shard boundaries; a None shard means ONE global window (single
    partition — fine for bounded inputs, never for a corpus)."""
    from pyspark.sql import Window as W

    shard = F.col(shard_col) if isinstance(shard_col, str) else (
        shard_col if shard_col is not None else F.lit(0)
    )
    w = W.partitionBy(shard).orderBy(*[F.col(c) for c in order_cols])
    cum = F.sum(F.col(token_col)).over(w)
    return chunks.withColumn(
        "seq_id",
        F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document bigram language-model score — the KenLM-style fluency
    filter (CCNet and most pretraining pipelines gate documents on LM
    perplexity; this is the engine-native n-gram version): train add-one-
    smoothed bigram statistics ON the corpus itself, then score each
    document by its mean log-probability. Gibberish and boilerplate score
    low; fluent prose scores high.

      lp(w1, w2) = ln( (c(w1,w2) + 1) / (c(w1) + V) )
      score(doc) = sum(lp over the doc's bigrams) / n_bigrams

    Cross-engine determinism: each bigram's log-prob is rounded to 6
    digits FIRST (libm ln() may differ in the last ulp between engines)
    and then summed as exact DECIMAL — term-level rounding + decimal
    addition makes the 100-term per-doc sum order-free, where a raw
    float SUM would depend on partition arrival order.

    Shapes: one posexplode produces the token stream; bigrams come from a
    per-doc lag window (one shuffle on doc id); the count tables aggregate
    map-side and join back on the bigram key; V and the 1-row corpus stats
    broadcast. Documents with < 2 tokens emit no row."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "w"),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    big = toks.select(
        id_col,
        F.lag("w").over(w).alias("w1"),
        F.col("w").alias("w2"),
    ).filter(F.col("w1").isNotNull())
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = toks.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("__v"))
    lp = (
        c12.join(c1, on="w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("__v"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return (
        big.join(lp, on=["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("__s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("__s").cast("double") / F.col("n_bigrams"), 6).alias(
                "avg_logp"
            ),
        )
    )
