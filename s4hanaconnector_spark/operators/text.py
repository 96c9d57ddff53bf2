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
    return shingles_from_tokens(tokens(normalize_text(c)), n)
