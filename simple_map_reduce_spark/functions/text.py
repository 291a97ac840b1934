"""Text-analysis functions for large-scale training-data pipelines [EXT].

No reference counterpart (the reference's only text ops are regex search
and ``\\w+`` tokenisation, SURVEY.md §2.7); these extend that surface to
what a 100 TB corpus pipeline needs: token statistics, quality scoring,
language ID, and document fingerprinting.

All functions are built-in Catalyst expressions (no Python UDFs): they
stay inside WholeStageCodegen, vectorize, and push through shuffles —
the 100 TB-safe way to run per-document text analysis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\w+"
# ASCII punctuation — identical to POSIX [[:punct:]] so the DuckDB oracle
# can reproduce the count with RE2's [[:punct:]].
PUNCT_RE = r"[!-/:-@\[-`{-~]"

# Tiny marker-word inventories for the n-gram-free language heuristic.
# Deterministic and reproducible in plain SQL on both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "fr": ("le", "la", "de", "et", "un", "les", "des"),
}
# Fixed priority order for argmax ties (checked in this order).
LANG_PRIORITY = ("en", "es", "fr")

STOPWORDS = ("the", "a", "an", "of", "and", "or", "is", "to", "in", "it", "on")


def tokenize(col: Column | str) -> Column:
    """``re.findall(r'\\w+', s.lower())`` as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties dropped — the exact-reassembly
    tokenizer (single-space rejoin reproduces the original up to
    whitespace runs), unlike :func:`tokenize` which lowercases for
    counting. The DuckDB twin is ``regexp_extract_all(text, '\\S+')``;
    one definition here keeps span dedup and BPE pair counting (and any
    future consumer) agreeing with their oracles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col)).cast("bigint")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("bigint")


def punct_count(col: Column | str) -> Column:
    """Number of ASCII punctuation characters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0))).cast("bigint")


def stopword_count(col: Column | str) -> Column:
    toks = tokenize(col)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/char/punct/stopword counts and ratios.

    Ratio denominators are guarded with ``greatest(1, n)`` so empty
    documents yield 0.0 instead of NULL/NaN — the behaviour a dedup or
    filter stage downstream wants.
    """
    tc = token_count(text_col)
    cc = char_count(text_col)
    return (
        df.withColumn("n_tokens", tc)
        .withColumn("n_chars_computed", cc)
        .withColumn("n_punct", punct_count(text_col))
        .withColumn("n_stopwords", stopword_count(text_col))
        .withColumn(
            "punct_ratio",
            F.col("n_punct") / F.greatest(F.lit(1), F.col("n_chars_computed")),
        )
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords") / F.greatest(F.lit(1), F.col("n_tokens")),
        )
        .withColumn(
            "avg_token_len",
            F.length(F.array_join(tokenize(text_col), "")).cast("bigint")
            / F.greatest(F.lit(1), F.col("n_tokens")),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A simple, fully deterministic quality score in [0, 1]:
    rewards stopword presence and moderate length, penalises punctuation
    soup. The exact formula matters less than it being (a) cheap, (b)
    portable SQL, (c) monotone in the obvious junk signals."""
    feats = quality_features(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0))
    punct_pen = F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0))
    return feats.withColumn(
        "quality",
        (length_term * F.lit(0.4) + stop_term * F.lit(0.4) + (F.lit(1.0) - punct_pen) * F.lit(0.2)),
    )


# Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1, adapted to
# the short synthetic docs). Exact INTEGER comparisons only
# (cross-multiplied ratios) so the SQL oracles agree bit-for-bit.
GOPHER_MIN_TOKENS = 20       # Gopher uses 50
GOPHER_TOKLEN_LO = 3         # mean word length bounds (Gopher: 3..10)
GOPHER_TOKLEN_HI = 10
GOPHER_SYMBOL_DENOM = 10     # punctuation ≤ 1/10 of characters


def gopher_rule_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one boolean column per quality rule (``p_minlen``,
    ``p_toklen``, ``p_stopword``, ``p_symbol``) plus ``p_all``. Shared by
    the quality_filter report query and the composed pretraining
    pipeline so the two can never apply different rules."""
    toks = tokenize(text_col)
    flagged = df.withColumns(
        {
            "_n_tok": F.size(toks).cast("bigint"),
            "_tok_chars": F.length(F.array_join(toks, "")).cast("bigint"),
            "_n_punct": punct_count(text_col),
            "_n_chars": F.length(text_col).cast("bigint"),
            "_n_stop": stopword_count(text_col),
        }
    )
    flagged = flagged.withColumns(
        {
            "p_minlen": F.col("_n_tok") >= GOPHER_MIN_TOKENS,
            "p_toklen": (
                F.lit(GOPHER_TOKLEN_LO) * F.col("_n_tok") <= F.col("_tok_chars")
            )
            & (F.col("_tok_chars") <= F.lit(GOPHER_TOKLEN_HI) * F.col("_n_tok")),
            "p_stopword": F.col("_n_stop") >= 1,
            "p_symbol": F.lit(GOPHER_SYMBOL_DENOM) * F.col("_n_punct")
            <= F.col("_n_chars"),
        }
    )
    return flagged.withColumn(
        "p_all",
        F.col("p_minlen")
        & F.col("p_toklen")
        & F.col("p_stopword")
        & F.col("p_symbol"),
    ).drop("_n_tok", "_tok_chars", "_n_punct", "_n_chars", "_n_stop")


def lang_marker_counts(col: Column | str) -> list[Column]:
    """One count column per language: tokens ∈ that language's marker set."""
    toks = tokenize(col)

    def in_set(markers: tuple[str, ...]):
        # single-arg lambda per language: pyspark's higher-order-function
        # binding treats *every* parameter (even defaulted) as a Column
        return lambda t: t.isin(*markers)

    return [
        F.size(F.filter(toks, in_set(LANG_MARKERS[lang])))
        .cast("bigint")
        .alias(f"hits_{lang}")
        for lang in LANG_PRIORITY
    ]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hits with a fixed
    priority tiebreak; 'und' when nothing matches. O(tokens), no UDF, no
    model — the class of heuristic a first-pass 100 TB triage uses before
    spending on a real classifier."""
    with_hits = df.select("*", *lang_marker_counts(text_col))
    # argmax with LANG_PRIORITY tiebreak ('und' if all zero): built from the
    # lowest-priority language up so earlier languages win equal scores.
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        cond = F.col(f"hits_{lang}") > 0
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            op = (
                F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
                if LANG_PRIORITY.index(lang) < LANG_PRIORITY.index(other)
                else F.col(f"hits_{lang}") > F.col(f"hits_{other}")
            )
            cond = cond & op
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return with_hits.withColumn("lang_pred", expr)


# BPE-ish pre-tokenizer (GPT-2-style contractions + space-attached word/
# number/punct runs). No lookahead/lookbehind, so the pattern means the
# same thing in Java regex (Spark) and RE2 (DuckDB oracle).
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count_ws(col: Column | str) -> Column:
    """Whitespace-delimited token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\S+"), F.lit(0))).cast("bigint")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count — the cheap LLM-cost estimator a corpus
    pipeline runs over every document (a real BPE vocab merges further;
    this pre-tokenization is the count's upper bound shape)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), F.lit(0))).cast("bigint")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the normalised token stream
    (lowercase, punctuation/whitespace collapsed) — two documents with the
    same token sequence share a fingerprint regardless of formatting."""
    return F.md5(F.array_join(tokenize(col), " "))


# PII patterns kept to syntax Java regex (Spark) and RE2 (DuckDB) treat
# identically: character classes + bounded repetition, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"


def redact_pii(col: Column | str) -> Column:
    """Scrub email addresses and phone numbers (emails first — a phone
    pattern can never overlap an email match, so the order is stable).
    Pure Catalyst regexp_replace: JVM-side, zero UDF, scan-local."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the column."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("bigint"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast("bigint"),
    )
