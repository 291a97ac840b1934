"""Aggregation operators.

Reference parity (SURVEY.md §2.4):
- A1/A2 per-key count with map-side partial aggregation
  (``executors/Sdemo1map.py:22-25`` dict combiner; merged
  ``Sdemo1reduce.py:10-27``) → ``groupBy().count()`` — Spark performs the
  partial (map-side) aggregation automatically.
- A3 percent-of-total (``Sdemo1reduce.py:29-31``): the reference computes
  the total *within each reducer's key subset*, so with >1 reducer the
  percentages are per-partition — a semantic bug documented in SURVEY.md
  §2.4. Implemented here with the global total (an empty-frame window over
  the already-aggregated, group-cardinality-sized result).
- A4 global scalar sum (``wordcountreduce.py:4-19``) → ``agg(sum)``.
- A5 distinct keys (``Sdemo1map.py:33-34`` stdout key set) → ``distinct()``.
- C2 tokenisation ``re.findall(r'\\w+', text.lower())``
  (``wordcountmap.py:13``) → ``regexp_extract_all(lower(col), '\\w+')``,
  exploded.

Scale: tokenize+explode+groupBy(word) is the canonical high-cardinality
shuffle; partial aggregation bounds shuffle volume by distinct-words ×
partitions, not token count. The percent window runs *after* aggregation,
over #groups rows (tiny), so the single-partition window is safe at any
input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = r"\w+"


def tokens(df: DataFrame, column: str = "text") -> DataFrame:
    """One row per token: ``re.findall(r'\\w+', text.lower())`` semantics.

    Input is spread across cores first (no-op when already partitioned)
    so the tokenize+explode map side parallelises even from a
    single-split local file."""
    from ..sources.readers import ensure_parallelism

    return ensure_parallelism(df.select(F.col(column))).select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(column)), F.lit(TOKEN_RE), F.lit(0))
        ).alias("word")
    )


def wordcount(df: DataFrame, column: str = "text") -> DataFrame:
    """Per-word counts (reference wordcount map+reduce, A1/A2)."""
    return tokens(df, column).groupBy("word").agg(F.count("*").alias("cnt"))


def wordcount_total(df: DataFrame, column: str = "text") -> DataFrame:
    """Global token count (A4, ``wordcountreduce.py``)."""
    return tokens(df, column).agg(F.count("*").cast("bigint").alias("total_words"))


def distinct_tokens(df: DataFrame, column: str = "text") -> DataFrame:
    """Distinct token set (A5 — the mapper's stdout key set)."""
    return tokens(df, column).distinct()


def filter_group_count_percent(
    df: DataFrame,
    filter_col: str,
    filter_val,
    group_col: str,
    pct_format: str = "%.2f%%",
) -> DataFrame:
    """Reference demo query F3+A1–A3: ``WHERE filter_col = filter_val
    GROUP BY group_col → count, 100*count/total``, percent formatted like
    ``Sdemo1reduce.py:31``. Total is computed globally (bug fix per
    SURVEY.md §2.4 A3). Output: (group, cnt, pct, pct_str)."""
    counts = (
        df.filter(F.col(filter_col) == F.lit(filter_val))
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.count("*").alias("cnt"))
    )
    # Window over the aggregated result: #groups rows, so the empty
    # partition spec is not a scale hazard.
    total = F.sum("cnt").over(Window.partitionBy())
    pct = (F.col("cnt") * F.lit(100.0) / total).alias("pct")
    return counts.select(
        "grp",
        "cnt",
        pct,
        F.format_string(pct_format, F.col("cnt") * F.lit(100.0) / total).alias("pct_str"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf [EXT].

    tf = term count within the document; idf = ln(N / df) with N = corpus
    size and df = number of documents containing the term. Output:
    (id, term, tf, score, rank).

    Shuffle shape at scale: one groupBy (id, term) for tf (map-side
    combined over the token explode), one groupBy (term) for df over the
    already-aggregated tf rows, and a broadcast of the single-row N
    aggregate. The per-doc top-k window partitions by document id —
    bounded partitions, no global sort.

    Determinism: ranking orders by the score ROUNDED to 6 decimals (with
    a term tiebreak), so sub-ulp differences in ``ln`` between engines
    can never reorder results.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .select(
            "id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("t")), F.lit(TOKEN_RE), F.lit(0))
            ).alias("term"),
        )
    )
    tf = tok.groupBy("id", "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df_cnt"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_cnt")),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "score", F.col("rank").cast("bigint").alias("rank"))
    )
