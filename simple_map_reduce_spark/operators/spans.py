"""Exact substring-span deduplication [EXT].

Published basis: Lee et al. 2021 ("Deduplicating Training Data Makes
Language Models Better") remove duplicated ~50-token substrings
corpus-wide (their ExactSubstr suffix-array tool); RefinedWeb and Gopher
apply the same idea at line/paragraph granularity. A suffix array is not
a Spark-shaped structure, so the Spark-native equivalent here: cut every
document into fixed non-overlapping ``span_tokens``-token spans, hash
each span, keep only the corpus-wide FIRST occurrence of every distinct
span (ordered by ``(doc_id, pos)``), and reassemble each document from
its surviving spans.

No reference counterpart (SURVEY.md §2.11 north-star scope).

Scale shape (100 TB):

- span explosion is **scan-local** (``transform`` over the token array —
  no join, no window);
- first-occurrence selection is ONE shuffle keyed by the 60-bit span
  hash (``functions/hashes.md5_long60`` — 8-byte join keys, never span
  strings) with a bounded aggregate (``min(struct)``), partial-aggregated
  map-side — the wordcount shape;
- per-doc reassembly is ONE shuffle keyed by doc id; ``collect_list``
  state is bounded by document length, never corpus size;
- the final re-attach of docs that lost EVERY span is a co-partitioned
  id-keyed join after aggregation (both sides already hashed by id).

Nothing quadratic, no window over raw corpus rows. Hash note: two
distinct spans colliding on the 60-bit hash would merge erroneously —
at p≈n²/2⁶¹ that is the same accepted risk every hash-keyed stage in
operators/dedup.py documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import md5_long60

DEFAULT_SPAN_TOKENS = 8


def _ws_tokens(text_col: str):
    """Exact-reassembly whitespace tokenizer — single definition in
    functions.text.ws_tokens (shared with BPE pair counting)."""
    from ..functions.text import ws_tokens

    return ws_tokens(text_col)


def doc_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = DEFAULT_SPAN_TOKENS,
) -> DataFrame:
    """Explode each document into ``(id, pos, span_text)`` rows of
    non-overlapping ``span_tokens``-token blocks (the last block may be
    short). Scan-local: one ``transform`` + ``posexplode``, no shuffle.
    An empty document yields a single ``(id, NULL, NULL)`` row
    (``posexplode_outer``) so no input id ever disappears."""
    w = span_tokens
    with_toks = df.select(id_col, _ws_tokens(text_col).alias("_toks"))
    n_spans = F.expr(f"(size(_toks) + {w - 1}) DIV {w}")
    span_arr = F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(0), (n_spans - 1).cast("int")),
            lambda i: F.array_join(F.slice(F.col("_toks"), i * w + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select(
        id_col, F.posexplode_outer(span_arr).alias("pos", "span_text")
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = DEFAULT_SPAN_TOKENS,
) -> DataFrame:
    """Corpus-wide exact span dedup. Output per input document:
    ``(id, n_spans, kept_spans, clean_md5)`` where ``clean_md5`` is the
    md5 of the document reassembled from its surviving spans (first
    corpus-wide occurrence wins; a doc whose every span already appeared
    elsewhere keeps zero spans and hashes the empty string)."""
    spans = doc_spans(df, id_col, text_col, span_tokens).where(
        F.col("pos").isNotNull()
    )
    spans = spans.withColumn("h", md5_long60(F.col("span_text")))
    # corpus-wide first occurrence per distinct span hash: bounded agg,
    # map-side partial — never a window over the exploded rows
    firsts = spans.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "first"
        )
    )
    flagged = spans.join(firsts, "h").withColumn(
        "_keep",
        (
            (F.col(id_col) == F.col("first.i")) & (F.col("pos") == F.col("first.p"))
        ).cast("int"),
    )
    # collect_list skips nulls: only kept spans enter the reassembly
    agg = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum("_keep").alias("kept_spans"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep") == 1,
                                F.struct("pos", "span_text"),
                            )
                        )
                    ),
                    lambda s: s["span_text"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    # re-attach docs that produced no spans at all (empty text)
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("kept_spans", F.lit(0)).cast("bigint").alias("kept_spans"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
    )
