"""Bigram language-model quality scoring [EXT] — the perplexity-style
filter signal of a pretraining pipeline (CCNet / KenLM-style: score every
document by how predictable its text is under an n-gram model trained on
the corpus itself, then drop/bucket the tail).

No reference counterpart (SURVEY.md §2.11): the reference engine stops at
regex filters; a modern training-data pipeline ranks documents by LM
score before mixing. This is the exact (non-sketch) form: an add-one
smoothed bigram model trained on the scored corpus in the same program.

Scale shape:
- tokenization happens ONCE (the per-doc token array is persisted and
  feeds the unigram counts, the bigram counts, and the per-doc bigram
  stream);
- bigram/unigram count tables are VOCABULARY-sized, not corpus-sized;
  their join (attaching the ``w1`` context count to each distinct
  bigram) shuffles vocab-sized frames only;
- per-doc scoring joins the corpus bigram stream to the model on the
  bigram key — posting-list shaped, one shuffle, never |docs|×|vocab|;
- the vocab-size scalar (1 row) is broadcast via crossJoin.

Determinism (the bit-exact DuckDB parity gate): each bigram's
``ln((c_ab + 1) / (c_a + V))`` is computed on identical IEEE doubles in
both engines and immediately QUANTIZED to an exact integer
(``floor(x·1e6 + 0.5)`` → bigint, the repo's order-independence idiom —
see operators/retrieval.py's BM25 contributions, driver-green r5), so
the per-doc sum is associative and partition-order-free; the per-doc
mean re-quantizes the quotient with ``floor(s/n + 0.5)`` (NOT
``round(x, 6)`` — see the half-tie divergence documented in
operators/similarity._quantized_component_means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..functions.text import tokenize

LM_SCALE = 1_000_000


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one
    smoothed bigram LM trained on ``docs`` itself.

    Returns (doc_id, n_bigrams, avg_logprob): ``avg_logprob`` is the
    quantized mean of ``ln P(w_i | w_{i-1})`` over the document's
    adjacent token pairs (6-decimal resolution; higher = more
    predictable = more fluent under the corpus model). Documents with
    fewer than two tokens carry ``n_bigrams = 0`` and ``avg_logprob =
    0.0`` (no signal — a downstream filter keys on ``n_bigrams`` first,
    exactly like span_dedup's zero-span rows).
    """
    toks = tracked_persist(
        docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_toks"))
    )
    uni = (
        toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("bigint").alias("c_a"))
    )
    vocab = uni.agg(F.count("*").cast("bigint").alias("v"))

    # scan-local adjacent-pair generation over the bound token array —
    # the bpe_pair_counts shape (element_at over a bound attribute, not
    # a re-evaluated split expression)
    t = F.col("_toks")
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = tracked_persist(toks.select("doc_id", F.explode(pairs).alias("pair")))

    # model: one row per DISTINCT bigram — quantized smoothed logprob.
    # w1 is recovered from the pair key (tokens are \w+, so the single
    # space is an unambiguous separator).
    model = (
        bi.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .withColumn("w1", F.substring_index("pair", " ", 1))
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "pair",
            F.floor(
                F.log(
                    (F.col("c_ab") + F.lit(1.0)) / (F.col("c_a") + F.col("v"))
                )
                * F.lit(LM_SCALE)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("qlp"),
        )
    )
    scored = (
        bi.join(model, "pair")
        .groupBy("doc_id")
        .agg(
            F.sum("qlp").alias("s"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    return (
        toks.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            F.coalesce(
                F.floor(F.col("s").cast("double") / F.col("n_bigrams") + F.lit(0.5))
                .cast("bigint")
                .cast("double")
                / F.lit(float(LM_SCALE)),
                F.lit(0.0),
            ).alias("avg_logprob"),
        )
    )


def bigram_lm_oracle_sql() -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — same tokenizer, same
    add-one smoothing, same quantize-then-sum-then-requantize pipeline.
    The token CTE is MATERIALIZED: three consumers (unigrams, bigrams,
    doc spine) would otherwise re-tokenize the corpus per reference."""
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
            FROM documents),
        uni AS (
            SELECT w1, CAST(count(*) AS BIGINT) AS c_a
            FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1),
        v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
        bi AS MATERIALIZED (
            SELECT doc_id, t[i] || ' ' || t[i + 1] AS pair
            FROM (SELECT doc_id, t,
                         unnest(range(1, CAST(len(t) AS BIGINT))) AS i
                  FROM toks)),
        model AS (
            SELECT pair,
                   CAST(floor(ln((c_ab + 1.0) / (c_a + v.v))
                              * {LM_SCALE} + 0.5) AS BIGINT) AS qlp
            FROM (SELECT pair, CAST(count(*) AS BIGINT) AS c_ab
                  FROM bi GROUP BY pair)
            JOIN uni ON split_part(pair, ' ', 1) = uni.w1
            CROSS JOIN v),
        scored AS (
            SELECT doc_id, sum(qlp) AS s,
                   CAST(count(*) AS BIGINT) AS n_bigrams
            FROM bi JOIN model USING (pair) GROUP BY doc_id)
        SELECT toks.doc_id,
               coalesce(n_bigrams, 0) AS n_bigrams,
               coalesce(CAST(CAST(floor(CAST(s AS DOUBLE) / n_bigrams + 0.5)
                                  AS BIGINT) AS DOUBLE) / {float(LM_SCALE)!r},
                        0.0) AS avg_logprob
        FROM toks LEFT JOIN scored USING (doc_id)
    """
