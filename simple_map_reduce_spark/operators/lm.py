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


def bigram_lm_oracle_sql(src: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — same tokenizer, same
    add-one smoothing, same quantize-then-sum-then-requantize pipeline.
    The token CTE is MATERIALIZED: three consumers (unigrams, bigrams,
    doc spine) would otherwise re-tokenize the corpus per reference.
    ``src`` lets a composed oracle train/score over a CTE (e.g. the
    quality-kept corpus) instead of the raw table."""
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
            FROM {src}),
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


# threshold resolution for the prune distribution: milli-logprob buckets
# bound the per-language score-distribution table by RESOLUTION (≤ ~2e4
# distinct buckets for any realistic logprob range), not by corpus size
THRESH_SCALE = 1_000


def _score_distribution(
    docs: DataFrame, id_col: str, text_col: str, lang_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The shared threshold machinery of the report and the applied
    prune: (scored, dist, tot, th) where ``scored`` is every document
    with its quantized milli-logprob ``qscore`` (NULL when unscored),
    ``dist`` the RESOLUTION-bounded (lang, qscore) distribution, ``tot``
    per-language scored counts, ``th`` the per-language median-value
    threshold ``t``. One definition so the report's ``n_kept`` and the
    prune's keep set can never silently diverge."""
    scores = bigram_lm_scores(docs, id_col=id_col, text_col=text_col)
    scored = (
        docs.select(F.col(id_col).alias("doc_id"), lang_col)
        .join(scores, "doc_id")
        .withColumn(
            "qscore",
            F.when(
                F.col("n_bigrams") > 0,
                F.floor(F.col("avg_logprob") * THRESH_SCALE + F.lit(0.5)).cast(
                    "bigint"
                ),
            ),
        )
    )
    dist = (
        scored.filter(F.col("n_bigrams") > 0)
        .groupBy(lang_col, "qscore")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window

    wl = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc("qscore"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dist.withColumn("cum", F.sum("cnt").over(wl))
    tot = dist.groupBy(lang_col).agg(F.sum("cnt").alias("n_scored"))
    th = (
        cum.join(tot, lang_col)
        .filter(F.col("cum") >= F.expr("(n_scored + 1) DIV 2"))
        .groupBy(lang_col)
        .agg(F.max("qscore").alias("t"))
    )
    return scored, dist, tot, th


def perplexity_keep_ids(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The APPLIED form of :func:`perplexity_prune_report`: the single
    id column of documents scoring at or above their language's median
    LM score — exactly the documents the report counts as ``n_kept``.
    Unscored (<2-token) docs are dropped (no signal), as is every doc
    of a language with no scored distribution. The threshold frame is
    language-sized and broadcast; applying it is one scan-local filter
    over the scored frame."""
    scored, _dist, _tot, th = _score_distribution(docs, id_col, text_col, lang_col)
    return (
        scored.filter(F.col("n_bigrams") > 0)
        .join(F.broadcast(th), lang_col)
        .filter(F.col("qscore") >= F.col("t"))
        .select(F.col("doc_id").alias(id_col))
    )


def perplexity_prune_report(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """LM-score data selection (the applied form of
    :func:`bigram_lm_scores`): per language, find the median score VALUE
    and keep every document scoring at or above it — CCNet's
    "perplexity filtering" keep-the-fluent-half step, as a
    value-threshold rule (ties at the threshold are kept, so growing
    the corpus never flips an already-kept doc on tie order).

    Returns (lang, n_scored, n_unscored, threshold, n_kept):
    ``n_unscored`` counts <2-token docs (no signal — excluded from the
    distribution and the keep set); ``threshold`` is the milli-logprob
    median value; ``n_kept`` how many scored docs pass. Languages whose
    every document is unscored carry no row (no distribution to
    threshold).

    Scale shape — the threshold machinery never re-sorts the corpus:
    the score distribution is a (lang, milli-logprob-bucket) groupBy
    whose size is bounded by score RESOLUTION (THRESH_SCALE), not by
    corpus size, so the per-language cumulative window runs over a
    vocabulary-of-buckets frame; kept counts come from the same
    distribution (no second corpus pass). Applying the prune to the
    corpus itself is a broadcast threshold join + scan-local filter.
    """
    scored, dist, tot, th = _score_distribution(docs, id_col, text_col, lang_col)
    kept = (
        dist.join(th, lang_col)
        .filter(F.col("qscore") >= F.col("t"))
        .groupBy(lang_col)
        .agg(F.sum("cnt").alias("n_kept"))
    )
    unscored = (
        scored.filter(F.col("n_bigrams") == 0)
        .groupBy(lang_col)
        .agg(F.count("*").cast("bigint").alias("n_unscored"))
    )
    return (
        tot.join(th, lang_col)
        .join(kept, lang_col)
        .join(unscored, lang_col, "left")
        .select(
            lang_col,
            "n_scored",
            F.coalesce("n_unscored", F.lit(0).cast("bigint")).alias("n_unscored"),
            (F.col("t").cast("double") / F.lit(float(THRESH_SCALE))).alias(
                "threshold"
            ),
            "n_kept",
        )
    )


def perplexity_prune_oracle_sql() -> str:
    """DuckDB twin of :func:`perplexity_prune_report`, composed over the
    scoring oracle (same distribution/threshold/keep arithmetic)."""
    return f"""
        WITH s AS MATERIALIZED ({bigram_lm_oracle_sql()}),
        scored AS (
            SELECT d.lang, s.doc_id, s.n_bigrams, s.avg_logprob
            FROM documents d JOIN s USING (doc_id)),
        has AS (
            SELECT lang,
                   CAST(floor(avg_logprob * {THRESH_SCALE} + 0.5) AS BIGINT)
                       AS qscore
            FROM scored WHERE n_bigrams > 0),
        dist AS (
            SELECT lang, qscore, CAST(count(*) AS BIGINT) AS cnt
            FROM has GROUP BY lang, qscore),
        cum AS (
            SELECT lang, qscore, cnt,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY qscore DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
            FROM dist),
        tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_scored
               FROM dist GROUP BY lang),
        th AS (
            SELECT lang, max(qscore) AS t
            FROM cum JOIN tot USING (lang)
            WHERE cum >= (n_scored + 1) // 2
            GROUP BY lang),
        kept AS (
            SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_kept
            FROM dist JOIN th USING (lang)
            WHERE qscore >= t GROUP BY lang),
        uns AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_unscored
            FROM scored WHERE n_bigrams = 0 GROUP BY lang)
        SELECT tot.lang, n_scored,
               coalesce(n_unscored, 0) AS n_unscored,
               CAST(t AS DOUBLE) / {float(THRESH_SCALE)!r} AS threshold,
               n_kept
        FROM tot JOIN th USING (lang) JOIN kept USING (lang)
        LEFT JOIN uns USING (lang)
    """


# Count-Min-Sketch parameters for the approximate LM tier: the model is
# depth×width COUNTERS regardless of vocabulary size (eps ≈ e/width of
# the total mass, failure prob ≈ e^-depth per lookup — Cormode & Muthu-
# krishnan 2005). 3×8192 doubles broadcast in ~200 KB where the exact
# model is vocabulary-sized and must be shuffle-joined.
CMS_DEPTH = 3
CMS_WIDTH = 8192


def bigram_lm_scores_sketch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Approximate :func:`bigram_lm_scores` with a Count-Min-Sketch
    model [labeled-approximate tier, same policy as the HLL/GK
    sketches: accuracy-gated in pytest, not oracle-twinned — the vocab
    estimate is Spark's HLL, which DuckDB cannot reproduce].

    Why it exists at 100 TB: the exact form's model tables are
    VOCABULARY-sized and join onto the corpus bigram stream through a
    posting-shaped shuffle. Here both the bigram and the context
    (unigram) counts live in ``depth × width`` CMS tables — bounded by
    the sketch parameters, never the vocabulary — small enough to
    BROADCAST, so per-doc scoring is a chain of 2·depth broadcast hash
    joins evaluated entirely scan-side: the only corpus-sized shuffles
    are the CMS build itself (map-side combined into ≤ depth·width
    groups) and the final per-doc aggregate. Bucket hashing reuses the
    portable md5 idiom (seeded ``md5_long60 % width``), so the sketch
    contents are deterministic — approximation error comes from hash
    collisions, not RNG.

    Count-Min only ever OVER-estimates (min over depth non-negative
    overestimates), so ĉ_ab ≥ c_ab and ĉ_a ≥ c_a per lookup; the score
    drift is two-sided but bounded by the sketch guarantee. Returns the
    exact form's schema: (doc_id, n_bigrams, avg_logprob) with
    ``n_bigrams`` EXACT (counting needs no model) — only the logprob is
    approximate."""
    from ..functions.hashes import md5_long60

    toks = tracked_persist(
        docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_toks"))
    )
    t = F.col("_toks")
    n = F.size(t)
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = tracked_persist(toks.select("doc_id", F.explode(pair_arr).alias("pair")))
    uni = toks.select(F.explode(t).alias("w1"))

    def _cms(stream: DataFrame, key: str, seed_base: int) -> DataFrame:
        """(d, b, c): the depth×width counter table for a key stream —
        ONE bounded-group aggregation (explode is scan-local)."""
        rows = F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (md5_long60(F.col(key), seed=seed_base + d) % F.lit(width)).alias(
                        "b"
                    ),
                )
                for d in range(depth)
            ]
        )
        return (
            stream.select(F.explode(rows).alias("x"))
            .groupBy(F.col("x.d").alias("d"), F.col("x.b").alias("b"))
            .agg(F.count("*").cast("bigint").alias("c"))
        )

    cms_ab = _cms(bi, "pair", 1000)
    cms_a = _cms(uni, "w1", 2000)
    vocab = uni.agg(F.approx_count_distinct("w1").cast("bigint").alias("v"))

    # scoring: 2·depth BROADCAST joins, no vocab-sized shuffle — every
    # bucket column is scan-local md5 arithmetic, every lookup a
    # width-row broadcast hash join; least() folds the CMS min
    est = bi.withColumn("w1", F.substring_index("pair", " ", 1))
    for d in range(depth):
        est = est.withColumn(
            f"_bab{d}", md5_long60(F.col("pair"), seed=1000 + d) % F.lit(width)
        ).join(
            F.broadcast(
                cms_ab.filter(F.col("d") == d).select(
                    F.col("b").alias(f"_bab{d}"), F.col("c").alias(f"_cab{d}")
                )
            ),
            f"_bab{d}",
        )
        est = est.withColumn(
            f"_ba{d}", md5_long60(F.col("w1"), seed=2000 + d) % F.lit(width)
        ).join(
            F.broadcast(
                cms_a.filter(F.col("d") == d).select(
                    F.col("b").alias(f"_ba{d}"), F.col("c").alias(f"_ca{d}")
                )
            ),
            f"_ba{d}",
        )
    c_ab = F.least(*[F.col(f"_cab{d}") for d in range(depth)])
    c_a = F.least(*[F.col(f"_ca{d}") for d in range(depth)])
    scored = (
        est.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log((c_ab + F.lit(1.0)) / (c_a + F.col("v")))
                * F.lit(LM_SCALE)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("qlp"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("qlp").alias("s"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    out = (
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
    return out
