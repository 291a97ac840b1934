"""[EXT] query registry: LLM-data-pipeline operators (SURVEY.md §2.11)
over the ``documents`` / ``embeddings`` test tables, each with a DuckDB
oracle twin generated from the same parameters so Spark and oracle compute
the *same algorithm* (MinHash seeds, band layout, SimHash bits, RHP
planes) — not merely the same intent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
)
from .operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    SIMHASH_BITS,
    decontaminate_report,
    exact_dedup,
    lsh_band_buckets,
    minhash_dup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
)
from .functions.text import BPE_RE, token_count_bpe, token_count_ws
from .operators.retrieval import bm25_oracle_sql
from .operators.maple_juice import juice, maple
from .operators.similarity import (
    LC_SCALE,
    cosine_neardup_pairs,
    cosine_topk,
    cosine_topk_ivf,
)
from .multimodal import attach_binary
from .sources.readers import load_table

JACCARD_N = 3
JACCARD_THRESHOLD = 0.1
MINHASH_THRESHOLD = 0.3
SIM_QUERY_IDS = [0, 1, 2, 3, 4]
SIM_K = 5
# ANN tier parameters — shared by the Spark queries AND their oracle
# builders so the two sides always run the same algorithm instance
# (passing non-defaults to one side only is the parity bug class flagged
# in round 3's advice).
EMB_NEARDUP_THRESHOLD = 0.35
SIM_LSH_PLANES = 12
SIM_LSH_HAMMING = 2
SIM_IVF_CENTROIDS = 16
SIM_IVF_NPROBE = 4
# MMR rerank (r11): pool depth, selections, relevance/diversity mix
MMR_POOL = 12
MMR_K = 5
MMR_LAM = 0.7
# Lloyd refinement of the IVF quantizer: k seeds, fixed iteration count —
# the oracle unrolls exactly this many assignment/mean rounds in SQL
IVF_REFINE_K = 8
IVF_REFINE_ITERS = 2
# SemDeDup within-cluster cosine threshold — matches the embedding
# near-dup tier's EMB_NEARDUP_THRESHOLD for this synthetic corpus (real
# web-text runs sit near 0.95; the paper tunes eps = 1 - cos per corpus).
# k is larger than the IVF quantizer's: cluster population bounds the
# quadratic within-cluster work, so k grows with the corpus (the paper's
# ~50k-cluster regime) — 32 keeps sf0.1 clusters a few hundred vectors.
SEMDEDUP_TAU = 0.35
SEMDEDUP_K = 32
SEMDEDUP_ITERS = 2
# the centroid quantization scale, single-sourced from the operator so
# the oracle SQL can never silently desynchronize from the Spark side
_LC_S = f"{float(LC_SCALE):.1f}"


def _carried_cos_sql(a: str, b: str) -> str:
    """Rounded cosine over pre-normed frames: ``a`` carries (vec, vn),
    ``b`` carries (cvec, cn) — the SQL form of the Spark operators'
    round(dot / (vn·cn), 6). One definition for every centroid oracle."""
    return (
        f"round(list_sum(list_transform(list_zip({a}.vec, {b}.cvec),"
        f" p -> p[1] * p[2])) / ({a}.vn * {b}.cn), 6)"
    )


def _quantized_mean_sql() -> str:
    """DuckDB form of ``operators.similarity._quantized_component_means``
    over (.., dim, val) rows: integer-quantized exact sums, quotient
    re-quantized via floor(x + 0.5) — floor evaluates on the identical
    IEEE quotient in both engines, where round(x, 6) diverges at
    representable 7th-decimal half-ties."""
    return (
        f"CAST(CAST(floor(CAST(sum(CAST(floor(val * {_LC_S} + 0.5) AS BIGINT))"
        f" AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS DOUBLE) / {_LC_S}"
    )
# decontamination: every 20th doc plays the benchmark set; ≥3 shared
# trigrams flags a train doc as contaminated (real runs: 8..13-grams)
DECON_MOD = 20
DECON_MIN_SHARED = 3
# incremental ingest: every 10th doc plays "today's batch", the rest the corpus
INCR_MOD = 10

# one scratch catalog root per (index, sf input) per process: the
# index-backed registry queries rebuild their tables on every call
# (bench warmup + reps, driver re-runs) — rebuilding into the SAME root
# overwrites in place (put_bucketed re-points the session entry cleanly),
# so repeated invocations keep ONE corpus-sized copy on disk instead of
# leaking a fresh mkdtemp per run
_IDX_ROOTS: dict[tuple[str, str], str] = {}


def _idx_root(prefix: str, sf_dir: str) -> str:
    import tempfile

    key = (prefix, sf_dir)
    if key not in _IDX_ROOTS:
        _IDX_ROOTS[key] = tempfile.mkdtemp(prefix=prefix)
    return _IDX_ROOTS[key]
# hot-bucket / posting-list skew cap, shared by the Spark queries AND the
# oracle SQL (an oracle hardcoding what the query takes as a parameter is
# the silent-divergence class flagged in round 3's advice)
SKEW_CAP = 1000


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


def q_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "doc_id", "text")
    return lsh_band_buckets(sig)


def q_minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dup_pairs(
        docs, "doc_id", "text", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters: connected components over the MinHash
    near-dup pair graph (operators/graph.py). Every document labelled
    with the min doc_id of its duplicate cluster; singletons label
    themselves. Oracle = recursive-CTE transitive closure over the same
    pair set."""
    from .operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dup_pairs(
        docs, "doc_id", "text", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    verts = docs.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(verts, edges)
    return cc.select(F.col("id").alias("doc_id"), F.col("component").alias("group_id"))


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster resolution (``keep_best_exemplars``): the
    same MinHash-CC clusters as ``dedup_groups``, but each cluster keeps
    its LONGEST member (exact token count; ties → min doc_id) instead of
    the min-id convention — the keep-the-most-complete-variant policy of
    a real pretraining dedup pass. The oracle reuses the shared
    transitive-closure CTE and re-derives the argmax with the same
    (score desc, doc_id) order."""
    from .functions.text import token_count
    from .operators.dedup import keep_best_exemplars

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dup_pairs(
        docs, "doc_id", "text", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    return keep_best_exemplars(docs, pairs, token_count("text")).orderBy(
        "doc_id"
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply named Gopher-style quality rules and report the per-language
    keep/drop breakdown — the filter-application analog of dedup_prune.
    Rules (all must pass, ``functions.text.gopher_rule_flags`` — the same
    flags the composed pretraining pipeline filters on): min token
    count, mean word length in [3, 10] (as ``lo·n ≤ chars ≤ hi·n`` —
    integer exact), ≥1 stopword, punctuation ≤ 1/10 of characters. All
    scan-local expressions; ONE language-sized groupBy."""
    from .functions.text import gopher_rule_flags

    docs = load_table(spark, sf_dir, "documents")
    flagged = gopher_rule_flags(docs.select("lang", "text"))

    def fails(c: str):
        return F.sum(F.when(F.col(c), 0).otherwise(1)).cast("bigint")

    return flagged.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("p_all").cast("int")).cast("bigint").alias("n_pass"),
        fails("p_minlen").alias("fail_minlen"),
        fails("p_toklen").alias("fail_toklen"),
        fails("p_stopword").alias("fail_stopword"),
        fails("p_symbol").alias("fail_symbol"),
    )


def _qf_counts_sql(cols: str) -> str:
    """Inner SELECT computing the quality-rule count columns over
    ``documents`` — shared by quality_filter_oracle and the composed
    pretraining-pipeline oracle (one definition of the rules)."""
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""SELECT {cols},
                   CAST(len({_TOK}) AS BIGINT) AS n_tok,
                   CAST(length(array_to_string({_TOK}, '')) AS BIGINT) AS tok_chars,
                   CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT) AS n_punct,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(list_filter({_TOK},
                        t -> list_contains({stop_list}, t))) AS BIGINT) AS n_stop
            FROM documents"""


def _qf_flags_sql() -> str:
    from .functions.text import (
        GOPHER_MIN_TOKENS,
        GOPHER_SYMBOL_DENOM,
        GOPHER_TOKLEN_HI,
        GOPHER_TOKLEN_LO,
    )

    return f"""(n_tok >= {GOPHER_MIN_TOKENS}) AS p_minlen,
                   ({GOPHER_TOKLEN_LO} * n_tok <= tok_chars
                    AND tok_chars <= {GOPHER_TOKLEN_HI} * n_tok) AS p_toklen,
                   (n_stop >= 1) AS p_stop,
                   ({GOPHER_SYMBOL_DENOM} * n_punct <= n_chars) AS p_sym"""


def _qf_pass_where() -> str:
    """The all-rules-pass predicate over _qf_counts_sql's columns."""
    from .functions.text import (
        GOPHER_MIN_TOKENS,
        GOPHER_SYMBOL_DENOM,
        GOPHER_TOKLEN_HI,
        GOPHER_TOKLEN_LO,
    )

    return (
        f"n_tok >= {GOPHER_MIN_TOKENS}"
        f" AND {GOPHER_TOKLEN_LO} * n_tok <= tok_chars"
        f" AND tok_chars <= {GOPHER_TOKLEN_HI} * n_tok"
        f" AND n_stop >= 1"
        f" AND {GOPHER_SYMBOL_DENOM} * n_punct <= n_chars"
    )


def quality_filter_oracle() -> str:
    return f"""
        WITH base AS ({_qf_counts_sql("lang")}),
        flags AS (
            SELECT lang,
                   {_qf_flags_sql()}
            FROM base)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN p_minlen AND p_toklen AND p_stop AND p_sym
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(sum(CASE WHEN p_minlen THEN 0 ELSE 1 END) AS BIGINT) AS fail_minlen,
               CAST(sum(CASE WHEN p_toklen THEN 0 ELSE 1 END) AS BIGINT) AS fail_toklen,
               CAST(sum(CASE WHEN p_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stopword,
               CAST(sum(CASE WHEN p_sym THEN 0 ELSE 1 END) AS BIGINT) AS fail_symbol
        FROM flags GROUP BY lang
    """


def q_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the near-dup clusters: keep ONE representative per cluster
    (the min-label component id labels itself, so survivor ⇔ id ==
    component) and report the pruned corpus per language. The "write the
    deduplicated corpus" step, end to end: pairs → components → prune →
    per-lang summary. The survivor filter is a per-row comparison on the
    component frame; both aggregates are language-sized. Delegates to
    pipelines.neardup_prune_summary (which also takes a precomputed pair
    set when several consumers run as a suite — here it recomputes, the
    honest per-query price the oracle twins)."""
    from .pipelines import neardup_prune_summary

    docs = load_table(spark, sf_dir, "documents")
    return neardup_prune_summary(
        docs, threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: which sources copy from which.
    The MinHash-LSH near-dup pairs (same parameter instance as
    ``minhash_dup_pairs``) are labelled with each side's ``source`` tag
    and rolled up to unordered (source_a ≤ source_b) cells — the curation
    signal behind source-priority dedup (e.g. "drop the crawl copy, keep
    the curated one") and dataset-overlap audits.

    Scale shape: pair volume ∝ duplicate rate (bucketed LSH, never
    |docs|²); the source lookup joins a 2-column projection of the
    corpus onto the pair ids; the output is ≤ |sources|² rows. The cell
    statistic is ``max(jaccard)`` (+ count), NOT avg — a double max is
    partition-order-independent, so the matrix is bit-stable at any
    parallelism (an avg over doubles is not associative-safe; and
    max_jaccard stays unrounded like the pair queries — the doubles are
    identical per pair on both engines, while a round(x, 6) could
    diverge at 7th-decimal half-ties). Delegates to
    pipelines.source_overlap_matrix (suite form shares one pair set)."""
    from .pipelines import source_overlap_matrix

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(
        docs, threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )


def q_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid confusion matrix over the labelled embeddings
    (operators/similarity.py::nearest_centroid_confusion): per-label
    bit-stable centroids, broadcast assignment, |labels|²-bounded
    output. The embedding-space label-quality report."""
    from .operators.similarity import nearest_centroid_confusion

    emb = load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_confusion(emb)


def q_ivf_refined_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means refinement of the IVF coarse quantizer
    (operators/similarity.py::kmeans_refine) as an oracle-checked query:
    the ITERATIVE-algorithm twin — the DuckDB oracle unrolls the same
    ``IVF_REFINE_ITERS`` assignment + quantized-mean rounds in SQL, so
    every Lloyd round is verified bit-for-bit, not just the final shape.
    Centroid components are emitted integer-quantized at 6 decimals
    (CSV) — the exact integers both engines agree on, sidestepping
    float-array rendering."""
    from .operators.similarity import kmeans_refine

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_refine(emb, n_centroids=IVF_REFINE_K, iters=IVF_REFINE_ITERS)
    return cents.select(
        "centroid_id",
        F.array_join(
            F.transform(
                "cvec",
                lambda m: F.floor(m * F.lit(float(LC_SCALE)) + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("cvec_q6_csv"),
        F.round("cn", 6).alias("cn"),
    )


def q_ivf_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-search: the k-means-refined quantizer feeding the IVF
    top-k search — the production ANN pipeline end to end, oracle-checked
    through every Lloyd round AND the probe/rescore/rank funnel."""
    from .operators.similarity import kmeans_refine

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_refine(emb, n_centroids=IVF_REFINE_K, iters=IVF_REFINE_ITERS)
    return cosine_topk_ivf(
        emb, SIM_QUERY_IDS, k=SIM_K, nprobe=SIM_IVF_NPROBE, centroids=cents
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.py::semdedup_prune): semantic
    dedup over the embeddings table — the k-means-refined quantizer
    clusters the space, then within-cluster pairwise cosine prunes
    near-duplicates (exemplar = smallest same-cluster id above
    SEMDEDUP_TAU). CAPACITY-SIZED since r11 (``n_centroids=None`` →
    ``ivf_capacity``'s √N rule): the fixed-K form's N²/K within-cluster
    volume is the measured DNF-at-100× class (SCALE.md, r10 second
    decade), so the REGISTERED row runs the sizing that survives scale.
    The oracle unrolls the same Lloyd rounds in SQL (shared
    ``_kmeans_ctes``) with the SAME √N recomputed as a LIMIT expression
    (``SEMDEDUP_CAPACITY_K_SQL``) and replays the assignment +
    self-join, so cluster-then-prune AND the auto-sizing are verified
    bit-for-bit."""
    from .operators.similarity import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    out = semdedup_prune(
        emb,
        n_centroids=None,
        iters=SEMDEDUP_ITERS,
        tau=SEMDEDUP_TAU,
    )
    return out.orderBy("vec_id")


def q_semdedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE SemDeDup (``similarity.py::semdedup_keep_best``):
    the batch semantic form of the keep-best family, completing its
    symmetry across all three dedup tiers (lexical batch + both standing
    indexes shipped r9/r10). Same quantizer and within-cluster pair
    graph as ``semdedup_prune``, but each tau-pair's LOWER-quality side
    is pruned (q = n_chars joined from documents; ties break to the
    smaller id) and ``kept_id`` is the (q, -id)-max dominator.
    CAPACITY-SIZED since r11, like its min-id twin (√N centroids via
    ``n_centroids=None``; the oracle recomputes the same √N as a LIMIT
    expression). The oracle replays the unrolled-Lloyd assignment, the
    quality join, the pair dominance CASE, and the argmax — a min-id
    prune in disguise keeps different exemplars and cannot hash-match."""
    from .operators.similarity import semdedup_keep_best

    emb = load_table(spark, sf_dir, "embeddings")
    qual = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("q")
    )
    out = semdedup_keep_best(
        emb,
        qual,
        n_centroids=None,
        iters=SEMDEDUP_ITERS,
        tau=SEMDEDUP_TAU,
    )
    return out.orderBy("vec_id")


def q_simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text")


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_dup_pairs(docs, "doc_id", "text")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD,
        max_bucket=SKEW_CAP,
    )


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, SIM_QUERY_IDS, k=SIM_K)


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank
    (``operators.similarity.mmr_rerank``): diversity-aware selection of
    MMR_K docs from each query's MMR_POOL-deep cosine candidate pool —
    lam·qsim − (1−lam)·max-sim-to-selected, greedy, unrolled into k
    tiny JVM stages over queries × pool rows (the corpus is touched
    once, by the pool retrieval). The oracle unrolls the SAME k greedy
    steps as CTEs — remaining-set anti-join, pairwise-penalty max,
    (mmr DESC, id) argmax per step — so a plain top-k in disguise, a
    wrong tie-break, or an un-penalized step cannot hash-match."""
    from .operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(emb, SIM_QUERY_IDS, k=MMR_K, pool=MMR_POOL, lam=MMR_LAM)
    return out.orderBy("query_id", "mmr_rank")


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact tier; the LSH tier is the
    scale path, tested separately)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, threshold=EMB_NEARDUP_THRESHOLD)


def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-k — the scale path for similarity search.
    Approximate in *recall*, deterministic in *computation* (id-ordered
    centroids, 6-decimal-rounded sims, id tiebreaks), so it carries a
    full DuckDB oracle (``similarity_topk_ivf_oracle``) on top of the
    recall gate against the exact tier (tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        emb,
        SIM_QUERY_IDS,
        k=SIM_K,
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    )


def q_similarity_topk_ivf_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION IVF path (operators.similarity.IvfIndex): the same
    quantizer/probe/rescore math as ``similarity_topk_ivf``, but
    centroids, assignments, and normed vectors are catalog-persisted —
    assignments bucketed on centroid_id, vectors on id, so a search
    never re-assigns or re-norms (or shuffles) the corpus. Shares the
    recompute path's oracle: the index tables are materialized
    intermediates of identical math."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    cat = Catalog(spark, _idx_root("ivf_idx_reg_", sf_dir))
    idx = IvfIndex(
        cat,
        "ivf_idx_reg",
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    )
    idx.build(emb)
    return idx.search_ids(SIM_QUERY_IDS, k=SIM_K)


def q_embedding_neardup_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC near-dup check against the standing IVF index
    (operators.similarity.IvfIndex.neardup_check) — the embedding-space
    twin of ``incremental_neardup_idx``: the same 1-in-10 batch/corpus
    split, the corpus held as the catalog-persisted bucketed index
    (centroids broadcast, cluster posting lists read pre-partitioned, the
    batch side broadcast into them), each batch vector compared against
    ONLY its nearest cluster's members. The oracle recomputes the
    seed-centroid assignment + within-cluster compare in SQL — the index
    tables are materialized intermediates of identical math."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % INCR_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("semdup_idx_reg_", sf_dir))
    idx = IvfIndex(cat, "semdup_idx_reg", n_centroids=SEMDEDUP_K)
    idx.build(corpus)
    return idx.neardup_check(new, SEMDEDUP_TAU).orderBy("vec_id")


def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHP-LSH ANN tier (the other scale path besides IVF): candidates
    from signature hamming balls, exact rescoring on candidates only.
    The md5-derived hyperplanes make the whole pipeline deterministic, so
    it carries a full DuckDB oracle (``similarity_topk_lsh_oracle``) on
    top of the recall gate against the exact tier."""
    from .operators.similarity import cosine_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb,
        SIM_QUERY_IDS,
        k=SIM_K,
        planes=SIM_LSH_PLANES,
        max_band_hamming=SIM_LSH_HAMMING,
    )


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup through RHP-LSH candidate buckets (the scale
    path twin of ``embedding_neardup``). Deterministic buckets + rounded
    scores ⇒ fully oracle-checked (``embedding_neardup_lsh_oracle``);
    recall against the exact pair set is gated separately in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(
        emb,
        threshold=EMB_NEARDUP_THRESHOLD,
        use_lsh=True,
        planes=SIM_LSH_PLANES,
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators per document: whitespace, word-regex,
    BPE-ish — the standard corpus-costing triple."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws("text").alias("n_ws"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\w+"), F.lit(0)))
        .cast("bigint")
        .alias("n_word"),
        token_count_bpe("text").alias("n_bpe"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs, "text").select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        "n_punct",
        "n_stopwords",
        "punct_ratio",
        "stopword_ratio",
        "avg_token_len",
        "quality",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lang_id(docs, "text").select(
        "doc_id", "hits_en", "hits_es", "hits_fr", "lang_pred"
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "text/plain")
    return media.select(
        "doc_id",
        "media_type",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.content_md5").alias("content_md5"),
    )


def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window rollup executed through STRUCTURED STREAMING
    (availableNow drain of the events table as a file stream) — its
    oracle is the same batch SQL as ``events_windowed``, so this checks
    streaming semantics against an independent batch engine."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now, windowed_rollup

    ev = _events_stream(spark, sf_dir)
    sink = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    return run_available_now(
        windowed_rollup(ev), sink, tempfile.mkdtemp(), output_mode="complete"
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode path end-to-end through ``mapInPandas``: binary
    payloads → (width, height, channels, feature vector). The decoder is
    the DETERMINISTIC md5-derived fake (multimodal._fake_dims) so the
    oracle can recompute the identical values — proving the Arrow batch
    plumbing, schema, and per-row transform, not the codec."""
    from .multimodal import decode_image_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "image/fake")
    feats = decode_image_features(media)
    # the feature vector is projected to scalar doubles f0..f3: the
    # correctness harness canonicalizes rows via pandas sort/hash, which
    # cannot hash array cells — scalars compare exactly on both engines
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.col("feature")[0].alias("f0"),
        F.col("feature")[1].alias("f1"),
        F.col("feature")[2].alias("f2"),
        F.col("feature")[3].alias("f3"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio decode path through ``mapInPandas`` (md5-derived
    deterministic fake; real impl = soundfile/ffmpeg in the same body):
    binary payloads → (sample_rate, n_samples, rms)."""
    from .multimodal import decode_audio_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "audio/fake")
    return decode_audio_features(media)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal UDTF shape: 1..3 sampled frames per payload (0..n rows
    per input row through ``mapInPandas``), frame = leading 8 payload
    bytes in the fake."""
    from .multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "video/fake")
    frames = sample_frames(media, every_n=10)
    # binary frame bytes → hex string: the harness canonicalizer cannot
    # hash bytearray cells; hex() is uppercase in both Spark and DuckDB
    return frames.select(
        "doc_id", "frame_idx", F.hex(F.col("frame")).alias("frame_hex")
    )


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize path through ``mapInPandas``: aspect-fit to a
    64×64 box with exact integer math (oracle-recomputable), fake
    re-encoded payload projected to hex for the canonicalizer."""
    from .multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", "image/fake")
    out = resize_images(media, target=64)
    return out.select(
        "doc_id", "out_w", "out_h", F.hex(F.col("resized")).alias("resized_hex")
    )


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (operators.dedup.incremental_neardup_pairs):
    every 10th document plays the newly-arrived batch, matched against
    the rest as the standing corpus — per-ingest cost ∝ |new|, the corpus
    is never self-joined."""
    from .operators.dedup import incremental_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    return incremental_neardup_pairs(
        new, corpus, "doc_id", "text", threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
    )


def q_incremental_neardup_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION incremental-check path (operators.dedup.NearDupIndex):
    the same 1-in-10 batch/corpus split as ``incremental_neardup``, but
    the corpus side is a catalog-persisted BUCKETED index — built once
    here, then ``check()`` scans it as pre-partitioned hashed-int parquet
    with no Exchange above any corpus scan (plan-pinned in
    tests/test_dedup.py); only the batch is tokenized and shuffled. The
    oracle is byte-identical to ``incremental_neardup``'s: the index
    tables are just materialized intermediates of the same math, so this
    driver row verifies the production storage path end to end."""
    from .catalog import Catalog
    from .operators.dedup import NearDupIndex

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("neardup_idx_reg_", sf_dir))
    idx = NearDupIndex(
        cat,
        "neardup_idx_reg",
        threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
    )
    idx.build(corpus)
    return idx.check(new)


def q_lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH posting-list health report (``NearDupIndex.bucket_stats``) —
    the lexical twin of ``ivf_cluster_skew``: per band, bucket count,
    row mass, the hottest bucket, and how much mass the query-time
    ``max_bucket`` cap excludes (the re-shingle / re-band signal).
    Shares ``incremental_neardup_idx``'s index root and build. The
    oracle recomputes the MinHash band buckets over the same corpus
    split and the per-band aggregation."""
    from .catalog import Catalog
    from .operators.dedup import NearDupIndex

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("neardup_idx_reg_", sf_dir))
    idx = NearDupIndex(
        cat,
        "neardup_idx_reg",
        threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
    )
    idx.build(corpus)
    return idx.bucket_stats().orderBy("band_idx")


def lsh_bucket_skew_oracle() -> str:
    """DuckDB twin of :func:`q_lsh_bucket_skew`: the shared shingle/
    signature/band CTEs over the corpus split, per-bucket sizes, the
    per-band rollup with the same over-cap arithmetic."""
    src = f"(SELECT doc_id, text FROM documents WHERE doc_id % {INCR_MOD} != 0)"
    return f"""
        WITH {_shingle_cte(src)}, {_minhash_sig_sql()}, {_band_sql()},
        sizes AS (
            SELECT band_idx, band_hash, CAST(count(*) AS BIGINT) AS bsz
            FROM buckets GROUP BY 1, 2)
        SELECT CAST(band_idx AS INT) AS band_idx,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(bsz) AS BIGINT) AS n_rows,
               CAST(max(bsz) AS BIGINT) AS max_bucket,
               CAST(sum(CASE WHEN bsz > {SKEW_CAP} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over_cap,
               CAST(sum(CASE WHEN bsz > {SKEW_CAP} THEN bsz ELSE 0 END)
                    AS BIGINT) AS capped_rows
        FROM sizes GROUP BY band_idx
    """


BM25_QUERIES = [
    (1, ["hash", "join"]),
    (2, ["sort", "merge", "scan"]),
    (3, ["column", "filter"]),
]
BM25_K = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (operators/retrieval.py): top-k documents
    per query over the shared tokenizer, posting lists filtered at the
    scan, per-term contributions integer-quantized before the per-query
    sum (order-independent), Lucene-style idf. The corpus-audit /
    hard-negative-mining workhorse of a training-data pipeline."""
    from .operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=BM25_K)


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (functions.text.redact_pii): per doc, the count
    of redacted emails/phones and the md5 of the scrubbed text — pure
    Catalyst regexp_replace, scan-local, zero UDF. The oracle re-runs the
    identical patterns in DuckDB, so the replacement semantics (not just
    the counts) are hash-checked."""
    from .functions.text import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    n_emails, n_phones = pii_counts("text")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redact_pii("text")).alias("clean_md5"),
    )


def _sized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_tokens) — the packing input frame. Uses the
    single shared token counter so the packing tier can never diverge
    from the other token-count consumers (or its oracle's ``\\w+``)."""
    from .functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", token_count("text").alias("n_tokens"))


def q_chunk_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing — the standard pretraining layout:
    per language, documents are laid head-to-tail in doc_id order and cut
    into fixed 512-token context windows; each doc gets the window index
    where it starts and its offset inside it (operators.packing, single-
    window oracle tier; ``chunk_assignment_sharded`` is the scale tier)."""
    from .operators.packing import chunk_assignment

    return chunk_assignment(_sized_docs(spark, sf_dir))


def q_chunk_assignment_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``chunk_assignment``: range-sharded two-level
    prefix sum (bounded per-(lang, shard) sorts + broadcast cumulative
    shard offsets) with BIT-IDENTICAL output — so the single-window SQL
    remains its oracle twin. span=100 ⇒ ≥5 shards at sf0.01, exercising
    real cross-shard offsets at test scale."""
    from .operators.packing import chunk_assignment_sharded

    return chunk_assignment_sharded(_sized_docs(spark, sf_dir), span=100)


# target language mixture for q_mixture_weights — a training-run config
# constant, inlined into the oracle SQL so both sides price the same mix
TARGET_MIX = {"en": 0.30, "es": 0.20, "fr": 0.20, "de": 0.15, "zh": 0.15}


def _longest_run(sorted_arr) -> "F.Column":
    """Max multiplicity of any element of a SORTED array — the mode
    count — as a left-to-right ``aggregate`` fold (scan-local, no
    explode, no shuffle): track (prev, current run, best run)."""

    def step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )
    return F.aggregate(sorted_arr, init, step)["best"]


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition quality signals: the
    duplicate-trigram fraction (array_distinct over the gram array) and
    the top-bigram mass fraction (mode of the bag = longest equal run of
    the doc-locally sorted gram array, folded with ``aggregate``).

    ENTIRELY scan-local: no explode, no groupBy, no join — zero shuffle
    at any corpus size (plan-pinned). The earlier explode → two-groupBy
    form shuffled every bigram STRING of the corpus to compute a per-doc
    mode; the sorted-run fold does O(n log n) work per doc inside
    WholeStageCodegen instead. Repetitious machine-generated text scores
    high on both signals; the standard pre-training filter thresholds
    them. Tokens and gram arrays are projected ONCE per stage — the
    naive inline form re-evaluates the tokenizer regex inside every
    element_at (O(tokens²) regex work, measured 12× slower)."""
    from .operators.dedup import gram_array
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", tokenize("text").alias("t")
    ).select(
        "doc_id",
        gram_array(F.col("t"), 3).alias("g3"),
        F.array_sort(gram_array(F.col("t"), 2)).alias("g2s"),
    )
    g3, g2s = F.col("g3"), F.col("g2s")
    n2 = F.size(g2s).cast("bigint")
    return grams.select(
        "doc_id",
        F.size(g3).cast("bigint").alias("n_3grams"),
        F.when(
            F.size(g3) > 0,
            (F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
        n2.alias("n_2grams"),
        F.when(n2 > 0, _longest_run(g2s) / n2)
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
    )


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per language, the sampling rate that
    moves the corpus from its natural language distribution to the
    TARGET_MIX a training run wants (rate = min(1, target·N / n_lang)).
    One tiny groupBy + a broadcast scalar total — the output is
    |languages| rows regardless of corpus size; the rates then drive the
    deterministic sampler (operators.sampling) over the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = docs.agg(F.count("*").alias("n_total"))
    target = F.create_map(
        *[F.lit(x) for kv in TARGET_MIX.items() for x in kv]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("target_share", F.coalesce(target[F.col("lang")], F.lit(0.0)))
        .select(
            "lang",
            "n_docs",
            (F.col("n_docs") / F.col("n_total")).alias("natural_share"),
            "target_share",
            F.least(
                F.lit(1.0),
                F.col("target_share") * F.col("n_total") / F.col("n_docs"),
            ).alias("sample_rate"),
        )
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    4× storage/bandwidth cut before ANN serving. Per vector: scale =
    max|x|/127, q_i = floor(x_i/scale + 0.5) (floor-shift, NOT round():
    IEEE-exact and engine-agnostic, where round()'s half-way rule
    differs between engines). Scan-local, zero shuffle, no UDF; the
    int array is emitted as CSV so the driver canonicalizer can hash it.
    Zero vectors quantize to all-zero with scale 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = (
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale")
    emb2 = emb.select(F.col("vec_id"), v.alias("v"), scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
        ),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0).cast("bigint")))
    return emb2.select(
        "vec_id",
        "scale",
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q_csv"),
    )


# train/val/test fractions for q_corpus_splits (cumulative-threshold
# order matters and is shared with the oracle builder)
SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def q_corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment per document
    (operators.sampling.split_assign): one engine-stable md5 bucket per
    doc_id, cumulative-threshold CASE at the scan — zero shuffle, and
    growing the corpus never reassigns existing docs (frozen eval sets)."""
    from .operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs, "doc_id", SPLIT_FRACTIONS).select("doc_id", "split")


def corpus_splits_oracle() -> str:
    from .functions.hashes import duckdb_md5_long60

    bucket = f"{duckdb_md5_long60('CAST(doc_id AS VARCHAR)')} % 10000"
    items = list(SPLIT_FRACTIONS.items())
    acc, whens = 0.0, []
    for label, frac in items[:-1]:
        acc += frac
        whens.append(f"WHEN {bucket} < {int(round(acc * 10000))} THEN '{label}'")
    return f"""
        SELECT doc_id,
               CASE {' '.join(whens)} ELSE '{items[-1][0]}' END AS split
        FROM documents
    """


SPAN_TOKENS = 8  # short synthetic docs; Lee et al. use ~50 on real corpora
BPE_TOP_PAIRS = 50


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (operators/spans.py): every document
    cut into non-overlapping SPAN_TOKENS-token blocks, only the
    corpus-wide first occurrence of each distinct block survives, docs
    reassembled from survivors. Two bounded-agg shuffles (span hash, doc
    id) — the Spark-shaped form of Lee et al.'s ExactSubstr dedup."""
    from .operators.spans import span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(docs, "doc_id", "text", SPAN_TOKENS)


def span_dedup_oracle(span_tokens: int = SPAN_TOKENS) -> str:
    from .functions.hashes import duckdb_md5_long60

    w = span_tokens
    h = duckdb_md5_long60("span_text")
    return rf"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        ),
        spans AS (
            SELECT doc_id, t,
                   unnest(range(CAST((len(t) + {w - 1}) // {w} AS BIGINT))) AS pos
            FROM toks
        ),
        st AS (
            SELECT doc_id, pos,
                   array_to_string(t[pos * {w} + 1 : (pos + 1) * {w}], ' ') AS span_text
            FROM spans
        ),
        flagged AS (
            SELECT doc_id, pos, span_text,
                   CASE WHEN row_number() OVER (
                       PARTITION BY {h} ORDER BY doc_id, pos) = 1
                   THEN 1 ELSE 0 END AS keep
            FROM st
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(keep) AS BIGINT) AS kept_spans,
                   md5(coalesce(string_agg(span_text, ' ' ORDER BY pos)
                                FILTER (WHERE keep = 1), '')) AS clean_md5
            FROM flagged GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_spans, 0) AS n_spans,
               coalesce(a.kept_spans, 0) AS kept_spans,
               coalesce(a.clean_md5, md5('')) AS clean_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training corpus shuffle
    (operators/sampling.shuffle_positions): each doc's 0-based position
    in the md5-keyed pseudo-random global order, computed with the
    two-level sharded rank (bounded per-shard sorts + broadcast shard
    offsets) — never one global single-partition sort."""
    from .operators.sampling import shuffle_positions

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_positions(docs, "doc_id").select("doc_id", "shuffle_pos")


CORPUS_SHUFFLE_ORACLE = """
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
               AS BIGINT) AS shuffle_pos
    FROM documents
"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-selection step: corpus-wide adjacent token-pair
    occurrence counts (weighted by occurrences, unlike bigram_docfreq's
    doc-frequency), top candidates by (count desc, pair asc). Scan-local
    pair generation + ONE wordcount-shape shuffle (map-side partial agg)
    + TakeOrderedAndProject top-k — no global sort materializes."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array BEFORE the lambda references it:
    # element_at over a raw split(...) expression re-evaluates the split
    # per element inside the (interpreted, non-codegen) HOF lambda —
    # O(tokens²) per doc; over a bound attribute it is O(1)
    from .functions.text import ws_tokens

    with_toks = docs.select(ws_tokens("text").alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        with_toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


BPE_PAIR_COUNTS_ORACLE = rf"""
    WITH toks AS (
        SELECT regexp_extract_all(text, '\S+') AS t FROM documents
    ),
    pairs AS (
        SELECT t[i] || ' ' || t[i + 1] AS pair
        FROM (SELECT t, unnest(range(1, CAST(len(t) AS BIGINT))) AS i FROM toks)
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT {BPE_TOP_PAIRS}
"""


BPE_MERGES = 8  # enough rounds that later merges build on earlier ones


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE merge training (operators/bpe.py): the full
    merge-selection loop — count adjacent pairs, take the best, greedily
    re-encode the word-frequency table, repeat — not just one candidate
    round. The oracle unrolls every round in SQL (the kmeans_refine
    pattern), so each learned merge and its weighted count is verified
    bit-for-bit. One corpus pass; all rounds are vocab-sized."""
    from .operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, "text", num_merges=BPE_MERGES)


def q_bpe_word_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE training: re-encode the vocabulary with the
    full learned merge sequence and report each word's final
    segmentation + symbol count. Each distinct word is encoded once —
    tokenizing a corpus joins this table back to documents rather than
    re-folding per occurrence."""
    from .operators.bpe import bpe_train, bpe_word_segments, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", num_merges=BPE_MERGES)
    return bpe_word_segments(word_frequencies(docs, "text"), merges)


def _bpe_rounds_sql(k: int) -> str:
    """Shared oracle CTE chain: word frequencies → char segmentation →
    k unrolled (pair-count → best-pair → list_reduce greedy re-encode)
    rounds — the same fold semantics as operators/bpe.py::_merge_fold,
    comma-guarded suffix check and all."""
    parts = [
        r"""words AS (
            SELECT word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS word
                  FROM documents)
            GROUP BY word),
        seg0 AS (SELECT word, freq, array_to_string(split(word, ''), ',') AS seg
                 FROM words)"""
    ]
    for r in range(1, k + 1):
        prev = f"seg{r - 1}"
        parts.append(
            f"""pairs{r} AS (
            SELECT s[i] AS left_sym, s[i + 1] AS right_sym,
                   CAST(sum(freq) AS BIGINT) AS pair_cnt
            FROM (SELECT split(seg, ',') AS s, freq,
                         unnest(range(1, CAST(len(split(seg, ',')) AS BIGINT))) AS i
                  FROM {prev})
            GROUP BY 1, 2),
        best{r} AS (
            SELECT CAST({r} AS BIGINT) AS merge_rank, left_sym, right_sym, pair_cnt
            FROM pairs{r} ORDER BY pair_cnt DESC, left_sym, right_sym LIMIT 1),
        seg{r} AS (
            SELECT word, freq,
                   list_reduce(split(seg, ','), (acc, x) -> CASE
                       WHEN x = b.right_sym AND (acc = b.left_sym
                            OR ends_with(acc, ',' || b.left_sym))
                       THEN acc || x ELSE acc || ',' || x END) AS seg
            FROM {prev}, best{r} b)"""
        )
    return ",\n        ".join(parts)


def bpe_train_oracle(k: int = BPE_MERGES) -> str:
    union = "\n        UNION ALL\n        ".join(
        f"SELECT * FROM best{r}" for r in range(1, k + 1)
    )
    return f"WITH {_bpe_rounds_sql(k)}\n        {union}"


def bpe_word_segments_oracle(k: int = BPE_MERGES) -> str:
    return f"""WITH {_bpe_rounds_sql(k)}
        SELECT word, freq, seg,
               CAST(len(split(seg, ',')) AS BIGINT) AS n_symbols
        FROM seg{k}"""


VOCAB_SIZE = 24  # < the corpus's distinct-token count so the unk path runs


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application: encode every document against the corpus's
    own top-``VOCAB_SIZE`` token vocabulary (ids by count desc, token asc;
    out-of-vocab → unk id = VOCAB_SIZE). The dictionary step of a
    training pipeline, end to end in Catalyst:

    - vocab = wordcount-shape agg + TakeOrderedAndProject top-V, then a
      row_number over the V surviving rows (bounded by the parameter,
      never corpus-sized);
    - encoding = posexplode → **broadcast** vocab join (the dictionary
      never shuffles the token stream) → per-doc reassembly keyed by doc
      id with collect_list state bounded by document length — no
      driver-side dictionary collect at any vocab size.

    Output: (doc_id, n_tokens, n_unk, ids_md5) — ids_md5 hashes the
    comma-joined id sequence in token order, so the oracle checks the
    exact encoding, not just counts."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokenize

    exploded = docs.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "tok")
    )
    top = (
        exploded.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(VOCAB_SIZE)
    )
    vocab = top.select(
        "tok",
        (
            F.row_number().over(Window.orderBy(F.desc("cnt"), "tok")) - F.lit(1)
        ).alias("tid"),
    )
    enc = exploded.join(F.broadcast(vocab), "tok", "left").withColumn(
        "tid", F.coalesce("tid", F.lit(VOCAB_SIZE))
    )
    agg = enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("tid") == VOCAB_SIZE).cast("bigint")).alias("n_unk"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                    lambda s: s["tid"].cast("string"),
                ),
                ",",
            )
        ).alias("ids_md5"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_unk", F.lit(0)).cast("bigint").alias("n_unk"),
            F.coalesce("ids_md5", F.md5(F.lit(""))).alias("ids_md5"),
        )
    )


def vocab_encode_oracle(vocab_size: int = VOCAB_SIZE) -> str:
    return rf"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
            FROM documents
        ),
        exploded AS (
            SELECT doc_id, i AS pos, ts[i + 1] AS tok
            FROM (SELECT doc_id, ts,
                         unnest(range(CAST(len(ts) AS BIGINT))) AS i
                  FROM toks)
        ),
        top AS (
            SELECT tok, count(*) AS cnt FROM exploded GROUP BY tok
            ORDER BY cnt DESC, tok LIMIT {vocab_size}
        ),
        vocab AS (
            SELECT tok,
                   row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS tid
            FROM top
        ),
        enc AS (
            SELECT e.doc_id, e.pos, coalesce(v.tid, {vocab_size}) AS tid
            FROM exploded e LEFT JOIN vocab v USING (tok)
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN tid = {vocab_size} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unk,
                   md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos))
                       AS ids_md5
            FROM enc GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_unk, 0) AS n_unk,
               coalesce(a.ids_md5, md5('')) AS ids_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def q_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-language vocabulary size via HyperLogLog++
    (``approx_count_distinct``) — the 100 TB path for distinct counts
    (exact distinct of a trillion-token corpus is a full shuffle of every
    token; the sketch is a few KB per group, map-side merged). Registered
    WITHOUT an oracle (duckdb's approx algorithm differs); the quality
    gate is the accuracy test against the exact tier
    (tests/test_sketches.py)."""
    from .operators.aggregates import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
        ).alias("word"),
    )
    return tok.groupBy("lang").agg(
        F.approx_count_distinct("word", rsd=0.02).alias("approx_vocab"),
        F.count("*").alias("n_tokens"),
    )


def q_value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles of event value per type via the
    Greenwald-Khanna sketch (``percentile_approx``) — mergeable,
    bounded-memory, the scale twin of the exact rank-based
    ``qty_quartiles``. Rows-only check + accuracy test vs exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("q"),
    ).select(
        "event_type",
        F.col("q")[0].alias("p25"),
        F.col("q")[1].alias("p50"),
        F.col("q")[2].alias("p75"),
    )


def _events_stream(spark: SparkSession, sf_dir: str):
    """Event stream over a testdata sf dir — delegates to THE shared
    stream-source helper (streaming.events.read_events_stream), which
    probes the delivered ts dtype instead of assuming nanos."""
    from .streaming.events import read_events_stream

    return read_events_stream(spark, sf_dir, glob="events.parquet")


def q_pretraining_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pretraining prep pipeline composed end-to-end
    (pipelines.pretraining_manifest): Gopher-rule quality filter →
    MinHash-LSH near-dup prune over the survivors → deterministic
    train/val/test splits → range-sharded per-(lang, split) packing
    layout. Oracle recomposes every stage in SQL on the shared
    fragments (rule counts, recursive reach chain, split CASE, prefix
    sum), so the manifest is checked bit-for-bit end to end."""
    from .pipelines import pretraining_manifest

    docs = load_table(spark, sf_dir, "documents")
    return pretraining_manifest(
        docs,
        SPLIT_FRACTIONS,
        neardup_threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
        span=100,  # ≥5 shards at sf0.01: real cross-shard offsets at test scale
    )


def _lm_prune_ctes(src: str) -> str:
    """The CCNet LM-prune CTE chain reading corpus CTE ``src`` and
    emitting the fluent half as ``base`` — exactly
    ``perplexity_keep_ids``' math (the LM model is trained on, and
    scores, ``src`` itself)."""
    from .operators.lm import THRESH_SCALE, bigram_lm_oracle_sql

    return f"""lms AS MATERIALIZED ({bigram_lm_oracle_sql(src=src)}),
        lsc AS MATERIALIZED (
            SELECT b.doc_id, b.lang, s.n_bigrams,
                   CAST(floor(s.avg_logprob * {THRESH_SCALE} + 0.5)
                        AS BIGINT) AS qscore
            FROM {src} b JOIN lms s ON s.doc_id = b.doc_id),
        ldist AS (
            SELECT lang, qscore, CAST(count(*) AS BIGINT) AS cnt
            FROM lsc WHERE n_bigrams > 0 GROUP BY lang, qscore),
        lcum AS (
            SELECT lang, qscore, cnt,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY qscore DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
            FROM ldist),
        ltot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_scored
                 FROM ldist GROUP BY lang),
        lth AS (
            SELECT lang, max(qscore) AS t
            FROM lcum JOIN ltot USING (lang)
            WHERE cum >= (n_scored + 1) // 2
            GROUP BY lang),
        base AS MATERIALIZED (
            SELECT b.doc_id, b.lang, b.text
            FROM {src} b
            JOIN lsc ON lsc.doc_id = b.doc_id
            JOIN lth ON lth.lang = b.lang
            WHERE lsc.n_bigrams > 0 AND lsc.qscore >= lth.t),
        """


def _decon_prune_ctes(src: str) -> str:
    """The benchmark-decontamination CTE chain reading corpus CTE
    ``src`` and emitting the uncontaminated remainder as ``base1`` —
    exactly ``contaminated_train_ids``' funnel (same trigram shingles,
    posting-list cap, ≥min_shared rule as ``decontaminate_oracle``;
    renamed CTEs so they coexist with the dedup chain's tok/sh). The
    benchmark side is the raw ``doc_id % {DECON_MOD} == 0`` split, the
    registered queries' convention."""
    g = JACCARD_N
    shingle_body = f"""CASE WHEN len(t) >= {g}
                 THEN list_transform(range(1, len(t) - 1),
                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                 ELSE [array_to_string(t, ' ')] END"""
    return f"""dtok AS (SELECT doc_id, {_TOK} AS t FROM {src}),
        dsh AS (
            SELECT DISTINCT doc_id AS id, shingle FROM (
                SELECT doc_id, unnest({shingle_body}) AS shingle
                FROM dtok)),
        btok AS (SELECT doc_id, {_TOK} AS t FROM documents
                 WHERE doc_id % {DECON_MOD} = 0),
        bsh AS (
            SELECT DISTINCT doc_id AS bench_id, shingle FROM (
                SELECT doc_id, unnest({shingle_body}) AS shingle
                FROM btok)),
        dfreq AS (SELECT shingle, count(*) AS df_cnt
                  FROM dsh GROUP BY shingle),
        dtsf AS (SELECT dsh.id, dsh.shingle
                 FROM dsh JOIN dfreq USING (shingle)
                 WHERE df_cnt <= {SKEW_CAP}),
        dpair AS (
            SELECT b.bench_id, t.id AS train_id, count(*) AS shared
            FROM dtsf t JOIN bsh b USING (shingle)
            GROUP BY 1, 2 HAVING count(*) >= {DECON_MIN_SHARED}),
        base1 AS MATERIALIZED (
            SELECT b.doc_id, b.lang, b.text FROM {src} b
            WHERE NOT EXISTS (SELECT 1 FROM dpair p
                              WHERE p.train_id = b.doc_id)),
        """


def pretraining_manifest_oracle(
    sem: bool = False,
    lm: bool = False,
    decon: bool = False,
    keep_best: bool = False,
) -> str:
    """One builder for ALL manifest oracles: the lexical-only pipeline,
    (``sem=True``) the variant with the SemDeDup stage spliced between
    the survivor CTE and the packing stages, (``lm=True``) the variant
    with the CCNet-style LM prune between the quality filter and the
    lexical dedup, and (``decon=True``) the benchmark-decontamination
    stage before the LM prune — ``decon=True, lm=True, sem=True`` is
    the GRAND composition of ``pipelines.pretraining_manifest_full``.
    A single source keeps the split-bucket CASE, the token count, and
    the prefix-sum / chunk SQL provably in lockstep between the
    registered queries — the deltas are the stage CTE chains feeding
    ``base`` and/or the surv2 NOT EXISTS filter. ``keep_best=True``
    swaps the min-id cluster representative for the quality-aware
    (token-count desc, doc_id) argmax — the ``quality_aware=True``
    manifest (VERDICT r9 item 3), same exact-integer ordering as
    ``dedup_keep_best_oracle``."""
    from .functions.hashes import duckdb_md5_long60

    base_where = _qf_pass_where()
    if decon:
        # train split only: the bench docs never train
        base_where = f"{base_where} AND doc_id % {DECON_MOD} != 0"
    stage0 = "base0" if (lm or decon) else "base"
    m0 = " MATERIALIZED" if (lm or decon) else ""
    pre = f"""{stage0} AS{m0} (
            SELECT doc_id, lang, text
            FROM ({_qf_counts_sql("doc_id, lang, text")})
            WHERE {base_where}),
        """
    cur = stage0
    if decon:
        pre += _decon_prune_ctes(cur)
        cur = "base1"
    if lm:
        pre += _lm_prune_ctes(cur)
        cur = "base"
    elif decon:
        pre += "base AS (SELECT * FROM base1),\n        "
        cur = "base"
    bucket = f"{duckdb_md5_long60('CAST(doc_id AS VARCHAR)')} % 10000"
    items = list(SPLIT_FRACTIONS.items())
    acc, whens = 0.0, []
    for label, frac in items[:-1]:
        acc += frac
        whens.append(f"WHEN {bucket} < {int(round(acc * 10000))} THEN '{label}'")
    split_case = f"CASE {' '.join(whens)} ELSE '{items[-1][0]}' END"
    if sem:
        sem_ctes, sem_pruned = _semdedup_ctes(
            SEMDEDUP_K,
            SEMDEDUP_ITERS,
            SEMDEDUP_TAU,
            vsrc="(SELECT e.vec_id, e.embedding FROM embeddings e "
            "JOIN surv ON e.vec_id = surv.doc_id)",
        )
        sem_block = f"""{sem_ctes},
        surv2 AS (
            SELECT s.doc_id, s.lang, s.text
            FROM surv s
            WHERE NOT EXISTS (SELECT 1 FROM {sem_pruned} p
                              WHERE p.vec_id = s.doc_id)),
        """
        final_surv = "surv2"
    else:
        sem_block = ""
        final_surv = "surv"
    if keep_best:
        surv_cte = f"""surv AS MATERIALIZED (
            SELECT doc_id, lang, text FROM (
                SELECT b.doc_id, b.lang, b.text,
                       row_number() OVER (
                           PARTITION BY g.group_id
                           ORDER BY CAST(len({_TOK}) AS BIGINT) DESC,
                                    b.doc_id) AS rn
                FROM base b JOIN groups g USING (doc_id))
            WHERE rn = 1)"""
    else:
        surv_cte = """surv AS MATERIALIZED (
            SELECT b.doc_id, b.lang, b.text
            FROM base b JOIN groups g USING (doc_id)
            WHERE g.group_id = b.doc_id)"""
    return f"""
        {_dedup_reach_cte("base", pre)},
        {surv_cte},
        {sem_block}labeled AS (
            SELECT doc_id, lang, {split_case} AS split,
                   CAST(len({_TOK}) AS BIGINT) AS n_tokens
            FROM {final_surv}),
        s AS (
            SELECT doc_id, lang, split, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang, split ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS start
            FROM labeled)
        SELECT doc_id, lang, split, n_tokens,
               CAST(start // 512 AS BIGINT) AS chunk_id,
               CAST(start % 512 AS BIGINT) AS chunk_offset
        FROM s
    """


def q_pretraining_manifest_sem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining pipeline WITH the semantic stage: Gopher filter →
    lexical MinHash-LSH prune → SemDeDup over the survivors' embeddings
    (clusters trained on the survivor set) → splits → sharded packing.
    Lexical first, semantic second — the cheap shingle prune shrinks the
    corpus the within-cluster quadratic stage prices. The oracle splices
    the unrolled Lloyd + prune CTEs (survivor-restricted vector source)
    into the recomposed manifest SQL, so the five-stage program is checked
    bit-for-bit end to end."""
    from .pipelines import pretraining_manifest

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return pretraining_manifest(
        docs,
        SPLIT_FRACTIONS,
        neardup_threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
        span=100,
        emb=emb,
        sem_k=SEMDEDUP_K,
        sem_iters=SEMDEDUP_ITERS,
        sem_tau=SEMDEDUP_TAU,
    )


def pretraining_manifest_sem_oracle() -> str:
    """Manifest oracle + the SemDeDup CTE chain over the survivor-
    restricted embedding set (see :func:`pretraining_manifest_oracle`)."""
    return pretraining_manifest_oracle(sem=True)


def q_pretraining_manifest_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining pipeline WITH the CCNet-style LM-quality stage
    (pipelines.pretraining_manifest_lm): Gopher filter → per-language
    median perplexity prune (bigram model trained on the quality-kept
    corpus itself) → lexical MinHash-LSH prune over the fluent
    survivors → splits → sharded packing. The LM prune runs before the
    lexical prune so the dedup shuffles price only fluent documents.
    The oracle recomposes every stage — quality flags, the full bigram
    LM + median threshold, the recursive reach chain, split CASE, and
    prefix-sum packing — so the six-stage program is checked
    bit-for-bit end to end."""
    from .pipelines import pretraining_manifest_lm

    docs = load_table(spark, sf_dir, "documents")
    return pretraining_manifest_lm(
        docs,
        SPLIT_FRACTIONS,
        neardup_threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
        span=100,
    )


def pretraining_manifest_lm_oracle() -> str:
    """Manifest oracle + the LM prune CTE chain between the quality
    filter and the dedup reach (see :func:`pretraining_manifest_oracle`)."""
    return pretraining_manifest_oracle(lm=True)


def q_pretraining_manifest_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GRAND composed pipeline (pipelines.pretraining_manifest_full):
    Gopher quality filter → benchmark decontamination (the doc_id %
    DECON_MOD == 0 split plays the eval suite, as in ``decontaminate``)
    → CCNet LM-perplexity prune → lexical MinHash-LSH prune → SemDeDup
    over the survivors' embeddings → frozen splits → sharded packing —
    every quality stage this engine ships in one DataFrame program,
    with the oracle recomposing all seven stages bit-for-bit."""
    from .pipelines import pretraining_manifest_full

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    return pretraining_manifest_full(
        train,
        SPLIT_FRACTIONS,
        bench,
        decon_min_shared=DECON_MIN_SHARED,
        decon_max_bucket=SKEW_CAP,
        neardup_threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
        span=100,
        emb=emb,
        sem_k=SEMDEDUP_K,
        sem_iters=SEMDEDUP_ITERS,
        sem_tau=SEMDEDUP_TAU,
    )


def pretraining_manifest_full_oracle() -> str:
    """Manifest oracle with the decon + LM + sem chains all spliced in
    (see :func:`pretraining_manifest_oracle`)."""
    return pretraining_manifest_oracle(sem=True, lm=True, decon=True)


def q_pretraining_manifest_kb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GRAND composed pipeline with QUALITY-AWARE dedup (VERDICT r9
    item 3): identical seven-stage program to
    ``pretraining_manifest_full``, but the lexical near-dup stage keeps
    each duplicate cluster's BEST member (``keep_best_exemplars``
    scored by exact token count — the round-9 keep-best semantics
    composed into the flagship journey) instead of the min-id
    convention. The oracle recomposes all seven stages with the
    (token-count desc, doc_id) argmax swapped in at the survivor CTE —
    a min-id prune in disguise changes which documents reach the
    splits/packing stages and cannot hash-match."""
    from .pipelines import pretraining_manifest_full

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    return pretraining_manifest_full(
        train,
        SPLIT_FRACTIONS,
        bench,
        decon_min_shared=DECON_MIN_SHARED,
        decon_max_bucket=SKEW_CAP,
        neardup_threshold=MINHASH_THRESHOLD,
        max_bucket=SKEW_CAP,
        span=100,
        emb=emb,
        sem_k=SEMDEDUP_K,
        sem_iters=SEMDEDUP_ITERS,
        sem_tau=SEMDEDUP_TAU,
        quality_aware=True,
    )


def pretraining_manifest_kb_oracle() -> str:
    """The grand-composition oracle with the keep-best survivor CTE
    (see :func:`pretraining_manifest_oracle`)."""
    return pretraining_manifest_oracle(
        sem=True, lm=True, decon=True, keep_best=True
    )


def q_streaming_hourly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming: watermarked per-(user, hour) dedup
    feeding a windowed count — the streaming form of hourly distinct
    users, exercising Spark's multiple-stateful-operator pipeline
    (dedup state → window agg state in one query). State is bounded by
    the watermark on both operators: the dedup key is the EVENT-TIME
    ``window(ts, '1 hour')`` column — a plain ``date_trunc`` alias would
    not carry the watermark metadata, so dedup state would never be
    evicted in a continuous run — giving one evictable dedup entry per
    active (user, hour) and one agg row per open window. Oracle = batch
    ``count(DISTINCT user_id)`` per hour on the same table."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now

    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "2 hours")
        # project down to (user, window) BEFORE the dedup: the window
        # column must be the stream's ONLY event-time column (Spark
        # rejects two), and it is what lets both stateful operators
        # evict by watermark
        .select("user_id", F.window("ts", "1 hour").alias("hour_w"))
        .dropDuplicates(["user_id", "hour_w"])
    )
    counts = (
        deduped.groupBy(F.col("hour_w").alias("w"))
        .agg(F.count("*").alias("distinct_users"))
        .select(F.col("w.start").alias("window_start"), "distinct_users")
    )
    sink = f"stream_hourly_users_{uuid.uuid4().hex[:8]}"
    return run_available_now(
        counts, sink, tempfile.mkdtemp(), output_mode="complete"
    )


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the event stream unioned with itself
    (every event arrives twice) then ``dropDuplicates`` on event_id —
    per-type counts must equal the batch counts over the ORIGINAL table,
    proving the duplicate copies were all eliminated. In production the
    dedup state is bounded with ``dropDuplicatesWithinWatermark``; the
    unbounded form keeps the oracle comparison exact."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now

    ev = _events_stream(spark, sf_dir)
    doubled = ev.union(_events_stream(spark, sf_dir))
    counts = (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    return run_available_now(counts, sink, tempfile.mkdtemp(), output_mode="complete")


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL OPERATOR (applyInPandasWithState) oracle-checked:
    per-user gap sessionization over the event stream. The stateful fold
    emits only CLOSED sessions (each user's open tail stays in state), so
    the oracle is batch sessionization minus every user's last session."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now, sessionize

    ev = _events_stream(spark, sf_dir)
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    return run_available_now(sessionize(ev, gap_minutes=30), sink, tempfile.mkdtemp())


def q_streaming_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with the static
    customer dimension (broadcast per micro-batch), rolled up per market
    segment — oracle is the equivalent batch join."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
    counts = joined.groupBy("c_mktsegment").agg(F.count("*").alias("cnt"))
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    return run_available_now(counts, sink, tempfile.mkdtemp(), output_mode="complete")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.dedup.decontaminate_report):
    every 20th document plays the eval set; the report counts, per
    benchmark doc, the training docs sharing ≥3 trigram shingles — the
    eval-leakage check run before training. Broadcast benchmark shingles,
    single scan of the train side."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    return decontaminate_report(
        train,
        bench,
        "doc_id",
        "text",
        n=JACCARD_N,
        min_shared=DECON_MIN_SHARED,
        max_bucket=SKEW_CAP,
    )


def q_streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup through ``dropDuplicatesWithinWatermark`` — the
    PRODUCTION form: dedup state is bounded by the watermark horizon and
    evicted, instead of growing with history like plain dropDuplicates
    state (q_streaming_dedup, kept as the exact/oracle form). The 90-day
    delay exceeds the testdata's time span, so the bounded dedup is exact
    here and shares streaming_dedup's batch oracle."""
    import tempfile
    import uuid

    from .streaming.events import run_available_now

    ev = _events_stream(spark, sf_dir)
    doubled = ev.union(_events_stream(spark, sf_dir))
    counts = (
        doubled.withWatermark("ts", "90 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )
    sink = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    return run_available_now(counts, sink, tempfile.mkdtemp(), output_mode="complete")


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus-preparation pipeline (pipelines.prepare_corpus):
    quality score + language ID (fused into one scan pass by Catalyst) →
    filter → exact dedup (min-id representative) → token costing. The
    oracle recomposes every stage in SQL, so the whole chained pipeline
    is hash-checked, not just its pieces."""
    from .pipelines import prepare_corpus

    docs = load_table(spark, sf_dir, "documents")
    return prepare_corpus(docs, min_quality=0.45, langs=("en",))


def q_maple_filter_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship demo (Sdemo1: filter → per-group count →
    percent-of-total) run through the CONTRACTUAL maple/juice surface as
    a TWO-ROUND MapReduce DAG — round 1 computes per-status counts
    (map-side combined like ``Sdemo1map.py:22-25``), round 2 folds every
    partial under one key so the percent denominator is GLOBAL (the
    reference's per-reducer-percent bug, SURVEY.md §2.4 A3, fixed inside
    the same executor model). Oracle = the relational filter_group_pct
    SQL."""

    def filt_map(lines):
        counts: dict[str, int] = {}
        for line in lines:
            parts = line.split(",")
            if len(parts) >= 2 and parts[1] == "1-URGENT":
                counts[parts[0]] = counts.get(parts[0], 0) + 1
        for status, c in counts.items():
            yield (status, str(c))

    def sum_reduce(key, values):
        yield (key, str(sum(int(v) for v in values)))

    def all_map(lines):
        for line in lines:
            status, cnt = line.split(",")
            yield ("all", f"{status}:{cnt}")

    def pct_reduce(key, values):
        pairs = [(v.split(":")[0], int(v.split(":")[1])) for v in values]
        total = sum(c for _, c in pairs)
        for status, c in pairs:
            pct = c * 100.0 / total
            yield (status, f"{c}|{pct:.2f}%")

    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(",", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("value")
    )
    counts = juice(sum_reduce, maple(filt_map, lines, input_col="value"))
    count_lines = counts.select(
        F.concat_ws(",", F.col("key"), F.col("value")).alias("value")
    )
    out = juice(pct_reduce, maple(all_map, count_lines, input_col="value"))
    return out.select(
        F.col("key").alias("grp"),
        F.split(F.col("value"), r"\|").getItem(0).cast("bigint").alias("cnt"),
        F.split(F.col("value"), r"\|").getItem(1).alias("pct_str"),
    )


def q_streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (streaming.events.interval_join_streams):
    the click stream joined with the purchase stream — same user, click
    within the hour after the purchase — emitting attribution pairs.
    Watermarks on both sides bound the join state; inner-join emission is
    immediate, so the AvailableNow drain equals the batch join, which is
    exactly what the oracle computes."""
    import tempfile
    import uuid

    from .streaming.events import interval_join_streams, run_available_now

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
        )
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        key_cond=F.col("c_user") == F.col("p_user"),
        left_time="c_ts",
        right_start="p_ts",
        right_end="p_end",
    ).select("purchase_id", F.col("c_ts").alias("click_ts"))
    sink = f"stream_attr_{uuid.uuid4().hex[:8]}"
    return run_available_now(joined, sink, tempfile.mkdtemp())


def q_maple_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordcount expressed through the generic maple/juice surface; its
    oracle is plain SQL — proving the contractual (non-relational) path
    computes the relational answer."""

    def wc_map(lines):
        counts: dict[str, int] = {}
        for line in lines:
            for w in re.findall(r"\w+", line.lower()):
                counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            yield (w, str(c))

    def wc_reduce(key, values):
        yield (key, str(sum(int(v) for v in values)))

    docs = load_table(spark, sf_dir, "documents")
    kv = maple(wc_map, docs, input_col="text")
    out = juice(wc_reduce, kv)
    return out.select(
        F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt")
    )


# ---------------------------------------------------------------------------
# Oracle-SQL generators (DuckDB dialect, same algorithm parameters)
# ---------------------------------------------------------------------------

_TOK = r"regexp_extract_all(lower(text), '\w+')"

def _shingle_cte(src: str = "documents") -> str:
    """Shingle CTE chain over ``src`` (any prior CTE/table with
    (doc_id, text)) — lets the composed-pipeline oracle run the SAME
    minhash chain over a filtered subset."""
    return f"""
tok AS (SELECT doc_id, {_TOK} AS t FROM {src}),
sh AS (
    SELECT DISTINCT doc_id AS id, shingle FROM (
        SELECT doc_id, unnest(
            CASE WHEN len(t) >= {JACCARD_N}
                 THEN list_transform(range(1, len(t) - 1),
                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                 ELSE [array_to_string(t, ' ')] END) AS shingle
        FROM tok))
"""


_SHINGLE_CTE = _shingle_cte()


def _hashed_shingle_cte() -> str:
    """DuckDB twin of operators.dedup.hashed_shingles (distinct (id, h))."""
    from .functions.hashes import duckdb_md5_long60

    return f"hsh AS (SELECT DISTINCT id, {duckdb_md5_long60('shingle')} AS h FROM sh)"


def _sig_select_sql(src: str, num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    from .functions.hashes import duckdb_minhash_mix

    mins = ",\n           ".join(
        f"min({duckdb_minhash_mix('h', i)}) AS mh_{i}" for i in range(num_hashes)
    )
    return f"SELECT id, {mins} FROM {src} GROUP BY id"


def _minhash_sig_sql(num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    return (
        f"{_hashed_shingle_cte()},\n"
        f"        sig AS ({_sig_select_sql('hsh', num_hashes)})"
    )


def _band_select_sql(
    src: str = "sig",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> str:
    rows = num_hashes // bands
    pieces = []
    for b in range(bands):
        cols = ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        pieces.append(
            f"SELECT id, {b} AS band_idx, md5(concat_ws('|', {cols})) AS band_hash FROM {src}"
        )
    return " UNION ALL ".join(pieces)


def _band_sql(num_hashes: int = DEFAULT_NUM_HASHES, bands: int = DEFAULT_BANDS) -> str:
    return "buckets AS (" + _band_select_sql("sig", num_hashes, bands) + ")"


def minhash_buckets_oracle() -> str:
    return f"""
        WITH {_SHINGLE_CTE}, {_minhash_sig_sql()}, {_band_sql()}
        SELECT id, CAST(band_idx AS INT) AS band_idx, band_hash FROM buckets
    """


def minhash_pairs_oracle() -> str:
    """Twin of ``minhash_dup_pairs`` incl. the hot-bucket cap: buckets
    over ``SKEW_CAP`` members are dropped from candidate generation (the
    Jaccard verify still runs on the uncapped shingle sets, exactly like
    the Spark operator)."""
    return f"""
        WITH {_SHINGLE_CTE}, {_minhash_sig_sql()}, {_band_sql()},
        bksz AS (SELECT band_idx, band_hash, count(*) AS n
                 FROM buckets GROUP BY 1, 2),
        bk AS (SELECT b.* FROM buckets b JOIN bksz USING (band_idx, band_hash)
               WHERE bksz.n <= {SKEW_CAP}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bk a JOIN bk b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.id < b.id),
        sz AS (SELECT id, count(*) AS sz FROM hsh GROUP BY id),
        inter AS (
            SELECT c.id_a, c.id_b, count(*) AS inter_cnt
            FROM cand c
            JOIN hsh x ON x.id = c.id_a
            JOIN hsh y ON y.id = c.id_b AND y.h = x.h
            GROUP BY c.id_a, c.id_b)
        SELECT i.id_a, i.id_b,
               i.inter_cnt * 1.0 / (a.sz + b.sz - i.inter_cnt) AS jaccard
        FROM inter i JOIN sz a ON i.id_a = a.id JOIN sz b ON i.id_b = b.id
        WHERE i.inter_cnt * 1.0 / (a.sz + b.sz - i.inter_cnt) >= {MINHASH_THRESHOLD}
    """


def _kmeans_ctes(k: int | str, iters: int, vsrc: str = "embeddings") -> tuple[str, str]:
    """The unrolled Lloyd chain as DuckDB CTEs: one (assignment,
    quantized-mean, empty-cluster-keep) block per round, generated from
    the same parameters the Spark queries pass. Same rounded-cosine
    assignment (centroid_id tiebreak), same floor(x·1e6 + 0.5)
    integer-quantized exact component means as ``kmeans_refine``.
    Returns (joined_cte_sql, final_centroid_cte_name); the ``v`` CTE
    (vec_id, vec, vn) is included, reading from ``vsrc`` (a table name
    or parenthesized subquery exposing vec_id + embedding — the composed
    pipeline oracle passes the survivor-restricted embedding set)."""
    sim = _carried_cos_sql("v", "c")
    # MATERIALIZED: v is referenced by every unrolled round; DuckDB
    # inlines plain CTEs, which re-evaluates vsrc per reference — fatal
    # when vsrc embeds the recursive dedup chain (composed pipeline)
    ctes = [
        f"""v AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                   sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                x -> x * x))) AS vn
            FROM {vsrc})""",
        f"""cent0 AS (
            SELECT vec_id AS centroid_id, vec AS cvec, vn AS cn
            FROM v ORDER BY vec_id LIMIT {k})""",
    ]
    for i in range(1, iters + 1):
        p = f"cent{i - 1}"
        ctes.append(
            f"""asg{i} AS (
            SELECT centroid_id, vec FROM (
                SELECT c.centroid_id, v.vec,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {sim} DESC, c.centroid_id)
                           AS rn
                FROM v, {p} c)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""means{i} AS (
            SELECT centroid_id, dim,
                   {_quantized_mean_sql()} AS m
            FROM (SELECT centroid_id, generate_subscripts(vec, 1) AS dim,
                         unnest(vec) AS val
                  FROM asg{i})
            GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""cent{i} AS (
            SELECT centroid_id, cvec,
                   sqrt(list_sum(list_transform(cvec, x -> x * x))) AS cn
            FROM (SELECT centroid_id, list(m ORDER BY dim) AS cvec
                  FROM means{i} GROUP BY centroid_id)
            UNION ALL
            SELECT centroid_id, cvec, cn FROM {p}
            WHERE centroid_id NOT IN (SELECT centroid_id FROM means{i}))"""
        )
    return ",\n        ".join(ctes), f"cent{iters}"


def ivf_refined_centroids_oracle(
    k: int = IVF_REFINE_K, iters: int = IVF_REFINE_ITERS
) -> str:
    """DuckDB twin of ``kmeans_refine`` (see :func:`_kmeans_ctes`)."""
    ctes, cent = _kmeans_ctes(k, iters)
    return f"""
        WITH {ctes}
        SELECT centroid_id,
               array_to_string(list_transform(cvec,
                   x -> CAST(CAST(floor(x * {_LC_S} + 0.5) AS BIGINT)
                             AS VARCHAR)),
                   ',') AS cvec_q6_csv,
               round(cn, 6) AS cn
        FROM {cent}
    """


def ivf_refined_topk_oracle(
    k: int = IVF_REFINE_K, iters: int = IVF_REFINE_ITERS
) -> str:
    """DuckDB twin of the trained-quantizer IVF search: the unrolled
    Lloyd chain feeds the same assignment / probe / rescore / top-k SQL
    as the seed-centroid IVF oracle — the full train-then-search
    pipeline verified end to end."""
    ids = ", ".join(str(i) for i in SIM_QUERY_IDS)
    ctes, cent = _kmeans_ctes(k, iters)
    sim = _carried_cos_sql("v", "c")
    qsim = _carried_cos_sql("q", "c")
    return f"""
        WITH {ctes},
        asg AS (
            SELECT id, centroid_id FROM (
                SELECT v.vec_id AS id, c.centroid_id,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {sim} DESC, c.centroid_id)
                           AS rn
                FROM v, {cent} c)
            WHERE rn = 1),
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.vec_id AS query_id, c.centroid_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY {qsim} DESC, c.centroid_id)
                           AS rn
                FROM v q, {cent} c WHERE q.vec_id IN ({ids}))
            WHERE rn <= {SIM_IVF_NPROBE}),
        cand AS (
            SELECT DISTINCT query_id, a.id AS neighbor_id
            FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
            WHERE a.id != p.query_id),
        scored AS (
            SELECT query_id, neighbor_id,
                   round(list_sum(list_transform(list_zip(q.vec, n.vec),
                                                 p -> p[1] * p[2]))
                         / (q.vn * n.vn), 6) AS score
            FROM cand
            JOIN v q ON cand.query_id = q.vec_id
            JOIN v n ON cand.neighbor_id = n.vec_id),
        ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, score, rank
        FROM ranked WHERE rank <= {SIM_K}
    """


# ivf_capacity's √N rule over the full-corpus CTE ``v`` (the semdedup
# twin of IVF_CAPACITY_K_SQL, which sizes over the 9-in-10 ``corp``
# split): max(1, min(65536, round(sqrt(N)), N)) — round-half ties
# cannot occur, sqrt of an integer is never exactly x.5
SEMDEDUP_CAPACITY_K_SQL = (
    "GREATEST(1, LEAST(65536, "
    "CAST(round(sqrt((SELECT count(*) FROM v))) AS BIGINT), "
    "(SELECT count(*) FROM v)))"
)


def _semdedup_ctes(
    k: int | str, iters: int, tau: float, vsrc: str = "embeddings"
) -> tuple[str, str]:
    """SemDeDup as a spliceable CTE chain: the unrolled-Lloyd CTEs feed
    the final-centroid assignment, then a within-cluster self-join on
    (cluster, j < i) with the same rounded cosine; the exemplar is
    min(j) and its cosine ``arg_min(psim, j_id)`` — unique j ids, so
    both aggregates are deterministic. Returns (joined_cte_sql,
    final_cte_name) where the final CTE emits (vec_id, centroid_id,
    kept_id, sim) — one row per pruned vector."""
    ctes, cent = _kmeans_ctes(k, iters, vsrc)
    sim = _carried_cos_sql("v", "c")
    more = f"""sem_asg AS (
            SELECT id, centroid_id, vec, vn FROM (
                SELECT v.vec_id AS id, c.centroid_id, v.vec, v.vn,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {sim} DESC, c.centroid_id)
                           AS rn
                FROM v, {cent} c)
            WHERE rn = 1),
        sem_pairs AS (
            SELECT a.id AS vec_id, a.centroid_id, b.id AS j_id,
                   round(list_sum(list_transform(list_zip(a.vec, b.vec),
                                                 p -> p[1] * p[2]))
                         / (a.vn * b.vn), 6) AS psim
            FROM sem_asg a JOIN sem_asg b
              ON a.centroid_id = b.centroid_id AND b.id < a.id),
        sem_pruned AS (
            SELECT vec_id, centroid_id,
                   min(j_id) AS kept_id,
                   arg_min(psim, j_id) AS sim
            FROM sem_pairs
            WHERE psim >= {tau}
            GROUP BY 1, 2)"""
    return f"{ctes},\n        {more}", "sem_pruned"


def semdedup_oracle(
    k: int | str = SEMDEDUP_K,
    iters: int = SEMDEDUP_ITERS,
    tau: float = SEMDEDUP_TAU,
) -> str:
    """DuckDB twin of ``semdedup_prune`` (see :func:`_semdedup_ctes`)."""
    ctes, pruned = _semdedup_ctes(k, iters, tau)
    return f"""
        WITH {ctes}
        SELECT vec_id, centroid_id, kept_id, sim
        FROM {pruned}
        ORDER BY vec_id
    """


def semdedup_keep_best_oracle(
    k: int | str = SEMDEDUP_K,
    iters: int = SEMDEDUP_ITERS,
    tau: float = SEMDEDUP_TAU,
) -> str:
    """DuckDB twin of ``semdedup_keep_best``: the shared unrolled-Lloyd
    assignment (``_kmeans_ctes`` — byte-identical to the min-id twin's),
    quality joined from documents (n_chars, exact BIGINT), the same
    ``j < i`` pair graph with the dominance CASE picking each tau-pair's
    winner, then the (q DESC, id) row_number argmax — the SQL spelling
    of the operator's struct-max (both orders are total, so they cannot
    disagree)."""
    ctes, cent = _kmeans_ctes(k, iters)
    sim = _carried_cos_sql("v", "c")
    return f"""
        WITH {ctes},
        kb_qual AS (
            SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS q
            FROM documents),
        kb_asg AS (
            SELECT a.id, a.centroid_id, a.vec, a.vn, kb_qual.q
            FROM (
                SELECT id, centroid_id, vec, vn FROM (
                    SELECT v.vec_id AS id, c.centroid_id, v.vec, v.vn,
                           row_number() OVER (PARTITION BY v.vec_id
                                              ORDER BY {sim} DESC,
                                                       c.centroid_id) AS rn
                    FROM v, {cent} c)
                WHERE rn = 1) a
            JOIN kb_qual ON a.id = kb_qual.id),
        kb_pairs AS (
            SELECT a.id AS aid, a.centroid_id, a.q AS aq,
                   b.id AS bid, b.q AS bq,
                   round(list_sum(list_transform(list_zip(a.vec, b.vec),
                                                 p -> p[1] * p[2]))
                         / (a.vn * b.vn), 6) AS psim
            FROM kb_asg a JOIN kb_asg b
              ON a.centroid_id = b.centroid_id AND b.id < a.id),
        kb_cand AS (
            SELECT CASE WHEN bq >= aq THEN aid ELSE bid END AS vec_id,
                   centroid_id,
                   CASE WHEN bq >= aq THEN bid ELSE aid END AS keeper_id,
                   CASE WHEN bq >= aq THEN bq ELSE aq END AS keeper_q,
                   psim
            FROM kb_pairs WHERE psim >= {tau})
        SELECT vec_id, centroid_id, kept_id, sim FROM (
            SELECT vec_id, centroid_id, keeper_id AS kept_id,
                   psim AS sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY keeper_q DESC, keeper_id)
                       AS rn
            FROM kb_cand)
        WHERE rn = 1
        ORDER BY vec_id
    """


def label_confusion_oracle() -> str:
    """DuckDB twin of ``nearest_centroid_confusion``: same integer-
    quantized component means (floor(x·1e6 + 0.5), exact bigint sums),
    same rounded-cosine assignment with label tiebreak."""
    return f"""
        WITH v AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS vec
                   FROM embeddings),
        comp AS (
            SELECT label, generate_subscripts(vec, 1) AS dim,
                   unnest(vec) AS val
            FROM v),
        means AS (
            SELECT label, dim,
                   {_quantized_mean_sql()} AS m
            FROM comp GROUP BY 1, 2),
        cent AS (
            SELECT label AS centroid_label,
                   list(m ORDER BY dim) AS cvec
            FROM means GROUP BY label),
        centn AS (
            SELECT centroid_label, cvec,
                   sqrt(list_sum(list_transform(cvec, x -> x * x))) AS cn
            FROM cent),
        scored AS (
            SELECT v.vec_id, v.label AS true_label, centroid_label,
                   round(list_sum(list_transform(list_zip(v.vec, cvec),
                                                 p -> p[1] * p[2]))
                         / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
                            * cn), 6) AS sim
            FROM v, centn),
        best AS (
            SELECT true_label, centroid_label FROM (
                SELECT true_label, centroid_label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid_label)
                           AS rn
                FROM scored)
            WHERE rn = 1)
        SELECT true_label AS label, centroid_label AS assigned_label,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM best GROUP BY 1, 2
    """


def source_overlap_oracle() -> str:
    """The full pair oracle nested as a CTE, labelled and rolled up with
    the same least/greatest + count/max(jaccard) cell statistics."""
    return f"""
        WITH pairs AS ({minhash_pairs_oracle()}),
        lab AS (
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   p.jaccard
            FROM pairs p
            JOIN documents da ON p.id_a = da.doc_id
            JOIN documents db ON p.id_b = db.doc_id)
        SELECT source_a, source_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               max(jaccard) AS max_jaccard
        FROM lab GROUP BY 1, 2
    """


def incremental_neardup_oracle(corpus_extra_pred: str = "TRUE") -> str:
    """Asymmetric LSH: new-batch buckets ⋈ corpus buckets, corpus-side
    hot-bucket cap, Jaccard verify over the two hashed shingle sets.

    ``corpus_extra_pred`` (over ``id``) narrows the CORPUS side — the
    tombstone-delete twin: the hot-bucket cap, candidate join, and
    verify all see only live documents, exactly
    ``NearDupIndex._live_buckets``'s contract (the cap is computed on
    the live view on both engines)."""
    return f"""
        WITH {_SHINGLE_CTE}, {_hashed_shingle_cte()},
        hn AS (SELECT * FROM hsh WHERE id % {INCR_MOD} = 0),
        hc AS (SELECT * FROM hsh
               WHERE id % {INCR_MOD} != 0 AND ({corpus_extra_pred})),
        sig_n AS ({_sig_select_sql('hn')}),
        sig_c AS ({_sig_select_sql('hc')}),
        bn AS ({_band_select_sql('sig_n')}),
        bc_raw AS ({_band_select_sql('sig_c')}),
        bsz AS (SELECT band_idx, band_hash, count(*) AS n
                FROM bc_raw GROUP BY 1, 2),
        bc AS (SELECT r.* FROM bc_raw r JOIN bsz USING (band_idx, band_hash)
               WHERE bsz.n <= {SKEW_CAP}),
        cand AS (
            SELECT DISTINCT n.id AS id_new, c.id AS id_corpus
            FROM bn n JOIN bc c
              ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
             AND n.id != c.id),
        szn AS (SELECT id, count(*) AS sz_new FROM hn GROUP BY id),
        szc AS (SELECT id, count(*) AS sz_corpus FROM hc GROUP BY id),
        inter AS (
            SELECT cd.id_new, cd.id_corpus, count(*) AS inter_cnt
            FROM cand cd
            JOIN hn x ON x.id = cd.id_new
            JOIN hc y ON y.id = cd.id_corpus AND y.h = x.h
            GROUP BY 1, 2)
        SELECT i.id_new, i.id_corpus,
               i.inter_cnt * 1.0 / (a.sz_new + b.sz_corpus - i.inter_cnt)
                   AS jaccard
        FROM inter i JOIN szn a ON i.id_new = a.id
                     JOIN szc b ON i.id_corpus = b.id
        WHERE i.inter_cnt * 1.0 / (a.sz_new + b.sz_corpus - i.inter_cnt)
              >= {MINHASH_THRESHOLD}
    """


def decontaminate_oracle() -> str:
    """Same trigram shingles, posting-list cap, and ≥min_shared rule as
    decontaminate_report — recomposed relationally."""
    return f"""
        WITH {_SHINGLE_CTE},
        bs AS (SELECT id AS bench_id, shingle FROM sh WHERE id % {DECON_MOD} = 0),
        ts AS (SELECT id, shingle FROM sh WHERE id % {DECON_MOD} != 0),
        freq AS (SELECT shingle, count(*) AS df_cnt FROM ts GROUP BY shingle),
        tsf AS (SELECT ts.id, ts.shingle FROM ts JOIN freq USING (shingle)
                WHERE df_cnt <= {SKEW_CAP}),
        pair AS (SELECT bs.bench_id, tsf.id AS train_id, count(*) AS shared
                 FROM tsf JOIN bs USING (shingle)
                 GROUP BY 1, 2 HAVING count(*) >= {DECON_MIN_SHARED}),
        per AS (SELECT bench_id, count(*) AS n_contaminated,
                       max(shared) AS max_shared
                FROM pair GROUP BY bench_id)
        SELECT d.doc_id AS bench_id,
               coalesce(per.n_contaminated, 0) AS n_contaminated,
               coalesce(per.max_shared, 0) AS max_shared
        FROM documents d LEFT JOIN per ON per.bench_id = d.doc_id
        WHERE d.doc_id % {DECON_MOD} = 0
    """


def _dedup_reach_cte(src: str = "documents", pre: str = "") -> str:
    """Shared recursive-CTE chain: MinHash pairs → undirected edges →
    transitive reachability (`reach`) → min-label `groups`, all over
    ``src``. Tailed differently by dedup_groups_oracle (labels),
    dedup_prune_oracle (pruned-corpus summary), and the composed
    pretraining-pipeline oracle (which passes ``pre`` to define its
    filtered ``base`` CTE first)."""
    return f"""
        WITH RECURSIVE {pre}{_shingle_cte(src)}, {_minhash_sig_sql()}, {_band_sql()},
        bksz AS (SELECT band_idx, band_hash, count(*) AS n
                 FROM buckets GROUP BY 1, 2),
        bk AS (SELECT b.* FROM buckets b JOIN bksz USING (band_idx, band_hash)
               WHERE bksz.n <= {SKEW_CAP}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bk a JOIN bk b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.id < b.id),
        sz AS (SELECT id, count(*) AS sz FROM hsh GROUP BY id),
        inter AS (
            SELECT c.id_a, c.id_b, count(*) AS inter_cnt
            FROM cand c
            JOIN hsh x ON x.id = c.id_a
            JOIN hsh y ON y.id = c.id_b AND y.h = x.h
            GROUP BY c.id_a, c.id_b),
        pairs AS (
            SELECT i.id_a, i.id_b
            FROM inter i JOIN sz a ON i.id_a = a.id JOIN sz b ON i.id_b = b.id
            WHERE i.inter_cnt * 1.0 / (a.sz + b.sz - i.inter_cnt)
                  >= {MINHASH_THRESHOLD}),
        edges AS (SELECT id_a AS s, id_b AS d FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(s, d) AS (
            SELECT s, d FROM edges
            UNION
            SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        groups AS (
            SELECT doc_id,
                   least(doc_id, coalesce(min(r.d), doc_id)) AS group_id
            FROM {src} LEFT JOIN reach r ON r.s = doc_id
            GROUP BY doc_id
        )
    """


def dedup_groups_oracle() -> str:
    """Transitive closure over the MinHash pair set via a recursive CTE;
    component label = min reachable doc_id (self included)."""
    return f"""
        {_dedup_reach_cte()}
        SELECT doc_id, group_id FROM groups
    """


def dedup_keep_best_oracle() -> str:
    """Quality-aware exemplar per cluster: the shared transitive-closure
    CTE, an exact-integer token-count score, and the (score desc,
    doc_id) argmax — bit-identical to the struct-max on the Spark side
    (exact bigint ordering, no float tiebreak)."""
    return rf"""
        {_dedup_reach_cte()},
        scored AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT)
                       AS score
            FROM documents),
        best AS (
            SELECT group_id, doc_id AS kept_id FROM (
                SELECT g.group_id, s.doc_id,
                       row_number() OVER (PARTITION BY g.group_id
                                          ORDER BY s.score DESC, s.doc_id)
                           AS rn
                FROM groups g JOIN scored s USING (doc_id))
            WHERE rn = 1)
        SELECT s.doc_id, g.group_id, s.score, b.kept_id,
               CAST(CASE WHEN s.doc_id = b.kept_id THEN 1 ELSE 0 END
                    AS BIGINT) AS kept
        FROM scored s
        JOIN groups g USING (doc_id)
        JOIN best b ON g.group_id = b.group_id
    """


def dedup_prune_oracle() -> str:
    """Pruned-corpus summary: a document survives iff it is its own
    cluster representative (doc_id == min-label group_id)."""
    return f"""
        {_dedup_reach_cte()}
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN g.group_id = d.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN g.group_id = d.doc_id THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_dropped
        FROM documents d JOIN groups g USING (doc_id)
        GROUP BY d.lang
    """


def _simhash_sig_sql(bits: int = SIMHASH_BITS) -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return f"""
        tokh AS (
            SELECT doc_id AS id,
                   CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
            FROM (SELECT doc_id, unnest({_TOK}) AS tok FROM documents)),
        votes AS (SELECT id, {votes} FROM tokh GROUP BY id),
        sims AS (SELECT id, {terms} AS simhash FROM votes)
    """


def simhash_sigs_oracle() -> str:
    return f"WITH {_simhash_sig_sql()} SELECT id, simhash FROM sims"


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    # brute-force pairs in the oracle: independently validates that the
    # engine's pigeonhole band join is a COMPLETE candidate generator
    return f"""
        WITH {_simhash_sig_sql()}
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sims a JOIN sims b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def jaccard_pairs_oracle() -> str:
    """Twin of ``ngram_jaccard_pairs`` incl. the posting-list cap: hot
    shingles past ``SKEW_CAP`` docs are dropped from the shingle sets
    BEFORE sizes and intersections (matching the Spark operator, where
    the cap filters the set itself, not just candidate generation)."""
    return f"""
        WITH {_SHINGLE_CTE}, {_hashed_shingle_cte()},
        hfreq AS (SELECT h, count(*) AS df_cnt FROM hsh GROUP BY h),
        hf AS (SELECT hsh.* FROM hsh JOIN hfreq USING (h)
               WHERE df_cnt <= {SKEW_CAP}),
        sz AS (SELECT id, count(*) AS sz FROM hf GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_cnt
            FROM hf a JOIN hf b ON a.h = b.h AND a.id < b.id
            GROUP BY 1, 2)
        SELECT i.id_a, i.id_b,
               i.inter_cnt * 1.0 / (a.sz + b.sz - i.inter_cnt) AS jaccard
        FROM inter i JOIN sz a ON i.id_a = a.id JOIN sz b ON i.id_b = b.id
        WHERE i.inter_cnt * 1.0 / (a.sz + b.sz - i.inter_cnt) >= {JACCARD_THRESHOLD}
    """


def similarity_topk_oracle(
    query_ids: list[int] | None = None, k: int = None
) -> str:
    """Parameterized so the hybrid-retrieval oracles (rrf_fusion /
    hard_negatives) can reuse the exact dense-tier SQL with their own
    query set and depth; default arguments reproduce the registered
    ``similarity_topk`` oracle byte-for-byte."""
    ids = ", ".join(str(i) for i in (query_ids or SIM_QUERY_IDS))
    k = SIM_K if k is None else k
    return f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id IN ({ids})),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings),
        scored AS (
            SELECT query_id, neighbor_id,
                   round(
                     list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                        * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6) AS score
            FROM q, c WHERE neighbor_id != query_id),
        ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {k}
    """


def mmr_rerank_oracle(
    query_ids: list[int] | None = None,
    k: int = None,
    pool: int = None,
    lam: float = None,
) -> str:
    """DuckDB twin of ``mmr_rerank``: the dense candidate pool is the
    ``similarity_topk`` SQL at depth ``pool`` (vectors carried), then
    the k greedy MMR steps unroll as CTE blocks — the kmeans-unroll
    pattern. Step 1 is the (lam·score DESC, id) argmax; each later step
    anti-joins the selected set, takes the max rounded pairwise cosine
    to any selected doc as the penalty, and argmaxes
    lam·score − (1−lam)·penalty with the id tie-break. The emitted mmr
    is the RAW double — bit-identical cross-engine (identical rounded
    inputs, the same double constants, the same three-op expression);
    a final decimal rounding would break parity exactly on the decimal
    halves lam × a 6-decimal score produces (measured at sf0.01)."""
    ids = ", ".join(str(i) for i in (query_ids or SIM_QUERY_IDS))
    k = MMR_K if k is None else k
    pool = MMR_POOL if pool is None else pool
    lam = MMR_LAM if lam is None else lam
    pair = (
        "round(list_sum(list_transform(list_zip(r.cv, s.cv), p -> p[1] * p[2]))"
        " / (sqrt(list_sum(list_transform(r.cv, x -> x * x)))"
        " * sqrt(list_sum(list_transform(s.cv, x -> x * x)))), 6)"
    )
    ctes = [
        f"""q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id IN ({ids}))""",
        """c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                 FROM embeddings)""",
        """mscored AS (
            SELECT query_id, neighbor_id, cv,
                   round(
                     list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                        * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6)
                       AS score
            FROM q, c WHERE neighbor_id != query_id)""",
        f"""mcand AS MATERIALIZED (
            SELECT query_id, neighbor_id, score, cv FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY score DESC, neighbor_id)
                           AS rn
                FROM mscored)
            WHERE rn <= {pool})""",
        f"""selu1 AS (
            SELECT query_id, neighbor_id, {lam} * score AS mmr,
                   CAST(1 AS BIGINT) AS mmr_rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY {lam} * score DESC, neighbor_id) AS rn
                  FROM mcand)
            WHERE rn = 1)""",
    ]
    for i in range(2, k + 1):
        prev = f"selu{i - 1}"
        ctes.append(
            f"""rem{i} AS (
            SELECT mc.* FROM mcand mc
            LEFT JOIN {prev} s ON mc.query_id = s.query_id
                              AND mc.neighbor_id = s.neighbor_id
            WHERE s.neighbor_id IS NULL)"""
        )
        ctes.append(
            f"""pen{i} AS (
            SELECT r.query_id, r.neighbor_id, r.score, max({pair}) AS pen
            FROM rem{i} r
            JOIN (SELECT su.query_id, mc.cv FROM {prev} su
                  JOIN mcand mc ON su.query_id = mc.query_id
                               AND su.neighbor_id = mc.neighbor_id) s
              ON r.query_id = s.query_id
            GROUP BY 1, 2, 3)"""
        )
        ctes.append(
            f"""selu{i} AS (
            SELECT * FROM {prev}
            UNION ALL
            SELECT query_id, neighbor_id, mmr, CAST({i} AS BIGINT) AS mmr_rank
            FROM (SELECT query_id, neighbor_id,
                         {lam} * score - {1 - lam} * pen AS mmr,
                         row_number() OVER (
                             PARTITION BY query_id
                             ORDER BY {lam} * score - {1 - lam} * pen DESC,
                                      neighbor_id) AS rn
                  FROM pen{i})
            WHERE rn = 1)"""
        )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT query_id, neighbor_id, mmr, mmr_rank
        FROM selu{k}
        ORDER BY query_id, mmr_rank
    """


def _cos_sql(av: str, bv: str) -> str:
    """Rounded-cosine SQL snippet shared by every similarity oracle —
    the DuckDB form of ``operators.similarity.cosine`` + round(…, 6)."""
    return (
        f"round(list_sum(list_transform(list_zip({av}, {bv}), p -> p[1] * p[2]))"
        f" / (sqrt(list_sum(list_transform({av}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({bv}, x -> x * x)))), 6)"
    )


def _rhp_sig_cte() -> str:
    """``v`` (double vectors) + ``sig`` (RHP bucket) CTE bodies, the
    DuckDB twin of ``operators.similarity.rhp_signature`` with the same
    md5-derived hyperplanes inlined as ±1 literals."""
    from .operators.similarity import duckdb_rhp_bucket

    bucket = duckdb_rhp_bucket("vec", planes=SIM_LSH_PLANES)
    return f"""
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        sig AS (SELECT vec_id AS id, {bucket} AS bucket FROM v)"""


def embedding_neardup_lsh_oracle() -> str:
    """DuckDB twin of the full RHP-LSH near-dup pipeline: equal-bucket
    candidate pairs, exact rounded cosine, threshold filter."""
    return f"""
        WITH {_rhp_sig_cte()},
        cand AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id),
        scored AS (
            SELECT id_a, id_b, {_cos_sql('va.vec', 'vb.vec')} AS score
            FROM cand
            JOIN v va ON cand.id_a = va.vec_id
            JOIN v vb ON cand.id_b = vb.vec_id)
        SELECT id_a, id_b, score FROM scored
        WHERE score >= {EMB_NEARDUP_THRESHOLD}
    """


def similarity_topk_lsh_oracle() -> str:
    """DuckDB twin of ``cosine_topk_lsh``: hamming-ball candidates over
    the RHP buckets, rounded-cosine rescoring, per-query top-k."""
    ids = ", ".join(str(i) for i in SIM_QUERY_IDS)
    return f"""
        WITH {_rhp_sig_cte()},
        qsig AS (SELECT id AS query_id, bucket AS qbucket
                 FROM sig WHERE id IN ({ids})),
        cand AS (
            SELECT query_id, s.id AS neighbor_id
            FROM sig s, qsig
            WHERE s.id != query_id
              AND bit_count(xor(s.bucket, qbucket)) <= {SIM_LSH_HAMMING}),
        scored AS (
            SELECT query_id, neighbor_id, {_cos_sql('q.vec', 'c.vec')} AS score
            FROM cand
            JOIN v q ON cand.query_id = q.vec_id
            JOIN v c ON cand.neighbor_id = c.vec_id),
        ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {SIM_K}
    """


def similarity_topk_ivf_oracle(live_pred: str = "TRUE") -> str:
    """DuckDB twin of ``cosine_topk_ivf``: id-ordered deterministic
    centroids, rounded-sim assignment (centroid_id tiebreak), nprobe
    probe list per query, candidate union, rounded rescoring, top-k.

    ``live_pred`` (over ``a.id``) narrows the CANDIDATE side only — the
    tombstone-delete twin: the quantizer still trains on the full
    corpus (deletion never retrains), but tombstoned ids can't surface
    as neighbors, exactly ``IvfIndex._live_assign``'s contract."""
    ids = ", ".join(str(i) for i in SIM_QUERY_IDS)
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        cent AS (SELECT vec_id AS centroid_id, vec AS cvec
                 FROM v ORDER BY vec_id LIMIT {SIM_IVF_CENTROIDS}),
        asg AS (
            SELECT id, centroid_id FROM (
                SELECT v.vec_id AS id, centroid_id,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {_cos_sql('v.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM v, cent)
            WHERE rn = 1),
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.vec_id AS query_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_sql('q.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM v q, cent WHERE q.vec_id IN ({ids}))
            WHERE rn <= {SIM_IVF_NPROBE}),
        cand AS (
            SELECT DISTINCT query_id, a.id AS neighbor_id
            FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
            WHERE a.id != p.query_id AND ({live_pred})),
        scored AS (
            SELECT query_id, neighbor_id, {_cos_sql('q.vec', 'c.vec')} AS score
            FROM cand
            JOIN v q ON cand.query_id = q.vec_id
            JOIN v c ON cand.neighbor_id = c.vec_id),
        ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {SIM_K}
    """


def _ivf_split_asg_ctes(k: int, materialized: bool = False) -> str:
    """The shared CTE prefix of the 1-in-10-split IVF oracles
    (embedding_neardup_idx / semantic_ingest): double-cast vectors,
    corpus/batch split, id-ordered seed centroids FROM THE CORPUS
    SUBSET, rounded-sim nearest-centroid assignment of both sides
    (centroid_id tiebreak). ONE definition so the assignment contract
    (rounding, tiebreak, seeding) can never silently diverge between
    the check oracle and the ingest oracle — the round-3 advice class.
    ``materialized`` marks the CTEs consumed repeatedly downstream
    (the composed ingest oracle reads v and asgb from several blocks;
    DuckDB inlines plain CTEs per reference)."""
    m = " MATERIALIZED" if materialized else ""
    return f"""v AS{m} (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        corp AS (SELECT * FROM v WHERE vec_id % {INCR_MOD} != 0),
        bat AS (SELECT * FROM v WHERE vec_id % {INCR_MOD} = 0),
        cent AS (SELECT vec_id AS centroid_id, vec AS cvec
                 FROM corp ORDER BY vec_id LIMIT {k}),
        asgc AS (
            SELECT id, centroid_id FROM (
                SELECT c2.vec_id AS id, centroid_id,
                       row_number() OVER (
                           PARTITION BY c2.vec_id
                           ORDER BY {_cos_sql('c2.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM corp c2, cent)
            WHERE rn = 1),
        asgb AS{m} (
            SELECT vec_id, centroid_id FROM (
                SELECT b.vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vec_id
                           ORDER BY {_cos_sql('b.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM bat b, cent)
            WHERE rn = 1)"""


def q_embedding_neardup_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_neardup_idx`` on the CAPACITY-SIZED quantizer — the
    scale path under the driver's hash gate (r10; SCALE.md §"Second
    decade"): ``IvfIndex(n_centroids=None)`` resolves ``ivf_capacity``'s
    √N rule at build, the sizing that completed the 100× check the
    fixed-K parity tier could not (candidate volume N²/K vs N^1.5).
    The oracle recomputes the SAME √N (round-half cases are impossible
    for √ of an integer, so Python round and SQL round agree) as a
    LIMIT expression over the corpus count, then the identical
    seed-centroid assignment + within-cluster compare — proving the
    auto-sizing is bit-deterministic, not just recall-gated."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % INCR_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("semdup_cap_", sf_dir))
    idx = IvfIndex(cat, "semdup_cap", n_centroids=None)
    idx.build(corpus)
    return idx.neardup_check(new, SEMDEDUP_TAU).orderBy("vec_id")


# ivf_capacity's n_centroids rule as a SQL expression over the corpus
# CTE — max(1, min(65536, round(sqrt(N)), N)), exactly similarity.py's
# formula (round-half ties cannot occur: sqrt(int) is never exactly x.5)
IVF_CAPACITY_K_SQL = (
    "GREATEST(1, LEAST(65536, "
    "CAST(round(sqrt((SELECT count(*) FROM corp))) AS BIGINT), "
    "(SELECT count(*) FROM corp)))"
)


def embedding_neardup_idx_oracle(
    k: int | str = SEMDEDUP_K, tau: float = SEMDEDUP_TAU
) -> str:
    """DuckDB twin of ``IvfIndex.neardup_check`` over the 1-in-10 split:
    the shared assignment prefix (``_ivf_split_asg_ctes``) + the
    within-cluster exact compare, min-id exemplar (``arg_min`` carries
    its cosine)."""
    return f"""
        WITH {_ivf_split_asg_ctes(k)},
        scored AS (
            SELECT b.vec_id, b.centroid_id, a.id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM asgb b
            JOIN asgc a ON b.centroid_id = a.centroid_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON a.id = c.vec_id)
        SELECT vec_id, centroid_id,
               min(cid) AS kept_id,
               arg_min(sim, cid) AS sim
        FROM scored
        WHERE sim >= {tau}
        GROUP BY 1, 2
        ORDER BY vec_id
    """


# slightly below SEMDEDUP_TAU: at 0.35 the sf0.01 batch contains no
# intra-batch pair, so the admission gate's second match class would
# never be driver-exercised; 0.30 yields both classes (2 batch + 21
# corpus rows at sf0.01) while keeping the same algorithm instance
SEM_INGEST_TAU = 0.30


def semantic_ingest_oracle(k: int = SEMDEDUP_K, tau: float = SEM_INGEST_TAU) -> str:
    """DuckDB twin of ``IvfIndex.ingest``'s report over the 1-in-10
    split: the corpus-match class is exactly ``embedding_neardup_idx``'s
    math; the intra-batch class joins the assigned batch against itself
    within a cluster with the smaller id surviving. State tables are
    materialized intermediates of identical math, so the report is a
    pure function of the inputs."""
    return f"""
        WITH {_ivf_split_asg_ctes(k, materialized=True)},
        corpus_scored AS (
            SELECT b.vec_id, b.centroid_id, a.id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM asgb b
            JOIN asgc a ON b.centroid_id = a.centroid_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON a.id = c.vec_id),
        batch_scored AS (
            SELECT b.vec_id, b.centroid_id, b2.vec_id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM asgb b
            JOIN asgb b2 ON b.centroid_id = b2.centroid_id
                         AND b2.vec_id < b.vec_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON b2.vec_id = c.vec_id)
        SELECT vec_id, centroid_id, min(cid) AS kept_id,
               arg_min(sim, cid) AS sim, 'corpus' AS matched_in
        FROM corpus_scored WHERE sim >= {tau} GROUP BY 1, 2
        UNION ALL
        SELECT vec_id, centroid_id, min(cid) AS kept_id,
               arg_min(sim, cid) AS sim, 'batch' AS matched_in
        FROM batch_scored WHERE sim >= {tau} GROUP BY 1, 2
        ORDER BY vec_id, matched_in
    """


def q_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION admission gate of the semantic index
    (``IvfIndex.ingest``): the same 1-in-10 batch/corpus split as
    ``embedding_neardup_idx``, but running the FULL ingest — batch
    vectors are rejected on corpus near-dups AND on smaller-id
    intra-batch near-dups (the min-id chain convention), and the
    accepted remainder is appended to the bucketed index tables. The
    returned pair report is the driver-checked value; each invocation
    rebuilds the index from the corpus split, so the report is a pure
    function of the inputs (the appends reset with the rebuild)."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % INCR_MOD == 0)
    corpus = emb.filter(F.col("vec_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("sem_ingest_", sf_dir))
    idx = IvfIndex(cat, "sem_ingest", n_centroids=SEMDEDUP_K)
    idx.build(corpus)
    return idx.ingest(new, SEM_INGEST_TAU).orderBy("vec_id", "matched_in")


def q_semantic_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exemplar replacement on the STANDING semantic index
    (``IvfIndex.ingest_keep_best`` — the embedding-space twin of
    ``neardup_keep_best``, completing the keep-best symmetry across both
    dedup-capable standing indexes): quality = the document's n_chars
    (vec_id aligns with doc_id in the testdata), corpus = the 9-in-10
    split built quality-indexed, batch = the 1-in-10 split ingested
    under keep-best semantics — intra-batch CC over the same-cluster
    cos ≥ tau pair graph, then the PAIRWISE corpus challenge with each
    admission tombstoning the incumbents it beat. Returns the final
    LIVE exemplar set (id, q); the oracle recomposes the split
    quantizer assignment, both pair classes, the recursive-CTE batch
    CC + argmax, the struct-compare decisions, and corpus − beaten ∪
    admitted."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex
    from .operators.tombstones import live

    emb = load_table(spark, sf_dir, "embeddings")
    qual = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("q")
    )
    embq = emb.join(qual, "vec_id").select("vec_id", "embedding", "q")
    new = embq.filter(F.col("vec_id") % INCR_MOD == 0)
    corpus = embq.filter(F.col("vec_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("sem_kb_", sf_dir))
    idx = IvfIndex(cat, "sem_kb", n_centroids=SEMDEDUP_K)
    idx.build(corpus, quality_col="q")
    idx.ingest_keep_best(new, SEM_INGEST_TAU, "q")
    return (
        live(cat, "sem_kb", cat.get_bucketed(idx.quality_table))
        .select("id", "q")
        .orderBy("id")
    )


def semantic_keep_best_oracle(
    k: int = SEMDEDUP_K, tau: float = SEM_INGEST_TAU
) -> str:
    """DuckDB twin of ``q_semantic_keep_best``: the shared split-
    assignment prefix, the intra-batch pair graph closed transitively
    (recursive CTE) with the (q desc, id) argmax per batch cluster, the
    pairwise corpus challenge decided by the identical exact-integer
    struct compare, and the final live set = corpus − beaten ∪
    admitted."""
    return f"""
        WITH RECURSIVE {_ivf_split_asg_ctes(k, materialized=True)},
        qual AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS q
                 FROM documents),
        batch_pairs AS (
            SELECT b2.vec_id AS id_a, b.vec_id AS id_b
            FROM asgb b
            JOIN asgb b2 ON b.centroid_id = b2.centroid_id
                         AND b2.vec_id < b.vec_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON b2.vec_id = c.vec_id
            WHERE {_cos_sql('q.vec', 'c.vec')} >= {tau}),
        wedges AS (SELECT id_a AS s, id_b AS d FROM batch_pairs
                   UNION SELECT id_b, id_a FROM batch_pairs),
        wreach(s, d) AS (
            SELECT s, d FROM wedges
            UNION
            SELECT r.s, e.d FROM wreach r JOIN wedges e ON r.d = e.s),
        wgroups AS (
            SELECT b.vec_id AS id,
                   least(b.vec_id, coalesce(min(r.d), b.vec_id)) AS group_id
            FROM asgb b LEFT JOIN wreach r ON r.s = b.vec_id
            GROUP BY b.vec_id),
        challengers AS (
            SELECT id FROM (
                SELECT g.id,
                       row_number() OVER (PARTITION BY g.group_id
                                          ORDER BY q.q DESC, g.id) AS rn
                FROM wgroups g JOIN qual q USING (id))
            WHERE rn = 1),
        chal AS (
            SELECT b.vec_id AS id_new, a.id AS id_corpus,
                   qn.q AS q_new, qc.q AS q_inc
            FROM asgb b
            JOIN challengers ch ON ch.id = b.vec_id
            JOIN asgc a ON b.centroid_id = a.centroid_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON a.id = c.vec_id
            JOIN qual qn ON qn.id = b.vec_id
            JOIN qual qc ON qc.id = a.id
            WHERE {_cos_sql('q.vec', 'c.vec')} >= {tau}),
        best_inc AS (
            SELECT id_new, q_inc AS q_best, id_corpus AS best_id FROM (
                SELECT id_new, id_corpus, q_inc,
                       row_number() OVER (PARTITION BY id_new
                                          ORDER BY q_inc DESC, id_corpus)
                           AS rn
                FROM chal)
            WHERE rn = 1),
        admitted AS (
            SELECT ch.id FROM challengers ch
            JOIN qual q ON q.id = ch.id
            LEFT JOIN best_inc b ON b.id_new = ch.id
            WHERE b.id_new IS NULL OR q.q > b.q_best
               OR (q.q = b.q_best AND ch.id < b.best_id)),
        beaten AS (
            SELECT DISTINCT c.id_corpus AS id
            FROM chal c JOIN admitted a ON a.id = c.id_new),
        lve AS (
            SELECT q.id, q.q FROM qual q
            JOIN corp ON corp.vec_id = q.id
            WHERE q.id NOT IN (SELECT id FROM beaten)
            UNION ALL
            SELECT a.id, q.q FROM admitted a JOIN qual q ON q.id = a.id)
        SELECT id, q FROM lve ORDER BY id
    """


# chunk-level semantic admission: tau for the CHUNK index is high —
# md5-slice vectors of all-positive components sit near each other, so
# only (near-)identical window text should gate (exact-duplicate spans)
CHUNK_INGEST_TAU = 0.999


def q_chunk_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level semantic dedup on ingest: the 1-in-10 batch docs are
    CHUNKED and admitted into the standing chunk index under
    ``IvfIndex.ingest``'s near-dup gate — a batch chunk is rejected
    when an indexed corpus chunk (or a smaller-id batch chunk) carries
    (near-)identical window text, the admission-time form of span
    dedup (compare ``span_dedup``'s batch form). Composes
    ``chunk_vectors`` with the ingest gate; the report decodes packed
    chunk ids back to (doc_id, chunk_id) on both sides. Rebuild-priced
    like the other index gates. The oracle recomposes chunking,
    embedding, the split quantizer assignment, and both match classes
    in SQL."""
    from .catalog import Catalog
    from .operators.chunking import CHUNK_ID_SPAN, chunk_vectors
    from .operators.similarity import IvfIndex

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    cat = Catalog(spark, _idx_root("chunk_sem_ingest_", sf_dir))
    idx = IvfIndex(cat, "chunk_sem_ingest", n_centroids=SIM_IVF_CENTROIDS)
    idx.build(chunk_vectors(corpus).select("vec_id", "embedding"))
    report = idx.ingest(
        chunk_vectors(batch).select("vec_id", "embedding"), CHUNK_INGEST_TAU
    )
    return report.select(
        F.expr(f"vec_id DIV {CHUNK_ID_SPAN}").alias("doc_id"),
        F.expr(f"vec_id % {CHUNK_ID_SPAN}").alias("chunk_id"),
        "centroid_id",
        F.expr(f"kept_id DIV {CHUNK_ID_SPAN}").alias("kept_doc"),
        F.expr(f"kept_id % {CHUNK_ID_SPAN}").alias("kept_chunk"),
        "sim",
        "matched_in",
    ).orderBy("doc_id", "chunk_id", "matched_in")


def chunk_semantic_ingest_oracle() -> str:
    """DuckDB twin of :func:`q_chunk_semantic_ingest`: the shared chunk
    CTEs split into corpus/batch by the packed id's doc part, id-ordered
    seed centroids from the CORPUS chunks, rounded-sim assignment of
    both sides, then exactly ``semantic_ingest_oracle``'s two match
    classes with the packed-id decode."""
    from .operators.chunking import CHUNK_ID_SPAN

    span, tau = CHUNK_ID_SPAN, CHUNK_INGEST_TAU
    return f"""
        WITH {_chunk_index_ctes()},
        corp AS (SELECT * FROM cv WHERE (id // {span}) % {INCR_MOD} != 0),
        bat AS (SELECT * FROM cv WHERE (id // {span}) % {INCR_MOD} = 0),
        ccent AS (SELECT id AS centroid_id, vec AS cvec
                  FROM corp ORDER BY id LIMIT {SIM_IVF_CENTROIDS}),
        asgc AS (
            SELECT id, centroid_id FROM (
                SELECT c2.id, centroid_id,
                       row_number() OVER (
                           PARTITION BY c2.id
                           ORDER BY {_cos_sql('c2.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM corp c2, ccent)
            WHERE rn = 1),
        asgb AS MATERIALIZED (
            SELECT id AS vec_id, centroid_id FROM (
                SELECT b.id, centroid_id,
                       row_number() OVER (
                           PARTITION BY b.id
                           ORDER BY {_cos_sql('b.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM bat b, ccent)
            WHERE rn = 1),
        corpus_scored AS (
            SELECT b.vec_id, b.centroid_id, a.id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM asgb b
            JOIN asgc a ON b.centroid_id = a.centroid_id
            JOIN cv q ON b.vec_id = q.id
            JOIN cv c ON a.id = c.id),
        batch_scored AS (
            SELECT b.vec_id, b.centroid_id, b2.vec_id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM asgb b
            JOIN asgb b2 ON b.centroid_id = b2.centroid_id
                         AND b2.vec_id < b.vec_id
            JOIN cv q ON b.vec_id = q.id
            JOIN cv c ON b2.vec_id = c.id),
        rep AS (
            SELECT vec_id, centroid_id, min(cid) AS kept_id,
                   arg_min(sim, cid) AS sim, 'corpus' AS matched_in
            FROM corpus_scored WHERE sim >= {tau} GROUP BY 1, 2
            UNION ALL
            SELECT vec_id, centroid_id, min(cid) AS kept_id,
                   arg_min(sim, cid) AS sim, 'batch' AS matched_in
            FROM batch_scored WHERE sim >= {tau} GROUP BY 1, 2)
        SELECT vec_id // {span} AS doc_id,
               vec_id % {span} AS chunk_id,
               centroid_id,
               kept_id // {span} AS kept_doc,
               kept_id % {span} AS kept_chunk,
               sim, matched_in
        FROM rep
    """


def q_ivf_cluster_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-maintenance signal (``IvfIndex.cluster_stats``): the
    bounded per-centroid population report over the standing IVF index
    built on the embeddings table — skew 1.0 is balanced; a cluster at
    skew k costs k× the balanced per-probe work in search/neardup
    checks. Shares ``similarity_topk_ivf_idx``'s index root and build
    (identical tables, rebuilt idempotently), so registering it adds no
    extra corpus copy. The oracle recomputes the id-ordered quantizer
    assignment and the count/share/skew arithmetic in SQL."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    cat = Catalog(spark, _idx_root("ivf_idx_reg_", sf_dir))
    idx = IvfIndex(
        cat, "ivf_idx_reg", n_centroids=SIM_IVF_CENTROIDS, nprobe=SIM_IVF_NPROBE
    )
    idx.build(emb)
    return idx.cluster_stats().orderBy("centroid_id")


def ivf_cluster_skew_oracle() -> str:
    """DuckDB twin of ``IvfIndex.cluster_stats`` over the id-ordered
    quantizer: same assignment CTEs as ``similarity_topk_ivf_oracle``,
    then per-centroid counts (empty centroids kept with zeros) and the
    share/skew divisions in the same IEEE operation order."""
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
                   FROM embeddings),
        cent AS (SELECT vec_id AS centroid_id, vec AS cvec
                 FROM v ORDER BY vec_id LIMIT {SIM_IVF_CENTROIDS}),
        asg AS (
            SELECT id, centroid_id FROM (
                SELECT v.vec_id AS id, centroid_id,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {_cos_sql('v.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM v, cent)
            WHERE rn = 1),
        sizes AS (
            SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vectors
            FROM asg GROUP BY centroid_id),
        pc AS (
            SELECT c.centroid_id,
                   CAST(coalesce(s.n_vectors, 0) AS BIGINT) AS n_vectors
            FROM cent c LEFT JOIN sizes s ON c.centroid_id = s.centroid_id),
        tot AS (
            SELECT CAST(sum(n_vectors) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k
            FROM pc)
        SELECT centroid_id, n_vectors,
               CAST(n_vectors AS DOUBLE) / total AS share,
               CAST(n_vectors AS DOUBLE) * k / total AS skew
        FROM pc CROSS JOIN tot
    """


def q_streaming_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic admission gate driven through STRUCTURED STREAMING
    (``IvfIndex.ingest_stream`` under the marker-last epoch-commit
    protocol of streaming/ingest.py): the same 1-in-10 batch/corpus
    split as ``semantic_ingest``, but the batch arrives as TWO stream
    epochs (vec_id % 20 == 0, then % 20 == 10; one parquet file each,
    ``maxFilesPerTrigger=1``, mtime-ordered). The oracle recomposes the
    two ingests SEQUENTIALLY in SQL (epoch 0 against the built index,
    epoch 1 against index ∪ epoch-0 acceptances), so the per-epoch
    report classes get an external bit-exact check the pytest crash
    matrices can't provide. At sf0.01 the sequencing is exercised in
    the REJECTION direction: an epoch-1 vector whose only near-dup was
    itself rejected in epoch 0 is correctly admitted with NO report row
    — single-batch semantics would emit one and hash-mismatch. (The
    admitted-in-epoch-0-matched-as-corpus direction doesn't occur in
    this synthetic data at any tau; it is pinned by
    tests/test_similarity.py::test_ivf_index_ingest_stream_matches_
    batch_mode instead.) Returns the persisted reports table
    (vec_id, centroid_id, kept_id, sim, matched_in, epoch_id)."""
    import os
    import shutil
    import tempfile

    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % INCR_MOD != 0)
    epochs = [
        emb.filter(F.col("vec_id") % (2 * INCR_MOD) == 0),
        emb.filter(F.col("vec_id") % (2 * INCR_MOD) == INCR_MOD),
    ]
    root = tempfile.mkdtemp(prefix="sem_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, part in enumerate(epochs):
        stage = os.path.join(root, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{'ab'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        # deterministic epoch order: the file source sorts by mtime
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    cat = Catalog(spark, os.path.join(root, "wh"))
    idx = IvfIndex(cat, "sem_stream", n_centroids=SEMDEDUP_K)
    idx.build(corpus)
    stream = (
        spark.readStream.schema(epochs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx.ingest_stream(stream, os.path.join(root, "ckpt"), SEM_INGEST_TAU)
    return cat.get(idx.reports_table).orderBy(
        "epoch_id", "vec_id", "matched_in"
    )


def streaming_semantic_ingest_oracle(
    k: int = SEMDEDUP_K, tau: float = SEM_INGEST_TAU
) -> str:
    """DuckDB twin of the two-epoch streaming ingest: the shared
    assignment prefix, then epoch 0's ingest report over the built
    index, epoch 0's acceptance set, and epoch 1's report over index ∪
    acceptances — the SQL form of sequential ``IvfIndex.ingest`` calls
    (state tables are materialized intermediates of identical math)."""

    def _corpus_block(b: str, asg: str) -> str:
        return f"""
            SELECT b.vec_id, b.centroid_id, a.id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM {b} b
            JOIN {asg} a ON b.centroid_id = a.centroid_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON a.id = c.vec_id"""

    def _within_block(b: str) -> str:
        return f"""
            SELECT b.vec_id, b.centroid_id, b2.vec_id AS cid,
                   {_cos_sql('q.vec', 'c.vec')} AS sim
            FROM {b} b
            JOIN {b} b2 ON b.centroid_id = b2.centroid_id
                        AND b2.vec_id < b.vec_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON b2.vec_id = c.vec_id"""

    def _report(c: str, w: str) -> str:
        return f"""
            SELECT vec_id, centroid_id, min(cid) AS kept_id,
                   arg_min(sim, cid) AS sim, 'corpus' AS matched_in
            FROM {c} WHERE sim >= {tau} GROUP BY 1, 2
            UNION ALL
            SELECT vec_id, centroid_id, min(cid) AS kept_id,
                   arg_min(sim, cid) AS sim, 'batch' AS matched_in
            FROM {w} WHERE sim >= {tau} GROUP BY 1, 2"""

    return f"""
        WITH {_ivf_split_asg_ctes(k, materialized=True)},
        b0 AS MATERIALIZED (SELECT * FROM asgb WHERE vec_id % {2 * INCR_MOD} = 0),
        b1 AS MATERIALIZED (
            SELECT * FROM asgb WHERE vec_id % {2 * INCR_MOD} = {INCR_MOD}),
        c0 AS ({_corpus_block('b0', 'asgc')}),
        w0 AS ({_within_block('b0')}),
        rep0 AS MATERIALIZED ({_report('c0', 'w0')}),
        acc0 AS (
            SELECT vec_id AS id, centroid_id FROM b0
            WHERE vec_id NOT IN (SELECT vec_id FROM rep0)),
        asg1 AS (
            SELECT id, centroid_id FROM asgc
            UNION ALL
            SELECT id, centroid_id FROM acc0),
        c1 AS ({_corpus_block('b1', 'asg1')}),
        w1 AS ({_within_block('b1')}),
        rep1 AS ({_report('c1', 'w1')})
        SELECT vec_id, centroid_id, kept_id, sim, matched_in,
               CAST(0 AS BIGINT) AS epoch_id
        FROM rep0
        UNION ALL
        SELECT vec_id, centroid_id, kept_id, sim, matched_in,
               CAST(1 AS BIGINT) AS epoch_id
        FROM rep1
    """


def repetition_signals_oracle() -> str:
    """Same gram positions (1-indexed ranges), same distinct/mode math."""
    return rf"""
        WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
        g3 AS (SELECT doc_id,
                      CASE WHEN len(t) >= 3
                           THEN list_transform(range(1, len(t) - 1),
                                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                           ELSE [] END AS g
               FROM tok),
        base AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_3grams,
                        CASE WHEN len(g) > 0
                             THEN (len(g) - len(list_distinct(g))) / len(g)
                             ELSE 0.0 END AS dup_3gram_frac
                 FROM g3),
        g2 AS (SELECT doc_id, unnest(
                      CASE WHEN len(t) >= 2
                           THEN list_transform(range(1, len(t)),
                                i -> concat_ws(' ', t[i], t[i+1]))
                           ELSE [] END) AS g
               FROM tok),
        cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        top2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
                        CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                            AS top_2gram_frac
                 FROM cnt GROUP BY 1)
        SELECT b.doc_id, b.n_3grams, b.dup_3gram_frac,
               coalesce(t2.n_2grams, 0) AS n_2grams,
               coalesce(t2.top_2gram_frac, 0.0) AS top_2gram_frac
        FROM base b LEFT JOIN top2 t2 USING (doc_id)
    """


def mixture_weights_oracle() -> str:
    target = " UNION ALL ".join(
        f"SELECT '{lang}' AS lang, CAST({share} AS DOUBLE) AS target_share"
        for lang, share in TARGET_MIX.items()
    )
    return f"""
        WITH target AS ({target}),
        counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        total AS (SELECT count(*) AS n_total FROM documents)
        SELECT c.lang, c.n_docs,
               CAST(c.n_docs AS DOUBLE) / t.n_total AS natural_share,
               coalesce(tg.target_share, 0.0) AS target_share,
               least(CAST(1.0 AS DOUBLE),
                     coalesce(tg.target_share, 0.0) * t.n_total / c.n_docs)
                   AS sample_rate
        FROM counts c CROSS JOIN total t LEFT JOIN target tg USING (lang)
    """


EMBEDDING_QUANTIZE_ORACLE = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x)))
                         / CAST(127.0 AS DOUBLE) AS scale
              FROM v)
        SELECT vec_id, scale,
               CASE WHEN scale > 0
                    THEN array_to_string(list_transform(v,
                         x -> CAST(CAST(floor(x / scale + 0.5) AS BIGINT)
                                   AS VARCHAR)), ',')
                    ELSE array_to_string(list_transform(v, x -> '0'), ',')
               END AS q_csv
        FROM s
    """


# the single-window packing SQL — oracle twin for BOTH packing tiers
# (the sharded form is output-identical by construction)
_CHUNK_ORACLE = r"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT)
                       AS n_tokens
            FROM documents),
        s AS (
            SELECT doc_id, lang, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS start
            FROM t)
        SELECT doc_id, lang, n_tokens,
               CAST(start // 512 AS BIGINT) AS chunk_id,
               CAST(start % 512 AS BIGINT) AS chunk_offset
        FROM s
    """


def _marker_list(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


def text_stats_oracle() -> str:
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_computed,
                   CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT) AS n_punct,
                   CAST(len(list_filter({_TOK},
                        t -> list_contains({stop_list}, t))) AS BIGINT) AS n_stopwords,
                   CAST(length(array_to_string({_TOK}, '')) AS BIGINT) AS joined_len
            FROM documents),
        feats AS (
            SELECT doc_id, n_tokens, n_chars_computed, n_punct, n_stopwords,
                   n_punct / greatest(1, n_chars_computed) AS punct_ratio,
                   n_stopwords / greatest(1, n_tokens) AS stopword_ratio,
                   joined_len / greatest(1, n_tokens) AS avg_token_len
            FROM base)
        SELECT doc_id, n_tokens, n_chars_computed, n_punct, n_stopwords,
               punct_ratio, stopword_ratio, avg_token_len,
               (least(n_tokens / 100.0, 1.0) * 0.4
                + least(stopword_ratio * 4.0, 1.0) * 0.4
                + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2) AS quality
        FROM feats
    """


def corpus_prep_oracle() -> str:
    """SQL recomposition of pipelines.prepare_corpus: quality + lang per
    doc, filter, min-id-per-content dedup, token costing."""
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    hits = ",\n               ".join(
        f"CAST(len(list_filter({_TOK}, t -> list_contains({_marker_list(lang)}, t))) AS BIGINT) AS hits_{lang}"
        for lang in LANG_PRIORITY
    )
    bpe = BPE_RE.replace("'", "''")
    return rf"""
        WITH feats AS (
            SELECT doc_id, text,
                   CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_computed,
                   CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT) AS n_punct,
                   CAST(len(list_filter({_TOK},
                        t -> list_contains({stop_list}, t))) AS BIGINT) AS n_stopwords,
                   {hits}
            FROM documents),
        scored AS (
            SELECT doc_id, text,
                   (least(n_tokens / 100.0, 1.0) * 0.4
                    + least((n_stopwords / greatest(1, n_tokens)) * 4.0, 1.0) * 0.4
                    + (1.0 - least((n_punct / greatest(1, n_chars_computed)) * 5.0, 1.0)) * 0.2)
                       AS quality,
                   CASE
                     WHEN hits_en > 0 AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                     WHEN hits_es > 0 AND hits_es > hits_en AND hits_es >= hits_fr THEN 'es'
                     WHEN hits_fr > 0 AND hits_fr > hits_en AND hits_fr > hits_es THEN 'fr'
                     ELSE 'und'
                   END AS lang_pred
            FROM feats),
        kept AS (SELECT * FROM scored WHERE quality >= 0.45 AND lang_pred IN ('en')),
        reps AS (SELECT text, min(doc_id) AS doc_id FROM kept GROUP BY text)
        SELECT k.doc_id, k.lang_pred, k.quality,
               CAST(len(regexp_extract_all(k.text, '\S+')) AS BIGINT) AS n_ws,
               CAST(len(regexp_extract_all(k.text, '{bpe}')) AS BIGINT) AS n_bpe
        FROM kept k JOIN reps r ON k.doc_id = r.doc_id AND k.text = r.text
    """


def lang_id_oracle() -> str:
    hits = ",\n               ".join(
        f"CAST(len(list_filter({_TOK}, t -> list_contains({_marker_list(lang)}, t))) AS BIGINT) AS hits_{lang}"
        for lang in LANG_PRIORITY
    )
    return f"""
        WITH h AS (SELECT doc_id, {hits} FROM documents)
        SELECT doc_id, hits_en, hits_es, hits_fr,
               CASE
                 WHEN hits_en > 0 AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                 WHEN hits_es > 0 AND hits_es > hits_en AND hits_es >= hits_fr THEN 'es'
                 WHEN hits_fr > 0 AND hits_fr > hits_en AND hits_fr > hits_es THEN 'fr'
                 ELSE 'und'
               END AS lang_pred
        FROM h
    """


# ---------------------------------------------------------------------------
# r6: hybrid retrieval, LM-quality scoring, RAG chunking, curriculum
# ---------------------------------------------------------------------------

# hybrid retrieval shares BM25_QUERIES' ids: the embedding with vec_id ==
# query_id is the dense expression of the same information need (the test
# tables are row-aligned: doc_id ≡ vec_id)
FUSION_K = 10
HARDNEG_DENSE_K = 10


def _fusion_dense_sql(k: int) -> str:
    """Dense-retriever oracle reshaped to the (query_id, doc_id, rank)
    contract the fusion oracles compose over."""
    ids = [qid for qid, _ in BM25_QUERIES]
    return (
        "SELECT query_id, neighbor_id AS doc_id, score, rank FROM ("
        + similarity_topk_oracle(ids, k)
        + ")"
    )


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble search (operators/retrieval.rrf_fuse): reciprocal-rank
    fusion of the BM25 ranking with the raw term-frequency ranking for
    the same keyword queries — the standard rank-fusion merge of a RAG
    retrieval stack. Two LEXICAL runs are registered (their candidate
    sets coincide, so the both-lists merge path is exercised on real
    data — the synthetic embeddings never overlap a keyword run);
    the dense+sparse hybrid composition of the same operator is covered
    by tests/test_retrieval.py. Both inputs are top-k-bounded, so fusion
    cost is corpus-size-free; the two-run RRF sum is bit-exact without
    quantization (one division per list + one commutative add)."""
    from .cache import tracked_persist
    from .operators.retrieval import bm25_topk, rrf_fuse, term_tf, tf_topk

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus tokenize pass feeds both rankers (released by the
    # harness via cache.release_tracked)
    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    tf = tracked_persist(term_tf(docs, terms))
    return rrf_fuse(
        bm25_topk(docs, BM25_QUERIES, k=BM25_K, tf=tf),
        tf_topk(docs, BM25_QUERIES, k=BM25_K, tf=tf),
        k=FUSION_K,
    )


def rrf_fusion_oracle() -> str:
    from .operators.retrieval import rrf_fusion_oracle_sql, tf_topk_oracle_sql

    return rrf_fusion_oracle_sql(
        bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
        tf_topk_oracle_sql(BM25_QUERIES, k=BM25_K),
        k=FUSION_K,
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/retrieval.hard_negatives):
    documents the dense retriever ranks in its top-k that BM25 did NOT
    surface for the same query — semantically near, lexically unmatched,
    the classic contrastive-training negatives. Bounded anti-join of two
    top-k result sets."""
    from .operators.retrieval import bm25_topk, hard_negatives

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dense = cosine_topk(
        emb, [qid for qid, _ in BM25_QUERIES], k=HARDNEG_DENSE_K
    ).withColumnRenamed("neighbor_id", "doc_id")
    sparse = bm25_topk(docs, BM25_QUERIES, k=BM25_K)
    return hard_negatives(dense, sparse).orderBy("query_id", "rank")


def hard_negatives_oracle() -> str:
    from .operators.retrieval import hard_negatives_oracle_sql

    return hard_negatives_oracle_sql(
        _fusion_dense_sql(HARDNEG_DENSE_K),
        bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
    )


def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style LM quality scoring (operators/lm.py): every
    document's mean bigram log-probability under an add-one-smoothed
    bigram model trained on the corpus itself — the CCNet/KenLM filter
    signal. One tokenize pass, vocab-sized model tables, posting-list
    scoring join, quantize-before-sum determinism (the BM25 idiom)."""
    from .operators.lm import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)


def q_bigram_lm_quality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch approximate LM scoring
    (operators.lm.bigram_lm_scores_sketch) — the broadcastable-model
    scale path beside the exact ``bigram_lm_quality``. ROWS-ONLY by
    policy (the HLL vocab estimate has no DuckDB twin); error-bound
    gates vs the exact tier live in tests/test_lm.py."""
    from .operators.lm import bigram_lm_scores_sketch

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores_sketch(docs)


def q_perplexity_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-score data selection (operators/lm.perplexity_prune_report):
    per-language median-value threshold over the bigram-LM score
    distribution, keep-the-fluent-half — CCNet's perplexity filter as a
    value-threshold rule. The distribution/threshold machinery is
    bounded by score RESOLUTION, never corpus size; no corpus re-sort."""
    from .operators.lm import perplexity_prune_report

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_prune_report(docs)


def _perplexity_prune_oracle() -> str:
    from .operators.lm import perplexity_prune_oracle_sql

    return perplexity_prune_oracle_sql()


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking (operators/chunking.py): overlapping fixed-stride
    token windows per document — the table an ANN tier indexes instead
    of whole docs. Entirely scan-local (zero shuffle, zero UDF)."""
    from .operators.chunking import token_chunks

    docs = load_table(spark, sf_dir, "documents")
    return token_chunks(docs)


# temperature-scaled mixture: alpha = 0.5 == sqrt (correctly-rounded
# IEEE, engine-agnostic — a general pow() is not), the multilingual-LM
# rebalancing exponent of mBERT/XLM-R
TEMP_SCALE = 1_000_000


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture weights: sampling shares
    ∝ n^0.5 — upweights tail languages smoothly where mixture_weights'
    fixed TARGET_MIX pins shares explicitly. Per-language weights are
    sqrt-quantized to exact integers before the normalizing sum
    (|languages| addends — associativity-proof), shares and rates are
    single IEEE divisions. One language-sized groupBy + broadcast
    scalar total."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    c2 = counts.withColumn(
        "qw",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * TEMP_SCALE + F.lit(0.5))
        .cast("bigint"),
    )
    tot = c2.agg(
        F.sum("qw").alias("qsum"), F.sum("n_docs").alias("n_total")
    )
    shared = c2.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_total")).alias("natural_share"),
        (F.col("qw").cast("double") / F.col("qsum")).alias("temp_share"),
        "n_total",
    )
    return shared.select(
        "lang",
        "n_docs",
        "natural_share",
        "temp_share",
        F.least(
            F.lit(1.0),
            F.col("temp_share") * F.col("n_total") / F.col("n_docs"),
        ).alias("sample_rate"),
    )


MIXTURE_TEMPERATURE_ORACLE = f"""
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang),
    q AS (
        SELECT lang, n_docs,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {TEMP_SCALE} + 0.5)
                    AS BIGINT) AS qw
        FROM counts),
    tot AS (SELECT sum(qw) AS qsum, sum(n_docs) AS n_total FROM q),
    shared AS (
        SELECT lang, n_docs,
               CAST(n_docs AS DOUBLE) / n_total AS natural_share,
               CAST(qw AS DOUBLE) / qsum AS temp_share,
               n_total
        FROM q CROSS JOIN tot)
    SELECT lang, n_docs, natural_share, temp_share,
           least(CAST(1 AS DOUBLE),
                 temp_share * n_total / n_docs) AS sample_rate
    FROM shared
"""


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum manifest: documents staged clean → noisy by their
    Gopher-rule failure count (stage = min(failures, 2)), then
    deterministically shuffled WITHIN each stage (the grouped form of
    the two-level sharded md5 rank — no per-stage giant sort partition).
    The training loader reads stages in order; within a stage the order
    is the reproducible pseudo-random shuffle."""
    from .functions.text import gopher_rule_flags
    from .operators.sampling import shuffle_positions

    docs = load_table(spark, sf_dir, "documents")
    flagged = gopher_rule_flags(docs.select("doc_id", "text"))
    n_pass = sum(
        F.col(c).cast("int")
        for c in ("p_minlen", "p_toklen", "p_stopword", "p_symbol")
    )
    staged = flagged.select(
        "doc_id",
        F.least(F.lit(2), F.lit(4) - n_pass).cast("bigint").alias("stage"),
    )
    return shuffle_positions(
        staged, "doc_id", pos_col="stage_pos", group_cols=["stage"]
    ).select("doc_id", "stage", "stage_pos")


def curriculum_order_oracle() -> str:
    return f"""
        WITH base AS ({_qf_counts_sql("doc_id")}),
        flags AS (
            SELECT doc_id,
                   {_qf_flags_sql()}
            FROM base),
        staged AS (
            SELECT doc_id,
                   CAST(least(2, 4 - (CASE WHEN p_minlen THEN 1 ELSE 0 END
                                      + CASE WHEN p_toklen THEN 1 ELSE 0 END
                                      + CASE WHEN p_stop THEN 1 ELSE 0 END
                                      + CASE WHEN p_sym THEN 1 ELSE 0 END))
                        AS BIGINT) AS stage
            FROM flags)
        SELECT doc_id, stage,
               CAST(row_number() OVER (
                   PARTITION BY stage
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                   AS BIGINT) AS stage_pos
        FROM staged
    """


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution in power-of-2 buckets — the packing /
    truncation diagnostic (what fraction of the corpus exceeds the
    context window?). The bucket is ``len(bin(n))`` = floor(log2 n)+1 —
    exact INTEGER log2 via the binary string length, immune to float
    log2 rounding at bucket boundaries. One scan + a ≤64-group agg."""
    docs = load_table(spark, sf_dir, "documents")
    n = token_count_ws("text")
    return (
        docs.select(F.length(F.bin(n)).cast("bigint").alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_tokens"),
            F.max("n").cast("bigint").alias("max_tokens"),
        )
    )


# chunk-level ANN retrieval: the end-to-end RAG read path promised by
# operators/chunking.py — query docs retrieve their top chunks from the
# IVF-indexed chunk table, rolled up to documents. Params shared with
# the oracle builder (the round-3 one-side-parameter bug class).
CHUNK_ANN_QUERY_DOCS = [0, 1, 2]
CHUNK_ANN_K_CHUNKS = 20
CHUNK_ANN_K_DOCS = 5


def q_chunk_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end chunk-level ANN retrieval
    (operators.chunking.chunk_ann_doc_topk): documents → overlapping
    token windows → md5-derived chunk vectors → standing IvfIndex →
    per-query top-k chunks → doc rollup (max-sim per doc, min-chunk
    tiebreak). Each invocation rebuilds the chunk index so the result is
    a pure function of the inputs (the same rebuild-included pricing as
    ``semantic_ingest``); at scale the build amortizes across queries.
    The oracle recomputes chunking, embedding, quantizer assignment,
    probe/candidate funnel, rescoring, and both rollup windows in SQL."""
    from .catalog import Catalog
    from .operators.chunking import chunk_ann_doc_topk

    docs = load_table(spark, sf_dir, "documents")
    cat = Catalog(spark, _idx_root("chunk_ann_", sf_dir))
    return chunk_ann_doc_topk(
        docs,
        cat,
        "chunk_ann",
        CHUNK_ANN_QUERY_DOCS,
        k_chunks=CHUNK_ANN_K_CHUNKS,
        k_docs=CHUNK_ANN_K_DOCS,
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    ).orderBy("query_doc", "doc_rank")


def _chunk_index_ctes() -> str:
    """The shared CTE prefix of every chunk-index oracle: the chunk CTE
    (token_chunks_oracle_sql), the hex-slice embedding over packed
    chunk ids, the id-ordered seed centroids, and the quantizer
    assignment. ``cv`` is MATERIALIZED — multiple consumers (seeds,
    assignment, probes, rescoring) would otherwise re-chunk and re-hash
    the corpus per reference. ONE definition so the by-corpus-member
    and by-external-vector oracles can never drift on the index
    contract (the round-3 advice class)."""
    from .operators.chunking import (
        CHUNK_ID_SPAN,
        token_chunks_oracle_sql,
    )
    from .functions.hashes import duckdb_md5_slice_embedding

    emb = duckdb_md5_slice_embedding("chunk_text")
    return f"""ch AS ({token_chunks_oracle_sql()}),
        cv AS MATERIALIZED (
            SELECT doc_id * {CHUNK_ID_SPAN} + chunk_id AS id,
                   {emb} AS vec
            FROM ch),
        cent AS (SELECT id AS centroid_id, vec AS cvec
                 FROM cv ORDER BY id LIMIT {SIM_IVF_CENTROIDS}),
        asg AS (
            SELECT id, centroid_id FROM (
                SELECT c2.id, centroid_id,
                       row_number() OVER (
                           PARTITION BY c2.id
                           ORDER BY {_cos_sql('c2.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM cv c2, cent)
            WHERE rn = 1)"""


def chunk_ann_topk_oracle() -> str:
    """DuckDB twin of :func:`q_chunk_ann_topk`: the shared chunk-index
    prefix (``_chunk_index_ctes``), then exactly the stored-index IVF
    math of ``similarity_topk_ivf_oracle`` over packed chunk ids,
    followed by the two rollup windows."""
    from .operators.chunking import CHUNK_ID_SPAN

    qids = ", ".join(
        str(d * CHUNK_ID_SPAN) for d in CHUNK_ANN_QUERY_DOCS
    )
    return f"""
        WITH {_chunk_index_ctes()},
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.id AS query_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY q.id
                           ORDER BY {_cos_sql('q.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM cv q, cent WHERE q.id IN ({qids}))
            WHERE rn <= {SIM_IVF_NPROBE}),
        cand AS (
            SELECT DISTINCT query_id, a.id AS neighbor_id
            FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
            WHERE a.id != p.query_id),
        hits AS (
            SELECT query_id, neighbor_id, score FROM (
                SELECT query_id, neighbor_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id)
                           AS rank
                FROM (SELECT query_id, neighbor_id,
                             {_cos_sql('q.vec', 'c.vec')} AS score
                      FROM cand
                      JOIN cv q ON cand.query_id = q.id
                      JOIN cv c ON cand.neighbor_id = c.id))
            WHERE rank <= {CHUNK_ANN_K_CHUNKS}),
        best AS (
            SELECT query_doc, doc_id, chunk_id, score FROM (
                SELECT query_id // {CHUNK_ID_SPAN} AS query_doc,
                       neighbor_id // {CHUNK_ID_SPAN} AS doc_id,
                       neighbor_id % {CHUNK_ID_SPAN} AS chunk_id,
                       score,
                       row_number() OVER (
                           PARTITION BY query_id // {CHUNK_ID_SPAN},
                                        neighbor_id // {CHUNK_ID_SPAN}
                           ORDER BY score DESC,
                                    neighbor_id % {CHUNK_ID_SPAN}) AS rn
                FROM hits)
            WHERE rn = 1)
        SELECT query_doc, doc_id, score AS best_score,
               chunk_id AS best_chunk_id, doc_rank
        FROM (SELECT query_doc, doc_id, chunk_id, score,
                     CAST(row_number() OVER (
                         PARTITION BY query_doc
                         ORDER BY score DESC, doc_id) AS BIGINT) AS doc_rank
              FROM best)
        WHERE doc_rank <= {CHUNK_ANN_K_DOCS}
    """


# hybrid chunk retrieval: dense (free-text → chunk ANN → doc rollup)
# ⊕ sparse (BM25 over the documents) fused with RRF — the flagship RAG
# read path composed end to end. Query TEXTS are fixed constants; the
# sparse term lists derive from them with the same whitespace split the
# tokenizer reproduces (lowercase \w+ words only).
CHUNK_HYBRID_QUERIES = [
    (1, "hash join table scan"),
    (2, "sort merge window batch"),
    (3, "stream filter vector group"),
]
CHUNK_HYBRID_K = 10        # fused docs per query
CHUNK_HYBRID_K_CHUNKS = 40  # dense chunk candidates
CHUNK_HYBRID_K_DOCS = 20    # per-retriever doc candidates before fusion


def _hybrid_dense_run(dense: DataFrame) -> DataFrame:
    """Map the dense run's list POSITION back to the DECLARED qid — the
    fusion joins on query_id, so aligning by position alone would be
    correct only while the declared qids happen to be 1..N (ADVICE r7:
    an edited constant would misalign both engines identically and the
    oracle couldn't catch it). ONE definition shared by the rebuild-
    priced and standing-index hybrid forms."""
    qid_by_pos = F.array(
        *[F.lit(qid).cast("bigint") for qid, _ in CHUNK_HYBRID_QUERIES]
    )
    return dense.select(
        F.element_at(qid_by_pos, (F.col("query_idx") + 1).cast("int")).alias(
            "query_id"
        ),
        "doc_id",
        F.col("doc_rank").alias("rank"),
    )


def q_chunk_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RAG retrieval end to end: the SAME free-text queries run
    through (a) the chunk-level ANN path (embed → ``IvfIndex.search``
    with external negative ids → max-sim doc rollup) and (b) BM25 over
    the documents, then reciprocal-rank fusion merges the two ranked
    runs (``operators.retrieval.rrf_fuse``). Rebuilds the shared chunk
    index idempotently (same root/tables as ``chunk_ann_topk``). The
    oracle recomposes chunking, embedding, the IVF funnel with literal
    query vectors, the rollup, the BM25 pipeline, and the fusion — the
    whole hybrid journey checked bit-for-bit."""
    from .catalog import Catalog
    from .operators.chunking import chunk_ann_text_topk, chunk_vectors
    from .operators.retrieval import bm25_topk, rrf_fuse
    from .operators.similarity import IvfIndex

    docs = load_table(spark, sf_dir, "documents")
    cat = Catalog(spark, _idx_root("chunk_ann_", sf_dir))
    idx = IvfIndex(
        cat, "chunk_ann", n_centroids=SIM_IVF_CENTROIDS, nprobe=SIM_IVF_NPROBE
    )
    idx.build(chunk_vectors(docs).select("vec_id", "embedding"))
    dense = chunk_ann_text_topk(
        spark,
        cat,
        "chunk_ann",
        [t for _, t in CHUNK_HYBRID_QUERIES],
        k_chunks=CHUNK_HYBRID_K_CHUNKS,
        k_docs=CHUNK_HYBRID_K_DOCS,
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    )
    dense_run = _hybrid_dense_run(dense)
    sparse_run = bm25_topk(
        docs,
        [(qid, t.split()) for qid, t in CHUNK_HYBRID_QUERIES],
        k=CHUNK_HYBRID_K_DOCS,
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse(dense_run, sparse_run, k=CHUNK_HYBRID_K)


def _chunk_ann_text_run_sql() -> str:
    """(query_id, doc_id, rank) oracle for the dense side of the hybrid
    query: the shared chunk-index prefix, literal md5-slice query
    vectors under NEGATIVE ids (the Spark side's external-id rule — a
    negative id can never exclude a packed chunk), the IVF funnel, and
    the doc rollup; the internal negative ids map back to the DECLARED
    qids through an explicit (position, qid) VALUES table at the end —
    the same mapping the Spark side performs — so the alignment survives
    edits to the declared qid constants."""
    from .functions.hashes import duckdb_md5_slice_embedding
    from .operators.chunking import CHUNK_ID_SPAN

    vals = ", ".join(
        f"(CAST({-i - 1} AS BIGINT), {duckdb_md5_slice_embedding(_sql_str(t))})"
        for i, (_qid, t) in enumerate(CHUNK_HYBRID_QUERIES)
    )
    # Positional internal id → DECLARED qid, mirroring the Spark side's
    # explicit element_at mapping (never assume qid == position + 1).
    qmap_vals = ", ".join(
        f"({i + 1}, CAST({qid} AS BIGINT))"
        for i, (qid, _t) in enumerate(CHUNK_HYBRID_QUERIES)
    )
    return f"""
        WITH {_chunk_index_ctes()},
        q AS (SELECT * FROM (VALUES {vals}) AS t(query_id, vec)),
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.query_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_cos_sql('q.vec', 'cvec')} DESC, centroid_id)
                           AS rn
                FROM q, cent)
            WHERE rn <= {SIM_IVF_NPROBE}),
        cand AS (
            SELECT DISTINCT query_id, a.id AS neighbor_id
            FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
            WHERE a.id != p.query_id),
        hits AS (
            SELECT query_id, neighbor_id, score FROM (
                SELECT query_id, neighbor_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id)
                           AS rank
                FROM (SELECT cand.query_id, cand.neighbor_id,
                             {_cos_sql('q.vec', 'c.vec')} AS score
                      FROM cand
                      JOIN q ON cand.query_id = q.query_id
                      JOIN cv c ON cand.neighbor_id = c.id))
            WHERE rank <= {CHUNK_HYBRID_K_CHUNKS}),
        best AS (
            SELECT query_id, doc_id, score FROM (
                SELECT query_id,
                       neighbor_id // {CHUNK_ID_SPAN} AS doc_id,
                       score,
                       row_number() OVER (
                           PARTITION BY query_id,
                                        neighbor_id // {CHUNK_ID_SPAN}
                           ORDER BY score DESC,
                                    neighbor_id % {CHUNK_ID_SPAN}) AS rn
                FROM hits)
            WHERE rn = 1)
        SELECT qmap.qid AS query_id, doc_id, doc_rank AS rank
        FROM (SELECT query_id, doc_id,
                     CAST(row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY score DESC, doc_id) AS BIGINT) AS doc_rank
              FROM best) r
        JOIN (SELECT * FROM (VALUES {qmap_vals}) AS m(pos, qid)) qmap
          ON qmap.pos = -r.query_id
        WHERE doc_rank <= {CHUNK_HYBRID_K_DOCS}
    """


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (the query texts are plain
    lowercase words, but escape anyway)."""
    return "'" + s.replace("'", "''") + "'"


def chunk_hybrid_topk_oracle() -> str:
    """RRF composition of the dense chunk-ANN run oracle and the BM25
    oracle — the same composition the Spark side performs."""
    from .operators.retrieval import rrf_fusion_oracle_sql

    sparse = bm25_oracle_sql(
        [(qid, t.split()) for qid, t in CHUNK_HYBRID_QUERIES],
        k=CHUNK_HYBRID_K_DOCS,
    )
    return rrf_fusion_oracle_sql(
        _chunk_ann_text_run_sql(), sparse, k=CHUNK_HYBRID_K
    )


def _lm_oracle() -> str:
    from .operators.lm import bigram_lm_oracle_sql

    return bigram_lm_oracle_sql()


def _chunks_oracle() -> str:
    from .operators.chunking import token_chunks_oracle_sql

    return token_chunks_oracle_sql()


# ---------------------------------------------------------------------------
# Standing-index READ-path pricing + takedown (tombstone) journeys
# ---------------------------------------------------------------------------
#
# Every index-backed query above rebuilds its index per invocation so
# the result is a pure function of the inputs (the oracle-purity
# contract) — which makes their bench rows fixed-overhead-dominated:
# they swing 2–4× window-to-window on identical code (BENCH_r07_local
# notes) and drown real regressions. The `_read` forms below price the
# READ path alone — the number a serving user actually pays per query
# once the index stands. Mechanism: a process-level build memo — the
# first invocation in a process builds the standing index (bench's
# unmeasured warmup; the driver's fresh process pays it once before
# the compare), every later invocation searches only. The index is
# never mutated by a read, so repeat invocations are pure. The oracle
# is the SAME SQL as the rebuild-priced sibling: identical math, the
# index tables are materialized intermediates.

_STANDING_BUILT: set[tuple[str, str]] = set()


def _standing_index(kind: str, sf_dir: str, build_fn) -> None:
    """Run ``build_fn`` once per (kind, sf_dir) per process."""
    key = (kind, sf_dir)
    if key not in _STANDING_BUILT:
        build_fn()
        _STANDING_BUILT.add(key)


def q_similarity_topk_ivf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``similarity_topk_ivf_idx``'s READ path: top-k over the STANDING
    IVF index — probe the broadcast quantizer, join the bucketed posting
    lists, rescore candidates. No build in the measured path; only the
    query/probe/candidate funnel ever shuffles."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    cat = Catalog(spark, _idx_root("ivf_read_", sf_dir))
    idx = IvfIndex(
        cat, "ivf_read", n_centroids=SIM_IVF_CENTROIDS, nprobe=SIM_IVF_NPROBE
    )
    _standing_index(
        "ivf_read", sf_dir,
        lambda: idx.build(load_table(spark, sf_dir, "embeddings")),
    )
    return idx.search_ids(SIM_QUERY_IDS, k=SIM_K)


def q_embedding_neardup_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_neardup_idx``'s READ path: the semantic near-dup
    check of the 1-in-10 batch against the STANDING corpus index —
    per-check cost ∝ |batch| × probed-cluster population, never
    |corpus|; the corpus is never re-assigned or shuffled.

    SCALE CONTRACT (measured, SCALE.md §"Second decade"): this
    registered form pins ``n_centroids=SEMDEDUP_K`` because its oracle
    recomposes the same quantizer — that makes per-cluster population
    ∝ N, so candidate volume grows ∝ N²/K and the row is a PARITY
    tier, not a scale path (at 100× sf0.1 its shuffle spill exceeded
    the box's disk). Production sizing is ``IvfIndex(n_centroids=None)``
    → ``ivf_capacity``'s √N rule, measured to complete the same 100×
    check at 48× the sf0.1 cost (0.84/decade) with recall gated in
    tests/test_capacity.py."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    cat = Catalog(spark, _idx_root("semdup_read_", sf_dir))
    idx = IvfIndex(cat, "semdup_read", n_centroids=SEMDEDUP_K)
    _standing_index(
        "semdup_read", sf_dir,
        lambda: idx.build(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") % INCR_MOD != 0
            )
        ),
    )
    new = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % INCR_MOD == 0
    )
    return idx.neardup_check(new, SEMDEDUP_TAU).orderBy("vec_id")


def q_incremental_neardup_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``incremental_neardup_idx``'s READ path: the lexical near-dup
    check of the 1-in-10 batch against the STANDING MinHash-LSH index —
    only the batch is tokenized and shuffled; the corpus is scanned as
    pre-partitioned hashed-int parquet."""
    from .catalog import Catalog
    from .operators.dedup import NearDupIndex

    cat = Catalog(spark, _idx_root("neardup_read_", sf_dir))
    idx = NearDupIndex(
        cat, "neardup_read", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    _standing_index(
        "neardup_read", sf_dir,
        lambda: idx.build(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % INCR_MOD != 0
            )
        ),
    )
    new = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % INCR_MOD == 0
    )
    return idx.check(new)


def _ensure_bm25_read_index(spark: SparkSession, sf_dir: str):
    """The standing BM25 inverted index over `documents`, built once per
    process — shared by the sparse read row AND the hybrid read row."""
    from .catalog import Catalog
    from .operators.retrieval import Bm25Index

    cat = Catalog(spark, _idx_root("bm25_read_", sf_dir))
    idx = Bm25Index(cat, "bm25_read")
    _standing_index(
        "bm25_read", sf_dir,
        lambda: idx.build(load_table(spark, sf_dir, "documents")),
    )
    return idx


def _ensure_chunk_read_index(spark: SparkSession, sf_dir: str):
    """The standing chunk-vector IVF index, built once per process —
    shared by the dense chunk read row AND the hybrid read row."""
    from .catalog import Catalog
    from .operators.chunking import chunk_vectors
    from .operators.similarity import IvfIndex

    cat = Catalog(spark, _idx_root("chunk_read_", sf_dir))

    def build() -> None:
        docs = load_table(spark, sf_dir, "documents")
        idx = IvfIndex(
            cat,
            "chunk_ann_read",
            n_centroids=SIM_IVF_CENTROIDS,
            nprobe=SIM_IVF_NPROBE,
        )
        idx.build(chunk_vectors(docs).select("vec_id", "embedding"))

    _standing_index("chunk_ann_read", sf_dir, build)
    return cat


def q_bm25_topk_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bm25_topk``'s READ path: the standing catalog-persisted
    inverted index (``operators.retrieval.Bm25Index`` — postings/df
    bucketed on tok, lengths on doc_id, one-row stats). The serving
    query filters postings and df to the query terms at the scan
    (bucket-prunable) and shuffles only query-sized frames; the shared
    scoring core makes it bit-identical to the recompute form, so the
    oracle is the same SQL."""
    return _ensure_bm25_read_index(spark, sf_dir).search(BM25_QUERIES, k=BM25_K)


def q_chunk_ann_topk_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``chunk_ann_topk``'s READ path: chunk-level ANN retrieval against
    the STANDING chunk index (``chunk_ann_doc_search``) — the per-query
    serving cost of the RAG read path: probe/rescore funnel + two
    bounded rollup windows, nothing corpus-sized."""
    from .operators.chunking import chunk_ann_doc_search

    cat = _ensure_chunk_read_index(spark, sf_dir)
    return chunk_ann_doc_search(
        cat,
        "chunk_ann_read",
        CHUNK_ANN_QUERY_DOCS,
        k_chunks=CHUNK_ANN_K_CHUNKS,
        k_docs=CHUNK_ANN_K_DOCS,
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    ).orderBy("query_doc", "doc_rank")


def q_bm25_ingest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted-index maintenance end to end
    (``Bm25Index.ingest``): build the standing index over the 90%
    corpus, ADMIT the 1-in-10 batch (postings/lengths appends with
    anti-join retry healing; df and stats re-derived idempotently from
    the stored postings — the tok-bucketed aggregate adds no Exchange),
    then search. The post-ingest index must be indistinguishable from
    one built over the full corpus, so the oracle is the UNSPLIT BM25
    SQL — the strongest possible check that the incremental path
    reconstructs every corpus-global statistic exactly."""
    from .catalog import Catalog
    from .operators.retrieval import Bm25Index

    docs = load_table(spark, sf_dir, "documents")
    cat = Catalog(spark, _idx_root("bm25_ing_", sf_dir))
    idx = Bm25Index(cat, "bm25_ing")
    idx.build(docs.filter(F.col("doc_id") % INCR_MOD != 0))
    idx.ingest(docs.filter(F.col("doc_id") % INCR_MOD == 0))
    return idx.search(BM25_QUERIES, k=BM25_K)


def q_chunk_hybrid_topk_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``chunk_hybrid_topk``'s READ path — the full RAG SERVING journey
    against standing state only: the same free-text queries run through
    (a) the standing chunk IVF index (shared with ``chunk_ann_topk_read``)
    and (b) the standing BM25 inverted index (shared with
    ``bm25_topk_read``), fused with RRF. This is the number a retrieval
    service pays per hybrid query once both indexes exist — the
    rebuild-priced sibling prices the bootstrap. Same math end to end ⇒
    same oracle."""
    from .operators.chunking import chunk_ann_text_topk
    from .operators.retrieval import rrf_fuse

    cat = _ensure_chunk_read_index(spark, sf_dir)
    bidx = _ensure_bm25_read_index(spark, sf_dir)
    dense = chunk_ann_text_topk(
        spark,
        cat,
        "chunk_ann_read",
        [t for _, t in CHUNK_HYBRID_QUERIES],
        k_chunks=CHUNK_HYBRID_K_CHUNKS,
        k_docs=CHUNK_HYBRID_K_DOCS,
        n_centroids=SIM_IVF_CENTROIDS,
        nprobe=SIM_IVF_NPROBE,
    )
    dense_run = _hybrid_dense_run(dense)
    sparse_run = bidx.search(
        [(qid, t.split()) for qid, t in CHUNK_HYBRID_QUERIES],
        k=CHUNK_HYBRID_K_DOCS,
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse(dense_run, sparse_run, k=CHUNK_HYBRID_K)


# takedown journeys: delete admitted ids from the standing indexes,
# then prove every read path behaves as if they were never admitted.
# The residues are chosen DISJOINT from the query-id sets (a tombstoned
# query id is treated as absent — a different, separately-tested rule).
IVF_DELETE_MOD = 9
# residue 5 (5, 14, 23, …): disjoint from SIM_QUERY_IDS and chosen so
# the takedown VISIBLY changes the sf0.01 result (baseline neighbors
# 149/365/482 are ≡5 mod 9) — a residue missing the baseline would let
# a no-op delete pass the driver gate
IVF_DELETE_RESIDUE = 5


def q_ivf_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the vector index: build, tombstone every vec_id ≡
    {IVF_DELETE_RESIDUE} (mod {IVF_DELETE_MOD}) (``IvfIndex.delete`` —
    one O(|deleted|) atomic append), then search. The oracle narrows
    the CANDIDATE side only: deletion never retrains the quantizer, it
    just makes the ids unreachable — ``_live_assign``'s contract,
    checked bit-for-bit."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    cat = Catalog(spark, _idx_root("ivf_del_", sf_dir))
    idx = IvfIndex(
        cat, "ivf_del", n_centroids=SIM_IVF_CENTROIDS, nprobe=SIM_IVF_NPROBE
    )
    idx.build(emb)
    idx.delete(
        emb.filter(
            F.col("vec_id") % IVF_DELETE_MOD == IVF_DELETE_RESIDUE
        ).select("vec_id")
    )
    return idx.search_ids(SIM_QUERY_IDS, k=SIM_K)


# corpus docs doc_id ≡ 2 (mod 10) taken down — a residue that VISIBLY
# changes the sf0.01 result (baseline matches include corpus docs 92
# and 332), so a no-op delete cannot pass the driver gate
NEARDUP_DELETE_RESIDUE = 2


def q_neardup_delete_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the lexical index: build over the 90% corpus,
    tombstone every doc_id ≡ {NEARDUP_DELETE_RESIDUE} (mod {INCR_MOD})
    (``NearDupIndex.delete``), then check the 1-in-10 batch. The oracle
    narrows the corpus side everywhere the Spark side's live view
    reaches — candidate generation AND the hot-bucket cap are computed
    on the live set on both engines."""
    from .catalog import Catalog
    from .operators.dedup import NearDupIndex

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    cat = Catalog(spark, _idx_root("neardup_del_", sf_dir))
    idx = NearDupIndex(
        cat, "neardup_del", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    idx.build(corpus)
    idx.delete(
        docs.filter(
            F.col("doc_id") % INCR_MOD == NEARDUP_DELETE_RESIDUE
        ).select("doc_id")
    )
    return idx.check(new)


def q_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exemplar replacement on the STANDING dedup index
    (``NearDupIndex.ingest_keep_best`` — the index form of
    ``dedup_keep_best``): build the quality-indexed corpus (q = exact
    token count, the batch operator's score), ingest the 1-in-10 batch
    under keep-best semantics — intra-batch CC resolution, then the
    PAIRWISE corpus challenge where a challenger must beat every live
    incumbent it collides with, and each admission tombstones exactly
    the incumbents it matched — and return the resulting LIVE exemplar
    set (id, q). The oracle recomposes the whole journey relationally:
    batch CC over the intra-batch pair graph (recursive CTE) + argmax,
    the capped asymmetric challenge, the struct-compare decision, and
    the final corpus − beaten ∪ admitted set — so a keep-best that
    replaces nothing, or first-seen-wins in disguise, cannot match."""
    from .catalog import Catalog
    from .functions.text import token_count
    from .operators.dedup import NearDupIndex
    from .operators.tombstones import live

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", token_count("text")
    )
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    cat = Catalog(spark, _idx_root("neardup_kb_", sf_dir))
    idx = NearDupIndex(
        cat, "neardup_kb", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    idx.build(corpus, quality_col="q")
    idx.ingest_keep_best(batch, "q")
    return (
        live(cat, "neardup_kb", cat.get_bucketed(idx.quality_table))
        .select("id", "q")
        .orderBy("id")
    )


def neardup_keep_best_oracle() -> str:
    """DuckDB twin of ``q_neardup_keep_best``: the full keep-best ingest
    journey in one relational program — same shingle/minhash/band/cap
    funnel as ``incremental_neardup_oracle``, the batch's own pair graph
    closed transitively (the ``dedup_groups`` recursive-CTE machinery)
    with the (q desc, id) argmax per batch cluster, the pairwise corpus
    challenge decided by the identical exact-integer struct compare
    (beat the (q, -id)-max incumbent ⇒ beat all), and the final live
    set = corpus − beaten ∪ admitted."""
    return rf"""
        WITH RECURSIVE {_SHINGLE_CTE}, {_hashed_shingle_cte()},
        qual AS (
            SELECT doc_id AS id,
                   CAST(len(regexp_extract_all(lower(text), '\w+'))
                        AS BIGINT) AS q
            FROM documents),
        hn AS (SELECT * FROM hsh WHERE id % {INCR_MOD} = 0),
        hc AS (SELECT * FROM hsh WHERE id % {INCR_MOD} != 0),
        sig_n AS ({_sig_select_sql('hn')}),
        sig_c AS ({_sig_select_sql('hc')}),
        bn_raw AS ({_band_select_sql('sig_n')}),
        bc_raw AS ({_band_select_sql('sig_c')}),
        bnsz AS (SELECT band_idx, band_hash, count(*) AS n
                 FROM bn_raw GROUP BY 1, 2),
        bnc AS (SELECT r.* FROM bn_raw r JOIN bnsz USING (band_idx, band_hash)
                WHERE bnsz.n <= {SKEW_CAP}),
        wcand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bnc a JOIN bnc b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.id < b.id),
        wsz AS (SELECT id, count(*) AS sz FROM hn GROUP BY id),
        winter AS (
            SELECT c.id_a, c.id_b, count(*) AS ic
            FROM wcand c
            JOIN hn x ON x.id = c.id_a
            JOIN hn y ON y.id = c.id_b AND y.h = x.h
            GROUP BY 1, 2),
        wpairs AS (
            SELECT i.id_a, i.id_b
            FROM winter i JOIN wsz a ON i.id_a = a.id JOIN wsz b ON i.id_b = b.id
            WHERE i.ic * 1.0 / (a.sz + b.sz - i.ic) >= {MINHASH_THRESHOLD}),
        wedges AS (SELECT id_a AS s, id_b AS d FROM wpairs
                   UNION SELECT id_b, id_a FROM wpairs),
        wreach(s, d) AS (
            SELECT s, d FROM wedges
            UNION
            SELECT r.s, e.d FROM wreach r JOIN wedges e ON r.d = e.s),
        bdocs AS (SELECT doc_id AS id FROM documents
                  WHERE doc_id % {INCR_MOD} = 0),
        wgroups AS (
            SELECT b.id, least(b.id, coalesce(min(r.d), b.id)) AS group_id
            FROM bdocs b LEFT JOIN wreach r ON r.s = b.id
            GROUP BY b.id),
        challengers AS (
            SELECT id FROM (
                SELECT g.id,
                       row_number() OVER (PARTITION BY g.group_id
                                          ORDER BY q.q DESC, g.id) AS rn
                FROM wgroups g JOIN qual q USING (id))
            WHERE rn = 1),
        bcsz AS (SELECT band_idx, band_hash, count(*) AS n
                 FROM bc_raw GROUP BY 1, 2),
        bc AS (SELECT r.* FROM bc_raw r JOIN bcsz USING (band_idx, band_hash)
               WHERE bcsz.n <= {SKEW_CAP}),
        ccand AS (
            SELECT DISTINCT n.id AS id_new, c.id AS id_corpus
            FROM bn_raw n
            JOIN challengers ch ON n.id = ch.id
            JOIN bc c ON n.band_idx = c.band_idx
                     AND n.band_hash = c.band_hash
                     AND n.id != c.id),
        szc AS (SELECT id, count(*) AS sz FROM hc GROUP BY id),
        cinter AS (
            SELECT cd.id_new, cd.id_corpus, count(*) AS ic
            FROM ccand cd
            JOIN hn x ON x.id = cd.id_new
            JOIN hc y ON y.id = cd.id_corpus AND y.h = x.h
            GROUP BY 1, 2),
        cpairs AS (
            SELECT i.id_new, i.id_corpus
            FROM cinter i JOIN wsz a ON i.id_new = a.id
                          JOIN szc b ON i.id_corpus = b.id
            WHERE i.ic * 1.0 / (a.sz + b.sz - i.ic) >= {MINHASH_THRESHOLD}),
        chal AS (
            SELECT p.id_new, p.id_corpus, qn.q AS q_new, qc.q AS q_inc
            FROM cpairs p
            JOIN qual qn ON qn.id = p.id_new
            JOIN qual qc ON qc.id = p.id_corpus),
        best_inc AS (
            SELECT id_new, q_inc AS q_best, id_corpus AS best_id FROM (
                SELECT id_new, id_corpus, q_inc,
                       row_number() OVER (PARTITION BY id_new
                                          ORDER BY q_inc DESC, id_corpus)
                           AS rn
                FROM chal)
            WHERE rn = 1),
        admitted AS (
            SELECT ch.id FROM challengers ch
            JOIN qual q ON q.id = ch.id
            LEFT JOIN best_inc b ON b.id_new = ch.id
            WHERE b.id_new IS NULL OR q.q > b.q_best
               OR (q.q = b.q_best AND ch.id < b.best_id)),
        beaten AS (
            SELECT DISTINCT c.id_corpus AS id
            FROM chal c JOIN admitted a ON a.id = c.id_new),
        lve AS (
            SELECT q.id, q.q FROM qual q
            WHERE q.id % {INCR_MOD} != 0
              AND q.id NOT IN (SELECT id FROM beaten)
            UNION ALL
            SELECT a.id, q.q FROM admitted a JOIN qual q ON q.id = a.id)
        SELECT id, q FROM lve ORDER BY id
    """


# BM25 takedown: residue 9 (mod 10) hits 6 of the 30 baseline top-k docs
# at sf0.01, so a no-op delete (or one that hides postings without
# re-deriving df/N/avgdl) cannot hash-match the pruned-corpus oracle
BM25_DELETE_MOD = 10
BM25_DELETE_RESIDUE = 9


def q_bm25_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the inverted index (``Bm25Index.delete`` — VERDICT r8
    item 2): build over the full corpus, tombstone every doc_id ≡
    {BM25_DELETE_RESIDUE} (mod {BM25_DELETE_MOD}) in one O(|deleted|)
    atomic append, then search. The hard part a posting-hiding shortcut
    would fail: BM25 scores depend on CORPUS-GLOBAL statistics, so the
    live read recomputes df from the live query-term postings and
    N/avgdl from the live lengths — the oracle is the full BM25 SQL
    over the PRUNED corpus, checking every global statistic shifted."""
    from .catalog import Catalog
    from .operators.retrieval import Bm25Index

    docs = load_table(spark, sf_dir, "documents")
    cat = Catalog(spark, _idx_root("bm25_del_", sf_dir))
    idx = Bm25Index(cat, "bm25_del")
    idx.build(docs)
    idx.delete(
        docs.filter(
            F.col("doc_id") % BM25_DELETE_MOD == BM25_DELETE_RESIDUE
        ).select("doc_id")
    )
    return idx.search(BM25_QUERIES, k=BM25_K)


def q_streaming_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING quality-aware exemplar replacement (VERDICT r9 item 2:
    ``NearDupIndex.ingest_stream_keep_best`` under the snapshot-isolated
    epoch protocol): build the quality-indexed corpus (q = exact token
    count), then drain the 1-in-10 batch as TWO stream epochs (doc_id %
    20 == 0, then % 20 == 10; one parquet file each, mtime-ordered,
    ``maxFilesPerTrigger=1``). Each epoch's corpus challenge is pinned
    to catalog hardlink snapshots taken at epoch start, so replays
    re-derive decisions bit-exact even after the epoch's tombstones
    committed (the crash matrix is pytest; THIS row checks the
    sequential semantics externally). The oracle recomposes BOTH
    keep-best epochs SEQUENTIALLY — epoch 0 challenges the built
    corpus, epoch 1 challenges (corpus − beaten₀) ∪ admitted₀ — with
    the full decision tier (CC + argmax + pairwise challenge + outcome/
    kept_by/n_replaced), so single-batch semantics, first-seen-wins in
    disguise, or a challenge that reads post-epoch state cannot
    hash-match. Returns the persisted per-epoch decision reports."""
    import os
    import shutil
    import tempfile

    from .catalog import Catalog
    from .functions.text import token_count
    from .operators.dedup import NearDupIndex

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", token_count("text")
    )
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    epochs = [
        docs.filter(F.col("doc_id") % (2 * INCR_MOD) == 0),
        docs.filter(F.col("doc_id") % (2 * INCR_MOD) == INCR_MOD),
    ]
    root = tempfile.mkdtemp(prefix="kb_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, part in enumerate(epochs):
        stage = os.path.join(root, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{'ab'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    cat = Catalog(spark, os.path.join(root, "wh"))
    idx = NearDupIndex(
        cat, "kb_stream", threshold=MINHASH_THRESHOLD, max_bucket=SKEW_CAP
    )
    idx.build(corpus, quality_col="q")
    stream = (
        spark.readStream.schema(epochs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx.ingest_stream_keep_best(stream, os.path.join(root, "ckpt"), "q")
    return (
        cat.get(idx.kb_reports_table)
        .select("epoch_id", "id", "q", "outcome", "kept_by", "n_replaced")
        .orderBy("epoch_id", "id")
    )


def q_streaming_semantic_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING keep-best on the SEMANTIC index
    (``IvfIndex.ingest_stream_keep_best`` — the embedding-space twin of
    ``streaming_keep_best``, completing the snapshot-isolated protocol's
    symmetry across both dedup-capable indexes): quality = n_chars
    (vec_id aligns with doc_id), corpus = the 9-in-10 split built
    quality-indexed, the 1-in-10 batch drained as TWO stream epochs
    (vec_id % 20 == 0 then % 20 == 10, mtime-ordered files). Each
    epoch's corpus challenge reads centroids/assign/vectors/quality/
    tombstones from hardlink snapshots pinned at epoch start, so
    replays re-derive decisions bit-exact across the tombstone commit.
    The oracle recomposes BOTH epochs SEQUENTIALLY (epoch 1 challenges
    (corpus − beaten₀) ∪ admitted₀ under the SAME corpus-seeded
    centroids — exactly the pinned-centroids contract)."""
    return _streaming_skb_journey(spark, sf_dir, SEMDEDUP_K)


def _streaming_skb_journey(
    spark: SparkSession, sf_dir: str, n_centroids: int | None
) -> DataFrame:
    """The semantic streaming keep-best journey with the quantizer
    sizing as a knob: the registered row passes the explicit parity
    constant its oracle bakes in; ``tools/decade_bench.py`` passes
    ``None`` (√N capacity) to measure the protocol's second decade on
    the sizing production would actually run (SCALE.md)."""
    import os
    import shutil
    import tempfile

    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qual = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("q")
    )
    embq = emb.join(qual, "vec_id").select("vec_id", "embedding", "q")
    corpus = embq.filter(F.col("vec_id") % INCR_MOD != 0)
    epochs = [
        embq.filter(F.col("vec_id") % (2 * INCR_MOD) == 0),
        embq.filter(F.col("vec_id") % (2 * INCR_MOD) == INCR_MOD),
    ]
    root = tempfile.mkdtemp(prefix="skb_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, part in enumerate(epochs):
        stage = os.path.join(root, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{'ab'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    cat = Catalog(spark, os.path.join(root, "wh"))
    idx = IvfIndex(cat, "skb_stream", n_centroids=n_centroids)
    idx.build(corpus, quality_col="q")
    stream = (
        spark.readStream.schema(epochs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx.ingest_stream_keep_best(
        stream, os.path.join(root, "ckpt"), SEM_INGEST_TAU, "q"
    )
    return (
        cat.get(idx.kb_reports_table)
        .select("epoch_id", "id", "q", "outcome", "kept_by", "n_replaced")
        .orderBy("epoch_id", "id")
    )


def _ivf_kb_epoch_block(e: int, residue: int, live: str, tau: float) -> str:
    """One SEMANTIC keep-best epoch as SQL CTEs (both epochs of
    ``streaming_semantic_keep_best_oracle``): the batch's same-cluster
    cos ≥ tau pair graph → transitive CC → (q desc, id) argmax →
    pairwise challenge against the ``live`` id set under the SHARED
    corpus-seeded centroids → struct-compare decision → report +
    beaten/admitted sets, suffixed ``{e}``."""
    return f"""
        be{e} AS MATERIALIZED (
            SELECT * FROM asgall WHERE vec_id % {2 * INCR_MOD} = {residue}),
        bp{e} AS (
            SELECT b2.vec_id AS id_a, b.vec_id AS id_b
            FROM be{e} b
            JOIN be{e} b2 ON b.centroid_id = b2.centroid_id
                          AND b2.vec_id < b.vec_id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON b2.vec_id = c.vec_id
            WHERE {_cos_sql('q.vec', 'c.vec')} >= {tau}),
        sedges{e} AS (SELECT id_a AS s, id_b AS d FROM bp{e}
                      UNION SELECT id_b, id_a FROM bp{e}),
        sreach{e}(s, d) AS (
            SELECT s, d FROM sedges{e}
            UNION
            SELECT r.s, ed.d FROM sreach{e} r JOIN sedges{e} ed ON r.d = ed.s),
        sgroups{e} AS (
            SELECT b.vec_id AS id,
                   least(b.vec_id, coalesce(min(r.d), b.vec_id)) AS group_id
            FROM be{e} b LEFT JOIN sreach{e} r ON r.s = b.vec_id
            GROUP BY b.vec_id),
        sranked{e} AS MATERIALIZED (
            SELECT g.id, g.group_id, q.q,
                   row_number() OVER (PARTITION BY g.group_id
                                      ORDER BY q.q DESC, g.id) AS rn
            FROM sgroups{e} g JOIN qual q USING (id)),
        swinners{e} AS (SELECT group_id, id AS kept_id FROM sranked{e}
                        WHERE rn = 1),
        schal{e} AS MATERIALIZED (
            SELECT b.vec_id AS id_new, a.vec_id AS id_corpus,
                   qn.q AS q_new, qc.q AS q_inc
            FROM be{e} b
            JOIN sranked{e} ch ON ch.id = b.vec_id AND ch.rn = 1
            JOIN asgall a ON b.centroid_id = a.centroid_id
            JOIN {live} l ON a.vec_id = l.id
            JOIN v q ON b.vec_id = q.vec_id
            JOIN v c ON a.vec_id = c.vec_id
            JOIN qual qn ON qn.id = b.vec_id
            JOIN qual qc ON qc.id = a.vec_id
            WHERE {_cos_sql('q.vec', 'c.vec')} >= {tau}),
        sbest{e} AS (
            SELECT id_new, q_inc AS q_best, id_corpus AS best_id FROM (
                SELECT id_new, id_corpus, q_inc,
                       row_number() OVER (PARTITION BY id_new
                                          ORDER BY q_inc DESC, id_corpus)
                           AS rn
                FROM schal{e})
            WHERE rn = 1),
        sadmitted{e} AS MATERIALIZED (
            SELECT r.id FROM sranked{e} r
            LEFT JOIN sbest{e} b ON b.id_new = r.id
            WHERE r.rn = 1
              AND (b.id_new IS NULL OR r.q > b.q_best
                   OR (r.q = b.q_best AND r.id < b.best_id))),
        sbeaten{e} AS MATERIALIZED (
            SELECT DISTINCT c.id_corpus AS id
            FROM schal{e} c JOIN sadmitted{e} a ON a.id = c.id_new),
        snrepl{e} AS (
            SELECT c.id_new AS id,
                   CAST(count(DISTINCT c.id_corpus) AS BIGINT) AS n_replaced
            FROM schal{e} c JOIN sadmitted{e} a ON a.id = c.id_new
            GROUP BY 1),
        sreport{e} AS MATERIALIZED (
            SELECT r.id, r.q,
                   CASE WHEN r.rn > 1 THEN 'rejected_batch'
                        WHEN a.id IS NOT NULL THEN 'admitted'
                        ELSE 'rejected_corpus' END AS outcome,
                   CASE WHEN r.rn > 1 THEN w.kept_id
                        WHEN a.id IS NOT NULL THEN CAST(NULL AS BIGINT)
                        ELSE b.best_id END AS kept_by,
                   CASE WHEN a.id IS NOT NULL
                        THEN coalesce(n.n_replaced, 0)
                        ELSE 0 END AS n_replaced
            FROM sranked{e} r
            JOIN swinners{e} w USING (group_id)
            LEFT JOIN sadmitted{e} a ON a.id = r.id
            LEFT JOIN sbest{e} b ON b.id_new = r.id
            LEFT JOIN snrepl{e} n ON n.id = r.id)"""


def streaming_semantic_keep_best_oracle(
    k: int = SEMDEDUP_K, tau: float = SEM_INGEST_TAU
) -> str:
    """DuckDB twin of ``q_streaming_semantic_keep_best``: ONE
    nearest-centroid assignment of every vector to the corpus-seeded
    centroids (assignments are per-vector state under fixed centroids —
    the pinned-centroids contract), then the two keep-best epochs
    recomposed SEQUENTIALLY: epoch 0 against the built corpus, epoch 1
    against (corpus − beaten₀) ∪ admitted₀."""
    return f"""
        WITH RECURSIVE
        v AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        corp AS (SELECT * FROM v WHERE vec_id % {INCR_MOD} != 0),
        cent AS (SELECT vec_id AS centroid_id, vec AS cvec
                 FROM corp ORDER BY vec_id LIMIT {k}),
        asgall AS MATERIALIZED (
            SELECT vec_id, centroid_id FROM (
                SELECT a.vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {_cos_sql('a.vec', 'cvec')} DESC,
                                    centroid_id) AS rn
                FROM v a, cent)
            WHERE rn = 1),
        qual AS MATERIALIZED (
            SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS q
            FROM documents),
        slive0 AS MATERIALIZED (SELECT vec_id AS id FROM corp),
        {_ivf_kb_epoch_block(0, 0, 'slive0', tau)},
        slive1 AS MATERIALIZED (
            SELECT id FROM slive0
            WHERE id NOT IN (SELECT id FROM sbeaten0)
            UNION ALL
            SELECT id FROM sadmitted0),
        {_ivf_kb_epoch_block(1, INCR_MOD, 'slive1', tau)}
        SELECT CAST(0 AS BIGINT) AS epoch_id, id, q, outcome, kept_by,
               n_replaced
        FROM sreport0
        UNION ALL
        SELECT CAST(1 AS BIGINT) AS epoch_id, id, q, outcome, kept_by,
               n_replaced
        FROM sreport1
        ORDER BY epoch_id, id
    """


def _kb_epoch_block(e: int, residue: int, live: str) -> str:
    """One keep-best epoch as SQL CTEs (shared by both epochs of
    ``streaming_keep_best_oracle``): the batch's capped intra-batch pair
    graph → transitive CC (recursive CTE) → (q desc, id) argmax →
    pairwise challenge against the ``live`` id set (cap recomputed over
    THAT population, as the Spark side caps the pinned live view) →
    struct-compare decision → per-epoch report + beaten/admitted sets.
    Emits CTEs suffixed ``{e}``; the caller chains ``live{e+1}``."""
    return f"""
        bn{e} AS MATERIALIZED (SELECT b.* FROM ball b WHERE b.id % {2 * INCR_MOD} = {residue}),
        bnsz{e} AS (SELECT band_idx, band_hash, count(*) AS n
                    FROM bn{e} GROUP BY 1, 2),
        bnc{e} AS MATERIALIZED (SELECT r.* FROM bn{e} r
                   JOIN bnsz{e} USING (band_idx, band_hash)
                   WHERE bnsz{e}.n <= {SKEW_CAP}),
        wcand{e} AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bnc{e} a JOIN bnc{e} b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.id < b.id),
        winter{e} AS (
            SELECT c.id_a, c.id_b, count(*) AS ic
            FROM wcand{e} c
            JOIN hshm x ON x.id = c.id_a
            JOIN hshm y ON y.id = c.id_b AND y.h = x.h
            GROUP BY 1, 2),
        wpairs{e} AS (
            SELECT i.id_a, i.id_b
            FROM winter{e} i JOIN szall a ON i.id_a = a.id
                             JOIN szall b ON i.id_b = b.id
            WHERE i.ic * 1.0 / (a.sz + b.sz - i.ic) >= {MINHASH_THRESHOLD}),
        wedges{e} AS (SELECT id_a AS s, id_b AS d FROM wpairs{e}
                      UNION SELECT id_b, id_a FROM wpairs{e}),
        wreach{e}(s, d) AS (
            SELECT s, d FROM wedges{e}
            UNION
            SELECT r.s, ed.d FROM wreach{e} r JOIN wedges{e} ed ON r.d = ed.s),
        bdocs{e} AS (SELECT doc_id AS id FROM documents
                     WHERE doc_id % {2 * INCR_MOD} = {residue}),
        wgroups{e} AS (
            SELECT b.id, least(b.id, coalesce(min(r.d), b.id)) AS group_id
            FROM bdocs{e} b LEFT JOIN wreach{e} r ON r.s = b.id
            GROUP BY b.id),
        ranked{e} AS MATERIALIZED (
            SELECT g.id, g.group_id, q.q,
                   row_number() OVER (PARTITION BY g.group_id
                                      ORDER BY q.q DESC, g.id) AS rn
            FROM wgroups{e} g JOIN qual q USING (id)),
        winners{e} AS (SELECT group_id, id AS kept_id FROM ranked{e}
                       WHERE rn = 1),
        bcraw{e} AS MATERIALIZED (SELECT b.* FROM ball b JOIN {live} l ON b.id = l.id),
        bcsz{e} AS (SELECT band_idx, band_hash, count(*) AS n
                    FROM bcraw{e} GROUP BY 1, 2),
        bc{e} AS MATERIALIZED (SELECT r.* FROM bcraw{e} r
                  JOIN bcsz{e} USING (band_idx, band_hash)
                  WHERE bcsz{e}.n <= {SKEW_CAP}),
        ccand{e} AS (
            SELECT DISTINCT n.id AS id_new, c.id AS id_corpus
            FROM bn{e} n
            JOIN ranked{e} ch ON n.id = ch.id AND ch.rn = 1
            JOIN bc{e} c ON n.band_idx = c.band_idx
                        AND n.band_hash = c.band_hash
                        AND n.id != c.id),
        cinter{e} AS (
            SELECT cd.id_new, cd.id_corpus, count(*) AS ic
            FROM ccand{e} cd
            JOIN hshm x ON x.id = cd.id_new
            JOIN hshm y ON y.id = cd.id_corpus AND y.h = x.h
            GROUP BY 1, 2),
        cpairs{e} AS (
            SELECT i.id_new, i.id_corpus
            FROM cinter{e} i JOIN szall a ON i.id_new = a.id
                             JOIN szall b ON i.id_corpus = b.id
            WHERE i.ic * 1.0 / (a.sz + b.sz - i.ic) >= {MINHASH_THRESHOLD}),
        chal{e} AS MATERIALIZED (
            SELECT p.id_new, p.id_corpus, qn.q AS q_new, qc.q AS q_inc
            FROM cpairs{e} p
            JOIN qual qn ON qn.id = p.id_new
            JOIN qual qc ON qc.id = p.id_corpus),
        best_inc{e} AS MATERIALIZED (
            SELECT id_new, q_inc AS q_best, id_corpus AS best_id FROM (
                SELECT id_new, id_corpus, q_inc,
                       row_number() OVER (PARTITION BY id_new
                                          ORDER BY q_inc DESC, id_corpus)
                           AS rn
                FROM chal{e})
            WHERE rn = 1),
        admitted{e} AS MATERIALIZED (
            SELECT r.id FROM ranked{e} r
            LEFT JOIN best_inc{e} b ON b.id_new = r.id
            WHERE r.rn = 1
              AND (b.id_new IS NULL OR r.q > b.q_best
                   OR (r.q = b.q_best AND r.id < b.best_id))),
        beaten{e} AS MATERIALIZED (
            SELECT DISTINCT c.id_corpus AS id
            FROM chal{e} c JOIN admitted{e} a ON a.id = c.id_new),
        nrepl{e} AS (
            SELECT c.id_new AS id,
                   CAST(count(DISTINCT c.id_corpus) AS BIGINT) AS n_replaced
            FROM chal{e} c JOIN admitted{e} a ON a.id = c.id_new
            GROUP BY 1),
        report{e} AS MATERIALIZED (
            SELECT r.id, r.q,
                   CASE WHEN r.rn > 1 THEN 'rejected_batch'
                        WHEN a.id IS NOT NULL THEN 'admitted'
                        ELSE 'rejected_corpus' END AS outcome,
                   CASE WHEN r.rn > 1 THEN w.kept_id
                        WHEN a.id IS NOT NULL THEN CAST(NULL AS BIGINT)
                        ELSE b.best_id END AS kept_by,
                   CASE WHEN a.id IS NOT NULL
                        THEN coalesce(n.n_replaced, 0)
                        ELSE 0 END AS n_replaced
            FROM ranked{e} r
            JOIN winners{e} w USING (group_id)
            LEFT JOIN admitted{e} a ON a.id = r.id
            LEFT JOIN best_inc{e} b ON b.id_new = r.id
            LEFT JOIN nrepl{e} n ON n.id = r.id)"""


def streaming_keep_best_oracle() -> str:
    """DuckDB twin of ``q_streaming_keep_best``: the shared shingle/
    minhash/band prefix computed ONCE per doc (band rows are per-doc
    state, independent of corpus membership — exactly the stored-index
    property), then the two keep-best epochs recomposed SEQUENTIALLY:
    epoch 0 against the built corpus, epoch 1 against
    (corpus − beaten₀) ∪ admitted₀."""
    return rf"""
        WITH RECURSIVE {_SHINGLE_CTE}, {_hashed_shingle_cte()},
        hshm AS MATERIALIZED (SELECT * FROM hsh),
        qual AS MATERIALIZED (
            SELECT doc_id AS id,
                   CAST(len(regexp_extract_all(lower(text), '\w+'))
                        AS BIGINT) AS q
            FROM documents),
        sig_all AS MATERIALIZED ({_sig_select_sql('hshm')}),
        ball AS MATERIALIZED ({_band_select_sql('sig_all')}),
        szall AS MATERIALIZED (SELECT id, count(*) AS sz FROM hshm GROUP BY id),
        live0 AS MATERIALIZED (SELECT doc_id AS id FROM documents
                  WHERE doc_id % {INCR_MOD} != 0),
        {_kb_epoch_block(0, 0, 'live0')},
        live1 AS MATERIALIZED (
            SELECT id FROM live0
            WHERE id NOT IN (SELECT id FROM beaten0)
            UNION ALL
            SELECT id FROM admitted0),
        {_kb_epoch_block(1, INCR_MOD, 'live1')}
        SELECT CAST(0 AS BIGINT) AS epoch_id, id, q, outcome, kept_by,
               n_replaced
        FROM report0
        UNION ALL
        SELECT CAST(1 AS BIGINT) AS epoch_id, id, q, outcome, kept_by,
               n_replaced
        FROM report1
        ORDER BY epoch_id, id
    """


def q_bm25_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted-index maintenance driven through STRUCTURED
    STREAMING (``Bm25Index.ingest_stream`` — VERDICT r8 item 3; all
    three standing indexes now share the marker-last epoch surface):
    build over the 90% corpus, drain the 1-in-10 batch as TWO
    mtime-ordered stream epochs, then search. Admission is gate-free,
    so the post-drain index must be indistinguishable from one built
    over the full corpus — the oracle is the UNSPLIT BM25 SQL, the same
    strongest-form check as ``bm25_ingest_topk``, now proving the
    epoch-commit plumbing reconstructs every corpus-global statistic."""
    import os
    import shutil
    import tempfile

    from .catalog import Catalog
    from .operators.retrieval import Bm25Index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    epochs = [
        docs.filter(F.col("doc_id") % (2 * INCR_MOD) == 0),
        docs.filter(F.col("doc_id") % (2 * INCR_MOD) == INCR_MOD),
    ]
    root = tempfile.mkdtemp(prefix="bm25_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, part in enumerate(epochs):
        stage = os.path.join(root, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{'ab'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        # deterministic epoch order: the file source sorts by mtime
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    cat = Catalog(spark, os.path.join(root, "wh"))
    idx = Bm25Index(cat, "bm25_stream")
    idx.build(corpus)
    stream = (
        spark.readStream.schema(epochs[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx.ingest_stream(stream, os.path.join(root, "ckpt"))
    return idx.search(BM25_QUERIES, k=BM25_K)


BM25_TERM_STATS_N = 20

# queries mixing the corpus's one informative-tail term ('dup', df share
# a stable 0.05 at every sf) with stopword-class terms (share 0.75–0.81
# at every sf), so the 0.5 cap separates identically at sf0.001/0.01/0.1:
# query 1 survives on 'dup' alone, query 2 is pruned to nothing — a
# no-op cap could not produce either
BM25_PRUNED_QUERIES = [
    (1, ["dup", "hash", "join"]),
    (2, ["sort", "merge", "scan"]),
]
BM25_DF_CAP = 0.5


def q_bm25_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-pruned BM25 serving (``Bm25Index.search`` with
    ``max_df_share`` — the lever ``maintain()``'s
    stopword_pruning_recommended signal and the ``bm25_term_stats`` row
    point at): terms whose df exceeds the cap are dropped from scoring
    BEFORE the postings scan, decided from the bucket-pruned
    query-terms df slice plus the one-row stats table — the
    stopword-class posting lists, the dominant serving cost of an
    inverted index at 100 TB, are never read. Runs against the STANDING
    index shared with ``bm25_topk_read``; the oracle applies the same
    df ≤ share·N predicate inside the shared BM25 SQL."""
    return _ensure_bm25_read_index(spark, sf_dir).search(
        BM25_PRUNED_QUERIES, k=BM25_K, max_df_share=BM25_DF_CAP
    )


def q_bm25_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted index's posting-list skew report
    (``Bm25Index.term_stats``) over the STANDING index shared with
    ``bm25_topk_read`` — the third member of the observability triple
    (IVF cluster skew, LSH bucket skew, BM25 term skew). One row per
    top-20 hot term; the oracle recomputes df/share/skew/rank in SQL
    with the same single-IEEE-division arithmetic."""
    return (
        _ensure_bm25_read_index(spark, sf_dir)
        .term_stats(top_n=BM25_TERM_STATS_N)
        .orderBy("rank")
    )


def bm25_term_stats_oracle(top_n: int = BM25_TERM_STATS_N) -> str:
    """DuckDB twin of ``Bm25Index.term_stats``: df from the distinct
    (doc, tok) stream, totals cross-joined, share/skew as single IEEE
    divisions of exact integers, (df desc, tok) tiebreak."""
    return rf"""
        WITH dt AS (
            SELECT DISTINCT doc_id, tok
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text), '\w+')) AS tok
                  FROM documents)),
        df_t AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                 FROM dt GROUP BY tok),
        tot AS (SELECT CAST(sum(df) AS BIGINT) AS total,
                       CAST(count(*) AS BIGINT) AS n_terms
                FROM df_t),
        ranked AS (
            SELECT tok, df,
                   CAST(df AS DOUBLE) / total AS share,
                   CAST(df AS DOUBLE) * n_terms / total AS skew,
                   CAST(row_number() OVER (ORDER BY df DESC, tok)
                        AS BIGINT) AS rank
            FROM df_t CROSS JOIN tot)
        SELECT tok, df, share, skew, rank FROM ranked WHERE rank <= {top_n}
    """


def q_ivf_cluster_skew_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ivf_cluster_skew``'s READ path (VERDICT r8 item 6): the bounded
    per-centroid population report over the STANDING memoized IVF index
    (shared with ``similarity_topk_ivf_read`` — same corpus, same
    quantizer, so the skew oracle is shared verbatim). The rebuild-priced
    sibling swings 2–4× on its build floor; this row prices what a
    maintenance scheduler actually pays per sweep: one bucketed
    assign-table aggregate, ≤ n_centroids rows out."""
    from .catalog import Catalog
    from .operators.similarity import IvfIndex

    cat = Catalog(spark, _idx_root("ivf_read_", sf_dir))
    idx = IvfIndex(
        cat, "ivf_read", n_centroids=SIM_IVF_CENTROIDS, nprobe=SIM_IVF_NPROBE
    )
    _standing_index(
        "ivf_read", sf_dir,
        lambda: idx.build(load_table(spark, sf_dir, "embeddings")),
    )
    return idx.cluster_stats().orderBy("centroid_id")


LENGTH_HISTOGRAM_ORACLE = r"""
    SELECT CAST(length(bin(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)))
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS min_tokens,
           CAST(max(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY bucket
"""


EXT_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_buckets": q_minhash_buckets,
    "minhash_dup_pairs": q_minhash_dup_pairs,
    "dedup_groups": q_dedup_groups,
    "dedup_keep_best": q_dedup_keep_best,
    "simhash_sigs": q_simhash_sigs,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "similarity_topk": q_similarity_topk,
    "mmr_rerank": q_mmr_rerank,
    "similarity_topk_ivf": q_similarity_topk_ivf,
    "similarity_topk_ivf_idx": q_similarity_topk_ivf_idx,
    "similarity_topk_lsh": q_similarity_topk_lsh,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "embedding_neardup": q_embedding_neardup,
    "token_counts": q_token_counts,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "maple_wordcount": q_maple_wordcount,
    "streaming_rollup": q_streaming_rollup,
    "streaming_dedup": q_streaming_dedup,
    "streaming_sessions": q_streaming_sessions,
    "vocab_sketch": q_vocab_sketch,
    "value_quantiles_sketch": q_value_quantiles_sketch,
    "image_features": q_image_features,
    "audio_features": q_audio_features,
    "frame_sample": q_frame_sample,
    "streaming_enriched": q_streaming_enriched,
    "streaming_click_attribution": q_streaming_click_attribution,
    "maple_filter_pct": q_maple_filter_pct,
    "corpus_prep": q_corpus_prep,
    "decontaminate": q_decontaminate,
    "streaming_dedup_watermark": q_streaming_dedup_watermark,
    "image_resize": q_image_resize,
    "redact_pii": q_redact_pii,
    "chunk_assignment": q_chunk_assignment,
    "chunk_assignment_sharded": q_chunk_assignment_sharded,
    "incremental_neardup": q_incremental_neardup,
    "incremental_neardup_idx": q_incremental_neardup_idx,
    "bm25_topk": q_bm25_topk,
    "repetition_signals": q_repetition_signals,
    "mixture_weights": q_mixture_weights,
    "embedding_quantize": q_embedding_quantize,
    "corpus_splits": q_corpus_splits,
    "span_dedup": q_span_dedup,
    "corpus_shuffle": q_corpus_shuffle,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_train": q_bpe_train,
    "bpe_word_segments": q_bpe_word_segments,
    "vocab_encode": q_vocab_encode,
    "dedup_prune": q_dedup_prune,
    "source_overlap": q_source_overlap,
    "label_confusion": q_label_confusion,
    "ivf_refined_centroids": q_ivf_refined_centroids,
    "ivf_refined_topk": q_ivf_refined_topk,
    "semdedup_prune": q_semdedup,
    "semdedup_keep_best": q_semdedup_keep_best,
    "embedding_neardup_idx": q_embedding_neardup_idx,
    "semantic_ingest": q_semantic_ingest,
    "streaming_semantic_ingest": q_streaming_semantic_ingest,
    "quality_filter": q_quality_filter,
    "streaming_hourly_users": q_streaming_hourly_users,
    "pretraining_manifest": q_pretraining_manifest,
    "pretraining_manifest_sem": q_pretraining_manifest_sem,
    "pretraining_manifest_lm": q_pretraining_manifest_lm,
    "rrf_fusion": q_rrf_fusion,
    "hard_negatives": q_hard_negatives,
    "bigram_lm_quality": q_bigram_lm_quality,
    "perplexity_prune": q_perplexity_prune,
    "doc_chunks": q_doc_chunks,
    "chunk_ann_topk": q_chunk_ann_topk,
    "mixture_temperature": q_mixture_temperature,
    "curriculum_order": q_curriculum_order,
    "length_histogram": q_length_histogram,
    "ivf_cluster_skew": q_ivf_cluster_skew,
    "lsh_bucket_skew": q_lsh_bucket_skew,
    "chunk_semantic_ingest": q_chunk_semantic_ingest,
    # r8: standing-index READ-path pricing (build memoized per process —
    # bench's warmup builds, the measured reps price the serving path)
    "similarity_topk_ivf_read": q_similarity_topk_ivf_read,
    "embedding_neardup_read": q_embedding_neardup_read,
    "incremental_neardup_read": q_incremental_neardup_read,
    "chunk_ann_topk_read": q_chunk_ann_topk_read,
    "bm25_topk_read": q_bm25_topk_read,
    "chunk_hybrid_topk_read": q_chunk_hybrid_topk_read,
    "bm25_ingest_topk": q_bm25_ingest_topk,
    "bm25_delete_topk": q_bm25_delete_topk,
    "bm25_stream_ingest": q_bm25_stream_ingest,
    "bm25_term_stats": q_bm25_term_stats,
    "bm25_topk_pruned": q_bm25_topk_pruned,
    "ivf_cluster_skew_read": q_ivf_cluster_skew_read,
    # r8: takedown journeys (tombstone delete honored by every read)
    "ivf_delete_search": q_ivf_delete_search,
    "neardup_delete_check": q_neardup_delete_check,
    # r9: quality-aware exemplar replacement on BOTH dedup-capable
    # standing indexes (lexical + semantic)
    "neardup_keep_best": q_neardup_keep_best,
    "streaming_keep_best": q_streaming_keep_best,
    "streaming_semantic_keep_best": q_streaming_semantic_keep_best,
    "embedding_neardup_capacity": q_embedding_neardup_capacity,
    "semantic_keep_best": q_semantic_keep_best,
    # rows-only by policy (HLL vocab estimate — no DuckDB twin);
    # error-bound-gated vs the exact tier in tests/test_lm.py and
    # kept OUT of the driver verification window like the other
    # sketches
    "bigram_lm_quality_sketch": q_bigram_lm_quality_sketch,
    "chunk_hybrid_topk": q_chunk_hybrid_topk,
    "pretraining_manifest_full": q_pretraining_manifest_full,
    "pretraining_manifest_kb": q_pretraining_manifest_kb,
}

EXT_ORACLES = {
    "dedup_exact": """
        SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        FROM documents GROUP BY text
    """,
    "minhash_buckets": minhash_buckets_oracle(),
    "minhash_dup_pairs": minhash_pairs_oracle(),
    "dedup_groups": dedup_groups_oracle(),
    "dedup_keep_best": dedup_keep_best_oracle(),
    "simhash_sigs": simhash_sigs_oracle(),
    "simhash_dup_pairs": simhash_pairs_oracle(),
    "jaccard_pairs": jaccard_pairs_oracle(),
    "similarity_topk": similarity_topk_oracle(),
    "mmr_rerank": mmr_rerank_oracle(),
    # the ANN tier is approximate in RECALL but deterministic in
    # COMPUTATION (md5 hyperplanes, id-ordered centroids, rounded sims),
    # so each scale-path query carries a full generated-SQL oracle — only
    # the two sketch queries (HLL/GK, engine-internal algorithms) remain
    # rows-only
    "similarity_topk_ivf": similarity_topk_ivf_oracle(),
    # stored-index path: identical math over materialized intermediates
    "similarity_topk_ivf_idx": similarity_topk_ivf_oracle(),
    "similarity_topk_lsh": similarity_topk_lsh_oracle(),
    "embedding_neardup_lsh": embedding_neardup_lsh_oracle(),
    "embedding_neardup": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   {_cos_sql('a.vec', 'b.vec')} AS score
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, score FROM pairs WHERE score >= {EMB_NEARDUP_THRESHOLD}
    """,
    "token_counts": rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
               CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_word,
               CAST(len(regexp_extract_all(text, '{BPE_RE.replace("'", "''")}')) AS BIGINT) AS n_bpe
        FROM documents
    """,
    "text_stats": text_stats_oracle(),
    "lang_id": lang_id_oracle(),
    "corpus_prep": corpus_prep_oracle(),
    "doc_fingerprint": rf"""
        SELECT doc_id, md5(array_to_string({_TOK}, ' ')) AS fp FROM documents
    """,
    "multimodal_meta": """
        SELECT doc_id, 'text/plain' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS content_md5
        FROM documents
    """,
    "maple_wordcount": r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS word
              FROM documents)
        GROUP BY word
    """,
    # the streaming path must converge to the batch answer
    "streaming_rollup": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # doubled stream deduped on event_id == plain batch counts
    "streaming_dedup": """
        SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
    # watermark-bounded dedup is exact while the delay covers the data span
    "streaming_dedup_watermark": """
        SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
    "decontaminate": decontaminate_oracle(),
    "incremental_neardup": incremental_neardup_oracle(),
    # the index query materializes the SAME math into catalog tables —
    # one oracle text verifies both the recompute and the storage path
    "incremental_neardup_idx": incremental_neardup_oracle(),
    "bm25_topk": bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
    "repetition_signals": repetition_signals_oracle(),
    "mixture_weights": mixture_weights_oracle(),
    "embedding_quantize": EMBEDDING_QUANTIZE_ORACLE,
    "corpus_splits": corpus_splits_oracle(),
    "span_dedup": span_dedup_oracle(),
    "corpus_shuffle": CORPUS_SHUFFLE_ORACLE,
    "bpe_pair_counts": BPE_PAIR_COUNTS_ORACLE,
    "bpe_train": bpe_train_oracle(),
    "bpe_word_segments": bpe_word_segments_oracle(),
    "vocab_encode": vocab_encode_oracle(),
    "dedup_prune": dedup_prune_oracle(),
    "source_overlap": source_overlap_oracle(),
    "label_confusion": label_confusion_oracle(),
    "ivf_refined_centroids": ivf_refined_centroids_oracle(),
    "ivf_refined_topk": ivf_refined_topk_oracle(),
    "semdedup_prune": semdedup_oracle(k=SEMDEDUP_CAPACITY_K_SQL),
    "semdedup_keep_best": semdedup_keep_best_oracle(k=SEMDEDUP_CAPACITY_K_SQL),
    "embedding_neardup_idx": embedding_neardup_idx_oracle(),
    "semantic_ingest": semantic_ingest_oracle(),
    "quality_filter": quality_filter_oracle(),
    "pretraining_manifest": pretraining_manifest_oracle(),
    "pretraining_manifest_sem": pretraining_manifest_sem_oracle(),
    "pretraining_manifest_lm": pretraining_manifest_lm_oracle(),
    "streaming_semantic_ingest": streaming_semantic_ingest_oracle(),
    # chained dedup → window agg must converge to the batch distinct count
    "streaming_hourly_users": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM events GROUP BY 1
    """,
    # identical regex patterns + replacement order re-run in DuckDB (RE2)
    "redact_pii": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text,
                   '\d{3}[-.]\d{3}[-.]\d{4}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                     '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g')) AS clean_md5
        FROM documents
    """,
    "chunk_assignment": _CHUNK_ORACLE,
    # the sharded scale tier produces bit-identical output by
    # construction (range shards preserve per-lang id order), so the
    # single-window SQL IS its oracle
    "chunk_assignment_sharded": _CHUNK_ORACLE,
    # same integer aspect-fit math and md5 fake as multimodal.resize_images
    "image_resize": """
        WITH d AS (
            SELECT doc_id, text,
                   16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS w,
                   16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS h
            FROM documents)
        SELECT doc_id,
               CAST(CASE WHEN w >= h THEN 64
                         ELSE greatest(1, (w * 64) // h) END AS INT) AS out_w,
               CAST(CASE WHEN w >= h THEN greatest(1, (h * 64) // w)
                         ELSE 64 END AS INT) AS out_h,
               upper(md5(concat(text, '#r64'))) AS resized_hex
        FROM d
    """,
    # closed sessions only: batch sessionization minus each user's last
    # (still-open) session; gap comparison at full microsecond precision,
    # matching the stateful fold's timedelta arithmetic
    "streaming_sessions": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        ), per_sess AS (
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_seq
        )
        SELECT user_id, session_start, session_end, n_events
        FROM per_sess
        WHERE session_seq < (SELECT max(session_seq) FROM per_sess p2
                             WHERE p2.user_id = per_sess.user_id)
    """,
    "streaming_enriched": """
        SELECT c_mktsegment, count(*) AS cnt
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "maple_filter_pct": """
        SELECT o_orderstatus AS grp,
               count(*) AS cnt,
               printf('%.2f%%', 100.0 * count(*) / sum(count(*)) OVER ()) AS pct_str
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
    """,
    "streaming_click_attribution": """
        SELECT p.event_id AS purchase_id, c.ts AS click_ts
        FROM events p JOIN events c
          ON p.event_type = 'purchase' AND c.event_type = 'click'
         AND p.user_id = c.user_id
         AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
    """,
    # md5-derived fake decode recomputed in SQL (md5(text) hashes the
    # same utf8 bytes the Python fake hashes)
    "image_features": """
        SELECT doc_id,
               CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS INT)
                   AS width,
               CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS INT)
                   AS height,
               CAST(1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 3 AS INT)
                   AS n_channels,
               CAST(('0x' || substr(md5(text || '#f'), 1, 2)) AS INT) / 255.0 AS f0,
               CAST(('0x' || substr(md5(text || '#f'), 3, 2)) AS INT) / 255.0 AS f1,
               CAST(('0x' || substr(md5(text || '#f'), 5, 2)) AS INT) / 255.0 AS f2,
               CAST(('0x' || substr(md5(text || '#f'), 7, 2)) AS INT) / 255.0 AS f3
        FROM documents
    """,
    "audio_features": """
        SELECT doc_id,
               CAST(8000 * (1 + CAST(('0x' || substr(md5(text || '#a'), 1, 2)) AS INT) % 6)
                    AS INT) AS sample_rate,
               CAST(octet_length(encode(text)) * 100 AS BIGINT) AS n_samples,
               CAST(('0x' || substr(md5(text || '#a'), 3, 2)) AS INT) % 100 / 100.0
                   AS rms
        FROM documents
    """,
    # duckdb can't byte-slice BLOBs; the corpus is pure ascii (verified:
    # octet_length(encode(text)) == length(text) for every doc), so the
    # char-substr before encode() yields exactly the first 8 payload bytes
    "frame_sample": """
        WITH base AS (
            SELECT doc_id, hex(encode(substr(text, 1, 8))) AS frame8,
                   greatest(1, octet_length(encode(text)) // 10) AS n_frames
            FROM documents)
        SELECT doc_id, CAST(t.i * 10 AS INT) AS frame_idx, frame8 AS frame_hex
        FROM base, range(0, 3) t(i)
        WHERE t.i < least(n_frames, 3)
    """,
    "rrf_fusion": rrf_fusion_oracle(),
    "hard_negatives": hard_negatives_oracle(),
    "bigram_lm_quality": _lm_oracle(),
    "perplexity_prune": _perplexity_prune_oracle(),
    "doc_chunks": _chunks_oracle(),
    "chunk_ann_topk": chunk_ann_topk_oracle(),
    "mixture_temperature": MIXTURE_TEMPERATURE_ORACLE,
    "curriculum_order": curriculum_order_oracle(),
    "length_histogram": LENGTH_HISTOGRAM_ORACLE,
    "ivf_cluster_skew": ivf_cluster_skew_oracle(),
    "lsh_bucket_skew": lsh_bucket_skew_oracle(),
    "chunk_semantic_ingest": chunk_semantic_ingest_oracle(),
    # the _read forms share their rebuild-priced siblings' oracles —
    # identical math, the index tables are materialized intermediates
    "similarity_topk_ivf_read": similarity_topk_ivf_oracle(),
    "embedding_neardup_read": embedding_neardup_idx_oracle(),
    "incremental_neardup_read": incremental_neardup_oracle(),
    "chunk_ann_topk_read": chunk_ann_topk_oracle(),
    "bm25_topk_read": bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
    "bm25_topk_pruned": bm25_oracle_sql(
        BM25_PRUNED_QUERIES, k=BM25_K, max_df_share=BM25_DF_CAP
    ),
    "chunk_hybrid_topk_read": chunk_hybrid_topk_oracle(),
    # the ingest journey's oracle is the UNSPLIT full-corpus SQL: the
    # incremental path must reconstruct every corpus-global statistic
    "bm25_ingest_topk": bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
    "bm25_delete_topk": bm25_oracle_sql(
        BM25_QUERIES,
        k=BM25_K,
        where=f"doc_id % {BM25_DELETE_MOD} != {BM25_DELETE_RESIDUE}",
    ),
    "bm25_stream_ingest": bm25_oracle_sql(BM25_QUERIES, k=BM25_K),
    "bm25_term_stats": bm25_term_stats_oracle(),
    "ivf_cluster_skew_read": ivf_cluster_skew_oracle(),
    # takedown twins: the live predicate narrows the corpus/candidate
    # side exactly where the Spark live view reaches
    "ivf_delete_search": similarity_topk_ivf_oracle(
        live_pred=f"a.id % {IVF_DELETE_MOD} != {IVF_DELETE_RESIDUE}"
    ),
    "neardup_delete_check": incremental_neardup_oracle(
        corpus_extra_pred=f"id % {INCR_MOD} != {NEARDUP_DELETE_RESIDUE}"
    ),
    "neardup_keep_best": neardup_keep_best_oracle(),
    "streaming_keep_best": streaming_keep_best_oracle(),
    "streaming_semantic_keep_best": streaming_semantic_keep_best_oracle(),
    "embedding_neardup_capacity": embedding_neardup_idx_oracle(
        k=IVF_CAPACITY_K_SQL
    ),
    "semantic_keep_best": semantic_keep_best_oracle(),
    "chunk_hybrid_topk": chunk_hybrid_topk_oracle(),
    "pretraining_manifest_full": pretraining_manifest_full_oracle(),
    "pretraining_manifest_kb": pretraining_manifest_kb_oracle(),
}
