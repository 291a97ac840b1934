"""Composed training-data pipelines [EXT]: the operators of this engine
chained the way a 100 TB corpus-preparation job actually runs.

``prepare_corpus`` is the canonical LLM-data shape: score → filter →
dedup → cost. Every stage is a Catalyst-expression operator from this
package (no Python in the hot path), so the whole pipeline is ONE logical
plan — Catalyst fuses the per-row scoring stages into a single pass over
the scan, and the only shuffles are the two the semantics require (exact
dedup groupBy + representative semi-join).

Stage order matters at scale: per-row filters (quality, language) run
FIRST so the dedup shuffle only carries surviving rows; token costing
runs LAST so it prices only the corpus you keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import lang_id, quality_score, token_count_bpe, token_count_ws
from .operators.dedup import drop_exact_dups


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.45,
    langs: tuple[str, ...] = ("en",),
    dedup: bool = True,
) -> DataFrame:
    """Corpus preparation: quality-score + language-ID every document,
    keep ``langs`` above ``min_quality``, drop exact duplicates (min-id
    representative), and attach token-count costing.

    Output: (id, lang_pred, quality, n_ws, n_bpe) for every surviving
    document — the manifest a downstream tokenizer/trainer consumes.
    """
    scored = lang_id(quality_score(docs, text_col), text_col)
    kept = scored.filter(
        (F.col("quality") >= F.lit(min_quality))
        & F.col("lang_pred").isin(*langs)
    )
    if dedup:
        kept = drop_exact_dups(kept, text_col, id_col)
    return kept.select(
        F.col(id_col),
        "lang_pred",
        "quality",
        token_count_ws(text_col).alias("n_ws"),
        token_count_bpe(text_col).alias("n_bpe"),
    )


def quality_kept_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The Gopher-rule quality gate as a reusable stage: the documents
    (id, lang, text) that pass every rule — the corpus every later
    pipeline stage (pair derivation, manifest) operates on."""
    from .functions.text import gopher_rule_flags

    return (
        gopher_rule_flags(docs, text_col)
        .filter(F.col("p_all"))
        .select(id_col, lang_col, text_col)
    )


def neardup_prune_summary(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Apply the near-dup clusters: keep ONE representative per cluster
    (the min-label component labels itself, so survivor ⇔ id ==
    component) and report the pruned corpus per language —
    ``(lang, n_total, n_kept, n_dropped)``.

    ``pairs`` optionally supplies a precomputed near-dup pair frame
    ``(id_a, id_b, …)`` over the SAME corpus — a suite running several
    pair consumers (prune + overlap matrix + manifest) derives the pair
    set once (one tokenize/MinHash pass, persisted) instead of paying it
    per consumer; omitted, the pairs are recomputed here so the function
    stays self-contained (what the registered oracle-twinned query
    does)."""
    from .operators.dedup import minhash_dup_pairs
    from .operators.graph import connected_components

    if pairs is None:
        pairs = minhash_dup_pairs(
            docs, id_col, text_col, threshold=threshold, max_bucket=max_bucket
        )
    verts = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(verts, edges)
    survivors = cc.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    kept = (
        survivors.join(docs.select(id_col, lang_col), id_col)
        .groupBy(lang_col)
        .agg(F.count("*").alias("n_kept"))
    )
    total = docs.groupBy(lang_col).agg(F.count("*").alias("n_total"))
    return total.join(kept, lang_col, "left").select(
        lang_col,
        F.col("n_total").cast("bigint").alias("n_total"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
    )


def source_overlap_matrix(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Cross-source duplication matrix over the near-dup pairs:
    unordered (source_a ≤ source_b) cells with pair count and
    ``max(jaccard)`` (max of doubles is partition-order-independent,
    unlike avg). ``pairs`` shares a precomputed pair set exactly like
    :func:`neardup_prune_summary`."""
    from .operators.dedup import minhash_dup_pairs

    if pairs is None:
        pairs = minhash_dup_pairs(
            docs, id_col, text_col, threshold=threshold, max_bucket=max_bucket
        )
    src = docs.select(id_col, source_col)
    labeled = pairs.join(
        src.select(F.col(id_col).alias("id_a"), F.col(source_col).alias("src_a")),
        "id_a",
    ).join(
        src.select(F.col(id_col).alias("id_b"), F.col(source_col).alias("src_b")),
        "id_b",
    )
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def pretraining_manifest_full(
    docs: DataFrame,
    splits: dict[str, float],
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    decon_n: int = 3,
    decon_min_shared: int = 3,
    decon_max_bucket: int = 1_000,
    **manifest_kwargs,
) -> DataFrame:
    """The GRAND composition — every quality stage this engine ships, in
    the order a production pretraining prep runs:

    1. Gopher quality filter;
    2. benchmark DECONTAMINATION — drop training documents sharing ≥
       ``decon_min_shared`` n-gram shingles with any document of
       ``bench`` (``operators.dedup.contaminated_train_ids``; callers
       pass disjoint train/bench frames — bench never trains);
    3. CCNet LM-perplexity prune, model trained on the post-decon kept
       corpus (``operators.lm.perplexity_keep_ids``);
    4. lexical MinHash-LSH near-dup prune;
    5. optional SemDeDup (pass ``emb=...`` through);
    6. frozen train/val/test splits;
    7. range-sharded packing.

    Stage order is the contamination-then-cost order: decon runs BEFORE
    the LM prune because a leaked benchmark passage is exactly the
    fluent text the LM stage keeps; LM runs before dedup so the shuffle
    stages price only fluent documents. Composition is by pre-filtering
    (the inner pipeline re-applies the idempotent quality filter).

    The fluent survivor set is **eagerly localCheckpoint-ed**, not
    lazily persisted: the inner pipeline's iterative stages (the CC
    convergence loop, the Lloyd rounds) launch eager jobs that would
    otherwise repeatedly drag the whole decon + LM lineage back through
    evaluation before the lazy cache stabilizes — measured 6.7× slower
    at sf0.1 (119.8s → 17.9s) with the lazy form. The decon survivor
    set stays a lazy persist: it is consumed entirely within the one
    fluent materialization. On a cluster, use ``checkpoint`` for the
    same cut with executor-loss durability."""
    from .cache import tracked_persist
    from .operators.dedup import contaminated_train_ids
    from .operators.lm import perplexity_keep_ids

    kept = quality_kept_docs(docs, id_col, text_col, lang_col)
    clean = tracked_persist(
        kept.join(
            contaminated_train_ids(
                kept,
                bench,
                id_col,
                text_col,
                n=decon_n,
                min_shared=decon_min_shared,
                max_bucket=decon_max_bucket,
            ),
            id_col,
            "anti",
        )
    )
    fluent = clean.join(
        perplexity_keep_ids(
            clean, id_col=id_col, text_col=text_col, lang_col=lang_col
        ),
        id_col,
    ).localCheckpoint()
    return pretraining_manifest(
        fluent,
        splits,
        id_col=id_col,
        text_col=text_col,
        lang_col=lang_col,
        **manifest_kwargs,
    )


def pretraining_manifest_lm(
    docs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    **manifest_kwargs,
) -> DataFrame:
    """:func:`pretraining_manifest` with the CCNet-style LM-quality
    stage spliced in: Gopher quality filter → per-language median
    perplexity prune (``operators.lm.perplexity_keep_ids`` — the
    bigram-LM model is trained on the quality-kept corpus itself) →
    lexical near-dup prune → (optional semantic prune via ``emb``) →
    splits → packing.

    Stage order is the scale order, one notch further than the base
    pipeline: the LM prune runs BEFORE the lexical prune so the dedup
    shuffles price only fluent documents (the same argument that puts
    the per-row filter before dedup). Composition is by pre-filtering —
    the inner pipeline re-applies the (idempotent) quality filter to
    the already-kept rows, so the five-stage program is exactly
    quality → LM → dedup → … with no restated pipeline body to drift.

    The fluent survivor set is persisted: the inner pipeline consumes
    its input several times (pair derivation, component vertices,
    survivor join), and each consumption would otherwise re-train and
    re-score the whole bigram model."""
    from .cache import tracked_persist
    from .operators.lm import perplexity_keep_ids

    kept = quality_kept_docs(docs, id_col, text_col, lang_col)
    fluent = tracked_persist(
        kept.join(
            perplexity_keep_ids(
                kept, id_col=id_col, text_col=text_col, lang_col=lang_col
            ),
            id_col,
        )
    )
    return pretraining_manifest(
        fluent,
        splits,
        id_col=id_col,
        text_col=text_col,
        lang_col=lang_col,
        **manifest_kwargs,
    )


def pretraining_manifest(
    docs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    neardup_threshold: float = 0.3,
    max_bucket: int = 1000,
    chunk_tokens: int = 512,
    span: int = 1_000_000,
    pairs: DataFrame | None = None,
    emb: DataFrame | None = None,
    sem_k: int | None = None,
    sem_iters: int = 2,
    sem_tau: float = 0.35,
    quality_aware: bool = False,
) -> DataFrame:
    """The WHOLE pretraining data-prep pipeline as one DataFrame program:

    1. **quality filter** — Gopher-rule flags
       (``functions.text.gopher_rule_flags``), keep ``p_all`` docs only;
    2. **near-dup prune** — MinHash-LSH pairs over the *surviving* docs
       → two-star connected components → one representative per cluster.
       Default representative is the min-id convention (``id ==
       component``); ``quality_aware=True`` swaps the prune for
       :func:`operators.dedup.keep_best_exemplars` scored by the
       pipeline's own token count (the exact-integer quality signal the
       manifest already computes for packing) — the cluster's most
       complete member survives instead of its oldest (VERDICT r9
       item 3: the flagship composed journey exercising the keep-best
       semantics). Same CC machinery, one extra map-side aggregate for
       the per-cluster argmax — no new shuffle class;
    2b. **semantic prune** (optional, when ``emb`` supplies a
       ``(vec_id, embedding)`` table keyed like ``id_col``) — SemDeDup
       over the embeddings of the lexical survivors
       (``operators.similarity.semdedup_prune``: k-means clusters
       seeded/trained on the survivor set, within-cluster cosine prune),
       dropping the pruned ids. Lexical first, semantic second: the
       cheap shingle-based prune shrinks the corpus the quadratic
       within-cluster stage prices. ``sem_k=None`` (default) lets the
       prune capacity-size its quantizer (√N over the survivor count —
       the sizing that survives 100×, SCALE.md); the registered
       manifest rows pass the explicit parity constant their composed
       oracle bakes in;
    3. **split assignment** — deterministic frozen-eval-set
       train/val/test (``operators.sampling.split_assign``);
    4. **packing layout** — range-sharded concatenate-and-chunk per
       ``(lang, split)`` (``operators.packing.chunk_assignment_sharded``
       — the 100 TB two-level prefix sum).

    Output manifest: ``(doc_id, lang, split, n_tokens, chunk_id,
    chunk_offset)`` — what a trainer's data loader consumes.

    Stage order is the scale order: the per-row filter runs at the scan
    so the dedup shuffles only price surviving rows; packing runs last so
    context windows are laid over exactly the corpus being trained on.

    ``pairs`` optionally supplies a precomputed near-dup pair frame over
    the FILTER-SURVIVING corpus (i.e. computed from
    :func:`quality_kept_docs` output with the same threshold) — pairs
    over the unfiltered corpus would link clusters through documents the
    filter already dropped, changing component labels. A suite derives
    the filtered corpus and its pair set once and feeds every consumer.
    """
    from .cache import tracked_persist
    from .functions.text import token_count
    from .operators.dedup import minhash_dup_pairs
    from .operators.graph import connected_components
    from .operators.packing import chunk_assignment_sharded
    from .operators.sampling import split_assign

    kept = quality_kept_docs(docs, id_col, text_col, lang_col)
    # Decide with small rows (guide §8 / §2.3): every consumer after the
    # pair derivation — the CC vertex set, the keep-best score, the
    # survivor join, the split/packing sizes — needs only (id, lang,
    # n_tokens). ONE pass over the filtered text produces that narrow
    # frame, persisted (three scalar columns per doc at any corpus
    # size); without it each consumer re-ran the Gopher filter's
    # regex-heavy text conditions against the full scan (the pre-change
    # physical plan carried 30 regexp_extract_all evaluations across 4
    # documents scans — 67 in the keep-best grand composition). Full
    # text is now touched exactly once more, by the shingle derivation
    # below, and never rides a post-pair join or shuffle.
    meta = tracked_persist(
        kept.select(
            F.col(id_col),
            F.col(lang_col),
            token_count(text_col).alias("n_tokens"),
        )
    )
    if pairs is None:
        pairs = minhash_dup_pairs(
            kept, id_col, text_col, threshold=neardup_threshold, max_bucket=max_bucket
        )
    if quality_aware:
        from .operators.dedup import keep_best_exemplars

        # the pipeline's quality signal IS the token count the meta pass
        # already computed — same value, no re-tokenization
        resolution = keep_best_exemplars(
            meta, pairs, F.col("n_tokens"), id_col=id_col
        )
        survivors = meta.join(
            resolution.filter(F.col("kept") == 1).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
        )
    else:
        cc = connected_components(
            meta.select(F.col(id_col).alias("id")),
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        )
        survivors = meta.join(
            cc.filter(F.col("id") == F.col("component")).select(
                F.col("id").alias(id_col)
            ),
            id_col,
        )
    if emb is not None:
        from .operators.similarity import semdedup_prune

        # persist the survivor set once: the Lloyd loop inside
        # semdedup_prune localCheckpoints per round, which would
        # otherwise re-evaluate the whole pairs→CC chain per iteration
        # (and again for the pairwise stage). Post-restructure this
        # caches three scalar columns per survivor, not full text.
        survivors = tracked_persist(survivors)
        surv_emb = emb.join(
            survivors.select(F.col(id_col).alias("vec_id")), "vec_id"
        )
        sem_pruned = semdedup_prune(
            surv_emb, n_centroids=sem_k, iters=sem_iters, tau=sem_tau
        )
        survivors = survivors.join(
            sem_pruned.select(F.col("vec_id").alias(id_col)), id_col, "anti"
        )
    sized = split_assign(survivors, id_col, splits).select(
        id_col, lang_col, "split", "n_tokens"
    )
    return chunk_assignment_sharded(
        sized,
        group_col=(lang_col, "split"),
        id_col=id_col,
        chunk_tokens=chunk_tokens,
        span=span,
    )
