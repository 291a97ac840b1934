"""Deduplication operators for training-data pipelines [EXT].

No reference counterpart (SURVEY.md §2.11); designed for 100 TB:

- **exact_dedup** — hash-groupBy on content: one shuffle keyed by the
  content column; min-id representative selection is a plain aggregate
  (no window over raw rows).
- **MinHash + LSH** — shingle → ONE 60-bit md5 → k universal-hash mixes
  → per-doc minima → band buckets → bucket self-join → jaccard verify.
  The candidate join is on (band_idx, band_hash), so pair generation is
  proportional to bucket collisions, never |docs|² — the textbook scale
  path. One md5 per (doc, shingle) feeds ALL k permutations via
  ``(a_i*hi + b_i*lo + c_i) mod (2^61-1)`` mixes (functions/hashes.py)
  — k seeded md5s would be k× the hash work on the dominant stage —
  and every constant is public, so the scheme reproduces exactly in the
  DuckDB oracle.
- **SimHash** — 60-bit signature from per-token hash bit votes; near-dup
  pairs via the pigeonhole band trick (hamming ≤ d over b bands with
  d < b ⇒ at least one band identical), so pair search is again a
  bucket join, not a cross join.
- **ngram_jaccard_pairs** — inverted-index join on shingles: candidate
  pairs must share ≥1 shingle; exact Jaccard from integer intersection /
  union counts (single double division — deterministic).

Skew note: stop-shingle hot buckets (a shingle appearing in a large
fraction of docs) can blow up the inverted-index join; ``max_bucket``
drops buckets above a size cap — standard practice (they contribute
candidates that the verify step would reject at far higher cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist, untrack

from ..functions.hashes import HASH_FAMILY_VERSION, md5_long60, minhash_mix
from ..functions.text import tokenize

DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4  # 12 hashes / 4 bands = 3 rows per band
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits per band; complete for hamming distance ≤ 3


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Group identical content; keep the minimum id as the representative.
    Output: (keep_id, dup_count) per distinct content value."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("dup_count"),
    ).select("keep_id", "dup_count")


def drop_exact_dups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """The applying form: keep only representative rows (min id per
    distinct content). Implemented as an aggregate + semi-join, NOT
    ``dropDuplicates`` — representative choice must be deterministic."""
    keep = df.groupBy(content_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[content_col, id_col], how="left_semi")


def require_integral_quality(df: DataFrame, col: str, ctx: str) -> None:
    """Loudly reject a non-integral quality/score column (ADVICE r10).

    Every keep-best decision in the repo orders by ``(q, -id)`` with
    ``q`` cast to bigint — EXACT integer ordering, never a float
    tiebreak. A float/double/decimal quality would pass that cast by
    silent truncation (1.9 → 1), which can flip dominance and ties with
    no failure anywhere; the loud-failure philosophy of the unscored
    guard applies to the dtype too. ``col`` may name any column of
    ``df``; schema analysis only, no job."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    dt = df.select(F.col(col)).schema[0].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"{ctx}: quality column {col!r} has type {dt.simpleString()} — "
            "keep-best ordering is exact-integer (q, -id); a non-integral "
            "quality would silently truncate under the bigint cast and "
            "can flip dominance. Pass token counts / byte lengths / rule "
            "counts, or pre-quantize the score to an integer explicitly."
        )


def keep_best_exemplars(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    id_col: str = "doc_id",
    cc_probe: str = "hash",
) -> DataFrame:
    """Quality-aware duplicate-cluster resolution [EXT]: label duplicate
    clusters (connected components over the pair graph — the
    ``dedup_groups`` machinery), then keep the HIGHEST-``score`` member
    of each cluster instead of the min-id convention — the real-world
    policy when near-dup variants differ in completeness (keep the
    longest/most complete page, drop its truncated mirrors). Ties break
    to the MIN id, so the min-id convention is the score-constant
    special case.

    ``score`` is a Column evaluated against ``docs``; it must be an
    exact integer score (token counts, byte lengths, rule counts) so the
    argmax is bit-deterministic across engines — the struct-max below
    compares (score, -id) pairs with exact bigint ordering, never a
    float tiebreak. ENFORCED: a non-integral score raises
    (:func:`require_integral_quality`) instead of silently truncating
    under the bigint cast, which could flip dominance.

    Returns one row per document: (doc_id, group_id, score, kept_id,
    kept 0/1). Scale shape: components come from the bounded two-star
    iteration (``operators/graph.py``); the argmax is ONE groupBy over
    the corpus with map-side partials; no window function touches a
    corpus-sized partition. ``cc_probe`` selects the CC convergence
    probe: ``hash`` (default — corpus-scale callers like
    ``dedup_keep_best``, no extra per-round shuffle) or ``exact`` (one
    job per doubled round — the ingest protocols pass this because
    their pair graph is batch-bounded and per-job overhead dominates;
    see ``graph._two_star_edges_exact``)."""
    from .graph import connected_components

    require_integral_quality(
        docs.select(score.alias("score")), "score", "keep_best_exemplars"
    )
    verts = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(verts, edges, probe=cc_probe).select(
        F.col("id").alias("doc_id"), F.col("component").alias("group_id")
    )
    scored = docs.select(
        F.col(id_col).alias("doc_id"), score.cast("bigint").alias("score")
    )
    j = cc.join(scored, "doc_id")
    best = (
        j.groupBy("group_id")
        .agg(
            F.max(
                F.struct(F.col("score"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("b")
        )
        .select("group_id", (-F.col("b.neg_id")).alias("kept_id"))
    )
    return j.join(best, "group_id").select(
        "doc_id",
        "group_id",
        "score",
        "kept_id",
        (F.col("doc_id") == F.col("kept_id")).cast("bigint").alias("kept"),
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Pre-distinct (id, shingle) stream: one row per n-gram occurrence.

    Documents shorter than ``n`` tokens contribute their whole token
    stream as a single shingle so they still participate in dedup.

    The token array is projected ONCE before the shingle expression (the
    naive inline form re-evaluates the tokenizer regex for every
    ``element_at``), and the input is spread across cores before the
    explode (see ``ensure_parallelism``).
    """
    from ..sources.readers import ensure_parallelism

    toked = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), tokenize(text_col).alias("t"))
    )
    grams = F.when(
        F.size(F.col("t")) >= n, gram_array(F.col("t"), n)
    ).otherwise(F.array(F.array_join(F.col("t"), " ")))
    return toked.select("id", F.explode(grams).alias("shingle"))


def gram_array(toks, n: int):
    """Array of space-joined word n-grams of a token-array column (one
    element per n-gram POSITION — duplicates preserved, which is what
    repetition metrics need; empty when the doc has < n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    return _exploded_shingles(df, id_col, text_col, n).distinct()


def hashed_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct 60-bit shingle hashes per document: (id, h) — the join /
    aggregate currency of the dedup tier. Hashing BEFORE the distinct
    means every downstream shuffle (the distinct itself, the inverted-
    index self-join, the Jaccard verify) moves an 8-byte int instead of
    a multi-word string — ~3-4× narrower rows on the widest stages. An
    md5 collision merging two distinct shingles is ~|shingles|²/2^61
    (vanishing); the oracle applies the identical hash, so the
    cross-engine comparison stays exact either way.
    """
    return (
        _exploded_shingles(df, id_col, text_col, n)
        .select("id", md5_long60(F.col("shingle")).alias("h"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): k MinHash values = minima of k universal-hash
    mixes of ONE 60-bit md5 per shingle. One explode + one groupBy(id)
    with k min-aggregates — a single shuffle, map-side combined, and a
    single md5 evaluation per (doc, shingle) regardless of k."""
    sh = hashed_shingles(df, id_col, text_col, shingle_n)
    return sh.groupBy("id").agg(*_minhash_aggs(num_hashes))


def _minhash_aggs(num_hashes: int) -> list:
    return [
        F.min(minhash_mix(F.col("h"), i)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def lsh_band_buckets(
    sig: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """(id, band_idx, band_hash): md5 of the concatenated signature rows in
    each band. Docs agreeing on any full band share a bucket."""
    rows = num_hashes // bands
    pieces = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        pieces.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    return sig.select(
        "id", F.explode(F.array(*pieces)).alias("band")
    ).select("id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Pipeline: signature → band buckets → bucket self-join (candidates) →
    exact Jaccard verification over shingle sets. Buckets larger than
    ``max_bucket`` are dropped (hot-bucket skew guard).

    The shingle set and the filtered buckets are **persisted**
    (MEMORY_AND_DISK): shingles feed three downstream branches (signature,
    set sizes, intersection join) and buckets feed both sides of the
    self-join — without a persist each branch re-tokenizes the corpus
    from the scan. Materializing signatures/shingles once is the standard
    production shape for LSH dedup at scale; MEMORY_AND_DISK spills
    rather than OOMs when the shingle set exceeds executor memory.
    """
    sh = tracked_persist(hashed_shingles(df, id_col, text_col, shingle_n))
    # ONE groupBy(id) pass carries the k signature minima AND the
    # shingle-set size (r11, guide §2.3): the signature and the Jaccard
    # denominator previously each shuffled the full shingle table by id;
    # persisting the merged aggregate (k+1 ints per doc) replaces the
    # second corpus-wide shuffle with a cache read.
    agg = tracked_persist(
        sh.groupBy("id").agg(
            *_minhash_aggs(num_hashes), F.count("*").alias("sz")
        )
    )
    buckets = lsh_band_buckets(agg, num_hashes, bands)
    if max_bucket:
        sizes = buckets.groupBy("band_idx", "band_hash").agg(F.count("*").alias("bsz"))
        buckets = buckets.join(
            sizes.filter(F.col("bsz") <= max_bucket), ["band_idx", "band_hash"]
        ).drop("bsz")
    buckets = tracked_persist(buckets)
    left = buckets.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
    right = buckets.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold, sizes=agg.select("id", "sz"))


def _verify_jaccard(
    cand: DataFrame, sh: DataFrame, threshold: float, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard for candidate pairs from integer set sizes; ``sh``
    is the hashed (id, h) shingle-set — the verify join moves ints.
    ``sizes`` optionally supplies a precomputed (id, sz) frame (the
    merged signature aggregate) so the denominators don't re-shuffle
    ``sh`` by id."""
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter_cnt"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter_cnt") / (F.col("sz_a") + F.col("sz_b") - F.col("inter_cnt")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_neardup_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the EXISTING corpus — the
    incremental-ingest form of MinHash-LSH dedup: today's crawl is checked
    against the accumulated corpus without ever re-pairing the corpus
    with itself, so per-ingest cost scales with |new| × collision rate,
    not |corpus|². Same signature scheme, band layout, and Jaccard verify
    as ``minhash_dup_pairs``; the candidate join is new-buckets ⋈
    corpus-buckets (asymmetric), with the hot-bucket cap applied to the
    corpus side (the side that accumulates skew over time). In production
    the corpus signatures/buckets are precomputed once at ingest and
    persisted in the catalog; here both sides are derived so the oracle
    can recompute the whole pipeline.

    Output: (id_new, id_corpus, jaccard ≥ threshold).
    """
    shn = tracked_persist(hashed_shingles(new_df, id_col, text_col, shingle_n))
    shc = tracked_persist(hashed_shingles(corpus_df, id_col, text_col, shingle_n))
    # merged signature+size aggregate (see minhash_dup_pairs): one
    # groupBy(id) pass over the corpus shingles feeds both the band
    # derivation and the Jaccard denominator
    agg_c = shc.groupBy("id").agg(
        *_minhash_aggs(num_hashes), F.count("*").alias("sz")
    )
    bc = lsh_band_buckets(agg_c, num_hashes, bands)
    return _asymmetric_neardup_check(
        shn, shc, bc, num_hashes, bands, threshold, max_bucket,
        sz_c=agg_c.select("id", "sz"),
    )


def _asymmetric_neardup_check(
    shn: DataFrame,
    shc: DataFrame,
    bc: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket: int,
    sz_c: DataFrame | None = None,
    agg_n: DataFrame | None = None,
) -> DataFrame:
    """Core of the incremental check: new-batch shingles (``shn``) are
    banded and joined against the corpus band-buckets (``bc``), then the
    candidates are Jaccard-verified against the corpus shingle sets
    (``shc``). The corpus sides are *frames*, not text — callers pass
    either freshly-derived frames (oracle convenience) or catalog table
    scans (:class:`NearDupIndex` — the production precompute shape).

    ``sz_c`` optionally supplies precomputed corpus shingle-set sizes
    (columns ``id, sz``): without it the sizes are aggregated from
    ``shc`` — a full shuffle of the corpus shingle table per check,
    which the index precomputes away. ``agg_n`` optionally supplies the
    batch's merged signature+size aggregate (``id, mh_*, sz`` — e.g.
    the persisted frame from :meth:`NearDupIndex._derive`); by default
    it is derived here in ONE groupBy(id) pass feeding both the band
    derivation and the batch-side Jaccard denominator."""
    if agg_n is None:
        agg_n = shn.groupBy("id").agg(
            *_minhash_aggs(num_hashes), F.count("*").alias("sz")
        )
    bn = lsh_band_buckets(agg_n, num_hashes, bands)
    if max_bucket:
        sizes = bc.groupBy("band_idx", "band_hash").agg(F.count("*").alias("bsz"))
        bc = bc.join(
            sizes.filter(F.col("bsz") <= max_bucket), ["band_idx", "band_hash"]
        ).drop("bsz")
    cand = (
        bn.select(F.col("id").alias("id_new"), "band_idx", "band_hash")
        .join(
            bc.select(F.col("id").alias("id_corpus"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        # a doc can legitimately exist on BOTH sides (a replayed ingest
        # micro-batch whose docs already reached the corpus) — a self-
        # pair is never a duplicate *decision*, just identity
        .filter(F.col("id_new") != F.col("id_corpus"))
        .select("id_new", "id_corpus")
        .distinct()
    )
    sz_n = agg_n.select("id", F.col("sz").alias("sz_new"))
    if sz_c is None:
        sz_c = shc.groupBy("id").agg(F.count("*").alias("sz_corpus"))
    else:
        sz_c = sz_c.select("id", F.col("sz").alias("sz_corpus"))
    inter = (
        cand.join(shn.select(F.col("id").alias("id_new"), "h"), "id_new")
        .join(shc.select(F.col("id").alias("id_corpus"), "h"), ["id_corpus", "h"])
        .groupBy("id_new", "id_corpus")
        .agg(F.count("*").alias("inter_cnt"))
    )
    return (
        inter.join(sz_n.withColumnRenamed("id", "id_new"), "id_new")
        .join(sz_c.withColumnRenamed("id", "id_corpus"), "id_corpus")
        .withColumn(
            "jaccard",
            F.col("inter_cnt")
            / (F.col("sz_new") + F.col("sz_corpus") - F.col("inter_cnt")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_new", "id_corpus", "jaccard")
    )


class NearDupIndex:
    """Catalog-persisted MinHash-LSH corpus index — the production form
    of incremental near-dup ingest.

    ``incremental_neardup_pairs`` re-derives the corpus signatures on
    every call (an oracle convenience: DuckDB can recompute the whole
    pipeline). At 100 TB that re-tokenization *is* the job, so the
    standing corpus state lives in three catalog tables instead:

    - ``{name}__shingles``: (id, h) hashed shingle sets (Jaccard verify)
      — BUCKETED on (id, h), the verify join's exact key tuple;
    - ``{name}__buckets``:  (id, band_idx, band_hash) LSH band buckets
      (candidate generation) — BUCKETED on (band_idx, band_hash), so the
      hot-bucket-cap aggregate AND the candidate join both read
      pre-partitioned data with NO Exchange above the corpus scan
      (plan-pinned in tests/test_dedup.py); only the new batch shuffles,
      so per-ingest shuffle cost is ∝ |batch|, not |corpus|;
    - ``{name}__sizes``: (id, sz) shingle-set sizes — precomputed at
      ingest so the Jaccard denominator never re-aggregates (re-shuffles)
      the corpus shingle table per check.

    :meth:`ingest` checks a new batch against the tables (per-ingest cost
    ∝ |batch| × collision rate — the corpus is scanned as 8-byte-int
    parquet, never re-tokenized; plan-guarded in tests/test_dedup.py) and
    appends the ACCEPTED documents' shingles/buckets, so the index grows
    with the corpus. Parquet appends are atomic per Spark's output
    committer; concurrent ingests need external serialization, same as
    any metastore-less parquet append."""

    def __init__(
        self,
        catalog,
        name: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = DEFAULT_NUM_HASHES,
        bands: int = DEFAULT_BANDS,
        shingle_n: int = 3,
        threshold: float = 0.5,
        max_bucket: int = 1000,
        num_buckets: int = 32,
    ):
        self.catalog = catalog
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.num_buckets = num_buckets

    @property
    def shingles_table(self) -> str:
        return f"{self.name}__shingles"

    @property
    def buckets_table(self) -> str:
        return f"{self.name}__buckets"

    @property
    def reports_table(self) -> str:
        return f"{self.name}__reports"

    @property
    def epochs_table(self) -> str:
        return f"{self.name}__epochs"

    @property
    def sizes_table(self) -> str:
        return f"{self.name}__sizes"

    @property
    def quality_table(self) -> str:
        return f"{self.name}__quality"

    @property
    def meta_table(self) -> str:
        return f"{self.name}__meta"

    _SHINGLE_KEYS = ("id", "h")
    _BUCKET_KEYS = ("band_idx", "band_hash")

    def _write_meta(self) -> None:
        """Persist the derivation parameters beside the index state —
        the hash-family version plus every knob the stored band/shingle
        values depend on. Written LAST in :meth:`build` (just before the
        tombstone drop): a crashed build leaves the OLD marker (or none),
        so readers refuse a half-migrated index instead of banding the
        new family against old buckets (ADVICE r9 medium)."""
        self.catalog.put(
            self.catalog.spark.createDataFrame(
                [(
                    int(HASH_FAMILY_VERSION),
                    int(self.num_hashes),
                    int(self.bands),
                    int(self.shingle_n),
                )],
                "hash_family BIGINT, num_hashes BIGINT, "
                "bands BIGINT, shingle_n BIGINT",
            ),
            self.meta_table,
        )

    def _check_meta(self) -> None:
        """Fail fast when the stored index was derived under a different
        MinHash family or different banding knobs than this library /
        instance. Without this, a family migration (r9: minhash_mix one
        affine round → two-round avalanche) silently collapses recall:
        the batch bands with the NEW mix against OLD stored buckets,
        gets ~zero collisions, and reports every near-dup as novel.
        One driver-side read of a one-row table — no job against the
        corpus; only paths that band NEW text against STORED buckets
        call this (check/ingest/ingest_keep_best); vacuum/compact/
        delete rewrite stored values unchanged and stay family-agnostic."""
        if not self.catalog.exists(self.meta_table):
            raise ValueError(
                f"index '{self.name}' has no hash-family marker "
                f"({self.meta_table}): it predates the family-version "
                "protocol (or a rebuild crashed before publishing the "
                "marker) — its stored band hashes cannot be trusted "
                "against this library's MinHash family "
                f"(v{HASH_FAMILY_VERSION}). Rebuild the index."
            )
        row = self.catalog.get(self.meta_table).collect()[0]
        got = (row.hash_family, row.num_hashes, row.bands, row.shingle_n)
        want = (
            HASH_FAMILY_VERSION,
            self.num_hashes,
            self.bands,
            self.shingle_n,
        )
        if got != want:
            names = ("hash_family", "num_hashes", "bands", "shingle_n")
            diff = ", ".join(
                f"{n}: stored={g} current={w}"
                for n, g, w in zip(names, got, want)
                if g != w
            )
            raise ValueError(
                f"index '{self.name}' was built under a different "
                f"MinHash derivation ({diff}): banding new text with "
                "the current family against the stored buckets would "
                "get ~zero collisions and silently admit near-dups as "
                "novel. Rebuild the index (or construct the instance "
                "with the stored knobs)."
            )

    @property
    def tombstones_table(self) -> str:
        from .tombstones import tombstones_table

        return tombstones_table(self.name)

    def _live_buckets(self) -> DataFrame:
        """The corpus bucket table minus tombstoned ids (broadcast
        anti-join — no Exchange above the bucketed scan; plan-identical
        while no delete has ever run). Every candidate funnel reads
        through this, so a deleted document can never surface as a
        near-dup match or a bucket-stats row."""
        from .tombstones import live

        return live(self.catalog, self.name, self._corpus_buckets())

    def _derive(self, df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(shingles, buckets, signature-aggregate) for a batch — the ONE
        place text is tokenized. The shingle frame is persisted so the
        bucket branch doesn't re-tokenize; the signature aggregate is
        persisted and ALSO carries the per-id shingle-set size (``sz``)
        — one groupBy(id) pass instead of two (r11, guide §2.3), shared
        by the bucket derivation, the size-table writes, and the batch
        side of every Jaccard denominator. Both persists are lazy: a
        path that never evaluates them (e.g. :meth:`check` discards the
        buckets) pays nothing."""
        sh = tracked_persist(
            hashed_shingles(df, self.id_col, self.text_col, self.shingle_n)
        )
        agg = tracked_persist(
            sh.groupBy("id").agg(
                *_minhash_aggs(self.num_hashes), F.count("*").alias("sz")
            )
        )
        return sh, lsh_band_buckets(agg, self.num_hashes, self.bands), agg

    def build(self, corpus_df: DataFrame, quality_col: str | None = None) -> None:
        """Bootstrap (or rebuild) the index from a standing corpus. Any
        standing tombstones are dropped LAST — a rebuild replaces the
        state wholesale, and the drop-last order means a crash mid-build
        can only leave extra ids hidden (conservative), never a deleted
        id resurrected.

        ``quality_col`` makes this a QUALITY-INDEXED corpus: every
        exemplar's score (cast to bigint — the exact-integer policy of
        :func:`keep_best_exemplars`; pass token counts / byte lengths /
        rule counts, never floats) is stored in ``{name}__quality`` so
        :meth:`ingest_keep_best` can challenge standing exemplars
        without re-reading their text. A quality-indexed corpus must
        ingest through :meth:`ingest_keep_best` (plain :meth:`ingest`
        refuses — see there); a rebuild WITHOUT ``quality_col`` drops
        the quality table, returning the index to first-seen-wins.

        Quality-tier crash ordering (ADVICE r9): any standing quality
        table is deleted FIRST — before the main-table puts — and the
        new one published LAST, so every crash prefix of a build leaves
        the index with NO quality table. Keep-best then refuses outright
        (missing quality) instead of deciding against stale scores
        beside new main-table state; the conservative failure is a
        refusal, never a wrong admit, restoring the "a crash mid-build
        only hides ids" guarantee for the quality tier too."""
        from .tombstones import drop_tombstones

        if self.catalog.exists(self.quality_table):
            self.catalog.delete(self.quality_table)
        sh, bk, agg = self._derive(corpus_df)
        self.catalog.put_bucketed(
            sh, self.shingles_table, self._SHINGLE_KEYS, self.num_buckets
        )
        self.catalog.put_bucketed(
            bk, self.buckets_table, self._BUCKET_KEYS, self.num_buckets
        )
        self.catalog.put_bucketed(
            agg.select("id", "sz"),
            self.sizes_table,
            "id",
            self.num_buckets,
        )
        if quality_col is not None:
            require_integral_quality(
                corpus_df, quality_col, f"NearDupIndex({self.name!r}).build"
            )
            self.catalog.put_bucketed(
                corpus_df.select(
                    F.col(self.id_col).alias("id"),
                    F.col(quality_col).cast("bigint").alias("q"),
                ),
                self.quality_table,
                "id",
                self.num_buckets,
            )
        for frame in (sh, agg):
            untrack(frame)
        self._write_meta()
        drop_tombstones(self.catalog, self.name)

    def _corpus_buckets(self) -> DataFrame:
        """The corpus bucket table, read THROUGH the session catalog so
        the scan carries its (band_idx, band_hash) bucket partitioning:
        the skew-cap aggregate and the candidate join then both run with
        no Exchange above this scan — at 100 TB, re-shuffling the
        ever-growing bucket table per ingest would BE the per-ingest
        cost. Deliberately NOT persisted: caching compiles the scan
        standalone (where the planner may drop the bucketed layout), and
        a corpus-sized cache is not a thing at scale — two bucketed
        columnar scans are cheaper than one shuffle."""
        return self.catalog.get_bucketed(self.buckets_table)

    def _corpus_shingles(self) -> DataFrame:
        """(id, h) corpus shingle sets, bucketed on exactly the Jaccard
        verify join's key tuple."""
        return self.catalog.get_bucketed(self.shingles_table)

    def _corpus_sizes(self) -> DataFrame:
        """(id, sz) shingle-set sizes, BUCKETED on id — the Jaccard
        denominator join and the retry have-set probe both key on id, so
        neither re-shuffles the corpus-cardinality size table."""
        return self.catalog.get_bucketed(self.sizes_table)

    def _corpus_quality(self) -> DataFrame:
        """(id, q) exemplar quality scores, BUCKETED on id (present only
        on a quality-indexed corpus — see :meth:`build`)."""
        return self.catalog.get_bucketed(self.quality_table)

    def check(self, new_df: DataFrame) -> DataFrame:
        """Near-dup pairs (id_new, id_corpus, jaccard ≥ threshold) of a
        new batch against the standing index — pure read, no writes; the
        corpus sides are catalog table scans. Candidates come from the
        LIVE bucket view, so a tombstoned document never matches (the
        shingle/size tables stay raw — the verify is an inner join on
        already-filtered candidate ids)."""
        self._check_meta()
        shn, _, aggn = self._derive(new_df)
        return _asymmetric_neardup_check(
            shn,
            self._corpus_shingles(),
            self._live_buckets(),
            self.num_hashes,
            self.bands,
            self.threshold,
            self.max_bucket,
            sz_c=self._corpus_sizes(),
            agg_n=aggn,
        )

    def ingest(self, new_df: DataFrame) -> DataFrame:
        """Check ``new_df`` against the corpus AND against itself, append
        the accepted documents' shingles/buckets to the index, and return
        the materialized pair report.

        Report schema: (id_new, id_corpus, jaccard, matched_in) —
        ``matched_in='corpus'`` rows match the standing index;
        ``matched_in='batch'`` rows are INTRA-batch near-duplicates
        (a crawl batch routinely contains its own duplicates, which a
        corpus-only check would silently admit wholesale), where
        ``id_corpus`` is the smaller — surviving — batch id. A document
        is rejected if it matches the corpus or ANY smaller batch id
        (transitive-dedup semantics: the min id of a duplicate chain
        survives, like ``dedup_groups``).

        The report is **eagerly localCheckpoint-ed before any append**:
        it reads the very tables the appends grow, and a lazy plan
        re-evaluated after the append would see the batch's own rows in
        the corpus (every accepted doc suddenly "matches" itself at
        jaccard 1.0). Severing lineage pins the report to the pre-ingest
        corpus state. On a cluster, use ``checkpoint`` for the same
        reason with executor-loss durability.

        Crash safety: the three appends are not one atomic unit, so each
        append anti-joins ids already present in ITS table — a retried
        partially-failed ingest tops up the missing tables instead of
        duplicating (id, h) rows (which would double that doc's set size
        in every later jaccard). Write order is buckets → sizes →
        shingles: a doc missing its shingle rows (or its size row) can
        surface as a candidate yet never yields a pair, so no crash
        window ever emits a WRONG pair — the only exposure is a missed
        detection until the retry heals the gap, exactly the window the
        two-table layout already had.

        The two operator-internal persists (batch shingles, batch
        buckets) are released before returning: the report is eagerly
        checkpointed, so nothing downstream reads them — without the
        release, a long-running ingest loop (see :meth:`ingest_stream`)
        would pin a cache per batch for the life of the process. The
        corpus scans are bucketed catalog reads, never cached (see
        :meth:`_corpus_buckets`).

        A batch containing a TOMBSTONED id is refused outright (one
        broadcast semi-join, zero cost while no delete has ever run):
        the appends anti-join physically-present ids, so a tombstoned id
        would be reported accepted yet stay invisible to every read —
        vacuum first, then re-admit (see :mod:`.tombstones`)."""
        from .tombstones import refuse_tombstoned

        self._check_meta()
        if self.catalog.exists(self.quality_table):
            raise ValueError(
                f"index '{self.name}' is quality-indexed: ingest through "
                "ingest_keep_best (every exemplar needs a quality row; a "
                "first-seen-wins ingest would admit unscored exemplars "
                "that silently win or lose every later challenge). "
                "Rebuild without quality_col to return to plain ingest."
            )
        refuse_tombstoned(self.catalog, self.name, new_df.select(self.id_col))
        shn, bn, aggn = self._derive(new_df)
        bn = tracked_persist(bn)  # feeds the self-join (both sides) + append
        bc = self._corpus_buckets()  # bucketed scan: cap + join + anti-join
        try:
            return self._ingest_inner(shn, bn, bc, aggn)
        finally:
            for frame in (shn, bn, aggn):
                untrack(frame)

    def _ingest_inner(
        self, shn: DataFrame, bn: DataFrame, bc: DataFrame, aggn: DataFrame
    ) -> DataFrame:
        # replay safety (streaming.ingest protocol point 4 / ADVICE r6):
        # a crash-replayed epoch re-runs this with the batch's accepted
        # docs already in the corpus tables — exclude ids present in the
        # replayed batch from the corpus-candidate side so the replay
        # re-derives the ORIGINAL report (intra-batch rows stay
        # matched_in='batch' instead of re-detecting as corpus matches).
        # Broadcast anti-join on the tiny batch-id set: no Exchange is
        # added above the bucketed corpus scan. The check side also
        # reads LIVE (tombstoned corpus docs must not match); the
        # have-sets below stay PHYSICAL — retry idempotence is about
        # what's on disk, not what's visible.
        from .tombstones import live

        batch_ids = shn.select("id").distinct()
        bc_check = live(self.catalog, self.name, bc).join(
            F.broadcast(batch_ids), "id", "left_anti"
        )
        corpus_pairs = _asymmetric_neardup_check(
            shn,
            self._corpus_shingles(),
            bc_check,
            self.num_hashes,
            self.bands,
            self.threshold,
            self.max_bucket,
            sz_c=self._corpus_sizes(),
            agg_n=aggn,
        )
        bnc = bn
        if self.max_bucket:  # same hot-bucket guard as minhash_dup_pairs
            sizes = bn.groupBy("band_idx", "band_hash").agg(
                F.count("*").alias("bsz")
            )
            bnc = bn.join(
                sizes.filter(F.col("bsz") <= self.max_bucket),
                ["band_idx", "band_hash"],
            ).drop("bsz")
        within_cand = (
            bnc.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
            .join(
                bnc.select(F.col("id").alias("id_b"), "band_idx", "band_hash"),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        within = _verify_jaccard(
            within_cand, shn, self.threshold, sizes=aggn.select("id", "sz")
        )
        pairs = (
            corpus_pairs.withColumn("matched_in", F.lit("corpus"))
            .union(
                within.select(
                    F.col("id_b").alias("id_new"),
                    F.col("id_a").alias("id_corpus"),
                    "jaccard",
                ).withColumn("matched_in", F.lit("batch"))
            )
            .localCheckpoint(eager=True)
        )
        dup_ids = pairs.select(F.col("id_new").alias("id")).distinct()
        # retry-idempotence have-sets: each anti-join only ever asks
        # about BATCH ids, so restrict each corpus table to the batch's
        # ids FIRST (broadcast semi-join — no Exchange above the corpus
        # scan) instead of distinct-aggregating corpus-cardinality id
        # sets per ingest. distinct() runs on ≤|batch| rows after the
        # semi-join; sizes is one row per id already. (batch_ids defined
        # above for the replay-safe corpus check.)
        have_bk = (
            bc.join(F.broadcast(batch_ids), "id", "left_semi")
            .select("id")
            .distinct()
        )
        have_sz = self._corpus_sizes().join(
            F.broadcast(batch_ids), "id", "left_semi"
        ).select("id")
        have_sh = (
            self._corpus_shingles()
            .join(F.broadcast(batch_ids), "id", "left_semi")
            .select("id")
            .distinct()
        )
        accepted_sh = shn.join(dup_ids, "id", "left_anti")
        self.catalog.append_bucketed(
            bn.join(dup_ids, "id", "left_anti").join(have_bk, "id", "left_anti"),
            self.buckets_table,
            self._BUCKET_KEYS,
            self.num_buckets,
        )
        self.catalog.append_bucketed(
            # per-id sizes come from the persisted signature aggregate —
            # filtering ids never changes a kept id's size, so this is
            # the accepted_sh re-aggregation's value without its shuffle
            aggn.select("id", "sz")
            .join(dup_ids, "id", "left_anti")
            .join(have_sz, "id", "left_anti"),
            self.sizes_table,
            "id",
            self.num_buckets,
        )
        self.catalog.append_bucketed(
            accepted_sh.join(have_sh, "id", "left_anti"),
            self.shingles_table,
            self._SHINGLE_KEYS,
            self.num_buckets,
        )
        return pairs

    def ingest_keep_best(
        self,
        new_df: DataFrame,
        quality_col: str,
        pinned: dict[str, int | None] | None = None,
    ) -> DataFrame:
        """Quality-aware ingest against a quality-indexed corpus (see
        :meth:`build`): the standing-index form of
        :func:`keep_best_exemplars` — when a BETTER copy of an existing
        exemplar arrives (crawls routinely re-see the same page more
        complete), it REPLACES the incumbent instead of being rejected
        by first-seen-wins.

        Semantics, two stages:

        1. **Intra-batch resolution** mirrors :func:`keep_best_exemplars`
           verbatim: connected components over the batch's own near-dup
           pairs, the max-``(q, -id)`` member of each batch cluster
           survives (exact bigint struct compare — no float tiebreak).
        2. **Corpus challenge**, deliberately PAIRWISE — not the batch
           form's cluster merge: each surviving challenger is admitted
           iff it beats EVERY live incumbent it collides with (one
           struct-max per challenger decides this: beating the
           ``(q, -id)``-max incumbent beats all), and admission
           tombstones exactly the incumbents it matched. Incumbents
           never fight each other — two standing exemplars were
           mutually non-dup at admission, and a challenger that LOSES
           must not retroactively delete the weaker incumbents it also
           matched (the batch CC form would collapse that whole cluster
           to one survivor; an incremental index must be order-stable).

        Returns the decision report, one row per batch doc:
        (id, q, outcome ∈ admitted/rejected_batch/rejected_corpus,
        kept_by = the batch-cluster winner / the strongest incumbent /
        NULL, n_replaced = incumbents this admission tombstoned).

        Crash safety — decisions are re-derivable under EVERY crash
        prefix, so the write order is: decision frames eagerly
        checkpointed (no writes) → the four state appends (buckets →
        sizes → shingles → quality, each anti-joined against ids
        physically present in ITS table) → beaten-incumbent tombstones
        LAST as ONE atomic append. A retry before the tombstone commit
        sees every incumbent still live (the challenge excludes batch
        ids from the corpus side, so partial batch appends are
        invisible to it) and re-derives the identical decisions; after
        it commits, the operation is complete. Until that final append
        a beaten incumbent remains visible beside its admitted
        replacement — the CONSERVATIVE direction for a dedup gate (an
        extra live near-dup can only over-reject a future batch, never
        lose data), healed by the retry.

        NOT wired into plain :meth:`ingest_stream`: the epoch-replay
        protocol requires the per-epoch report to be a pure function of
        (batch, pre-epoch state), and a FULLY-committed keep-best epoch
        destroys the pre-epoch state it needs (the beaten incumbents are
        tombstoned, so a replay would re-derive different decisions —
        e.g. admit a challenger that originally lost to a now-dead
        incumbent). The streaming form is :meth:`ingest_stream_keep_best`
        (VERDICT r9 item 2), which closes exactly that gap with
        ``pinned``: a ``{table: snapshot_version|None}`` mapping
        (``streaming/ingest.py``'s snapshot-isolated protocol) that pins
        every CORPUS-side read of the challenge — buckets, shingles,
        sizes, quality, and the tombstone view — to catalog hardlink
        snapshots taken at epoch start, so the decisions are a pure
        function of (batch, frozen state) across every crash point,
        including after the tombstone commit. The state appends and
        their have-set probes deliberately stay on the LIVE tables
        (retry idempotence is about what's physically on disk), as does
        ``append_tombstones`` (anti-joins the live tombstone set — a
        replay after the commit appends nothing). Snapshots are
        LAYOUT-PRESERVING (r11, ``Catalog.snapshot`` records the bucket
        spec and ``get_version`` re-registers the frozen tree as a
        bucketed read — the manifest-snapshot behavior of Iceberg/
        Delta), so the pinned challenge keeps the live path's
        exchange-free plans over buckets/shingles/sizes/quality instead
        of paying per-epoch corpus Exchanges (the structural scale cost
        VERDICT r10 flagged; plan-gated in tests/test_plans.py)."""
        from .tombstones import append_tombstones, live, refuse_tombstoned

        self._check_meta()
        if not self.catalog.exists(self.quality_table):
            raise ValueError(
                f"index '{self.name}' has no quality table: build the "
                "corpus with quality_col=... before ingest_keep_best"
            )
        if pinned is None:
            sh_c = self._corpus_shingles()
            sz_c = self._corpus_sizes()
            q_c = self._corpus_quality()
            bc_base = live(self.catalog, self.name, self._corpus_buckets())
        else:
            if pinned.get(self.quality_table) is None:
                raise ValueError(
                    f"index '{self.name}' had no quality table at epoch "
                    "start: a keep-best epoch cannot be pinned to an "
                    "unscored corpus"
                )
            sh_c = self.catalog.get_version(
                self.shingles_table, pinned[self.shingles_table]
            )
            sz_c = self.catalog.get_version(
                self.sizes_table, pinned[self.sizes_table]
            )
            q_c = self.catalog.get_version(
                self.quality_table, pinned[self.quality_table]
            )
            bc_base = self.catalog.get_version(
                self.buckets_table, pinned[self.buckets_table]
            )
            ts_v = pinned.get(self.tombstones_table)
            if ts_v is not None:
                bc_base = bc_base.join(
                    F.broadcast(
                        self.catalog.get_version(
                            self.tombstones_table, ts_v
                        ).select("id")
                    ),
                    "id",
                    "left_anti",
                )
        refuse_tombstoned(self.catalog, self.name, new_df.select(self.id_col))
        require_integral_quality(
            new_df, quality_col, f"NearDupIndex({self.name!r}).ingest_keep_best"
        )
        qual_n = new_df.select(
            F.col(self.id_col).alias("id"),
            F.col(quality_col).cast("bigint").alias("q"),
        )
        shn, bn, aggn = self._derive(new_df)
        bn = tracked_persist(bn)
        persisted = [shn, bn, aggn]
        try:
            batch_ids = shn.select("id").distinct()
            # --- stage 1: intra-batch keep-best (the batch operator's
            # exact semantics over the batch's own pair graph) ---
            bnc = bn
            if self.max_bucket:
                sizes = bn.groupBy("band_idx", "band_hash").agg(
                    F.count("*").alias("bsz")
                )
                bnc = bn.join(
                    sizes.filter(F.col("bsz") <= self.max_bucket),
                    ["band_idx", "band_hash"],
                ).drop("bsz")
            within_cand = (
                bnc.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
                .join(
                    bnc.select(F.col("id").alias("id_b"), "band_idx", "band_hash"),
                    ["band_idx", "band_hash"],
                )
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            within = _verify_jaccard(
                within_cand, shn, self.threshold, sizes=aggn.select("id", "sz")
            )
            # persisted: the resolution feeds the challenger funnel AND
            # the decision/report tier — without it the intra-batch
            # verify re-executes per consumer. cc_probe="exact": the
            # pair graph is batch-bounded, so the one-job-per-doubled-
            # round CC loop beats the hash-probe cadence (r12, §5)
            resolution = tracked_persist(
                keep_best_exemplars(
                    qual_n, within, F.col("q"), id_col="id", cc_probe="exact"
                )
            )
            persisted.append(resolution)
            challengers = resolution.filter(F.col("kept") == 1).select(
                F.col("doc_id").alias("id")
            )
            # --- stage 2: pairwise corpus challenge (live-or-pinned
            # view; batch ids excluded from the corpus side — the
            # replay idiom, redundant under a pinned snapshot but kept
            # as defense) ---
            bc_check = bc_base.join(F.broadcast(batch_ids), "id", "left_anti")
            corpus_pairs = _asymmetric_neardup_check(
                shn.join(F.broadcast(challengers), "id", "left_semi"),
                sh_c,
                bc_check,
                self.num_hashes,
                self.bands,
                self.threshold,
                self.max_bucket,
                sz_c=sz_c,
                # per-id signature/size rows are independent of other
                # rows, so the challenger restriction of the persisted
                # aggregate IS the filtered batch's aggregate
                agg_n=aggn.join(F.broadcast(challengers), "id", "left_semi"),
            )
            # persisted: feeds BOTH the per-challenger struct-max and the
            # beaten-incumbent set (each eagerly checkpointed below).
            # LEFT join onto quality (ADVICE r9): an incumbent missing
            # its quality row must fail LOUDLY below — an inner join
            # would silently drop the pair, admitting the challenger
            # WITHOUT tombstoning the unscored incumbent (duplicate
            # exemplars live forever). The build invariant says every
            # exemplar is scored; this guards the invariant's crash
            # windows instead of assuming them away.
            matches = tracked_persist(
                corpus_pairs.join(
                    q_c.select(
                        F.col("id").alias("id_corpus"), F.col("q").alias("q_inc")
                    ),
                    "id_corpus",
                    "left",
                )
            )
            persisted.append(matches)
            # the (q, -id)-max incumbent per challenger: beat it, beat all
            best_inc = (
                matches.groupBy("id_new")
                .agg(
                    F.max(
                        F.struct(
                            F.col("q_inc"), (-F.col("id_corpus")).alias("neg_id")
                        )
                    ).alias("b")
                )
                .select(
                    "id_new",
                    F.col("b.q_inc").alias("q_best"),
                    (-F.col("b.neg_id")).alias("best_inc"),
                )
            )
            wins = F.col("q_best").isNull() | (
                (F.col("q") > F.col("q_best"))
                | ((F.col("q") == F.col("q_best")) & (F.col("id") < F.col("best_inc")))
            )
            decided = (
                resolution.select(
                    F.col("doc_id").alias("id"),
                    F.col("score").alias("q"),
                    "kept_id",
                    "kept",
                )
                .join(
                    best_inc.withColumnRenamed("id_new", "id"), "id", "left"
                )
                .withColumn(
                    "outcome",
                    F.when(F.col("kept") == 0, F.lit("rejected_batch"))
                    .when(wins, F.lit("admitted"))
                    .otherwise(F.lit("rejected_corpus")),
                )
                .withColumn(
                    "kept_by",
                    F.when(F.col("outcome") == "rejected_batch", F.col("kept_id"))
                    .when(
                        F.col("outcome") == "rejected_corpus", F.col("best_inc")
                    )
                    .otherwise(F.lit(None).cast("bigint")),
                )
            )
            beaten_pairs = (
                matches.join(
                    decided.filter(F.col("outcome") == "admitted").select(
                        F.col("id").alias("id_new")
                    ),
                    "id_new",
                )
                .select("id_new", F.col("id_corpus").alias("id"))
                .distinct()
            )
            n_repl = beaten_pairs.groupBy("id_new").agg(
                F.count("*").cast("bigint").alias("n_replaced")
            )
            report_rows = decided.join(
                n_repl.withColumnRenamed("id_new", "id"), "id", "left"
            ).select(
                "id",
                "q",
                "outcome",
                "kept_by",
                F.coalesce("n_replaced", F.lit(0).cast("bigint")).alias(
                    "n_replaced"
                ),
            )
            # ONE eager localCheckpoint pins every decision output (the
            # report, the beaten-incumbent pairs, the unscored-incumbent
            # guard rows) AND the four physical have-set probes (r12,
            # guide §5 — the VERDICT r11 "fuse the decision checkpoints,
            # batch the have-probes" item). Before, the unscored collect
            # + two eager checkpoints were three separate jobs and each
            # append's plan re-embedded its own corpus-table probe; now
            # one job computes all of it (the four probe scans are
            # independent stages inside it, so they overlap), and the
            # appends below are batch-sized reads of the checkpoint.
            # The crash argument is unchanged: decisions are pinned
            # before any write, and each have-set reflects what was
            # physically in ITS table at probe time — no append between
            # the probe and its use touches that table, and a retry
            # re-probes fresh state. Every tagged branch is bounded by
            # |batch| (beaten/unscored by |batch|x the per-band bucket
            # cap), never corpus-sized.
            nul = F.lit(None)

            def _tagged(df, tag: str) -> DataFrame:
                return df.select(
                    F.lit(tag).alias("tag"),
                    F.col("id").cast("bigint").alias("id"),
                    nul.cast("bigint").alias("q"),
                    nul.cast("string").alias("outcome"),
                    nul.cast("bigint").alias("kept_by"),
                    nul.cast("bigint").alias("n_replaced"),
                    nul.cast("bigint").alias("id_new"),
                )

            combined = (
                report_rows.select(
                    F.lit("report").alias("tag"),
                    "id",
                    "q",
                    "outcome",
                    "kept_by",
                    "n_replaced",
                    nul.cast("bigint").alias("id_new"),
                )
                .unionByName(
                    beaten_pairs.select(
                        F.lit("beaten").alias("tag"),
                        "id",
                        nul.cast("bigint").alias("q"),
                        nul.cast("string").alias("outcome"),
                        nul.cast("bigint").alias("kept_by"),
                        nul.cast("bigint").alias("n_replaced"),
                        "id_new",
                    )
                )
                .unionByName(
                    _tagged(
                        matches.filter(F.col("q_inc").isNull())
                        .select(F.col("id_corpus").alias("id"))
                        .distinct(),
                        "unscored",
                    )
                )
                .unionByName(
                    _tagged(
                        self._corpus_buckets()
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id")
                        .distinct(),
                        "have_bk",
                    )
                )
                .unionByName(
                    _tagged(
                        self._corpus_sizes()
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id"),
                        "have_sz",
                    )
                )
                .unionByName(
                    _tagged(
                        self._corpus_shingles()
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id")
                        .distinct(),
                        "have_sh",
                    )
                )
                .unionByName(
                    _tagged(
                        self._corpus_quality()
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id"),
                        "have_q",
                    )
                )
                .localCheckpoint(eager=True)
            )
            unscored = (
                combined.filter(F.col("tag") == "unscored")
                .select("id")
                .limit(5)
                .collect()
            )
            if unscored:
                shown = sorted(r[0] for r in unscored)
                raise ValueError(
                    f"index '{self.name}' has matched incumbent(s) with "
                    f"no quality row (e.g. {shown}): the corpus quality "
                    "tier is incomplete — rebuild with quality_col=... "
                    "before keep-best ingest (deciding against unscored "
                    "incumbents would silently leave duplicates live)"
                )
            report = combined.filter(F.col("tag") == "report").select(
                "id", "q", "outcome", "kept_by", "n_replaced"
            )
            beaten = combined.filter(F.col("tag") == "beaten")
            # --- idempotent state appends (checkpointed have-sets) ---
            admitted = report.filter(F.col("outcome") == "admitted").select("id")

            def _have(tag: str) -> DataFrame:
                return F.broadcast(
                    combined.filter(F.col("tag") == tag).select("id")
                )

            have_bk = _have("have_bk")
            have_sz = _have("have_sz")
            have_sh = _have("have_sh")
            have_q = _have("have_q")
            accepted_sh = shn.join(admitted, "id", "left_semi")
            self.catalog.append_bucketed(
                bn.join(admitted, "id", "left_semi").join(
                    have_bk, "id", "left_anti"
                ),
                self.buckets_table,
                self._BUCKET_KEYS,
                self.num_buckets,
            )
            self.catalog.append_bucketed(
                aggn.select("id", "sz")
                .join(admitted, "id", "left_semi")
                .join(have_sz, "id", "left_anti"),
                self.sizes_table,
                "id",
                self.num_buckets,
            )
            self.catalog.append_bucketed(
                accepted_sh.join(have_sh, "id", "left_anti"),
                self.shingles_table,
                self._SHINGLE_KEYS,
                self.num_buckets,
            )
            self.catalog.append_bucketed(
                qual_n.join(admitted, "id", "left_semi").join(
                    have_q, "id", "left_anti"
                ),
                self.quality_table,
                "id",
                self.num_buckets,
            )
            # --- beaten incumbents: ONE atomic append, LAST ---
            append_tombstones(self.catalog, self.name, beaten.select("id"))
            return report
        finally:
            for frame in persisted:
                untrack(frame)

    def bucket_stats(self) -> DataFrame:
        """LSH posting-list health report — the lexical twin of
        ``IvfIndex.cluster_stats``: per BAND, how the candidate-
        generation cost is distributed. After many ingests, hot band
        buckets (stopword-phrase shingle patterns) concentrate
        candidate-pair work; ``check``/``ingest`` already cap them at
        query time (``max_bucket``), so ``n_over_cap``/``capped_rows``
        report how much of the standing index that cap silently
        excludes — the signal to re-shingle (larger n) or re-band.

        Returns a BOUNDED frame (one row per band): (band_idx,
        n_buckets, n_rows, max_bucket, n_over_cap, capped_rows). Two
        aggregations over the (band_idx, band_hash)-bucketed table —
        the per-bucket sizes groupBy reads pre-partitioned data with no
        Exchange above the corpus scan. Counts are LIVE (tombstoned
        documents excluded): the report feeds re-shingle/re-band
        decisions about the index users actually query; the residual
        physical cost of tombstoned rows is :meth:`vacuum`'s job."""
        sizes = (
            self._live_buckets()
            .groupBy("band_idx", "band_hash")
            .agg(F.count("*").cast("bigint").alias("bsz"))
        )
        over = F.col("bsz") > self.max_bucket
        return sizes.groupBy("band_idx").agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("bsz").cast("bigint").alias("n_rows"),
            F.max("bsz").cast("bigint").alias("max_bucket"),
            F.sum(over.cast("bigint")).cast("bigint").alias("n_over_cap"),
            F.sum(F.when(over, F.col("bsz")).otherwise(0))
            .cast("bigint")
            .alias("capped_rows"),
        )

    def delete(self, ids) -> int:
        """Tombstone ``ids`` (list[int] or a single-column DataFrame) —
        the takedown path, mirroring
        :meth:`~..similarity.IvfIndex.delete`. O(|ids|): ONE atomic
        parquet append of the newly-deleted ids; no corpus-sized table
        is touched. :meth:`check` / :meth:`ingest` / :meth:`bucket_stats`
        honor the tombstones from the moment the append commits (a
        broadcast anti-join adding no Exchange above the bucketed
        scans). Physical purging is :meth:`vacuum`; until then a
        tombstoned id cannot be re-admitted (:meth:`ingest` refuses).
        Returns how many ids were newly tombstoned."""
        from .tombstones import append_tombstones

        return append_tombstones(self.catalog, self.name, ids)

    def vacuum(self) -> int:
        """Physically purge tombstoned documents: rewrite the bucket,
        size, and shingle tables without them (layout-preserving
        bucketed overwrites), then drop the tombstone table LAST. All
        three live frames are eagerly localCheckpoint-ed BEFORE the
        first overwrite — they read the very tables being rewritten
        (use ``checkpoint`` on a cluster for executor-loss durability).
        Crash safety is the drop-last ordering: every crash prefix
        leaves the tombstones in force, so reads stay correct and a
        retry heals. Returns the number of tombstoned ids purged."""
        from .tombstones import drop_tombstones, read_tombstones

        ts = read_tombstones(self.catalog, self.name)
        if ts is None:
            return 0
        n = ts.count()
        bts = F.broadcast(ts)
        bk = self._corpus_buckets().join(bts, "id", "left_anti").localCheckpoint()
        sz = self._corpus_sizes().join(bts, "id", "left_anti").localCheckpoint()
        sh = self._corpus_shingles().join(bts, "id", "left_anti").localCheckpoint()
        ql = (
            self._corpus_quality().join(bts, "id", "left_anti").localCheckpoint()
            if self.catalog.exists(self.quality_table)
            else None
        )
        self.catalog.put_bucketed(
            bk, self.buckets_table, self._BUCKET_KEYS, self.num_buckets
        )
        self.catalog.put_bucketed(sz, self.sizes_table, "id", self.num_buckets)
        self.catalog.put_bucketed(
            sh, self.shingles_table, self._SHINGLE_KEYS, self.num_buckets
        )
        if ql is not None:
            self.catalog.put_bucketed(ql, self.quality_table, "id", self.num_buckets)
        drop_tombstones(self.catalog, self.name)
        return n

    def maintain(
        self,
        max_capped_share: float = 0.05,
        max_tombstone_share: float = 0.2,
        max_files_per_bucket: int = 8,
    ) -> dict:
        """The closed maintenance loop — the lexical twin of
        :meth:`~..similarity.IvfIndex.maintain`: one call reads the
        index's own health signals and triggers the standing remedies.

        Checks, in remedy-subsumption order (one structural action per
        call):

        1. **Hot-bucket mass**: the share of posting-list rows the
           query-time ``max_bucket`` cap silently excludes
           (:meth:`bucket_stats` ``capped_rows / n_rows``) above
           ``max_capped_share`` is REPORTED as
           ``reband_recommended=True`` but never auto-fixed — changing
           ``shingle_n``/``bands`` changes MATCH SEMANTICS, a human
           decision (an automatic re-band would silently move the
           dedup threshold under a running pipeline).
        2. **Tombstone debt**: |tombstones| > ``max_tombstone_share`` ×
           |live docs| → :meth:`vacuum`. Vacuum rewrites all three
           state tables, so check 3 is moot after it.
        3. **File fragmentation**: any state table holding more than
           ``max_files_per_bucket`` × ``num_buckets`` files →
           :meth:`compact`.

        All signals are bounded reads (bucket_stats is one row per
        band; the counts are single-column jobs; file counts are
        driver-side listings). Returns the report dict.

        Also sweeps keep-best epoch pins first (r11,
        :func:`~..streaming.ingest.sweep_epoch_pins`): snapshot trees
        and ``__snaps`` rows leaked by crashed epochs — previously
        healed only if the SAME epoch replayed — are collected here, so
        a checkpoint-dir wipe can no longer strand them. Advisory (runs
        before the one-structural-action ladder, never early-returns)."""
        from ..streaming.ingest import sweep_epoch_pins
        from .tombstones import live, read_tombstones

        swept = sweep_epoch_pins(
            self.catalog,
            self.kb_epochs_table,
            self.snaps_table,
            self.kb_snapshot_tables,
        )
        stats = self.bucket_stats().collect()  # bounded: one row per band
        rows = sum(r.n_rows for r in stats)
        capped = sum(r.capped_rows for r in stats)
        capped_share = capped / rows if rows else 0.0
        report: dict = {
            "action": "none",
            "capped_share": capped_share,
            "reband_recommended": capped_share > max_capped_share,
            "tombstone_share": 0.0,
            "max_files_per_bucket": 0.0,
            **swept,
        }
        ts = read_tombstones(self.catalog, self.name)
        if ts is not None:
            n_dead = ts.count()
            # count live docs DIRECTLY (the IvfIndex.maintain idiom):
            # delete() accepts absent ids harmlessly, so subtracting
            # |tombstones| from the corpus count would deflate n_live
            # and trigger premature vacuums (ADVICE r8)
            n_live = live(self.catalog, self.name, self._corpus_sizes()).count()
            share = n_dead / n_live if n_live > 0 else float(n_dead > 0)
            report["tombstone_share"] = share
            if share > max_tombstone_share:
                self.vacuum()
                report["action"] = "vacuum"
                return report
        tables = [self.buckets_table, self.sizes_table, self.shingles_table]
        if self.catalog.exists(self.quality_table):
            # quality-indexed corpora append a quality file set per
            # keep-best ingest — it fragments exactly like sizes
            tables.append(self.quality_table)
        files = max(
            self.catalog.file_count(t) / self.num_buckets for t in tables
        )
        report["max_files_per_bucket"] = files
        if files > max_files_per_bucket:
            self.compact()
            report["action"] = "compact"
        return report

    def compact(self) -> dict[str, int]:
        """Compact all three append-heavy state tables back to ~one file
        per bucket (``Catalog.compact_bucketed`` — layout-preserving; the
        plain compactor refuses bucketed tables). Run periodically under
        streaming ingest: each epoch appends a file set per table, and
        scan/listing cost grows with file count, not data size. Returns
        {table: new_file_count}."""
        out = {
            self.buckets_table: self.catalog.compact_bucketed(
                self.buckets_table, self._BUCKET_KEYS, self.num_buckets
            ),
            self.sizes_table: self.catalog.compact_bucketed(
                self.sizes_table, "id", self.num_buckets
            ),
            self.shingles_table: self.catalog.compact_bucketed(
                self.shingles_table, self._SHINGLE_KEYS, self.num_buckets
            ),
        }
        if self.catalog.exists(self.quality_table):
            out[self.quality_table] = self.catalog.compact_bucketed(
                self.quality_table, "id", self.num_buckets
            )
        return out

    def ingest_stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ) -> None:
        """Continuous-ingest form: drain a streaming source through
        :meth:`ingest` one micro-batch at a time via ``foreachBatch`` —
        the standard Structured-Streaming pattern for sinks with their
        own write logic. Each batch's pair report is appended to
        ``{name}__reports`` (with the epoch id) so the stream's dedup
        decisions stay auditable; the corpus tables grow exactly as if
        the batches had been ingested sequentially in batch mode.
        Uses Trigger.AvailableNow: processes what exists, then stops
        (drop the trigger for a long-running continuous ingest).

        ``maintain_every=N`` runs :meth:`maintain` (with
        ``maintain_kwargs``) after every Nth committed epoch — the
        scheduler the maintain docstring asks for: at 100 TB the loop
        nobody has to remember to invoke is the only loop that runs.

        Replay safety: the marker-last epoch-commit protocol, shared
        with :meth:`~..similarity.IvfIndex.ingest_stream` — see
        :mod:`..streaming.ingest` for the full at-least-once argument
        (skip on marker, top-up marker on report-without-marker, re-run
        only on neither; :meth:`ingest`'s anti-joins heal
        partially-written state).

        A QUALITY-INDEXED corpus (built with ``quality_col``) cannot be
        drained through this stream: :meth:`ingest` refuses it — use
        :meth:`ingest_stream_keep_best`, the snapshot-isolated form."""
        from ..streaming.ingest import run_epoch_idempotent_ingest

        run_epoch_idempotent_ingest(
            stream_df,
            checkpoint_dir,
            self.catalog,
            self.reports_table,
            self.epochs_table,
            self.ingest,
            maintain_fn=lambda: self.maintain(**(maintain_kwargs or {})),
            maintain_every=maintain_every,
        )

    @property
    def kb_reports_table(self) -> str:
        return f"{self.name}__kb_reports"

    @property
    def kb_epochs_table(self) -> str:
        return f"{self.name}__kb_epochs"

    @property
    def snaps_table(self) -> str:
        return f"{self.name}__snaps"

    @property
    def kb_snapshot_tables(self) -> list[str]:
        """The corpus tables a keep-best epoch pins — ONE list shared by
        the ingest protocol and :meth:`maintain`'s pin sweep, so the
        sweep can never miss (or overreach) a pinned namespace."""
        return [
            self.buckets_table,
            self.shingles_table,
            self.sizes_table,
            self.quality_table,
            self.tombstones_table,
        ]

    def ingest_stream_keep_best(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        quality_col: str,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ) -> None:
        """STREAMING keep-best (VERDICT r9 item 2): drain a crawl stream
        through :meth:`ingest_keep_best` under the marker-last protocol
        with SNAPSHOT-ISOLATED epochs. Crawl ingestion — keep-best's
        motivating workload (the better copy of a page arriving later) —
        is streaming, and plain replay breaks on keep-best because a
        committed epoch's tombstones destroy the pre-epoch state its
        replay needs. The fix is the catalog's existing hardlink
        snapshots (``Catalog.snapshot``, r6): at each epoch's FIRST
        attempt, the five corpus tables the challenge reads (buckets,
        shingles, sizes, quality, tombstones) are frozen and the pin
        recorded in ``{name}__snaps`` BEFORE the ingest runs; a replay
        at ANY crash point — including after the beaten-incumbent
        tombstones committed — re-reads the identical frozen state and
        re-derives the ORIGINAL decisions bit-exact (pytest: the
        crash-replay matrix in tests/test_keep_best_index.py). Each
        epoch's decision report (id, q, outcome, kept_by, n_replaced,
        epoch_id) is appended to ``{name}__kb_reports``; markers live in
        ``{name}__kb_epochs`` (separate from the plain-ingest tables —
        the report schemas differ, and an index is either first-seen or
        keep-best, enforced by the quality-table checks on both paths).
        Committed epochs' snapshots are released best-effort after the
        marker (``Catalog.drop_version``); leaks are advisory garbage
        for ``prune_versions``. ``maintain_every=N`` schedules
        :meth:`maintain` after every Nth committed epoch, as in
        :meth:`ingest_stream`."""
        from ..streaming.ingest import run_epoch_idempotent_ingest

        run_epoch_idempotent_ingest(
            stream_df,
            checkpoint_dir,
            self.catalog,
            self.kb_reports_table,
            self.kb_epochs_table,
            lambda batch, pinned: self.ingest_keep_best(
                batch, quality_col, pinned=pinned
            ),
            maintain_fn=lambda: self.maintain(**(maintain_kwargs or {})),
            maintain_every=maintain_every,
            snapshot_tables=self.kb_snapshot_tables,
            snaps_table=self.snaps_table,
        )


# ---------------------------------------------------------------------------
# decontamination (train ↔ benchmark n-gram overlap)
# ---------------------------------------------------------------------------


def _contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_shared: int,
    max_bucket: int,
) -> DataFrame:
    """(bench_id, train_id, shared): the train↔benchmark n-gram overlap
    pairs at ≥ ``min_shared`` shared shingles — the one funnel behind
    both the per-bench report (:func:`decontaminate_report`) and the
    applied train-side prune (:func:`contaminated_train_ids`). The
    benchmark shingle set broadcasts (eval suites are KBs–MBs); the
    train shingles are scanned once, capped, joined map-side."""
    # persist the train shingle set: it feeds BOTH the frequency cap and
    # the overlap join — without it the (100 TB) train corpus is scanned
    # and tokenized twice (observed in the physical plan)
    ts = tracked_persist(shingles(train, id_col, text_col, n))
    if max_bucket:
        freq = ts.groupBy("shingle").agg(F.count("*").alias("df_cnt"))
        ts = ts.join(freq.filter(F.col("df_cnt") <= max_bucket), "shingle").drop(
            "df_cnt"
        )
    bs = shingles(bench, id_col, text_col, n).withColumnRenamed("id", "bench_id")
    return (
        ts.join(F.broadcast(bs), "shingle")
        .groupBy(F.col("bench_id"), F.col("id").alias("train_id"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def contaminated_train_ids(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
    max_bucket: int = 1_000,
) -> DataFrame:
    """The APPLIED decontamination prune: the single id column of
    training documents sharing ≥ ``min_shared`` n-gram shingles with
    ANY benchmark document — exactly the ``train_id`` side of the
    report's pair funnel, rolled to the train axis. A pretraining
    pipeline anti-joins this before dedup (leaked eval passages are
    precisely the fluent text every later quality stage keeps)."""
    return (
        _contamination_pairs(
            train, bench, id_col, text_col, n, min_shared, max_bucket
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )


def decontaminate_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
    max_bucket: int = 1_000,
) -> DataFrame:
    """Benchmark-decontamination report: for every benchmark document,
    how many training documents share ≥ ``min_shared`` n-gram shingles
    with it (and the worst offender's shared count) — the standard
    eval-set-leakage check an LLM training pipeline runs before training
    (real deployments use n = 8..13; the parameter is the knob).

    Scale shape: the training side is the 100 TB corpus; the benchmark
    side is a handful of eval suites (KBs–MBs of text), so its shingle
    set is **broadcast** — the train shingles are scanned once, joined
    map-side, and never shuffled. Hot train shingles past ``max_bucket``
    docs are stopword phrases with no leakage signal and are dropped
    (the same posting-list cap as ``ngram_jaccard_pairs``). Output is one
    row per benchmark doc (zero-hit docs included — a report with silent
    gaps would read as "clean" where it was "unchecked").
    """
    pair_shared = _contamination_pairs(
        train, bench, id_col, text_col, n, min_shared, max_bucket
    )
    per_bench = pair_shared.groupBy("bench_id").agg(
        F.count("*").alias("n_contaminated"),
        F.max("shared").alias("max_shared"),
    )
    all_bench = bench.select(F.col(id_col).alias("bench_id")).distinct()
    return all_bench.join(per_bench, "bench_id", "left").select(
        "bench_id",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.coalesce(F.col("max_shared"), F.lit(0)).alias("max_shared"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash): per-token 60-bit md5 hashes vote ±1 on each bit
    position; the signature bit is 1 where the vote sum is positive.

    One explode + one groupBy(id) carrying ``bits`` small integer sums —
    wide but shallow, fully map-side combinable. Token *multiset* voting
    (repeat tokens vote repeatedly), the classic Charikar construction.
    """
    from ..functions.hashes import md5_long60

    from ..sources.readers import ensure_parallelism

    # repartition BEFORE the explode: shuffles |docs| rows, not |tokens|
    tok = (
        ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(tokenize(text_col)).alias("tok"))
        .select("id", md5_long60(F.col("tok")).alias("h"))
    )
    # hash projected ONCE above; the 60 vote expressions below only do
    # shift/mask on the materialised column (not 60 md5 computations/row).
    # Expressions are built as SQL strings: a ``bits``-wide Column tree
    # assembled call-by-call costs hundreds of py4j round trips (~1-2 s of
    # driver time — more than executing the query); ``F.expr`` parses each
    # in a single call, and the parsed plan is identical.
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = tok.groupBy("id").agg(*votes)
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for b in range(bits)
        )
    )
    return voted.select("id", sig.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole: with ``bands`` disjoint bit-bands and max_hamming <
    bands, any qualifying pair agrees exactly on ≥1 band → the band
    self-join is a *complete* candidate generator (no recall loss), and
    it's a bucket join, never |docs|².
    """
    assert max_hamming < bands, "pigeonhole completeness needs max_hamming < bands"
    # the signature feeds both sides of the band self-join — persist so
    # the tokenize+vote pipeline runs once, not twice (standard
    # materialize-signatures shape; MEMORY_AND_DISK spills, never OOMs)
    sig = tracked_persist(simhash(df, id_col, text_col, bits))
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    pieces = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("id", "simhash", F.explode(F.array(*pieces)).alias("bd")).select(
        "id", "simhash", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_val").alias("band_val")
    )
    left = buckets.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "band_idx", "band_val"
    )
    right = buckets.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "band_idx", "band_val"
    )
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1_000,
) -> DataFrame:
    """All pairs with n-gram-set Jaccard ≥ threshold, via an
    inverted-index join (pairs must share ≥1 shingle). ``max_bucket``
    caps the posting-list length per shingle (hot-shingle skew guard)
    — a shingle present in that many docs carries no dedup signal.

    Defaults are the scale-safe choice: trigram shingles (``n=3``, like
    ``minhash_signature``) — unigram posting lists are dominated by
    stopwords, so even a capped hot shingle admits ~max_bucket²/2
    candidate pairs of near-zero dedup signal. ``n=1`` remains opt-in
    for short-string/keyword corpora where trigrams are too sparse.

    The (filtered) shingle set feeds three branches — per-doc sizes and
    both sides of the inverted-index self-join — so it is persisted once
    (MEMORY_AND_DISK) instead of re-tokenizing the corpus per branch.
    All of it runs on the hashed (id, h) form: the posting-list join and
    the distinct shuffle 8-byte ints, not shingle strings."""
    sh = hashed_shingles(df, id_col, text_col, n)
    if max_bucket:
        freq = sh.groupBy("h").agg(F.count("*").alias("df_cnt"))
        sh = sh.join(freq.filter(F.col("df_cnt") <= max_bucket), "h").drop("df_cnt")
    sh = tracked_persist(sh)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter_cnt"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter_cnt") / (F.col("sz_a") + F.col("sz_b") - F.col("inter_cnt")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
