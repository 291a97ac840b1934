"""Embedding similarity search [EXT] over an ``array<float>`` column.

Two tiers, the standard large-scale pattern:

- **Brute force** (``cosine_topk``, ``cosine_neardup_pairs``): exact
  cosine via JVM-side ``zip_with``/``aggregate`` higher-order functions —
  no Python in the loop. Exact and oracle-checkable; per-query cost is a
  full scan, so it's the *baseline* tier and the verify step for the
  approximate tier.
- **LSH-bucketed** (``rhp_signature``, ``cosine_topk_lsh``): random-
  hyperplane signatures with hyperplanes derived *deterministically* from
  md5 (no RNG, no state to ship); candidates come from bucket joins, so
  cost scales with collisions, not |corpus|². Approximate (recall < 1);
  tested against the brute-force tier.

Determinism: dot products fold left-to-right over the array via
``aggregate`` in double precision; scores are rounded to 6 decimals with
an id tiebreak before any top-k cut, so ranking is reproducible across
engines (floating-point last-ulp noise cannot reorder results). This
applies to EVERY ranking in the module — including the IVF centroid
assignment and probe selection — so the whole approximate tier is a
deterministic function of the input and can be twinned in oracle SQL
(:func:`duckdb_rhp_bucket` emits the byte-identical DuckDB form of the
hyperplane buckets; centroids are the first ``n_centroids`` ids, not
k-means RNG).

At 100 TB: queries are broadcast (they're the small side by construction);
the corpus is never shuffled for brute force. The ``row_number`` ≤ k
filter plans as a TWO-STAGE top-k: Catalyst inserts ``WindowGroupLimit
… Partial`` below the exchange, pruning every map partition to its local
top-k per query before any shuffle, so the exchange moves ≤ k rows per
(query, partition) and the final per-query sort handles ≤ k·P rows —
never the full scored corpus (plan-pinned in tests/test_plans.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double fold of the element products (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def _prep(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    n_alias: str,
    spread: bool = True,
) -> DataFrame:
    """Corpus-side prep: spread across cores, cast the vector to double
    and compute its norm ONCE per row (projected *below* the exchange, so
    the cast array and norm ride the shuffle instead of being re-derived
    per scored pair). Values are bit-identical to inline evaluation —
    same left-to-right fold — just computed per row, not per pair.

    ``spread=False`` for sides known tiny (filtered query sets, centroid
    lists): skips the under-partitioning probe, which costs a driver-side
    plan→RDD conversion per call."""
    sel = emb.select(
        F.col(id_col).alias(id_alias), _to_double(F.col(vec_col)).alias(vec_alias)
    )
    if spread:
        from ..sources.readers import ensure_parallelism

        sel = ensure_parallelism(sel)
    return sel.withColumn(n_alias, norm(F.col(vec_alias)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours for each query id (excluding self).

    Output: (query_id, neighbor_id, score, rank); score rounded to 6
    decimals, rank ties broken by neighbor_id — fully deterministic.
    """
    queries = _prep(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col,
        "query_id", "qvec", "qn", spread=False,
    )
    cand = _prep(emb, id_col, vec_col, "neighbor_id", "cvec", "cn")
    scored = (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank"))
    )


def mmr_rerank(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    pool: int = 16,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998,
    SIGIR): diversity-aware selection over each query's candidate pool —
    the retrieval stack's answer to near-duplicate result lists (a
    top-k of paraphrases is k slots spent on one answer). Greedy: pick
    ``argmax lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` k
    times; lam=1 degenerates to plain top-k, lam→0 maximizes pairwise
    diversity.

    Spark-first shape (NO Python in the scoring path — the greedy loop
    unrolls into k tiny JVM stages, the ``kmeans_refine`` idiom): the
    corpus is touched ONCE by the pool retrieval
    (:func:`cosine_topk` — or pass ``candidates`` from the IVF/LSH
    tier to reuse a standing index); every MMR step then runs on
    queries × pool rows — broadcast-joined, frames of a few hundred
    rows regardless of corpus size, each step ``localCheckpoint``-ed so
    plan depth stays O(1) in k. At 100 TB the rerank costs what the
    pool retrieval costs; MMR itself is corpus-size-free.

    Determinism (oracle-twinned, the unrolled-step pattern): qsims and
    pairwise sims round to 6 decimals before scoring; the per-step
    argmax breaks ties on the smaller neighbor_id; the emitted ``mmr``
    is the RAW double of ``lam·qsim − (1−lam)·pen`` — three IEEE ops in
    fixed order over identical rounded inputs and identical double
    constants, so the value is bit-equal cross-engine (a final
    round(…, 6) would NOT be: lam × a 6-decimal score lands exactly on
    decimal halves, where Spark's BigDecimal HALF_UP and a binary
    double round disagree — measured at sf0.01). Returns one row per
    selected doc:
    ``(query_id, neighbor_id, mmr, mmr_rank)``, mmr_rank 1-based in
    selection order."""
    from ..cache import tracked_persist, untrack

    cand = (
        candidates
        if candidates is not None
        else cosine_topk(emb, query_ids, k=pool, id_col=id_col, vec_col=vec_col)
    )
    v = emb.select(
        F.col(id_col).alias("nid"), _to_double(F.col(vec_col)).alias("nvec")
    ).withColumn("nn", norm(F.col("nvec")))
    # one corpus pass attaches candidate vectors: the corpus side is
    # big, the candidate side is queries x pool — broadcast it
    cand = tracked_persist(
        v.join(
            F.broadcast(cand.select("query_id", "neighbor_id", "score")),
            v.nid == F.col("neighbor_id"),
        ).select("query_id", "neighbor_id", "score", "nvec", "nn")
    )
    try:
        pick_struct = F.max(
            F.struct(
                F.col("mmr"),
                (-F.col("neighbor_id")).alias("neg_id"),
                F.col("neighbor_id").alias("nid"),
            )
        ).alias("m")

        def argmax(scored: DataFrame, rank: int) -> DataFrame:
            picked = (
                scored.groupBy("query_id")
                .agg(pick_struct)
                .select(
                    "query_id",
                    F.col("m.nid").alias("neighbor_id"),
                    F.col("m.mmr").alias("mmr"),
                    F.lit(rank).cast("bigint").alias("mmr_rank"),
                )
            )
            # rejoin for the picked doc's vector (arrays stay out of the
            # struct-max comparator)
            return picked.join(
                cand.select("query_id", "neighbor_id", "nvec", "nn"),
                ["query_id", "neighbor_id"],
            )

        selected = argmax(
            cand.withColumn("mmr", F.lit(lam) * F.col("score")), 1
        ).localCheckpoint(eager=True)
        for step in range(2, k + 1):
            rem = cand.join(
                selected.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_anti",
            )
            pen = (
                rem.join(
                    selected.select(
                        "query_id",
                        F.col("nvec").alias("svec"),
                        F.col("nn").alias("sn"),
                    ),
                    "query_id",
                )
                .withColumn(
                    "psim",
                    F.round(
                        dot(F.col("nvec"), F.col("svec"))
                        / (F.col("nn") * F.col("sn")),
                        6,
                    ),
                )
                .groupBy("query_id", "neighbor_id", "score")
                .agg(F.max("psim").alias("pen"))
            )
            scored = pen.join(
                rem.select("query_id", "neighbor_id", "nvec", "nn"),
                ["query_id", "neighbor_id"],
            ).withColumn(
                "mmr",
                F.lit(lam) * F.col("score") - F.lit(1 - lam) * F.col("pen"),
            )
            selected = selected.unionByName(
                argmax(scored, step)
            ).localCheckpoint(eager=True)
        out = selected.select("query_id", "neighbor_id", "mmr", "mmr_rank")
    finally:
        untrack(cand)
    return out


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    planes: int = 12,
) -> DataFrame:
    """Embedding near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    ``use_lsh=True`` generates candidates from random-hyperplane buckets
    (approximate, scale path); otherwise all pairs are scored (exact,
    oracle path — quadratic, for verification scale only).
    """
    a = _prep(emb, id_col, vec_col, "id_a", "vec_a", "n_a")
    b = _prep(emb, id_col, vec_col, "id_b", "vec_b", "n_b")
    if use_lsh:
        sig = rhp_signature(emb, id_col=id_col, vec_col=vec_col, planes=planes)
        cand = (
            sig.select(F.col("id").alias("id_a"), F.col("bucket").alias("bucket_a"))
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("bucket").alias("bucket_b")),
                F.col("bucket_a") == F.col("bucket_b"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "score",
            F.round(
                dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")), 6
            ),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _plane_coeffs(plane: int, dims: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — no RNG, reproducible
    anywhere (bit 0 of md5("rhp|{plane}|{dim}"))."""
    out = []
    for d in range(dims):
        h = hashlib.md5(f"rhp|{plane}|{d}".encode()).digest()
        out.append(1.0 if h[0] & 1 else -1.0)
    return out


def rhp_signature(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    dims: int = 64,
) -> DataFrame:
    """(id, bucket): random-hyperplane LSH signature packed into a BIGINT.
    Sign of ⟨v, plane_p⟩ sets bit p. Cosine-similar vectors agree on most
    bits, so equal buckets concentrate near-duplicates."""
    from ..sources.readers import ensure_parallelism

    # cast projected once below the (local-only) exchange; each plane's
    # projection then folds over the materialised double array.
    # The whole bucket expression is ONE parsed SQL string: building it as
    # a Column tree costs ~planes×dims py4j round trips (~1 s of driver
    # time); the parsed plan is identical.
    prepped = ensure_parallelism(
        emb.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    )
    terms = []
    for p in range(planes):
        arr = ",".join(
            "1.0D" if c > 0 else "-1.0D" for c in _plane_coeffs(p, dims)
        )
        proj = (
            f"aggregate(zip_with(v, array({arr}), (x, y) -> x * y), "
            f"0.0D, (acc, w) -> acc + w)"
        )
        terms.append(
            f"(CASE WHEN ({proj}) >= 0 THEN CAST({2 ** p} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return prepped.select("id", F.expr(" + ".join(terms)).alias("bucket"))


def duckdb_rhp_bucket(vec_expr: str, planes: int = 12, dims: int = 64) -> str:
    """DuckDB SQL twin of :func:`rhp_signature`'s bucket expression, for
    oracle construction (same pattern as ``functions.hashes.duckdb_*``).

    Bit-exactness argument: Spark folds ``aggregate(zip_with(v, plane,
    (x, y) -> x*y), 0.0, acc+w)`` left-to-right; every coefficient is
    ±1.0, and IEEE multiplication by ±1.0 is exact, so the fold equals
    ``((0.0 + s0·v[0]) + s1·v[1]) + …``. The emitted SQL is the same
    left-associated chain over the same double values, so the projection
    — and therefore the sign test and the bucket — is bit-identical in
    both engines (``-0.0 >= 0`` is true in both, so a signed zero cannot
    diverge either).
    """
    terms = []
    for p in range(planes):
        proj = " + ".join(
            f"({c:.1f} * {vec_expr}[{d + 1}])"
            for d, c in enumerate(_plane_coeffs(p, dims))
        )
        terms.append(
            f"(CASE WHEN (0.0 + {proj}) >= 0 THEN CAST({2 ** p} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(terms) + ")"


def _nearest_centroid(
    prepped: DataFrame,
    centroids: DataFrame,
    id_alias: str = "id",
    vec_alias: str = "vec",
    n_alias: str = "vn",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Broadcast nearest-centroid assignment over a prepped
    (id, vec, norm) frame: cosine ROUNDED TO 6 DECIMALS, centroid_id
    tiebreak, best row per vector. This is THE single definition of
    the assignment contract — ivf_assign, kmeans_refine's Lloyd rounds,
    semdedup_prune, and IvfIndex.neardup_check all call it, and every
    centroid oracle replays exactly this expression — so the
    determinism-critical rounding/tiebreak cannot desynchronize between
    consumers. Returns (id, centroid_id, *keep).

    Implemented as ONE ``max(struct)`` aggregate over the broadcast
    cross join, not a row_number window (r11, guide §2.3 "aggregate
    before you shuffle"): the (sim, -centroid_id) prefix is unique per
    vector — centroid ids are distinct — so the struct max IS the old
    rank-1 row, bit-identically (Spark's one total order covers the
    NULL/NaN corners the same way the window's ``desc`` did: an all-NULL
    sim group falls back to the min-centroid_id tiebreak in both forms).
    The aggregate partial-combines map-side, so the exchange moves ONE
    pre-reduced row per vector instead of k candidate rows through a
    window sort — on a Lloyd round carrying ``keep=("vec",)`` that is
    k× fewer shuffled 64-double arrays and no per-partition sort.
    ``keep`` columns ride the struct tail and are never reached by the
    comparison (the prefix already decides it)."""
    sim = F.round(
        dot(F.col(vec_alias), F.col("cvec")) / (F.col(n_alias) * F.col("cn")), 6
    )
    m = F.max(
        F.struct(
            sim.alias("__asim"),
            (-F.col("centroid_id")).alias("__negc"),
            *[F.col(c).alias(c) for c in keep],
        )
    ).alias("__m")
    return (
        prepped.crossJoin(F.broadcast(centroids))
        .groupBy(id_alias)
        .agg(m)
        .select(
            id_alias,
            (-F.col("__m.__negc")).alias("centroid_id"),
            *[F.col(f"__m.{c}").alias(c) for c in keep],
        )
    )


def _min_id_exemplar(
    scored: DataFrame, out_id: str, kept_col: str, sim_col: str
) -> DataFrame:
    """(out_id, centroid_id, kept_id, sim): the smallest matching id per
    (out_id, centroid_id) group with its cosine, via ``min(struct)`` —
    ids are unique within a group, so the aggregate is deterministic.
    Shared by semdedup_prune and IvfIndex.neardup_check (the oracles'
    ``min``/``arg_min`` pair is its SQL twin)."""
    m = F.min(
        F.struct(F.col(kept_col).alias("kept_id"), F.col(sim_col).alias("sim"))
    ).alias("m")
    return (
        scored.groupBy(out_id, "centroid_id")
        .agg(m)
        .select(out_id, "centroid_id", F.col("m.kept_id"), F.col("m.sim"))
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer with DETERMINISTIC centroids: the first
    ``n_centroids`` vectors by id serve as centroids (no k-means RNG —
    reproducible across runs/engines; production would refine with
    k-means, which only improves balance, not the algorithm shape).
    Pass ``centroids`` — a (centroid_id, cvec, cn) frame, e.g. from
    :func:`kmeans_refine` — to assign against a trained quantizer
    instead of the id-ordered seeds.

    Returns (centroids, assignment) where assignment = (id, centroid_id)
    by max cosine. Assignment is one broadcast pass over the corpus.
    Similarities are rounded to 6 decimals (centroid_id tiebreak) before
    ranking, so the assignment is bit-stable across engines — the oracle
    SQL reproduces it exactly.
    """
    if centroids is None:
        centroids = _prep(
            emb.orderBy(id_col).limit(n_centroids), id_col, vec_col,
            "centroid_id", "cvec", "cn", spread=False,
        )
    assignment = _nearest_centroid(
        _prep(emb, id_col, vec_col, "id", "vec", "vn"), centroids
    )
    return centroids.select("centroid_id", "cvec", "cn"), assignment


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors assigned to the
    query's ``nprobe`` closest centroids. Work per query ∝ corpus/
    n_centroids × nprobe instead of the full corpus; recall tested
    against the exact tier. ``centroids`` (optional) swaps the
    id-ordered seeds for a trained quantizer (see :func:`ivf_assign`)."""
    centroids, assignment = ivf_assign(emb, n_centroids, id_col, vec_col, centroids)
    queries = _prep(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col,
        "query_id", "qvec", "qn", spread=False,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn(
            "csim",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    cand = probes.join(assignment, "centroid_id").select(
        "query_id", F.col("id").alias("neighbor_id")
    ).filter(F.col("neighbor_id") != F.col("query_id")).distinct()
    q = _prep(emb, id_col, vec_col, "query_id", "qvec", "qn", spread=False)
    c = _prep(emb, id_col, vec_col, "neighbor_id", "cvec", "cn")
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "score",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank"))
    )


LC_SCALE = 1_000_000


def _quantized_component_means(comp: DataFrame, key: str) -> DataFrame:
    """(key, dim, val) → (key, dim, m): component mean, bit-stable at any
    parallelism. A double ``avg`` is partition-order-dependent (IEEE
    addition is not associative), so each component is quantized to an
    exact integer at 6 decimals first — ``floor(x·1e6 + 0.5)``, the
    cross-engine half-up idiom shared with the int8 quantizer — summed as
    bigint (exact, order-free), then divided back. The MEAN is quantized
    with the same floor(x + 0.5) idiom, NOT ``round(x, 6)``: both
    engines evaluate floor on the identical IEEE quotient double, whereas
    round-to-decimals diverges at representable 7th-decimal half-ties
    (Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    scaled double — e.g. s=249, n=2 gives 0.000125 vs 0.000124).
    The one shuffle keys on (key, dim): |keys|·d keys regardless of
    corpus size, fully map-side combined."""
    return (
        comp.groupBy(key, "dim")
        .agg(
            F.sum(
                F.floor(F.col("val") * F.lit(float(LC_SCALE)) + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            key,
            "dim",
            (
                F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
                .cast("bigint")
                .cast("double")
                / F.lit(float(LC_SCALE))
            ).alias("m"),
        )
    )


def _means_to_centroids(means: DataFrame, key: str) -> DataFrame:
    """(key, dim, m) → (key, cvec, cn): reassemble the component means
    into dim-ordered vectors with their norms."""
    return (
        means.groupBy(key)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
        .withColumn("cn", norm(F.col("cvec")))
    )


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean embedding via the quantized-exact component means
    (see :func:`_quantized_component_means`). Returns
    (centroid_label, cvec, cn)."""
    from ..sources.readers import ensure_parallelism

    v = ensure_parallelism(
        emb.select(
            F.col(label_col).alias("centroid_label"),
            _to_double(F.col(vec_col)).alias("vec"),
        )
    )
    comp = v.select("centroid_label", F.posexplode("vec").alias("dim", "val"))
    return _means_to_centroids(
        _quantized_component_means(comp, "centroid_label"), "centroid_label"
    )


def nearest_centroid_confusion(
    emb: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid classification report over a labelled embedding
    table: assign every vector to its closest label centroid (rounded
    cosine, label tiebreak — the module's determinism contract) and roll
    up the (label, assigned_label) confusion matrix. The standard
    embedding-space quality check: off-diagonal mass = labels whose
    clusters bleed into each other.

    Scale shape: centroids are |labels| rows — broadcast; the corpus is
    scanned once, never shuffled for scoring (same funnel as the IVF
    assignment pass); the output is ≤ |labels|² rows.

    The per-vector argmax reuses :func:`_nearest_centroid`'s
    ``max(struct)`` aggregate (r11, guide §2.3 — previously a
    ``row_number`` window over the corpus×|labels| cross join, i.e. an
    Exchange of |labels|× the corpus rows plus a per-partition sort):
    the string label tiebreak becomes the struct form's integer
    tiebreak by ranking the |labels|-row centroid frame into dense
    ``centroid_id``s ordered by ``centroid_label`` — the (sim ROUNDED
    DESC, label ASC) order of the oracle is then exactly
    ``max(sim, -centroid_id)``, including the NULL/NaN corners
    (:func:`_nearest_centroid`'s argument). The ranking window runs
    over |labels| rows on one partition — bounded by label
    cardinality, never corpus size."""
    cents = label_centroids(emb, label_col, vec_col)
    wl = Window.orderBy("centroid_label")
    cents = cents.select(
        F.row_number().over(wl).alias("centroid_id"),
        "centroid_label",
        "cvec",
        "cn",
    )
    from ..sources.readers import ensure_parallelism

    v = ensure_parallelism(
        emb.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("true_label"),
            _to_double(F.col(vec_col)).alias("vec"),
        )
    ).withColumn("vn", norm(F.col("vec")))
    assigned = _nearest_centroid(
        v, cents, keep=("true_label", "centroid_label")
    )
    return (
        assigned.groupBy("true_label", "centroid_label")
        .agg(F.count("*").cast("bigint").alias("n_vecs"))
        .select(
            F.col("true_label").alias("label"),
            F.col("centroid_label").alias("assigned_label"),
            "n_vecs",
        )
    )


def kmeans_refine(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd) refinement of the IVF
    coarse quantizer — the iterative-training counterpart to
    :func:`ivf_assign`'s id-ordered seeds (which production IVF would
    refine exactly like this to balance the inverted lists).

    Determinism at any parallelism, the property the rest of this repo
    is built on, needs care in two places:

    - **assignment**: cosine rounded to 6 decimals, centroid_id
      tiebreak — same contract as :func:`ivf_assign`;
    - **means**: a double ``avg`` is partition-order-dependent (IEEE
      addition is not associative), so components are quantized to exact
      integers at 6 decimals and summed as bigint — order-independent —
      then the quotient is re-quantized with the same floor(x + 0.5)
      idiom (:func:`_quantized_component_means`; this twins in DuckDB
      SQL, unlike a DECIMAL(38,18) cast or ``round(x, 6)``, whose
      rounding differs between engines).
      Re-running with any repartitioning yields bit-identical centroids.

    Scale shape per iteration: ONE broadcast assignment pass over the
    corpus (per-row window bounded by k candidates) + ONE component-mean
    shuffle whose keys are (centroid, dim) — k·d keys regardless of
    corpus size, fully map-side combined. Empty clusters keep their
    previous centroid (anti-join + union of the k-row frames). Each
    round's k-row centroid frame is ``localCheckpoint``-ed so plan depth
    stays O(1) in ``iters``.

    Returns (centroid_id, cvec, cn) — drop-in for the centroid side of
    :func:`cosine_topk_ivf`'s probe and assignment joins.
    """
    corpus = _prep(emb, id_col, vec_col, "id", "vec", "vn")
    centroids = _prep(
        emb.orderBy(id_col).limit(n_centroids), id_col, vec_col,
        "centroid_id", "cvec", "cn", spread=False,
    ).select("centroid_id", "cvec", "cn")
    for _ in range(iters):
        assigned = _nearest_centroid(corpus, centroids, keep=("vec",)).select(
            "centroid_id", "vec"
        )
        comp = assigned.select(
            "centroid_id", F.posexplode("vec").alias("dim", "val")
        )
        new_c = _means_to_centroids(
            _quantized_component_means(comp, "centroid_id"), "centroid_id"
        )
        # clusters that attracted no vectors keep their previous centroid
        kept = centroids.join(new_c.select("centroid_id"), "centroid_id", "anti")
        centroids = new_c.select("centroid_id", "cvec", "cn").union(kept)
        # lazy: the next round's broadcast build (or the caller's first
        # action) materializes it — one job per round, not two; the
        # checkpoint still truncates the plan so depth stays O(1)
        centroids = centroids.localCheckpoint(eager=False)
    return centroids


def semdedup_prune(
    emb: DataFrame,
    n_centroids: int | None = None,
    iters: int = 2,
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embedding space with the deterministic
    spherical k-means quantizer (:func:`kmeans_refine`), then prune
    within-cluster near-duplicates by pairwise cosine. The semantic
    counterpart of the lexical MinHash tier: catches paraphrases and
    re-encodings that share no shingles.

    Prune rule (deterministic, one pass — no transitive closure, per the
    paper's per-cluster formulation): vector ``i`` is pruned when some
    ``j < i`` in the same cluster has ``cos(i, j) >= tau``; its exemplar
    ``kept_id`` is the smallest such ``j``. Matches the repo's min-id
    representative convention (``dedup.py`` exact tier).

    Determinism: final-centroid assignment reuses ``kmeans_refine``'s
    contract (cosine rounded to 6 decimals, centroid_id tiebreak); pair
    cosines round the same way; the exemplar is picked by ``min(struct)``
    on the unique ``j`` id, so every emitted double is bit-stable.

    Scale shape: ONE broadcast-centroid assignment pass over the corpus,
    then ONE shuffle on centroid_id for the within-cluster self-join.
    The pairwise work is quadratic ONLY within a cluster — the paper's
    core trade; k MUST grow with the corpus (they use ~50k clusters for
    LAION) so cluster populations stay bounded, and the training pass is
    k·d-keyed regardless of corpus size. Corpus rows are never compared
    across clusters.

    ``n_centroids=None`` (the default) is CAPACITY-SIZED: k resolves to
    :func:`ivf_capacity`'s √N rule from one corpus count, so
    within-cluster candidate volume grows as N^1.5 instead of the
    fixed-K form's N²/K — SCALE.md measured fixed-K at 0.83–0.88
    per decade and its IVF sibling DNF'd the 100× check (shuffle spill
    past the box's disk) while √N sizing completed it. Pass an explicit
    k only for parity-tier comparisons whose oracle bakes the constant
    in; the capacity oracle twin recomputes the SAME √N as a SQL LIMIT
    expression, so auto-sizing stays bit-deterministic cross-engine.

    Returns one row per PRUNED vector: (vec_id, centroid_id, kept_id,
    sim) with sim = cos(vec_id, kept_id) rounded to 6 decimals.
    """
    if centroids is None and n_centroids is None:
        n_centroids, _ = ivf_capacity(emb.count())
    cents = (
        centroids
        if centroids is not None
        else kmeans_refine(emb, n_centroids, iters, id_col, vec_col)
    )
    corpus = _prep(emb, id_col, vec_col, "id", "vec", "vn")
    from ..cache import tracked_persist

    # persisted: BOTH sides of the within-cluster self-join read the
    # assignment — one broadcast-centroid pass over the corpus, not two
    assigned = tracked_persist(
        _nearest_centroid(corpus, cents, keep=("vec", "vn"))
    )
    left = assigned.select(
        F.col("id").alias("vec_id"),
        "centroid_id",
        F.col("vec").alias("avec"),
        F.col("vn").alias("an"),
    )
    right = assigned.select(
        F.col("id").alias("j_id"),
        F.col("centroid_id").alias("j_centroid"),
        F.col("vec").alias("bvec"),
        F.col("vn").alias("bn"),
    )
    pairs = (
        left.join(
            right,
            (F.col("centroid_id") == F.col("j_centroid"))
            & (F.col("j_id") < F.col("vec_id")),
        )
        .withColumn(
            "psim",
            F.round(
                dot(F.col("avec"), F.col("bvec")) / (F.col("an") * F.col("bn")), 6
            ),
        )
        .filter(F.col("psim") >= F.lit(tau))
    )
    return _min_id_exemplar(pairs, "vec_id", "j_id", "psim")


def semdedup_keep_best(
    emb: DataFrame,
    quality: DataFrame,
    n_centroids: int | None = None,
    iters: int = 2,
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """QUALITY-AWARE SemDeDup — the batch semantic form of the keep-best
    family, completing its symmetry across all three dedup tiers
    (lexical batch :func:`~.dedup.keep_best_exemplars`, both standing
    indexes' ``ingest_keep_best``, and now the batch semantic prune):
    where :func:`semdedup_prune` keeps each near-duplicate's SMALLEST id
    (the min-id convention), this keeps the BEST-quality copy.

    Prune rule (deterministic, one pass — the same per-cluster,
    no-transitive-closure shape as :func:`semdedup_prune`): vector ``i``
    is pruned when some same-cluster ``j`` with ``cos(i, j) >= tau``
    DOMINATES it by ``(q, -id)`` (higher quality wins; quality ties
    break to the smaller id — exactly :func:`~.dedup.keep_best_exemplars`'s
    exact-integer ordering, so no float quality may enter ``quality``).
    ``kept_id`` is the BEST such dominator. ``(q, -id)`` is a strict
    total order, so every tau-pair has exactly one dominator and the
    survivor set is exactly the local (q, -id)-maxima — like the min-id
    form, a pruned vector's exemplar may itself be pruned by a still
    better copy (the paper's one-pass formulation).

    ``quality`` is an ``(id_col, q)`` frame covering EVERY input vector
    EXACTLY ONCE, with an integral ``q``; violations raise loudly
    (ADVICE r9/r10 lessons, all three the same class of silent
    wrong-answer: an inner join would silently drop unscored pairs and
    leave duplicates live; a float ``q`` would silently truncate under
    the bigint cast and can flip dominance and ties; a duplicated id
    multiplies rows through the left join AND the self-join, emitting
    inconsistent pruned/keeper rows).

    ``n_centroids=None`` (default) is capacity-sized via
    :func:`ivf_capacity`'s √N rule — see :func:`semdedup_prune`; the
    fixed-K form's N²/K within-cluster volume is the measured
    DNF-at-100× class.

    Scale shape: identical to :func:`semdedup_prune` — one broadcast-
    centroid assignment, one centroid_id-shuffled within-cluster
    self-join (still ``j < i``: dominance just picks the pair's winner
    afterward, so the join volume does not double), one struct-max per
    pruned vector. Returns one row per PRUNED vector:
    ``(vec_id, centroid_id, kept_id, sim)`` with sim = cos(vec_id,
    kept_id) rounded to 6 decimals."""
    from ..cache import tracked_persist, untrack
    from ..operators.dedup import require_integral_quality

    require_integral_quality(quality, "q", "semdedup_keep_best")
    if centroids is None and n_centroids is None:
        n_centroids, _ = ivf_capacity(emb.count())
    cents = (
        centroids
        if centroids is not None
        else kmeans_refine(emb, n_centroids, iters, id_col, vec_col)
    )
    corpus = _prep(emb, id_col, vec_col, "id", "vec", "vn")
    q = quality.select(
        F.col(id_col).alias("id"), F.col("q").cast("bigint").alias("q")
    )
    # duplicate-id probe (≤5-row guard): duplicates would multiply rows
    # through the left join and the self-join with no failure anywhere
    dup = q.groupBy("id").count().filter(F.col("count") > 1).limit(5).collect()
    if dup:
        shown = sorted(r["id"] for r in dup)
        raise ValueError(
            f"semdedup_keep_best: duplicate quality row(s) for id(s) "
            f"{shown} — quality must score every vector exactly once"
        )
    assigned = tracked_persist(
        _nearest_centroid(corpus, cents, keep=("vec", "vn")).join(q, "id", "left")
    )
    unscored = assigned.filter(F.col("q").isNull()).select("id").limit(5).collect()
    if unscored:
        untrack(assigned)
        shown = sorted(r[0] for r in unscored)
        raise ValueError(
            f"semdedup_keep_best: vector(s) with no quality row (e.g. "
            f"{shown}) — quality must cover every input vector (deciding "
            "against unscored vectors would silently leave duplicates)"
        )
    left = assigned.select(
        F.col("id").alias("vec_id"),
        "centroid_id",
        F.col("vec").alias("avec"),
        F.col("vn").alias("an"),
        F.col("q").alias("aq"),
    )
    right = assigned.select(
        F.col("id").alias("j_id"),
        F.col("centroid_id").alias("j_centroid"),
        F.col("vec").alias("bvec"),
        F.col("vn").alias("bn"),
        F.col("q").alias("bq"),
    )
    pairs = (
        left.join(
            right,
            (F.col("centroid_id") == F.col("j_centroid"))
            & (F.col("j_id") < F.col("vec_id")),
        )
        .withColumn(
            "psim",
            F.round(
                dot(F.col("avec"), F.col("bvec")) / (F.col("an") * F.col("bn")), 6
            ),
        )
        .filter(F.col("psim") >= F.lit(tau))
    )
    # each tau-pair's single dominator: with j_id < vec_id, a quality
    # TIE goes to j (the smaller id)
    win_b = F.col("bq") >= F.col("aq")
    cand = pairs.select(
        F.when(win_b, F.col("vec_id")).otherwise(F.col("j_id")).alias("pruned_id"),
        "centroid_id",
        F.when(win_b, F.col("j_id")).otherwise(F.col("vec_id")).alias("keeper_id"),
        F.when(win_b, F.col("bq")).otherwise(F.col("aq")).alias("keeper_q"),
        "psim",
    )
    # the (q, -id)-max dominator per pruned vector; unique keeper ids
    # make the struct-max deterministic, and psim rides along
    m = F.max(
        F.struct(
            F.col("keeper_q").alias("q"),
            (-F.col("keeper_id")).alias("neg_id"),
            F.col("keeper_id").alias("kept_id"),
            F.col("psim").alias("sim"),
        )
    ).alias("m")
    return (
        cand.groupBy("pruned_id", "centroid_id")
        .agg(m)
        .select(
            F.col("pruned_id").alias("vec_id"),
            "centroid_id",
            F.col("m.kept_id").alias("kept_id"),
            F.col("m.sim").alias("sim"),
        )
    )


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    max_band_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose RHP signature is
    within ``max_band_hamming`` bits of the query's, then exact cosine +
    rank on the candidate set only. Recall is tested against
    :func:`cosine_topk` (see tests); it trades a bounded recall loss for
    candidate-set-sized work instead of corpus-sized per query.

    Radius guidance: a neighbour at angle θ disagrees with the query on
    ~planes·θ/π planes in expectation — near-dup search (cos ≥ 0.9)
    works at radius 2 of 12; looser similarity regimes need a wider
    radius (or fewer planes) at the cost of larger candidate sets."""
    sig = rhp_signature(emb, id_col=id_col, vec_col=vec_col, planes=planes)
    qsig = sig.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("bucket").alias("qbucket")
    )
    cand_ids = (
        sig.crossJoin(F.broadcast(qsig))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn(
            "hd", F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket")))
        )
        .filter(F.col("hd") <= max_band_hamming)
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    q = _prep(emb, id_col, vec_col, "query_id", "qvec", "qn", spread=False)
    c = _prep(emb, id_col, vec_col, "neighbor_id", "cvec", "cn")
    scored = (
        cand_ids.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "score",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank"))
    )


def ivf_capacity(n_vectors: int) -> tuple[int, int]:
    """Capacity-scaled IVF parameters — the standard ``√N`` sizing rule
    (FAISS guidelines; Jégou et al., *Product Quantization for Nearest
    Neighbor Search*, §V): ``n_centroids ≈ √N`` balances the two costs a
    probe pays — the broadcast quantizer compare (∝ n_centroids) and the
    probed posting lists (∝ nprobe · N / n_centroids) — so per-query
    candidate work grows as N^(3/4) with ``nprobe ≈ √n_centroids =
    N^(1/4)``, never linearly. Fixture-sized constants (the 16/4
    defaults of the oracle-twinned queries) stop making sense past a few
    thousand vectors: posting lists grow linearly and every
    ``neardup_check``/``search`` pays cluster population, not corpus
    mean. Measured on the synthetic embeddings: recall@5 ≥ 0.88 at
    N=500 and 1.00 at N=2000 against the exact tier (gated in
    tests/test_capacity.py at two scale factors).

    Returns ``(n_centroids, nprobe)``, each clamped to [1, N] (and
    n_centroids to ≤ 65536 — a 65k-row broadcast is the sensible
    quantizer ceiling before a hierarchical/IMI layout is warranted)."""
    import math

    if n_vectors <= 0:
        return 1, 1
    n_centroids = max(1, min(65536, round(math.sqrt(n_vectors)), n_vectors))
    nprobe = max(1, min(round(math.sqrt(n_centroids)), n_centroids))
    return n_centroids, nprobe


class IvfIndex:
    """Catalog-persisted IVF ANN index — the precompute form of
    :func:`cosine_topk_ivf`, mirroring :class:`~..dedup.NearDupIndex`'s
    storage design. ``cosine_topk_ivf`` re-derives centroids, assignments,
    and every vector norm per query (the oracle convenience); at 100 TB
    the assignment pass IS the job, so the index pays it once:

    - ``{name}__centroids``: (centroid_id, cvec, cn) — the quantizer;
      tiny (k rows), broadcast at query time;
    - ``{name}__assign``: (id, centroid_id) — BUCKETED on centroid_id,
      so the probe join reads pre-partitioned postings with no Exchange
      above the corpus-sized scan;
    - ``{name}__vectors``: (id, vec, vn) — cast-to-double vectors with
      precomputed norms, BUCKETED on id, so the exact-rescore join never
      shuffles (or re-norms) the vector table.

    Search math is bit-identical to :func:`cosine_topk_ivf` with the same
    quantizer (6-decimal-rounded sims, id tiebreaks), so the stored-index
    path shares the recompute path's DuckDB oracle."""

    def __init__(
        self,
        catalog,
        name: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int | None = None,
        nprobe: int | None = None,
        num_buckets: int = 32,
    ):
        """``n_centroids``/``nprobe`` may be omitted: ``None`` means
        capacity-scaled — :func:`ivf_capacity`'s √N rule, resolved from
        the corpus count at :meth:`build` time (and from the STORED
        centroid count at query time, so an auto-sized instance can
        attach to a standing index and probe it consistently). The
        oracle-twinned registry queries pass explicit constants — their
        DuckDB SQL bakes the same numbers in."""
        self.catalog = catalog
        self.name = name
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.num_buckets = num_buckets

    def _resolved_n_centroids(self) -> int:
        """Declared n_centroids, or (auto-sized instance attached to a
        standing index) the stored quantizer's size."""
        if self.n_centroids is not None:
            return self.n_centroids
        return self.catalog.get(self.centroids_table).count()

    def _resolved_nprobe(self) -> int:
        """Declared nprobe, or √n_centroids per :func:`ivf_capacity`."""
        if self.nprobe is not None:
            return self.nprobe
        import math

        k = self._resolved_n_centroids()
        return max(1, min(round(math.sqrt(k)), k))

    @property
    def centroids_table(self) -> str:
        return f"{self.name}__centroids"

    @property
    def assign_table(self) -> str:
        return f"{self.name}__assign"

    @property
    def vectors_table(self) -> str:
        return f"{self.name}__vectors"

    @property
    def quality_table(self) -> str:
        return f"{self.name}__quality"

    @property
    def tombstones_table(self) -> str:
        from .tombstones import tombstones_table

        return tombstones_table(self.name)

    def _corpus_quality(self) -> DataFrame:
        """(id, q) exemplar quality scores, BUCKETED on id (present only
        on a quality-indexed corpus — see :meth:`build`)."""
        return self.catalog.get_bucketed(self.quality_table)

    def _live_assign(self) -> DataFrame:
        """The assignment table minus tombstoned ids (broadcast
        anti-join — no Exchange above the bucketed scan; plan-identical
        when no delete has ever run). Every candidate funnel reads
        through this, so a deleted vector can never surface as a
        neighbor, a near-dup match, or a cluster-stats row."""
        from .tombstones import live

        return live(
            self.catalog, self.name, self.catalog.get_bucketed(self.assign_table)
        )

    def build(
        self,
        emb: DataFrame,
        centroids: DataFrame | None = None,
        quality_col: str | None = None,
    ) -> None:
        """Assign the corpus to the quantizer (id-ordered seeds, or pass
        a ``kmeans_refine``-trained frame) and persist all three tables.
        A (re)build REPLACES the index state, so any standing tombstones
        are dropped LAST — the caller supplied the corpus, deletions
        against the old state don't constrain it, and the drop-last
        order means a crash mid-build can only leave extra ids hidden
        (conservative), never a deleted id resurrected.

        An auto-sized instance (``n_centroids=None``) resolves the
        quantizer size here from the corpus count (:func:`ivf_capacity`
        — one count job, paid once per build, never per query).

        ``quality_col`` makes this a QUALITY-INDEXED corpus (the
        semantic twin of :meth:`~..dedup.NearDupIndex.build`'s quality
        tier): every exemplar's score (cast to bigint — exact-integer
        argmax, never a float tiebreak) lands in ``{name}__quality`` so
        :meth:`ingest_keep_best` can challenge standing exemplars. A
        quality-indexed corpus must ingest through
        :meth:`ingest_keep_best` (plain :meth:`ingest` refuses); a
        build WITHOUT ``quality_col`` drops the quality table, returning
        to first-seen-wins (:meth:`rebuild` preserves the tier — it
        re-derives the live (vec, q) frame and builds WITH quality).

        Quality-tier crash ordering (ADVICE r9, shared with the lexical
        twin): any standing quality table is deleted FIRST and the new
        one published LAST, so every crash prefix leaves the index with
        NO quality table — keep-best refuses (missing quality) instead
        of deciding against stale scores beside new main-table state."""
        from .tombstones import drop_tombstones

        if self.catalog.exists(self.quality_table):
            self.catalog.delete(self.quality_table)
        n_cent = self.n_centroids
        if n_cent is None and centroids is None:
            n_cent, _ = ivf_capacity(emb.count())
        cents, assign = ivf_assign(
            emb, n_cent, self.id_col, self.vec_col, centroids
        )
        self.catalog.put(cents, self.centroids_table)
        self.catalog.put_bucketed(
            assign, self.assign_table, "centroid_id", self.num_buckets
        )
        self.catalog.put_bucketed(
            _prep(emb, self.id_col, self.vec_col, "id", "vec", "vn"),
            self.vectors_table,
            "id",
            self.num_buckets,
        )
        if quality_col is not None:
            from ..operators.dedup import require_integral_quality

            require_integral_quality(
                emb, quality_col, f"IvfIndex({self.name!r}).build"
            )
            self.catalog.put_bucketed(
                emb.select(
                    F.col(self.id_col).alias("id"),
                    F.col(quality_col).cast("bigint").alias("q"),
                ),
                self.quality_table,
                "id",
                self.num_buckets,
            )
        drop_tombstones(self.catalog, self.name)

    def search_ids(self, query_ids: list[int], k: int = 5) -> DataFrame:
        """Top-k neighbors for corpus vectors ``query_ids`` against the
        standing index — the query-by-corpus-member convenience over
        :meth:`search`; pure read, only the (tiny) query/probe/candidate
        side ever shuffles. A tombstoned query id is treated as absent —
        no result rows — exactly as if it had never been admitted."""
        from .tombstones import live

        vectors = live(
            self.catalog, self.name, self.catalog.get_bucketed(self.vectors_table)
        )
        queries = vectors.filter(F.col("id").isin(query_ids)).select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vn").alias("qn"),
        )
        return self._search_prepped(queries, k)

    def search(
        self,
        query_emb: DataFrame,
        k: int = 5,
        id_col: str | None = None,
        vec_col: str | None = None,
    ) -> DataFrame:
        """Top-k neighbors for ARBITRARY query vectors — the general ANN
        query path (a free-text/RAG query embeds OUTSIDE the corpus and
        searches the standing index; :meth:`search_ids` is the
        query-by-corpus-member convenience). ``query_emb`` is an
        (id, vector) frame keyed like the index by default; query ids
        are the caller's namespace — a query id that happens to equal a
        corpus id excludes that one corpus vector from its own results
        (the self-exclusion rule), so callers with external queries
        should use ids outside the corpus id space (e.g. negatives).
        Same math, same determinism contract, same funnel shape as
        :meth:`search_ids` — the query side is prepped, broadcast, and
        probed; nothing corpus-sized shuffles."""
        queries = _prep(
            query_emb,
            id_col or self.id_col,
            vec_col or self.vec_col,
            "query_id",
            "qvec",
            "qn",
            spread=False,
        )
        return self._search_prepped(queries, k)

    def _search_prepped(self, queries: DataFrame, k: int) -> DataFrame:
        """The one probe/rescore funnel behind both search forms:
        ``queries`` carries (query_id, qvec, qn). Candidates come from
        the LIVE assignment view, so tombstoned vectors never reach the
        rescore (the vector table itself can stay raw — the rescore is
        an inner join on already-filtered candidate ids)."""
        cents = F.broadcast(self.catalog.get(self.centroids_table))
        vectors = self.catalog.get_bucketed(self.vectors_table)
        assign = self._live_assign()
        wq = Window.partitionBy("query_id").orderBy(
            F.col("csim").desc(), F.col("centroid_id")
        )
        probes = (
            queries.crossJoin(cents)
            .withColumn(
                "csim",
                F.round(
                    dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6
                ),
            )
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= self._resolved_nprobe())
            .select("query_id", "centroid_id")
        )
        cand = (
            probes.join(assign, "centroid_id")
            .select("query_id", F.col("id").alias("neighbor_id"))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .distinct()
        )
        nb = vectors.select(
            F.col("id").alias("neighbor_id"),
            F.col("vec").alias("cvec"),
            F.col("vn").alias("cn"),
        )
        scored = (
            cand.join(F.broadcast(queries), "query_id")
            .join(nb, "neighbor_id")
            .withColumn(
                "score",
                F.round(
                    dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")), 6
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "score",
                F.col("rank").cast("bigint").alias("rank"),
            )
        )

    def neardup_check(self, batch_emb: DataFrame, tau: float) -> DataFrame:
        """Incremental SEMANTIC near-dup check of a new batch against the
        standing index — the SemDeDup counterpart of
        :meth:`~..dedup.NearDupIndex.check`: each batch vector is
        assigned to its nearest stored centroid (broadcast, k rows) and
        compared against ONLY that cluster's stored members.

        Candidate funnel mirrors :meth:`search_ids`: the bucketed
        assignment table supplies the cluster posting lists with no
        Exchange above the corpus scan (the batch side broadcasts onto
        it), and the exact-cosine verify joins the bucketed vector table
        on the candidate side only — per-check cost ∝ |batch| × cluster
        population, never |corpus|²; the corpus is never re-assigned,
        re-normed, or shuffled.

        Returns (vec_id, centroid_id, kept_id, sim): one row per batch
        vector with a same-cluster corpus neighbor at cos ≥ ``tau``;
        ``kept_id`` is the smallest such corpus id (the repo's min-id
        exemplar convention), ``sim`` its 6-decimal-rounded cosine.
        """
        cents = self.catalog.get(self.centroids_table)
        batch = _prep(
            batch_emb, self.id_col, self.vec_col, "vec_id", "bvec", "bn",
            spread=False,
        )
        bassign = _nearest_centroid(
            batch, cents, id_alias="vec_id", vec_alias="bvec", n_alias="bn",
            keep=("bvec", "bn"),
        )
        return self._neardup_check_assigned(bassign, tau)

    def _neardup_check_assigned(
        self,
        bassign: DataFrame,
        tau: float,
        exclude_batch_ids: bool = False,
        collapse: bool = True,
        assign: DataFrame | None = None,
        vectors: DataFrame | None = None,
    ) -> DataFrame:
        """The check core over an already-assigned batch frame
        (vec_id, centroid_id, bvec, bn) — shared by :meth:`neardup_check`
        and :meth:`ingest`, which has the assignment persisted already
        and must not pay the broadcast-centroid crossJoin twice.

        ``exclude_batch_ids`` (the ingest path) drops corpus candidates
        whose id appears anywhere in THIS batch: a crash-replayed epoch
        (ADVICE r6) re-runs ingest with the batch's accepted ids already
        in the state tables, and without the exclusion those rows would
        re-detect as ``matched_in='corpus'`` (duplicating / re-classing
        the original intra-batch rows) — with it, a replay re-derives
        the original report exactly. The read-only :meth:`neardup_check`
        keeps the unfiltered funnel (a batch id genuinely present in the
        corpus should surface as a corpus match there).

        ``assign``/``vectors`` optionally OVERRIDE the live corpus
        frames — the snapshot-pinned keep-best epoch path passes frozen
        versions so its decisions stay replay-stable (see
        :meth:`ingest_keep_best`); every other caller gets the live
        bucketed scans."""
        if vectors is None:
            vectors = self.catalog.get_bucketed(self.vectors_table)
        if assign is None:
            assign = self._live_assign()
        cand = (
            assign.join(F.broadcast(bassign), "centroid_id")
            .withColumnRenamed("id", "cid")
            .filter(F.col("cid") != F.col("vec_id"))
        )
        if exclude_batch_ids:
            cand = cand.join(
                F.broadcast(bassign.select(F.col("vec_id").alias("cid"))),
                "cid",
                "left_anti",
            )
        nb = vectors.select(
            F.col("id").alias("cid"),
            F.col("vec").alias("nvec"),
            F.col("vn").alias("nn"),
        )
        scored = (
            cand.join(nb, "cid")
            .withColumn(
                "sim",
                F.round(
                    dot(F.col("bvec"), F.col("nvec")) / (F.col("bn") * F.col("nn")),
                    6,
                ),
            )
            .filter(F.col("sim") >= F.lit(tau))
        )
        if not collapse:
            # the keep-best challenge needs EVERY matched incumbent
            # (it tombstones all of them on a win), not the min-id
            # exemplar summary
            return scored.select("vec_id", "centroid_id", "cid", "sim")
        return _min_id_exemplar(scored, "vec_id", "cid", "sim")

    @property
    def reports_table(self) -> str:
        return f"{self.name}__reports"

    @property
    def epochs_table(self) -> str:
        return f"{self.name}__epochs"

    def ingest(self, batch_emb: DataFrame, tau: float) -> DataFrame:
        """Admit a new batch into the standing index under a semantic
        near-dup gate — the embedding-space twin of
        :meth:`~..dedup.NearDupIndex.ingest`.

        Each batch vector is assigned to its nearest FROZEN centroid
        (standard IVF practice: the quantizer is trained once; re-train
        = rebuild) and rejected if it has (a) a same-cluster CORPUS
        neighbor at cos ≥ ``tau`` (:meth:`neardup_check`) or (b) a
        same-cluster SMALLER-id batch neighbor at cos ≥ ``tau`` — a
        batch routinely contains its own semantic duplicates, which a
        corpus-only check would admit wholesale; the min id of a chain
        survives, the NearDupIndex/dedup_groups convention. Accepted
        vectors are appended to the assignment and vector tables.

        Returns the pair report (vec_id, centroid_id, kept_id, sim,
        matched_in ∈ {'corpus','batch'}), **eagerly localCheckpoint-ed
        before any append** — it reads the very tables the appends grow,
        so a lazy plan re-evaluated afterwards would see the batch's own
        rows in the corpus (use ``checkpoint`` on a cluster for
        executor-loss durability).

        Crash safety mirrors NearDupIndex.ingest: the two appends
        anti-join ids already present in THEIR table, so a retried
        half-failed ingest tops up instead of duplicating; and the
        corpus-candidate funnel excludes ids present in the batch
        itself, so a full RE-RUN of the ingest (a crash-replayed stream
        epoch whose accepted ids already reached the state tables)
        re-derives the original report byte-for-byte instead of
        re-classing intra-batch matches as corpus matches
        (streaming/ingest.py protocol point 4). Write order
        assign → vectors: an id present in assign but not yet vectors
        surfaces as a candidate and silently drops out of the
        exact-rescore inner join — a missed detection until the retry
        heals it, never a wrong pair (the reverse order would hide the
        id from the candidate funnel entirely, same exposure).

        A batch containing a TOMBSTONED id is refused outright (one
        broadcast semi-join, zero cost while no delete has ever run):
        the appends anti-join physically-present ids, so a tombstoned id
        would be reported accepted yet stay invisible to every read —
        vacuum first, then re-admit (see :mod:`.tombstones`)."""
        from ..cache import tracked_persist, untrack
        from .tombstones import refuse_tombstoned

        if self.catalog.exists(self.quality_table):
            raise ValueError(
                f"index '{self.name}' is quality-indexed: ingest through "
                "ingest_keep_best (every exemplar needs a quality row; a "
                "first-seen-wins ingest would admit unscored exemplars "
                "that silently win or lose every later challenge). "
                "Rebuild without quality_col to return to plain ingest."
            )
        refuse_tombstoned(
            self.catalog, self.name, batch_emb.select(F.col(self.id_col))
        )
        cents = self.catalog.get(self.centroids_table)
        # ONE broadcast-centroid assignment pass, persisted: the corpus
        # check, the intra-batch self-join (both sides), and the appends
        # all consume it
        bassign = tracked_persist(
            _nearest_centroid(
                _prep(
                    batch_emb, self.id_col, self.vec_col, "vec_id", "bvec",
                    "bn", spread=False,
                ),
                cents,
                id_alias="vec_id", vec_alias="bvec", n_alias="bn",
                keep=("bvec", "bn"),
            )
        )
        try:
            return self._ingest_inner(bassign, tau)
        finally:
            untrack(bassign)

    def _ingest_inner(self, bassign: DataFrame, tau: float) -> DataFrame:
        # exclude_batch_ids: a replayed epoch (crash between the state
        # appends and the report append) must re-derive the ORIGINAL
        # report — without the exclusion the already-admitted batch ids
        # re-detect as corpus matches (see _neardup_check_assigned)
        corpus_rows = self._neardup_check_assigned(
            bassign, tau, exclude_batch_ids=True
        ).withColumn("matched_in", F.lit("corpus"))
        b1 = bassign
        b2 = bassign.select(
            F.col("vec_id").alias("cid"),
            "centroid_id",
            F.col("bvec").alias("nvec"),
            F.col("bn").alias("nn"),
        )
        within = (
            b1.join(F.broadcast(b2), "centroid_id")
            .filter(F.col("cid") < F.col("vec_id"))
            .withColumn(
                "sim",
                F.round(
                    dot(F.col("bvec"), F.col("nvec")) / (F.col("bn") * F.col("nn")),
                    6,
                ),
            )
            .filter(F.col("sim") >= F.lit(tau))
        )
        batch_rows = _min_id_exemplar(within, "vec_id", "cid", "sim").withColumn(
            "matched_in", F.lit("batch")
        )
        # sever lineage BEFORE the appends mutate the tables it reads
        report = corpus_rows.unionByName(batch_rows).localCheckpoint()
        dup_ids = report.select("vec_id").distinct()
        accepted = bassign.join(dup_ids, "vec_id", "left_anti")
        # retry-idempotence have-sets, batch-restricted FIRST (r11, the
        # idiom ingest_keep_best and NearDupIndex._ingest_inner already
        # use — guide §2.3/§2.4): the anti-join only ever asks about
        # BATCH ids, so each corpus table is cut to them with a
        # broadcast semi-probe (no Exchange above the bucketed scan)
        # before the anti-join. The unrestricted form joined the
        # batch-sized accepted frame against a CORPUS-cardinality id
        # column — a corpus-side shuffle+sort per ingest that grows
        # with the index, exactly the per-ingest cost class the
        # bucketed layout exists to avoid. Results are identical: ids
        # outside the batch can never match the anti-join's probe side.
        batch_ids = bassign.select(F.col("vec_id").alias("id")).distinct()
        have_a = (
            self.catalog.get_bucketed(self.assign_table)
            .join(F.broadcast(batch_ids), "id", "left_semi")
            .select("id")
        )
        self.catalog.append_bucketed(
            accepted.select(F.col("vec_id").alias("id"), "centroid_id").join(
                have_a, "id", "left_anti"
            ),
            self.assign_table,
            "centroid_id",
            self.num_buckets,
        )
        have_v = (
            self.catalog.get_bucketed(self.vectors_table)
            .join(F.broadcast(batch_ids), "id", "left_semi")
            .select("id")
        )
        self.catalog.append_bucketed(
            accepted.select(
                F.col("vec_id").alias("id"),
                F.col("bvec").alias("vec"),
                F.col("bn").alias("vn"),
            ).join(have_v, "id", "left_anti"),
            self.vectors_table,
            "id",
            self.num_buckets,
        )
        return report

    def ingest_keep_best(
        self,
        batch_emb: DataFrame,
        tau: float,
        quality_col: str,
        pinned: dict[str, int | None] | None = None,
    ) -> DataFrame:
        """Quality-aware ingest against a quality-indexed corpus — the
        SEMANTIC twin of :meth:`~..dedup.NearDupIndex.ingest_keep_best`
        (the two methods share their decision semantics, report schema,
        and crash-safety argument; match predicate cos ≥ ``tau`` over
        same-cluster candidates instead of Jaccard ≥ threshold):

        1. **Intra-batch resolution**: connected components over the
           batch's same-cluster cos ≥ tau pair graph, the max-(q, -id)
           member of each cluster survives (exact bigint struct compare).
        2. **Pairwise corpus challenge**: each surviving challenger is
           admitted iff it beats EVERY live incumbent it collides with
           (one struct-max decides — beating the (q, -id)-max incumbent
           beats all), and admission tombstones exactly the incumbents
           it matched. Incumbents never fight each other — order-stable,
           unlike the batch CC form (see the NearDupIndex docstring for
           the full argument).

        Returns (id, q, outcome ∈ admitted/rejected_batch/
        rejected_corpus, kept_by, n_replaced) — one row per batch
        vector, the same contract as the lexical form.

        Crash safety: decision frames eagerly checkpointed (no writes)
        → state appends (assign → vectors → quality, each anti-joined
        against ids physically present in ITS table) → beaten-incumbent
        tombstones LAST as ONE atomic append; the challenge excludes
        challenger ids from the corpus side (intra-batch losers never
        reach the corpus, so that exclusion covers every id a crashed
        attempt could have appended), so a retry before the tombstone
        commit re-derives identical decisions. NOT wired into plain
        :meth:`ingest_stream` — same pure-function argument as the
        lexical form; the streaming form is
        :meth:`ingest_stream_keep_best`, which passes ``pinned``
        (``{table: snapshot_version|None}``) so every CORPUS-side read
        of the challenge — centroids, assign, vectors, quality, and
        the tombstone view — comes from catalog hardlink snapshots
        frozen at epoch start: decisions become a pure function of
        (batch, frozen state) across every crash point, including
        after the tombstone commit (the lexical twin's argument,
        ``NearDupIndex.ingest_keep_best``). State appends, their
        have-set probes, and ``append_tombstones`` stay on the LIVE
        tables — retry idempotence is physical. :meth:`maintain`'s
        automated retrain preserves the quality tier (:meth:`rebuild`
        re-publishes live quality)."""
        from ..cache import tracked_persist, untrack
        from .dedup import keep_best_exemplars
        from .tombstones import append_tombstones, refuse_tombstoned

        if not self.catalog.exists(self.quality_table):
            raise ValueError(
                f"index '{self.name}' has no quality table: build the "
                "corpus with quality_col=... before ingest_keep_best"
            )
        if pinned is None:
            cents = self.catalog.get(self.centroids_table)
            assign_c = None  # _neardup_check_assigned reads the live view
            vectors_c = None
            q_c = self._corpus_quality()
        else:
            if pinned.get(self.quality_table) is None:
                raise ValueError(
                    f"index '{self.name}' had no quality table at epoch "
                    "start: a keep-best epoch cannot be pinned to an "
                    "unscored corpus"
                )
            cents = self.catalog.get_version(
                self.centroids_table, pinned[self.centroids_table]
            )
            assign_c = self.catalog.get_version(
                self.assign_table, pinned[self.assign_table]
            )
            ts_v = pinned.get(self.tombstones_table)
            if ts_v is not None:
                assign_c = assign_c.join(
                    F.broadcast(
                        self.catalog.get_version(
                            self.tombstones_table, ts_v
                        ).select("id")
                    ),
                    "id",
                    "left_anti",
                )
            vectors_c = self.catalog.get_version(
                self.vectors_table, pinned[self.vectors_table]
            )
            q_c = self.catalog.get_version(
                self.quality_table, pinned[self.quality_table]
            )
        refuse_tombstoned(
            self.catalog, self.name, batch_emb.select(F.col(self.id_col))
        )
        from ..operators.dedup import require_integral_quality

        require_integral_quality(
            batch_emb, quality_col, f"IvfIndex({self.name!r}).ingest_keep_best"
        )
        qual_n = batch_emb.select(
            F.col(self.id_col).alias("id"),
            F.col(quality_col).cast("bigint").alias("q"),
        )
        bassign = tracked_persist(
            _nearest_centroid(
                _prep(
                    batch_emb, self.id_col, self.vec_col, "vec_id", "bvec",
                    "bn", spread=False,
                ),
                cents,
                id_alias="vec_id", vec_alias="bvec", n_alias="bn",
                keep=("bvec", "bn"),
            )
        )
        persisted = [bassign]
        try:
            # --- stage 1: intra-batch keep-best over the cos-pair graph
            b2 = bassign.select(
                F.col("vec_id").alias("cid"),
                "centroid_id",
                F.col("bvec").alias("nvec"),
                F.col("bn").alias("nn"),
            )
            within = (
                bassign.join(F.broadcast(b2), "centroid_id")
                .filter(F.col("cid") < F.col("vec_id"))
                .withColumn(
                    "sim",
                    F.round(
                        dot(F.col("bvec"), F.col("nvec"))
                        / (F.col("bn") * F.col("nn")),
                        6,
                    ),
                )
                .filter(F.col("sim") >= F.lit(tau))
            )
            # cc_probe="exact": batch-bounded pair graph — one job per
            # doubled CC round instead of the hash-probe cadence (r12)
            resolution = tracked_persist(
                keep_best_exemplars(
                    qual_n,
                    within.select(
                        F.col("cid").alias("id_a"),
                        F.col("vec_id").alias("id_b"),
                    ),
                    F.col("q"),
                    id_col="id",
                    cc_probe="exact",
                )
            )
            persisted.append(resolution)
            challengers = resolution.filter(F.col("kept") == 1).select(
                F.col("doc_id").alias("vec_id")
            )
            # --- stage 2: pairwise corpus challenge (live view;
            # uncollapsed — a win tombstones EVERY matched incumbent)
            # LEFT join onto quality + loud guard (ADVICE r9, shared
            # with the lexical twin): an unscored matched incumbent must
            # raise, not silently drop the pair and leave duplicates live
            matches = tracked_persist(
                self._neardup_check_assigned(
                    bassign.join(
                        F.broadcast(challengers), "vec_id", "left_semi"
                    ),
                    tau,
                    exclude_batch_ids=True,
                    collapse=False,
                    assign=assign_c,
                    vectors=vectors_c,
                ).join(
                    q_c.select(
                        F.col("id").alias("cid"), F.col("q").alias("q_inc")
                    ),
                    "cid",
                    "left",
                )
            )
            persisted.append(matches)
            best_inc = (
                matches.groupBy("vec_id")
                .agg(
                    F.max(
                        F.struct(
                            F.col("q_inc"), (-F.col("cid")).alias("neg_id")
                        )
                    ).alias("b")
                )
                .select(
                    F.col("vec_id").alias("id"),
                    F.col("b.q_inc").alias("q_best"),
                    (-F.col("b.neg_id")).alias("best_inc"),
                )
            )
            wins = F.col("q_best").isNull() | (
                (F.col("q") > F.col("q_best"))
                | (
                    (F.col("q") == F.col("q_best"))
                    & (F.col("id") < F.col("best_inc"))
                )
            )
            decided = (
                resolution.select(
                    F.col("doc_id").alias("id"),
                    F.col("score").alias("q"),
                    "kept_id",
                    "kept",
                )
                .join(best_inc, "id", "left")
                .withColumn(
                    "outcome",
                    F.when(F.col("kept") == 0, F.lit("rejected_batch"))
                    .when(wins, F.lit("admitted"))
                    .otherwise(F.lit("rejected_corpus")),
                )
                .withColumn(
                    "kept_by",
                    F.when(
                        F.col("outcome") == "rejected_batch", F.col("kept_id")
                    )
                    .when(
                        F.col("outcome") == "rejected_corpus",
                        F.col("best_inc"),
                    )
                    .otherwise(F.lit(None).cast("bigint")),
                )
            )
            beaten_pairs = (
                matches.join(
                    decided.filter(F.col("outcome") == "admitted").select(
                        F.col("id").alias("vec_id")
                    ),
                    "vec_id",
                )
                .select("vec_id", F.col("cid").alias("id"))
                .distinct()
            )
            n_repl = beaten_pairs.groupBy("vec_id").agg(
                F.count("*").cast("bigint").alias("n_replaced")
            )
            report_rows = decided.join(
                n_repl.withColumnRenamed("vec_id", "id"), "id", "left"
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
            # report, the beaten pairs, the unscored-incumbent guard
            # rows) AND the three physical have-set probes — the lexical
            # twin's fused decision pass (r12, guide §5; see
            # NearDupIndex.ingest_keep_best for the full argument: the
            # probe scans are batch-restricted corpus reads that overlap
            # as independent stages of the one job, decisions stay
            # pinned before any write, and the appends below become
            # batch-sized reads of the checkpoint).
            batch_ids = bassign.select(F.col("vec_id").alias("id")).distinct()
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
                        F.col("vec_id").alias("id_new"),
                    )
                )
                .unionByName(
                    _tagged(
                        matches.filter(F.col("q_inc").isNull())
                        .select(F.col("cid").alias("id"))
                        .distinct(),
                        "unscored",
                    )
                )
                .unionByName(
                    _tagged(
                        self.catalog.get_bucketed(self.assign_table)
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id"),
                        "have_a",
                    )
                )
                .unionByName(
                    _tagged(
                        self.catalog.get_bucketed(self.vectors_table)
                        .join(F.broadcast(batch_ids), "id", "left_semi")
                        .select("id"),
                        "have_v",
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
            admitted = report.filter(F.col("outcome") == "admitted").select(
                F.col("id").alias("vec_id")
            )
            acc = bassign.join(F.broadcast(admitted), "vec_id", "left_semi")

            def _have(tag: str) -> DataFrame:
                return F.broadcast(
                    combined.filter(F.col("tag") == tag).select("id")
                )

            self.catalog.append_bucketed(
                acc.select(F.col("vec_id").alias("id"), "centroid_id").join(
                    _have("have_a"), "id", "left_anti"
                ),
                self.assign_table,
                "centroid_id",
                self.num_buckets,
            )
            self.catalog.append_bucketed(
                acc.select(
                    F.col("vec_id").alias("id"),
                    F.col("bvec").alias("vec"),
                    F.col("bn").alias("vn"),
                ).join(_have("have_v"), "id", "left_anti"),
                self.vectors_table,
                "id",
                self.num_buckets,
            )
            self.catalog.append_bucketed(
                qual_n.join(
                    F.broadcast(admitted.select(F.col("vec_id").alias("id"))),
                    "id",
                    "left_semi",
                ).join(_have("have_q"), "id", "left_anti"),
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

    def cluster_stats(self) -> DataFrame:
        """Cluster-size skew report over the standing assignment table —
        the maintenance signal for :meth:`rebuild`. After many
        admission-gated ingests the FROZEN quantizer drifts: new data
        concentrates in a few clusters, and per-check cost
        (:meth:`neardup_check` / :meth:`search_ids`) grows with the
        probed cluster's population, not the corpus mean.

        Returns a BOUNDED frame (≤ n_centroids rows): (centroid_id,
        n_vectors, share, skew) with ``skew = n_vectors / (total /
        n_clusters)`` — skew 1.0 is perfectly balanced; a cluster at
        skew k costs k× the balanced per-probe work. Centroids with no
        assigned vectors appear with zeros (they waste a probe slot —
        also a retrain signal). One groupBy over the bucketed
        assignment table (pre-partitioned on centroid_id, no Exchange
        above the scan) + a broadcast 1-row total. Counts are LIVE
        (tombstoned vectors excluded): the report feeds rebuild/maintain
        decisions about the index users actually query. The residual
        physical cost of tombstoned rows is :meth:`vacuum`'s job."""
        assign = self._live_assign()
        cents = self.catalog.get(self.centroids_table).select("centroid_id")
        sizes = assign.groupBy("centroid_id").agg(
            F.count("*").cast("bigint").alias("n_vectors")
        )
        per_cent = cents.join(sizes, "centroid_id", "left").select(
            "centroid_id",
            F.coalesce("n_vectors", F.lit(0).cast("bigint")).alias("n_vectors"),
        )
        tot = per_cent.agg(
            F.sum("n_vectors").alias("total"),
            F.count("*").cast("bigint").alias("k"),
        )
        # Guard the divisions: on an EMPTY assignment table (built then
        # fully pruned, or a fresh catalog) total = 0 and an unguarded
        # divide would emit null/NaN for every centroid, poisoning any
        # maintenance trigger comparing `skew > k`. Empty index → all
        # shares/skews are a well-defined 0.0.
        return per_cent.crossJoin(F.broadcast(tot)).select(
            "centroid_id",
            "n_vectors",
            F.when(
                F.col("total") > 0,
                F.col("n_vectors").cast("double") / F.col("total"),
            ).otherwise(F.lit(0.0)).alias("share"),
            F.when(
                F.col("total") > 0,
                F.col("n_vectors").cast("double") * F.col("k") / F.col("total"),
            ).otherwise(F.lit(0.0)).alias("skew"),
        )

    def rebuild(self, centroids: DataFrame | None = None) -> None:
        """Retrain the quantizer over the CURRENT stored vectors and
        re-publish all three index tables — the answer to a drifted /
        skewed :meth:`cluster_stats` report. Pass a trained centroid
        frame (``kmeans_refine`` over the stored vectors is the
        standard move — its (centroid_id, cvec, cn) output is the
        drop-in contract) or omit it to reseed id-ordered.

        The stored vector set is read back through the session catalog
        and **eagerly localCheckpoint-ed before the rewrite**: build()
        overwrites the very tables the frame reads, and a lazy plan
        re-evaluated mid-overwrite would race its own destination (use
        ``checkpoint`` on a cluster for executor-loss durability).
        Reports/epochs tables are untouched — a rebuild changes the
        PHYSICAL layout (cluster membership), never admission history.

        A rebuild reads the LIVE vector set and ``build`` drops the
        tombstones after publishing, so it doubles as a :meth:`vacuum`
        with retraining: tombstoned vectors are physically gone from the
        new tables. Crash mid-rebuild leaves the tombstones in force —
        reads stay correct through any partial rewrite.
        """
        from .tombstones import live

        vectors = live(
            self.catalog, self.name, self.catalog.get_bucketed(self.vectors_table)
        )
        if self.catalog.exists(self.quality_table):
            # a quality-indexed corpus keeps its tier through rebuild
            # (maintain()'s automated retrain must not silently drop it):
            # the live (vec, q) frame rebuilds WITH quality, shedding
            # tombstoned ids' quality rows along the way
            emb = (
                vectors.join(self._corpus_quality(), "id")
                .select(
                    F.col("id").alias(self.id_col),
                    F.col("vec").alias(self.vec_col),
                    "q",
                )
                .localCheckpoint()
            )
            self.build(emb, centroids=centroids, quality_col="q")
            return
        emb = vectors.select(
            F.col("id").alias(self.id_col), F.col("vec").alias(self.vec_col)
        ).localCheckpoint()
        self.build(emb, centroids=centroids)

    def delete(self, ids) -> int:
        """Tombstone ``ids`` (list[int] or a single-column DataFrame) —
        the takedown path. O(|ids|): ONE atomic parquet append of the
        newly-deleted ids (anti-joined against the standing tombstone
        set, so a crashed-and-retried delete converges); no corpus-sized
        table is touched. Every read path (:meth:`search` /
        :meth:`search_ids` / :meth:`neardup_check` /
        :meth:`cluster_stats`) honors the tombstones from the moment the
        append commits, via a broadcast anti-join that adds no Exchange
        above the bucketed scans. Physical purging is :meth:`vacuum` /
        :meth:`rebuild`; until then a tombstoned id cannot be
        re-admitted (:meth:`ingest` refuses — see :mod:`.tombstones`).
        Returns how many ids were newly tombstoned."""
        from .tombstones import append_tombstones

        return append_tombstones(self.catalog, self.name, ids)

    def vacuum(self) -> int:
        """Physically purge tombstoned vectors: rewrite the assignment
        and vector tables without them (layout-preserving bucketed
        overwrite), then drop the tombstone table LAST. Both live frames
        are eagerly localCheckpoint-ed BEFORE the first overwrite — they
        read the very tables being rewritten (use ``checkpoint`` on a
        cluster for executor-loss durability). Crash safety is the
        drop-last ordering: every crash prefix leaves the tombstones in
        force, so reads stay correct and a retry heals. The quantizer is
        untouched (same centroids, same cluster ids) — retraining is
        :meth:`rebuild`. Returns the number of tombstoned ids purged."""
        from .tombstones import drop_tombstones, read_tombstones

        ts = read_tombstones(self.catalog, self.name)
        if ts is None:
            return 0
        n = ts.count()
        assign_live = self._live_assign().localCheckpoint()
        vectors_live = (
            self.catalog.get_bucketed(self.vectors_table)
            .join(F.broadcast(ts), "id", "left_anti")
            .localCheckpoint()
        )
        quality_live = (
            self._corpus_quality()
            .join(F.broadcast(ts), "id", "left_anti")
            .localCheckpoint()
            if self.catalog.exists(self.quality_table)
            else None
        )
        self.catalog.put_bucketed(
            assign_live, self.assign_table, "centroid_id", self.num_buckets
        )
        self.catalog.put_bucketed(
            vectors_live, self.vectors_table, "id", self.num_buckets
        )
        if quality_live is not None:
            self.catalog.put_bucketed(
                quality_live, self.quality_table, "id", self.num_buckets
            )
        drop_tombstones(self.catalog, self.name)
        return n

    def maintain(
        self,
        max_skew: float = 4.0,
        refine_iters: int = 2,
        max_tombstone_share: float = 0.2,
        max_files_per_bucket: int = 8,
    ) -> dict:
        """The closed maintenance loop — at 100 TB nobody watches a
        report table, so this ONE call reads the index's own health
        signals and triggers the standing remedies when thresholds trip.
        Run it from the ingest scheduler (e.g. every N epochs); all the
        pieces it composes existed separately (:meth:`cluster_stats`,
        :meth:`rebuild`, :meth:`vacuum`, :meth:`compact`).

        Checks, in remedy-subsumption order (one structural action per
        call — each earlier remedy leaves the later signals clean):

        1. **Quantizer drift**: max :meth:`cluster_stats` skew >
           ``max_skew`` → retrain (``kmeans_refine`` over the LIVE
           stored vectors, ``refine_iters`` Lloyd steps) and
           :meth:`rebuild`. A rebuild also purges tombstones and
           rewrites the file sets, so checks 2–3 are moot after it.
        2. **Tombstone debt**: |tombstones| > ``max_tombstone_share`` ×
           |live| → :meth:`vacuum` (every read pays the anti-join AND
           still scans the dead rows until the purge). Vacuum rewrites
           both state tables, so check 3 is moot after it.
        3. **File fragmentation**: any state table holding more than
           ``max_files_per_bucket`` × ``num_buckets`` files (≈ that many
           un-compacted ingest epochs) → :meth:`compact`.

        All signals are bounded reads: cluster_stats is ≤ n_centroids
        rows, the tombstone/live counts are single-column count jobs,
        file counts are driver-side listings. Returns a report dict
        (action taken + every signal) so schedulers can log the loop.

        Also sweeps keep-best epoch pins first (r11, the lexical twin's
        contract — :func:`~..streaming.ingest.sweep_epoch_pins`):
        crash-leaked snapshot trees and stale ``__snaps`` rows are
        collected here instead of waiting for a same-epoch replay that
        a checkpoint-dir wipe may never deliver. Advisory (never
        early-returns)."""
        from ..streaming.ingest import sweep_epoch_pins
        from .tombstones import live

        swept = sweep_epoch_pins(
            self.catalog,
            self.kb_epochs_table,
            self.snaps_table,
            self.kb_snapshot_tables,
        )
        stats = self.cluster_stats().collect()  # bounded: ≤ n_centroids
        worst = max((r.skew for r in stats), default=0.0)
        report: dict = {
            "action": "none",
            "max_skew": worst,
            "tombstone_share": 0.0,
            "max_files_per_bucket": 0.0,
            **swept,
        }
        if worst > max_skew:
            emb_live = live(
                self.catalog,
                self.name,
                self.catalog.get_bucketed(self.vectors_table),
            ).select(
                F.col("id").alias(self.id_col), F.col("vec").alias(self.vec_col)
            )
            self.rebuild(
                centroids=kmeans_refine(
                    emb_live,
                    n_centroids=self._resolved_n_centroids(),
                    iters=refine_iters,
                )
            )
            report["action"] = "rebuild"
            return report
        if self.catalog.exists(self.tombstones_table):
            n_dead = self.catalog.get(self.tombstones_table).count()
            n_live = self._live_assign().count()
            share = n_dead / n_live if n_live else float(n_dead > 0)
            report["tombstone_share"] = share
            if share > max_tombstone_share:
                self.vacuum()
                report["action"] = "vacuum"
                return report
        tables = [self.assign_table, self.vectors_table]
        if self.catalog.exists(self.quality_table):
            # quality-indexed corpora append a quality file set per
            # keep-best ingest — it fragments exactly like vectors
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
        """Compact the two append-heavy state tables back to ~one file
        per bucket (layout-preserving ``Catalog.compact_bucketed``) —
        the streaming-ingest housekeeping twin of
        :meth:`~..dedup.NearDupIndex.compact`. Centroids are k rows and
        never appended to, so they need no compaction. Returns
        {table: new_file_count}."""
        out = {
            self.assign_table: self.catalog.compact_bucketed(
                self.assign_table, "centroid_id", self.num_buckets
            ),
            self.vectors_table: self.catalog.compact_bucketed(
                self.vectors_table, "id", self.num_buckets
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
        tau: float,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ) -> None:
        """Continuous semantic-dedup ingest: drain a streaming source of
        embeddings through :meth:`ingest` one micro-batch at a time
        under the marker-last epoch-commit protocol shared with
        :meth:`~..dedup.NearDupIndex.ingest_stream` (see
        :mod:`..streaming.ingest` for the replay-safety argument; this
        index's anti-join crash healing satisfies the protocol's
        ``ingest_fn`` contract). ``maintain_every=N`` runs
        :meth:`maintain` (with ``maintain_kwargs``) after every Nth
        committed epoch — the scheduler the maintain docstring asks
        for."""
        from ..streaming.ingest import run_epoch_idempotent_ingest

        run_epoch_idempotent_ingest(
            stream_df,
            checkpoint_dir,
            self.catalog,
            self.reports_table,
            self.epochs_table,
            lambda b: self.ingest(b, tau),
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
        the ingest protocol and :meth:`maintain`'s pin sweep (the
        lexical twin's contract, ``NearDupIndex.kb_snapshot_tables``)."""
        return [
            self.centroids_table,
            self.assign_table,
            self.vectors_table,
            self.quality_table,
            self.tombstones_table,
        ]

    def ingest_stream_keep_best(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        tau: float,
        quality_col: str,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ) -> None:
        """STREAMING keep-best on the semantic index — the embedding-
        space twin of :meth:`~..dedup.NearDupIndex.ingest_stream_keep_best`
        (one protocol, both dedup-capable indexes, so the keep-best
        surface keeps full standing-index symmetry): each epoch's corpus
        challenge is pinned to hardlink snapshots of the five corpus
        tables (centroids, assign, vectors, quality, tombstones) frozen
        at first attempt and recorded in ``{name}__snaps`` BEFORE the
        ingest, so a replay at ANY crash point — including after the
        beaten-incumbent tombstones committed — re-derives the ORIGINAL
        decisions bit-exact. Reports land in ``{name}__kb_reports``,
        markers in ``{name}__kb_epochs`` (separate from plain-ingest
        state; an index is either first-seen or keep-best, enforced by
        the quality-table checks). Committed epochs release their pins
        best-effort. The centroids table is pinned too: a scheduled
        ``maintain_every`` retrain between epochs must not re-assign a
        replayed epoch's batch under NEW centroids."""
        from ..streaming.ingest import run_epoch_idempotent_ingest

        run_epoch_idempotent_ingest(
            stream_df,
            checkpoint_dir,
            self.catalog,
            self.kb_reports_table,
            self.kb_epochs_table,
            lambda batch, pinned: self.ingest_keep_best(
                batch, tau, quality_col, pinned=pinned
            ),
            maintain_fn=lambda: self.maintain(**(maintain_kwargs or {})),
            maintain_every=maintain_every,
            snapshot_tables=self.kb_snapshot_tables,
            snaps_table=self.snaps_table,
        )
