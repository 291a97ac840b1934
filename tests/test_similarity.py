"""Similarity-search tests: exactness of brute force on constructed
vectors, determinism of ranking, and LSH recall against the exact tier."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from simple_map_reduce_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    rhp_signature,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.7, 0.7, 0.0, 0.0]),   # diagonal
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact_ordering(spark):
    out = cosine_topk(_emb(spark), [0], k=4).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 4, 2, 3]
    scores = {r["neighbor_id"]: r["score"] for r in out}
    assert scores[1] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert scores[2] == 0.0 and scores[3] == -1.0


def test_neardup_pairs(spark):
    out = cosine_neardup_pairs(_emb(spark), threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in got
    assert (0, 3) not in got


def test_neardup_lsh_is_subset_of_exact(spark):
    """The LSH near-dup tier may miss pairs (recall < 1) but must never
    invent one: exact rescoring on bucket candidates ⇒ every emitted pair
    is also in the exact tier's output, with the identical score."""
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(emb, threshold=0.35, use_lsh=True).collect()
    }
    assert lsh and set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())


def test_rhp_buckets_similar_vectors_collide(spark):
    sig = {r["id"]: r["bucket"] for r in rhp_signature(_emb(spark), planes=12, dims=4).collect()}
    ham = lambda a, b: bin(sig[a] ^ sig[b]).count("1")
    # near-identical vectors agree on (almost) all planes; opposite vectors disagree on all
    assert ham(0, 1) <= 2
    assert ham(0, 3) == 12


def test_lsh_recall_against_exact(spark):
    """On the real sf0.01 embeddings: LSH top-k must recover a meaningful
    fraction of exact top-k (it's approximate — assert recall, not
    equality) and never return a non-corpus id."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    # radius 6 of 12 planes: this corpus's top neighbours are only
    # cos≈0.4 (≈66° ⇒ ~4.4 expected disagreeing planes), so a tight
    # radius would *correctly* prune them; true near-dup regimes
    # (cos ≥ 0.9 ⇒ ~1 disagreeing plane) work at radius 2.
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(emb, qids, k=5, planes=12, max_band_hamming=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_ivf_recall_against_exact(spark):
    """IVF tier: probing 8 of 16 clusters must recover most of exact
    top-k, and results must be deterministic across runs."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    run1 = cosine_topk_ivf(emb, qids, k=5, n_centroids=16, nprobe=8).collect()
    run2 = cosine_topk_ivf(emb, qids, k=5, n_centroids=16, nprobe=8).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))  # deterministic
    approx = {(r["query_id"], r["neighbor_id"]) for r in run1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_embedding_quantize_zero_vector_and_roundtrip(spark):
    """Zero vectors must quantize to all-zero with scale 0 (no NaN/Inf);
    nonzero vectors must reconstruct within half a quantization step."""
    from simple_map_reduce_spark.queries_ext import q_embedding_quantize  # noqa: F401
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.5, -1.0, 0.25, 0.125])],
        "vec_id bigint, embedding array<double>",
    )
    # run the same expressions the registered query uses, on a local frame
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)).alias("scale")
    base = emb.select("vec_id", v.alias("v"), scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0).cast("bigint")))
    rows = {r.vec_id: r for r in base.select("vec_id", "scale", q.alias("q"), "v").collect()}
    assert rows[1].scale == 0.0 and rows[1].q == [0, 0, 0, 0]
    s = rows[2].scale
    recon = [qi * s for qi in rows[2].q]
    assert all(abs(a - b) <= s / 2 + 1e-12 for a, b in zip(recon, rows[2].v))
    assert max(abs(x) for x in rows[2].q) == 127  # the max element pins the scale


def _clustered_emb(spark):
    """Two tight clusters around e0 and e1 plus their seeds."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.95, 0.05, 0.0, 0.0]),
        (3, [0.9, 0.02, 0.0, 0.0]),
        (4, [0.05, 0.95, 0.0, 0.0]),
        (5, [0.02, 0.9, 0.0, 0.0]),
        (6, [0.97, 0.01, 0.0, 0.0]),
        (7, [0.01, 0.97, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_refine_moves_centroids_to_cluster_means(spark):
    from simple_map_reduce_spark.operators.similarity import kmeans_refine

    cents = kmeans_refine(_clustered_emb(spark), n_centroids=2, iters=2).collect()
    assert len(cents) == 2
    by_id = {r["centroid_id"]: r["cvec"] for r in cents}
    # centroid 0 ends near the x-axis cluster mean, centroid 1 near y's
    assert by_id[0][0] > 0.8 * by_id[0][1] and by_id[0][0] > 0.5
    assert by_id[1][1] > 0.8 * by_id[1][0] and by_id[1][1] > 0.5
    for r in cents:
        assert r["cn"] == pytest.approx(
            math.sqrt(sum(x * x for x in r["cvec"])), rel=1e-9
        )


def test_kmeans_refine_is_deterministic_under_repartition(spark):
    """Decimal-exact component sums make the refined centroids
    bit-identical at any parallelism."""
    from simple_map_reduce_spark.operators.similarity import kmeans_refine

    emb = _clustered_emb(spark)
    a = sorted(map(tuple, kmeans_refine(emb, 2, iters=3).collect()))
    b = sorted(map(tuple, kmeans_refine(emb.repartition(5), 2, iters=3).collect()))
    assert a == b


def test_kmeans_refine_empty_cluster_keeps_previous_centroid(spark):
    """A seed that attracts no vectors must survive unchanged, keeping
    the centroid count stable."""
    from simple_map_reduce_spark.operators.similarity import kmeans_refine

    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.0]),   # seed 1: everything else is closer to seed 0
        (2, [1.0, 0.01]),
        (3, [0.99, 0.0]),
        (4, [1.0, -0.01]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = {r["centroid_id"]: r["cvec"] for r in
             kmeans_refine(emb, 2, iters=2).collect()}
    assert len(cents) == 2
    assert cents[1] == [-1.0, 0.0]


def test_kmeans_refine_improves_ivf_assignment_quality(spark):
    """On the real embeddings table, refined centroids must not reduce
    the mean best-assignment cosine vs the id-ordered seeds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from simple_map_reduce_spark.operators.similarity import (
        _prep, dot, ivf_assign, kmeans_refine,
    )
    from simple_map_reduce_spark.sources.readers import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").limit(300)

    def mean_best_sim(cents):
        corpus = _prep(emb, "vec_id", "embedding", "id", "vec", "vn")
        w = Window.partitionBy("id").orderBy(
            F.col("sim").desc(), F.col("centroid_id")
        )
        best = (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn(
                "sim",
                dot(F.col("vec"), F.col("cvec")) / (F.col("vn") * F.col("cn")),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        return best.agg(F.avg("sim")).collect()[0][0]

    seeds, _ = ivf_assign(emb, 8)
    refined = kmeans_refine(emb, 8, iters=2)
    assert mean_best_sim(refined) >= mean_best_sim(seeds) - 1e-9


def _labelled_emb(spark):
    """Two tight label clusters plus one mislabelled vector (id 6 carries
    label 1 but sits in label 0's cluster)."""
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.97, 0.02, 0.0], 0),
        (2, [0.95, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.02, 0.97, 0.0], 1),
        (5, [0.01, 0.95, 0.0], 1),
        (6, [0.99, 0.03, 0.0], 1),  # mislabelled
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_nearest_centroid_confusion_flags_mislabelled_vector(spark):
    from simple_map_reduce_spark.operators.similarity import (
        nearest_centroid_confusion,
    )

    out = {
        (r["label"], r["assigned_label"]): r["n_vecs"]
        for r in nearest_centroid_confusion(_labelled_emb(spark)).collect()
    }
    # label 0 is pure; label 1 loses exactly the mislabelled vector to 0
    assert out[(0, 0)] == 3
    assert out[(1, 1)] == 3
    assert out[(1, 0)] == 1
    assert (0, 1) not in out


def test_label_centroids_deterministic_under_repartition(spark):
    """Integer-quantized component sums make the per-label centroids
    bit-identical at any parallelism."""
    from simple_map_reduce_spark.operators.similarity import label_centroids

    emb = _labelled_emb(spark)
    a = sorted(map(tuple, label_centroids(emb).collect()))
    b = sorted(map(tuple, label_centroids(emb.repartition(5)).collect()))
    assert a == b


def test_refined_ivf_recall_against_exact(spark):
    """Trained-quantizer IVF (kmeans_refine centroids): same recall gate
    as the seed-centroid tier, plus determinism across runs — the
    refinement must not cost search quality."""
    from simple_map_reduce_spark.operators.similarity import kmeans_refine

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    cents = kmeans_refine(emb, n_centroids=16, iters=2)
    run1 = cosine_topk_ivf(emb, qids, k=5, nprobe=8, centroids=cents).collect()
    run2 = cosine_topk_ivf(emb, qids, k=5, nprobe=8, centroids=cents).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))
    approx = {(r["query_id"], r["neighbor_id"]) for r in run1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"refined-IVF recall too low: {recall}"


def test_ivf_index_matches_recompute_form(spark, tmp_path):
    """The catalog-backed IVF search must return exactly what the
    recompute-everything form returns with the same quantizer."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import (
        IvfIndex,
        cosine_topk_ivf,
    )
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cat = Catalog(spark, str(tmp_path / "ivfwh"))
    idx = IvfIndex(cat, "ivf_t", n_centroids=8, nprobe=3)
    idx.build(emb)
    got = sorted(map(tuple, idx.search_ids([0, 1, 2], k=4).collect()))
    want = sorted(
        map(
            tuple,
            cosine_topk_ivf(emb, [0, 1, 2], k=4, n_centroids=8, nprobe=3).collect(),
        )
    )
    assert got == want and got


def test_ivf_index_search_corpus_side_no_exchange(spark, tmp_path):
    """The stored-index guarantee: assignments (bucketed on centroid_id)
    and vectors (bucketed on id) are consumed with no Exchange between
    their scans and the joins — only the query/probe/candidate side
    shuffles. Broadcast disabled to pin the sort-merge path."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE
    from tests.test_dedup import _scan_ancestries

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cat = Catalog(spark, str(tmp_path / "ivfwh2"))
    idx = IvfIndex(cat, "ivf_p", n_centroids=8, nprobe=3)
    idx.build(emb)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            idx.search_ids([0, 1, 2], k=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the queries-side read of __vectors is a tiny isin() filter scan —
    # only the CORPUS-side consumers must be exchange-free, so check the
    # assignment table (always corpus-sized) strictly, and require at
    # least one bucketed, exchange-free __vectors scan (the rescore side)
    chains = _scan_ancestries(plan, "__assign")
    assert chains
    scans = [l for l in plan.splitlines() if "FileScan" in l and "__assign" in l]
    assert all("Bucketed: true" in l for l in scans), scans
    for chain in chains:
        joined = next(
            (k for k, l in enumerate(chain)
             if "SortMergeJoin" in l or "HashAggregate" in l),
            len(chain),
        )
        shuffled = next((k for k, l in enumerate(chain) if "Exchange" in l), len(chain))
        assert joined < shuffled, "\n".join(chain[: shuffled + 1])
    vec_scans = [l for l in plan.splitlines() if "FileScan" in l and "__vectors" in l]
    assert any("Bucketed: true" in l for l in vec_scans), vec_scans


def test_semdedup_prunes_within_clusters_to_min_id_exemplar(spark):
    """Two tight clusters: every member except the smallest id in each is
    pruned against that exemplar; no cross-cluster pair is ever emitted."""
    from simple_map_reduce_spark.operators.similarity import semdedup_prune

    out = semdedup_prune(
        _clustered_emb(spark), n_centroids=2, iters=2, tau=0.9
    ).collect()
    pruned = {r.vec_id: r.kept_id for r in out}
    # x-axis cluster {0,2,3,6} keeps 0; y-axis cluster {1,4,5,7} keeps 1
    assert pruned == {2: 0, 3: 0, 6: 0, 4: 1, 5: 1, 7: 1}
    for r in out:
        assert 0.9 <= r.sim <= 1.0


def test_semdedup_empty_above_max_cosine(spark):
    from simple_map_reduce_spark.operators.similarity import semdedup_prune

    assert (
        semdedup_prune(_clustered_emb(spark), n_centroids=2, iters=1, tau=1.01).count()
        == 0
    )


def test_semdedup_deterministic_under_repartition(spark):
    from simple_map_reduce_spark.operators.similarity import semdedup_prune

    emb = _clustered_emb(spark)
    a = sorted(map(tuple, semdedup_prune(emb, 2, 2, 0.9).collect()))
    b = sorted(map(tuple, semdedup_prune(emb.repartition(5), 2, 2, 0.9).collect()))
    assert a == b and len(a) == 6


def test_ivf_index_neardup_check_semantics(spark, tmp_path):
    """Semantic incremental check against the standing index: batch
    vectors match ONLY same-cluster corpus members at cos ≥ tau, with
    the min-id corpus exemplar — and never match across clusters."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    corpus = _clustered_emb(spark)  # ids 0..7, two tight clusters
    batch = spark.createDataFrame(
        [
            (100, [0.96, 0.03, 0.0, 0.0]),  # x-cluster near-dup
            (101, [0.03, 0.96, 0.0, 0.0]),  # y-cluster near-dup
            (102, [0.0, 0.0, 1.0, 0.0]),    # orthogonal — matches nothing
        ],
        ["vec_id", "embedding"],
    )
    cat = Catalog(spark, str(tmp_path / "ndwh"))
    idx = IvfIndex(cat, "nd_t", n_centroids=2)
    idx.build(corpus)
    out = {r.vec_id: (r.kept_id, r.sim) for r in idx.neardup_check(batch, 0.9).collect()}
    assert set(out) == {100, 101}
    # min-id exemplar within the matched cluster: x-cluster {0,2,3,6} → 0,
    # y-cluster {1,4,5,7} → 1
    assert out[100][0] == 0 and out[101][0] == 1
    assert out[100][1] >= 0.9 and out[101][1] >= 0.9
    # impossible threshold → empty
    assert idx.neardup_check(batch, 1.01).count() == 0


def test_ivf_index_neardup_check_corpus_side_no_exchange(spark, tmp_path):
    """The stored-index guarantee extends to neardup_check: the batch
    side broadcasts into the bucketed posting/vector scans — no Exchange
    above any corpus-sized scan."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex
    from simple_map_reduce_spark.sources.readers import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE
    from tests.test_dedup import _scan_ancestries

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cat = Catalog(spark, str(tmp_path / "ndwh2"))
    idx = IvfIndex(cat, "nd_p", n_centroids=8)
    idx.build(emb)
    batch = emb.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    # disable auto-broadcast while PLANNING: at toy scale the planner
    # would broadcast the (small) corpus tables themselves, which hides
    # the bucketed layout this test pins; the explicit F.broadcast hint
    # on the batch side survives the conf (same idiom as the search test)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            idx.neardup_check(batch, 0.3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for token in ("__assign", "__vectors"):
        chains = _scan_ancestries(plan, token)
        assert chains, f"no {token} scan in plan"
        scans = [l for l in plan.splitlines() if "FileScan" in l and token in l]
        assert all("Bucketed: true" in l for l in scans), scans
        for chain in chains:
            joined = next(
                (k for k, l in enumerate(chain)
                 if "Join" in l or "HashAggregate" in l),
                len(chain),
            )
            shuffled = next(
                (k for k, l in enumerate(chain) if "Exchange" in l), len(chain)
            )
            assert joined < shuffled, "\n".join(chain[: shuffled + 1])


def test_ivf_index_ingest_gates_and_appends(spark, tmp_path):
    """Batch ingest under the semantic gate: corpus near-dups and
    intra-batch near-dups (min id survives) are rejected; accepted
    vectors land in BOTH index tables; re-ingesting the same batch is
    a no-op (anti-join crash healing)."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / "ingwh"))
    idx = IvfIndex(cat, "ing_t", n_centroids=2)
    idx.build(_clustered_emb(spark))  # ids 0..7, x/y clusters
    batch = spark.createDataFrame(
        [
            (100, [0.96, 0.03, 0.0, 0.0]),  # corpus near-dup (x cluster)
            (101, [0.0, 0.0, 1.0, 0.0]),    # novel direction — accepted
            (102, [0.0, 0.0, 0.98, 0.01]),  # intra-batch dup of 101
        ],
        ["vec_id", "embedding"],
    )
    report = idx.ingest(batch, tau=0.9).collect()
    got = {(r.vec_id, r.kept_id, r.matched_in) for r in report}
    assert (100, 0, "corpus") in got       # min-id corpus exemplar
    assert (102, 101, "batch") in got      # smaller batch id survives
    assert not any(r.vec_id == 101 for r in report)

    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == {0, 1, 2, 3, 4, 5, 6, 7, 101}
    assigned = {r.id for r in cat.get_bucketed(idx.assign_table).select("id").collect()}
    assert assigned == stored

    # idempotency: the same batch again — 101 now matches ITSELF in the
    # corpus; nothing appends twice
    idx.ingest(batch, tau=0.9)
    again = cat.get_bucketed(idx.vectors_table).groupBy("id").count()
    assert again.filter("count > 1").count() == 0


def test_ivf_index_ingest_stream_matches_batch_mode(spark, tmp_path):
    """foreachBatch streaming ingest leaves the index in the same state
    sequential batch ingests would, under the shared marker-last
    epoch-commit protocol."""
    import shutil

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    src = tmp_path / "emb-stream"
    src.mkdir()
    batches = [
        ("a.parquet", [(100, [0.96, 0.03, 0.0, 0.0]),   # corpus dup
                       (101, [0.0, 0.0, 1.0, 0.0])]),   # novel
        ("b.parquet", [(200, [0.0, 0.0, 0.0, 1.0]),     # novel
                       (201, [0.01, 0.97, 0.0, 0.0])]), # corpus dup
        # CROSS-EPOCH: near-dup of 101, which was ADMITTED in epoch 0 —
        # catches the cloned-session relation-cache staleness (an epoch
        # must see earlier epochs' appends through the catalog session)
        ("c.parquet", [(300, [0.01, 0.0, 0.99, 0.0])]),
    ]
    for fname, rows in batches:
        out = tmp_path / f"stage-{fname}"
        spark.createDataFrame(rows, ["vec_id", "embedding"]).coalesce(
            1
        ).write.parquet(str(out))
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / fname))

    cat = Catalog(spark, str(tmp_path / "strwh"))
    idx = IvfIndex(cat, "str_t", n_centroids=2)
    idx.build(_clustered_emb(spark))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx.ingest_stream(stream, str(tmp_path / "ckpt"), tau=0.9)

    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == {0, 1, 2, 3, 4, 5, 6, 7, 101, 200}
    reports = cat.get(idx.reports_table).collect()
    got = {(r.vec_id, r.matched_in) for r in reports}
    assert (100, "corpus") in got and (201, "corpus") in got
    by_id = {r.vec_id: r for r in reports}
    assert by_id[300].matched_in == "corpus" and by_id[300].kept_id == 101
    assert {r.epoch_id for r in reports} == {0, 1, 2}


def test_ivf_index_compact_preserves_search(spark, tmp_path):
    import os

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / "cmpwh"))
    idx = IvfIndex(cat, "cmp_t", n_centroids=2, num_buckets=2)
    idx.build(_clustered_emb(spark))
    for i, (vid, vec) in enumerate(
        ((101, [0.0, 0.0, 1.0, 0.0]), (200, [0.0, 0.0, 0.0, 1.0]),
         (201, [0.0, 1.0, 1.0, 0.0]), (202, [1.0, 0.0, 0.0, 1.0]))
    ):
        idx.ingest(
            spark.createDataFrame([(vid, vec)], ["vec_id", "embedding"]), tau=0.999
        )
    before = sorted(map(tuple, idx.search_ids([0, 1], k=3).collect()))
    files_before = sum(
        1 for f in os.listdir(tmp_path / "cmpwh" / idx.vectors_table)
        if f.endswith(".parquet")
    )
    counts = idx.compact()
    assert counts[idx.vectors_table] < files_before
    assert sorted(map(tuple, idx.search_ids([0, 1], k=3).collect())) == before


def test_ivf_index_ingest_empty_batch_is_noop(spark, tmp_path):
    """A stream legitimately delivers empty micro-batches; ingest must
    return an empty report and append nothing (not crash on the eager
    checkpoint or the anti-joins)."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / "ewh"))
    idx = IvfIndex(cat, "e_t", n_centroids=2)
    idx.build(_clustered_emb(spark))
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert idx.ingest(empty, tau=0.9).count() == 0
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == set(range(8))


def test_ivf_ingest_rerun_reproduces_original_report(spark, tmp_path):
    """Streaming protocol point 4 (ADVICE r6): a crash between the state
    appends and the report append replays the WHOLE ingest with the
    batch's accepted ids already in the index tables. The re-run must
    re-derive the original report — same rows, same matched_in classes —
    not re-class intra-batch matches as corpus matches (the corpus-
    candidate funnel excludes ids present in the batch)."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / "rrwh"))
    idx = IvfIndex(cat, "rr_t", n_centroids=2)
    idx.build(_clustered_emb(spark))
    batch = spark.createDataFrame(
        [
            (100, [0.96, 0.03, 0.0, 0.0]),  # corpus near-dup
            (101, [0.0, 0.0, 1.0, 0.0]),    # novel — accepted
            (102, [0.0, 0.0, 0.98, 0.01]),  # intra-batch dup of 101
        ],
        ["vec_id", "embedding"],
    )
    first = sorted(map(tuple, idx.ingest(batch, tau=0.9).collect()))
    # crash-replay: state now ALREADY contains 101; a re-run must still
    # classify 102 as matched_in='batch' (kept_id 101), and must not
    # emit extra corpus-match rows for the replayed ids
    second = sorted(map(tuple, idx.ingest(batch, tau=0.9).collect()))
    assert second == first
    # and the state stayed converged (no duplicate appends)
    dup = (
        cat.get_bucketed(idx.vectors_table).groupBy("id").count()
        .filter("count > 1").count()
    )
    assert dup == 0


def test_ivf_cluster_stats_and_rebuild_rebalances(spark, tmp_path):
    """Index maintenance loop: seed a quantizer that leaves one cluster
    holding nearly everything, read the skew off cluster_stats, retrain
    with kmeans_refine via rebuild(), and verify (a) max skew drops,
    (b) empty centroids appear with zeros pre-rebuild, (c) search over
    the well-separated clusters returns identical results pre/post
    (the quantizer changes the PHYSICAL layout, not these answers)."""
    from pyspark.sql import functions as SF

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.similarity import (
        IvfIndex,
        kmeans_refine,
    )

    # ids 0,1 are near-identical x-axis seeds -> both seed centroids sit
    # in the x cluster and every y vector piles onto one of them
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.98, 0.02, 0.0, 0.0]),
        (3, [0.97, 0.01, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.01, 0.99, 0.0, 0.0]),
        (6, [0.02, 0.98, 0.0, 0.0]),
        (7, [0.0, 0.97, 0.01, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cat = Catalog(spark, str(tmp_path / "mwh"))
    idx = IvfIndex(cat, "m_t", n_centroids=2, nprobe=2)
    idx.build(emb)
    stats = {r.centroid_id: r for r in idx.cluster_stats().collect()}
    assert sum(r.n_vectors for r in stats.values()) == 8
    skew_before = max(r.skew for r in stats.values())
    assert skew_before > 1.4  # the y cluster piled onto one centroid
    before = sorted(map(tuple, idx.search_ids([0, 4], k=2).collect()))

    idx.rebuild(
        centroids=kmeans_refine(
            cat.get_bucketed(idx.vectors_table).select(
                SF.col("id").alias("vec_id"), SF.col("vec").alias("embedding")
            ),
            n_centroids=2,
            iters=2,
        )
    )
    stats2 = {r.centroid_id: r for r in idx.cluster_stats().collect()}
    assert sum(r.n_vectors for r in stats2.values()) == 8
    assert max(r.skew for r in stats2.values()) < skew_before
    # balanced 4/4 split across the two refined centroids
    assert sorted(r.n_vectors for r in stats2.values()) == [4, 4]
    after = sorted(map(tuple, idx.search_ids([0, 4], k=2).collect()))
    assert after == before


def test_semdedup_default_is_capacity_sized(spark):
    """r11: ``n_centroids=None`` (now the default) resolves ivf_capacity's
    sqrt(N) rule — the registered rows run the sizing that completed the
    100x check the fixed-K form DNF'd. Equivalence is exact: the default
    call must equal an explicit sqrt(N) call bit-for-bit, on both the
    min-id and keep-best forms."""
    from simple_map_reduce_spark.operators.similarity import (
        ivf_capacity,
        semdedup_keep_best,
        semdedup_prune,
    )

    emb = _clustered_emb(spark)
    k, _ = ivf_capacity(emb.count())
    assert k == 3  # sqrt(8) rounds to 3 — the default must use exactly this
    auto = sorted(map(tuple, semdedup_prune(emb, tau=0.9).collect()))
    fixed = sorted(
        map(tuple, semdedup_prune(emb, n_centroids=k, tau=0.9).collect())
    )
    assert auto == fixed and len(auto) > 0
    qual = spark.createDataFrame(
        [(i, (7 - i) * 10) for i in range(8)], ["vec_id", "q"]
    )
    auto_kb = sorted(map(tuple, semdedup_keep_best(emb, qual, tau=0.9).collect()))
    fixed_kb = sorted(
        map(tuple, semdedup_keep_best(emb, qual, n_centroids=k, tau=0.9).collect())
    )
    assert auto_kb == fixed_kb and len(auto_kb) > 0


def test_mmr_rerank_matches_python_reference(spark):
    """r11: the unrolled-greedy MMR must equal a plain-Python greedy
    reference bit-for-bit on random vectors — selection order, ids,
    and raw mmr doubles (rounded-6 sims, (mmr, -id) argmax)."""
    import math
    import random

    from simple_map_reduce_spark.operators.similarity import mmr_rerank

    random.seed(17)
    rows = [(i, [random.uniform(-1, 1) for _ in range(6)]) for i in range(24)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qids, k, pool, lam = [0, 3], 4, 8, 0.7
    got = {
        (r.query_id, r.neighbor_id): (r.mmr, r.mmr_rank)
        for r in mmr_rerank(emb, qids, k=k, pool=pool, lam=lam).collect()
    }
    vecs = dict(rows)

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return round(d / (na * nb), 6)

    want = {}
    for qid in qids:
        cand = sorted(
            ((cos(qid, n), -n) for n in vecs if n != qid), reverse=True
        )[:pool]
        cand = [(-neg, s) for s, neg in cand]
        sel = []
        for rank in range(1, k + 1):
            best = None
            for n, qs in cand:
                if any(n == sn for sn, _ in sel):
                    continue
                pens = [cos(n, sn) for sn, _ in sel]
                mmr = lam * qs - (1 - lam) * max(pens) if pens else lam * qs
                if best is None or (mmr, -n) > (best[1], -best[0]):
                    best = (n, mmr)
            sel.append(best)
            want[(qid, best[0])] = (best[1], rank)
    assert got == want


def test_mmr_rerank_lam_one_is_plain_topk_and_deterministic(spark):
    """lam=1 removes the diversity penalty: selection must reproduce the
    plain cosine top-k order exactly; and the whole operator is
    partitioning-invariant."""
    from simple_map_reduce_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    emb = _clustered_emb(spark)
    topk = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, [0, 1], k=3).collect()
    }
    sel = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in mmr_rerank(emb, [0, 1], k=3, pool=5, lam=1.0).collect()
    }
    assert sel == topk
    a = sorted(map(tuple, mmr_rerank(emb, [0, 1], k=3, pool=5).collect()))
    b = sorted(
        map(tuple, mmr_rerank(emb.repartition(7), [0, 1], k=3, pool=5).collect())
    )
    assert a == b and len(a) == 6


def test_mmr_rerank_diversifies_clustered_pool(spark):
    """The point of MMR: with a pool full of one cluster's near-dups
    plus one off-cluster doc, low lam must pull the off-cluster doc
    forward past same-cluster twins that out-score it on relevance."""
    from simple_map_reduce_spark.operators.similarity import mmr_rerank

    emb = _clustered_emb(spark)  # x-cluster {0,2,3,6}, y-cluster {1,4,5,7}
    out = sorted(
        (r.mmr_rank, r.neighbor_id)
        for r in mmr_rerank(emb, [0], k=3, pool=7, lam=0.3).collect()
    )
    picked = [n for _, n in out]
    # rank 1 is the most-relevant x twin; rank 2 must jump to the
    # y-cluster (every remaining x twin pays ~cos=1 penalty)
    assert picked[0] in {2, 3, 6}
    assert picked[1] in {1, 4, 5, 7}
