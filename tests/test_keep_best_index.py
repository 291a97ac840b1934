"""NearDupIndex.ingest_keep_best (the standing-index form of
keep_best_exemplars): quality-aware exemplar replacement — intra-batch
CC resolution, the PAIRWISE corpus challenge, tombstone-backed
replacement, crash-prefix retry convergence, and the quality-table
lifecycle (build/vacuum/refusals)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_spark.catalog import Catalog
from simple_map_reduce_spark.operators.dedup import NearDupIndex
from simple_map_reduce_spark.operators.tombstones import live, read_tombstones

SCHEMA = "doc_id bigint, text string, q bigint"


def _mk(spark, tmp_path, sub, corpus_rows, threshold=0.3, bands=4, num_hashes=12):
    cat = Catalog(spark, str(tmp_path / sub))
    idx = NearDupIndex(
        cat, f"kb_{sub}", threshold=threshold, bands=bands, num_hashes=num_hashes
    )
    idx.build(spark.createDataFrame(corpus_rows, SCHEMA), quality_col="q")
    return cat, idx


CORPUS = [
    (1, "alpha beta gamma delta epsilon", 5),
    (2, "one two three four five six", 9),
]
BATCH = [
    # better copy of doc 1's text -> replaces it
    (10, "alpha beta gamma delta epsilon zeta eta theta", 8),
    # intra-batch dup of 10, worse -> rejected_batch
    (11, "alpha beta gamma delta epsilon zeta", 3),
    # near-dup of doc 2 but worse -> rejected_corpus
    (12, "one two three four five", 4),
    # novel -> admitted, no replacement
    (13, "completely different content here now", 1),
]


def test_four_outcomes_and_replacement(spark, tmp_path):
    """One batch exercising every decision class: replacement (beats the
    incumbent -> incumbent tombstoned), intra-batch rejection (cluster
    keep-best), corpus rejection (loses to a live incumbent), and a
    plain admission."""
    cat, idx = _mk(spark, tmp_path, "four", CORPUS)
    batch = spark.createDataFrame(BATCH, SCHEMA)
    rep = {r.id: (r.q, r.outcome, r.kept_by, r.n_replaced)
           for r in idx.ingest_keep_best(batch, "q").collect()}
    assert rep == {
        10: (8, "admitted", None, 1),
        11: (3, "rejected_batch", 10, 0),
        12: (4, "rejected_corpus", 2, 0),
        13: (1, "admitted", None, 0),
    }
    ts = read_tombstones(cat, idx.name)
    assert sorted(r.id for r in ts.collect()) == [1]
    lv = live(cat, idx.name, cat.get_bucketed(idx.quality_table))
    assert sorted((r.id, r.q) for r in lv.collect()) == [(2, 9), (10, 8), (13, 1)]
    # the replaced incumbent no longer matches anything; its replacement does
    probe = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta eta", 1)], SCHEMA
    )
    got = {(r.id_new, r.id_corpus) for r in idx.check(probe).collect()}
    assert (99, 10) in got and all(c != 1 for _, c in got)


def test_pairwise_challenge_is_order_stable(spark, tmp_path):
    """THE semantic pin vs the batch CC form: a challenger that LOSES to
    one incumbent must not retroactively delete the weaker incumbents it
    also matched. Corpus: C1 (weak) and C2 (strong), mutually non-dup;
    challenger N matches both, beats C1, loses to C2 -> N rejected,
    BOTH incumbents stay (the batch form would collapse the cluster to
    C2 alone)."""
    corpus = [
        # disjoint shingle sets: mutually non-dup by construction
        (1, "gamma iota green beta zeta blue", 4),
        (2, "epsilon xi psi nu chi rho", 9),
    ]
    # 48 bands of 1 row: the candidate stage is maximally permissive
    # (the verify still enforces true jaccard >= threshold). Under the
    # r9 avalanche minhash family both J=0.4 pairs agree on ~J*48
    # bands as theory predicts; under the old single-round affine
    # family this exact fixture produced 0/48 agreements on one pair
    # (the min-wise-independence defect that motivated the migration)
    cat, idx = _mk(
        spark, tmp_path, "pair", corpus, threshold=0.3, bands=48, num_hashes=48
    )
    # sanity: the two incumbents were admitted as mutually non-dup
    n = spark.createDataFrame(
        [(10, "gamma iota green beta zeta blue epsilon xi psi nu chi rho", 6)],
        SCHEMA,
    )
    pairs = idx.check(n)
    matched = sorted(r.id_corpus for r in pairs.collect())
    assert matched == [1, 2], "fixture must collide with both incumbents"
    rep = idx.ingest_keep_best(n, "q").collect()
    assert [(r.id, r.outcome, r.kept_by) for r in rep] == [
        (10, "rejected_corpus", 2)
    ]
    assert read_tombstones(cat, idx.name) is None  # C1 untouched
    lv = live(cat, idx.name, cat.get_bucketed(idx.quality_table))
    assert sorted((r.id, r.q) for r in lv.collect()) == [(1, 4), (2, 9)]


def test_quality_tie_breaks_to_min_id(spark, tmp_path):
    """Equal quality: the incumbent (smaller id) wins — the min-id
    convention is the score-constant special case, exactly as in
    keep_best_exemplars."""
    cat, idx = _mk(
        spark, tmp_path, "tie",
        [(1, "alpha beta gamma delta epsilon", 5)], bands=12,
    )
    n = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta", 5)], SCHEMA
    )
    rep = idx.ingest_keep_best(n, "q").collect()
    assert [(r.id, r.outcome, r.kept_by) for r in rep] == [
        (10, "rejected_corpus", 1)
    ]
    assert read_tombstones(cat, idx.name) is None


def test_crash_prefix_retry_converges(spark, tmp_path):
    """Crash window: the state appends landed but the final tombstone
    append did not. The retry must re-derive the IDENTICAL decisions
    (all incumbents still live; batch ids excluded from the corpus
    side) without duplicating any state row, then land the tombstones."""
    cat, idx = _mk(spark, tmp_path, "crash", CORPUS)
    batch = spark.createDataFrame(BATCH, SCHEMA)

    # emulate the crash: run the real method but intercept the final
    # tombstone append to a no-op
    import simple_map_reduce_spark.operators.dedup as dmod
    from simple_map_reduce_spark.operators import tombstones as tmod

    real_append = tmod.append_tombstones
    calls = []

    def crashing_append(catalog, name, ids):
        calls.append(ids.count())
        return 0  # the crash: append never commits

    dmod_tomb = sys.modules["simple_map_reduce_spark.operators.tombstones"]
    dmod_tomb.append_tombstones = crashing_append
    try:
        rep1 = sorted(map(tuple, idx.ingest_keep_best(batch, "q").collect()))
    finally:
        dmod_tomb.append_tombstones = real_append
    assert calls == [1]  # the beaten incumbent reached the append
    assert read_tombstones(cat, idx.name) is None  # ...but never committed
    # mid-crash: conservative window — incumbent AND replacement both live
    both = live(cat, idx.name, cat.get_bucketed(idx.quality_table))
    assert sorted(r.id for r in both.collect()) == [1, 2, 10, 13]

    rep2 = sorted(map(tuple, idx.ingest_keep_best(batch, "q").collect()))
    assert rep2 == rep1  # identical decisions on retry
    assert sorted(
        r.id for r in read_tombstones(cat, idx.name).collect()
    ) == [1]
    # no duplicated state rows: one size row and one quality row per doc
    for t in (idx.sizes_table, idx.quality_table):
        per = (
            cat.get_bucketed(t)
            .groupBy("id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert per == 0, t


SEM_SCHEMA = "vec_id bigint, embedding array<double>, q bigint"
SEM_CORPUS = [
    (1, [1.0, 0.0, 0.0, 0.1], 5),
    (2, [0.0, 1.0, 0.0, 0.1], 9),
]
SEM_BATCH = [
    (10, [1.0, 0.05, 0.0, 0.1], 8),   # better copy of 1 -> replaces it
    (11, [1.0, 0.02, 0.0, 0.12], 3),  # intra-batch dup of 10 -> rejected
    (12, [0.05, 1.0, 0.0, 0.1], 4),   # worse than 2 -> rejected_corpus
    (13, [0.0, 0.0, 1.0, 0.0], 1),    # novel -> admitted
]


def _mk_sem(spark, tmp_path, sub):
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / sub))
    idx = IvfIndex(cat, f"skb_{sub}", n_centroids=2)
    idx.build(spark.createDataFrame(SEM_CORPUS, SEM_SCHEMA), quality_col="q")
    return cat, idx


def test_semantic_four_outcomes_and_replacement(spark, tmp_path):
    """IvfIndex.ingest_keep_best — the semantic twin: same decision
    semantics, same report contract, cosine >= tau instead of Jaccard."""
    cat, idx = _mk_sem(spark, tmp_path, "four")
    batch = spark.createDataFrame(SEM_BATCH, SEM_SCHEMA)
    rep = {r.id: (r.q, r.outcome, r.kept_by, r.n_replaced)
           for r in idx.ingest_keep_best(batch, 0.9, "q").collect()}
    assert rep == {
        10: (8, "admitted", None, 1),
        11: (3, "rejected_batch", 10, 0),
        12: (4, "rejected_corpus", 2, 0),
        13: (1, "admitted", None, 0),
    }
    assert sorted(
        r.id for r in read_tombstones(cat, idx.name).collect()
    ) == [1]
    lv = live(cat, idx.name, cat.get_bucketed(idx.quality_table))
    assert sorted((r.id, r.q) for r in lv.collect()) == [(2, 9), (10, 8), (13, 1)]
    with pytest.raises(ValueError, match="quality-indexed"):
        idx.ingest(batch, 0.9)


def test_semantic_crash_prefix_retry_converges(spark, tmp_path):
    """Same crash window as the lexical form: state appends landed, the
    final tombstone append did not — the retry re-derives identical
    decisions and lands the tombstones without duplicating state."""
    cat, idx = _mk_sem(spark, tmp_path, "crash")
    batch = spark.createDataFrame(SEM_BATCH, SEM_SCHEMA)
    tmod = sys.modules["simple_map_reduce_spark.operators.tombstones"]
    real_append = tmod.append_tombstones
    tmod.append_tombstones = lambda catalog, name, ids: 0
    try:
        rep1 = sorted(map(tuple, idx.ingest_keep_best(batch, 0.9, "q").collect()))
    finally:
        tmod.append_tombstones = real_append
    assert read_tombstones(cat, idx.name) is None
    rep2 = sorted(map(tuple, idx.ingest_keep_best(batch, 0.9, "q").collect()))
    assert rep2 == rep1
    assert sorted(
        r.id for r in read_tombstones(cat, idx.name).collect()
    ) == [1]
    for t in (idx.assign_table, idx.vectors_table, idx.quality_table):
        dups = (
            cat.get_bucketed(t).groupBy("id").count()
            .filter(F.col("count") > 1).count()
        )
        assert dups == 0, t


def test_semantic_quality_lifecycle_rebuild_preserves_tier(spark, tmp_path):
    """vacuum purges quality rows; rebuild (maintain's automated
    retrain) PRESERVES the quality tier while shedding tombstoned ids;
    compact covers the fourth table; build without quality drops it."""
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat, idx = _mk_sem(spark, tmp_path, "life")
    batch = spark.createDataFrame(SEM_BATCH, SEM_SCHEMA)
    idx.ingest_keep_best(batch, 0.9, "q")
    # rebuild carries quality through and sheds the tombstoned id
    idx.rebuild()
    assert read_tombstones(cat, idx.name) is None
    assert sorted(
        (r.id, r.q) for r in cat.get_bucketed(idx.quality_table).collect()
    ) == [(2, 9), (10, 8), (13, 1)]
    # a later delete + vacuum purges quality with the other tables
    idx.delete([13])
    assert idx.vacuum() == 1
    assert sorted(
        (r.id, r.q) for r in cat.get_bucketed(idx.quality_table).collect()
    ) == [(2, 9), (10, 8)]
    assert idx.quality_table in idx.compact()
    # rebuild-from-scratch WITHOUT quality drops the tier
    idx2 = IvfIndex(cat, idx.name, n_centroids=2)
    idx2.build(spark.createDataFrame(SEM_CORPUS, SEM_SCHEMA))
    assert not cat.exists(idx.quality_table)
    idx2.ingest(spark.createDataFrame(SEM_BATCH, SEM_SCHEMA), 0.9)  # no raise
    with pytest.raises(ValueError, match="no quality table"):
        idx2.ingest_keep_best(
            spark.createDataFrame(SEM_BATCH, SEM_SCHEMA), 0.9, "q"
        )


def test_semantic_keep_best_matches_python_reference(spark, tmp_path):
    """Randomized full-equality check of the decision semantics: an
    independent Python reference (same rounded-6 cosine, same id-ordered
    seed quantizer with centroid_id tiebreak, union-find CC + (q,-id)
    argmax, the pairwise challenge) must produce the identical final
    live set over seeded random integer vectors — random shapes cover
    the no-match / all-dup / tie corners the hand fixtures don't."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from simple_map_reduce_spark.operators.similarity import IvfIndex

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    def cos(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return rnd6(d / (math.sqrt(na) * math.sqrt(nb)))

    def ref(corpus, batch, tau, k):
        cents = [(i, v) for i, v, _ in sorted(corpus)[:k]]

        def assign(vec):
            return max(cents, key=lambda c: (cos(vec, c[1]), -c[0]))[0]

        bq = {i: q for i, _, q in batch}
        cq = {i: q for i, _, q in corpus}
        bvec = {i: v for i, v, _ in batch}
        cvec = {i: v for i, v, _ in corpus}
        basg = {i: assign(v) for i, v in bvec.items()}
        casg = {i: assign(v) for i, v in cvec.items()}
        ids = sorted(bq)
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for ii, a in enumerate(ids):
            for b in ids[ii + 1:]:
                if basg[a] == basg[b] and cos(bvec[a], bvec[b]) >= tau:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for i in ids:
            groups.setdefault(find(i), []).append(i)
        challengers = [
            max(g, key=lambda i: (bq[i], -i)) for g in groups.values()
        ]
        admitted, beaten = [], set()
        for n in challengers:
            matches = [
                c
                for c in cq
                if casg[c] == basg[n] and cos(bvec[n], cvec[c]) >= tau
            ]
            if not matches or max(
                (cq[c], -c) for c in matches
            ) < (bq[n], -n):
                admitted.append(n)
                beaten.update(matches)
        return sorted(
            [(c, cq[c]) for c in cq if c not in beaten]
            + [(n, bq[n]) for n in admitted]
        )

    for seed in range(6):
        rng = random.Random(seed)

        def vec():
            while True:
                v = [float(rng.randint(-3, 3)) for _ in range(4)]
                if any(v):
                    return v

        corpus = [(i, vec(), rng.randint(0, 5)) for i in range(10)]
        batch = [(100 + i, vec(), rng.randint(0, 5)) for i in range(7)]
        tau, k = 0.5, 3
        cat = Catalog(spark, str(tmp_path / f"ref{seed}"))
        idx = IvfIndex(cat, f"ref{seed}", n_centroids=k)
        idx.build(
            spark.createDataFrame(corpus, SEM_SCHEMA), quality_col="q"
        )
        idx.ingest_keep_best(
            spark.createDataFrame(batch, SEM_SCHEMA), tau, "q"
        )
        got = sorted(
            (r.id, r.q)
            for r in live(
                cat, idx.name, cat.get_bucketed(idx.quality_table)
            ).collect()
        )
        assert got == ref(corpus, batch, tau, k), f"seed {seed}"


def test_empty_batch_is_a_noop_on_both_forms(spark, tmp_path):
    """An empty keep-best batch must change nothing: empty report, no
    tombstone table created (the ADVICE-r8 n==0 guard — an empty
    tombstone table would permanently switch reads off the exists()
    fast path), state identical."""
    cat, idx = _mk(spark, tmp_path, "empty", CORPUS)
    before = sorted(
        (r.id, r.q) for r in cat.get_bucketed(idx.quality_table).collect()
    )
    rep = idx.ingest_keep_best(
        spark.createDataFrame([], SCHEMA), "q"
    )
    assert rep.count() == 0
    assert read_tombstones(cat, idx.name) is None
    assert sorted(
        (r.id, r.q) for r in cat.get_bucketed(idx.quality_table).collect()
    ) == before

    scat, sidx = _mk_sem(spark, tmp_path, "sempty")
    srep = sidx.ingest_keep_best(
        spark.createDataFrame([], SEM_SCHEMA), 0.9, "q"
    )
    assert srep.count() == 0
    assert read_tombstones(scat, sidx.name) is None


def test_minhash_family_is_minwise_on_small_sets(spark):
    """Regression pin for the r9 family migration: under the old
    single-affine-round mix, doc N's per-permutation argmin was the SAME
    dominant shingle for all 48 permutations (0/48 band agreements with
    C1, 48/48 with C2 — a measured min-wise-independence failure). The
    avalanche family must put both true-J=0.4 pairs near the theoretical
    J*48 ~ 19 agreements."""
    from simple_map_reduce_spark.operators.dedup import (
        _minhash_aggs, hashed_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "theta iota kappa lam mu nu"),
            (10, "alpha beta gamma delta epsilon zeta theta iota kappa lam mu nu"),
        ],
        "doc_id bigint, text string",
    )
    sh = hashed_shingles(docs, "doc_id", "text", 3)
    sigs = {
        r["id"]: [r[f"mh_{i}"] for i in range(48)]
        for r in sh.groupBy("id").agg(*_minhash_aggs(48)).collect()
    }
    agree_1 = sum(a == b for a, b in zip(sigs[1], sigs[10]))
    agree_2 = sum(a == b for a, b in zip(sigs[2], sigs[10]))
    # both pairs have true J = 0.4; binomial(48, 0.4) lands in [8, 31]
    # with probability > 0.9998 per side — and CANNOT be 0 or 48 unless
    # one shingle dominates every permutation (the old defect)
    assert 8 <= agree_1 <= 31, agree_1
    assert 8 <= agree_2 <= 31, agree_2


def test_quality_table_lifecycle(spark, tmp_path):
    """build(quality_col) gates the ingest surface both ways; a rebuild
    without quality drops the table and returns to first-seen-wins;
    vacuum purges quality rows with the other three tables."""
    cat, idx = _mk(spark, tmp_path, "life", CORPUS)
    batch = spark.createDataFrame(BATCH, SCHEMA)
    with pytest.raises(ValueError, match="quality-indexed"):
        idx.ingest(batch)
    idx.ingest_keep_best(batch, "q")
    purged = idx.vacuum()
    assert purged == 1
    assert read_tombstones(cat, idx.name) is None
    assert sorted(
        (r.id, r.q) for r in cat.get_bucketed(idx.quality_table).collect()
    ) == [(2, 9), (10, 8), (13, 1)]
    # compact covers the fourth table on a quality index
    out = idx.compact()
    assert idx.quality_table in out
    # rebuild WITHOUT quality: table dropped, plain ingest allowed again
    idx.build(spark.createDataFrame(CORPUS, SCHEMA))
    assert not cat.exists(idx.quality_table)
    idx.ingest(batch)  # no raise
    # and ingest_keep_best now refuses
    with pytest.raises(ValueError, match="no quality table"):
        idx.ingest_keep_best(batch, "q")


# ---------------------------------------------------------------------------
# streaming keep-best (snapshot-isolated epochs — VERDICT r9 item 2)
# ---------------------------------------------------------------------------

# bands == num_hashes (1 row/band) so every J >= 0.3 pair below is a
# near-certain band collision; the Jaccard verify then gates exactly.
# Trigram Jaccards: J(10,1)=6/8=0.75, J(12,1)=2/6=0.33, J(10,12)=2/8=0.25.
STREAM_CORPUS = [
    (1, "w1 w2 w3 w4 w5 w6 w7 w8", 5),
    (2, "x1 x2 x3 x4 x5 x6", 9),
]
EP0 = [
    (10, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", 9),  # beats incumbent 1
    (12, "w5 w6 w7 w8", 4),                     # loses to incumbent 1
]
EP1 = [
    (20, "x1 x2 x3 x4 x5 x6 x7", 11),           # beats incumbent 2
    (21, "p1 p2 p3 p4 p5", 1),                  # novel -> admitted
]


def _mk_stream_idx(spark, tmp_path, sub):
    cat = Catalog(spark, str(tmp_path / sub / "wh"))
    idx = NearDupIndex(
        cat, f"skb_{sub}", threshold=0.3, bands=12, num_hashes=12
    )
    idx.build(spark.createDataFrame(STREAM_CORPUS, SCHEMA), quality_col="q")
    return cat, idx


def _stage_stream(spark, tmp_path, sub, epochs):
    import shutil

    root = tmp_path / sub
    src = root / "src"
    src.mkdir(parents=True, exist_ok=True)
    schema = spark.createDataFrame(epochs[0], SCHEMA).schema
    for i, rows in enumerate(epochs):
        stage = str(root / f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = str(src / f"{'abcd'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return stream, str(root / "ckpt")


def test_streaming_keep_best_matches_sequential_batch(spark, tmp_path):
    """Two keep-best epochs drained through ingest_stream_keep_best
    produce the same reports and the same final live exemplar set as
    two sequential ingest_keep_best calls on a twin index."""
    cat_s, idx_s = _mk_stream_idx(spark, tmp_path, "seqs")
    stream, ckpt = _stage_stream(spark, tmp_path, "seqs", [EP0, EP1])
    idx_s.ingest_stream_keep_best(stream, ckpt, "q")

    cat_b, idx_b = _mk_stream_idx(spark, tmp_path, "seqb")
    reps = []
    for rows, ep in ((EP0, 0), (EP1, 1)):
        rep = idx_b.ingest_keep_best(spark.createDataFrame(rows, SCHEMA), "q")
        reps.extend((ep,) + tuple(r) for r in rep.collect())

    got = sorted(
        (r.epoch_id, r.id, r.q, r.outcome, r.kept_by, r.n_replaced)
        for r in cat_s.get(idx_s.kb_reports_table).collect()
    )
    assert got == sorted(reps)
    live_s = sorted(
        (r.id, r.q)
        for r in live(
            cat_s, idx_s.name, cat_s.get_bucketed(idx_s.quality_table)
        ).collect()
    )
    live_b = sorted(
        (r.id, r.q)
        for r in live(
            cat_b, idx_b.name, cat_b.get_bucketed(idx_b.quality_table)
        ).collect()
    )
    # EP0: 10 replaces 1, 12 loses to the (then-live) 1;
    # EP1: 20 replaces 2, 21 novel
    assert live_s == live_b == [(10, 9), (20, 11), (21, 1)]
    # committed epochs release their pinned snapshot trees
    for t in (idx_s.buckets_table, idx_s.quality_table):
        assert cat_s.versions(t) == []


def test_streaming_keep_best_replays_across_tombstone_commit(spark, tmp_path):
    """THE case plain replay cannot survive: the epoch's beaten-incumbent
    tombstones COMMITTED but the report append crashed. Doc 12's only
    near-dup is incumbent 1, which doc 10's admission tombstoned — a
    replay against live state would admit 12 (its incumbent is dead);
    the snapshot-pinned replay must re-derive the ORIGINAL decision
    (rejected_corpus, kept_by=1) bit-exact."""
    cat, idx = _mk_stream_idx(spark, tmp_path, "crashrep")
    stream, ckpt = _stage_stream(spark, tmp_path, "crashrep", [EP0])

    real_put = cat.put

    def crashing_put(source, name, fmt="text"):
        if name == idx.kb_reports_table:
            raise RuntimeError("simulated crash before the report append")
        return real_put(source, name, fmt)

    cat.put = crashing_put
    try:
        with pytest.raises(Exception, match="simulated crash"):
            idx.ingest_stream_keep_best(stream, ckpt, "q")
    finally:
        cat.put = real_put

    # the dangerous state: tombstones committed, report + marker missing
    assert sorted(r.id for r in read_tombstones(cat, idx.name).collect()) == [1]
    assert not cat.exists(idx.kb_reports_table)
    assert not cat.exists(idx.kb_epochs_table)
    # the pins were recorded BEFORE the ingest ran
    assert cat.exists(idx.snaps_table)
    assert cat.versions(idx.buckets_table) != []

    stream2, _ = _stage_stream(spark, tmp_path, "crashrep", [EP0])
    idx.ingest_stream_keep_best(stream2, ckpt, "q")

    got = {
        r.id: (r.outcome, r.kept_by, r.n_replaced)
        for r in cat.get(idx.kb_reports_table).collect()
    }
    assert got == {
        10: ("admitted", None, 1),
        12: ("rejected_corpus", 1, 0),  # incumbent dead at replay time
    }
    live_set = sorted(
        r.id
        for r in live(
            cat, idx.name, cat.get_bucketed(idx.quality_table)
        ).collect()
    )
    assert live_set == [2, 10]
    # no duplicated tombstone rows from the replay
    assert sorted(r.id for r in read_tombstones(cat, idx.name).collect()) == [1]
    # committed epoch released its pinned snapshots
    for t in (idx.buckets_table, idx.shingles_table, idx.sizes_table,
              idx.quality_table):
        assert cat.versions(t) == []


def test_hash_family_marker_gates_reads(spark, tmp_path):
    """ADVICE r9 (medium): an index whose stored band hashes were derived
    under a different MinHash family (or different banding knobs) must
    FAIL FAST on check/ingest/ingest_keep_best instead of silently
    getting ~zero collisions and admitting near-dups as novel."""
    cat, idx = _mk(spark, tmp_path, "meta", CORPUS)
    batch = spark.createDataFrame(BATCH, SCHEMA)
    meta_schema = (
        "hash_family BIGINT, num_hashes BIGINT, bands BIGINT, "
        "shingle_n BIGINT"
    )
    # tamper: pretend the index was built under family v1 (pre-r9)
    cat.put(spark.createDataFrame([(1, 12, 4, 3)], meta_schema), idx.meta_table)
    with pytest.raises(ValueError, match="MinHash"):
        idx.check(batch)
    with pytest.raises(ValueError, match="MinHash"):
        idx.ingest_keep_best(batch, "q")
    # missing marker (legacy / crashed-rebuild index) refuses too
    cat.delete(idx.meta_table)
    with pytest.raises(ValueError, match="hash-family marker"):
        idx.check(batch)
    # rebuild republishes the marker and reads work again
    idx.build(spark.createDataFrame(CORPUS, SCHEMA), quality_col="q")
    idx.check(batch).count()
    # an instance with different banding knobs refuses the same index
    idx_other = NearDupIndex(cat, idx.name, threshold=0.3, bands=6,
                             num_hashes=12)
    with pytest.raises(ValueError, match="bands"):
        idx_other.check(batch)


# ---------------------------------------------------------------------------
# streaming SEMANTIC keep-best (the IvfIndex twin of the protocol)
# ---------------------------------------------------------------------------

# cos(A, I) = cos(B, I) = 0.8 >= tau; cos(A, B) = 0.28 < tau, so A and B
# are NOT intra-batch dups — both challenge incumbent 1 independently.
SKB_TAU = 0.5
SKB_CORPUS = [
    (1, [1.0, 0.0, 0.0, 0.0], 5),
    (2, [0.0, 0.0, 1.0, 0.0], 9),
]
SKB_EP0 = [
    (10, [0.8, 0.6, 0.0, 0.0], 9),   # beats incumbent 1
    (12, [0.8, -0.6, 0.0, 0.0], 4),  # loses to incumbent 1
]
SKB_EP1 = [
    (20, [0.0, 0.1, 1.0, 0.0], 11),  # beats incumbent 2
    (21, [0.0, 0.0, 0.0, 1.0], 1),   # novel -> admitted
]


def _mk_sem_stream_idx(spark, tmp_path, sub):
    from simple_map_reduce_spark.operators.similarity import IvfIndex

    cat = Catalog(spark, str(tmp_path / sub / "wh"))
    idx = IvfIndex(cat, f"sskb_{sub}", n_centroids=2)
    idx.build(spark.createDataFrame(SKB_CORPUS, SEM_SCHEMA), quality_col="q")
    return cat, idx


def _stage_sem_stream(spark, tmp_path, sub, epochs):
    import shutil

    root = tmp_path / sub
    src = root / "src"
    src.mkdir(parents=True, exist_ok=True)
    schema = spark.createDataFrame(epochs[0], SEM_SCHEMA).schema
    for i, rows in enumerate(epochs):
        stage = str(root / f"stage{i}")
        spark.createDataFrame(rows, SEM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = str(src / f"{'abcd'[i]}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return stream, str(root / "ckpt")


def test_streaming_semantic_keep_best_matches_sequential_batch(spark, tmp_path):
    cat_s, idx_s = _mk_sem_stream_idx(spark, tmp_path, "sseq")
    stream, ckpt = _stage_sem_stream(spark, tmp_path, "sseq", [SKB_EP0, SKB_EP1])
    idx_s.ingest_stream_keep_best(stream, ckpt, SKB_TAU, "q")

    cat_b, idx_b = _mk_sem_stream_idx(spark, tmp_path, "sseqb")
    reps = []
    for rows, ep in ((SKB_EP0, 0), (SKB_EP1, 1)):
        rep = idx_b.ingest_keep_best(
            spark.createDataFrame(rows, SEM_SCHEMA), SKB_TAU, "q"
        )
        reps.extend((ep,) + tuple(r) for r in rep.collect())

    got = sorted(
        (r.epoch_id, r.id, r.q, r.outcome, r.kept_by, r.n_replaced)
        for r in cat_s.get(idx_s.kb_reports_table).collect()
    )
    assert got == sorted(reps)
    live_s = sorted(
        (r.id, r.q)
        for r in live(
            cat_s, idx_s.name, cat_s.get_bucketed(idx_s.quality_table)
        ).collect()
    )
    assert live_s == [(10, 9), (20, 11), (21, 1)]
    for t in (idx_s.assign_table, idx_s.quality_table, idx_s.centroids_table):
        assert cat_s.versions(t) == []


def test_streaming_semantic_keep_best_replays_across_tombstone_commit(
    spark, tmp_path
):
    """Same decisive case as the lexical twin: vec 12's only match is
    incumbent 1, tombstoned by vec 10's admission in the SAME epoch. A
    live-state replay would admit 12; the snapshot-pinned replay must
    re-derive rejected_corpus/kept_by=1."""
    cat, idx = _mk_sem_stream_idx(spark, tmp_path, "scrash")
    stream, ckpt = _stage_sem_stream(spark, tmp_path, "scrash", [SKB_EP0])

    real_put = cat.put

    def crashing_put(source, name, fmt="text"):
        if name == idx.kb_reports_table:
            raise RuntimeError("simulated crash before the report append")
        return real_put(source, name, fmt)

    cat.put = crashing_put
    try:
        with pytest.raises(Exception, match="simulated crash"):
            idx.ingest_stream_keep_best(stream, ckpt, SKB_TAU, "q")
    finally:
        cat.put = real_put

    assert sorted(r.id for r in read_tombstones(cat, idx.name).collect()) == [1]
    assert not cat.exists(idx.kb_reports_table)
    assert cat.exists(idx.snaps_table)

    stream2, _ = _stage_sem_stream(spark, tmp_path, "scrash", [SKB_EP0])
    idx.ingest_stream_keep_best(stream2, ckpt, SKB_TAU, "q")

    got = {
        r.id: (r.outcome, r.kept_by, r.n_replaced)
        for r in cat.get(idx.kb_reports_table).collect()
    }
    assert got == {
        10: ("admitted", None, 1),
        12: ("rejected_corpus", 1, 0),  # incumbent dead at replay time
    }
    live_set = sorted(
        r.id
        for r in live(
            cat, idx.name, cat.get_bucketed(idx.quality_table)
        ).collect()
    )
    assert live_set == [2, 10]
    assert sorted(r.id for r in read_tombstones(cat, idx.name).collect()) == [1]


def test_semdedup_keep_best_refuses_unscored_vectors(spark):
    """The batch semantic keep-best shares the ADVICE-r9 contract: a
    vector with no quality row raises loudly instead of silently
    dropping its pairs (which would leave duplicates live)."""
    from simple_map_reduce_spark.operators.similarity import (
        semdedup_keep_best,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 2)]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    qual = spark.createDataFrame(
        [(i, 10 - i) for i in range(5)], ["vec_id", "q"]  # id 5 unscored
    )
    with pytest.raises(ValueError, match="no quality row"):
        semdedup_keep_best(emb, qual, n_centroids=2, tau=0.9)


def test_keep_best_family_refuses_non_integral_quality(spark, tmp_path):
    """ADVICE r10: every keep-best decision orders by (q, -id) with q
    cast to bigint — a float quality would silently TRUNCATE under that
    cast (1.9 -> 1) and can flip dominance/ties with no failure
    anywhere. All five quality entry points must raise loudly instead:
    the batch semantic form, the batch lexical form, and both standing
    indexes' build + keep-best ingest."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import (
        NearDupIndex,
        keep_best_exemplars,
    )
    from simple_map_reduce_spark.operators.similarity import (
        IvfIndex,
        semdedup_keep_best,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 2)]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    fq = spark.createDataFrame(
        [(i, 10.0 - i) for i in range(6)], ["vec_id", "q"]  # DOUBLE q
    )
    with pytest.raises(ValueError, match="exact-integer"):
        semdedup_keep_best(emb, fq, n_centroids=2, tau=0.9)

    docs = spark.createDataFrame(
        [(i, f"doc {i}", 1.5 * i) for i in range(4)],
        ["doc_id", "text", "fscore"],
    )
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="exact-integer"):
        keep_best_exemplars(docs, pairs, F.col("fscore"))

    cat = Catalog(spark, str(tmp_path / "cat"))
    fdocs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", 2.5) for i in range(3)],
        ["doc_id", "text", "fq"],
    )
    with pytest.raises(ValueError, match="exact-integer"):
        NearDupIndex(cat, "fq_ndi").build(fdocs, quality_col="fq")
    femb = spark.createDataFrame(
        [(i, [1.0, 0.0], 0.5) for i in range(3)],
        ["vec_id", "embedding", "fq"],
    )
    with pytest.raises(ValueError, match="exact-integer"):
        IvfIndex(cat, "fq_ivf", n_centroids=2).build(femb, quality_col="fq")


def test_semdedup_keep_best_refuses_duplicate_quality_ids(spark):
    """ADVICE r10: a duplicated id in the quality frame multiplies rows
    through the left join AND the self-join, yielding inconsistent
    pruned/keeper rows with no failure — must raise loudly instead."""
    from simple_map_reduce_spark.operators.similarity import (
        semdedup_keep_best,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 2)]) for i in range(4)],
        ["vec_id", "embedding"],
    )
    qual = spark.createDataFrame(
        [(0, 9), (1, 8), (2, 7), (3, 6), (2, 99)], ["vec_id", "q"]
    )
    with pytest.raises(ValueError, match="duplicate quality row"):
        semdedup_keep_best(emb, qual, n_centroids=2, tau=0.9)
