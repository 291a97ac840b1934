"""Iterative graph operators: connected components for dedup grouping.

Near-duplicate pairs (MinHash/SimHash/Jaccard) form a graph whose
connected components are the true duplicate *clusters* — picking one
canonical document per cluster needs the transitive closure, not just the
pairs. The reference has no iterative surface at all (every job is one
map + one reduce, SURVEY.md §3); this is the [EXT] slot for iterative
algorithms generally.

Two algorithms, selectable; both return (id, component = min reachable
vertex id):

- ``two_star`` (default) — the alternating **large-star / small-star**
  method of Kiveris et al., "Connected Components in MapReduce and
  Beyond" (SoCC'14): each round rewires every edge toward the locally
  known minimum, halving component *depth* per round, so rounds grow
  O(log) in component size — the published MapReduce CC algorithm for
  arbitrary graphs at scale.
- ``label_prop`` — min-label propagation: every vertex takes the min of
  its neighbours' labels per round. Rounds = graph **diameter**: fine
  for dedup near-cliques, pathological for chains (see
  tests/test_graph.py, which pins the >2× round gap on a chain).

Scale shape per round (both): one shuffle join/groupBy pair on vertex
ids, fully partial-aggregatable. Every per-round frame is
``localCheckpoint``-ed — truncating lineage keeps plan size O(1) instead
of O(rounds) (on a cluster, swap for ``checkpoint`` to HDFS so executor
loss doesn't replay the whole loop). Convergence probes are scalar
aggregates per round, never a collect of vertex data; the two-star
stability probe is a (count, hash-sum) pair, re-verified with an exact
symmetric-difference count before the loop is allowed to exit, so a
hash collision can delay exit by one probe but never yield wrong labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(e: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Undirected canonical form: (min, max), self-loops dropped, distinct."""
    return (
        e.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For every vertex v: connect each strictly-larger neighbour to
    min(N(v) ∪ {v}). (Kiveris et al., Algorithm 1.)"""
    sym = e.select(F.col("a").alias("v"), F.col("b").alias("u")).union(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    m = (
        sym.groupBy("v")
        .agg(F.min("u").alias("mn"))
        .select("v", F.least(F.col("mn"), F.col("v")).alias("m"))
    )
    out = (
        sym.join(m, "v")
        .filter(F.col("u") > F.col("v"))
        .select(F.col("u").alias("a"), F.col("m").alias("b"))
    )
    return _canon_edges(out)


def _small_star(e: DataFrame) -> DataFrame:
    """For every vertex v: connect each smaller-or-equal neighbour (and v
    itself) to min(N⁻(v)). Operates on the canonical (a < b) form, so b
    plays v and a its smaller neighbour. (Kiveris et al., Algorithm 2.)"""
    m = e.groupBy("b").agg(F.min("a").alias("m"))
    nbrs = e.join(m, "b").select(F.col("a"), F.col("m"))
    selfs = m.select(F.col("b").alias("a"), F.col("m"))
    return _canon_edges(nbrs.union(selfs), a="a", b="m")


def _edge_probe(e: DataFrame) -> tuple[int, int]:
    """(count, 64-bit hash sum) — the cheap per-round stability probe."""
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _exact_diff_count(new_e: DataFrame, e: DataFrame) -> int:
    """Exact symmetric-difference count of two canonical (distinct) edge
    frames. One shuffle of 2|E| (a, b) pairs — affordable when the graph
    is batch-bounded; the hash-probe loop exists for corpus-scale edge
    sets where an extra per-round shuffle is real money."""
    return (
        new_e.union(e)
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 1)
        .count()
    )


def _two_star_edges_exact(
    edges: DataFrame, max_iter: int
) -> tuple[DataFrame, int]:
    """The batch-bounded variant of the two-star loop (r12, guide §5):
    ONE job per probe instead of the hash loop's init-probe + per-round
    probe + convergence re-verify, and each probe covers TWO alternating
    large/small rounds (the pointer-doubling cadence — component depth
    quarters per probe). The probe is the EXACT symmetric-difference
    count, so convergence needs no separate re-check; a zero diff across
    a doubled step implies the fixed point because the round map is
    deterministic and the alternation provably converges (Kiveris et
    al.) — a repeated non-fixed state would cycle forever, contradicting
    convergence. The keep-best ingest paths use this: their pair graphs
    are bounded by |batch|, where per-job fixed overhead dominates the
    extra per-probe edge shuffle (measured: the CC phase is the largest
    single slice of the ingest at sf0.1)."""
    e = _canon_edges(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ).localCheckpoint(eager=False)
    for rounds in range(1, max_iter + 1):
        new_e = _small_star(_large_star(_small_star(_large_star(e))))
        new_e = new_e.localCheckpoint(eager=False)
        # the diff action materializes new_e's checkpoint (and, on the
        # first round, e's) — one job per probe, nothing else needed
        if _exact_diff_count(new_e, e) == 0:
            return new_e, rounds
        e = new_e
    raise RuntimeError(
        f"two-star connected components did not converge within "
        f"max_iter={max_iter} doubled rounds (expected O(log n) — check "
        f"for an id type mismatch between src/dst columns)"
    )


def _two_star_edges(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Run alternating large/small star to the fixed point; returns the
    converged star edges (center = component min) and the round count."""
    # LAZY localCheckpoint + immediate probe: the probe's aggregate is
    # the action that materializes the checkpoint, so each round costs
    # ONE job instead of two (eager=True ran a materialization job and
    # then the probe re-scanned the checkpointed blocks). Safe here
    # because nothing is written between checkpoint and probe — the
    # eager pins in the ingest protocols exist to freeze state BEFORE a
    # table append, a hazard this loop does not have.
    e = _canon_edges(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ).localCheckpoint(eager=False)
    probe = _edge_probe(e)
    if probe[0] == 0:
        return e, 0
    for rounds in range(1, max_iter + 1):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_probe = _edge_probe(new_e)
        if new_probe == probe:
            # exact re-check: the probe is a hash — paranoia is cheap here
            # because this path runs once, at convergence
            diff = (
                new_e.union(e)
                .groupBy("a", "b")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") == 1)
                .count()
            )
            if diff == 0:
                return new_e, rounds
        e, probe = new_e, new_probe
    raise RuntimeError(
        f"two-star connected components did not converge within "
        f"max_iter={max_iter} rounds (expected O(log n) — check for an "
        f"id type mismatch between src/dst columns)"
    )


def _label_prop_labels(
    vertices: DataFrame, edges: DataFrame, id_col: str, max_iter: int
) -> tuple[DataFrame, int]:
    """Min-label propagation; returns ((vid, comp), rounds). Rounds
    needed = graph diameter."""
    sym = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        .union(edges.select(F.col("dst").alias("s"), F.col("src").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)

    changed = 0
    for rounds in range(1, max_iter + 1):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["vid"])
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["vid"] == nbr_min["s"], "left")
            .select(
                F.col("vid"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.vid") == F.col("o.vid"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels, rounds
    # partially-propagated labels are WRONG labels — never return them
    # silently (dedup graphs converge in a handful of rounds; arbitrary
    # graphs may not — use the two_star algorithm for those)
    raise RuntimeError(
        f"label propagation did not converge within max_iter={max_iter} "
        f"rounds ({changed} labels still changing); rounds needed = graph "
        f"diameter — use algorithm='two_star' (O(log n) rounds) instead"
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    algorithm: str = "two_star",
    probe: str = "hash",
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id
    reachable (isolated vertices get their own id). Edges are treated as
    undirected. ``algorithm``: ``two_star`` (default, O(log n) rounds on
    arbitrary graphs) or ``label_prop`` (diameter rounds — only for
    known-shallow graphs). ``probe`` (two_star only): ``hash`` (default
    — per-round scalar aggregate, no extra shuffle, for corpus-scale
    edge sets) or ``exact`` (one job per DOUBLED round via an exact
    symmetric-difference count — for callers whose graph is bounded by
    a batch, where per-job overhead dominates; the keep-best ingest
    protocols pass this)."""
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if algorithm == "label_prop":
        labels, _ = _label_prop_labels(vertices, edges, id_col, max_iter)
        return labels.select(
            F.col("vid").alias(id_col), F.col("comp").alias("component")
        )
    if algorithm != "two_star":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if probe == "exact":
        star, _ = _two_star_edges_exact(edges, max_iter)
    elif probe == "hash":
        star, _ = _two_star_edges(edges, max_iter)
    else:
        raise ValueError(f"unknown probe {probe!r}")
    # converged state is a union of stars centered at each component's
    # min id: (a=center, b=member). Isolated vertices label themselves.
    membership = star.groupBy("b").agg(F.min("a").alias("comp"))
    return vertices.select(F.col(id_col).alias("vid")).join(
        membership, F.col("vid") == F.col("b"), "left"
    ).select(
        F.col("vid").alias(id_col),
        F.coalesce(F.col("comp"), F.col("vid")).alias("component"),
    )
