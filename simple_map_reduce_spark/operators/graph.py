"""Iterative graph operators: connected components for dedup grouping.

Near-duplicate pairs (MinHash/SimHash/Jaccard) form a graph whose
connected components are the true duplicate *clusters* — picking one
canonical document per cluster needs the transitive closure, not just the
pairs. The reference has no iterative surface at all (every job is one
map + one reduce, SURVEY.md §3); this is the [EXT] slot for iterative
algorithms generally.

Algorithm: min-label propagation. Every vertex starts labelled with its
own id; each round every vertex takes the min of its own label and its
neighbours' labels; converged when no label changes. Rounds needed =
graph diameter — small for dedup clusters (near-cliques). For
billion-edge general graphs the alternating large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and Beyond")
halves the round count; the loop body below is the slot where that
rewrite goes.

Scale shape per round: one shuffle join (labels ⋈ edges, partitioned on
vertex id) + one groupBy(min) — both partial-aggregatable. The label
frame is ``localCheckpoint``-ed each round: truncating lineage is what
keeps plan size O(1) instead of O(rounds) (on a cluster, swap for
``checkpoint`` to HDFS so executor loss doesn't replay the whole loop).
The convergence probe is a scalar count per round, never a collect of
vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id
    reachable (isolated vertices get their own id). Edges are treated as
    undirected."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)

    changed = 0
    for _ in range(max_iter):
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
            break
    if changed > 0:
        # partially-propagated labels are WRONG labels — never return
        # them silently (the operator is exposed as general-purpose;
        # dedup graphs converge in a handful of rounds, arbitrary graphs
        # may not)
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds ({changed} labels still changing); "
            f"raise max_iter (rounds needed = graph diameter)"
        )
    return labels.select(F.col("vid").alias(id_col), F.col("comp").alias("component"))
