"""Unit tests for operators/graph.py::connected_components."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.graph import connected_components


def test_cc_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    # pair 10-11, singleton 20
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    got = {r.id: r.component for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_cc_cycle_with_cross_edge(spark):
    # cycle 5-6-7-5 plus a bridge to 1: all collapse to min id 1
    verts = spark.createDataFrame([(i,) for i in [1, 5, 6, 7]], "id bigint")
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5), (7, 1)], "src bigint, dst bigint"
    )
    got = {r.id: r.component for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 5: 1, 6: 1, 7: 1}


def test_cc_nonconvergence_raises(spark):
    """Partially-propagated labels must never be returned silently: a
    6-vertex chain cannot converge in one round."""
    import pytest

    verts = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(5)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=1)


def test_both_algorithms_agree(spark):
    # two components with internal cycles + a chain tail
    verts = spark.createDataFrame([(i,) for i in range(12)], "id bigint")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (6, 7), (7, 8), (8, 6), (9, 10)],
        "src bigint, dst bigint",
    )
    a = sorted(
        tuple(r)
        for r in connected_components(verts, edges, algorithm="two_star").collect()
    )
    b = sorted(
        tuple(r)
        for r in connected_components(verts, edges, algorithm="label_prop").collect()
    )
    assert a == b


def test_two_star_beats_label_prop_on_chain(spark):
    """The reason two_star is the default: on a depth-n graph label
    propagation needs diameter rounds while the alternating star method
    needs O(log n) — pin the >2x gap on a 16-vertex chain."""
    from simple_map_reduce_spark.operators.graph import (
        _label_prop_labels,
        _two_star_edges,
    )

    n = 16
    verts = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    star, ts_rounds = _two_star_edges(edges, max_iter=50)
    labels, lp_rounds = _label_prop_labels(verts, edges, "id", max_iter=50)
    # same answer: every vertex reaches component 0
    assert {r.a for r in star.collect()} == {0}
    assert {r.comp for r in labels.collect()} == {0}
    assert lp_rounds > 2 * ts_rounds, (lp_rounds, ts_rounds)


def test_two_star_handles_self_loops_and_dup_edges(spark):
    """Canonicalization must drop self-loops and collapse duplicate /
    reversed edges before the star rounds."""
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 7]], "id bigint")
    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 3), (2, 3), (7, 7)],
        "src bigint, dst bigint",
    )
    got = {r.id: r.component for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}
