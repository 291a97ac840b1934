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
