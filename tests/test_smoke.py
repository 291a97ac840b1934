"""Driver-contract smoke: entry() runs at sf0.001 and yields rows with a
stable schema; every queries() key resolves and runs at sf0.001."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # the driver's t1 gate is rows > 0 (BASELINE.md)
    assert df.columns  # stable, non-empty schema


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracle keys without queries: {o - q}"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs_at_smoke_sf(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0
