from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def test_put_get_ls_delete_roundtrip(cat, spark, tmp_path):
    local = tmp_path / "in.txt"
    local.write_text("alpha\nbeta\n")
    cat.put(str(local), "mytable")
    assert cat.ls() == ["mytable"]
    got = sorted(r["value"] for r in cat.get("mytable").collect())
    assert got == ["alpha", "beta"]

    out = tmp_path / "out.txt"
    cat.export("mytable", str(out))
    assert sorted(out.read_text().splitlines()) == ["alpha", "beta"]

    assert cat.delete("mytable") is True
    assert cat.ls() == []
    assert cat.delete("mytable") is False


def test_put_dataframe_and_prefix_union(cat, spark):
    df1 = spark.createDataFrame([(1,)], ["v"])
    df2 = spark.createDataFrame([(2,)], ["v"])
    cat.put(df1, "ds_part1")
    cat.put(df2, "ds_part2")
    # reference quirk NOT replicated: prefix reads union all matches,
    # not just the first file (leader.rs:253)
    assert sorted(r["v"] for r in cat.read_prefix("ds_").collect()) == [1, 2]


def test_invalid_names_rejected(cat):
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ValueError):
            cat.put(None, bad)  # type: ignore[arg-type]
