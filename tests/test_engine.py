"""End-to-end MapleJuice facade tests: the reference's full command
surface (put → maple → juice → get, SQL statements), including the
reference's own demo queries run through the facade."""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.engine import MapleJuice

GOLDEN_CSV = "/root/reference/sdfs/data/Traffic_Signal_Intersections.csv"


@pytest.fixture()
def mj(spark, tmp_path):
    return MapleJuice(spark, str(tmp_path / "wh"))


def _wc_fns():
    def wc_map(lines):
        counts = {}
        for line in lines:
            for w in re.findall(r"\w+", line.lower()):
                counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            yield (w, str(c))

    def wc_reduce(key, values):
        yield (key, str(sum(int(v) for v in values)))

    return wc_map, wc_reduce


def test_full_maple_juice_lifecycle(mj, tmp_path):
    """put → maple (keys contract) → juice (+delete flag) → get."""
    src = tmp_path / "corpus.txt"
    src.write_text("apple banana\nbanana cherry\nbanana\n")
    mj.put(str(src), "corpus")
    assert mj.ls() == ["corpus"]

    wc_map, wc_reduce = _wc_fns()
    keys = mj.maple(wc_map, num_tasks=2, out_prefix="wc_mid", input_prefix="corpus")
    assert keys == ["apple", "banana", "cherry"]

    out = mj.juice(wc_reduce, num_tasks=2, in_prefix="wc_mid", out_name="wc_out", delete=True)
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == {"apple": 1, "banana": 3, "cherry": 1}
    # delete flag implemented (dead in the reference): intermediates gone
    assert mj.ls() == ["corpus", "wc_out"]

    local = tmp_path / "result.txt"
    mj.get("wc_out", str(local))
    assert sorted(local.read_text().splitlines()) == ["apple,1", "banana,3", "cherry,1"]


@pytest.mark.skipif(not os.path.exists(GOLDEN_CSV), reason="reference data absent")
def test_sql_filter_statement_end_to_end(mj):
    """The reference's own golden demo through the facade: result table
    named {dataset}_filter (README.md:114), containing the true matches."""
    mj.put(GOLDEN_CSV, "traffic")
    out = mj.sql("SELECT ALL FROM traffic WHERE Video,Radio")
    assert "traffic_filter" in mj.ls()
    assert out.count() == 13  # true match count (golden file dropped 3, SURVEY §5)


def test_sql_join_statement_end_to_end(mj, spark, tmp_path):
    cars = tmp_path / "cars.csv"
    cars.write_text("id,name,price\n1,ford,100\n2,kia,200\n")
    trucks = tmp_path / "trucks.csv"
    trucks.write_text("id,name,price\n9,mack,200\n")
    mj.put(str(cars), "cars", fmt="csv")
    mj.put(str(trucks), "trucks", fmt="csv")
    out = mj.sql("SELECT ALL FROM cars trucks WHERE cars.price = trucks.price")
    assert "cars_trucks_join" in mj.ls()
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["cars_name"] == "kia"


def test_maple_prefix_unions_all_tables(mj, spark):
    """Documented deviation: prefix input reads ALL matching tables, not
    the reference's first-file-only quirk (leader.rs:253)."""
    df1 = spark.createDataFrame([("a b",)], ["value"])
    df2 = spark.createDataFrame([("b c",)], ["value"])
    mj.catalog.put(df1, "ds_part1")
    mj.catalog.put(df2, "ds_part2")
    wc_map, _ = _wc_fns()
    keys = mj.maple(wc_map, num_tasks=2, out_prefix="mid", input_prefix="ds_")
    assert keys == ["a", "b", "c"]


def test_maple_key_collect_cap(mj, tmp_path):
    """The stdout-keys contract is bounded: exceeding max_keys raises
    instead of silently collecting an unbounded vocabulary; maple_keys is
    the distributed escape hatch."""
    src = tmp_path / "corpus2.txt"
    src.write_text("apple banana cherry\nbanana cherry date\n")
    mj.put(str(src), "corpus2")
    wc_map, _ = _wc_fns()
    with pytest.raises(ValueError, match="maple_keys"):
        mj.maple(wc_map, num_tasks=2, out_prefix="capped", input_prefix="corpus2", max_keys=2)
    # the keyed table was still stored; the DataFrame form is unbounded
    keys = {r["key"] for r in mj.maple_keys("capped").collect()}
    assert keys == {"apple", "banana", "cherry", "date"}
