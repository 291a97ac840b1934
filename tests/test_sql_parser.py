from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.plans.sql import FilterQuery, JoinQuery, parse, run
from simple_map_reduce_spark.sources.readers import lines_view


def test_parse_filter():
    q = parse("SELECT ALL FROM cars WHERE Video,Radio")
    assert q == FilterQuery(dataset="cars", regex="Video,Radio")


def test_parse_join():
    q = parse("SELECT ALL FROM cars trucks WHERE cars.price = trucks.price")
    assert q == JoinQuery(left="cars", right="trucks", left_field="price", right_field="price")


def test_parse_join_swapped_fields():
    q = parse("SELECT ALL FROM cars trucks WHERE trucks.cost = cars.price")
    assert q == JoinQuery(left="cars", right="trucks", left_field="price", right_field="cost")


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse("SELECT * FROM t")


def test_run_filter_and_join(spark):
    cars = spark.createDataFrame([(1, "ford", 100), (2, "kia", 200)], ["id", "name", "price"])
    trucks = spark.createDataFrame([(9, "mack", 200)], ["id", "name", "price"])
    tables = {"cars": lines_view(cars), "trucks": trucks}
    out = run(parse("SELECT ALL FROM cars WHERE ford"), tables)
    assert [r["value"] for r in out.collect()] == ["1,ford,100"]

    tables = {"cars": cars, "trucks": trucks}
    j = run(parse("SELECT ALL FROM cars trucks WHERE cars.price = trucks.price"), tables)
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["cars_name"] == "kia" and rows[0]["trucks_name"] == "mack"
