"""REPL test: drive the shell loop with a scripted stdin — the
reference's interactive prompt surface (main.rs:209-308)."""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.cli import repl
from simple_map_reduce_spark.engine import MapleJuice


def test_repl_session(spark, tmp_path):
    src = tmp_path / "data.csv"
    src.write_text("1,ford,100\n2,kia,200\n")
    mj = MapleJuice(spark, str(tmp_path / "wh"))
    stdin = io.StringIO(
        f"put {src} cars\n"
        "ls\n"
        "SELECT ALL FROM cars WHERE ford\n"
        "delete cars_filter\n"
        "bogus command\n"
        "exit\n"
    )
    out = io.StringIO()
    repl(mj, stdin=stdin, stdout=out)
    text = out.getvalue()
    assert "put" in text and "cars" in text
    assert "1,ford,100" in text
    assert "-- 1 rows" in text
    assert "deleted" in text
    assert "?:" in text  # bad command keeps the shell alive with a hint


def test_repl_compact(spark, tmp_path):
    mj = MapleJuice(spark, str(tmp_path / "wh"))
    mj.catalog.put(spark.range(1000).withColumnRenamed("id", "v").repartition(8), "t")
    stdin = io.StringIO("compact t\nexit\n")
    out = io.StringIO()
    repl(mj, stdin=stdin, stdout=out)
    assert "compacted t -> 1 file(s)" in out.getvalue()
    assert mj.catalog.get("t").count() == 1000


def test_repl_snapshot_restore_roundtrip(spark, tmp_path):
    mj = MapleJuice(spark, str(tmp_path / "wh"))
    mj.catalog.put(spark.range(5).withColumnRenamed("id", "v"), "t")
    stdin = io.StringIO("snapshot t\nversions t\nexit\n")
    out = io.StringIO()
    repl(mj, stdin=stdin, stdout=out)
    text = out.getvalue()
    assert "snapshot t -> v1" in text and "v1" in text
    # mutate, then roll back through the shell
    mj.catalog.put(spark.range(100, 103).withColumnRenamed("id", "v"), "t")
    stdin = io.StringIO("restore t 1\nexit\n")
    out = io.StringIO()
    repl(mj, stdin=stdin, stdout=out)
    assert "restored t <- v1" in out.getvalue()
    assert {r.v for r in mj.catalog.get("t").collect()} == set(range(5))
