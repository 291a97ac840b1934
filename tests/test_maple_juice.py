"""Generic maple/juice surface (SURVEY.md §2.8): wordcount written as a
user map/reduce function pair must agree with the relational wordcount,
and the pipe mode must run the reference's own Hadoop-streaming-style
executors' contract (stdin lines → key\\tvalue stdout).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.aggregates import wordcount
from simple_map_reduce_spark.operators.maple_juice import (
    juice,
    juice_pipe,
    maple,
    maple_pipe,
)


def make_wc_fns():
    """Built inside a function so cloudpickle serialises them by value
    (module-level test functions aren't importable on executors)."""

    def wc_map(lines):
        # Native-style mapper ≈ executors/wordcountmap.py: tokenize,
        # partial count per split (the reference's in-dict combiner, A1).
        counts = {}
        for line in lines:
            for w in re.findall(r"\w+", line.lower()):
                counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            yield (w, str(c))

    def wc_reduce(key, values):
        # ≈ executors/Sdemo1reduce.py merge: sum partial counts per key.
        yield (key, str(sum(int(v) for v in values)))

    return wc_map, wc_reduce


def test_maple_juice_wordcount_matches_relational(spark):
    docs = spark.createDataFrame(
        [("spark maps fast",), ("fast spark Spark",), ("maps!",)], ["text"]
    )
    wc_map, wc_reduce = make_wc_fns()
    kv = maple(wc_map, docs, num_tasks=3, input_col="text")
    out = juice(wc_reduce, kv)
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    want = {r["word"]: r["cnt"] for r in wordcount(docs).collect()}
    assert got == want == {"spark": 3, "fast": 2, "maps": 2}


def test_maple_distinct_keys_contract(spark):
    """The mapper's stdout key set (Sdemo1map.py:33-34) ≡ distinct keys."""
    wc_map, _ = make_wc_fns()
    docs = spark.createDataFrame([("a b",), ("b c",)], ["text"])
    kv = maple(wc_map, docs, input_col="text")
    keys = {r["key"] for r in kv.select("key").distinct().collect()}
    assert keys == {"a", "b", "c"}


def test_juice_is_udtf_like(spark):
    """A reducer may emit 0..n rows per group (U4 duality)."""
    wc_map, _ = make_wc_fns()
    docs = spark.createDataFrame([("a a b",)], ["text"])
    kv = maple(wc_map, docs, input_col="text")

    def expand(key, values):
        if key == "b":
            return  # 0 rows
        for i in range(int(values[0])):
            yield (key, str(i))

    out = juice(expand, kv).collect()
    assert sorted((r["key"], r["value"]) for r in out) == [("a", "0"), ("a", "1")]


def test_pipe_mode_runs_external_scripts(spark, tmp_path):
    """Hadoop-streaming contract (Hdemo1* executors): external python
    process per partition, lines in, key\\tvalue out."""
    mapper = tmp_path / "map.py"
    mapper.write_text(
        "import sys, re\n"
        "for line in sys.stdin:\n"
        "    for w in re.findall(r'\\w+', line.lower()):\n"
        "        print(f'{w}\\t1')\n"
    )
    reducer = tmp_path / "reduce.py"
    reducer.write_text(
        "import sys\n"
        "cur, tot = None, 0\n"
        "def flush():\n"
        "    if cur is not None: print(f'{cur}\\t{tot}')\n"
        "for line in sys.stdin:\n"
        "    k, v = line.rstrip('\\n').split('\\t')\n"
        "    if k != cur:\n"
        "        flush(); cur, tot = k, 0\n"
        "    tot += int(v)\n"
        "flush()\n"
    )
    docs = spark.createDataFrame([("x y",), ("y z y",)], ["text"])
    kv = maple_pipe(f"python3 {mapper}", docs, num_tasks=2, input_col="text")
    out = juice_pipe(f"python3 {reducer}", kv, num_tasks=2)
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == {"x": 1, "y": 3, "z": 1}


def test_pipe_mode_ships_script_to_workers(spark, tmp_path):
    """U3 executable distribution: the script is pushed via sc.addFile and
    resolved worker-side with SparkFiles.get — the process must run the
    WORKER-LOCAL copy, not the driver path (reference leader.rs:298-308)."""
    script = tmp_path / "whereami_map.py"
    script.write_text(
        "import sys, os\n"
        "for line in sys.stdin:\n"
        "    pass\n"
        "print(f'ran_from\\t{os.path.abspath(__file__)}')\n"
    )
    docs = spark.createDataFrame([("a",), ("b",)], ["text"])
    out = maple_pipe(f"python3 {script}", docs, num_tasks=1, input_col="text").collect()
    assert len(out) == 1 and out[0]["key"] == "ran_from"
    ran_from = out[0]["value"]
    assert os.path.basename(ran_from) == "whereami_map.py"
    # proves SparkFiles resolution: the executed copy is NOT the driver file
    assert os.path.realpath(ran_from) != os.path.realpath(str(script))


def test_pipe_mode_nonzero_exit_raises(spark, tmp_path):
    script = tmp_path / "boom_map.py"
    script.write_text("import sys\nsys.exit(3)\n")
    docs = spark.createDataFrame([("a",)], ["text"])
    import pytest
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception):
        maple_pipe(f"python3 {script}", docs, num_tasks=1, input_col="text").collect()
