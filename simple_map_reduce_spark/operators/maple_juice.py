"""The generic maple/juice (map/reduce) surface — the reference's defining
feature (SURVEY.md §2.8).

Reference contract:
- ``maple <script> <num_tasks> <prefix> <input> <args...>``
  (``README.md:84-93``): the leader line-splits the input over workers
  (``leader.rs:357-399``); each worker runs the user's Python script
  against its split (``server.rs:371-387``); the script emits
  ``(key, value)`` pairs as one file per key plus the distinct key set on
  stdout (``executors/Sdemo1map.py:27-34``).
- ``juice <script> <num_tasks> <prefix> <out>`` (``README.md:95-103``):
  keys are range-partitioned over workers (``leader.rs:562-583``); each
  worker folds its key-groups and appends output lines to one file
  (``server.rs:437-515``).

Spark realisation: a keyed DataFrame ``(key string, value string)``
replaces the file-per-key encoding; the shuffle replaces the push/append
machinery (``server.rs:410-428``, ``517-563``); ``mapInPandas`` /
``applyInPandas`` carry the user Python. Two function styles are offered:

- *native* (≈ ``Sdemo1*`` executors): plain Python generators over lines /
  key-groups, Arrow-batched.
- *pipe* (≈ ``Hdemo1*`` Hadoop-streaming executors): a literal external
  command consuming ``key\\tvalue`` lines on stdin, one partition per
  process, via ``rdd.pipe`` — byte-compatible with the reference's
  stdin/stdout scripts.

Scale: Arrow batches (not row-at-a-time) cross the Python boundary; the
shuffle between maple and juice is Spark's own (sort-based, spillable);
``num_tasks`` maps to an explicit ``repartition`` only when the caller
asks — by default the existing partitioning (file splits) is reused, and
AQE sizes the reduce side.
"""

from __future__ import annotations

import os
import shlex
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KV_SCHEMA = "key string, value string"

MapFn = Callable[..., Iterable[tuple[str, str]]]
ReduceFn = Callable[..., Iterable[tuple[str, str]]]


def maple(
    map_fn: MapFn,
    df: DataFrame,
    num_tasks: int | None = None,
    args: tuple = (),
    input_col: str | None = None,
) -> DataFrame:
    """Map phase: ``map_fn(lines, *args)`` runs once per partition over an
    iterator of line strings and yields ``(key, value)`` pairs.

    Returns a ``(key, value)`` DataFrame — the engine-visible form of the
    reference's ``{prefix}_{key}`` file set. Distinct keys (the script's
    stdout contract, ``Sdemo1map.py:33-34``) are ``result.select('key')
    .distinct()``.
    """
    col = input_col or df.columns[0]
    src = df.select(F.col(col).cast("string").alias("value"))
    if num_tasks:
        src = src.repartition(num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def lines() -> Iterator[str]:
            for pdf in batches:
                yield from pdf["value"]

        out = list(map_fn(lines(), *args))
        if out:
            yield pd.DataFrame(out, columns=["key", "value"])

    return src.mapInPandas(run, schema=KV_SCHEMA)


def juice(
    reduce_fn: ReduceFn,
    keyed: DataFrame,
    num_tasks: int | None = None,
    args: tuple = (),
) -> DataFrame:
    """Reduce phase: ``reduce_fn(key, values, *args)`` runs once per key
    group and yields ``(key, value)`` output pairs (0..n per group — the
    UDAF/UDTF duality of SURVEY.md §2.8 U4).

    The reference's ``delete`` flag is parsed but never consumed
    (``messages.proto:94`` vs ``leader.rs:476-635``) — documented dead
    parameter, not reproduced. ``num_tasks`` is advisory only: Spark's
    hash shuffle + AQE replace the leader's contiguous key-range chunking
    (``leader.rs:562-583``).
    """
    if num_tasks:
        keyed = keyed.repartition(num_tasks, "key")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        out = list(reduce_fn(key, list(pdf["value"]), *args))
        return pd.DataFrame(out, columns=["key", "value"])

    return keyed.groupBy("key").applyInPandas(fold, schema=KV_SCHEMA)


def _find_script(command: str) -> str | None:
    """First token of ``command`` that names an existing local file — the
    executor script to ship (the reference leader pushes the executable
    to every worker before the phase starts, ``leader.rs:298-308``)."""
    try:
        tokens = shlex.split(command)
    except ValueError:
        return None
    for tok in tokens:
        if os.path.isfile(tok):
            return tok
    return None


def _pipe_partition(
    lines: Iterator[str], command: str, script: str | None
) -> Iterator[str]:
    """Executor-side pipe: stream a partition's lines through an external
    command. When ``script`` was shipped via ``sc.addFile``, its driver
    path in ``command`` is rewritten to the worker-local copy
    (``SparkFiles.get``) — the script need not pre-exist on workers.
    Streaming stdin/stdout via a feeder thread: no partition-sized buffer
    on either side (the ``rdd.pipe`` shape, kept for the shipped path)."""
    import subprocess
    import threading

    cmd = command
    if script is not None:
        from pyspark import SparkFiles

        cmd = command.replace(script, SparkFiles.get(os.path.basename(script)))
    proc = subprocess.Popen(
        cmd, shell=True, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True
    )

    def feed() -> None:
        try:
            for line in lines:
                proc.stdin.write(line + "\n")
        finally:
            proc.stdin.close()

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    for out_line in proc.stdout:
        yield out_line.rstrip("\n")
    t.join()
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"pipe command failed with exit code {rc}: {cmd}")


def _piped_rdd(str_rdd, command: str, ship: bool):
    """Common pipe execution: ship the script (if one is named and
    shipping is on) and stream each partition through the command."""
    script = _find_script(command) if ship else None
    if script is not None:
        str_rdd.context.addFile(script)
    return str_rdd.mapPartitions(
        lambda it, c=command, s=script: _pipe_partition(it, c, s)
    )


def maple_pipe(
    command: str,
    df: DataFrame,
    num_tasks: int | None = None,
    input_col: str | None = None,
    ship: bool = True,
) -> DataFrame:
    """Script-compatibility map phase: pipe each partition's lines through
    an external command (Hadoop-streaming contract of the ``Hdemo1*``
    executors: lines on stdin → ``key\\tvalue`` lines on stdout,
    ``executors/Hdemo1map.py:12-18``).

    ``ship=True`` (default) distributes the command's script file to every
    worker via ``sc.addFile`` and resolves it worker-side — the U3
    executable-distribution contract (``leader.rs:298-308``). On a real
    cluster the script therefore only needs to exist on the driver."""
    col = input_col or df.columns[0]
    src = df.select(F.col(col).cast("string").alias("value"))
    if num_tasks:
        src = src.repartition(num_tasks)
    piped = _piped_rdd(src.rdd.map(lambda r: r["value"]), command, ship)
    return piped.map(_split_tab).toDF(KV_SCHEMA)


def juice_pipe(
    command: str,
    keyed: DataFrame,
    num_tasks: int | None = None,
    ship: bool = True,
) -> DataFrame:
    """Script-compatibility reduce phase: key-sorted ``key\\tvalue`` lines on
    stdin (the sorted-shuffle idiom ``Hdemo1reduce.py:13-24`` assumes),
    partitioned so a key never spans two processes. Scripts ship to
    workers exactly like :func:`maple_pipe`."""
    n = num_tasks or keyed.rdd.getNumPartitions()
    sorted_kv = (
        keyed.repartition(n, "key")
        .sortWithinPartitions("key")
        .rdd.map(lambda r: f"{r['key']}\t{r['value']}")
    )
    return _piped_rdd(sorted_kv, command, ship).map(_split_tab).toDF(KV_SCHEMA)


def _split_tab(line: str) -> tuple[str, str]:
    k, _, v = line.partition("\t")
    return (k, v)
