"""Sequence packing [EXT]: concatenate-and-chunk layout for pretraining.

Documents are laid head-to-tail per group (language) in id order and cut
into fixed ``chunk_tokens`` context windows; each document gets the
window index where it starts and its offset inside that window. The core
primitive is an **exclusive prefix sum** of token counts per group.

Two physical forms with IDENTICAL output:

- :func:`chunk_assignment` — one window per group
  (``partitionBy(group).orderBy(id)``). Correct, single shuffle, and the
  form a SQL oracle can twin directly — but each group is ONE sorted
  partition, so at 100 TB the dominant language is a corpus-sized
  single-task sort. Verification tier.
- :func:`chunk_assignment_sharded` — the scale tier (SCALE.md's
  two-level shape, now code): ids are RANGE-sharded (``shard = id DIV
  span``; ranges, not hash-mod, so concatenation order is preserved and
  the unsharded form stays a bit-exact oracle twin), the prefix sum runs
  per ``(group, shard)`` — every sort is bounded by ``span`` rows — and
  the per-shard token totals (|groups|·|shards| rows, KBs) get their own
  exclusive prefix sum and are **broadcast** back as shard offsets.
  ``global_start = shard_offset + local_start`` exactly. No partition
  anywhere in the plan scales with corpus size; plan-pinned in
  tests/test_plans.py.

At 1000 executors: span sizes the unit of sort parallelism — pick it so
``span`` docs of the hottest group fit one task (e.g. 1e6). The offsets
frame stays driver-broadcastable up to millions of shards (16 B/row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_TOKENS = 512


def _groups(group_col: str | Sequence[str]) -> list[str]:
    """``group_col`` accepts one name or several (e.g. ``("lang",
    "split")`` to pack each training split separately)."""
    return [group_col] if isinstance(group_col, str) else list(group_col)


def _finish(sized: DataFrame, start, chunk_tokens: int, out_cols: list[str]) -> DataFrame:
    """start → (chunk_id, chunk_offset) via exact integer arithmetic
    (bigint DIV, never double division — see queries_ext chunk notes)."""
    return (
        sized.withColumn("_start", start)
        .select(
            *out_cols,
            F.expr(f"_start DIV {chunk_tokens}").alias("chunk_id"),
            (F.col("_start") % chunk_tokens).alias("chunk_offset"),
        )
    )


def chunk_assignment(
    sized: DataFrame,
    group_col: str | Sequence[str] = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
) -> DataFrame:
    """Single-window form: exclusive prefix sum per group. Oracle tier —
    one sorted partition per group (see module doc)."""
    groups = _groups(group_col)
    w = (
        Window.partitionBy(*groups)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    return _finish(sized, start, chunk_tokens, [id_col, *groups, tokens_col])


def chunk_assignment_sharded(
    sized: DataFrame,
    group_col: str | Sequence[str] = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    span: int = 1_000_000,
) -> DataFrame:
    """Two-level form: per-(group, shard) local prefix sums + broadcast
    cumulative shard offsets. Output identical to :func:`chunk_assignment`
    (range shards preserve id order within each group)."""
    groups = _groups(group_col)
    sharded = sized.withColumn(
        "_shard", F.expr(f"CAST({id_col} AS BIGINT) DIV {span}")
    )
    # level 1: bounded local sort — every window partition holds ≤ span ids
    w_local = (
        Window.partitionBy(*groups, "_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(tokens_col).over(w_local), F.lit(0)).cast("bigint")
    # level 2: exclusive prefix sum over the TINY per-shard totals (this
    # per-group single-partition window is over |shards| rows, not docs)
    totals = sharded.groupBy(*groups, "_shard").agg(
        F.sum(tokens_col).cast("bigint").alias("_shard_tokens")
    )
    w_off = (
        Window.partitionBy(*groups)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *groups,
        "_shard",
        F.coalesce(F.sum("_shard_tokens").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("_offset"),
    )
    start = (F.col("_offset") + F.col("_local")).cast("bigint")
    return _finish(
        sharded.withColumn("_local", local).join(
            F.broadcast(offsets), [*groups, "_shard"]
        ),
        start,
        chunk_tokens,
        [id_col, *groups, tokens_col],
    )
