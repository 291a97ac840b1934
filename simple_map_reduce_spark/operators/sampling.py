"""Deterministic sampling operators.

Training-data pipelines mix corpora with per-source keep rates ("100% of
en, 25% of de, …"). Two properties matter at 100 TB:

- **Determinism**: membership must be a pure function of the record key —
  never ``rand()`` — so re-runs, retried tasks, and different engines
  produce the same split (the DuckDB oracle reproduces it exactly).
- **Zero shuffle**: the decision is a per-row Catalyst expression
  (md5 → 60-bit int → threshold compare) evaluated at the scan inside
  WholeStageCodegen; filters compose with pushdown on other predicates.

The reference has no sampling surface (its only filter is a regex,
``executors/selectmap.py:4-19``); this is [EXT] north-star scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import md5_hex, md5_long60

_DENOM = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, denom: int = _DENOM) -> Column:
    """Uniform pseudo-random bucket in [0, denom), stable across engines."""
    return md5_long60(key.cast("string")) % denom


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = _DENOM,
) -> DataFrame:
    """Keep each row with its stratum's rate: rows whose key hashes below
    ``rate * denom`` survive. Strata not in ``rates`` fall back to
    ``default_rate`` (0.0 = drop unlisted strata — the safe default for
    corpus mixing, where an unknown source should not leak in).
    """
    # round, don't truncate: int(0.29 * 10000) is 2899 under binary float
    # representation error — the threshold must match the intended rate
    threshold: Column | None = None
    for value, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(value)
        t = F.lit(int(round(rate * denom)))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    fallback = F.lit(int(round(default_rate * denom)))
    threshold = fallback if threshold is None else threshold.otherwise(fallback)
    return df.filter(hash_bucket(F.col(key_col), denom) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    denom: int = _DENOM,
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets exactly
    one split label from the same engine-stable hash bucket the samplers
    use — re-runs, retried tasks, and later incremental batches all land
    identically, and adding documents never reassigns existing ones (the
    property that keeps eval sets frozen as the corpus grows).

    ``splits`` maps label → fraction (must sum to 1); labels are
    assigned by cumulative threshold in the given order. Per-row
    Catalyst CASE at the scan — zero shuffle, no UDF.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), denom)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for label, frac in items[:-1]:
        acc += frac
        cond = bucket < F.lit(int(round(acc * denom)))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def shuffle_positions(
    df: DataFrame,
    key_col: str,
    pos_col: str = "shuffle_pos",
    shard_hex_chars: int = 2,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic corpus shuffle: assign every row its 0-based
    position in the pseudo-random global order ``ORDER BY md5(key), key``
    — the "shuffle the corpus once before training" step, reproducible
    across re-runs, retries, and engines (no ``rand()``).

    A naive ``row_number() OVER (ORDER BY md5)`` is ONE total sort on a
    single partition — the same scale-killer the sharded sequence packer
    avoids (operators/packing.py). Same two-level cure, keyed by the hash
    itself: the shard is the first ``shard_hex_chars`` hex chars of the
    md5 (256 shards by default — raise to 3–4 chars at 100 TB), so
    global order == (shard asc, key asc) exactly and every sort is a
    bounded per-shard partition. Shard row-counts (|shards| rows, KBs)
    get an exclusive prefix sum on a single tiny partition and are
    **broadcast** back; ``pos = shard_offset + local_rank``. Nothing in
    the plan sorts more than one shard's rows in one task.

    Contract: ``key_col`` is the row's identity (a doc id) — it must be
    NON-NULL (enforced scan-locally below: a NULL key would hash to a
    NULL shard and silently vanish in the offsets join) and UNIQUE
    (documented, not scanned for: duplicate keys tie on the full sort
    key, making their relative order partition-dependent — there is no
    deterministic order between indistinguishable rows).

    ``group_cols`` restarts the position at 0 WITHIN each group (e.g. a
    curriculum stage): the per-shard windows and the prefix-summed
    offsets are simply keyed by (group, shard) instead of (shard) — the
    offsets frame stays tiny (|groups|·|shards| rows) and broadcast, and
    no partition ever holds more than one (group, shard)'s rows, so a
    3-group corpus never degenerates into 3 giant sort partitions.
    Group values must be NON-NULL, enforced scan-locally like the key:
    the offsets join is an equi-join on the group columns, and a NULL
    group value would silently drop its rows there.
    """
    groups = list(group_cols or [])
    for g in groups:
        df = df.withColumn(
            g,
            F.when(F.col(g).isNotNull(), F.col(g)).otherwise(
                F.raise_error(
                    F.lit(
                        f"shuffle_positions: NULL group column {g} — a NULL "
                        "group would silently vanish in the offsets join"
                    )
                )
            ),
        )
    keyed = df.withColumn(
        "_skey",
        md5_hex(
            F.when(
                F.col(key_col).isNotNull(), F.col(key_col).cast("string")
            ).otherwise(
                F.raise_error(
                    F.lit(f"shuffle_positions: NULL {key_col} — the shuffle "
                          "key is the row's identity and must be non-null")
                )
            )
        ),
    )
    # lowercase-hex prefix ordering == full-key ordering (hex chars are
    # ascii-ordered), so range-sharding by prefix preserves global order
    keyed = keyed.withColumn(
        "_shard", F.conv(F.substring("_skey", 1, shard_hex_chars), 16, 10).cast("int")
    )
    w_local = Window.partitionBy(*groups, "_shard").orderBy("_skey", key_col)
    local = F.row_number().over(w_local) - F.lit(1)
    counts = keyed.groupBy(*groups, "_shard").agg(F.count("*").alias("_n"))
    # |groups|·|shards| rows only — the offsets window is over KBs
    w_off = (
        Window.partitionBy(*groups) if groups else Window
    ).orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        *groups,
        "_shard",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("bigint").alias("_off"),
    )
    return (
        keyed.withColumn("_local", local)
        .join(F.broadcast(offsets), [*groups, "_shard"])
        .withColumn(pos_col, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_skey", "_shard", "_local", "_off")
    )
