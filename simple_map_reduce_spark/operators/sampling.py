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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import md5_long60

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
