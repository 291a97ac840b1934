"""Skew-mitigation utilities for hot-key workloads.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two patterns AQE can't fix:

- **salted_aggregation** — a single hot group overwhelming one reducer:
  aggregate in two rounds, first on (key, salt) — spreading the hot key
  over N partitions — then merge the partials. Correct for any
  decomposable aggregate (sum/count/min/max).
- **salted_broadcast_left** — joining a skewed fact against a dimension
  too big to broadcast *whole* but fine replicated N×: replicate the dim
  once per salt so each salted fact partition finds its match locally.

Both are deliberate space/shuffle trades; use when key-frequency stats
(or an AQE skew warning) show a hot key, not by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, salts: int = DEFAULT_SALTS, col_name: str = "_salt") -> DataFrame:
    """Append a uniform random salt column in [0, salts). Salt assignment
    does not need to be deterministic — only the post-merge result is."""
    return df.withColumn(col_name, (F.rand(seed=42) * salts).cast("int"))


def salted_aggregation(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, tuple[str, Column]],
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-round aggregation: groupBy(keys + salt) → groupBy(keys).

    ``agg_exprs`` maps output column → (merge_fn_name, partial_expr),
    e.g. ``{"cnt": ("sum", F.count("*")), "mx": ("max", F.max("v"))}``.
    The merge function must be the aggregate's own combiner (sum for
    count/sum, min for min, max for max).
    """
    partial = (
        with_salt(df, salts)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(f"__p_{name}") for name, (_, expr) in agg_exprs.items()])
    )
    merged = partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge)(F.col(f"__p_{name}")).alias(name)
            for name, (merge, _) in agg_exprs.items()
        ]
    )
    return merged


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    once per salt value, join on (key, salt). The hot fact key spreads
    over ``salts`` partitions instead of landing on one reducer."""
    salted_fact = with_salt(fact, salts)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
    )
    return joined.drop("_salt")
