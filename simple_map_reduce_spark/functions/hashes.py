"""Portable deterministic hashing primitives.

Every dedup/similarity operator needs hashes that an independent SQL
engine (the DuckDB oracle) can reproduce exactly. Spark's native
``xxhash64``/``hash`` have no DuckDB equivalent, so all content hashing
here goes through **md5**, which both engines expose with identical
lowercase-hex output:

- ``md5_hex(col)``            — 128-bit hex string; lexicographic min of
  these is a valid MinHash permutation surrogate (seeded by prefixing).
- ``md5_long60(col)``         — first 15 hex chars parsed as a 60-bit
  non-negative BIGINT (DuckDB twin: ``('0x' || substr(md5(x),1,15))::BIGINT``).
  60 bits keeps the value positive in a signed 64-bit int on both engines.

These are content hashes for *algorithms* (MinHash, SimHash, LSH,
fingerprinting), not cryptography.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_BITS = 60


def md5_hex(col: Column | str, seed: int | None = None) -> Column:
    """Lowercase-hex md5; with ``seed``, a seeded family member obtained by
    prefixing ``"{seed}|"`` (the standard trick for simulating independent
    permutations in MinHash)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.md5(c)


def md5_long60(col: Column | str, seed: int | None = None) -> Column:
    """60-bit non-negative BIGINT hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(md5_hex(col, seed), 1, 15), 16, 10).cast("bigint")


def duckdb_md5_hex(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL twin of :func:`md5_hex` (for oracle construction)."""
    inner = f"concat('{seed}|', {expr})" if seed is not None else expr
    return f"md5({inner})"


def duckdb_md5_long60(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL twin of :func:`md5_long60`."""
    return f"CAST(('0x' || substr({duckdb_md5_hex(expr, seed)}, 1, 15)) AS BIGINT)"
