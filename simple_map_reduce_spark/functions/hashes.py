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
- ``minhash_mix(h, i)``       — the i-th permutation of one 60-bit
  content hash: two affine rounds mod 2^61-1 with xor-shift avalanche
  between and after (min-wise independence the single affine round
  lacks — see the function docstring). ONE md5 per row feeds all k
  MinHash permutations (k seeded md5s would be ~k× the hash work on the
  dominant stage of LSH dedup); the split-multiply keeps every
  intermediate < 2^62, so the arithmetic is exact signed-64 in Spark
  AND DuckDB (which raises on int64 overflow rather than wrapping).

These are content hashes for *algorithms* (MinHash, SimHash, LSH,
fingerprinting), not cryptography.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_BITS = 60

# MinHash FAMILY version, persisted by hash-derived standing indexes
# (``NearDupIndex.build`` writes it to ``{name}__meta``) and validated
# on every read that bands NEW text against STORED buckets. The r9
# family migration (single affine round → two-round avalanche, see
# :func:`minhash_mix`) changed every band_hash value: an index built
# under the old family and read with the new code would get ~zero
# collisions and silently report near-dups as novel (silent recall
# collapse — ADVICE r9 medium). Bump this whenever minhash_mix /
# md5_long60 / the band fold change incompatibly; readers of a
# mismatched index fail fast and direct the caller to rebuild.
#   v1 = single affine round (rounds 1–8); v2 = two-round avalanche (r9+)
HASH_FAMILY_VERSION = 2

# (a*hi + b*lo + c) mod p universal-hash family for MinHash permutations.
# p = 2^61-1 (Mersenne prime); a,b,c are fixed PUBLIC 30-bit odd constants
# from one LCG step — arbitrary but reproducible parameters, inlined as
# literals into the DuckDB oracle. With hi,lo < 2^30 and a,b < 2^30 every
# product stays < 2^60 and the 3-term sum < 2^62: exact in signed 64-bit.
MINHASH_PRIME = (1 << 61) - 1
_MH_SPLIT = 1 << 30


def _mh_const(i: int, salt: int) -> int:
    return ((1103515245 * (3 * i + salt) + 12345) & (_MH_SPLIT - 1)) | 1


def minhash_params(i: int) -> tuple[int, int, int]:
    """Fixed public (a_i, b_i, c_i) for the i-th MinHash permutation
    (round 1 of the two-round avalanche mix)."""
    return _mh_const(i, 1), _mh_const(i, 2), _mh_const(i, 3)


def minhash_params2(i: int) -> tuple[int, int, int]:
    """Fixed public (a2_i, b2_i, c2_i) — round 2 of the avalanche mix
    (disjoint salt range from :func:`minhash_params`)."""
    return _mh_const(i, 4), _mh_const(i, 5), _mh_const(i, 6)


def minhash_mix(h: Column, i: int) -> Column:
    """The i-th MinHash permutation value of a 60-bit content hash:
    TWO affine rounds mod 2^61-1 with xor-shift avalanche between and
    after them —

        u = (a_i·hi + b_i·lo + c_i) mod p
        v = u ⊕ (u >> 31)
        w = (a2_i·(v >> 30) + b2_i·(v & m30) + c2_i) mod p
        out = w ⊕ (w >> 29)

    WHY two rounds (r9 family migration): the single affine round is
    2-universal but NOT min-wise independent — the per-permutation
    argmin concentrates on shingles whose (hi, lo) halves sit on the
    lower convex hull of the point set, so effective permutation
    diversity is bounded by the hull size and small shingle sets can
    have ONE shingle win every permutation (measured: a true-J=0.4 pair
    with 0/48 single-row-band agreements where theory expects ~19). The
    xor-shift between rounds breaks the linear order structure; the
    same J=0.4 pair reads 18/48 and 24/48 under this mix, and the mean
    (agreement-rate − true-J) bias over random small sets drops from
    −3.5pp to +0.7pp. Every intermediate stays < 2^62 (u, v < 2^61;
    v>>30 < 2^31 × a2 < 2^30 keeps round 2's sum < 2^62): exact signed
    64-bit on both engines, no overflow even under ANSI mode.

    The migration moved ALL minhash-derived registry rows through the
    r9 verification window in one coordinated family+twin change — the
    DuckDB twin (:func:`duckdb_minhash_mix`) is generated from the SAME
    constants, so every parity row still compares like with like."""
    a, b, c = minhash_params(i)
    a2, b2, c2 = minhash_params2(i)
    hi = F.shiftright(h, 30)
    lo = h.bitwiseAND(F.lit(_MH_SPLIT - 1))
    u = (F.lit(a) * hi + F.lit(b) * lo + F.lit(c)) % F.lit(MINHASH_PRIME)
    v = u.bitwiseXOR(F.shiftright(u, 31))
    w = (
        F.lit(a2) * F.shiftright(v, 30)
        + F.lit(b2) * v.bitwiseAND(F.lit(_MH_SPLIT - 1))
        + F.lit(c2)
    ) % F.lit(MINHASH_PRIME)
    return w.bitwiseXOR(F.shiftright(w, 29))


def duckdb_minhash_mix(h_expr: str, i: int) -> str:
    """DuckDB SQL twin of :func:`minhash_mix` (h_expr must be 0..2^60).

    The multiplier literals are cast to BIGINT explicitly: if ``h_expr``
    ever types as INT32 (e.g. a small literal), DuckDB would otherwise
    evaluate the products in INT32 and raise an overflow error. The
    textual expansion nests (out references w twice, w references v
    twice, v references u twice), which only duplicates integer ops on
    the oracle side — DuckDB's shift/&/xor semantics on non-negative
    BIGINTs match Spark's shiftright/bitwiseAND/bitwiseXOR exactly."""
    a, b, c = minhash_params(i)
    a2, b2, c2 = minhash_params2(i)
    u = (
        f"((CAST({a} AS BIGINT) * ({h_expr} // {_MH_SPLIT})"
        f" + CAST({b} AS BIGINT) * ({h_expr} % {_MH_SPLIT})"
        f" + {c}) % {MINHASH_PRIME})"
    )
    v = f"xor({u}, {u} >> 31)"
    w = (
        f"((CAST({a2} AS BIGINT) * ({v} >> 30)"
        f" + CAST({b2} AS BIGINT) * ({v} & {_MH_SPLIT - 1})"
        f" + {c2}) % {MINHASH_PRIME})"
    )
    return f"xor({w}, {w} >> 29)"


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


def md5_slice_embedding(col: Column | str, dims: int = 8) -> Column:
    """Deterministic pseudo-embedding of a text column: ONE md5 per row,
    component *j* = 1 + int(hex_digest[4j : 4j+4], 16) as double — the
    md5-derived feature-vector idiom of ``multimodal._fake_dims``,
    expressed as pure Catalyst expressions (no UDF) so an independent
    SQL engine reproduces it byte-for-byte. ``dims`` ≤ 8 (32 hex chars /
    4). Components are 1..65536: all-positive, so the norm is always
    > 0 and every cosine is well-defined. This is the oracle-twinnable
    stand-in for a learned embedding — the ANN plumbing (chunk ids,
    quantizer, posting lists, rollup) is what it exists to exercise.
    """
    if not 1 <= dims <= 8:
        raise ValueError(f"dims must be 1..8 (32 hex chars / 4), got {dims}")
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c)
    return F.array(
        *[
            (
                F.conv(F.substring(h, 1 + 4 * j, 4), 16, 10).cast("bigint")
                + F.lit(1)
            ).cast("double")
            for j in range(dims)
        ]
    )


def duckdb_md5_slice_embedding(expr: str, dims: int = 8) -> str:
    """DuckDB SQL twin of :func:`md5_slice_embedding` (a DOUBLE[] list
    literal of the same hex-slice components)."""
    comps = ", ".join(
        f"CAST(CAST(('0x' || substr(md5({expr}), {1 + 4 * j}, 4)) AS BIGINT)"
        f" + 1 AS DOUBLE)"
        for j in range(dims)
    )
    return f"[{comps}]"
