"""Join operators.

Reference parity (SURVEY.md §2.5, J1): the SQL layer declares
``SELECT ALL FROM d1 d2 WHERE d1.f1 = d2.f2`` — an inner equi-join compiled
to two map stages + one reduce stage (``client.rs:523-541``,
``main.rs:297-299``). The executors (``joinmap.py``/``joinreduce.py``) are
*missing from the reference repo* (``client.rs:526,531``), so this module
implements the declared-but-unshipped capability.

Scale:
- The physical strategy is left to Catalyst + AQE: sort-merge for
  large×large, dynamically converted to broadcast-hash when one side is
  below the threshold, skew-split by AQE.
- ``broadcast_hint=True`` forces a broadcast for known-small dimensions
  (nation/region-sized) — kills the shuffle entirely.
- Column collisions are disambiguated with table prefixes so downstream
  consumers (and the duckdb oracle) see stable names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_right: bool = False,
    prefixes: tuple[str, str] | None = None,
) -> DataFrame:
    """Inner (default) equi-join of two datasets on one column each —
    the reference's second SQL statement. Returns all columns of both
    sides; colliding names get ``{prefix}_`` disambiguation."""
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, left[left_on] == r[right_on], how)

    overlap = set(left.columns) & set(right.columns)
    if overlap:
        lp, rp = prefixes or ("l", "r")
        cols = [
            left[c].alias(f"{lp}_{c}") if c in overlap else left[c] for c in left.columns
        ] + [
            right[c].alias(f"{rp}_{c}") if c in overlap else right[c]
            for c in right.columns
        ]
        joined = joined.select(*cols)
    return joined
