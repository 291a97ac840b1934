"""Tracked persistence: operator-internal caches with a release hook.

Several operators persist shared intermediates (LSH shingle sets, band
buckets, SimHash signatures, the q15/q20/q21 pair aggregates) because
Catalyst does not reuse an exchange across an aggregation boundary — the
persist is what keeps the 100 TB fact scan single-pass. Those caches must
outlive the operator call (the returned DataFrame reads them lazily), so
the operator cannot unpersist them itself; left alone they accumulate in
executor storage across queries in a long-lived session.

``tracked_persist`` registers every such cache; ``release_tracked``
unpersists all of them once the caller has materialized its results.
Harnesses call it between queries (bench.py does; ``spark.catalog
.clearCache()`` is the blunter equivalent). MEMORY_AND_DISK everywhere:
spills, never OOMs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# strong refs on purpose: the operator's local variable dies when it
# returns, but the JVM-side cache lives until unpersisted — a weakref
# would lose the only handle able to release it
_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_tracked`."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Unpersist ONE tracked cache early (an operator that knows its
    caches are dead — e.g. after an eager checkpoint — releases them
    itself instead of waiting for the harness sweep)."""
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def release_tracked() -> int:
    """Unpersist every tracked cache (non-blocking); returns the count."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return released
