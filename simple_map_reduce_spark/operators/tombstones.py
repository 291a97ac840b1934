"""Tombstone deletion for the standing indexes — takedown support.

A pretraining-data pipeline routinely gets removal requests (DMCA /
GDPR / contaminated-source takedowns) long after a document or vector
was admitted into the standing dedup/ANN state. The catalog can drop
whole tables (S7, ref ``sdfs/src/client.rs:235-267``), but until now
neither :class:`~.dedup.NearDupIndex` nor :class:`~.similarity.IvfIndex`
could remove a single admitted id — the only answer was a full rebuild.

This module is the shared mechanism: an append-only ``{name}__tombstones``
table of deleted ids, honored by every read path via a broadcast
anti-join, with physical purging deferred to ``vacuum()`` — the
delete-file + compaction model of the modern table formats (Iceberg
v2 position/equality deletes, Delta deletion vectors), chosen over
eager rewrite because at 100 TB a takedown of 100 ids must not rewrite
a corpus-sized table.

Design properties:

- **Deletion is O(|deleted|), crash-safe, idempotent.** ``delete(ids)``
  is ONE parquet append (atomic per Spark's output committer) of ids
  anti-joined against the existing tombstone set — a retried
  half-failed delete tops up instead of duplicating, the same healing
  shape as the ingest anti-joins (``streaming/ingest.py`` protocol).
  There is no multi-table crash window at all: one table, one append.
- **Reads pay nothing until the first delete.** The tombstone table is
  created lazily by the first ``delete``; every read path does a
  driver-side existence check (free) and skips the anti-join when the
  table has never existed. After a delete, reads pay one BROADCAST
  anti-join against the (small) tombstone set — broadcast, so no
  Exchange is ever added above the bucketed corpus scans the indexes'
  plan guarantees depend on.
- **vacuum() reconciles physical cost.** Tombstoned rows still occupy
  posting lists (scan cost) until ``vacuum()`` rewrites the state
  tables without them and drops the tombstone table LAST — every crash
  prefix of that sequence leaves the tombstones in force, so reads stay
  correct through any partial vacuum and a retry heals it.
- **Tombstone wins until vacuum.** Re-ingesting a tombstoned id is
  REFUSED (fail fast), not silently resurrected: the ingest appends
  anti-join physically-present ids, so an "accepted" tombstoned id
  would vanish — admitted by the report, invisible to every read. The
  conflict check is one broadcast semi-join over the batch ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCHEMA = "id BIGINT"


def tombstones_table(name: str) -> str:
    return f"{name}__tombstones"


def _as_id_frame(catalog, ids) -> DataFrame:
    """Normalize a list[int] / single-column DataFrame to an (id) frame."""
    if isinstance(ids, DataFrame):
        col = ids.columns[0]
        return ids.select(F.col(col).cast("bigint").alias("id")).distinct()
    return catalog.spark.createDataFrame(
        [(int(i),) for i in ids], _SCHEMA
    ).distinct()


def read_tombstones(catalog, name: str) -> DataFrame | None:
    """The (id) tombstone set, or None when no delete has ever run —
    callers skip the anti-join entirely in that case (driver-side
    existence check, no job)."""
    t = tombstones_table(name)
    if not catalog.exists(t):
        return None
    return catalog.get(t).select("id")


def live(catalog, name: str, df: DataFrame, id_col: str = "id") -> DataFrame:
    """``df`` minus tombstoned ids — a BROADCAST anti-join (the
    tombstone set is takedown-sized, not corpus-sized), so no Exchange
    is added above a bucketed scan of ``df``. No-op (plan-identical)
    when no delete has ever run."""
    ts = read_tombstones(catalog, name)
    if ts is None:
        return df
    if id_col == "id":
        return df.join(F.broadcast(ts), "id", "left_anti")
    return df.join(
        F.broadcast(ts.select(F.col("id").alias(id_col))), id_col, "left_anti"
    )


def append_tombstones(catalog, name: str, ids) -> int:
    """Record ``ids`` as deleted; returns how many were NEWLY
    tombstoned. Idempotent: already-tombstoned ids are anti-joined away,
    so a crashed-and-retried delete converges instead of duplicating.
    The write is one atomic parquet append (or the initial table put)."""
    t = tombstones_table(name)
    frame = _as_id_frame(catalog, ids)
    if catalog.exists(t):
        fresh = frame.join(catalog.get(t), "id", "left_anti").localCheckpoint()
        n = fresh.count()
        if n:
            catalog.append(fresh, t)
        return n
    # first delete ever: create the table (overwrite of a non-existent
    # path — atomic publish via Spark's committer). A no-op delete([])
    # must NOT create it: an empty tombstone table would permanently
    # switch every read off the free exists() fast path (ADVICE r8).
    frame = frame.localCheckpoint()
    n = frame.count()
    if n:
        catalog.put(frame, t)
    return n


def refuse_tombstoned(catalog, name: str, batch_ids: DataFrame) -> None:
    """Fail-fast gate for ingest: raise if any batch id is tombstoned.
    A tombstoned id cannot be re-admitted until :meth:`vacuum` purges it
    physically — the ingest appends anti-join physically-PRESENT ids, so
    a tombstoned id would be reported accepted yet stay invisible to
    every read (the worst failure mode: silent data loss). One broadcast
    semi-join over the (small) batch-id set; zero cost when no delete
    has ever run."""
    ts = read_tombstones(catalog, name)
    if ts is None:
        return
    col = batch_ids.columns[0]
    hits = (
        batch_ids.join(
            F.broadcast(ts.select(F.col("id").alias(col))), col, "left_semi"
        )
        .limit(5)
        .collect()
    )
    if hits:
        shown = sorted(r[0] for r in hits)
        raise ValueError(
            f"batch contains tombstoned id(s) {shown} — a deleted id "
            f"cannot be re-admitted until vacuum() physically purges it "
            f"(tombstone wins until vacuum; see operators/tombstones.py)"
        )


def drop_tombstones(catalog, name: str) -> None:
    """Remove the tombstone table — the LAST step of ``vacuum()``, after
    every state table has been rewritten without the tombstoned ids.
    Ordering is the crash-safety argument: any prefix of vacuum leaves
    this table in place, so the anti-join keeps every read correct."""
    catalog.delete(tombstones_table(name))
