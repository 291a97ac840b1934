"""Named-table catalog: the engine's equivalent of the reference's SDFS
file namespace.

Reference semantics being re-expressed (SURVEY.md §2.1):
- ``put`` uploads a local file under a name, replicated 4× at random
  (``sdfs/src/client.rs:30-162``, ``leader.rs:760-827``)  → here: register
  a file/DataFrame as a named parquet-backed table (replication is the
  storage layer's job — HDFS/S3 — not the engine's).
- ``get`` downloads with replica failover (``client.rs:164-233``) → read
  the table back / export to a local file.
- ``ls`` / ``store`` list the namespace (``leader.rs:672-697``) → catalog
  listing.
- ``delete`` drops a file everywhere (``leader.rs:699-758``) → drop table.
- A "dataset" for maple/juice is a file-name *prefix*
  (``leader.rs:236-254``) → ``read_prefix`` unions all tables sharing a
  prefix (and fixes the reference's take-first-file-only quirk,
  SURVEY.md §2.6 "Limit").

Scale: tables are parquet directories — splittable, column-pruned,
predicate-pushdown-friendly. Writes go through Spark's atomic output
committer, which is what makes the reference's per-file read/write
admission actor (``leader.rs:1005-1124``) unnecessary.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Parquet-backed named-table namespace rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name: {name!r}")
        if name.endswith("__compacting"):
            # reserved for compact_bucketed's staging: a USER table with
            # this suffix would be indistinguishable from a crashed
            # compaction's scratch and silently destroyed by delete()
            raise ValueError(
                f"table name {name!r} is reserved (compact_bucketed stage)"
            )
        return os.path.join(self.root, name)

    # -- put (S1): local file or DataFrame → named table ------------------
    def put(self, source: str | DataFrame, name: str, fmt: str = "text") -> None:
        """Register data under ``name``.

        ``source`` may be a local file path (read as ``fmt``: text/csv/
        json/parquet) or an existing DataFrame. Stored as parquet.
        """
        path = self._path(name)  # validate the name before any read
        if isinstance(source, DataFrame):
            df = source
        elif fmt == "text":
            df = self.spark.read.text(source)
        elif fmt == "csv":
            df = self.spark.read.option("header", "true").csv(source)
        elif fmt == "json":
            df = self.spark.read.json(source)
        elif fmt == "parquet":
            df = self.spark.read.parquet(source)
        else:
            raise ValueError(f"unsupported format: {fmt}")
        df.write.mode("overwrite").parquet(path)

    def append(self, df: DataFrame, name: str) -> None:
        """Append rows to an existing named table (atomic per Spark's
        output committer — new part files land or they don't). The
        incremental-ingest surface (e.g. ``NearDupIndex``) grows its
        state tables through this instead of rewriting them."""
        df.write.mode("append").parquet(self._path(name))

    # -- get (S2): named table → DataFrame / local export -----------------
    def get(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def export(self, name: str, local_path: str) -> None:
        """Single-file text export (the reference's ``get <remote> <local>``).

        ``coalesce(1)`` is acceptable only because this is an explicit
        "hand me one local file" sink, never part of a distributed plan.
        """
        df = self.get(name)
        cols = df.columns
        if cols == ["value"]:
            lines = df
        else:
            from pyspark.sql import functions as F

            lines = df.select(
                F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("value")
            )
        tmp = local_path + ".spark-tmp"
        lines.coalesce(1).write.mode("overwrite").text(tmp)
        part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
        shutil.move(os.path.join(tmp, part), local_path)
        shutil.rmtree(tmp)

    # -- ls / store (S6) ---------------------------------------------------
    def ls(self) -> list[str]:
        # dot-dirs are internal scratch (e.g. a crashed compact's tmp dir)
        # — never listed, since _path() refuses to address them anyway
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith(".")
        )

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def file_count(self, name: str) -> int:
        """Number of data files in a table — the scan-task-count /
        listing-pressure signal that drives compaction policy (each
        streaming-ingest epoch appends a file set; cost grows with FILE
        count, not data size). Driver-side directory listing, no job."""
        path = self._path(name)
        if not os.path.isdir(path):
            return 0
        return sum(1 for f in os.listdir(path) if f.startswith("part-"))

    def _session_entry_is_ours(self, name: str) -> bool | None:
        """Does the session catalog hold a non-temp entry for ``name``
        whose storage location is THIS catalog's path for ``name``?
        ``None`` = no such entry. Name match alone is not enough: an
        unrelated managed table (or a second Catalog's table) may share
        the lowercased identifier, and acting on it would destroy or
        block someone else's data."""
        return self._session_entry_at(name, self._path(name))

    def _session_entry_at(self, name: str, path: str) -> bool | None:
        """Location-checked ownership probe against an explicit expected
        ``path`` (lets internal dirs like the compaction stage, which
        _path refuses to address, use the same safety rule).

        The existence probe is ``catalog.getTable`` (one point lookup),
        not ``listTables`` (r11): listing materializes a Table object
        per session entry, so its cost grows with every index/snapshot
        registration a long-lived session accumulates — measured 0.24s
        vs 6ms against a ~90-table session, and this probe runs on
        every snapshot/delete/compact. A missing table raises → None
        (no entry); a temp view with the name is not a table entry."""
        try:
            t = self.spark.catalog.getTable(name.lower())
        except Exception:
            return None
        if t.isTemporary:
            return None
        loc = None
        for r in self.spark.sql(
            f"DESCRIBE TABLE EXTENDED `{name.lower()}`"
        ).collect():
            if r.col_name == "Location":
                loc = r.data_type
                break
        if not loc:
            return False
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        return os.path.realpath(loc) == os.path.realpath(path)

    # every directory-swap operation (restore, compact, compact_bucketed)
    # parks the live dir under one of these scratch suffixes between its
    # two renames; ONE heal covers every swap path — per-op copies of the
    # idiom are how delete() once healed only restore crashes
    _SWAP_OLD_SUFFIXES = ("restore-old", "compact-old", "bcompact-old")

    def _heal_crashed_swap(self, name: str) -> None:
        """If the live dir is missing but a swap scratch dir holds the
        table's only copy (a crash between an operation's two renames),
        move it back so the table is addressable again."""
        path = self._path(name)
        if os.path.isdir(path):
            return
        for suffix in self._SWAP_OLD_SUFFIXES:
            old = os.path.join(self.root, f".{name}.{suffix}")
            if os.path.isdir(old):
                os.rename(old, path)
                return

    # -- delete (S7) ---------------------------------------------------------
    def delete(self, name: str) -> bool:
        path = self._path(name)
        # heal any crashed swap first: the table's only copy may live in
        # a scratch dir, and bailing out here would strand it (and every
        # snapshot) unreachable forever
        self._heal_crashed_swap(name)
        if not os.path.isdir(path):
            return False
        # a crashed compact_bucketed may have left its STAGE table (a
        # full data copy and/or a dangling session-catalog entry) —
        # reap it with the table it was staging for (location-checked:
        # never an unrelated table that merely shares the name)
        self._drop_stage(name)
        # a bucketed table also has session-catalog metadata; leaving it
        # behind would make a later get_bucketed() read a dangling entry.
        # Drop ONLY if the entry's location is this table's path — a
        # name-only match may be an unrelated (even managed) table whose
        # data a DROP would destroy.
        try:
            if self._session_entry_is_ours(name):
                self.spark.sql(f"DROP TABLE IF EXISTS `{name.lower()}`")
        except Exception:
            pass  # no usable session catalog — path-only table
        if os.path.isdir(path):  # DROP TABLE on an external table keeps data
            shutil.rmtree(path)
        # snapshots and crash-scratch dirs of a deleted table are
        # unreachable (every API path keys on the table name, and _path
        # refuses dot-names) — drop them too rather than leak the trees
        for v in self.versions(name):
            self._drop_snap_entry(name, v)
            shutil.rmtree(os.path.join(self.root, f".{name}.v{v}"))
        for scratch in (
            f".{name}.restore-old", f".{name}.restore-tmp",
            f".{name}.bcompact-old", f".{name}.compact-old",
            f".{name}.compact-tmp",
        ):
            sp = os.path.join(self.root, scratch)
            if os.path.isdir(sp):
                shutil.rmtree(sp)
        prefix, suffix = f".{name}.v", ".tmp"
        for d in os.listdir(self.root):  # half-built snapshot trees
            if (
                d.startswith(prefix)
                and d.endswith(suffix)
                # exact .{name}.v<digits>.tmp — a looser match would eat
                # another table's tree when names nest (t vs t.v2)
                and d[len(prefix):-len(suffix)].isdigit()
            ):
                shutil.rmtree(os.path.join(self.root, d))
        return True

    # -- snapshots (time travel for plain tables) --------------------------
    def snapshot(self, name: str) -> int:
        """Freeze the current contents of plain table ``name`` as an
        immutable numbered version; returns the version id. Pair with
        :meth:`get_version` / :meth:`restore` — the catalog's answer to
        "what did the corpus look like when we trained run N?"
        (reproducibility / audit), without copying data.

        Snapshots are HARDLINK trees (one link per parquet file):
        O(file count) regardless of data size, safe against both later
        appends (new part files are simply absent from the frozen tree)
        and table rewrites (`put`'s overwrite unlinks the live names;
        the snapshot's links keep the old inodes alive). This is the
        local-filesystem stand-in for what a table format's manifest
        snapshot does on object storage (Delta/Iceberg) — the API is
        the contract, the linking is the single-box mechanism.

        Bucketed tables: the snapshot is LAYOUT-PRESERVING (r11 — the
        manifest-snapshot behavior of a table format like Iceberg/
        Delta): the live entry's bucket spec and schema are recorded in
        a ``_bucket_spec.json`` beside the hardlinks (leading ``_`` =
        invisible to every parquet scan, like ``_SUCCESS``), and
        :meth:`get_version` re-registers the frozen tree as a bucketed
        read. Epoch-pinned readers (``streaming/ingest.py``'s keep-best
        protocol) therefore keep the bucketed tables' exchange-free
        join/aggregate plans instead of paying per-epoch corpus
        Exchanges over plain-parquet pins."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no table {name!r}")
        version = 1 + max(self.versions(name), default=0)
        snap = os.path.join(self.root, f".{name}.v{version}")
        tmp = snap + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for f in os.listdir(path):
            if f.endswith(".parquet") or f == "_SUCCESS":
                os.link(os.path.join(path, f), os.path.join(tmp, f))
        # listTables-gated: a plain/path-only table has no session entry,
        # and probing DESCRIBE on it would log a spurious analyzer error
        try:
            spec = (
                self._bucket_spec(name) if self._session_entry_is_ours(name) else None
            )
        except Exception:
            spec = None  # no usable session catalog — plain snapshot
        if spec is not None:
            import json

            cols, n_buckets = spec
            # schema from the session entry (metadata-only) — a fresh
            # parquet read here would re-list and re-footer the live dir
            schema_ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in self.spark.table(name).schema.fields
            )
            with open(os.path.join(tmp, "_bucket_spec.json"), "w") as fh:
                json.dump(
                    {
                        "bucket_cols": cols,
                        "num_buckets": n_buckets,
                        "schema_ddl": schema_ddl,
                    },
                    fh,
                )
        os.rename(tmp, snap)  # publish atomically: half-built trees are .tmp
        return version

    def versions(self, name: str) -> list[int]:
        """Published snapshot ids for ``name``, ascending."""
        self._path(name)  # validate name
        prefix = f".{name}.v"
        out = []
        for d in os.listdir(self.root):
            if d.startswith(prefix) and not d.endswith(".tmp"):
                tail = d[len(prefix):]
                if tail.isdigit():
                    out.append(int(tail))
        return sorted(out)

    def _snap_table(self, name: str, version: int) -> str:
        """Session-catalog identifier for a layout-preserving snapshot
        registration (``{name}__v{n}__snap``). Never passes through
        ``_path`` — it names a session entry over a dot-dir, not a
        table directory of its own."""
        return f"{name}__v{int(version)}__snap"

    def _drop_snap_entry(self, name: str, version: int) -> None:
        """Drop the session-catalog registration of a layout-preserving
        snapshot, if it is OURS (location-checked — an unrelated entry
        that merely shares the name is never touched). External table:
        the DROP removes metadata only, never the hardlink tree."""
        tbl = self._snap_table(name, version)
        snap = os.path.join(self.root, f".{name}.v{int(version)}")
        try:
            if self._session_entry_at(tbl, snap):
                self.spark.sql(f"DROP TABLE IF EXISTS `{tbl.lower()}`")
        except Exception:
            pass  # no usable session catalog

    def get_version(self, name: str, version: int) -> DataFrame:
        """Read a frozen snapshot of ``name``.

        A snapshot of a BUCKETED table carries its bucket spec
        (``_bucket_spec.json``, written by :meth:`snapshot`) and is
        served through a session-catalog registration of the frozen
        tree with the same CLUSTERED/SORTED BY layout — bucket ids live
        in the part-file NAMES, which hardlinking preserves — so joins
        and aggregates keyed on the bucket columns keep their
        exchange-free plans against the pin. Falls back to a plain
        parquet read (data-correct, layout-free) only when an UNRELATED
        session entry already owns the registration name."""
        snap = os.path.join(self.root, f".{name}.v{version}")
        if not os.path.isdir(snap):
            raise FileNotFoundError(f"no snapshot v{version} of {name!r}")
        spec_file = os.path.join(snap, "_bucket_spec.json")
        if os.path.isfile(spec_file):
            import json

            with open(spec_file) as fh:
                spec = json.load(fh)
            tbl = self._snap_table(name, version)
            try:
                ours = self._session_entry_at(tbl, snap)
                if ours is None:
                    cols = ", ".join(f"`{c}`" for c in spec["bucket_cols"])
                    self.spark.sql(
                        f"CREATE TABLE `{tbl.lower()}` ({spec['schema_ddl']}) "
                        f"USING PARQUET "
                        f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
                        f"INTO {int(spec['num_buckets'])} BUCKETS "
                        f"LOCATION '{snap}'"
                    )
                    ours = True
                if ours:
                    return self.spark.table(tbl)
            except Exception:
                pass  # no usable session catalog — plain read below
        return self.spark.read.parquet(snap)

    def prune_versions(self, name: str, keep_last: int = 1) -> list[int]:
        """Snapshot retention: drop all but the newest ``keep_last``
        published snapshots of ``name`` and return the pruned version
        ids. Hardlink trees are cheap but not free — one directory plus
        one inode reference per data file per snapshot, forever — so a
        table snapshotted per ingest epoch needs periodic retention,
        exactly like a table format's ``expireSnapshots``.

        Safety rules match :meth:`delete`'s: the name is validated
        through ``_path`` (so dot-names and the reserved stage suffix
        can never be addressed), only EXACT ``.{name}.v<digits>``
        published trees are touched (half-built ``.tmp`` trees belong
        to an in-flight snapshot and are left for its own cleanup or
        ``delete``), and the live table is never involved — pruning is
        metadata-only with respect to the current contents.
        :meth:`restore` / :meth:`get_version` of a pruned version then
        refuse with FileNotFoundError. Pruning drops OLDEST first, so
        the surviving max keeps :meth:`snapshot` numbering monotonic;
        only ``keep_last=0`` (drop everything) resets numbering to v1 —
        callers holding version ids across a full wipe must not expect
        them to stay unique."""
        if keep_last < 0:
            raise ValueError(f"keep_last must be >= 0, got {keep_last}")
        self._path(name)  # validate the name before touching anything
        versions = self.versions(name)
        # Clamp: keep_last may exceed the snapshot count (e.g. a keep-4
        # policy on day 3 of daily snapshots) — a negative slice bound
        # would wrap around and delete from the FRONT, destroying exactly
        # the copies the policy promised to keep.
        drop = versions[: max(0, len(versions) - keep_last)] if keep_last else versions
        for v in drop:
            self._drop_snap_entry(name, v)
            shutil.rmtree(os.path.join(self.root, f".{name}.v{v}"))
        return drop

    def drop_version(self, name: str, version: int) -> bool:
        """Drop ONE published snapshot of ``name`` (the targeted form of
        :meth:`prune_versions` — epoch-pinned readers use it to release
        exactly the versions they pinned once their epoch commits, see
        ``streaming/ingest.py``'s snapshot-isolated protocol). Returns
        whether the snapshot existed. Same safety rules as pruning: the
        name is validated, only the exact published ``.{name}.v<n>``
        tree is touched, the live table is never involved. Note
        :meth:`snapshot` numbering is max-based, so dropping the newest
        version lets its id be REUSED by the next snapshot — callers
        holding version ids across a drop must scope them (the epoch
        protocol scopes ids to one committed epoch, never reread)."""
        self._path(name)  # validate the name before touching anything
        snap = os.path.join(self.root, f".{name}.v{int(version)}")
        if not os.path.isdir(snap):
            return False
        self._drop_snap_entry(name, version)
        shutil.rmtree(snap)
        return True

    def restore(self, name: str, version: int) -> None:
        """Roll the live table back to snapshot ``version`` (the
        snapshot itself survives — restores are repeatable). Same
        rename-swap crash recovery as :meth:`compact`: the live dir is
        moved aside, a fresh hardlink tree of the snapshot is published
        in its place, then the scratch is dropped."""
        snap = os.path.join(self.root, f".{name}.v{version}")
        if not os.path.isdir(snap):
            raise FileNotFoundError(f"no snapshot v{version} of {name!r}")
        path = self._path(name)
        old = os.path.join(self.root, f".{name}.restore-old")
        tmp = os.path.join(self.root, f".{name}.restore-tmp")
        self._heal_crashed_swap(name)
        for stale in (tmp, old):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        os.makedirs(tmp)
        for f in os.listdir(snap):
            if f == "_bucket_spec.json":
                # snapshot metadata, not table data: the LIVE entry
                # keeps describing the restored table's layout (and a
                # later re-bucketing must not read a stale spec here)
                continue
            os.link(os.path.join(snap, f), os.path.join(tmp, f))
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        self.spark.catalog.refreshByPath(path)
        try:
            # a BUCKETED table is read through the session catalog, whose
            # relation cache would otherwise keep listing the pre-restore
            # part files (the same staleness class put_bucketed/
            # append_bucketed guard against)
            if self._session_entry_is_ours(name):
                self.spark.catalog.refreshTable(name)
        except Exception:
            pass  # no usable session catalog — path-only table

    # -- compaction (small-files management) -------------------------------
    def compact(self, name: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Rewrite a table into ~``target_file_bytes``-sized parquet files
        and return the new file count.

        Append-heavy tables (e.g. ``NearDupIndex``'s state tables, one
        file set per ingest) accumulate small files; at scale, scan task
        count and namenode/listing pressure grow with file count, not
        data size — periodic compaction is the standard fix. Locally the
        swap is rename-based (old dir → scratch, tmp → live, drop
        scratch), so every crash point leaves a recoverable state —
        a retried compact heals a half-swapped table; on object
        storage, production would write through a table format whose
        metadata commit provides atomicity (Delta/Iceberg).
        """
        import math

        if target_file_bytes <= 0:
            raise ValueError(f"target_file_bytes must be > 0, got {target_file_bytes}")
        try:
            # a session-catalog table with bucket metadata over THIS path
            # must not be rewritten as plain parquet: the catalog would
            # still claim bucketed filenames and every later read would
            # fail. Location-checked (same rule as delete): an unrelated
            # table that merely shares the lowercased name must not block
            # compaction of a path-only table.
            if self._session_entry_is_ours(name):
                raise ValueError(
                    f"{name!r} is registered in the session catalog (bucketed "
                    "tables keep their layout metadata there) — compact would "
                    "corrupt it; re-bucket via put_bucketed instead"
                )
        except ValueError:
            raise
        except Exception:
            pass  # no usable session catalog — path-only table, proceed
        path = self._path(name)
        old = os.path.join(self.root, f".{name}.compact-old")
        self._heal_crashed_swap(name)
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        n = max(1, math.ceil(size / target_file_bytes))
        tmp = os.path.join(self.root, f".{name}.compact-tmp")
        for stale in (tmp, old):  # scratch from a crashed earlier compact
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        self.get(name).repartition(n).write.mode("overwrite").parquet(tmp)
        # swap via rename, never delete-then-rename: a crash at any point
        # leaves either the old dir addressable or the healable
        # old-in-scratch state recovered above — the table's only copy is
        # never in a state a retry can't reach
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        # the swap happened behind Spark's back (os.rename, not a Spark
        # writer) — drop any cached plans/file listings over the old files
        self.spark.catalog.refreshByPath(path)
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    # -- bucketed tables (co-located joins) --------------------------------
    def put_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str | tuple[str, ...] | list[str],
        num_buckets: int = 32,
    ) -> None:
        """Save as a BUCKETED managed table: joins/aggregations keyed on
        the bucket column(s) between tables bucketed the same way skip
        the shuffle entirely (verified in tests/test_skew_bucket.py).
        This is the 100 TB answer to repeated fact⋈fact joins on the
        same key — pay the shuffle once at write time.

        Multi-column bucketing matters because Spark's co-partition check
        requires ALL join keys by default
        (``spark.sql.requireAllClusterKeysForCoPartition``): a table
        bucketed on a strict subset of the join keys still shuffles, so
        bucket on exactly the key tuple the hot join uses."""
        self._write_bucketed(
            df, name, self._path(name), bucket_col, num_buckets, "overwrite"
        )

    def _write_bucketed(
        self,
        df: DataFrame,
        table: str,
        path: str,
        bucket_col: str | tuple[str, ...] | list[str],
        num_buckets: int,
        mode: str,
        distribute: bool = True,
    ) -> None:
        """The one bucketed-write implementation (put/append/compaction
        stage): saveAsTable against an explicit path.

        ``distribute`` (r11) hash-repartitions the rows by the bucket
        columns into ``num_buckets`` partitions before the write.
        Spark's bucketed writer does NOT shuffle: every write task emits
        one file per bucket it holds rows for, so an unpartitioned
        T-task input writes up to T x num_buckets files per call — at
        sf0.1 a single index append measured ~1000 near-empty files,
        and every later scan/snapshot/listing pays that file count
        (guide §6: small files hurt twice). The repartition uses the
        SAME hash family as the bucket spec (Murmur3 pmod num_buckets),
        so each task holds exactly one bucket and the write emits AT
        MOST num_buckets files — the ``write.distribution-mode=hash``
        behavior of Iceberg. Cost: one exchange of exactly the rows
        being written (the batch, not the corpus). ``compact_bucketed``
        passes ``distribute=False``: its input is a coalesced read of
        the whole table and its contract bounds files at parallelism x
        buckets without a table-sized shuffle.

        The post-write refresh is needed only when the WRITER's session
        is not this catalog's session (a foreachBatch-cloned session
        invalidates only its own relation cache); a same-session
        saveAsTable already refreshes itself — verified by the
        cross-epoch visibility tests."""
        cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
        if distribute:
            from pyspark.sql import functions as F

            df = df.repartition(num_buckets, *[F.col(c) for c in cols])
        (
            df.write.mode(mode)
            .bucketBy(num_buckets, *cols)
            .sortBy(*cols)
            .option("path", path)
            .saveAsTable(table)
        )
        if df.sparkSession is not self.spark:
            self.spark.catalog.refreshTable(table)

    def _drop_stage(self, name: str) -> None:
        """Remove ``{name}__compacting`` — a compact_bucketed stage left
        by a crash — data dir AND session-catalog entry, each
        independently (a crash between the directory swap and the
        metadata drop leaves a dangling entry with no dir). The entry is
        dropped only when its location is OUR stage path: the reserved
        suffix blocks collisions through this catalog, but an externally
        created table could still share the name."""
        stage = f"{name}__compacting"
        spath = os.path.join(self.root, stage)
        try:
            if self._session_entry_at(stage, spath):
                self.spark.sql(f"DROP TABLE IF EXISTS `{stage.lower()}`")
        except Exception:
            pass  # no usable session catalog
        if os.path.isdir(spath):
            shutil.rmtree(spath)

    def append_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str | tuple[str, ...] | list[str],
        num_buckets: int = 32,
    ) -> None:
        """Append to an existing bucketed table, preserving its layout.

        Plain :meth:`append` writes unbucketed part files into the path,
        which would corrupt a bucketed table (the session catalog still
        claims bucketed filenames); the bucketed writer re-shuffles the
        appended rows into the declared buckets. Spark validates the
        spec against the existing table, so a mismatched append fails
        loudly instead of corrupting. The post-write refresh matters for
        streaming: foreachBatch hands each micro-batch a CLONED session,
        and without it the catalog session keeps serving the pre-append
        file listing — epoch N+1 would silently not see epoch N's
        admissions (tests/test_similarity.py::...cross_epoch)."""
        self._write_bucketed(
            df, name, self._path(name), bucket_col, num_buckets, "append"
        )

    def get_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed table through the session catalog (bucket
        metadata lives there, not in the parquet footers)."""
        return self.spark.table(name)

    def _bucket_spec(self, name: str) -> tuple[list[str], int] | None:
        """(bucket_columns_lowercased, num_buckets) from the session
        catalog's entry for OUR table at this name, or None when no such
        entry (path-only table / no usable session catalog). ONE
        DESCRIBE pass extracts location and bucket rows together (first
        occurrence wins, like _session_entry_is_ours)."""
        try:
            loc, n_buckets, bcols = None, None, None
            for r in self.spark.sql(
                f"DESCRIBE TABLE EXTENDED `{name.lower()}`"
            ).collect():
                if r.col_name == "Location" and loc is None:
                    loc = r.data_type
                elif r.col_name == "Num Buckets" and n_buckets is None:
                    n_buckets = int(r.data_type)
                elif r.col_name == "Bucket Columns" and bcols is None:
                    bcols = [
                        c.strip().strip("`")
                        for c in r.data_type.strip("[]").split(",")
                    ]
            if not loc or n_buckets is None or bcols is None:
                return None
            if loc.startswith("file:"):
                loc = loc[len("file:"):]
            if os.path.realpath(loc) != os.path.realpath(self._path(name)):
                return None  # someone else's table shares the name
            return ([c.lower() for c in bcols], n_buckets)
        except Exception:
            return None

    def compact_bucketed(
        self,
        name: str,
        bucket_col: str | tuple[str, ...] | list[str],
        num_buckets: int = 32,
        parallelism: int | None = None,
    ) -> int:
        """Compact an append-heavy BUCKETED table back to ~one file per
        bucket, preserving its bucket layout — the companion
        :meth:`compact` refuses bucketed tables precisely because a
        plain-parquet rewrite would orphan their session-catalog bucket
        metadata. The index state tables (``NearDupIndex``/``IvfIndex``)
        gain one file set per ingest epoch; scan task count and listing
        pressure grow with FILE count, not data size, so streaming
        ingest needs this periodically.

        Mechanism: rewrite through a STAGED bucketed table — the read is
        ``coalesce``-d to ``parallelism`` tasks (narrow, NO shuffle: the
        bucketed writer splits each task's rows into per-bucket files
        itself), bounding the new file count at parallelism × buckets
        regardless of how many epochs were appended — then swap
        directories by rename: bucket ids live in the FILE NAMES, not
        the directory, so moving the staged files under the live path
        keeps the existing catalog entry's bucket spec valid. Every
        crash point leaves a recoverable state (same argument as
        :meth:`compact`: live dir, healable old-in-scratch, or stale
        stage cleaned on retry); on object storage, production would
        stage through a table format with atomic metadata commit.

        ``parallelism`` defaults to ``num_buckets``; raise it for huge
        tables (more rewrite parallelism, proportionally more files).
        Returns the new parquet file count. The bucket spec passed here
        is VALIDATED against the session-catalog entry when one exists —
        the staged table is brand-new, so Spark itself validates nothing,
        and publishing a mismatched layout under the live entry would
        make every later bucketed join silently read wrong buckets."""
        cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
        declared = self._bucket_spec(name)
        if declared is not None and declared != ([c.lower() for c in cols], num_buckets):
            raise ValueError(
                f"bucket spec mismatch for {name!r}: table is bucketed as "
                f"{declared}, compact_bucketed was passed "
                f"({[c.lower() for c in cols]}, {num_buckets}) — a mismatched "
                "rewrite would corrupt the layout the catalog entry declares"
            )
        stage = f"{name}__compacting"
        spath = os.path.join(self.root, stage)  # reserved name: raw path
        path, old = self._path(name), os.path.join(self.root, f".{name}.bcompact-old")
        if not os.path.isdir(path):
            self._heal_crashed_swap(name)
            try:
                self.spark.catalog.refreshTable(name)
            except Exception:
                pass  # path-only table
        # ownership gate (ADVICE r6): get_bucketed reads spark.table, a
        # session-GLOBAL namespace. If an unrelated table merely shares
        # the lowercased name, _bucket_spec above returned None (its
        # location differs), the spec validation silently passed, and
        # without this check the UNRELATED table's rows would be staged
        # and rename-swapped over our live dir — silent data
        # replacement. Require a session entry that is OURS before any
        # read; a missing/foreign/unreadable entry is a refusal, never a
        # fallback (plain tables go through compact()).
        try:
            entry = self._session_entry_at(name, path)
        except Exception:
            entry = None
        if entry is None:
            raise ValueError(
                f"compact_bucketed({name!r}): no session-catalog entry at "
                f"{path!r} — the table was not written via put_bucketed "
                "(use compact() for plain tables)"
            )
        if entry is False:
            raise ValueError(
                f"compact_bucketed({name!r}): the session-catalog entry "
                "points at a different location — refusing to rewrite an "
                "unrelated table's rows into this catalog"
            )
        self._drop_stage(name)  # stale stage from a crashed earlier run
        # the stage write below is an OVERWRITE saveAsTable: it would
        # drop-and-recreate a session entry for the stage name even when
        # that entry belongs to an unrelated external table (_drop_stage
        # deliberately spared it, location-checked) — refuse instead
        try:
            stage_entry = self._session_entry_at(stage, spath)
        except Exception:
            stage_entry = None
        if stage_entry is False:
            raise ValueError(
                f"compact_bucketed({name!r}): session-catalog entry "
                f"{stage!r} exists but belongs to an unrelated table — "
                "the stage write would drop and recreate it; drop or "
                "rename that table first"
            )
        self._write_bucketed(
            self.get_bucketed(name).coalesce(parallelism or num_buckets),
            stage,
            spath,
            bucket_col,
            num_buckets,
            "overwrite",
            distribute=False,  # narrow rewrite: the coalesce IS the layout
        )
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(spath, path)
        # the staged entry's data now lives under the live path; drop its
        # metadata (location-checked; external table: DROP never touches
        # the moved data)
        self._drop_stage(name)
        shutil.rmtree(old)
        self.spark.catalog.refreshTable(name)
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    # -- dataset-as-prefix (maple/juice input resolution) ------------------
    def read_prefix(self, prefix: str) -> DataFrame:
        """Union all tables whose name starts with ``prefix``.

        The reference matched the prefix but then used only the *first*
        file (``leader.rs:253``) — a quirk documented in SURVEY.md §2.6
        that we deliberately do not replicate.
        """
        names = [n for n in self.ls() if n.startswith(prefix)]
        if not names:
            raise FileNotFoundError(f"no tables with prefix {prefix!r}")
        df = self.get(names[0])
        for n in names[1:]:
            df = df.unionByName(self.get(n), allowMissingColumns=True)
        return df
