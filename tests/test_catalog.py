from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def test_put_get_ls_delete_roundtrip(cat, spark, tmp_path):
    local = tmp_path / "in.txt"
    local.write_text("alpha\nbeta\n")
    cat.put(str(local), "mytable")
    assert cat.ls() == ["mytable"]
    got = sorted(r["value"] for r in cat.get("mytable").collect())
    assert got == ["alpha", "beta"]

    out = tmp_path / "out.txt"
    cat.export("mytable", str(out))
    assert sorted(out.read_text().splitlines()) == ["alpha", "beta"]

    assert cat.delete("mytable") is True
    assert cat.ls() == []
    assert cat.delete("mytable") is False


def test_put_dataframe_and_prefix_union(cat, spark):
    df1 = spark.createDataFrame([(1,)], ["v"])
    df2 = spark.createDataFrame([(2,)], ["v"])
    cat.put(df1, "ds_part1")
    cat.put(df2, "ds_part2")
    # reference quirk NOT replicated: prefix reads union all matches,
    # not just the first file (leader.rs:253)
    assert sorted(r["v"] for r in cat.read_prefix("ds_").collect()) == [1, 2]


def test_invalid_names_rejected(cat):
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ValueError):
            cat.put(None, bad)  # type: ignore[arg-type]


def test_ls_skips_internal_dot_dirs(cat, spark, tmp_path):
    """A crashed compact's scratch dir must not surface in ls() — the
    API can't address dot-names, so listing one creates an unremovable
    ghost."""
    import os

    cat.put(spark.createDataFrame([(1,)], ["v"]), "t")
    os.makedirs(os.path.join(cat.root, ".t.compact-tmp"), exist_ok=True)
    assert cat.ls() == ["t"]


def test_compact_validates_target_and_refuses_bucketed(cat, spark):
    """--target-mb 0 is a usage error, not a ZeroDivisionError; and a
    session-catalog (bucketed) table must be refused — rewriting it as
    plain parquet corrupts the bucket metadata the catalog still holds."""
    import pytest as _pytest

    cat.put(spark.createDataFrame([(1,)], ["v"]), "plain")
    with _pytest.raises(ValueError, match="target_file_bytes"):
        cat.compact("plain", target_file_bytes=0)
    cat.put_bucketed(spark.createDataFrame([(1, "x")], ["k", "v"]), "bkt", "k", 4)
    try:
        with _pytest.raises(ValueError, match="session catalog"):
            cat.compact("bkt")
        # the bucketed read path must still work afterwards
        assert cat.get_bucketed("bkt").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt")


def test_compact_recovers_stale_tmp_and_refreshes(cat, spark):
    """A leftover compact scratch dir is cleaned on the next compact,
    and a cached plan over the table survives the file swap (compact
    refreshes Spark's path metadata)."""
    import os

    df = spark.range(100).withColumnRenamed("id", "v")
    cat.put(df, "t2")
    os.makedirs(os.path.join(cat.root, ".t2.compact-tmp"), exist_ok=True)
    cached = cat.get("t2").persist()
    assert cached.count() == 100
    n = cat.compact("t2")
    assert n >= 1
    assert not os.path.isdir(os.path.join(cat.root, ".t2.compact-tmp"))
    assert cat.get("t2").count() == 100
    cached.unpersist()


def test_compact_heals_crashed_swap(cat, spark):
    """A crash between compact's two swap renames leaves the table's only
    copy in the .{name}.compact-old scratch dir; the next compact must
    put it back instead of failing on the missing live dir."""
    import os
    import shutil

    df = spark.range(500).withColumnRenamed("id", "v")
    cat.put(df, "t3")
    path = os.path.join(cat.root, "t3")
    shutil.move(path, os.path.join(cat.root, ".t3.compact-old"))
    assert not os.path.isdir(path)  # the simulated crash state
    n = cat.compact("t3")
    assert n >= 1
    assert sorted(r.v for r in cat.get("t3").collect()) == list(range(500))
    assert not os.path.isdir(os.path.join(cat.root, ".t3.compact-old"))


def test_compact_guard_case_and_temp_views(cat, spark):
    """The bucketed-table guard compares identifiers the way Spark's
    catalog stores them (lowercased) and ignores temp views: a temp view
    sharing a path-table's name must not block compaction, and a
    bucketed table registered under a different case must still refuse."""
    import pytest as _pytest

    df = spark.range(50).withColumnRenamed("id", "v")
    cat.put(df.repartition(4), "shadowed")
    spark.range(3).createOrReplaceTempView("shadowed")
    try:
        assert cat.compact("shadowed") >= 1  # temp view must not block
    finally:
        spark.catalog.dropTempView("shadowed")
    cat.put_bucketed(spark.createDataFrame([(1, "x")], ["k", "v"]), "CasedBkt", "k", 4)
    try:
        with _pytest.raises(ValueError, match="session catalog"):
            cat.compact("CasedBkt")  # catalog stores it as 'casedbkt'
    finally:
        spark.sql("DROP TABLE IF EXISTS casedbkt")


def test_delete_drops_bucketed_metadata(cat, spark):
    """Deleting a bucketed table must also drop its session-catalog
    entry — otherwise a later get_bucketed() reads a dangling table."""
    import pytest as _pytest

    cat.put_bucketed(spark.createDataFrame([(1, "x")], ["k", "v"]), "bktdel", "k", 4)
    assert cat.get_bucketed("bktdel").count() == 1
    assert cat.delete("bktdel")
    assert not cat.exists("bktdel")
    assert not any(
        t.name == "bktdel" for t in spark.catalog.listTables()
    )
    with _pytest.raises(Exception):
        cat.get_bucketed("bktdel").count()


def test_delete_spares_unrelated_table_sharing_the_name(cat, spark, tmp_path):
    """A session-catalog table that merely shares the lowercased name —
    registered by someone else, data elsewhere — must survive delete():
    the DROP is location-checked, not name-matched (a name-only match
    would destroy the unrelated table's data)."""
    other_dir = str(tmp_path / "elsewhere" / "clash_t")
    spark.createDataFrame([(1,)], ["v"]).write.mode("overwrite").option(
        "path", other_dir
    ).format("parquet").saveAsTable("clash_t")
    try:
        cat.put(spark.createDataFrame([(2,)], ["v"]), "clash_t")
        assert cat.delete("clash_t") is True
        # our path-only copy is gone; the unrelated table is untouched
        assert not cat.exists("clash_t")
        assert [r.v for r in spark.table("clash_t").collect()] == [1]
    finally:
        spark.sql("DROP TABLE IF EXISTS clash_t")


def test_compact_proceeds_past_unrelated_name_clash(cat, spark, tmp_path):
    """compact() of a path-only table must not be blocked by an
    unrelated session-catalog table sharing the name (the guard is for
    OUR bucketed layout, which lives at this catalog's path)."""
    other_dir = str(tmp_path / "elsewhere" / "clash_c")
    spark.createDataFrame([(1,)], ["v"]).write.mode("overwrite").option(
        "path", other_dir
    ).format("parquet").saveAsTable("clash_c")
    try:
        cat.put(spark.createDataFrame([(2,)], ["v"]), "clash_c")
        assert cat.compact("clash_c") >= 1
        assert [r.v for r in cat.get("clash_c").collect()] == [2]
    finally:
        spark.sql("DROP TABLE IF EXISTS clash_c")


def test_compact_bucketed_preserves_layout_and_rows(spark, tmp_path):
    """compact_bucketed shrinks an append-heavy bucketed table to ~one
    file per bucket WITHOUT losing the bucket metadata a co-located
    join depends on (plain compact refuses these tables)."""
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "bwh"))
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id", "id % 7 AS k", "CAST(id AS STRING) AS payload"
    )
    cat.put_bucketed(mk(0, 100), "bt", "k", num_buckets=4)
    for lo in (100, 200, 300):
        cat.append_bucketed(mk(lo, lo + 100), "bt", "k", num_buckets=4)
    path = tmp_path / "bwh" / "bt"
    files_before = sum(1 for f in path.iterdir() if f.name.endswith(".parquet"))
    n_files = cat.compact_bucketed("bt", "k", num_buckets=4)
    assert n_files < files_before
    # coalesce(parallelism) × per-bucket split bounds the file count
    # independent of how many epochs were appended
    assert n_files <= 4 * 4
    after = cat.get_bucketed("bt")
    assert after.count() == 400
    assert {r.id for r in after.select("id").collect()} == set(range(400))
    # bucket metadata survived: a same-bucketed self-aggregation on k
    # plans without an Exchange above the scan
    plan = (
        after.groupBy("k").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    # stale stage table is gone
    import os as _os

    assert not _os.path.isdir(_os.path.join(cat.root, "bt__compacting"))


def test_compact_bucketed_is_retryable_after_stale_stage(spark, tmp_path):
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "bwh2"))
    df = spark.range(0, 50).selectExpr("id", "id % 3 AS k")
    cat.put_bucketed(df, "bt2", "k", num_buckets=2)
    # simulate a crashed earlier compaction that left a stage table
    # (the reserved name is only writable through the internal helper)
    import os as _os

    cat._write_bucketed(
        df.limit(5), "bt2__compacting",
        _os.path.join(cat.root, "bt2__compacting"), "k", 2, "overwrite",
    )
    cat.compact_bucketed("bt2", "k", num_buckets=2)
    assert cat.get_bucketed("bt2").count() == 50
    assert not _os.path.isdir(_os.path.join(cat.root, "bt2__compacting"))


def test_snapshot_survives_append_and_overwrite(spark, tmp_path):
    """A snapshot freezes contents against BOTH later appends (new part
    files absent from the tree) and full rewrites (hardlinks keep the
    old inodes alive after overwrite unlinks the live names)."""
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "vwh"))
    cat.put(spark.range(0, 10).selectExpr("id"), "t")
    v1 = cat.snapshot("t")
    cat.append(spark.range(10, 20).selectExpr("id"), "t")
    v2 = cat.snapshot("t")
    cat.put(spark.range(100, 103).selectExpr("id"), "t")  # full rewrite
    assert cat.versions("t") == [v1, v2] == [1, 2]
    assert {r.id for r in cat.get_version("t", v1).collect()} == set(range(10))
    assert {r.id for r in cat.get_version("t", v2).collect()} == set(range(20))
    assert {r.id for r in cat.get("t").collect()} == {100, 101, 102}
    # snapshot dirs are internal: never listed, never addressable
    assert cat.ls() == ["t"]


def test_restore_rolls_back_and_is_repeatable(spark, tmp_path):
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "vwh2"))
    cat.put(spark.range(0, 5).selectExpr("id"), "t")
    v1 = cat.snapshot("t")
    cat.put(spark.range(50, 60).selectExpr("id"), "t")
    cat.restore("t", v1)
    assert {r.id for r in cat.get("t").collect()} == set(range(5))
    # the snapshot survives its own restore; restoring again still works
    cat.append(spark.range(5, 8).selectExpr("id"), "t")
    cat.restore("t", v1)
    assert {r.id for r in cat.get("t").collect()} == set(range(5))
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.get_version("t", 99)


def test_compact_bucketed_rejects_mismatched_spec(spark, tmp_path):
    """The staged table is brand-new, so Spark validates nothing — the
    catalog itself must refuse a spec that contradicts its entry, or
    the swap would publish a corrupt layout under the live metadata."""
    import pytest as _pytest

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "mwh"))
    cat.put_bucketed(spark.range(20).selectExpr("id", "id % 3 AS k"), "mt", "k", 4)
    with _pytest.raises(ValueError, match="bucket spec mismatch"):
        cat.compact_bucketed("mt", "id", num_buckets=4)  # wrong column
    with _pytest.raises(ValueError, match="bucket spec mismatch"):
        cat.compact_bucketed("mt", "k", num_buckets=8)  # wrong count
    assert cat.compact_bucketed("mt", "k", num_buckets=4) >= 1  # right spec


def test_restore_refreshes_bucketed_relation(spark, tmp_path):
    """A restored BUCKETED table must be readable through the session
    catalog immediately — the relation cache cannot keep listing the
    pre-restore part files restore() just swapped away."""
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "rwh"))
    cat.put_bucketed(spark.range(10).selectExpr("id", "id % 2 AS k"), "rt", "k", 2)
    assert cat.get_bucketed("rt").count() == 10  # populate the relation cache
    v1 = cat.snapshot("rt")
    cat.append_bucketed(spark.range(10, 30).selectExpr("id", "id % 2 AS k"), "rt", "k", 2)
    assert cat.get_bucketed("rt").count() == 30
    cat.restore("rt", v1)
    assert cat.get_bucketed("rt").count() == 10  # stale listing would crash


def test_delete_heals_crashed_restore_and_reaps_scratch(spark, tmp_path):
    import os

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "dwh"))
    cat.put(spark.range(5).selectExpr("id"), "t")
    cat.snapshot("t")
    # simulate a crash between restore's two renames: live dir moved
    # aside, replacement never published
    os.rename(str(tmp_path / "dwh" / "t"), str(tmp_path / "dwh" / ".t.restore-old"))
    assert cat.delete("t") is True  # healed, then deleted
    left = [d for d in os.listdir(tmp_path / "dwh") if d.startswith(".t.")]
    assert left == []  # snapshots + scratch reaped with the table


def test_delete_heals_crashed_compact_and_reaps_stage(spark, tmp_path):
    """The heal covers EVERY swap path (restore/compact/compact_bucketed),
    and a crashed compact_bucketed's visible stage table goes with the
    table it was staging for."""
    import os

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "hwh"))
    cat.put(spark.range(5).selectExpr("id"), "t")
    cat.snapshot("t")
    # crash between plain compact's two renames
    os.rename(str(tmp_path / "hwh" / "t"), str(tmp_path / "hwh" / ".t.compact-old"))
    assert cat.delete("t") is True
    assert [d for d in os.listdir(tmp_path / "hwh") if d.startswith(".t.")] == []

    # crashed compact_bucketed: live table + orphaned stage table
    cat.put_bucketed(spark.range(8).selectExpr("id", "id % 2 AS k"), "bt", "k", 2)
    cat._write_bucketed(
        spark.range(8).selectExpr("id", "id % 2 AS k"), "bt__compacting",
        os.path.join(cat.root, "bt__compacting"), "k", 2, "overwrite",
    )
    assert cat.delete("bt") is True
    assert not os.path.isdir(os.path.join(cat.root, "bt__compacting"))
    assert "bt__compacting" not in [t.name for t in spark.catalog.listTables()]


def test_delete_tmp_reap_is_name_exact(spark, tmp_path):
    """.{name}.v<digits>.tmp only — a nested table name (t vs t.v2) must
    not have its snapshot scratch eaten by delete('t')."""
    import os

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "gwh"))
    cat.put(spark.range(3).selectExpr("id"), "t")
    os.makedirs(str(tmp_path / "gwh" / ".t.v3.tmp"))       # ours: half-built
    os.makedirs(str(tmp_path / "gwh" / ".t.v2.v1.tmp"))    # table 't.v2's
    assert cat.delete("t") is True
    left = sorted(os.listdir(tmp_path / "gwh"))
    assert ".t.v2.v1.tmp" in left and ".t.v3.tmp" not in left


def test_stage_suffix_is_reserved_and_metadata_only_reap(spark, tmp_path):
    """User tables cannot take the stage suffix (the collision would be
    indistinguishable from crash scratch at delete time), and a crash
    between compact_bucketed's swap and its metadata drop — stage entry
    left with NO directory — is reaped by delete()."""
    import os

    import pytest as _pytest

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "swh"))
    with _pytest.raises(ValueError, match="reserved"):
        cat.put(spark.range(3).selectExpr("id"), "foo__compacting")
    with _pytest.raises(ValueError, match="reserved"):
        cat.put_bucketed(spark.range(3).selectExpr("id"), "bar__compacting", "id", 2)

    # dangling stage ENTRY with vanished dir (the post-swap crash window)
    cat.put_bucketed(spark.range(6).selectExpr("id", "id % 2 AS k"), "zt", "k", 2)
    spath = os.path.join(cat.root, "zt__compacting")
    cat._write_bucketed(
        spark.range(2).selectExpr("id", "id % 2 AS k"), "zt__compacting",
        spath, "k", 2, "overwrite",
    )
    import shutil as _shutil

    _shutil.rmtree(spath)  # dir gone, session entry dangling
    assert cat.delete("zt") is True
    assert "zt__compacting" not in [t.name for t in spark.catalog.listTables()]


def test_drop_stage_never_touches_unrelated_table(spark, tmp_path):
    """An externally created table that merely shares the stage NAME
    (different location) must survive the reap — same location-checked
    ownership rule as the session-entry DROP."""
    import os

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "uwh"))
    cat.put(spark.range(3).selectExpr("id"), "qq")
    other = str(tmp_path / "elsewhere")
    (
        spark.range(9).selectExpr("id", "id % 2 AS k")
        .write.mode("overwrite").bucketBy(2, "k").sortBy("k")
        .option("path", other).saveAsTable("qq__compacting")
    )
    try:
        assert cat.delete("qq") is True
        # the unrelated table's entry and data are intact
        assert "qq__compacting" in [t.name for t in spark.catalog.listTables()]
        assert spark.table("qq__compacting").count() == 9
    finally:
        spark.sql("DROP TABLE IF EXISTS qq__compacting")


def test_compact_bucketed_retry_after_mid_swap_crash(spark, tmp_path):
    """Crash between the two swap renames (live dir parked, staged files
    present, stage entry dangling): a RETRIED compact_bucketed heals the
    live dir, reaps the stale stage, and completes."""
    import os

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cswh"))
    cat.put_bucketed(spark.range(40).selectExpr("id", "id % 3 AS k"), "ct", "k", 2)
    spath = os.path.join(cat.root, "ct__compacting")
    cat._write_bucketed(
        cat.get_bucketed("ct"), "ct__compacting", spath, "k", 2, "overwrite"
    )
    # simulate the crash window: live parked, stage not yet published
    os.rename(os.path.join(cat.root, "ct"), os.path.join(cat.root, ".ct.bcompact-old"))
    n = cat.compact_bucketed("ct", "k", num_buckets=2)
    assert n >= 1
    assert cat.get_bucketed("ct").count() == 40
    assert not os.path.isdir(spath)


def test_compact_bucketed_refuses_unrelated_name_clash(spark, tmp_path):
    """compact_bucketed reads through spark.table (a session-GLOBAL
    namespace): with no ownership gate, an unrelated table sharing the
    lowercased name would have ITS rows staged and rename-swapped over
    our live dir — silent data replacement (ADVICE r6). The gate must
    refuse, leaving both tables intact."""
    import os

    import pytest as _pytest

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "gwh"))
    other_dir = str(tmp_path / "elsewhere" / "clash_g")
    (
        spark.range(9).selectExpr("id", "id % 2 AS k")
        .write.mode("overwrite").bucketBy(2, "k").sortBy("k")
        .option("path", other_dir).saveAsTable("clash_g")
    )
    try:
        # OUR table is path-only (plain put) — _bucket_spec sees a
        # location mismatch and returns None, which used to skip the
        # spec validation silently
        cat.put(spark.createDataFrame([(2, 0)], ["id", "k"]), "clash_g")
        with _pytest.raises(ValueError, match="different location"):
            cat.compact_bucketed("clash_g", "k", num_buckets=2)
        # our data untouched, unrelated table untouched
        assert [r.id for r in cat.get("clash_g").collect()] == [2]
        assert spark.table("clash_g").count() == 9
        assert not os.path.isdir(os.path.join(cat.root, "clash_g__compacting"))
    finally:
        spark.sql("DROP TABLE IF EXISTS clash_g")


def test_compact_bucketed_refuses_plain_table(spark, tmp_path):
    """A table never registered via put_bucketed has no session entry:
    compact_bucketed must refuse (plain tables go through compact())
    instead of falling through to whatever spark.table resolves."""
    import pytest as _pytest

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "pwh"))
    cat.put(spark.range(5).selectExpr("id", "id % 2 AS k"), "plain_t")
    with _pytest.raises(ValueError, match="no session-catalog entry"):
        cat.compact_bucketed("plain_t", "k", num_buckets=2)
    assert cat.get("plain_t").count() == 5


def test_compact_bucketed_refuses_foreign_stage_entry(spark, tmp_path):
    """An externally created table that shares the STAGE name survives
    _drop_stage (location-checked), but the stage's overwrite
    saveAsTable would still drop-and-recreate its entry — the probe
    must refuse before writing (ADVICE r6)."""
    import pytest as _pytest

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "fwh"))
    cat.put_bucketed(
        spark.range(20).selectExpr("id", "id % 3 AS k"), "ft", "k", num_buckets=2
    )
    other = str(tmp_path / "elsewhere_stage")
    (
        spark.range(7).selectExpr("id", "id % 2 AS k")
        .write.mode("overwrite").bucketBy(2, "k").sortBy("k")
        .option("path", other).saveAsTable("ft__compacting")
    )
    try:
        with _pytest.raises(ValueError, match="unrelated table"):
            cat.compact_bucketed("ft", "k", num_buckets=2)
        # the foreign stage-name table is fully intact
        assert spark.table("ft__compacting").count() == 7
        assert cat.get_bucketed("ft").count() == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS ft__compacting")


def test_prune_versions_retention_and_refusals(cat, spark, tmp_path):
    """Retention drops oldest-first; pruned versions refuse
    get_version/restore; surviving versions still restore; numbering
    stays monotonic past a prune."""
    import os

    import pytest as _pytest

    for i in range(4):
        cat.put(spark.createDataFrame([(i,)], ["v"]), "snap_t")
        assert cat.snapshot("snap_t") == i + 1
    assert cat.versions("snap_t") == [1, 2, 3, 4]
    # keep_last EXCEEDING the snapshot count prunes NOTHING (ADVICE r7
    # high: the unclamped slice went negative and deleted from the
    # front — a keep-6 policy on day 4 of daily snapshots must be a
    # no-op, not destroy the oldest audit copies)
    assert cat.prune_versions("snap_t", keep_last=6) == []
    assert cat.versions("snap_t") == [1, 2, 3, 4]
    assert cat.prune_versions("snap_t", keep_last=4) == []
    assert cat.versions("snap_t") == [1, 2, 3, 4]
    assert cat.prune_versions("snap_t", keep_last=2) == [1, 2]
    assert cat.versions("snap_t") == [3, 4]
    with _pytest.raises(FileNotFoundError):
        cat.get_version("snap_t", 1)
    with _pytest.raises(FileNotFoundError):
        cat.restore("snap_t", 2)
    # surviving snapshot restores fine
    cat.restore("snap_t", 3)
    assert [r.v for r in cat.get("snap_t").collect()] == [2]
    # numbering continues above the surviving max
    assert cat.snapshot("snap_t") == 5
    # keep_last=0 wipes; half-built .tmp trees are NOT touched
    os.makedirs(os.path.join(cat.root, ".snap_t.v9.tmp"))
    assert cat.prune_versions("snap_t", keep_last=0) == [3, 4, 5]
    assert cat.versions("snap_t") == []
    assert os.path.isdir(os.path.join(cat.root, ".snap_t.v9.tmp"))
    with _pytest.raises(ValueError):
        cat.prune_versions("snap_t", keep_last=-1)
    with _pytest.raises(ValueError):
        cat.prune_versions("bad/name")
