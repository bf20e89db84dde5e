"""Iceberg-like snapshot tables: immutability, time travel, overwrite-by-
filter, incremental reads, idempotent restart commits, expiry."""

import os

import pytest
from pyspark.sql import functions as F

from raster_functions_spark.snapshots import SnapshotTable


def _df(spark, ids, pval):
    return (spark.range(*ids).withColumnRenamed("id", "image_id")
            .withColumn("p_cell", F.lit(pval))
            .withColumn("v", (F.col("image_id") * 3).cast("long")))


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "snap_table"))


def test_append_and_time_travel(spark, table):
    s1 = table.append(_df(spark, (0, 10), 1), "p_cell")
    s2 = table.append(_df(spark, (10, 25), 2), "p_cell")
    assert (s1, s2) == (1, 2)
    assert table.current_id == 2
    assert table.read().count() == 25
    assert table.read(snapshot_id=1).count() == 10          # time travel
    got = sorted(r.image_id for r in table.read().collect())
    assert got == list(range(25))


def test_incremental_read_only_new_files(spark, table):
    table.append(_df(spark, (0, 10), 1), "p_cell")
    s2 = table.append(_df(spark, (10, 25), 2), "p_cell")
    inc = table.read_incremental(since_snapshot_id=1)
    assert sorted(r.image_id for r in inc.collect()) == list(range(10, 25))
    # the incremental scan reads ONLY the files added after s1
    root = table._root()
    n_added = len(root["snapshots"][1]["added"])
    assert inc.rdd.getNumPartitions() <= max(n_added, 1) + 1
    assert table.read_incremental(0, until_snapshot_id=s2).count() == 25


def test_overwrite_partitions_is_metadata_only_and_immutable(spark, table):
    table.append(_df(spark, (0, 10), 1), "p_cell")
    table.append(_df(spark, (10, 25), 2), "p_cell")
    old_files = {f["path"] for f in table._manifest(2)}
    s3 = table.overwrite_partitions(
        _df(spark, (100, 104), 1), values=[1])
    assert s3 == 3
    # current state: partition 1 replaced, partition 2 untouched
    got = sorted(r.image_id for r in table.read().collect())
    assert got == list(range(10, 25)) + [100, 101, 102, 103]
    # partition-2 files are REUSED (metadata-only), not rewritten
    new_files = {f["path"] for f in table._manifest(3)}
    assert {f for f in old_files if "/_p=2/" in f} <= new_files
    # the replaced snapshot still reads its original content (immutability)
    assert sorted(r.image_id for r in table.read(2).collect()) == list(range(25))


def test_overwrite_validates_stray_rows(spark, table):
    table.append(_df(spark, (0, 5), 1), "p_cell")
    stray = _df(spark, (0, 3), 1).union(_df(spark, (3, 4), 9))
    with pytest.raises(ValueError, match="outside the replaced partitions"):
        table.overwrite_partitions(stray, values=[1])


def test_restart_same_run_id_is_noop(spark, table):
    s1 = table.append(_df(spark, (0, 10), 1), "p_cell", run_id="job-A")
    s2 = table.append(_df(spark, (0, 10), 1), "p_cell", run_id="job-A")
    assert s1 == s2 == 1                                     # no double commit
    assert table.read().count() == 10
    # a resumed OVERWRITE is also a no-op
    o1 = table.overwrite_partitions(_df(spark, (50, 52), 1), [1], run_id="job-B")
    o2 = table.overwrite_partitions(_df(spark, (50, 52), 1), [1], run_id="job-B")
    assert o1 == o2 == 2
    assert table.read().count() == 2


def test_expire_snapshots_deletes_unreferenced(spark, table):
    table.append(_df(spark, (0, 10), 1), "p_cell")
    table.overwrite_partitions(_df(spark, (10, 14), 1), [1])
    dropped_file = table._manifest(1)[0]["path"]
    deleted = table.expire_snapshots(keep_last=1)
    assert dropped_file in deleted
    assert not os.path.exists(os.path.join(table.path, dropped_file))
    assert table.read().count() == 4                         # current intact
    with pytest.raises(ValueError, match="missing manifest"):
        table.read(1)                                        # expired


def test_streaming_ingest_one_snapshot_per_batch(spark, table, tmp_path):
    """File stream (maxFilesPerTrigger=1 over two files → two deterministic
    microbatches) → snapshot sink: one commit per batch, incremental read
    returns exactly the second batch, run_ids recorded for restart safety."""
    src = str(tmp_path / "src")
    _df(spark, (0, 8), 1).coalesce(1).write.parquet(src)
    _df(spark, (8, 20), 2).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("image_id long, p_cell int, v long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = table.start_ingest(stream, "p_cell", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    snaps = table.snapshots()
    assert len(snaps) == 2
    assert [s["run_id"] for s in snaps] == ["batch-0", "batch-1"]
    assert table.read().count() == 20
    first = table.read(snapshot_id=1).count()
    inc = table.read_incremental(since_snapshot_id=1).count()
    assert first + inc == 20 and first in (8, 12)
    # exactly-once on retry: replaying a batch's commit is a no-op
    table.append(_df(spark, (0, 8), 1), "p_cell", run_id="batch-0")
    assert table.read().count() == 20


def test_incremental_scan_touches_only_added_files(spark, table):
    table.append(_df(spark, (0, 10), 1), "p_cell")
    table.append(_df(spark, (10, 25), 2), "p_cell")
    added = table.snapshots()[1]["added"]
    inc = table.read_incremental(since_snapshot_id=1)
    files = inc.inputFiles()
    assert len(files) == len(added)
    assert all(any(f.endswith(a.split("/")[-1]) for f in files) for a in added)


def test_empty_table_and_missing_snapshot_errors(spark, table):
    with pytest.raises(ValueError, match="empty table"):
        table.read()
    with pytest.raises(ValueError, match="append first"):
        table.overwrite_partitions(_df(spark, (0, 1), 1), [1])


def test_compact_rewrites_small_files_metadata_safe(spark, table):
    """Three appends to partition 1 → 3+ small files; compact rewrites the
    value to one file, keeps logical content identical, preserves time
    travel to pre-compact snapshots, and leaves sub-threshold values'
    files untouched."""
    table.append(_df(spark, (0, 5), 1), "p_cell")
    table.append(_df(spark, (5, 9), 1), "p_cell")
    table.append(_df(spark, (9, 12), 1), "p_cell")
    table.append(_df(spark, (12, 14), 2), "p_cell")          # 1 file, value 2
    live_before = table._manifest(table.current_id)
    n1_before = sum(1 for f in live_before if f["partition"] == "1")
    f2_before = sorted(f["path"] for f in live_before if f["partition"] == "2")
    assert n1_before >= 3
    before = sorted(r["image_id"] for r in table.read().collect())

    # threshold above value 2's file count: only value 1 is rewritten
    sid = table.compact(min_files_per_value=len(f2_before) + 1)
    assert table.snapshots()[-1]["op"] == "compact"
    live = table._manifest(sid)
    assert sum(1 for f in live if f["partition"] == "1") == 1
    assert sorted(f["path"] for f in live if f["partition"] == "2") == f2_before
    assert sorted(r["image_id"] for r in table.read().collect()) == before
    # time travel: pre-compact snapshot still reads the old small files
    assert table.read(snapshot_id=3).count() == 12
    # idempotent: same run_id short-circuits; nothing-to-do returns current
    assert table.compact(min_files_per_value=2, run_id="c1") == \
        table.compact(min_files_per_value=2, run_id="c1")
    assert table.compact(min_files_per_value=99) == table.current_id


def test_incremental_after_compact_skips_rewritten_rows(spark, table):
    """read_incremental must never re-deliver rows a compaction rewrote:
    consumer checkpoints at snapshot N, compaction runs, a real append
    lands — the incremental scan returns ONLY the append's rows."""
    table.append(_df(spark, (0, 6), 1), "p_cell")
    table.append(_df(spark, (6, 10), 1), "p_cell")
    checkpoint = table.current_id
    table.compact(min_files_per_value=2)
    table.append(_df(spark, (100, 104), 3), "p_cell")
    inc = table.read_incremental(since_snapshot_id=checkpoint)
    got = sorted(r["image_id"] for r in inc.collect())
    assert got == [100, 101, 102, 103]
    # and expire after compact reclaims the replaced small files
    deleted = table.expire_snapshots(keep_last=1)
    assert deleted                                            # old files gone
    assert sorted(r["image_id"] for r in table.read().collect()) == \
        list(range(0, 10)) + [100, 101, 102, 103]


def test_mosaic_template_over_snapshot_table(spark, table):
    """Cross-feature: a mosaic collection stored as a snapshot table
    (partitioned by scene — members co-located, the layout the map-side
    combine exploits) feeds the .rft plan language directly; result equals
    running the template on the raw fixture frame."""
    from raster_functions_spark import codec, fixtures
    from raster_functions_spark.plans import chain, rft
    pdf = fixtures.mosaic_stack_pdf(2, 5)
    table.append(spark.createDataFrame(pdf), "scene_id")
    spec = rft.load_rft(
        "/root/reference/functions/FindMaxPixel_Mosaic.rft.xml")
    out_snap = chain.build_chain(table.read(), spec)
    out_raw = chain.build_chain(spark.createDataFrame(pdf), spec)
    a = {r["scene_id"]: codec.decode(bytes(r["bytes"]))
         for r in out_snap.collect()}
    b = {r["scene_id"]: codec.decode(bytes(r["bytes"]))
         for r in out_raw.collect()}
    assert set(a) == set(b) == {"scene0", "scene1"}
    import numpy as np
    for k in a:
        assert np.array_equal(a[k], b[k])


def test_append_tables_atomic_multi_dataset(spark, table):
    """append_tables: several named datasets land in ONE commit (one
    snapshot id, one manifest, one root swap); read/read_incremental
    select per dataset; run_id replay is a no-op across the whole group;
    compact handles named datasets independently but in one commit."""
    a1 = _df(spark, (0, 4), "x")
    b1 = (spark.range(0, 3).withColumnRenamed("id", "k")
          .withColumn("p_cell", F.lit("x")))
    s1 = table.append_tables({"stats": (a1, "p_cell"), "pairs": (b1, "p_cell")},
                             run_id="batch-0")
    assert s1 == 1 and table.current_id == 1
    # replay = no-op for the whole group
    assert table.append_tables({"stats": (a1, "p_cell"),
                                "pairs": (b1, "p_cell")},
                               run_id="batch-0") == 1
    assert table.current_id == 1
    s2 = table.append_tables({"stats": (_df(spark, (4, 6), "y"), "p_cell"),
                              "pairs": (b1.withColumn("p_cell", F.lit("y")),
                                        "p_cell")}, run_id="batch-1")
    assert s2 == 2
    # per-dataset reads, with time travel
    assert table.read(table="stats").count() == 6
    assert table.read(table="pairs").count() == 6
    assert table.read(snapshot_id=1, table="stats").count() == 4
    # incremental scan per dataset
    assert table.read_incremental(1, table="stats").count() == 2
    assert {r["p_cell"] for r in
            table.read_incremental(1, table="pairs").collect()} == {"y"}
    # mismatched partition cols rejected
    with pytest.raises(ValueError):
        table.append_tables({"stats": (a1, "p_cell"), "pairs": (b1, "k")})
    # compact: both datasets' multi-file values rewritten in ONE commit
    table.append_tables({"stats": (_df(spark, (6, 9), "x"), "p_cell"),
                         "pairs": (b1, "p_cell")}, run_id="batch-2")
    before = table.current_id
    sc = table.compact(min_files_per_value=2, run_id="c0")
    assert sc == before + 1
    assert table.read(table="stats").count() == 9
    assert table.read(table="pairs").count() == 9
    # compact commit adds no incremental rows — since r6 an empty range
    # yields an EMPTY frame with the dataset's schema (not a raise)
    inc = table.read_incremental(before, table="stats")
    assert inc.count() == 0 and "image_id" in inc.columns


def test_streaming_expire_automation_bounds_root_and_keeps_exactly_once(
        spark, table):
    """expire_every truncates the snapshot log during streaming ingest
    (root stays O(keep_last)), expired batches leave run-id tombstones,
    and a LATE REPLAY of an already-expired microbatch is still a no-op —
    exactly-once survives retention."""
    sink = table.streaming_sink("p_cell", expire_every=4, keep_last=3)
    for b in range(10):
        sink(_df(spark, (b * 2, b * 2 + 2), f"v{b}"), b)
    root = table._root()
    assert len(root["snapshots"]) <= 3 + 4          # bounded by retention
    # sequential batch-<n> ids fold into the per-prefix watermark (r6);
    # the exact-tombstone exception set stays empty in normal streaming
    assert root["expired_seq_watermarks"]["batch"]["hi"] >= 0
    assert not root.get("expired_run_ids")
    cur = table.current_id
    n_rows = table.read().count()
    assert n_rows == 20                             # data files all live
    # replay of an EXPIRED batch: tombstone short-circuits, nothing changes
    sink(_df(spark, (0, 2), "v0"), 0)
    assert table.current_id == cur
    assert table.read().count() == 20
    # replay of a LIVE batch: still a no-op too
    sink(_df(spark, (18, 20), "v9"), 9)
    assert table.current_id == cur


def test_read_incremental_refuses_range_predating_retention(spark, table):
    """A lagging consumer whose checkpoint predates the oldest retained
    snapshot must get a loud error, not a silently-incomplete scan
    (expired snapshots' added-file lists are gone from the log)."""
    sink = table.streaming_sink("p_cell", expire_every=4, keep_last=3)
    for b in range(8):
        sink(_df(spark, (b * 2, b * 2 + 2), f"v{b}"), b)
    root = table._root()
    oldest = root["snapshots"][0]["id"]
    assert oldest > 1                               # retention actually ran
    with pytest.raises(ValueError, match="predates retention"):
        table.read_incremental(1)
    # a range fully inside the retained log still works
    assert table.read_incremental(oldest - 1).count() > 0
    # empty range at the head: empty frame with the table's schema (r6)
    head = table.read_incremental(table.current_id)
    assert head.count() == 0 and "image_id" in head.columns


def test_append_tables_empty_dataset_commits_readable_schema(spark, table):
    """An empty dataset in a commit (e.g. a flagship microbatch whose
    images intersect no AOI) must still materialize a readable,
    schema-bearing table instead of making read() fail."""
    full = _df(spark, (0, 3), "x")
    empty = full.filter("image_id < 0")
    table.append_tables({"stats": (empty, "p_cell"),
                         "pairs": (full, "p_cell")}, run_id="b0")
    assert table.read(table="stats").count() == 0
    assert table.read(table="stats").columns == full.drop("_p").columns
    assert table.read(table="pairs").count() == 3
    # later non-empty commit merges fine
    table.append_tables({"stats": (full, "p_cell"),
                         "pairs": (full, "p_cell")}, run_id="b1")
    assert table.read(table="stats").count() == 3
    # single-table append of an empty frame too
    t2 = SnapshotTable(spark, table.path + "_e")
    t2.append(empty, "p_cell", run_id="b0")
    assert t2.read().count() == 0
