"""applyInPandasWithState custom stateful operator: cross-batch session
stitching (sessions spanning microbatch boundaries come out as ONE row)."""

import numpy as np
import pandas as pd
import pytest

from raster_functions_spark.streaming import stateful


def test_sessionize_stream_stitches_across_batches(spark, tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    # batch 1: user 1 starts a session; user 2 completes one
    b1 = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "ts": [base, base + 5 * m, base, base + 2 * m],
    })
    # batch 2: user 1 continues the SAME session (gap 10min < 30min),
    # then a >gap jump closes it and opens a second one
    b2 = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [base + 15 * m, base + 100 * m, base + 101 * m],
    })
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sessions = stateful.sessionize_stream(stream, gap_sec=1800,
                                          idle_timeout_sec=None)
    q = (sessions.writeStream.outputMode("update").format("memory")
         .queryName("sessions_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("sessions_out").toPandas()

    # exactly ONE closed session: user 1's first (stitched across the two
    # microbatches: events at 0,5 from batch 1 + 15 from batch 2 → closed
    # by the 100min event). user 2's session and user 1's second stay open
    # in state (no timeout configured).
    assert len(out) == 1
    row = out.iloc[0]
    assert row.user_id == 1 and row.closed_by == "gap"
    assert row.n_events == 3            # 0, 5, 15 — crosses the batch boundary
    assert pd.Timestamp(row.session_start) == base
    assert pd.Timestamp(row.session_end) == base + 15 * m


def test_sessionize_stream_matches_batch_contract(spark, tmp_path):
    """Total (closed + open-in-state) session count equals the batch
    lag+cumsum sessionization on the same data."""
    src = tmp_path / "ev2"
    src.mkdir()
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(6):
        t = base
        for _ in range(40):
            t = t + pd.Timedelta(seconds=int(rng.integers(60, 4000)))
            rows.append({"user_id": u, "ts": t})
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).coalesce(2).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sessions = stateful.sessionize_stream(stream, gap_sec=1800,
                                          idle_timeout_sec=None)
    q = (sessions.writeStream.outputMode("update").format("memory")
         .queryName("sessions_out2")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    closed = spark.table("sessions_out2").toPandas()

    # batch golden: per-user session count via gap rule
    want_total = 0
    for u, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy()
        gaps = np.diff(ts).astype("timedelta64[s]").astype(int)
        want_total += 1 + int((gaps > 1800).sum())
    # one session per user remains open in state
    assert len(closed) + 6 == want_total
    assert (closed.n_events >= 1).all()


def test_streaming_pixel_mean_composite(spark, tmp_path):
    """Per-pixel running mean through the streaming path: two microbatches
    of acquisitions → snapshot-committed [Σ,count] partials → merged
    composite equals the batch stack mean over ALL members; a replayed
    batch commit is a no-op (exactly-once)."""
    import numpy as np
    import pandas as pd
    from raster_functions_spark import codec, fixtures
    from raster_functions_spark.operators import stack as stk
    from raster_functions_spark.snapshots import SnapshotTable
    from raster_functions_spark.streaming import composites

    pdf = fixtures.mosaic_stack_pdf(2, 6)
    src = str(tmp_path / "src")
    # two files → two availableNow microbatches (maxFilesPerTrigger=1)
    spark.createDataFrame(pdf[pdf.t < 3]).coalesce(1).write.parquet(
        src + "/a")
    spark.createDataFrame(pdf[pdf.t >= 3]).coalesce(1).write.parquet(
        src + "/b")
    stream = (spark.readStream.schema(spark.createDataFrame(pdf).schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    tpath = str(tmp_path / "partials_table")
    q = composites.start_pixel_mean_ingest(
        stream, tpath, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    table = SnapshotTable(spark, tpath)
    assert [s["run_id"] for s in table.snapshots()] == ["batch-0", "batch-1"]
    live = composites.current_pixel_composite(spark, tpath)
    got = {r["scene_id"]: (codec.decode(bytes(r["bytes"])), r["n_rasters"])
           for r in live.collect()}
    want = {r["scene_id"]: codec.decode(bytes(r["bytes"]))
            for r in stk.stack_mean_assoc(
                spark.createDataFrame(pdf)).collect()}
    assert set(got) == {"scene0", "scene1"}
    for k in got:
        px, n = got[k]
        assert n == 6
        assert np.array_equal(px, want[k])
    # exactly-once: replaying batch-0's commit is a no-op
    b0 = spark.createDataFrame(pdf[pdf.t < 3])
    from raster_functions_spark.operators.stack import mean_partial_tiles
    table.append(mean_partial_tiles(b0, ["scene_id"]), "scene_id",
                 run_id="batch-0")
    assert len(table.snapshots()) == 2
    live2 = {r["scene_id"]: r["n_rasters"]
             for r in composites.current_pixel_composite(spark, tpath).collect()}
    assert live2 == {"scene0": 6, "scene1": 6}


def test_streaming_composite_auto_compaction(spark, tmp_path):
    """compact_every folds small-file maintenance into the sink: after the
    stream drains, compacted values hold one file each, the composite is
    unchanged, and incremental readers skip the compact commits."""
    from raster_functions_spark import fixtures
    from raster_functions_spark.snapshots import SnapshotTable
    from raster_functions_spark.streaming import composites

    pdf = fixtures.mosaic_stack_pdf(1, 6)
    src = str(tmp_path / "src")
    for i, lo in enumerate(range(0, 6, 2)):
        spark.createDataFrame(pdf[(pdf.t >= lo) & (pdf.t < lo + 2)]) \
            .coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (spark.readStream.schema(spark.createDataFrame(pdf).schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    tpath = str(tmp_path / "tbl")
    q = composites.start_pixel_mean_ingest(
        stream, tpath, str(tmp_path / "ck"), compact_every=3)
    q.awaitTermination(120)

    table = SnapshotTable(spark, tpath)
    ops = [s["op"] for s in table.snapshots()]
    assert ops.count("compact") == 1 and ops.count("append") == 3
    live = table._manifest(table.current_id)
    by_val = {}
    for f in live:
        by_val.setdefault(f["partition"], []).append(f)
    assert all(len(fs) == 1 for fs in by_val.values())
    out = composites.current_pixel_composite(spark, tpath).collect()
    assert out[0]["n_rasters"] == 6


def test_sessionize_stream_backward_late_event_expands_bounds(spark, tmp_path):
    """A late event that predates the OPEN session (but within gap of its
    last event) must expand session_start backward, not leave the start
    after a counted event."""
    src = tmp_path / "ev_late"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    b1 = pd.DataFrame({"user_id": [7], "ts": [base + 10 * m]})
    # arrives later but happened EARLIER (10 min before the open start)
    b2 = pd.DataFrame({"user_id": [7, 7],
                       "ts": [base, base + 60 * m]})   # 60m > 30m gap? no:
    # gap is measured against last seen (10m): base is 10m earlier (merge),
    # base+60m is 50m after 10m -> closes the session
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(src))
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sessions = stateful.sessionize_stream(stream, gap_sec=1800,
                                          idle_timeout_sec=None)
    q = (sessions.writeStream.outputMode("update").format("memory")
         .queryName("late_out")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("late_out").toPandas()
    closed = out[out.closed_by == "gap"]
    assert len(closed) == 1
    r = closed.iloc[0]
    assert r["session_start"] == base          # expanded backward
    assert r["session_end"] == base + 10 * m
    assert r["n_events"] == 2


def test_sessionize_stream_far_backward_event_is_own_session(spark, tmp_path):
    """A late event more than gap_sec BEFORE the open session must emit as
    its own closed session — merging it would fabricate a span containing
    an internal gap the batch semantics forbid."""
    src = tmp_path / "ev_farlate"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 06:00:00")
    m = pd.Timedelta(minutes=1)
    b1 = pd.DataFrame({"user_id": [9], "ts": [base]})
    # arrives later but happened 3h earlier (far beyond the 30m gap),
    # plus a nearby second historical event within gap of the first
    b2 = pd.DataFrame({"user_id": [9, 9, 9],
                       "ts": [base - 180 * m, base - 175 * m, base + 5 * m]})
    # a third batch far ahead flushes the open session
    b3 = pd.DataFrame({"user_id": [9], "ts": [base + 600 * m]})
    for b in (b1, b2, b3):   # maxFilesPerTrigger=1 -> one microbatch each
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(str(src))
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sessions = stateful.sessionize_stream(stream, gap_sec=1800,
                                          idle_timeout_sec=None)
    q = (sessions.writeStream.outputMode("update").format("memory")
         .queryName("farlate_out")
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("farlate_out").toPandas()
    closed = out[out.closed_by == "gap"].sort_values("session_start")
    assert len(closed) == 2
    r = closed.iloc[0]
    assert r["session_start"] == base - 180 * m
    assert r["session_end"] == base - 175 * m     # both historical events
    assert r["n_events"] == 2                     # merged with each other
    # and the OPEN session kept its bounds
    r2 = closed.iloc[1]
    assert r2["session_start"] == base
    assert r2["session_end"] == base + 5 * m
    assert r2["n_events"] == 2
