"""Round-6 ADVICE fixes: zonal-remap overlap semantics unified to the
reference's table-order last-match rule; snapshot-table empty-commit
fallback files (compact summary, _table_of, incremental reads); lineage
checkpointed_write first run with all-empty buckets."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import fixtures, lineage, spatial
from raster_functions_spark.operators import zonal
from raster_functions_spark.snapshots import SnapshotTable


# --------------------------------------------------- zonal remap overlap ---

_OVERLAP_ZONES = pd.DataFrame({
    # zone 1: three OVERLAPPING intervals in table order; v=5 matches all
    # three → the reference assigns each in order, last one (300) wins
    # (deprecated/ZonalRemap.py:185-198).  zone 2: two overlapping, null
    # zval on the later one → default wins over the earlier concrete val.
    "zone_id": [1, 1, 1, 2, 2],
    "zmin": [0.0, 2.0, 4.0, 0.0, 1.0],
    "zmax": [10.0, 8.0, 6.0, 9.0, 9.5],
    "zval": [100.0, 200.0, 300.0, 50.0, np.nan],
})


def _reference_remap(v, zb, zones_pdf, default=255.0):
    """Direct replay of the reference loop: every matching interval
    assigns in table order (ZonalRemap.py:185-198) — last match wins."""
    out = v.copy()
    for r in zones_pdf.itertuples():
        lo = -np.inf if np.isnan(r.zmin) else r.zmin
        hi = np.inf if np.isnan(r.zmax) else r.zmax
        val = default if np.isnan(r.zval) else r.zval
        sel = (zb == r.zone_id) & (v > lo) & (v < hi)
        out[sel] = val
    return out


def test_zonal_remap_px_last_match_wins():
    v = np.array([[[5.0, 7.0, 0.5, 5.0, 9.2, 50.0]]], dtype=np.float32)
    zb = np.array([[[1, 1, 1, 2, 2, 1]]], dtype=np.float32)
    px = np.concatenate([v, zb], axis=0)
    out = zonal.zonal_remap(_OVERLAP_ZONES).apply(px, {})[0]
    want = _reference_remap(v[0].astype(np.float64),
                            zb[0].astype(np.int64), _OVERLAP_ZONES)
    np.testing.assert_array_equal(out, want.astype(np.float32))
    # spot values: v=5 zone1 hits all three intervals → last (300);
    # v=7 hits intervals 1+2 → 200; v=0.5 only interval 1 → 100;
    # zone2 v=5 hits both → later null-zval interval wins → default 255;
    # zone2 v=9.2 hits only the later interval → 255; unmatched → passthrough
    assert out.ravel().tolist() == [300.0, 200.0, 100.0, 255.0, 255.0, 50.0]


def test_zonal_remap_col_matches_px_on_overlaps(spark):
    rows = [(1, 5.0), (1, 7.0), (1, 0.5), (2, 5.0), (2, 9.2), (1, 50.0)]
    df = spark.createDataFrame(rows, "zone_id long, v double")
    zones = spark.createDataFrame(_OVERLAP_ZONES)
    out = spatial.zonal_remap_col(df, zones, "v").toPandas()
    got = {(int(r.zone_id), r.v): r.v_remap for r in out.itertuples()}
    assert got == {(1, 5.0): 300.0, (1, 7.0): 200.0, (1, 0.5): 100.0,
                   (2, 5.0): 255.0, (2, 9.2): 255.0, (1, 50.0): 50.0}


def test_zonal_remap_engine_paths_agree_on_fixture(spark):
    """Both engine paths give identical answers over the standard fixture
    zones (single-interval) AND the overlapping table above."""
    for zp in (fixtures.zones_pdf(8), _OVERLAP_ZONES):
        vals = np.linspace(0.0, 130.0, 27)
        zids = np.resize(zp.zone_id.to_numpy(), vals.size)
        px = np.stack([vals, zids.astype(np.float64)])[:, None, :]
        px_out = zonal.zonal_remap(zp).apply(px.astype(np.float32), {})[0].ravel()
        df = spark.createDataFrame(
            [(int(z), float(v)) for z, v in zip(zids, vals)],
            "zone_id long, v double")
        col_out = (spatial.zonal_remap_col(df, spark.createDataFrame(zp),
                                           "v")
                   .select("zone_id", "v", "v_remap").toPandas())
        got = {(int(r.zone_id), round(r.v, 6)): r.v_remap
               for r in col_out.itertuples()}
        for z, v, want in zip(zids, vals, px_out):
            assert got[(int(z), round(v, 6))] == pytest.approx(float(want)), \
                (z, v)


# ------------------------------------------------ snapshots empty commits --


def _df(spark, ids, pval):
    return (spark.range(*ids).withColumnRenamed("id", "image_id")
            .withColumn("p_cell", F.lit(pval))
            .withColumn("v", (F.col("image_id") * 3).cast("long")))


def test_incremental_over_empty_default_commit(spark, tmp_path):
    """A default-layout commit whose only files are zero-row fallbacks
    must be readable incrementally: _table_of must classify the fallback
    part file as the default table (None), and the range returns an empty
    frame with the right schema instead of raising."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    full = _df(spark, (0, 5), "a")
    s1 = t.append(full, "p_cell", run_id="r1")
    s2 = t.append(full.filter("image_id < 0"), "p_cell", run_id="r2")
    inc = t.read_incremental(s1, s2)
    assert inc.count() == 0
    assert inc.columns == full.columns
    # and the whole-table read still sees only the real rows
    assert t.read().count() == 5


def test_incremental_empty_range_named_table(spark, tmp_path):
    """A named dataset that got nothing in the range yields an empty
    frame with its schema (pre-r6: zero-path parquet read raised)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    full = _df(spark, (0, 4), "a")
    t.append_tables({"stats": (full, "p_cell"),
                     "pairs": (full, "p_cell")}, run_id="b0")
    s1 = t.current_id
    # commit where ONLY pairs gets rows is not expressible via
    # append_tables (atomic across both) — emulate with an empty stats df
    t.append_tables({"stats": (full.filter("image_id < 0"), "p_cell"),
                     "pairs": (full, "p_cell")}, run_id="b1")
    inc = t.read_incremental(s1, table="stats")
    assert inc.count() == 0 and "image_id" in inc.columns


def test_compact_mixed_none_and_string_partitions(spark, tmp_path):
    """compact() over a table holding both empty-commit fallback files
    (partition=None) and real string partitions must not TypeError in the
    summary sort (pre-r6: sorted(None vs str) raised, permanently failing
    every maintain() cadence)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    empty = _df(spark, (0, 3), "x").filter("image_id < 0")
    for i in range(3):               # several fallback files under None
        t.append(empty, "p_cell", run_id=f"e{i}")
    for i in range(3):               # several small files under 'a'
        t.append(_df(spark, (i, i + 1), "a"), "p_cell", run_id=f"f{i}")
    sid = t.compact(min_files_per_value=2, run_id="c0")
    assert sid == t.current_id
    summary = t.snapshots()[-1]["summary"]
    assert all(isinstance(x, str) for x in summary["compacted_values"])
    assert t.read().count() == 3     # rows survive compaction


# ------------------------------------------------- lineage empty first run -


def test_checkpointed_write_first_run_all_empty(spark, tmp_path):
    """First run where every todo bucket is empty: the dynamic overwrite
    writes no parquet files, so the metrics read-back has nothing to read
    — it must fall back to recording every bucket as written-empty
    instead of raising (pre-r6: 'Unable to infer schema')."""
    path = str(tmp_path / "ckpt")
    df = spark.range(0, 10).withColumnRenamed("id", "k").filter("k < 0")
    m = lineage.checkpointed_write(df, path, "k", n_buckets=8, run_id="r1")
    assert len(m["buckets"]) == 8
    assert all(b["rows"] == 0 for b in m["buckets"].values())
    # resume is a no-op (manifest complete)
    m2 = lineage.checkpointed_write(df, path, "k", n_buckets=8, run_id="r2")
    assert [r["run_id"] for r in m2["run_ids"]] == ["r1"]


# --------------------------------------- retention watermark (bounded) -----


def test_watermark_replaces_per_id_tombstones(spark, tmp_path):
    """Sequential batch-<n> run-ids fold into ONE contiguous watermark
    range per prefix; a late replay of any pre-watermark batch is still a
    no-op commit (exactly-once survives retention with O(#sinks) root
    cost instead of O(#expired))."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = t.streaming_sink("p_cell", expire_every=5, keep_last=2)
    for b in range(20):
        sink(_df(spark, (b, b + 1), f"v{b % 3}"), b)
    root = t._root()
    wm = root["expired_seq_watermarks"]["batch"]
    assert wm["lo"] == 0 and wm["hi"] >= 15
    assert not root.get("expired_run_ids")          # no per-id tombstones
    cur, n = t.current_id, t.read().count()
    for b in (0, 7, wm["hi"]):                      # replays across the range
        sink(_df(spark, (b, b + 1), f"v{b % 3}"), b)
        assert t.current_id == cur and t.read().count() == n
    # a batch just ABOVE the watermark that is still in the live log is
    # caught by the log scan, not the watermark
    sink(_df(spark, (19, 20), "v1"), 19)
    assert t.current_id == cur


def test_watermark_root_size_independent_of_history(spark, tmp_path):
    """Root byte size after 60 expired commits equals (±json noise) the
    size after 20 — the watermark makes replay metadata O(1) in total
    history, closing the last O(stream-lifetime) structure."""
    import json

    def run(n_batches):
        t = SnapshotTable(spark, str(tmp_path / f"t{n_batches}"))
        sink = t.streaming_sink("p_cell", expire_every=4, keep_last=2)
        for b in range(n_batches):
            sink(_df(spark, (b, b + 1), "a"), b)
        return len(json.dumps(t._root()))

    s20, s60 = run(20), run(60)
    assert abs(s60 - s20) < 50                      # flat, not linear


def test_gap_and_adhoc_run_ids_take_exact_tombstones(spark, tmp_path):
    """Non-sequential ids and out-of-order gaps keep exact per-id
    tombstones — the exception set — and still no-op on replay."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, (0, 2), "a"), "p_cell", run_id="manual-load")  # "-load" is not -<digits>
    t.append(_df(spark, (2, 4), "a"), "p_cell", run_id="batch-0")
    t.append(_df(spark, (4, 6), "a"), "p_cell", run_id="batch-5")      # gap vs 0
    t.append(_df(spark, (6, 8), "a"), "p_cell", run_id="batch-6")
    t.expire_snapshots(keep_last=1)
    root = t._root()
    assert root["expired_seq_watermarks"]["batch"] == {
        "lo": 0, "hi": 0, "hi_snap": 2}
    assert set(root["expired_run_ids"]) == {"manual-load", "batch-5"}
    cur, n = t.current_id, t.read().count()
    for rid in ("manual-load", "batch-0", "batch-5"):
        t.append(_df(spark, (0, 2), "a"), "p_cell", run_id=rid)
        assert t.current_id == cur and t.read().count() == n


def test_maintain_compact_ordinal_is_contiguous(spark, tmp_path):
    """maintain()'s compaction run-ids are the contiguous ordinal
    (compaction-1, compaction-2, …) so they fold into the watermark too."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink_pcol = "p_cell"
    for b in range(8):
        t.append(_df(spark, (b, b + 1), "a"), sink_pcol, run_id=f"batch-{b}")
        t.maintain(b, compact_every=3)
    rids = [s.get("run_id") for s in t.snapshots()]
    assert "compaction-1" in rids and "compaction-2" in rids
    t.expire_snapshots(keep_last=1)
    root = t._root()
    assert root["expired_seq_watermarks"]["compaction"]["lo"] == 1
    assert not root.get("expired_run_ids")


def test_zonal_remap_col_explicit_ordinal_survives_shuffle(spark):
    """A zones frame with a shuffle in its lineage has arbitrary row
    order — the explicit ordinal_col keeps last-match-wins deterministic
    and identical to the table-order result."""
    zp = _OVERLAP_ZONES.copy()
    zp["ord"] = range(len(zp))
    zones = (spark.createDataFrame(zp)
             .repartition(8, "zval"))            # destroys row order
    df = spark.createDataFrame(
        [(1, 5.0), (1, 7.0), (2, 5.0)], "zone_id long, v double")
    out = spatial.zonal_remap_col(df, zones, "v", ordinal_col="ord").toPandas()
    got = {(int(r.zone_id), r.v): r.v_remap for r in out.itertuples()}
    assert got == {(1, 5.0): 300.0, (1, 7.0): 200.0, (2, 5.0): 255.0}


def test_feature_service_empty_edges(spark):
    """Zero-feature responses and empty zone maps are routine service
    answers — they must yield typed empty frames, not pandas-inference
    crashes."""
    import json
    import pytest
    from raster_functions_spark.sources import feature_service as fs

    z = fs.zones_from_json(spark, "{}")
    assert z.count() == 0
    assert [f.name for f in z.schema.fields] == ["zone_id", "zmin",
                                                 "zmax", "zval"]
    doc = {"fields": [{"name": "OBJECTID", "type": "esriFieldTypeOID"},
                      {"name": "name", "type": "esriFieldTypeString"},
                      {"name": "area", "type": "esriFieldTypeDouble"}],
           "features": []}
    df = fs.features_from_service_json(spark, doc, where="area > 0")
    assert df.count() == 0
    assert dict(df.dtypes) == {"OBJECTID": "bigint", "name": "string",
                               "area": "double"}
    with pytest.raises(ValueError, match="fields metadata"):
        fs.features_from_service_json(spark, {"features": []})
    with pytest.raises(ValueError, match="neither"):
        fs.envelope_filter(spark.range(3), 0, 0, 1, 1)
