import os

import numpy as np
from pyspark.sql import functions as F

from raster_functions_spark import fixtures, lineage, pipeline


def test_decode_features_fidelity(spark):
    feats = pipeline.decode_features(fixtures.images_df(spark, 200)).toPandas()
    assert len(feats) == 200
    # lossless formats: recomputed phash == stored (hamming 0)
    lossless = feats[feats.fmt != "dct"]
    assert (lossless.phash_ham == 0).all()
    # lossy: within near-dup tolerance
    assert (feats[feats.fmt == "dct"].phash_ham <= 16).all()
    # captions intact
    for _, r in feats.head(20).iterrows():
        i = int(r.image_id[3:])
        assert r.caption == f"caption-{i}-{int(fixtures.splitmix64(i)):016x}"


def test_flagship_end_to_end(spark):
    out = pipeline.flagship(spark, fixtures.images_df(spark, 500),
                            fixtures.aoi_df(spark, 20)).toPandas()
    assert len(out) >= 1
    assert out.n_images.sum() >= 90  # hot cluster guarantees aoi 0 hits ~20%
    assert 0 in out.aoi_id.to_numpy()


def test_entry_contract(spark):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as em
    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30 and len(oracles) >= 25


def test_checkpointed_write_resume(spark, tmp_path):
    path = str(tmp_path / "ckpt")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    m1 = lineage.checkpointed_write(df, path, "id", n_buckets=8, run_id="r1")
    assert len(m1["buckets"]) == 8
    got = lineage.read_checkpointed(spark, path)
    assert got.count() == 1000
    # resume: nothing to do, manifest unchanged
    m2 = lineage.checkpointed_write(df, path, "id", n_buckets=8, run_id="r2")
    assert m2 == m1
    # partial manifest → only missing buckets written. The tamper goes
    # through the same Hadoop-FS manifest API the engine uses (writing the
    # file behind the FS's back would leave a stale checksum sidecar —
    # exactly the failure mode the FS-based manifest exists to prevent on
    # S3/HDFS outputs).
    m = lineage._read_manifest(spark, path)
    dropped = m["buckets"].pop("3")
    lineage._write_manifest(spark, path, m)
    m3 = lineage.checkpointed_write(df, path, "id", n_buckets=8, run_id="r3")
    assert m3["buckets"]["3"]["run_id"] == "r3"
    assert m3["buckets"]["3"]["rows"] == dropped["rows"]
    assert m3["buckets"]["3"]["key_checksum"] == dropped["key_checksum"]
    assert lineage.read_checkpointed(spark, path).count() == 1000
    # metrics side table
    mt = lineage.metrics_table(spark, path).toPandas()
    assert mt.rows.sum() == 1000 and len(mt) == 8


def test_flagship_tolerates_corrupt_payloads(spark):
    """Corrupt image bytes must not kill the job: marked phash_ham=-1,
    NaN stats excluded from means, counted in n_bad."""
    import pandas as pd
    from pyspark.sql import functions as F
    from raster_functions_spark import spatial

    pdf = fixtures.images_pdf(np.arange(200))
    # corrupt 10 payloads inside the hot cluster (guaranteed AOI-0 hits)
    hot = pdf.index[np.arange(200) % 5 == 0][:10]
    pdf.loc[hot, "bytes"] = b"\x00garbage"
    images = spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)
    out = pipeline.flagship(spark, images, fixtures.aoi_df(spark, 10)).toPandas()
    assert len(out) >= 1
    row0 = out[out.aoi_id == 0].iloc[0]
    assert row0.n_bad >= 1                       # corrupt rows surfaced
    assert np.isfinite(row0.mean_px)             # NaN rows excluded from mean
    assert row0.max_phash_ham >= -1


def test_flagship_clean_run_has_zero_bad(spark):
    out = pipeline.flagship(spark, fixtures.images_df(spark, 300),
                            fixtures.aoi_df(spark, 10)).toPandas()
    assert (out.n_bad == 0).all()


def test_incremental_flagship_matches_batch(spark, tmp_path):
    """The materialized-view flagship: two image microbatches committed as
    snapshot partials merge to the SAME per-AOI stats as one batch run
    over all images (n_cells via cross-batch pair dedup), and a replayed
    batch commit is a no-op."""
    import numpy as np
    from raster_functions_spark import fixtures, pipeline
    from raster_functions_spark.snapshots import SnapshotTable

    images = fixtures.images_df(spark, 400).cache()
    aoi = fixtures.aoi_df(spark, 12)
    full = {r["aoi_id"]: r.asDict()
            for r in pipeline.flagship(spark, images, aoi).collect()}

    src = str(tmp_path / "imgs")
    images.filter("image_id < 'img000000200'").coalesce(1) \
        .write.parquet(src + "/a")
    images.filter("image_id >= 'img000000200'").coalesce(1) \
        .write.parquet(src + "/b")
    stream = (spark.readStream.schema(images.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    vp = str(tmp_path / "view")
    q = pipeline.start_flagship_incremental(
        stream, aoi, vp, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    # ONE commit per microbatch covering both datasets (atomic view update)
    assert [s["run_id"] for s in SnapshotTable(spark, vp).snapshots()] \
        == ["batch-0", "batch-1"]
    live = {r["aoi_id"]: r.asDict()
            for r in pipeline.current_flagship(spark, vp).collect()}
    assert set(live) == set(full)
    for a in full:
        for col in ("n_images", "n_cells", "max_phash_ham", "n_bad"):
            assert live[a][col] == full[a][col], (a, col)
        for col in ("mean_px", "mean_std"):
            assert abs(live[a][col] - full[a][col]) <= 2e-6, (a, col)
    # replayed commit: no-op
    b0 = images.filter("image_id < 'img000000200'")
    p0 = pipeline.flagship_batch_partials(spark, b0, aoi)
    SnapshotTable(spark, vp).append_tables(
        {"partials": (p0.withColumn("_vb", F.pmod(F.col("aoi_id"), F.lit(16))
                                    .cast("long")), "_vb")},
        run_id="batch-0")
    live2 = {r["aoi_id"]: r["n_images"]
             for r in pipeline.current_flagship(spark, vp).collect()}
    assert live2 == {a: full[a]["n_images"] for a in full}
