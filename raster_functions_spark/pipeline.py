"""The flagship end-to-end pipeline (BASELINE.json metric):

    decode → cell-encode → point-in-polygon join → tile assign → zonal stats

One fused mapInPandas pass decodes each image ONCE and emits scalar
features + fidelity checks (caption passthrough is structural: the column
is never touched). Cell-encode is a pure Column expression (codegen). The
PIP join picks broadcast vs partitioned by vector-side size. Zonal stats
are a plain hash aggregation. Total: one Python pass over pixels + (at
most) one shuffle for the join + one for the agg — the minimum possible.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec, grid, spatial


def _auto_ship(spark: SparkSession) -> None:
    from .session import ship_package
    ship_package(spark)


def decode_features(images: DataFrame, cell_res: int = 7) -> DataFrame:
    """Fused decode + per-tile features + fidelity columns + cell id.

    Emits: image_id, caption, lon, lat, fmt, phash_ham (hamming of the
    recomputed phash vs the stored one — the fidelity gate; -1 marks an
    undecodable payload), px_mean/px_std (NaN when undecodable), n_px,
    cell. The decode is PERMISSIVE, same rule as the fused broadcast
    path (_decode_feature_arrays): this function feeds the partitioned
    (large-AOI) flagship route, which must not die on corrupt rows
    either."""
    _auto_ship(images.sparkSession)
    out_schema = T.StructType([
        images.schema["image_id"], images.schema["caption"],
        images.schema["lon"], images.schema["lat"],
        T.StructField("fmt", T.StringType()),
        T.StructField("phash_ham", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("px_std", T.DoubleType()),
        T.StructField("n_px", T.LongType()),
    ])

    def run(batches):
        for pdf in batches:
            mean, std, ham, npx = _decode_feature_arrays(pdf)
            out = pdf[["image_id", "caption", "lon", "lat", "fmt"]].copy()
            out["phash_ham"] = ham
            out["px_mean"] = mean
            out["px_std"] = std
            out["n_px"] = npx
            yield out

    feats = images.mapInPandas(run, schema=out_schema)
    return feats.withColumn("cell", grid.encode_col(F.col("lon"), F.col("lat"), cell_res))


def tile_assign(features: DataFrame, aoi: DataFrame,
                broadcast_threshold: int = 10000, **pip_kwargs) -> DataFrame:
    """Assign each image to (cell, aoi) — the join-output rows the baseline
    grades. Deterministic: cell ids are bit-exact, PIP edge rule half-open."""
    return spatial.pip_join(features, aoi, broadcast_threshold=broadcast_threshold,
                            **pip_kwargs)


def _zonal_agg(assigned: DataFrame) -> DataFrame:
    """Batch flagship aggregation — expressed as the MERGE of the same
    decomposable partials the incremental view commits
    (_assigned_partials → merge_flagship_partials), so the batch and
    materialized-view paths share one definition of every statistic and
    cannot drift."""
    return merge_flagship_partials(_assigned_partials(assigned))


def flagship_modular(spark: SparkSession, images: DataFrame, aoi: DataFrame,
                     cell_res: int = 7) -> DataFrame:
    """Composable variant: separate decode / join / agg stages. Each
    mapInPandas stage spawns its own Python worker per task, so prefer
    :func:`flagship` (fused) for throughput."""
    feats = decode_features(images, cell_res)
    assigned = tile_assign(feats, aoi)
    return _zonal_agg(assigned)


def flagship_assigned(spark: SparkSession, images: DataFrame, aoi: DataFrame,
                      cell_res: int = 7,
                      broadcast_threshold: int = 10000) -> DataFrame:
    """decode → cell-encode → PIP join with ONE fused Python
    pass (SURVEY.md O11): decode, features, vectorized cell-encode, bbox
    prefilter and exact PIP all happen on each Arrow batch in a single
    worker; the only shuffle in the whole plan is the final zonal groupBy.

    At N tasks this runs exactly N Python workers (the chained-stage
    variant runs 3N — a 3× oversubscription that inverts local-mode
    scaling and wastes executor memory on a real cluster).

    Routing: the fused path materializes the AOI table on the driver and
    broadcasts it, which is the right call for the typical few-thousand-
    polygon case but a ceiling at millions of polygons. The same bounded
    probe as spatial.pip_join (limit N+1, never a full count) routes
    oversized vector sides to the fused-decode + cell-cover partitioned
    join, which never touches the driver."""
    _auto_ship(spark)
    prep = prepare_aoi(spark, aoi, broadcast_threshold)
    return flagship_assigned_prepared(spark, images, prep, cell_res)


_ASSIGNED_SCHEMA = ("aoi_id long, image_id string, caption string, cell long, "
                    "px_mean double, px_std double, phash_ham int")


def prepare_aoi(spark: SparkSession, aoi: DataFrame,
                broadcast_threshold: int = 10000):
    """One-time AOI preparation for the fused flagship: bounded-probe
    routing decision + (broadcast route) ONE collect + ONE broadcast.
    Streaming sinks MUST call this once outside their per-batch closure —
    re-probing/re-collecting/re-broadcasting a static dim per microbatch
    runs extra driver jobs every batch and leaks one broadcast per batch
    (they are never destroyed)."""
    n_aoi = aoi.limit(broadcast_threshold + 1).count()
    if n_aoi > broadcast_threshold:
        return ("partitioned", aoi)
    return ("broadcast", spatial.broadcast_aoi(spark, aoi))


def flagship_assigned_prepared(spark: SparkSession, images: DataFrame,
                               prep, cell_res: int = 7) -> DataFrame:
    """The per-batch half of flagship_assigned, reusing a prepare_aoi
    result (see prepare_aoi for why streaming callers need the split)."""
    kind, payload = prep
    if kind == "partitioned":
        feats = decode_features(images, cell_res)
        return spatial.pip_join_partitioned(feats, payload)
    baoi = payload

    def run(batches):
        a = baoi.value
        for pdf in batches:
            n = len(pdf)
            x = pdf["lon"].to_numpy(np.float64)
            y = pdf["lat"].to_numpy(np.float64)
            cells = grid.encode_np(x, y, cell_res)
            mean, std, ham, _npx = _decode_feature_arrays(pdf)
            # shared broadcast-PIP kernel (spatial.pip_assign_np): AOI-
            # chunked bbox prefilter + exact crossing-number refine
            ridx, aid = spatial.pip_assign_np(a, x, y)
            yield pd.DataFrame({
                "aoi_id": aid,
                "image_id": pdf["image_id"].to_numpy()[ridx],
                "caption": pdf["caption"].to_numpy()[ridx],
                "cell": cells[ridx],
                "px_mean": mean[ridx], "px_std": std[ridx],
                "phash_ham": ham[ridx],
            })

    return images.mapInPandas(run, schema=_ASSIGNED_SCHEMA)


def _decode_feature_arrays(pdf: pd.DataFrame):
    """Permissive per-image decode+features over one Arrow batch — ONE
    definition for every flagship path: a corrupt payload at 10^12-row
    scale is a certainty; mark it (phash_ham = -1, NaN stats), never kill
    the task (rows stay joinable/countable downstream)."""
    n = len(pdf)
    mean = np.empty(n); std = np.empty(n); ham = np.empty(n, np.int32)
    npx = np.zeros(n, np.int64)
    bufs = pdf["bytes"].to_numpy()
    hashes = pdf["phash"].to_numpy()
    for i in range(n):
        try:
            px = codec.decode(bytes(bufs[i]))
            ham[i] = codec.hamming64(codec.phash64(px), int(hashes[i]))
            f = px.astype(np.float64)
            mean[i] = f.mean(); std[i] = f.std(); npx[i] = f.size
        except Exception:
            ham[i] = -1
            mean[i] = np.nan; std[i] = np.nan
    return mean, std, ham, npx


def flagship(spark: SparkSession, images: DataFrame, aoi: DataFrame,
             cell_res: int = 7, broadcast_threshold: int = 10000) -> DataFrame:
    """The headline query: fused assigned rows (flagship_assigned) → zonal
    aggregation. See flagship_assigned for the fusion/routing story."""
    return _zonal_agg(flagship_assigned(spark, images, aoi, cell_res,
                                        broadcast_threshold))


def flagship_from_seed(spark: SparkSession, n_images: int, aoi: DataFrame,
                       cell_res: int = 7, partitions: int | None = None) -> DataFrame:
    """Fully fused flagship from the deterministic generator: ONE Python
    pass per task does synthesize→encode→decode→features→cell→PIP; the only
    shuffle is the zonal agg, and no image bytes ever cross the JVM↔Python
    boundary. This is the CPU-bound variant used for scaling-efficiency
    evidence (the sandbox's virtio disk throttles unpredictably, so a
    disk-backed scan measures the hypervisor, not the engine — see
    BENCH/BASELINE.md).

    ``partitions=None`` → data-proportional task sizing: ~2000 images per
    task, floored at 2 waves per core. Measured (BENCH/notes_r3.md): with
    ~400-image tasks the per-task Arrow/worker round trip (~10-17 ms) is a
    fixed floor that scales at only ~0.4 efficiency and capped the whole
    pipeline's 8→32 scaling; ~1500-2000-image tasks put it under 2% of
    task wall. The rule stays data-proportional, so at 10^9 images it
    yields ~500k tasks, not a fixed 64."""
    _auto_ship(spark)
    if partitions is None:
        cores = spark.sparkContext.defaultParallelism
        partitions = max(2 * cores, (n_images + 1999) // 2000)
    from . import fixtures
    baoi = spatial.broadcast_aoi(spark, aoi)

    def run(batches):
        a = baoi.value
        for idx_pdf in batches:
            # zlib_level=3: the encoded bytes are decoded two lines down
            # and never leave this function — level 3 is ~1.8× faster to
            # compress and slightly smaller on this data (codec.encode)
            pdf = fixtures.images_pdf(idx_pdf["id"].to_numpy(), zlib_level=3)
            x = pdf["lon"].to_numpy(np.float64)
            y = pdf["lat"].to_numpy(np.float64)
            cells = grid.encode_np(x, y, cell_res)
            mean, std, ham, _npx = _decode_feature_arrays(pdf)
            ridx, aid = spatial.pip_assign_np(a, x, y)
            yield pd.DataFrame({
                "aoi_id": aid,
                "image_id": pdf["image_id"].to_numpy()[ridx],
                "caption": pdf["caption"].to_numpy()[ridx],
                "cell": cells[ridx],
                "px_mean": mean[ridx], "px_std": std[ridx],
                "phash_ham": ham[ridx],
            })

    assigned = (spark.range(0, n_images, 1, partitions)
                .mapInPandas(run, schema=_ASSIGNED_SCHEMA))
    return _zonal_agg(assigned)


def run_benchmark(spark: SparkSession, n_images: int, n_aoi: int = 50,
                  cell_res: int = 7, partitions: int | None = None) -> dict:
    """Timed flagship run → images/sec (the BASELINE.json metric)."""
    from . import fixtures
    t0 = time.time()
    images = fixtures.images_df(spark, n_images, partitions)
    aoi = fixtures.aoi_df(spark, n_aoi)
    result = flagship(spark, images, aoi, cell_res)
    rows = result.collect()
    dt = time.time() - t0
    return {"n_images": n_images, "wall_sec": round(dt, 3),
            "images_per_sec": round(n_images / dt, 1),
            "n_aoi_matched": len(rows)}


# ------------------------------------------------ incremental flagship ----

def _assigned_partials(assigned: DataFrame) -> DataFrame:
    """The decomposable per-(aoi, cell) partial aggregates over
    already-assigned rows — THE single definition both the batch helper
    and the streaming sink share (they must never diverge: the merged
    view is compared against the batch flagship oracle). Grouping by
    (aoi, cell) — instead of r5's per-AOI partials PLUS a separate
    (aoi, cell) pairs dataset — makes n_cells free (it is the group key)
    and collapses the view commit to ONE aggregation and ONE dataset,
    which halved the microbatch fixed cost (BENCH/notes_r6.md §5).
    Cardinality per batch is bounded by AOIs × cells-per-AOI, same as
    the old pairs table, never by image count."""
    ok = lambda c: F.when(~F.isnan(c), F.col(c))
    return (assigned.groupBy("aoi_id", "cell")
            .agg(F.count("*").alias("n_images"),
                 F.sum(ok("px_mean")).alias("s_mean"),
                 F.count(ok("px_mean")).alias("k_mean"),
                 F.sum(ok("px_std")).alias("s_std"),
                 F.count(ok("px_std")).alias("k_std"),
                 F.max("phash_ham").alias("max_phash_ham"),
                 F.sum(F.when(F.col("phash_ham") < 0, 1).otherwise(0))
                 .alias("n_bad")))


def flagship_batch_partials(spark: SparkSession, images: DataFrame,
                            aoi: DataFrame, cell_res: int = 7) -> DataFrame:
    """One batch's contribution to the incremental flagship: the
    decomposable per-(aoi, cell) partial aggregates (see
    _assigned_partials)."""
    return _assigned_partials(flagship_assigned(spark, images, aoi, cell_res))


def start_flagship_incremental(stream_images: DataFrame, aoi: DataFrame,
                               view_path: str, checkpoint: str,
                               cell_res: int = 7,
                               compact_every: int | None = None,
                               expire_every: int | None = None,
                               keep_last: int = 64,
                               view_buckets: int = 16,
                               query_name: str = "flagship-incremental",
                               run_prefix: str = "batch"):
    """The flagship zonal query as a continuously-updatable materialized
    view: each image microbatch runs decode→cell→PIP once, reduces to
    the per-(aoi, cell) decomposable partials (_assigned_partials — ONE
    aggregation; n_cells is the group key, so no second dataset), and
    commits ONE snapshot with run_id=<run_prefix>-<id> — a retried batch
    is a no-op (exactly-once; give each logical stream its own
    run_prefix if the view table can outlive its checkpoint — see
    SnapshotTable.streaming_sink on checkpoint identity). ``current_flagship`` merges at read time.
    Work per batch ∝ batch size; view freshness is one tiny aggregation.

    Per-batch FIXED cost (r6, measured in BENCH/notes_r6.md §5): one
    Spark action per batch (r5 ran two dataset writes off a persisted
    intermediate), and the view partitions on a BUCKET of aoi_id
    (``_vb = aoi_id mod view_buckets``) with the tiny aggregate coalesced
    to one task. Partitioning by raw aoi_id wrote one file+dir per AOI
    VALUE per dataset per batch (~400 filesystem objects/commit at 200
    AOIs — listing, committing and manifesting them was most of the
    ~5s/batch constant the r5 probe measured); bucketing caps it at
    view_buckets objects regardless of AOI count. The view never
    overwrites by AOI, so the only partition-layout consumers are
    compaction (fewer, larger groups — strictly better) and the
    manifest."""
    from .snapshots import SnapshotTable

    spark = stream_images.sparkSession
    vt = SnapshotTable(spark, view_path)
    # static dim: probe + collect + broadcast ONCE for the stream's
    # lifetime (doing it per microbatch leaked one broadcast per batch)
    prep = prepare_aoi(spark, aoi)
    vb = F.pmod(F.col("aoi_id"), F.lit(view_buckets)).cast("long")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = flagship_assigned_prepared(spark, batch_df, prep, cell_res)
        partials = _assigned_partials(assigned)
        vt.append_tables(
            {"partials": (partials.withColumn("_vb", vb).coalesce(1), "_vb")},
            run_id=f"{run_prefix}-{batch_id}")
        vt.maintain(batch_id, compact_every=compact_every,
                    expire_every=expire_every, keep_last=keep_last)

    return (stream_images.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .queryName(query_name).trigger(availableNow=True).start())


def current_flagship(spark: SparkSession, view_path: str) -> DataFrame:
    """Merge the committed partials into the flagship's output schema
    (same columns as :func:`flagship`); consistent at any snapshot."""
    from .snapshots import SnapshotTable

    vt = SnapshotTable(spark, view_path)
    return merge_flagship_partials(vt.read(table="partials"))


def merge_flagship_partials(p: DataFrame) -> DataFrame:
    """Merge per-(aoi, cell) [Σ, count] partials into the flagship's
    output schema — THE one definition of the flagship's statistics,
    used by the batch aggregation (_zonal_agg) and the materialized view
    (current_flagship) alike. n_cells = countDistinct(cell) (the same
    cell recurs across batches; within one batch groups are unique)."""
    return (p.groupBy("aoi_id")
            .agg(F.sum("n_images").alias("n_images"),
                 F.round(F.sum("s_mean") / F.sum("k_mean"), 6).alias("mean_px"),
                 F.round(F.sum("s_std") / F.sum("k_std"), 6).alias("mean_std"),
                 F.countDistinct("cell").alias("n_cells"),
                 F.max("max_phash_ham").alias("max_phash_ham"),
                 F.sum("n_bad").alias("n_bad"))
            .select("aoi_id", "n_images", "mean_px", "mean_std", "n_cells",
                    "max_phash_ham", "n_bad")
            .orderBy("aoi_id"))
