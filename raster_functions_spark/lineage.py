"""Checkpoint-resumable writes with per-partition lineage + metrics tables.

North-rule ops hardening: runs are resumable from checkpoint with
per-partition lineage and metrics (BASELINE.json north_rule). Mechanism:

- output is hash-bucketed on a stable key into ``n_buckets`` deterministic
  buckets (``pmod(xxhash64(key), n))`` — content-addressed, parallelism-
  independent);
- each bucket is written to ``<path>/bucket=<b>/`` exactly once; a manifest
  row (bucket, rows, written_at_run) is appended only after the bucket's
  files are committed;
- a resumed run reads the manifest and processes ONLY missing buckets —
  idempotent overwrite-by-bucket, the parquet/no-Iceberg equivalent of
  Iceberg's overwrite-by-filter.

Metrics per bucket (row count, value checksum) double as the per-partition
integrity table a 1000-executor run needs for auditing.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def bucketed(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)))


def _read_manifest(path: str) -> dict:
    p = os.path.join(path, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"run_ids": [], "buckets": {}}


def _write_manifest(path: str, m: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))


def checkpointed_write(df: DataFrame, path: str, key_col: str,
                       n_buckets: int = 16, run_id: str | None = None) -> dict:
    """Write ``df`` bucketed by ``key_col``; skip buckets already in the
    manifest (resume). Returns the manifest. Deterministic input ⇒ the
    union of any interleaving of runs equals the single-run output."""
    run_id = run_id or f"run-{int(time.time())}"
    manifest = _read_manifest(path)
    done = set(map(int, manifest["buckets"]))
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        return manifest
    b = bucketed(df, key_col, n_buckets).filter(F.col("bucket").isin(todo))
    (b.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path))
    # metrics per bucket: counts + order-insensitive checksum of the key
    metrics = (b.groupBy("bucket")
               .agg(F.count("*").alias("rows"),
                    F.sum(F.crc32(F.col(key_col).cast("string"))).alias("key_checksum"))
               .collect())
    manifest = _read_manifest(path)
    for r in metrics:
        manifest["buckets"][str(r["bucket"])] = {
            "rows": r["rows"], "key_checksum": r["key_checksum"], "run_id": run_id}
    manifest["run_ids"].append({"run_id": run_id, "at": time.time(),
                                "buckets_written": [r["bucket"] for r in metrics]})
    _write_manifest(path, manifest)
    return manifest


def read_checkpointed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_cell_partitioned(df: DataFrame, path: str, lon_col: str = "lon",
                           lat_col: str = "lat", res: int = 3,
                           date_col: str | None = None) -> None:
    """Materialize an image/feature table partitioned by coarse parent cell
    (and optionally date) — the layout that makes spatial predicates prune
    files (SURVEY.md O2): a bbox query covers a handful of parent cells, so
    the scan touches only those directories. Partition count = 8^res-ish;
    res 3 ≈ 64 partitions globally (tune to cluster file-size targets)."""
    from . import grid
    out = df.withColumn("p_cell", grid.encode_col(F.col(lon_col), F.col(lat_col), res))
    cols = ["p_cell"] + ([date_col] if date_col else [])
    out.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_cells(spark: SparkSession, path: str,
               bbox: tuple[float, float, float, float], res: int = 3,
               lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Exact bbox read over a cell-partitioned table: the cell-cover IN
    list prunes PARTITIONS (directories never opened) and the bbox
    predicate prunes ROWS (pushed into the parquet scan) — the two-level
    spatial-predicate rewrite of SURVEY.md O2/O4."""
    from . import grid
    xmin, ymin, xmax, ymax = bbox
    cells = [int(c) for c in grid.cover_bbox(xmin, ymin, xmax, ymax, res)]
    df = spark.read.parquet(path)
    return df.where(F.col("p_cell").isin(cells)
                    & (F.col(lon_col) >= xmin) & (F.col(lon_col) <= xmax)
                    & (F.col(lat_col) >= ymin) & (F.col(lat_col) <= ymax))


def metrics_table(spark: SparkSession, path: str) -> DataFrame:
    """The per-partition metrics as a DataFrame (lineage side table)."""
    m = _read_manifest(path)
    rows = [(int(b), v["rows"], v["key_checksum"], v["run_id"])
            for b, v in m["buckets"].items()]
    return spark.createDataFrame(rows, "bucket int, rows long, key_checksum long, run_id string")
