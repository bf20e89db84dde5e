"""SparkSession factory tuned for the tiling engine.

Local-mode defaults mirror what we would set per-executor on a real cluster:
AQE on (runtime skew-join splitting + partition coalescing), shuffle
partitions ~ cores, Arrow enabled for all pandas-UDF traffic, UTC session
timezone (required for DuckDB-oracle comparisons), and BLAS/OMP pinned to one
thread per task so NumPy kernels inside Arrow batches don't oversubscribe
cores (the reference pins BLAS threads the same way:
/root/reference/functions/LandsatMedianImage.py:4-9).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Pin NumPy/BLAS threads before NumPy is imported anywhere on workers.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
    os.environ.setdefault(_v, "1")


def get_spark(app_name: str = "raster_functions_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``cores=None`` → ``local[*]`` unless a master is already configured.
    spark-submit sets ``spark.master`` as a system property BEFORE this
    builder runs, and an unconditional ``.master()`` here would OVERRIDE
    --master yarn/k8s and silently run a cluster job on the driver node —
    so the local default applies only when no master is configured and
    ``cores`` was not explicitly requested.
    """
    n = cores or os.cpu_count() or 8
    from pyspark import SparkConf
    has_master = SparkConf().contains("spark.master")
    sp = shuffle_partitions or max(n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # (r7: an 8× initialPartitionNum over-partitioning experiment was
        # measured and REVERTED — alternating same-window A/B at sf1.0
        # showed it 0.6-0.9s slower on the heaviest query in every trial;
        # more shuffle blocks + AQE coalescing overhead, no win.)
        # Floor on scan parallelism (guide §6): a table whose file count ×
        # size lands under maxPartitionBytes scans as ONE task no matter
        # how many cores exist (sf1.0 lineitem = 126 MB = 1 split, so
        # every lineitem query ran its scan + partial agg on one core).
        # A floor is scale-neutral: large tables already exceed it.
        .config("spark.sql.files.minPartitionNum", str(n))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if cores is not None:
        # explicit local-parallelism request (tests/benches) — intentional
        builder = builder.master(f"local[{cores}]")
    elif not has_master:
        builder = builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ensure_min_parallelism(df, bytes_per_core: int = 4 * 1024 * 1024):
    """Round-robin a SMALL input up to cluster parallelism.

    Parquet effective scan parallelism is bounded by row-group count, not
    split count — a one-row-group table puts EVERY row in one task no
    matter what minPartitionNum says, which serializes any heavy per-row
    stage built on it (the r7 profile: the whole minhash signature kernel
    and the langid marker scoring each ran on a single core). The rule is
    size-based and self-limiting: repartition only when the total input is
    under cores × ``bytes_per_core`` — exactly the regime where the extra
    exchange is trivially cheap. Large tables (unknowable sizes included)
    are NEVER repartitioned, so the helper is a no-op at 100-TB scale.
    Row-wise downstream results are partitioning-invariant."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    total = 0
    for uri in files:
        if not uri.startswith("file:"):
            return df            # non-local FS: cannot stat cheaply — skip
        path = uri[5:]
        while path.startswith("//"):
            path = path[1:]
        try:
            total += os.path.getsize(path)
        except OSError:
            return df
    if total >= cores * bytes_per_core:
        return df
    return df.repartition(cores)


def package_zip(path: str | None = None) -> str:
    """Zip this package for ``spark-submit --py-files`` / ``addPyFile``.

    The north rule requires the engine to run via ``spark-submit
    --py-files`` on multi-executor clusters; this builds that artifact."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = path or os.path.join(tempfile.gettempdir(), "raster_functions_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("raster_functions_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    the driver's cwd (equivalent of launching with --py-files). The repo's
    `__spark_entry__.py` ships too when present: its module-level helpers
    (per-tile stat lambdas) are pickled BY REFERENCE into mapInPandas
    closures, so executors must be able to import the module even when the
    driver was launched from another directory."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context, or non-local FS restrictions
    entry = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "__spark_entry__.py")
    if os.path.exists(entry):
        try:
            spark.sparkContext.addPyFile(entry)
        except Exception:
            pass
