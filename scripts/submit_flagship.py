"""Flagship job for ``spark-submit --py-files`` (north-rule launch mode).

Build the artifact and submit:

    python -c "from raster_functions_spark.session import package_zip; \\
               print(package_zip('/tmp/rfs.zip'))"
    spark-submit --master local[32] \\
        --py-files /tmp/rfs.zip \\
        --conf spark.sql.shuffle.partitions=32 \\
        scripts/submit_flagship.py <n_images> <out_dir>

On a real cluster replace --master and add executor sizing; nothing in the
job is local-mode-specific. The job is checkpoint-resumable: re-submitting
with the same out_dir skips completed buckets via the manifest.
"""

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/flagship_out"

    spark = SparkSession.builder.appName("rfs-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from --py-files on both driver and executors
    from raster_functions_spark import fixtures, lineage, pipeline

    t0 = time.time()
    aoi = fixtures.aoi_df(spark, 200)
    result = pipeline.flagship_from_seed(spark, n_images, aoi, partitions=256)
    manifest = lineage.checkpointed_write(result, out_dir, "aoi_id",
                                          n_buckets=8, run_id=f"submit-{int(t0)}")
    dt = time.time() - t0
    print("FLAGSHIP_RESULT " + json.dumps({
        "n_images": n_images, "wall_sec": round(dt, 2),
        "images_per_sec": round(n_images / dt, 1),
        "buckets": len(manifest["buckets"]),
        "rows": spark.read.parquet(out_dir).count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
