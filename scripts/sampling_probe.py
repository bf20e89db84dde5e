"""Scale probe: exact stratified sampling — broadcast-threshold
prefilter vs the naive full-table window (BENCH/notes_r6.md §12).

Synthesizes a parquet corpus distributedly (spark.range → pure column
math → write, no driver data): ``uniform`` = 5M rows / 60 even strata;
``skew`` = 20M rows with stratum s0 holding 50% (the boilerplate-lang
shape real crawls have). Draws the identical exact n-per-stratum sample
both ways, interleaved 3× (min-of-trials, per BENCH/BASELINE.md
protocol — first trials carry page-cache/JVM-warmup noise), and asserts
value-identity. The payload-length sum in the verification aggregate
forces full documents (not just keys) through the naive window shuffle —
no column-pruning escape hatch.

Usage: python scripts/sampling_probe.py [uniform|skew]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from raster_functions_spark import sampling
from raster_functions_spark.session import get_spark

N_PER = 50


def build(spark, mode: str):
    if mode == "uniform":
        n_rows, path = 5_000_000, "/tmp/sampling_probe_uniform"
        stratum = F.concat(F.lit("s"), (F.col("id") % 60).cast("string"))
    else:
        n_rows, path = 20_000_000, "/tmp/sampling_probe_skew"
        stratum = (F.when(F.col("id") % 2 == 0, "s0")
                   .otherwise(F.concat(F.lit("s"),
                                       (F.col("id") % 59 + 1).cast("string"))))
    if not os.path.exists(path + "/_SUCCESS"):
        (spark.range(0, n_rows, 1, 32)
         .select(F.col("id").alias("k"), stratum.alias("stratum"),
                 F.repeat(F.md5(F.col("id").cast("string")), 12)
                 .alias("payload"))   # ~400 B/row document stand-in
         .write.mode("overwrite").parquet(path))
    return spark.read.parquet(path), n_rows


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "skew"
    spark = get_spark("sampling-probe", cores=16, shuffle_partitions=32)
    corpus, n_rows = build(spark, mode)
    corpus.count()

    def engine():
        p = sampling.sample_stratified_exact(
            corpus, ["stratum"], N_PER, "k", seed=13)
        return tuple(p.agg(F.sum("k"), F.count("*"),
                           F.sum(F.length("payload"))).first())

    def naive():
        w = Window.partitionBy("stratum").orderBy("_u60", "k")
        nv = (corpus.withColumn("_u60", sampling.u60_col(F.col("k"), 13))
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= N_PER).drop("_u60", "_rn"))
        return tuple(nv.agg(F.sum("k"), F.count("*"),
                            F.sum(F.length("payload"))).first())

    te, tn, res = [], [], set()
    for _ in range(3):
        t0 = time.time(); res.add(naive()); tn.append(time.time() - t0)
        t0 = time.time(); res.add(engine()); te.append(time.time() - t0)

    print(f"mode={mode} rows={n_rows:,} strata=60 n_per={N_PER}")
    print(f"naive full-window trials: {[round(x, 2) for x in tn]} "
          f"min {min(tn):.2f}s (window shuffles all {n_rows:,} rows)")
    print(f"engine prefilter trials:  {[round(x, 2) for x in te]} "
          f"min {min(te):.2f}s (window sees ~{2 * N_PER * 60:,} rows)")
    print(f"identical sample: {len(res) == 1}")
    spark.stop()
    return 0 if len(res) == 1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
