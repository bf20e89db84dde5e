"""Extra benchmarks for optimization round 7 (guide §1.4 noop-sink isolation).

NOT part of the frozen measurement contract (`bench.py` is the driver's
artifact); this file exists so stage-level numbers in OPTIMIZATION_r07.md
are reproducible: each probe times one query (or one internal stage) with
the noop sink so the computation is measured, not the sink.

Usage:
    python bench_extra.py <probe> [...probe]     # e.g. minhash_stages
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py headline
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label: str, make_df, trials: int = TRIALS,
          sink=noop) -> float:
    """min-of-N wall for computing make_df() through the noop sink."""
    best = float("inf")
    for _ in range(trials):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        sink(make_df())
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:50s} {best:8.3f}s", flush=True)
    return best


def get_session():
    from raster_functions_spark.session import get_spark
    return get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)


def probe_minhash_stages(spark):
    """Stage isolation for dedup_minhash_lsh (64 hashes / 16 bands)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from raster_functions_spark import dedup

    docs = entry._t(spark, SF_DIR, "documents")
    print(f"minhash stage isolation @ {SF_DIR}")

    # 0. full query exactly as the frozen bench times it (count())
    qs = entry.queries()
    timed(spark, "full query (bench methodology: .count())",
          lambda: None,
          sink=lambda _: qs["dedup_minhash_lsh"](spark, SF_DIR).count())

    # 1. candidate pairs, lazy, noop sink (no order/driver round-trip)
    def pairs():
        p = dedup.minhash_lsh_candidates(docs, n_hashes=64, bands=16)
        return p
    def run_pairs():
        p = pairs()
        try:
            noop(p)
        finally:
            dedup.release_signature_cache(p)
    timed(spark, "pairs lazy -> noop", lambda: None, sink=lambda _: run_pairs())

    # 2. signature table only
    k, n_hashes = 5, 64
    A, B = dedup.minhash_family(n_hashes)
    sh = (docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_t"))
          .select("_id", F.expr(
              f"explode(sequence(1, greatest(length(_t) - {k - 1}, 1)))").alias("i"),
              "_t")
          .select("_id", F.expr(f"substring(_t, i, {k})").alias("s")))
    hashed = sh.select("_id", F.expr(dedup._polyhash_sql("s", k)).alias("ph"))
    aggs = [F.min(F.expr(f"({a}L * ph + {b}L) % {dedup.MINHASH_P}")).alias(f"h{h}")
            for h, (a, b) in enumerate(zip(A, B))]
    timed(spark, "shingle explode + substring", lambda: sh)
    timed(spark, "  + polyhash", lambda: hashed)
    timed(spark, "  + 64-min hash agg (= signatures)",
          lambda: hashed.groupBy("_id").agg(*aggs))


def probe_headline(spark):
    """All headline queries, bench methodology (count), min-of-N."""
    import __spark_entry__ as entry
    qs = entry.queries()
    names = ["a1_pricing_summary", "a4_percentile", "a8_topk_per_group",
             "p9_zonal_interval", "j5_knn", "w4_window_rank",
             "spatial_bbox_join", "dedup_exact", "dedup_minhash_lsh",
             "text_langid", "sessionize"]
    out = {}
    for n in names:
        out[n] = timed(spark, n, lambda: None,
                       sink=lambda _, _n=n: qs[_n](spark, SF_DIR).count())
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


def probe_flagship(spark):
    from raster_functions_spark import fixtures, pipeline
    aoi = fixtures.aoi_df(spark, 200)
    n = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))
    pipeline.flagship_from_seed(spark, 1000, aoi, partitions=CPUS * 4).count()
    timed(spark, f"flagship {n} images",
          lambda: None,
          sink=lambda _: pipeline.flagship_from_seed(spark, n, aoi).count())


PROBES = {
    "minhash_stages": probe_minhash_stages,
    "headline": probe_headline,
    "flagship": probe_flagship,
}


if __name__ == "__main__":
    wanted = [a for a in sys.argv[1:] if a in PROBES] or ["minhash_stages"]
    s = get_session()
    for w in wanted:
        PROBES[w](s)
    s.stop()
