"""Scale probe: Bloom batch-vs-corpus dedup prefilter vs the plain join.

Shape mirrors production (batch of 10^7 new docs vs a 10^12-doc corpus,
scaled to sandbox): corpus 60M keys, batch 6M keys (~96 MB of strings —
past the 64 MB autoBroadcast threshold, so the baseline join must
shuffle BOTH sides), 500k true overlaps. The bloom path builds an 8 MiB
filter from the batch (m=2^26, k=4), evaluates it map-side inside the
corpus scan, and joins only the survivors. Inputs are generated in-job
(CPU-bound — sandbox disk benchmarks measure the hypervisor), Python
workers warmed first, min of N trials per leg.

NOTE on local-mode honesty: on one box the baseline's "shuffle" is an
in-memory sort, which underprices what the bloom path avoids — on a real
cluster the plain join moves the ENTIRE corpus over the network every
run, while the bloom path moves only the survivors (here ~1-3% of the
corpus). Report both the wall ratio AND the corpus-rows-into-shuffle
reduction; the second number is the one that holds at 1000 executors.

Usage: python scripts/bloom_probe.py [corpus_m=60] [batch_m=6] [trials=2]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from raster_functions_spark import dedup
from raster_functions_spark.session import get_spark


def main():
    cm = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    bm = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_corpus, n_batch = int(cm * 1e6), int(bm * 1e6)
    overlap = n_batch // 12

    spark = get_spark("bloom-probe", cores=16, shuffle_partitions=32)
    key = F.format_string("key-%012d", F.col("id")).alias("k")
    corpus = spark.range(0, n_corpus, 1, 32).select(key)
    # batch = [n_corpus - overlap, n_corpus - overlap + n_batch): the first
    # `overlap` keys already exist in the corpus
    batch = (spark.range(n_corpus - overlap, n_corpus - overlap + n_batch,
                         1, 32).select(key))

    # warm python workers + JIT
    corpus.limit(1000).count(), batch.limit(1000).count()

    def timed(fn):
        best = None
        for _ in range(trials):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    # --- leg A: plain join (what Catalyst picks for a >64MB batch side)
    def plain():
        return (batch.join(corpus.withColumn("_in", F.lit(True)), "k", "left")
                .agg(F.sum(F.coalesce(F.col("_in"), F.lit(False))
                           .cast("long")).alias("dups"),
                     F.count("*").alias("n")).collect()[0])

    ta, ra = timed(plain)
    print(f"plain join:      {ta:6.2f}s  dups={ra['dups']} n={ra['n']}")

    # --- leg B: bloom prefilter, per hash mode
    def bloom(hashes):
        def run():
            t0 = time.time()
            words = dedup.bloom_build(batch, "k", 1 << 26, 4, hashes=hashes)
            t_build = time.time() - t0
            surv = (dedup.bloom_might_contain(corpus, "k", words, 4,
                                              hashes=hashes)
                    .filter(F.col("bloom_hit")).select("k"))
            n_surv = surv.count()
            out = (batch.join(surv.withColumn("_in", F.lit(True)),
                              "k", "left")
                   .agg(F.sum(F.coalesce(F.col("_in"), F.lit(False))
                              .cast("long")).alias("dups"),
                        F.count("*").alias("n")).collect()[0])
            return t_build, n_surv, out
        return run

    for hashes in ("xxhash64", "md5"):
        best, (tb, n_surv, rb) = timed(bloom(hashes))
        print(f"bloom/{hashes:8s}: {best:6.2f}s  (build {tb:.2f}s)  "
              f"survivors={n_surv} ({100.0 * n_surv / n_corpus:.2f}% of "
              f"corpus, {n_surv - rb['dups']} FPs)  dups={rb['dups']}")
        assert ra["dups"] == rb["dups"] == overlap, (ra, rb, overlap)
        print(f"  exact ({overlap} dups both legs); wall {ta / best:.2f}x; "
              f"corpus rows into the verify join cut "
              f"{n_corpus / max(n_surv, 1):.0f}x")
    spark.stop()


if __name__ == "__main__":
    main()
