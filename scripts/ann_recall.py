"""Measured recall@k for the ANN paths vs brute force at realistic probe
settings — the operating-point evidence the exact-verified sf0.01 oracles
can't give (there n_probe = n_lists ⇒ exhaustive). 200k×64 corpus, 500
queries; deterministic seeded embeddings. Writes a markdown table row set
for BENCH/notes_r4.md."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

from raster_functions_spark.session import get_spark


def main():
    n, dim, nq, k = 200_000, 64, 500, 10
    spark = get_spark(cores=16)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    import pandas as pd
    from pyspark.sql import functions as F
    from raster_functions_spark import similarity as sim

    rng = np.random.default_rng(42)
    # clustered corpus (IVF's use case): 64 gaussian clusters
    centers = rng.normal(0, 1, (64, dim))
    assign = rng.integers(0, 64, n)
    X = centers[assign] + rng.normal(0, 1.2, (n, dim))
    corpus_pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                               "embedding": [r.astype(np.float32).tolist() for r in X]})
    qidx = rng.choice(n, nq, replace=False)
    q_pdf = pd.DataFrame({"vec_id": np.arange(nq, dtype=np.int64) + 10_000_000,
                          "embedding": [(X[i] + rng.normal(0, 0.3, dim)).astype(np.float32).tolist()
                                        for i in qidx]})
    corpus = spark.createDataFrame(corpus_pdf).repartition(32).cache()
    queries = spark.createDataFrame(q_pdf).cache()
    corpus.count(); queries.count()

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.time()
    bf = topk_sets(sim.brute_force_topk(corpus, queries, k=k))
    t_bf = time.time() - t0
    rows = [f"| brute force | — | {t_bf:.1f}s | 1.000 |"]
    print(f"brute force {t_bf:.1f}s")

    for n_lists, n_probe in ((64, 4), (64, 8), (64, 16)):
        t0 = time.time()
        got = topk_sets(sim.ivf_topk(corpus, queries, k=k,
                                     n_lists=n_lists, n_probe=n_probe))
        dt = time.time() - t0
        rec = np.mean([len(got.get(q, set()) & bf[q]) / k for q in bf])
        rows.append(f"| IVF {n_lists} lists | n_probe={n_probe} | {dt:.1f}s | {rec:.3f} |")
        print(rows[-1])

    for n_bits, n_tables in ((6, 8), (6, 16), (8, 8)):
        t0 = time.time()
        got = topk_sets(sim.lsh_multi_topk(corpus, queries, k=k,
                                           n_bits=n_bits, n_tables=n_tables))
        dt = time.time() - t0
        rec = np.mean([len(got.get(q, set()) & bf[q]) / k for q in bf])
        rows.append(f"| multi-LSH {n_bits} bits | tables={n_tables} | {dt:.1f}s | {rec:.3f} |")
        print(rows[-1])


    print("\n".join(rows))
    spark.stop()


if __name__ == "__main__":
    main()
