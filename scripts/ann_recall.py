"""Measured recall@k for the ANN paths vs brute force at realistic probe
settings — the operating-point evidence the exact-verified sf0.01 oracles
can't give (there n_probe = n_lists ⇒ exhaustive). Default 200k×64 corpus
(notes_r4 protocol, driver-generated gaussian clusters); pass a corpus
size (e.g. 1000000) to use the DISTRIBUTED deterministic generator
instead — 64 approx-gaussian clusters from splitmix64 uniforms
(Irwin-Hall of 3), pure function of row index so content is identical at
any parallelism. 500 queries. Writes markdown table rows for
BENCH/notes_r{4,6}.md."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

from raster_functions_spark.session import get_spark


def _clustered_corpus_distributed(spark, n, dim, nq, n_clusters=64):
    """Distributed deterministic clustered vectors: center/assignment/
    noise all derive from splitmix64 of the absolute row index."""
    import pandas as pd
    from raster_functions_spark.fixtures import splitmix64

    def unit(idx, salt):
        u = splitmix64(idx.astype(np.uint64) ^ np.uint64(salt)).astype(np.float64)
        return u / float(2 ** 64) - 0.5

    def gauss(idx, salt):                     # Irwin-Hall(3) ≈ N(0,1)
        return 2.0 * sum(unit(idx, salt + 7 * j) for j in range(3))

    centers = gauss(np.arange(n_clusters * dim, dtype=np.uint64),
                    0xC0FFEE).reshape(n_clusters, dim)

    def vecs_for(ids):
        flat = (ids[:, None].astype(np.uint64) * np.uint64(dim)
                + np.arange(dim, dtype=np.uint64)[None, :]).ravel()
        noise = 1.2 * gauss(flat, 0xBEEF).reshape(len(ids), dim)
        assign = (splitmix64(ids.astype(np.uint64)) %
                  np.uint64(n_clusters)).astype(np.int64)
        return centers[assign] + noise

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            X = vecs_for(ids)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": [r.astype(np.float32).tolist()
                                              for r in X]})

    corpus = (spark.range(0, n, 1, 64)
              .mapInPandas(gen, "vec_id long, embedding array<float>"))
    # queries: perturbed copies of evenly spaced corpus rows
    qids = np.arange(nq, dtype=np.int64) * (n // nq)
    Qbase = vecs_for(qids)
    qflat = (np.arange(nq, dtype=np.uint64)[:, None] * np.uint64(dim)
             + np.arange(dim, dtype=np.uint64)[None, :]).ravel()
    Q = Qbase + 0.3 * gauss(qflat, 0xF00D).reshape(nq, dim)
    q_pdf = pd.DataFrame({"vec_id": np.arange(nq, dtype=np.int64) + 10_000_000,
                          "embedding": [r.astype(np.float32).tolist() for r in Q]})
    return corpus, spark.createDataFrame(q_pdf)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim, nq, k = 64, 500, 10
    spark = get_spark(cores=16)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    import pandas as pd
    from pyspark.sql import functions as F
    from raster_functions_spark import similarity as sim

    if n > 200_000:
        corpus, queries = _clustered_corpus_distributed(spark, n, dim, nq)
        corpus = corpus.cache()
        queries = queries.cache()
    else:
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

    ivf_points = [(64, 4), (64, 8), (64, 16)]
    if n >= 1_000_000:
        # production-density lists at 1M (≈4k vectors/list) — the probe
        # count the recall/latency tradeoff actually turns on at scale
        ivf_points += [(256, 8), (256, 16), (256, 32)]
    for n_lists, n_probe in ivf_points:
        t0 = time.time()
        got = topk_sets(sim.ivf_topk(corpus, queries, k=k,
                                     n_lists=n_lists, n_probe=n_probe,
                                     train_sample=max(2000, 40 * n_lists)))
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
