"""Similarity search over embedding columns (``array<float>``).

Three paths, per the scale guidance:

- **brute-force cosine top-k** — the query set is broadcast as a dense
  matrix; ONE ``mapInPandas`` pass over the corpus computes a
  (queries × batch) GEMM per Arrow batch and emits per-batch top-k
  partials, which a final window reduces to global top-k. No |corpus|×|q|
  shuffle rows ever exist (top-k is decomposable), and scoring is a BLAS
  matmul, not a per-row expression. Exact; the oracle-checkable path.
- **LSH-bucketed ANN** — deterministic random-hyperplane sign bits bucket
  the corpus; queries probe their own bucket (+ multi-probe neighbors).
  One shuffle on the bucket key; candidates ≈ corpus / 2^bits per probe.
- **IVF ANN** — k-means inverted lists, queries probe n_probe lists.

Scoring on joined candidate rows uses a vectorized Arrow/pandas UDF
(row-wise einsum over the stacked arrays). Spark evaluates array
higher-order functions *interpreted* and re-evaluates the lambda per use
(no CSE) — measured in round 1 (dedup.py); the HOF forms are kept only for
tiny literal vectors (the hyperplane dot in lsh_bucket_col, which stays
JVM-side whole-stage-codegen precisely because it must not round-trip the
corpus through Python just to bucket it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .fixtures import splitmix64


def dot_col(a, b):
    """Dot product of two array columns — zip_with + aggregate, all JVM.
    Interpreted evaluation: use only where one side is a short literal."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _cosine_rows_udf():
    """Vectorized cosine over paired array columns: stack → einsum.
    den mirrors cosine_col's sqrt(qq)*sqrt(cc) factor order so scores are
    bit-compatible with the previous JVM expression where exact."""
    @F.pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        Q = np.stack(qv.to_numpy()).astype(np.float64)
        C = np.stack(cv.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", Q, C)
        den = (np.sqrt(np.einsum("ij,ij->i", Q, Q))
               * np.sqrt(np.einsum("ij,ij->i", C, C)))
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(den == 0.0, 0.0, num / den)
        return pd.Series(s)
    return cos


def _partial_topk(S: np.ndarray, nid: np.ndarray, kk: int) -> np.ndarray:
    """Per-row partial top-k of a score matrix under the SAME total order
    as the final merge window: (-score, neighbor_id asc). argpartition
    alone breaks ties at the k-th boundary arbitrarily, which would let a
    globally-ranked candidate be dropped inside its batch and make the
    result depend on partitioning. Cheap exact scheme: partition by score,
    widen to ALL entries tied with the k-th score, then lexsort just that
    candidate set. Returns (n_rows, kk) column indices into S."""
    n_c = S.shape[1]
    part = np.empty((S.shape[0], kk), dtype=np.int64)
    for qi in range(S.shape[0]):
        srow = S[qi]
        if n_c > 4 * kk:
            cut = np.argpartition(-srow, kk - 1)[:kk]
            cand = np.flatnonzero(srow >= srow[cut].min())
        else:
            cand = np.arange(n_c)
        order = np.lexsort((nid[cand], -srow[cand]))[:kk]
        part[qi] = cand[order]
    return part


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k via broadcast query matrix + per-batch partial
    top-k. Output (query_id, neighbor_id, rank) — integer-only so results
    are engine-comparable without float-hash hazards.

    Plan: corpus scan → mapInPandas (GEMM + per-batch top-k, ≤ n_q·k rows
    out per batch) → one small shuffle on query_id → window top-k. At
    10^12 corpus rows the shuffle carries n_q·k·n_partitions rows, not
    the candidate cross product."""
    q_pdf = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(vec_col).alias("qv")).toPandas()
    spark = corpus.sparkSession
    if not len(q_pdf):
        # empty query set: an empty RESULT, not an opaque np.stack crash
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int")
    bq = spark.sparkContext.broadcast({
        "ids": q_pdf["query_id"].to_numpy(np.int64),
        "Q": np.stack(q_pdf["qv"].to_numpy()).astype(np.float64),
    })

    def score(batches):
        q = bq.value
        Q = q["Q"]
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        for pdf in batches:
            C = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            den = qn[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(den == 0.0, 0.0, (Q @ C.T) / den)  # (n_q, n_c)
            nid = pdf["neighbor_id"].to_numpy(np.int64)
            kk = min(k, S.shape[1])
            part = _partial_topk(S, nid, kk)
            rows_q = np.repeat(q["ids"], kk)
            rows_n = nid[part.ravel()]
            rows_s = np.take_along_axis(S, part, axis=1).ravel()
            yield pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_n,
                                "score": rows_s})

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    partials = c.mapInPandas(score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def _hyperplanes(dim: int, n_bits: int, table: int = 0) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from splitmix64 — identical
    on every executor/run (no RNG state). ``table`` selects an independent
    set (table 0 = the historical planes, byte-stable with prior rounds)."""
    scale = float(2**64)
    idx = (np.arange(n_bits * dim, dtype=np.uint64)
           + np.uint64((table * 0x9E3779B97F4A7C15) % (1 << 64)))
    u = splitmix64(idx).astype(np.float64) / scale  # U(0,1)
    # approx normal via sum of 4 uniforms (CLT, cheap, deterministic)
    u2 = splitmix64(idx ^ np.uint64(0xABCDEF)).astype(np.float64) / scale
    u3 = splitmix64(idx ^ np.uint64(0x123456)).astype(np.float64) / scale
    u4 = splitmix64(idx ^ np.uint64(0x999999)).astype(np.float64) / scale
    g = (u + u2 + u3 + u4) - 2.0
    return g.reshape(n_bits, dim)


def lsh_bucket_col(vec_col, dim: int, n_bits: int = 8):
    """Sign-bit bucket id as a pure column expression: for each hyperplane,
    sign(dot(v, h)) packed into an int. JVM-side (no UDF): bucketing must
    not ship the corpus through Python, and the literal hyperplane arrays
    are short enough that interpreted HOF cost is immaterial."""
    H = _hyperplanes(dim, n_bits)
    bucket = F.lit(0)
    for b in range(n_bits):
        hvec = F.array(*[F.lit(float(x)) for x in H[b]])
        d = dot_col(F.col(vec_col) if isinstance(vec_col, str) else vec_col, hvec)
        bucket = bucket + F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "vec_id", n_bits: int = 6,
             n_probes: int = 1, dim: int | None = None) -> DataFrame:
    """ANN top-k, single hash table: queries probe their own sign-bucket
    plus ``n_probes-1`` single-bit-flip neighbors; exact cosine within
    candidates; top-k.

    Candidate semantics identical to the original bucket-equi-join form,
    but executed on the streamed per-bucket GEMM kernel (round-4's IVF
    shape): the broadcast-join version materialized one ROW per
    (candidate, probe) pair carrying both embedding arrays through a
    per-pair pandas UDF — measured 24.4s vs 4.7s brute force at 200k
    (BENCH/notes_r4.md); the kernel form scores each occupied bucket with
    one GEMM inside a single mapInPandas, no join, shuffle = n_q·k
    partial rows.

    Ids must be integers (the module-wide contract: every similarity
    path emits bigint ids so results are engine-comparable without
    float/string-hash hazards — see brute_force_topk). Map string keys
    to a surrogate bigint upstream."""
    if n_probes - 1 > n_bits:
        # probe p flips bit p-1: probes beyond n_bits produce bucket ids
        # no corpus vector can occupy — silent no-ops that LOOK like
        # extra recall; refuse instead
        raise ValueError(f"n_probes ≤ n_bits+1 (= {n_bits + 1}): probe "
                         f"{n_bits + 2} would flip a nonexistent bit")
    return _lsh_gemm_topk(corpus, queries, k, id_col, vec_col, qid_col,
                          n_bits=n_bits, n_tables=1, n_probes=n_probes,
                          dim=dim)


def lsh_multi_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   qid_col: str = "vec_id", n_bits: int = 8,
                   n_tables: int = 4, dim: int | None = None) -> DataFrame:
    """Amplified hyperplane LSH: ``n_tables`` independent sign-hash tables;
    a corpus vector is a candidate when it shares a bucket with the query
    in ANY table (the classic OR-amplification — collision probability
    1 − (1 − p^b)^L, steeply better recall than single-table bit-flip
    probing). Measured recall@10 vs brute force: 0.909 at 6 bits × 16
    tables on 200k×64 (BENCH/notes_r4.md) and 0.979 at the same
    operating point on a 1M×64 clustered corpus (notes_r6.md §8) —
    OR-amplification holds its recall as the corpus grows.

    Scale shape mirrors ivf_topk's round-4 rewrite: queries broadcast as a
    matrix + per-table bucket→query lookup; corpus batches stream through
    ONE mapInPandas that buckets rows per table (sign GEMM), scores each
    occupied bucket's members against only its probing queries, dedups
    (query, neighbor) pairs across tables, and emits per-query partial
    top-k. No join, no candidate rows, shuffle = n_q·k partials."""
    return _lsh_gemm_topk(corpus, queries, k, id_col, vec_col, qid_col,
                          n_bits=n_bits, n_tables=n_tables, n_probes=1,
                          dim=dim)


def _lsh_gemm_topk(corpus: DataFrame, queries: DataFrame, k: int,
                   id_col: str, vec_col: str, qid_col: str, n_bits: int,
                   n_tables: int, n_probes: int,
                   dim: int | None = None) -> DataFrame:
    """Shared streamed kernel behind lsh_topk (1 table × multi-probe) and
    lsh_multi_topk (L tables × own bucket). The probe set enters only the
    driver-side bucket→query lookup: a query index is registered under its
    own bucket and, per table, under each of its ``n_probes-1``
    single-bit-flip neighbor buckets — the kernel itself is probe-blind.
    A corpus row occupies exactly one bucket per table, so a (query,
    neighbor) pair appears at most once per table; the cross-table dedup
    also covers multi-probe."""
    if dim is None:
        row = corpus.select(vec_col).first()
        if row is None:
            raise ValueError("empty corpus: pass dim= explicitly (or skip "
                             "the search — there is nothing to match)")
        dim = len(row[0])
    Hs = np.stack([_hyperplanes(dim, n_bits, table=t)
                   for t in range(n_tables)])          # (L, bits, dim)
    q_pdf = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(vec_col).alias("qv")).toPandas()
    if not len(q_pdf):
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, score double")
    Q = np.stack(q_pdf["qv"].to_numpy()).astype(np.float64)
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)

    def buckets_of(X: np.ndarray, t: int) -> np.ndarray:
        return ((X @ Hs[t].T) > 0).astype(np.int64) @ pow2

    lookups = []
    for t in range(n_tables):
        qb = buckets_of(Q, t)
        d: dict[int, list] = {}
        for probe in range(n_probes):
            # probe 0 = own bucket; probe p>0 flips bit p-1 (the original
            # lsh_topk bit-flip probe sequence, preserved exactly)
            pb = qb if probe == 0 else qb ^ np.int64(1 << (probe - 1))
            for b in np.unique(pb):
                d.setdefault(int(b), []).append(np.nonzero(pb == b)[0])
        lookups.append({b: (np.concatenate(v) if len(v) > 1 else v[0])
                        for b, v in d.items()})
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast({
        "ids": q_pdf["query_id"].to_numpy(np.int64), "Q": Q, "H": Hs,
        "lookups": lookups})

    def score(batches):
        b = bq.value
        Qv = b["Q"]
        qn = np.sqrt(np.einsum("ij,ij->i", Qv, Qv))
        p2 = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            Cb = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            nid = pdf["neighbor_id"].to_numpy(np.int64)
            cn = np.sqrt(np.einsum("ij,ij->i", Cb, Cb))
            tq, tn, ts = [], [], []
            for t in range(len(b["H"])):
                cbuck = ((Cb @ b["H"][t].T) > 0).astype(np.int64) @ p2
                lut = b["lookups"][t]
                for bk in np.unique(cbuck):
                    qi = lut.get(int(bk))
                    if qi is None:
                        continue
                    csel = np.nonzero(cbuck == bk)[0]
                    den = qn[qi][:, None] * cn[csel][None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        S = np.where(den == 0.0, 0.0,
                                     (Qv[qi] @ Cb[csel].T) / den)
                    tq.append(np.repeat(qi, csel.size))
                    tn.append(np.tile(csel, qi.size))
                    ts.append(S.ravel())
            if not tq:
                continue
            qi_all = np.concatenate(tq)
            ci_all = np.concatenate(tn)
            s_all = np.concatenate(ts)
            # dedupe (query, corpus-row) pairs matched by several tables
            key = qi_all * np.int64(len(nid)) + ci_all
            _, first = np.unique(key, return_index=True)
            qi_all, ci_all, s_all = qi_all[first], ci_all[first], s_all[first]
            # per-query partial top-k under the window's total order
            order = np.lexsort((nid[ci_all], -s_all, qi_all))
            qi_all, ci_all, s_all = qi_all[order], ci_all[order], s_all[order]
            uq, starts = np.unique(qi_all, return_index=True)
            keep = np.concatenate([
                np.arange(s, min(s + k, e)) for s, e in
                zip(starts, np.append(starts[1:], qi_all.size))])
            yield pd.DataFrame({"query_id": b["ids"][qi_all[keep]],
                                "neighbor_id": nid[ci_all[keep]],
                                "score": s_all[keep]})

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    partials = c.mapInPandas(
        score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("score", 6).alias("score")))


def _kmeans_fit(X: np.ndarray, k: int, iters: int = 12) -> np.ndarray:
    """Deterministic Lloyd's k-means (from scratch; splitmix-seeded init)
    for IVF coarse quantization."""
    n = X.shape[0]
    idx = (splitmix64(np.arange(k, dtype=np.uint64) * np.uint64(7919))
           % np.uint64(n)).astype(np.int64)
    C = X[np.unique(idx)]
    while C.shape[0] < k:  # dedupe collisions deterministically
        extra = X[(C.shape[0] * 131) % n][None]
        C = np.vstack([C, extra])
    for _ in range(iters):
        d2 = ((X ** 2).sum(1)[:, None] - 2 * X @ C.T + (C ** 2).sum(1)[None, :])
        assign = d2.argmin(1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                C[j] = X[sel].mean(0)
    return C


def _train_sample(corpus: DataFrame, id_col: str, vec_col: str,
                  n: int) -> np.ndarray:
    """Deterministic UNBIASED k-means training sample: TakeOrdered on
    xxhash64(id) (id as tiebreaker). Same cost shape as orderBy(id) —
    a top-K, never a full sort — but decorrelated from ingest order."""
    return np.stack(
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col)).limit(n)
        .toPandas()[vec_col].to_numpy())


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "vec_id", n_lists: int = 16, n_probe: int = 4,
             train_sample: int = 2000) -> DataFrame:
    """IVF ANN: k-means centroids (trained driver-side on a deterministic
    sample, broadcast) partition the corpus into inverted lists; each query
    probes its ``n_probe`` nearest lists, exact cosine GEMM against only
    those lists' members.

    Scale shape: ZERO shuffles beyond the final n_q·k-row top-k merge —
    corpus batches stream through one mapInPandas that assigns rows to
    lists and scores each list against its probing queries; flops =
    candidate count (≈ corpus·n_probe/n_lists per query) × dim, and
    candidates never materialize as rows.

    The k-means training sample is the train_sample lowest xxhash64(id)
    rows (a TakeOrdered top-K, not a full sort) — deterministic at any
    parallelism (a bare limit() is partition-order-dependent and would
    train different centroids run to run) AND unbiased w.r.t. id order:
    lowest-IDS sampling trains centroids on one corner of id-correlated
    corpora (ingest order ≈ source ≈ content cluster is the common case
    at scale), collapsing recall at low n_probe; hashing decorrelates
    (recall A/B in BENCH/notes_r5.md). Measured operating points vs
    brute force (recall@10, clustered corpora): 200k×64 — 0.985 at
    64 lists/n_probe=4; 1M×64 — 0.985 at 64/4, 0.999 at 64/16, 0.995
    at 256 lists/n_probe=8 (BENCH/notes_r6.md §8); recall at fixed
    n_probe does not degrade with corpus growth, and beyond ~10M
    vectors denser list counts (256+) shrink per-query candidate
    volume 4× at equal recall."""
    sample = _train_sample(corpus, id_col, vec_col, train_sample)
    C = _kmeans_fit(sample.astype(np.float64), n_lists)
    spark = corpus.sparkSession

    # query side is the broadcastable dim: matrix + per-query probe sets
    # computed driver-side (n_q × n_lists distances — tiny)
    q_pdf = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(vec_col).alias("qv")).toPandas()
    Q = np.stack(q_pdf["qv"].to_numpy()).astype(np.float64)
    d2q = ((Q ** 2).sum(1)[:, None] - 2 * Q @ C.T + (C ** 2).sum(1)[None, :])
    probed = np.argsort(d2q, axis=1)[:, :n_probe]          # (n_q, n_probe)
    probers = [np.nonzero((probed == l).any(axis=1))[0]    # queries per list
               for l in range(n_lists)]
    bq = spark.sparkContext.broadcast({
        "ids": q_pdf["query_id"].to_numpy(np.int64), "Q": Q,
        "C": C, "probers": probers})

    # GEMM-shaped candidate scoring (round-4 rewrite): the old plan
    # materialized the (candidate × query) join as ROWS carrying both
    # embedding arrays and scored them one pair at a time — measured 17×
    # slower than brute force at 200k×64 (BENCH/notes_r4.md). Now each
    # corpus batch assigns its rows to lists in one GEMM vs the centroids,
    # then scores each list's members against ONLY the queries probing
    # that list — flops = true IVF candidate count × dim, candidates never
    # become rows, no shuffle beyond the final n_q·k-row top-k merge.
    def score(batches):
        b = bq.value
        Qv, Cv = b["Q"], b["C"]
        qn = np.sqrt(np.einsum("ij,ij->i", Qv, Qv))
        for pdf in batches:
            Cb = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            nid = pdf["neighbor_id"].to_numpy(np.int64)
            d2 = ((Cb ** 2).sum(1)[:, None] - 2 * Cb @ Cv.T
                  + (Cv ** 2).sum(1)[None, :])
            assign = d2.argmin(1)
            cn = np.sqrt(np.einsum("ij,ij->i", Cb, Cb))
            out_q, out_n, out_s = [], [], []
            for l in np.unique(assign):
                qi = b["probers"][l]
                if qi.size == 0:
                    continue
                csel = np.nonzero(assign == l)[0]
                den = qn[qi][:, None] * cn[csel][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = np.where(den == 0.0, 0.0,
                                 (Qv[qi] @ Cb[csel].T) / den)
                kk = min(k, S.shape[1])
                part = _partial_topk(S, nid[csel], kk)
                out_q.append(np.repeat(b["ids"][qi], kk))
                out_n.append(nid[csel][part.ravel()])
                out_s.append(np.take_along_axis(S, part, axis=1).ravel())
            if not out_q:
                continue
            yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                "neighbor_id": np.concatenate(out_n),
                                "score": np.concatenate(out_s)})

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    partials = c.mapInPandas(
        score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score")))


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_bits: int = 0, limit_ids: int | None = None) -> DataFrame:
    """Embedding near-dup pairs: all-pairs within LSH buckets (or brute
    all-pairs when n_bits=0 — tests/small tables only). Scoring via the
    vectorized pandas UDF over the joined candidates."""
    cast = F.col(vec_col).cast("array<double>")
    d = df.select(F.col(id_col).alias("_id"), cast.alias("v"))
    if limit_ids is not None:
        # a true CARDINALITY cap (the lowest limit_ids ids, TakeOrdered +
        # semi-join) — the previous value filter `_id < limit_ids` only
        # approximated it for dense 0-based ids and silently dropped
        # EVERYTHING for surrogate/hashed id spaces
        keep = d.select("_id").orderBy("_id").limit(int(limit_ids))
        d = d.join(F.broadcast(keep), "_id", "left_semi")
    if n_bits > 0:
        dim = len(df.select(vec_col).first()[0])
        d = d.withColumn("bucket", lsh_bucket_col(F.col("v"), dim, n_bits))
        a, b = d.alias("a"), d.alias("b")
        pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a._id") < F.col("b._id")))
    else:
        a, b = d.alias("a"), d.alias("b")
        pairs = a.join(b, F.col("a._id") < F.col("b._id"))
    out = pairs.select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                       _cosine_rows_udf()(F.col("a.v"), F.col("b.v")).alias("cos"))
    return (out.filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos")))


# ----------------------------------------------- persistent IVF index ------

def _assign_lists(corpus: DataFrame, C: np.ndarray,
                  id_col: str, vec_col: str, bC=None) -> DataFrame:
    """Coarse-quantize: each vector to its nearest centroid's list, one
    broadcast + one GEMM per Arrow batch (shared by build and append).
    ``bC`` lets a long-lived caller (the streaming sink) reuse ONE
    centroid broadcast across microbatches instead of registering a new
    one per batch (the per-batch-broadcast leak prepare_aoi fixed for
    the flagship sink)."""
    if bC is None:
        bC = corpus.sparkSession.sparkContext.broadcast(
            np.asarray(C, dtype=np.float64))

    @F.pandas_udf("long")
    def nearest_list(v):
        X = np.stack(v.to_numpy()).astype(np.float64)
        Cv = bC.value
        d2 = ((X ** 2).sum(1)[:, None] - 2 * X @ Cv.T
              + (Cv ** 2).sum(1)[None, :])
        return pd.Series(d2.argmin(1).astype(np.int64))

    return corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).cast("array<double>").alias("cv"),
                         nearest_list(F.col(vec_col)).alias("list_id"))


def ivf_build(corpus: DataFrame, n_lists: int = 16, train_sample: int = 2000,
              id_col: str = "vec_id", vec_col: str = "embedding",
              index_path: str | None = None, centroids=None):
    """Build-once half of the production ANN shape: train the coarse
    quantizer (deterministic k-means over the TakeOrdered sample — same
    protocol as ivf_topk) and materialize the corpus WITH its list
    assignment. When ``index_path`` is given, the index is written as
    parquet PARTITIONED BY list_id — searches then read only the probed
    lists' partitions (Catalyst partition pruning does the candidate
    skip at the SCAN, before any compute). ``centroids`` overrides
    training with a fixed quantizer (parity tests; re-building a grown
    corpus against the original centroids).

    Returns (index_df, centroids). The assignment column makes repeated
    searches skip the per-batch assignment GEMM too."""
    if centroids is None:
        sample = _train_sample(corpus, id_col, vec_col, train_sample)
        centroids = _kmeans_fit(sample.astype(np.float64), n_lists)
    C = np.asarray(centroids, dtype=np.float64)
    index = _assign_lists(corpus, C, id_col, vec_col)
    if index_path is not None:
        index.write.mode("overwrite").partitionBy("list_id").parquet(index_path)
        index = corpus.sparkSession.read.parquet(index_path)
    return index, C


# --------------------------------------- snapshot-backed IVF (streaming) ----
#
# The streaming-corpus production shape: the index lives in a
# SnapshotTable partitioned by list_id, with the trained centroids in an
# atomic sidecar (centroids.json). ivf_append assigns new vectors to the
# EXISTING centroids and commits exactly-once (run_id replay protection
# — a retried microbatch cannot double-insert vectors), closing the
# build-once/search-many loop for a corpus that keeps growing. Because
# assignment depends only on the frozen centroids,
# search(append(build(A), B)) ≡ search(build(A ∪ B, same centroids))
# by construction — asserted in tests/test_round6_ivf_append.py.

def ivf_build_snapshot(corpus: DataFrame, snap_path: str, n_lists: int = 16,
                       train_sample: int = 2000, id_col: str = "vec_id",
                       vec_col: str = "embedding", centroids=None,
                       run_id: str = "ivf-build-0"):
    """Build the snapshot-backed IVF index: train (or accept) centroids,
    persist them as an atomic sidecar, commit the assigned corpus as the
    first snapshot. Returns (SnapshotTable, centroids)."""
    from .lineage import _write_json_atomic
    from .snapshots import SnapshotTable
    if centroids is None:
        sample = _train_sample(corpus, id_col, vec_col, train_sample)
        centroids = _kmeans_fit(sample.astype(np.float64), n_lists)
    C = np.asarray(centroids, dtype=np.float64)
    spark = corpus.sparkSession
    # sidecar first: append() is replay-protected by run_id, and an
    # identical sidecar rewrite on retry is harmless (atomic rename)
    _write_json_atomic(spark, snap_path, "centroids.json", {"C": C.tolist()})
    table = SnapshotTable(spark, snap_path)
    table.append(_assign_lists(corpus, C, id_col, vec_col), "list_id",
                 run_id=run_id)
    return table, C


def ivf_load_centroids(spark, snap_path: str) -> np.ndarray:
    from .lineage import _read_manifest_path
    m = _read_manifest_path(spark, f"{snap_path}/centroids.json")
    if m is None:
        raise ValueError(f"no IVF centroids sidecar at {snap_path}")
    return np.asarray(m["C"], dtype=np.float64)


def ivf_append(new_rows: DataFrame, snap_path: str, run_id: str,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids=None, _bc=None) -> int:
    """Incremental index maintenance: assign ``new_rows`` to the index's
    EXISTING centroids and commit one snapshot (exactly-once via run_id —
    wire ``run_id=f"ivf-{batch_id}"`` from a foreachBatch sink). Work is
    O(new rows), never a rebuild. Returns the new snapshot id.
    ``centroids``/``_bc`` let a streaming sink load + broadcast the
    frozen quantizer once for the stream's lifetime."""
    from .snapshots import SnapshotTable
    spark = new_rows.sparkSession
    C = centroids if centroids is not None \
        else ivf_load_centroids(spark, snap_path)
    table = SnapshotTable(spark, snap_path)
    return table.append(_assign_lists(new_rows, C, id_col, vec_col, _bc),
                        "list_id", run_id=run_id)


def start_ivf_ingest(stream: DataFrame, snap_path: str, checkpoint: str,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     compact_every: int | None = None,
                     expire_every: int | None = None, keep_last: int = 64,
                     query_name: str = "ivf-ingest",
                     run_prefix: str = "ivf"):
    """Wire a vector stream into the snapshot-backed IVF index: one
    ivf_append per microbatch (run_id=<run_prefix>-<batch_id> ⇒
    exactly-once; a retried batch cannot double-insert — give each
    logical stream its own run_prefix if the index can outlive its
    checkpoint), with the shared maintain()
    cadence for small-file compaction and log retention. The index must
    already exist (ivf_build_snapshot) — appends assign against its
    frozen centroids, so searches stay parity-exact with a full rebuild
    at any point in the stream."""
    from .snapshots import SnapshotTable

    spark = stream.sparkSession
    # frozen quantizer: load + broadcast ONCE for the stream's lifetime
    # (per-batch reload re-read the sidecar and registered a fresh
    # broadcast every microbatch)
    C = ivf_load_centroids(spark, snap_path)
    bC = spark.sparkContext.broadcast(C)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append(batch_df, snap_path, run_id=f"{run_prefix}-{batch_id}",
                   id_col=id_col, vec_col=vec_col, centroids=C, _bc=bC)
        SnapshotTable(spark, snap_path).maintain(
            batch_id, compact_every=compact_every,
            expire_every=expire_every, keep_last=keep_last)

    return (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .queryName(query_name).trigger(availableNow=True).start())


def ivf_search_snapshot(spark, snap_path: str, queries: DataFrame,
                        k: int = 3, n_probe: int = 4,
                        vec_col: str = "embedding",
                        qid_col: str = "vec_id") -> DataFrame:
    """Search the snapshot-backed index: probe lists are computed
    driver-side, the snapshot read is pruned at the MANIFEST level to the
    probed lists' files (the snapshot-table equivalent of partition
    pruning — unprobed lists' files are never opened), then the same
    per-list GEMM scoring as ivf_search."""
    from .snapshots import SnapshotTable
    C = ivf_load_centroids(spark, snap_path)
    table = SnapshotTable(spark, snap_path)
    probes = _probe_lists(queries, C, n_probe, vec_col, qid_col)
    index = table.read(partition_values=[str(l)
                                         for l in probes["probed_union"]])
    return ivf_search(index, C, queries, k=k, n_probe=n_probe,
                      vec_col=vec_col, qid_col=qid_col, _probes=probes)


def _probe_lists(queries: DataFrame, C: np.ndarray, n_probe: int,
                 vec_col: str, qid_col: str) -> dict:
    """Driver-side probe computation shared by ivf_search and
    ivf_search_snapshot (one queries collect + one Q·Cᵀ GEMM, never
    repeated per layer): per-query probed lists, the per-list prober
    index sets, and the probed-list union for scan pruning."""
    q_pdf = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(vec_col).alias("qv")).toPandas()
    Q = np.stack(q_pdf["qv"].to_numpy()).astype(np.float64)
    d2q = ((Q ** 2).sum(1)[:, None] - 2 * Q @ C.T + (C ** 2).sum(1)[None, :])
    probed = np.argsort(d2q, axis=1)[:, :n_probe]
    probers = [np.nonzero((probed == l).any(axis=1))[0]
               for l in range(C.shape[0])]
    return {"ids": q_pdf["query_id"].to_numpy(np.int64), "Q": Q,
            "probers": probers,
            "probed_union": sorted({int(l) for row in probed for l in row})}


def ivf_search(index: DataFrame, centroids: np.ndarray, queries: DataFrame,
               k: int = 3, n_probe: int = 4, vec_col: str = "embedding",
               qid_col: str = "vec_id", _probes: dict | None = None) -> DataFrame:
    """Search-many half: probe lists per query are computed driver-side,
    the index scan is FILTERED to the union of probed lists (partition
    pruning on a partitioned index — unprobed lists are never read), and
    each batch scores per-list GEMMs against only its probing queries.
    Identical results to ivf_topk on the same corpus/queries (same
    centroids, same assignment, same tie-exact order). ``_probes``: a
    precomputed _probe_lists result (ivf_search_snapshot passes its own
    so the query collect + GEMM run once, not once per layer)."""
    C = np.asarray(centroids, dtype=np.float64)
    spark = index.sparkSession
    p = _probes if _probes is not None else _probe_lists(
        queries, C, n_probe, vec_col, qid_col)
    probed_union = p["probed_union"]
    bq = spark.sparkContext.broadcast({
        "ids": p["ids"], "Q": p["Q"], "probers": p["probers"]})

    def score(batches):
        b = bq.value
        Qv = b["Q"]
        qn = np.sqrt(np.einsum("ij,ij->i", Qv, Qv))
        for pdf in batches:
            Cb = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            nid = pdf["neighbor_id"].to_numpy(np.int64)
            lid = pdf["list_id"].to_numpy(np.int64)
            cn = np.sqrt(np.einsum("ij,ij->i", Cb, Cb))
            out_q, out_n, out_s = [], [], []
            for l in np.unique(lid):
                qi = b["probers"][l]
                if qi.size == 0:
                    continue
                csel = np.nonzero(lid == l)[0]
                den = qn[qi][:, None] * cn[csel][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = np.where(den == 0.0, 0.0,
                                 (Qv[qi] @ Cb[csel].T) / den)
                kk = min(k, S.shape[1])
                part = _partial_topk(S, nid[csel], kk)
                out_q.append(np.repeat(b["ids"][qi], kk))
                out_n.append(nid[csel][part.ravel()])
                out_s.append(np.take_along_axis(S, part, axis=1).ravel())
            if not out_q:
                continue
            yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                "neighbor_id": np.concatenate(out_n),
                                "score": np.concatenate(out_s)})

    pruned = index.filter(F.col("list_id").isin(probed_union))
    partials = pruned.select("neighbor_id", "cv", "list_id").mapInPandas(
        score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("score", 6).alias("score")))
