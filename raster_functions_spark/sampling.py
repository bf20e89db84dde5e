"""Deterministic sampling & splitting for training-data curation.

A 100-TB curation pipeline needs reproducible subsetting: mixture-weight
sampling per stratum (lang × source), train/val/test splits that never
move a row between splits when the corpus is re-run, and exact per-stratum
quotas. Everything here keys on a seeded md5-derived uniform — the SAME
value is computable as a Spark ``Column``, Spark SQL text, and DuckDB SQL
text, so the contract-query oracles replay the sampling decision exactly
(the engine is never compared against a different RNG).

The hash: ``u60(key, seed) = int(md5(str(key) || ':' || seed)[:15 hex], 16)``
— a uniform draw in [0, 2^60). 15 hex chars keep the value inside a signed
64-bit integer in every engine (DuckDB's ``CAST('0x…' AS BIGINT)`` and
Spark's ``conv(…, 16, 10)`` both stay exact below 2^63).

Scale design (the part that matters at 10^12 rows):

- ``sample_fraction`` / ``split_by_hash`` are pure narrow filters — zero
  shuffle, embarrassingly parallel, Catalyst pushes the md5+compare into
  the scan stage.
- ``sample_stratified_exact`` needs a global per-stratum top-n by hash; a
  naive window over the full table shuffles EVERY row to its stratum's
  reducer (one task per stratum = the skew wall). Instead: one cheap
  count aggregate (map-side partial) sizes each stratum, a broadcast
  threshold prefilter cuts the table to ~oversample·n rows per stratum
  JVM-side, and only the survivors pay the window shuffle. A deterministic
  fallback re-windows the (provably rare) strata where the prefilter
  undershot, so the result is EXACT — identical to the full-table window
  and to the DuckDB oracle — at any oversample setting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

U60 = 1 << 60


# ------------------------------------------------------------ the hash -----

def u60_col(key: Column, seed: int) -> Column:
    """Seeded uniform in [0, 2^60) as a pure JVM Column (md5 + conv —
    whole-stage-codegen'd, no Python)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def u60_sql(key_expr: str, seed: int, dialect: str = "duckdb") -> str:
    """The identical draw as SQL text (oracle parity)."""
    assert dialect in ("duckdb", "spark")
    if dialect == "duckdb":
        s = f"md5(CAST({key_expr} AS VARCHAR) || ':{seed}')"
        return f"CAST(concat('0x', substr({s}, 1, 15)) AS BIGINT)"
    s = f"md5(concat(CAST({key_expr} AS STRING), ':{seed}'))"
    return f"CAST(conv(substr({s}, 1, 15), 16, 10) AS BIGINT)"


# ------------------------------------------------- fraction / split --------

def sample_fraction(df: DataFrame, key_col: str, seed: int,
                    fraction: float | None = None,
                    strata_col: str | None = None,
                    fractions: dict | None = None) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with u60 < fraction·2^60.

    Either one global ``fraction``, or per-stratum ``fractions`` keyed by
    the values of ``strata_col`` (mixture weighting: "keep 100% of 'de',
    10% of 'en'"; strata absent from the dict are DROPPED — an explicit
    0.0 keeps the intent visible). Zero shuffle; re-running on a grown
    corpus keeps every previously-kept row (hash-stable sampling)."""
    def check(fr):
        if not 0.0 <= fr <= 1.0:
            raise ValueError(f"fraction {fr} outside [0, 1]")

    u = u60_col(F.col(key_col), seed)
    if fractions is not None:
        if strata_col is None:
            raise ValueError("fractions= requires strata_col=")
        for fr in fractions.values():
            check(fr)
        thr = None
        for k, frac in sorted(fractions.items()):
            cond = F.col(strata_col) == F.lit(k)
            t = F.lit(min(int(frac * U60), U60))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = F.lit(0) if thr is None else thr.otherwise(F.lit(0))
        return df.filter(u < thr)  # unknown stratum → threshold 0 → drop
    if fraction is None:
        raise ValueError("pass fraction= or fractions=")
    check(fraction)
    return df.filter(u < F.lit(min(int(fraction * U60), U60)))


def fractions_sql(key_expr: str, seed: int, strata_expr: str,
                  fractions: dict, dialect: str = "duckdb") -> str:
    """WHERE predicate replaying sample_fraction's per-stratum keep
    decision (identical integer thresholds; strata absent from the dict
    fall to the ELSE 0 branch and are dropped, same as the engine)."""
    u = u60_sql(key_expr, seed, dialect)
    whens = " ".join(f"WHEN '{_q(k)}' THEN {min(int(frac * U60), U60)}"
                     for k, frac in sorted(fractions.items()))
    return f"{u} < (CASE {strata_expr} {whens} ELSE 0 END)"


def _q(s) -> str:
    """SQL string-literal escape (single quotes doubled)."""
    return str(s).replace("'", "''")


def split_by_hash(df: DataFrame, key_col: str, seed: int,
                  weights: dict[str, float],
                  split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split by disjoint u60 ranges
    (insertion order of ``weights``; weights must sum to ≤ 1, any
    remainder falls into the LAST split so no row is unassigned).
    Train/val/test membership is a pure function of (key, seed): adding
    rows later never reshuffles existing assignments — the property that
    keeps eval sets uncontaminated across corpus refreshes."""
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(v < 0 for v in weights.values()):
        raise ValueError("split weights must be non-negative")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    u = u60_col(F.col(key_col), seed)
    names = list(weights)
    edges, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        edges.append(int(acc * U60))
    # ordered WHEN chain: edges are increasing, so "u < edge_i" fires for
    # exactly the i-th range (earlier WHENs claimed everything below)
    expr = None
    for name, edge in zip(names[:-1], edges):
        c = u < F.lit(edge)
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def split_sql(key_expr: str, seed: int, weights: dict[str, float],
              dialect: str = "duckdb") -> str:
    """CASE expression computing the identical split label (oracle side)."""
    u = u60_sql(key_expr, seed, dialect)
    names = list(weights)
    parts, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN {u} < {int(acc * U60)} THEN '{_q(name)}'")
    return "CASE " + " ".join(parts) + f" ELSE '{_q(names[-1])}' END"


# ------------------------------------------------- exact stratified --------

def sample_stratified_exact(df: DataFrame, strata_cols: list[str],
                            n_per_stratum: int, key_col: str, seed: int,
                            oversample: float = 2.0,
                            checkpoint: bool = True) -> DataFrame:
    """EXACT deterministic n-per-stratum sample: the n rows with the
    smallest (u60, key) in each stratum — semantically identical to
    ``row_number() OVER (PARTITION BY strata ORDER BY u60, key) <= n``
    over the full table, which is what the DuckDB oracle runs.

    Execution avoids the full-table window shuffle: a count aggregate
    sizes each stratum (strata cardinality must be driver-small — it is a
    dims-like quantity: lang × source, not a per-row key), a broadcast
    per-stratum threshold keeps ~oversample·n candidate rows JVM-side,
    and the window runs on survivors only. Strata where the uniform draw
    undershot the threshold (P ≈ exp(-n·(oversample-1)²/(2·oversample)),
    ~3·10⁻⁶ at n=50, oversample=2) are re-windowed from the full table —
    the fallback makes the prefilter a pure optimization, never a
    semantics change."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    u = u60_col(F.col(key_col), seed).alias("_u60")
    work = df.withColumn("_u60", u)
    counts = work.groupBy(*strata_cols).count().collect()

    rows = []
    for r in counts:
        cnt = r["count"]
        if cnt <= n_per_stratum:
            thr = U60  # keep-all stratum: no row may be filtered out
        else:
            thr = min(int(U60 * oversample * n_per_stratum / cnt), U60)
        rows.append(tuple(r[c] for c in strata_cols) + (thr,))
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        rows, schema=", ".join(f"{c} {dict(df.dtypes)[c]}" for c in strata_cols)
        + ", _thr long")

    # null-safe join: a NULL stratum value is a legitimate group (e.g.
    # docs with unknown lang) — a plain equi-join would silently drop it
    jc = None
    for c in strata_cols:
        e = work[c].eqNullSafe(thr_df[c])
        jc = e if jc is None else jc & e
    cand = (work.join(F.broadcast(thr_df), jc)
            .select(work["*"], thr_df["_thr"])
            .filter(F.col("_u60") < F.col("_thr")).drop("_thr"))
    w = Window.partitionBy(*strata_cols).orderBy("_u60", key_col)
    # picked is tiny (≤ n per stratum × #strata): checkpoint it so the
    # exactness validation below and the caller's read don't re-run the
    # source scan + window — the big table is scanned exactly twice
    # (count aggregate + candidate filter), never three times.
    # checkpoint=False keeps the full lineage visible (plan audits /
    # callers who compose further and prefer lazy realization).
    picked = (cand.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= n_per_stratum))
    if checkpoint:
        picked = picked.localCheckpoint(eager=True)

    # exactness guard: a stratum whose candidate pool came up short of
    # min(n, stratum_count) must be re-windowed without the prefilter
    want = {tuple(r[c] for c in strata_cols): min(r["count"], n_per_stratum)
            for r in counts}
    got = {tuple(r[c] for c in strata_cols): r["count"]
           for r in picked.groupBy(*strata_cols).count().collect()}
    short = [k for k, v in want.items() if got.get(k, 0) < v]
    if short:
        def member(k):  # null-safe stratum membership predicate
            c = F.lit(True)
            for col, v in zip(strata_cols, k):
                c = c & F.col(col).eqNullSafe(F.lit(v))
            return c

        cond = None
        for k in short:
            c = member(k)
            cond = c if cond is None else cond | c
        refill = (work.filter(cond)
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= n_per_stratum))
        picked = picked.filter(~cond).unionByName(refill)
    return picked.drop("_u60", "_rn")


def stratified_sql(table: str, strata_cols: list[str], n_per_stratum: int,
                   key_col: str, seed: int, select_cols: str = "*",
                   dialect: str = "duckdb") -> str:
    """The full-table window form of the same sample (oracle side)."""
    u = u60_sql(key_col, seed, dialect)
    part = ", ".join(strata_cols)
    return f"""
SELECT {select_cols} FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {part} ORDER BY {u}, {key_col}) AS _rn
  FROM {table}) t
WHERE _rn <= {n_per_stratum}"""


# ------------------------------------------------- token-budget sample -----

def sample_token_budget(df: DataFrame, strata_cols: list[str], budget: int,
                        weight_col: str, key_col: str, seed: int,
                        oversample: float = 2.0) -> DataFrame:
    """Deterministic per-stratum BUDGET sample: walk each stratum's rows
    in (u60, key) order and keep rows while the preceding cumulative
    ``weight_col`` (tokens, chars, bytes) is still under ``budget`` —
    "take ~1B tokens of each language", the quota form real training
    mixes are specified in. The boundary row that crosses the budget is
    KEPT (prefix-exclusive rule), so every stratum with any data gets at
    least one row; a stratum whose total weight ≤ budget is kept whole.
    Membership is a pure function of (key, seed, budget): re-runs and
    corpus growth never evict a previously kept row below the boundary.

    Execution mirrors sample_stratified_exact: a sum/count aggregate
    (map-side partial) sizes each stratum, a broadcast u60-threshold
    prefilter keeps ~oversample · budget/total-weight of each stratum,
    and the running-sum window runs over survivors only. A stratum whose
    candidate pool neither exhausts the stratum nor reaches the budget
    is re-windowed from the full table — the prefilter is a pure
    optimization, never a semantics change. Weights must be non-negative
    and non-null."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    work = df.withColumn("_u60", u60_col(F.col(key_col), seed))
    stats = (work.groupBy(*strata_cols)
             .agg(F.sum(weight_col).alias("_tot"), F.count("*").alias("_cnt"))
             .collect())

    rows = []
    for r in stats:
        tot = r["_tot"] or 0
        if tot <= budget:
            thr = U60                 # whole stratum kept: no prefilter
        else:
            thr = min(int(U60 * oversample * budget / tot), U60)
        rows.append(tuple(r[c] for c in strata_cols) + (thr,))
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        rows, schema=", ".join(f"{c} {dict(df.dtypes)[c]}" for c in strata_cols)
        + ", _thr long")

    jc = None
    for c in strata_cols:
        e = work[c].eqNullSafe(thr_df[c])
        jc = e if jc is None else jc & e
    cand = (work.join(F.broadcast(thr_df), jc)
            .select(work["*"], thr_df["_thr"])
            .filter(F.col("_u60") < F.col("_thr")).drop("_thr"))
    w = Window.partitionBy(*strata_cols).orderBy("_u60", key_col)
    pre = F.coalesce(
        F.sum(weight_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))

    def keep(c):
        return (c.withColumn("_pre", pre)
                .filter(F.col("_pre") < budget).drop("_pre"))

    picked = keep(cand).localCheckpoint(eager=True)

    # exactness guard: the budget boundary must lie INSIDE the candidate
    # pool — i.e. per stratum, candidates either exhaust the stratum or
    # carry ≥ budget total weight; otherwise re-window without prefilter
    cnt_by = {tuple(r[c] for c in strata_cols): r["_cnt"] for r in stats}
    cstats = (cand.groupBy(*strata_cols)
              .agg(F.sum(weight_col).alias("_ct"), F.count("*").alias("_cn"))
              .collect())
    cand_by = {tuple(r[c] for c in strata_cols): (r["_ct"] or 0, r["_cn"])
               for r in cstats}
    short = [k for k, n in cnt_by.items()
             if cand_by.get(k, (0, 0))[1] < n
             and cand_by.get(k, (0, 0))[0] < budget]
    if short:
        def member(k):
            c = F.lit(True)
            for col, v in zip(strata_cols, k):
                c = c & F.col(col).eqNullSafe(F.lit(v))
            return c

        cond = None
        for k in short:
            c = member(k)
            cond = c if cond is None else cond | c
        picked = (picked.filter(~cond)
                  .unionByName(keep(work.filter(cond))))
    return picked.drop("_u60")


def token_budget_sql(table: str, strata_cols: list[str], budget: int,
                     weight_expr: str, key_col: str, seed: int,
                     select_cols: str = "*",
                     dialect: str = "duckdb") -> str:
    """The full-table running-sum form of the same sample (oracle)."""
    u = u60_sql(key_col, seed, dialect)
    part = ", ".join(strata_cols)
    return f"""
SELECT {select_cols} FROM (
  SELECT *, COALESCE(SUM({weight_expr}) OVER (
      PARTITION BY {part} ORDER BY {u}, {key_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _pre
  FROM {table}) t
WHERE _pre < {budget}"""


# ---------------------------------------------------- sequence packing -----

def pack_sequences(df: DataFrame, weight_col: str, capacity: int,
                   key_col: str, seed: int, n_buckets: int = 1,
                   bucket_col: str = "pack_bucket",
                   bin_col: str = "pack_bin",
                   offset_col: str = "pack_offset") -> DataFrame:
    """Assign every row (document) to a fixed-capacity training bin —
    GPT-style "concatenate then split" sequence packing, expressed as an
    assignment instead of a materialized concat so the result stays
    columnar: bin = floor(exclusive-prefix-weight / capacity), offset =
    prefix − bin·capacity, rows ordered by the seeded (u60, key) draw.
    A document whose weight straddles a boundary belongs to the bin its
    FIRST token lands in (the trainer splits it across sequences, as
    packing pipelines do); membership is a pure function of (key, seed),
    so corpus re-runs are byte-stable.

    Scale: the prefix sum is a window — a single global window would
    funnel the corpus through one reducer, so rows are first hash-salted
    into ``n_buckets`` independent packing streams (u60(key, seed+1) mod
    n_buckets) and the window runs per bucket. Size n_buckets ≈
    corpus/weight-per-task; each bucket packs independently, which is
    exactly how production packing shards (pack within output shard,
    never globally)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    work = (df
            .withColumn("_u60", u60_col(F.col(key_col), seed))
            .withColumn(bucket_col,
                        (u60_col(F.col(key_col), seed + 1)
                         % F.lit(n_buckets)).cast("int")))
    w = Window.partitionBy(bucket_col).orderBy("_u60", key_col)
    pre = F.coalesce(
        F.sum(weight_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    # integer div, not float: double division loses exactness once the
    # running prefix passes 2^53 tokens (a real corpus does)
    return (work.withColumn("_pre", pre)
            .withColumn(bin_col, F.expr(f"_pre DIV {capacity}"))
            .withColumn(offset_col,
                        F.col("_pre") - F.col(bin_col) * capacity)
            .drop("_u60", "_pre"))


def pack_export(df: DataFrame, text_col: str, capacity: int, key_col: str,
                seed: int, n_buckets: int = 1) -> DataFrame:
    """MATERIALIZE the packed training sequences that
    :func:`pack_sequences` only assigns: every fixed-capacity bin becomes
    one row — the trainable artifact a data loader actually reads — with
    the straddling-document split applied for real (a doc whose tokens
    cross a bin boundary contributes its head to one sequence and its
    tail to the next, GPT concat-then-split semantics). Returns one row
    per (pack_bucket, pack_bin):

      n_docs      — documents contributing ≥1 token to the bin,
      n_tokens    — exactly ``capacity`` for every bin except each
                    bucket's final remainder bin,
      seq_md5     — md5 of the bin's space-joined token sequence, in
                    order — the fingerprint pins CONTENT AND ORDER of
                    the exported sequence, not just membership.

    Scale: assignment is :func:`pack_sequences` (hash-salted independent
    prefix windows); the split is an explode over the bins a doc touches
    (fan-out ≤ weight/capacity + 1 — bounded, inline with the scan) and
    ONE shuffle on (bucket, bin). Within a bin the slices are re-ordered
    by their bin-local offset via array_sort over a collected struct —
    per-group cardinality is ≤ capacity docs, so the interpreted HOF tax
    is bounded by the capacity, never by the corpus."""
    toks = F.split(F.col(text_col), " ")
    work = pack_sequences(
        df.select(F.col(key_col), toks.alias("_toks"))
          .withColumn("_w", F.size("_toks").cast("long")),
        "_w", capacity, key_col, seed, n_buckets)
    # global token interval of the doc: [_pre, _pre + _w)
    work = work.withColumn(
        "_pre", F.col("pack_bin") * capacity + F.col("pack_offset"))
    spans = (work
             .withColumn("_b", F.expr(
                 f"explode(sequence(pack_bin, (_pre + _w - 1) DIV {capacity}))"))
             .withColumn("_s", F.greatest(
                 F.col("_b") * capacity - F.col("_pre"), F.lit(0).cast("long")))
             .withColumn("_e", F.least(
                 F.col("_w"), (F.col("_b") + 1) * capacity - F.col("_pre")))
             .withColumn("_off", F.greatest(
                 F.col("_pre") - F.col("_b") * capacity, F.lit(0).cast("long")))
             .withColumn("_slice", F.expr(
                 "slice(_toks, CAST(_s + 1 AS INT), CAST(_e - _s AS INT))")))
    return (spans.groupBy(F.col("pack_bucket"), F.col("_b").alias("pack_bin"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("_e") - F.col("_s")).alias("n_tokens"),
                 F.md5(F.concat_ws(" ", F.flatten(F.expr(
                     "transform(array_sort(collect_list(struct(_off, _slice))),"
                     " x -> x._slice)")))).alias("seq_md5")))


def pack_export_sql(table: str, text_expr: str, capacity: int, key_col: str,
                    seed: int, n_buckets: int = 1) -> str:
    """DuckDB replay of :func:`pack_export` — identical draw, bucket,
    prefix sum, interval split and in-bin ordering (string_agg ORDER BY
    the bin-local offset ≡ the engine's array_sort on the same key)."""
    u = u60_sql(key_col, seed, "duckdb")
    ub = u60_sql(key_col, seed + 1, "duckdb")
    return f"""
WITH t AS (
  SELECT {key_col}, string_split({text_expr}, ' ') AS toks,
         CAST(len(string_split({text_expr}, ' ')) AS BIGINT) AS w,
         ({ub} % {n_buckets}) AS pb,
         CAST(COALESCE(SUM(CAST(len(string_split({text_expr}, ' ')) AS BIGINT))
             OVER (PARTITION BY ({ub} % {n_buckets})
                   ORDER BY {u}, {key_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS pre
  FROM {table}),
s AS (
  SELECT pb, toks, w, pre,
         unnest(range(pre // {capacity}, (pre + w - 1) // {capacity} + 1)) AS b
  FROM t),
sl AS (
  SELECT pb, b,
         GREATEST(b * {capacity} - pre, 0) AS st,
         LEAST(w, (b + 1) * {capacity} - pre) AS en,
         GREATEST(pre - b * {capacity}, 0) AS off,
         toks
  FROM s)
SELECT CAST(pb AS INT) AS pack_bucket, CAST(b AS BIGINT) AS pack_bin,
       COUNT(*) AS n_docs, CAST(SUM(en - st) AS BIGINT) AS n_tokens,
       md5(string_agg(array_to_string(toks[st + 1:en], ' '), ' '
                      ORDER BY off)) AS seq_md5
FROM sl GROUP BY pb, b"""


def pack_sql(table: str, weight_expr: str, capacity: int, key_col: str,
             seed: int, select_cols: str, n_buckets: int = 1,
             dialect: str = "duckdb") -> str:
    """DuckDB replay of :func:`pack_sequences` (identical draw, bucket,
    prefix sum, and boundary rule). ``select_cols`` must name the
    pass-through columns explicitly ('*' would leak the helper
    columns)."""
    u = u60_sql(key_col, seed, dialect)
    ub = u60_sql(key_col, seed + 1, dialect)
    return f"""
SELECT {select_cols},
       CAST(_pb AS INT) AS pack_bucket,
       CAST(_pre // {capacity} AS BIGINT) AS pack_bin,
       CAST(_pre - (_pre // {capacity}) * {capacity} AS BIGINT)
         AS pack_offset
FROM (
  SELECT *, ({ub} % {n_buckets}) AS _pb,
         COALESCE(SUM({weight_expr}) OVER (
             PARTITION BY ({ub} % {n_buckets})
             ORDER BY {u}, {key_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _pre
  FROM {table}) t"""


# ------------------------------------------- temperature domain mixing -----

def mixture_weights(df: DataFrame, domain_col: str, weight_col: str,
                    tau: float = 0.7, budget: int = 1_000_000) -> DataFrame:
    """Temperature-scaled domain mixture — the sampling-weight step of
    multi-source training-data curation (the τ-scaled multinomial of
    multilingual/multi-domain LM recipes, e.g. mC4/PaLM-style
    ``w_d ∝ p_d^τ``): per domain, its share ``p`` of the corpus weight
    (tokens), the renormalized temperature weight ``w``, and the token
    allocation at a given sample budget. ``τ < 1`` upsamples the tail,
    ``τ = 1`` is proportional, ``τ = 0`` uniform.

    One hash aggregation on the domain key plus an unbounded window over
    the domain AGGREGATES (|domains| rows, never the corpus) — nothing
    here scales with input rows except the map-side partial sum."""
    if tau < 0:
        raise ValueError("tau must be >= 0")
    per = (df.groupBy(F.col(domain_col).alias("domain"))
           .agg(F.sum(F.col(weight_col).cast("double")).alias("w_dom")))
    total = Window.partitionBy()
    p = (F.col("w_dom") / F.sum("w_dom").over(total))
    pt = F.pow(p, F.lit(float(tau)))
    w = pt / F.sum(pt).over(total)
    return (per.select("domain",
                       F.col("w_dom").cast("long").alias("n_weight"),
                       p.alias("p"), w.alias("w"))
            .withColumn("alloc", F.col("w") * F.lit(float(budget))))


def mixture_sql(table: str, domain_expr: str, weight_expr: str,
                tau: float = 0.7, budget: int = 1_000_000,
                round_to: int = 6) -> str:
    """DuckDB replay of :func:`mixture_weights` (same float order:
    share → pow → renormalize)."""
    return f"""
WITH per AS (
  SELECT {domain_expr} AS domain,
         SUM(CAST({weight_expr} AS DOUBLE)) AS w_dom
  FROM {table} GROUP BY 1
), sh AS (
  SELECT domain, w_dom, w_dom / SUM(w_dom) OVER () AS p FROM per
), tw AS (
  SELECT domain, w_dom, p, POWER(p, {float(tau)!r}) AS pt FROM sh
)
SELECT domain, CAST(w_dom AS BIGINT) AS n_weight,
       ROUND(p, {round_to}) AS p,
       ROUND(pt / SUM(pt) OVER (), {round_to}) AS w,
       ROUND(pt / SUM(pt) OVER () * {float(budget)!r}, {round_to}) AS alloc
FROM tw ORDER BY domain
""".strip()
