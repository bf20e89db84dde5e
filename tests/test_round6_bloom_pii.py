"""Round-6: Bloom batch-vs-corpus prefilter (engine/oracle bit parity,
no-false-negative guarantee, exactness of the verified join) and PII
scrubbing (Java-regex/RE2 span agreement, pattern-order semantics)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import dedup, text

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- bloom -------

def _positions_py(key, m: int, k: int, seed: int = dedup.BLOOM_SEED):
    d = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    h1 = int(d[0:15], 16) % m
    h2 = int(d[16:31], 16) % (m - 1) + 1
    return [(h1 + i * h2) % m for i in range(k)]


def test_bloom_positions_match_python_replay(spark):
    keys = ["", "a", "hello world", "ünïcode ☃", "x" * 500]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = df.select(F.array(
        *dedup.bloom_positions_col(F.col("k"), 1 << 12, 4)).alias("p")) \
        .collect()
    by_row = {tuple(r["p"]) for r in got}
    want = {tuple(_positions_py(k, 1 << 12, 4)) for k in keys}
    assert by_row == want


def test_bloom_positions_match_duckdb(spark):
    keys = ["alpha", "beta", "gamma delta", ""]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    eng = sorted(tuple(r["p"]) for r in df.select(F.array(
        *dedup.bloom_positions_col(F.col("k"), 1 << 10, 5)).alias("p"))
        .collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    pos = ", ".join(dedup.bloom_positions_sql("k", 1 << 10, 5))
    ora = sorted(tuple(r[0]) for r in
                 con.sql(f"SELECT [{pos}] FROM t").fetchall())
    assert eng == ora


def test_bloom_build_no_false_negatives_and_replayable_bits(spark):
    keys = [f"key-{i}" for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    m, kh = 1 << 10, 4
    words = dedup.bloom_build(df, "k", m, kh)
    assert words.shape == (m >> 6,) and words.dtype == np.int64
    # bit-exact vs a python-built filter
    want = np.zeros(m >> 6, dtype=np.int64)
    for key in keys:
        for p in _positions_py(key, m, kh):
            want[p >> 6] |= np.int64(np.uint64(1 << (p & 63)))
    assert (words == want).all()
    # membership: every inserted key hits; a disjoint probe set behaves
    # exactly as the python replay predicts (FPs included)
    probes = keys + [f"probe-{i}" for i in range(200)]
    pdf = spark.createDataFrame(pd.DataFrame({"k": probes}))
    got = {r["k"]: r["bloom_hit"] for r in
           dedup.bloom_might_contain(pdf, "k", words, kh).collect()}
    for key in keys:
        assert got[key] is True
    for p in probes:
        pred = all(want[q >> 6] >> (q & 63) & 1
                   for q in _positions_py(p, m, kh))
        assert got[p] == pred


def test_bloom_xxhash64_mode_no_false_negatives(spark):
    # the production hash mode has no python replay — verify the filter
    # CONTRACT instead: zero false negatives, and the FP rate on a
    # disjoint probe set is sane for the sizing
    keys = [f"k{i}" for i in range(300)]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    m, kh = 1 << 14, 5
    words = dedup.bloom_build(df, "k", m, kh, hashes="xxhash64")
    probes = keys + [f"p{i}" for i in range(2000)]
    pdf = spark.createDataFrame(pd.DataFrame({"k": probes}))
    got = {r["k"]: r["bloom_hit"] for r in dedup.bloom_might_contain(
        pdf, "k", words, kh, hashes="xxhash64").collect()}
    assert all(got[k] for k in keys)
    fp = sum(got[p] for p in probes[300:])
    # fill ≈ 300·5/16384 ≈ 0.088 → FP ≈ 0.088^5 ≈ 5e-6; 50/2000 would
    # mean the hash family is broken, not unlucky
    assert fp < 50
    # determinism across rebuilds
    assert (words == dedup.bloom_build(df, "k", m, kh,
                                       hashes="xxhash64")).all()
    with pytest.raises(ValueError):
        dedup.bloom_build(df, "k", m, kh, hashes="sha9000")


def test_bloom_dedup_batch_exact_despite_false_positives(spark):
    # tiny m forces a dense filter — exactness must survive heavy FPs
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6),
                      "k": ["a", "b", "c", "d", "e", "a"]}))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100, 104),
                      "k": ["c", "e", "zz", "qq"]}))
    out = dedup.bloom_dedup_batch(batch, corpus, "k", m_bits=64, k_hashes=3)
    got = {r["doc_id"]: r["is_dup"] for r in out.collect()}
    assert got == {0: False, 1: False, 2: True, 3: False, 4: True, 5: False}


def test_bloom_null_keys(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    m, kh = 1 << 8, 3
    words = dedup.bloom_build(df, "k", m, kh)       # nulls dropped
    want = dedup.bloom_build(
        spark.createDataFrame([("a",), ("b",)], "k string"), "k", m, kh)
    assert (words == want).all()
    got = {r["k"]: r["bloom_hit"] for r in
           dedup.bloom_might_contain(df, "k", words, kh).collect()}
    assert got["a"] is True and got["b"] is True and got[None] is False
    out = dedup.bloom_dedup_batch(
        spark.createDataFrame([(1, "a"), (2, None)], "doc_id long, k string"),
        spark.createDataFrame([(9, "a"), (8, None)], "doc_id long, k string"),
        "k", m_bits=m, k_hashes=kh)
    got = {r["doc_id"]: r["is_dup"] for r in out.collect()}
    # null keys never match anything, including other nulls
    assert got == {1: True, 2: False}


def test_bloom_validation_and_empty(spark):
    with pytest.raises(ValueError):
        dedup.bloom_positions_col(F.col("k"), 100, 3)  # not a mult of 64
    empty = spark.createDataFrame([], "k string")
    words = dedup.bloom_build(empty, "k", 1 << 8, 3)
    assert (words == 0).all()
    out = dedup.bloom_might_contain(
        spark.createDataFrame(pd.DataFrame({"k": ["x"]})), "k", words, 3)
    assert out.collect()[0]["bloom_hit"] is False


# --------------------------------------------------------------- pii -------

def _scrub_expect(rows, spark):
    df = spark.createDataFrame(pd.DataFrame({"text": rows}))
    return text.pii_scrub(df, "text").toPandas()


def test_pii_scrub_basic_types(spark):
    out = _scrub_expect([
        "reach me at jo.ann+x@sub.ex-ample.org today",
        "ssn 123-45-6789 leaked",
        "server 192.168.0.1 up, also 10.0.0.255.",
        "call 415-555-0123 or 415.555.0124",
        "no pii here at all",
    ], spark)
    assert out["n_email"].tolist() == [1, 0, 0, 0, 0]
    assert out["n_ssn"].tolist() == [0, 1, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 0, 2, 0, 0]
    assert out["n_phone"].tolist() == [0, 0, 0, 2, 0]
    assert out["scrubbed"].tolist() == [
        "reach me at <EMAIL> today",
        "ssn <SSN> leaked",
        "server <IP> up, also <IP>.",
        "call <PHONE> or <PHONE>",
        "no pii here at all",
    ]


def test_pii_scrub_order_and_lookalikes(spark):
    out = _scrub_expect([
        # email local part has a phone-shaped digit run — email wins (its
        # pattern runs first and consumes the span)
        "415-555-0123@ex.com",
        # 3-2-4 is SSN, 3-3-4 is phone; neither matches the other's shape
        "123-45-6789 and 123-456-7890",
        # incomplete shapes stay untouched
        "1.2.3 or 12-34-5678 or user@nodot",
    ], spark)
    assert out["scrubbed"].tolist() == [
        "<EMAIL>",
        "<SSN> and <PHONE>",
        "1.2.3 or 12-34-5678 or user@nodot",
    ]
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_phone"] == 0


def test_pii_sql_matches_engine(spark):
    rows = [
        "a@b.co then 078-05-1120, host 8.8.8.8 call 212.555.9999 x",
        "double a@b.co c@d.org and ips 1.1.1.1 2.2.2.2",
        "",
        "edge: trailing dot email user@ex.org.",
    ]
    eng = _scrub_expect(rows, spark)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": rows}))
    cols = ", ".join(text.pii_sql("text"))
    ora = con.sql(f"SELECT {cols} FROM t").df()
    for c in ["n_email", "n_ssn", "n_ipv4", "n_phone", "scrubbed"]:
        assert eng[c].tolist() == ora[c].tolist(), c


# ---------------------------------------------- incremental dedup ingest ---

def test_dedup_ingest_batches_and_replay(spark, tmp_path):
    rows = [(i, f"text {i % 6}") for i in range(20)]           # 6 keys
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ing = dedup.DedupIngest(spark, str(tmp_path / "c"), m_bits=1 << 10,
                            n_buckets=4)
    s1 = ing.ingest(df.filter("doc_id < 10"), run_id="b-0")
    assert s1 == {"batch_rows": 10, "novel": 6, "null_key": 0}                # keys 0..5
    s2 = ing.ingest(df.filter("doc_id >= 10"), run_id="b-1")
    assert s2 == {"batch_rows": 10, "novel": 0, "null_key": 0}                # all dups
    got = sorted((r["doc_id"], r["text"]) for r in ing.corpus().collect())
    assert got == [(i, f"text {i}") for i in range(6)]         # keep-first
    # replayed run_id: commit no-ops even with different data
    ing.ingest(df.limit(3), run_id="b-0")
    assert ing.corpus().count() == 6
    assert [s["run_id"] for s in ing.table.snapshots()][:2] == ["b-0", "b-1"]


def test_dedup_ingest_restart_rebuilds_bloom(spark, tmp_path):
    df1 = spark.createDataFrame([(i, f"k{i}") for i in range(8)],
                                "doc_id long, text string")
    p = str(tmp_path / "c")
    dedup.DedupIngest(spark, p, m_bits=1 << 10).ingest(df1, run_id="b-0")
    # NEW instance (fresh process semantics): bloom must rebuild from the
    # committed hash index, so re-offered rows are recognized as dups
    ing2 = dedup.DedupIngest(spark, p, m_bits=1 << 10)
    df2 = spark.createDataFrame(
        [(100 + i, f"k{i}") for i in range(8)] + [(200, "brand new")],
        "doc_id long, text string")
    s = ing2.ingest(df2, run_id="b-1")
    assert s["novel"] == 1
    assert ing2.corpus().count() == 9


def test_dedup_ingest_streaming(spark, tmp_path):
    import pandas as pd
    rows = pd.DataFrame({"doc_id": range(30), "text":
                         [f"t {i % 10}" for i in range(30)]})
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows)
    df.filter("doc_id < 15").coalesce(1).write.parquet(src + "/a")
    df.filter("doc_id >= 15").coalesce(1).write.parquet(src + "/b")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = dedup.start_dedup_ingest(stream, str(tmp_path / "c"),
                                 str(tmp_path / "ck"), m_bits=1 << 10,
                                 n_buckets=4, run_prefix="sA")
    q.awaitTermination(120)
    ing = dedup.DedupIngest(spark, str(tmp_path / "c"), m_bits=1 << 10)
    out = ing.corpus().collect()
    # one row per key, whichever batch won (file order is not guaranteed)
    assert sorted(r["text"] for r in out) == sorted(f"t {i}"
                                                    for i in range(10))
    assert all(s["run_id"].startswith("sA-")
               for s in ing.table.snapshots())


def test_dedup_ingest_quarantines_null_keys(spark, tmp_path):
    """A NULL content key is a bloom non-member AND null-skipped by the
    verify anti-join — without quarantine it would land in the corpus
    every single batch."""
    import pandas as pd
    from raster_functions_spark import dedup
    ing = dedup.DedupIngest(spark, str(tmp_path / "c"), m_bits=1 << 10,
                            n_buckets=2)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b", None, "a b"]}))
    r1 = ing.ingest(df, run_id="b-0")
    assert r1 == {"batch_rows": 3, "novel": 1, "null_key": 1}
    r2 = ing.ingest(df, run_id="b-1")     # replayed content, new run
    assert r2 == {"batch_rows": 3, "novel": 0, "null_key": 1}
    assert ing.corpus().count() == 1
