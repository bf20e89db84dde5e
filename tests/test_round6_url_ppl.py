"""URL canonicalization edge cases + CCNet ppl bucket invariants."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from raster_functions_spark import text

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Ex1.COM/p/3/?utm_source=x&id=7#sec", "ex1.com/p/3?id=7"),
    ("http://ex1.com/p/3?id=7&utm_campaign=y", "ex1.com/p/3?id=7"),
    ("https://ex2.com/p/4?utm_medium=z", "ex2.com/p/4"),
    ("http://www.ex2.com/p/4/", "ex2.com/p/4"),
    ("ex3.com/a?fbclid=abc123&x=1&gclid=Z", "ex3.com/a?x=1"),
    ("https://ex4.com/", "ex4.com"),
    ("ex5.com/a?utm_a=1&utm_b=2&utm_c=3", "ex5.com/a"),
    ("ex6.com/a?keep=1&utm_x=2&also=3", "ex6.com/a?keep=1&also=3"),
    ("wwwx.com/p", "wwwx.com/p"),          # 'www' only strips with the dot
    ("ex7.com/p#a#b", "ex7.com/p"),
    ("ex8.com", "ex8.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": [r for r, _ in CASES]}))
    got = [r["c"] for r in
           df.select(text.canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_sql_parity():
    con = duckdb.connect()
    for raw, want in CASES:
        sql = text.canonical_url_sql(f"'{raw}'")
        assert con.sql(f"SELECT {sql}").fetchone()[0] == want


def test_ppl_buckets_thirds(spark):
    # 9 docs, one lang: thirds must be exact 3/3/3 and head has lowest nll
    rows = [(i, " ".join(["common"] * 5 + [f"rare{i}"] * i), "xx")
            for i in range(9)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "text", "lang"]))
    out = (text.ppl_buckets(df).toPandas()
           .sort_values("bucket").reset_index(drop=True))
    assert out["n_docs"].tolist() == [3, 3, 3]
    by = dict(zip(out["bucket"], out["avg_nll"]))
    assert by["head"] < by["middle"] < by["tail"]


def test_ppl_buckets_partition_invariant(spark):
    rows = [(i, f"w{i % 7} w{i % 3} common", f"l{i % 2}") for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    outs = []
    for parts in (2, 8):
        df = spark.createDataFrame(pdf).repartition(parts)
        outs.append(text.ppl_buckets(df).toPandas()
                    .sort_values(["lang", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
