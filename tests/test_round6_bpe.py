"""Round-6: trained BPE token counting — trainer determinism, merge
semantics anchors (rank-order L2R non-overlap = Sennrich/GPT-2), pandas
UDF vs DuckDB replace-chain oracle parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import text as T
from raster_functions_spark.bpe_vocab import BPE_MERGES


def _count_py(txt, merges):
    import re
    pat = re.compile(T.BPE_TOKEN_PATTERN, re.ASCII)
    memo = {}
    if not txt:
        return 0
    return sum(T._merged_symbol_count(pt, merges, memo)
               for pt in pat.findall(txt.replace("\x1f", "")))


def test_bpe_train_deterministic_and_useful():
    corpus = ["the cat sat on the mat", "the cats sat", "a mat on a cat"] * 5
    m1 = T.bpe_train(corpus, n_merges=10)
    m2 = T.bpe_train(list(corpus), n_merges=10)
    assert m1 == m2 and 0 < len(m1) <= 10   # corpus exhausts below the cap
    # 'the' must become one token: t+h then th+e (or h+e then t+he)
    assert _count_py("the", m1) == 1
    # merges stop when no pair repeats
    assert len(T.bpe_train(["ab cd ef"], n_merges=50)) == 0


def test_merge_semantics_anchors():
    # L2R non-overlap: 'aaa' with merge (a,a) -> [aa, a] = 2 tokens
    assert T._merged_symbol_count("aaa", [("a", "a")], {}) == 2
    assert T._merged_symbol_count("aaaa", [("a", "a")], {}) == 2
    # rank order: (a,b) first then (ab,c): 'abc' -> [abc]
    assert T._merged_symbol_count("abc", [("a", "b"), ("ab", "c")], {}) == 1
    # later-rank merge can't preempt earlier: (a,b) rank0, (b,c) rank1 on
    # 'abc': a+b merges first -> [ab, c] (bc never forms)
    assert T._merged_symbol_count("abc", [("a", "b"), ("b", "c")], {}) == 2
    # batch-vs-one-at-a-time divergence case: merges (a,b) then (ab,a):
    # 'abab' -> all (a,b) first: [ab, ab]; (ab,a) finds no match -> 2
    assert T._merged_symbol_count("abab", [("a", "b"), ("ab", "a")], {}) == 2


def test_sql_replay_matches_python_on_anchors():
    cases = [("aaa", [("a", "a")]),
             ("aaaa", [("a", "a")]),
             ("abc", [("a", "b"), ("ab", "c")]),
             ("abab", [("a", "b"), ("ab", "a")]),
             ("it's a don't-stop world!!!", BPE_MERGES),
             ("", BPE_MERGES),
             ("的是和在 mixed 语言 text", BPE_MERGES),
             # non-ASCII whitespace (U+3000, NBSP): Python \s is Unicode,
             # Java/RE2 \s is ASCII — the UDF compiles with re.ASCII so
             # all three engines treat these as punctuation-class tokens
             ("a\u3000b\u00a0c", BPE_MERGES)]
    con = duckdb.connect()
    for txt, merges in cases:
        con.register("t", pd.DataFrame({"text": [txt]}))
        got = int(con.sql(
            f"SELECT {T.token_count_merged_sql('text', merges)} AS n FROM t"
        ).df()["n"][0])
        assert got == _count_py(txt, merges), (txt, merges)


def test_udf_matches_sql_oracle_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (docs.select("doc_id",
                       T.token_count_merged_udf("text").alias("n"))
           .orderBy("doc_id").toPandas())
    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql(
        f"SELECT doc_id, {T.token_count_merged_sql('text')} AS n "
        "FROM documents ORDER BY doc_id").df()
    assert got["n"].tolist() == [int(x) for x in want["n"]]
    # merged counts refine (not exceed) the char count, and are >= the
    # pre-token count (merges only ever shrink)
    pre = con.sql(
        f"SELECT doc_id, {T.token_count_bpe_sql('text')} AS n "
        "FROM documents ORDER BY doc_id").df()
    assert (got["n"].to_numpy() >= pre["n"].to_numpy()).all()
    assert (got["n"].to_numpy() < pdf.sort_values("doc_id").text.str.len().to_numpy()).all()
