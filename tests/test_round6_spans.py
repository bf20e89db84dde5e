"""Round-6: ExactSubstr span-level dedup (duplicate_spans) — handcrafted
semantics (cross-doc, within-doc, interval merge, short-doc guard) plus a
DuckDB replay parity check on a randomized corpus."""

import duckdb
import numpy as np
import pytest

from raster_functions_spark import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows, k=3, min_count=2):
    out = (dedup.duplicate_spans(_docs(spark, rows), k=k,
                                 min_count=min_count)
           .orderBy("doc_id", "span_start").collect())
    return [(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in out]


def test_cross_doc_span(spark):
    # docs 1 and 2 share the 4-token run "a b c d" → with k=3 the grams
    # "a b c" and "b c d" are each duplicated; positions 0,1 merge into
    # one span [0, 4) in doc 1 and [1, 5) in doc 2.
    rows = [(1, "a b c d x y z"), (2, "q a b c d m n")]
    assert _spans(spark, rows) == [(1, 0, 4, 2), (2, 1, 5, 2)]


def test_within_doc_repetition_counts(spark):
    # a single doc repeating "p q r" twice: positional occurrences 0 and
    # 3 → both covered (within-doc repetition IS duplication), and the
    # two [0,3) / [3,6) intervals touch → merge into [0, 6).
    rows = [(1, "p q r p q r")]
    assert _spans(spark, rows) == [(1, 0, 6, 2)]


def test_disjoint_spans_stay_split(spark):
    # two duplicated grams separated by > k unique tokens → two spans.
    rows = [(1, "a b c u1 u2 u3 u4 d e f"),
            (2, "a b c v1 v2 v3 v4 d e f")]
    assert _spans(spark, rows) == [(1, 0, 3, 1), (1, 7, 10, 1),
                                   (2, 0, 3, 1), (2, 7, 10, 1)]


def test_short_docs_and_uniques_yield_nothing(spark):
    rows = [(1, "a b"), (2, "a b"), (3, "x y z w")]
    # docs 1/2 are dups but shorter than k → no k-gram exists; doc 3 is
    # unique. (Whole-doc dedup is exact_dedup's job, not span dedup's.)
    assert _spans(spark, rows, k=3) == []


def test_min_count_threshold(spark):
    rows = [(1, "a b c x"), (2, "a b c y"), (3, "a b c z")]
    assert _spans(spark, rows, k=3, min_count=3) == [
        (1, 0, 3, 1), (2, 0, 3, 1), (3, 0, 3, 1)]
    with pytest.raises(ValueError):
        dedup.duplicate_spans(_docs(spark, rows), k=3, min_count=1)


def test_duckdb_replay_parity_randomized(spark, tmp_path):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(60):
        n = int(rng.integers(2, 40))
        toks = list(rng.choice(vocab, size=n))
        rows.append((d, " ".join(toks)))
    df = _docs(spark, rows)
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)
    got = (dedup.duplicate_spans(df, k=4)
           .orderBy("doc_id", "span_start").toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = con.execute(dedup.duplicate_spans_sql("documents", k=4)
                       + " ORDER BY doc_id, span_start").df()
    assert len(got) == len(want) and len(got) > 0
    for c in ("doc_id", "span_start", "span_end", "n_grams"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist()
