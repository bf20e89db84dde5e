"""Round-6: context-window chunking (chunk_tokens) and sequence packing
(pack_sequences) — edge rules, invariants, and DuckDB replay parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import sampling, text


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(rows)), "text": rows}))


def test_chunk_tokens_edges(spark):
    docs = _docs(spark, [
        " ".join(f"t{i}" for i in range(10)),   # 10 toks → 3 chunks @4/1
        "solo",                                  # 1 tok  → 1 chunk
        "",                                      # empty  → 1 chunk of ''
        " ".join(f"t{i}" for i in range(4)),     # exactly max_tokens
    ])
    out = (text.chunk_tokens(docs, max_tokens=4, overlap=1)
           .orderBy("doc_id", "chunk_idx").collect())
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]))
    # step = 3: chunks start at tokens 0, 3, 6, 9
    assert by[0] == [(0, "t0 t1 t2 t3", 4), (1, "t3 t4 t5 t6", 4),
                     (2, "t6 t7 t8 t9", 4)]
    assert by[1] == [(0, "solo", 1)]
    assert by[2] == [(0, "", 1)]
    # exactly max_tokens: ONE chunk — a second chunk would hold only the
    # overlap tail, which the ceil((n-overlap)/step) count excludes
    assert by[3] == [(0, "t0 t1 t2 t3", 4)]
    with pytest.raises(ValueError):
        text.chunk_tokens(docs, max_tokens=4, overlap=4)


def test_chunk_tokens_coverage_property(spark):
    # every token of every doc appears in ≥1 chunk at the right place:
    # reassembling non-overlap parts reproduces the document
    rows = [" ".join(f"w{j}" for j in range(n)) for n in (1, 5, 7, 24, 25)]
    docs = _docs(spark, rows)
    out = (text.chunk_tokens(docs, max_tokens=8, overlap=3)
           .orderBy("doc_id", "chunk_idx").collect())
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r["chunk_text"].split(" "))
    for i, rtext in enumerate(rows):
        toks = rtext.split(" ")
        rebuilt = list(by[i][0])
        for ch in by[i][1:]:
            assert rebuilt[-3:] == ch[:3]       # overlap agrees
            rebuilt.extend(ch[3:])
        assert rebuilt == toks


def test_chunk_sql_parity_unicode(spark):
    rows = ["ünï ☃ tok " * 5, "a  b", "x"]
    docs = _docs(spark, rows)
    eng = (text.chunk_tokens(docs, max_tokens=3, overlap=1)
           .orderBy("doc_id", "chunk_idx").toPandas())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(rows)),
                                            "text": rows}))
    ora = con.sql(text.chunk_tokens_sql("documents", max_tokens=3, overlap=1)
                  + " ORDER BY doc_id, chunk_idx").df()
    assert eng.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(200), "w": [(i * 37) % 90 + 10 for i in range(200)]}))
    out = (sampling.pack_sequences(df, "w", 128, "doc_id", seed=5,
                                   n_buckets=3)
           .select("doc_id", "w", "pack_bucket", "pack_bin", "pack_offset")
           .collect())
    assert len(out) == 200
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    assert set(by_bucket) <= {0, 1, 2}
    for b, rows in by_bucket.items():
        # replay the prefix walk: offset = prefix mod capacity,
        # bin = prefix div capacity, in (u60, key) order
        import hashlib
        def u60(k, s):
            return int(hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:15], 16)
        rows.sort(key=lambda r: (u60(r["doc_id"], 5), r["doc_id"]))
        pre = 0
        for r in rows:
            assert r["pack_bin"] == pre // 128
            assert r["pack_offset"] == pre % 128
            pre += r["w"]
        bins = [r["pack_bin"] for r in rows]
        assert bins == sorted(bins)              # non-decreasing
        assert bins[0] == 0                      # bins start at 0
    with pytest.raises(ValueError):
        sampling.pack_sequences(df, "w", 0, "doc_id", seed=5)
    with pytest.raises(ValueError):
        sampling.pack_sequences(df, "w", 128, "doc_id", seed=5, n_buckets=0)


def test_pack_growth_stability(spark):
    # adding new docs must never move an existing doc to a DIFFERENT
    # relative position in its bucket stream (hash order is stable), so
    # a doc's bin can only stay or grow as the corpus grows — and docs
    # whose prefix was unaffected keep their exact (bin, offset)
    base = pd.DataFrame({"doc_id": range(100),
                         "w": [10 + (i % 7) for i in range(100)]})
    grown = pd.concat([base, pd.DataFrame(
        {"doc_id": range(100, 140),
         "w": [10 + (i % 7) for i in range(100, 140)]})])
    a = {r["doc_id"]: (r["pack_bucket"], r["pack_bin"], r["pack_offset"])
         for r in sampling.pack_sequences(
             spark.createDataFrame(base), "w", 64, "doc_id", seed=9,
             n_buckets=2).collect()}
    b = {r["doc_id"]: (r["pack_bucket"], r["pack_bin"], r["pack_offset"])
         for r in sampling.pack_sequences(
             spark.createDataFrame(grown), "w", 64, "doc_id", seed=9,
             n_buckets=2).collect()}
    moved_bucket = [k for k in a if a[k][0] != b[k][0]]
    assert moved_bucket == []                    # bucket never changes
    assert all(b[k][1] >= a[k][1] for k in a)    # bin monotone under growth


# ------------------------------ hypothesis anchors (DuckDB vs python) ------
# the Spark↔DuckDB parity is covered by the contract queries above; these
# anchor the SHARED spec against an independent pure-python reference so
# both engines can't be wrong together (same pattern as the union-find
# anchor for connected components)

import duckdb as _dd
import hashlib as _hl
from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abΩ☃x0", min_size=1, max_size=4)


def _ref_chunks(tokens, max_tokens, overlap):
    step = max_tokens - overlap
    n = len(tokens)
    out = []
    i = 0
    while True:
        out.append(tokens[i * step:i * step + max_tokens])
        if i * step + max_tokens >= n:
            break
        i += 1
    # the formula keeps a trailing overlap-only chunk out; emulate by the
    # same count rule
    n_chunks = max(-(-(n - overlap) // step), 1)
    return out[:n_chunks]


@given(st.lists(st.lists(_WORD, min_size=1, max_size=30), min_size=1,
                max_size=8),
       st.integers(2, 9), st.integers(0, 3))
@settings(max_examples=40, deadline=None)
def test_chunk_sql_matches_python_reference(docs, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    con = _dd.connect()
    import pandas as pd
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(docs)), "text": [" ".join(d) for d in docs]}))
    got = con.sql(text.chunk_tokens_sql(
        "documents", max_tokens=max_tokens, overlap=overlap)
        + " ORDER BY doc_id, chunk_idx").fetchall()
    want = []
    for i, d in enumerate(docs):
        for ci, ch in enumerate(_ref_chunks(d, max_tokens, overlap)):
            want.append((i, ci, " ".join(ch), len(ch)))
    assert got == want


def _u60(k, s):
    return int(_hl.md5(f"{k}:{s}".encode()).hexdigest()[:15], 16)


@given(st.lists(st.integers(0, 50), min_size=1, max_size=60, unique=True),
       st.integers(1, 40), st.integers(1, 4), st.integers(0, 9))
@settings(max_examples=40, deadline=None)
def test_pack_sql_matches_python_reference(ids, capacity, n_buckets, seed):
    import pandas as pd
    ws = {k: (k * 13) % 29 + 1 for k in ids}
    con = _dd.connect()
    con.register("t", pd.DataFrame(
        {"doc_id": ids, "w": [ws[k] for k in ids]}))
    got = {r[0]: r[1:] for r in con.sql(sampling.pack_sql(
        "t", "w", capacity, "doc_id", seed, "doc_id",
        n_buckets=n_buckets)).fetchall()}
    # python reference: bucket, then (u60, key) walk per bucket
    want = {}
    for b in range(n_buckets):
        stream = sorted((k for k in ids
                         if _u60(k, seed + 1) % n_buckets == b),
                        key=lambda k: (_u60(k, seed), k))
        pre = 0
        for k in stream:
            want[k] = (b, pre // capacity, pre % capacity)
            pre += ws[k]
    assert got == want


def test_pack_export_reconstruction(spark):
    """Concatenating a bucket's exported bins in bin order reproduces the
    bucket's documents concatenated in (u60, key) pack order exactly —
    and every bin except the bucket's last holds exactly `capacity`
    tokens. Run at two bucket counts (1 = one global stream)."""
    import hashlib
    rows = [" ".join(f"d{i}w{j}" for j in range(1 + (i * 7) % 23))
            for i in range(60)]
    docs = _docs(spark, rows)
    for n_buckets in (1, 3):
        cap = 16
        out = (sampling.pack_export(docs, "text", cap, "doc_id",
                                    seed=5, n_buckets=n_buckets)
               .orderBy("pack_bucket", "pack_bin").collect())
        # pack order ground truth from the assignment op
        asg = (sampling.pack_sequences(
                   docs.withColumn("_w", F.size(F.split("text", " "))),
                   "_w", cap, "doc_id", seed=5, n_buckets=n_buckets)
               .orderBy("pack_bucket", "pack_bin", "pack_offset").collect())
        want_tokens: dict[int, list[str]] = {}
        for r in asg:
            want_tokens.setdefault(r["pack_bucket"], []).extend(
                rows[r["doc_id"]].split(" "))
        got_tokens: dict[int, list[str]] = {}
        last_bin = {}
        for r in out:
            b = r["pack_bucket"]
            last_bin[b] = max(last_bin.get(b, -1), r["pack_bin"])
        for r in out:
            b = r["pack_bucket"]
            if r["pack_bin"] != last_bin[b]:
                assert r["n_tokens"] == cap, r
            got_tokens.setdefault(b, []).append(r)
        for b, want in want_tokens.items():
            seq = []
            for r in sorted(got_tokens[b], key=lambda r: r["pack_bin"]):
                # md5 pins the content: re-derive each bin from the want
                # stream and compare fingerprints
                start = r["pack_bin"] * cap
                piece = want[start:start + cap]
                assert r["n_tokens"] == len(piece)
                assert r["seq_md5"] == hashlib.md5(
                    " ".join(piece).encode()).hexdigest()
                seq.extend(piece)
            assert seq == want


def test_pack_export_single_doc_spans_many_bins(spark):
    docs = _docs(spark, [" ".join(f"t{j}" for j in range(50))])
    out = (sampling.pack_export(docs, "text", 8, "doc_id", seed=1)
           .orderBy("pack_bin").collect())
    assert [r["pack_bin"] for r in out] == list(range(7))
    assert [r["n_tokens"] for r in out] == [8] * 6 + [2]
    assert all(r["n_docs"] == 1 for r in out)
