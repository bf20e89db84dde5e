"""Round-6: deterministic sampling/splitting (sampling.py) and the
cross-modal dedup graph (dedup.crossmodal_dedup).

The sampling layer's contract is determinism under re-execution and
corpus growth — the properties that keep eval splits uncontaminated and
mixture weights reproducible on a 100-TB corpus. Every test here checks
the engine against an independent Python-md5 replay of the hash (never
against the engine itself).
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import dedup, sampling

U60 = sampling.U60


def _u60_py(key, seed: int) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------ the hash -----

def test_u60_parity_spark_vs_python(spark):
    df = spark.range(0, 200).select(
        F.col("id"), sampling.u60_col(F.col("id"), 99).alias("u"))
    for r in df.collect():
        assert r["u"] == _u60_py(r["id"], 99)


def test_u60_sql_spark_dialect(spark):
    got = spark.range(0, 50).selectExpr(
        "id", sampling.u60_sql("id", 7, dialect="spark") + " AS u").collect()
    for r in got:
        assert r["u"] == _u60_py(r["id"], 7)


# ------------------------------------------------------------ fraction -----

def test_sample_fraction_matches_python_replay(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    kept = {r["k"] for r in
            sampling.sample_fraction(df, "k", seed=5, fraction=0.3).collect()}
    expect = {i for i in range(1000) if _u60_py(i, 5) < int(0.3 * U60)}
    assert kept == expect
    # ~30% of rows, not degenerate
    assert 200 < len(kept) < 400


def test_sample_fraction_growth_stability(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "k")
    big = spark.range(0, 2000).withColumnRenamed("id", "k")
    ks = {r["k"] for r in
          sampling.sample_fraction(small, "k", seed=5, fraction=0.2).collect()}
    kb = {r["k"] for r in
          sampling.sample_fraction(big, "k", seed=5, fraction=0.2).collect()}
    assert ks == {k for k in kb if k < 500}  # grown corpus keeps every row


def test_sample_fraction_strata_semantics(spark):
    pdf = pd.DataFrame({"k": range(600), "lang": ["a", "b", "c"] * 200})
    df = spark.createDataFrame(pdf)
    out = sampling.sample_fraction(
        df, "k", seed=3, strata_col="lang",
        fractions={"a": 1.0, "b": 0.4, "c": 0.0}).toPandas()
    by = out.groupby("lang")["k"].apply(set).to_dict()
    assert len(by.get("a", set())) == 200          # keep-all stratum intact
    assert "c" not in by                            # explicit 0.0 drops
    expect_b = {k for k in range(600)
                if k % 3 == 1 and _u60_py(k, 3) < int(0.4 * U60)}
    assert by.get("b", set()) == expect_b
    # absent stratum drops too
    out2 = sampling.sample_fraction(
        df, "k", seed=3, strata_col="lang", fractions={"a": 1.0}).toPandas()
    assert set(out2["lang"]) == {"a"}


def test_sample_fraction_arg_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.sample_fraction(df, "k", seed=1, fractions={"x": 0.5})
    with pytest.raises(ValueError):
        sampling.sample_fraction(df, "k", seed=1)


# --------------------------------------------------------------- split -----

def test_split_total_disjoint_and_replayable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.split_by_hash(df, "k", seed=11, weights=w).toPandas()
    assert len(out) == 2000                      # total: every row assigned
    edges = [int(0.8 * U60), int(0.9 * U60)]

    def expect(k):
        u = _u60_py(k, 11)
        return "train" if u < edges[0] else "val" if u < edges[1] else "test"

    for _, r in out.iterrows():
        assert r["split"] == expect(r["k"])
    n = out["split"].value_counts()
    assert 1500 < n["train"] < 1700 and n["val"] > 100 and n["test"] > 100


def test_split_growth_never_moves_rows(spark):
    w = {"train": 0.7, "val": 0.3}
    small = sampling.split_by_hash(
        spark.range(0, 400).withColumnRenamed("id", "k"), "k", 2, w).toPandas()
    big = sampling.split_by_hash(
        spark.range(0, 1600).withColumnRenamed("id", "k"), "k", 2, w).toPandas()
    m_small = dict(zip(small["k"], small["split"]))
    m_big = dict(zip(big["k"], big["split"]))
    assert all(m_big[k] == v for k, v in m_small.items())


def test_split_weights_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.split_by_hash(df, "k", 1, {"a": 0.9, "b": 0.2})
    # remainder falls into the last split: weights summing < 1 stay total
    out = sampling.split_by_hash(df, "k", 1, {"a": 0.5, "b": 0.1}).toPandas()
    assert len(out) == 3 and out["split"].isin(["a", "b"]).all()


# ---------------------------------------------------------- stratified -----

def _window_reference(pdf: pd.DataFrame, strata, n, key, seed):
    pdf = pdf.copy()
    pdf["_u"] = [_u60_py(k, seed) for k in pdf[key]]
    pdf = pdf.sort_values(["_u", key])
    return (pdf.groupby(strata, group_keys=False).head(n)
            .drop(columns="_u"))


def _stratified_case(spark, oversample):
    pdf = pd.DataFrame({
        "k": range(900),
        "lang": ["en"] * 600 + ["de"] * 280 + ["fr"] * 16 + ["zh"] * 4,
    })
    got = sampling.sample_stratified_exact(
        spark.createDataFrame(pdf), ["lang"], 20, "k", seed=13,
        oversample=oversample).toPandas()
    ref = _window_reference(pdf, ["lang"], 20, "k", 13)
    a = got.sort_values(["lang", "k"]).reset_index(drop=True)
    b = ref.sort_values(["lang", "k"]).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)
    n = a.groupby("lang").size().to_dict()
    # zh has only 4 rows: keep-all; fr 16 < 20: keep-all
    assert n == {"en": 20, "de": 20, "fr": 16, "zh": 4}


def test_stratified_exact_matches_full_window(spark):
    _stratified_case(spark, oversample=2.0)


def test_stratified_exact_fallback_path(spark):
    # oversample=1.0 sets each threshold to exactly n/cnt·2^60 — the
    # candidate pool undershoots n with probability ≈ 1/2 per stratum, so
    # the re-window fallback almost surely runs; the result must still be
    # EXACTLY the full-window sample
    _stratified_case(spark, oversample=1.0)


def test_stratified_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.sample_stratified_exact(df, [], 0, "k", 1)


def test_stratified_null_stratum_kept(spark):
    # NULL stratum value (unknown lang) is a legitimate group: the
    # null-safe join/fallback must sample it, not silently drop it
    pdf = pd.DataFrame({
        "k": range(300),
        "lang": ["en"] * 150 + [None] * 150,
    })
    got = sampling.sample_stratified_exact(
        spark.createDataFrame(pdf), ["lang"], 10, "k", seed=8).toPandas()
    n = {("∅" if pd.isna(k) else k): v
         for k, v in got.groupby("lang", dropna=False).size().items()}
    assert n == {"en": 10, "∅": 10}
    ref = _window_reference(pdf, pdf["lang"].fillna("\0"), 10, "k", 8)
    assert set(got["k"]) == set(ref["k"])


def test_stratified_multi_col_strata(spark):
    pdf = pd.DataFrame({
        "k": range(400),
        "lang": ["en", "de"] * 200,
        "src": ["s0", "s0", "s1", "s1"] * 100,
    })
    got = sampling.sample_stratified_exact(
        spark.createDataFrame(pdf), ["lang", "src"], 5, "k", seed=4).toPandas()
    ref = _window_reference(pdf, ["lang", "src"], 5, "k", 4)
    a = got.sort_values(["lang", "src", "k"]).reset_index(drop=True)
    b = ref.sort_values(["lang", "src", "k"]).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------- cross-modal -------

def _cc_py(edges):
    """Union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_caption_exact_pairs_star_form(spark):
    pdf = pd.DataFrame({
        "image_id": [f"i{j}" for j in range(7)],
        "caption": ["dog", "dog", "dog", "cat", "cat", "bird", None],
    })
    out = spark.createDataFrame(pdf)
    pairs = dedup.caption_exact_pairs(out).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    # star edges only: group-min → member, O(group size) not O(group²)
    assert got == {("i0", "i1"), ("i0", "i2"), ("i3", "i4")}


def test_crossmodal_merges_across_modalities(spark):
    # phash clusters {A,B} and {C,D} are visually disjoint (Hamming far),
    # but a caption chain B—C must merge them into ONE component —
    # exactly the transitive match per-modality dedup misses
    pdf = pd.DataFrame({
        "image_id": ["A", "B", "C", "D", "E"],
        # high-bit-set 64-bit hashes in two's-complement (phash is int64)
        "phash": [0, 1, -(1 << 63), -(1 << 63) + 2, 12345],
        "caption": ["x1", "same", "same", "x2", "lonely"],
    })
    out = dedup.crossmodal_dedup(
        spark.createDataFrame(pdf), max_hamming=4).toPandas()
    m = dict(zip(out["doc_id"], out["component_id"]))
    assert m == {"A": "A", "B": "A", "C": "A", "D": "A"}  # E: no edge
    # union-find over the same edges agrees
    cap = dedup.caption_exact_pairs(spark.createDataFrame(pdf)).collect()
    ph = dedup.phash_near_dups(
        spark.createDataFrame(pdf[["image_id", "phash"]]), 4).collect()
    ref = _cc_py([(r["id_a"], r["id_b"]) for r in cap] +
                 [(r["id_a"], r["id_b"]) for r in ph])
    assert m == ref


def test_crossmodal_parallelism_invariance(spark):
    from raster_functions_spark import fixtures
    idx = F.substring("image_id", 4, 9).cast("long")
    outs = []
    for parts in (2, 8):
        images = (fixtures.images_df(spark, 120, partitions=parts)
                  .select("image_id", "phash")
                  .withColumn("caption", F.concat(
                      F.lit("c"), (idx % 40).cast("string"))))
        outs.append(dedup.crossmodal_dedup(images, max_hamming=10)
                    .orderBy("doc_id").toPandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------- decontamination ---------

def test_word_ngrams_and_short_docs(spark):
    from raster_functions_spark import text
    pdf = pd.DataFrame({"doc_id": [1, 2],
                        "text": ["a b c d e", "x y"]})
    out = (spark.createDataFrame(pdf)
           .select("doc_id", text.word_ngrams("text", 3).alias("g"))
           .orderBy("doc_id").collect())
    assert out[0]["g"] == ["a b c", "b c d", "c d e"]
    assert out[1]["g"] == ["x y"]  # short doc: single full-token gram


def test_contamination_hits_and_decontaminate(spark):
    from raster_functions_spark import text
    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "totally unrelated content with no overlap here at all",
                 "the quick brown fox sat still"],
    }))
    ev = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["benchmark says the quick brown fox jumps high"],
    }))
    hits = {r["doc_id"]: r["n_hits"]
            for r in text.contamination_hits(train, ev, k=4).collect()}
    # doc 1 shares 'the quick brown fox' + 'quick brown fox jumps';
    # doc 3 shares only 'the quick brown fox'
    assert hits == {1: 2, 3: 1}
    kept1 = {r["doc_id"]
             for r in text.decontaminate(train, ev, k=4, threshold=1).collect()}
    assert kept1 == {2}
    kept2 = {r["doc_id"]
             for r in text.decontaminate(train, ev, k=4, threshold=2).collect()}
    assert kept2 == {2, 3}


def test_decontaminate_duplicate_grams_count_once(spark):
    from raster_functions_spark import text
    # a gram repeated inside one doc counts ONCE (distinct semantics)
    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["p q r s p q r s p q r s"]}))
    ev = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9], "text": ["z p q r s z"]}))
    hits = text.contamination_hits(train, ev, k=4).collect()
    assert len(hits) == 1 and hits[0]["n_hits"] == 1


# -------------------------------------------------- token budget -----------

def _budget_reference(pdf, strata, budget, weight, key, seed):
    pdf = pdf.copy()
    pdf["_u"] = [_u60_py(k, seed) for k in pdf[key]]
    pdf = pdf.sort_values(["_u", key])
    out = []
    for _, g in pdf.groupby(strata):
        pre = 0
        for _, r in g.iterrows():
            if pre < budget:
                out.append(r)
            pre += r[weight]
    return pd.DataFrame(out).drop(columns="_u")


def _budget_case(spark, oversample):
    pdf = pd.DataFrame({
        "k": range(500),
        "lang": ["en"] * 300 + ["de"] * 150 + ["zh"] * 50,
        "w": [(i * 37) % 90 + 10 for i in range(500)],
    })
    got = sampling.sample_token_budget(
        spark.createDataFrame(pdf), ["lang"], 800, "w", "k", seed=21,
        oversample=oversample).toPandas()
    ref = _budget_reference(pdf, ["lang"], 800, "w", "k", 21)
    a = got.sort_values(["lang", "k"]).reset_index(drop=True)
    b = ref.sort_values(["lang", "k"]).reset_index(drop=True)[a.columns]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # each stratum's kept weight reaches the budget (boundary doc kept)
    for lang, g in a.groupby("lang"):
        assert g["w"].sum() >= 800
        # dropping the boundary doc (last in u60 order) goes under budget
        order = sorted(g["k"], key=lambda k: (_u60_py(k, 21), k))
        assert g["w"].sum() - int(g.set_index("k").loc[order[-1], "w"]) < 800


def test_budget_matches_running_sum_reference(spark):
    _budget_case(spark, oversample=2.0)


def test_budget_fallback_path(spark):
    # oversample=1.0: the candidate pool regularly carries < budget total
    # weight → the re-window fallback must fire and stay exact
    _budget_case(spark, oversample=1.0)


def test_budget_keeps_small_strata_whole(spark):
    pdf = pd.DataFrame({"k": range(20), "lang": ["tiny"] * 20,
                        "w": [5] * 20})
    got = sampling.sample_token_budget(
        spark.createDataFrame(pdf), ["lang"], 1000, "w", "k",
        seed=3).toPandas()
    assert len(got) == 20  # total weight 100 <= budget: whole stratum


def test_budget_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.sample_token_budget(df, ["k"], 0, "k", "k", 1)


# ---------------------------------------------------- repetition -----------

def test_repetition_features_hand_computed(spark):
    from raster_functions_spark import text
    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        # doc 1: 'a b' occurs 3x (overlapping tokens counted as-is);
        #        8 tokens; no 5-gram repeats
        # doc 2: all-distinct bigrams; 'v w x y z' 5-gram occurs 2x (10
        #        tokens of dup mass)
        "text": ["a b c a b c a b",
                 "v w x y z q v w x y z"],
    })
    out = (text.repetition_features(spark.createDataFrame(pdf))
           .orderBy("doc_id").collect())
    # doc1: bigrams = ab bc ca ab bc ca ab -> max 3; top2 = 3*2/8
    assert out[0]["top2_frac"] == round(3 * 2 / 8, 6)
    assert out[0]["dup5_frac"] == round(2 * 5 / 8, 6)  # 'a b c a b' occurs 2x
    # doc2: 11 tokens; 'v w' 'w x' 'x y' 'y z' each occur 2x -> max 2
    assert out[1]["top2_frac"] == round(2 * 2 / 11, 6)
    assert out[1]["dup5_frac"] == round(2 * 5 / 11, 6)
