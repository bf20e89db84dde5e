"""Round-6: connected components over dedup pair graphs — large-star/
small-star contraction vs the recursive-CTE oracle, bridge-pair reconnection, and
keep-canonical filtering."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import dedup


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_basic_shapes(spark):
    # two components: a 4-chain (diameter 3) and a triangle, plus a
    # 2-cycle expressed redundantly
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21), (21, 20)]
    got = {r.doc_id: r.component_id for r in
           dedup.connected_components(_pairs_df(spark, pairs)).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_match_recursive_cte_oracle(spark):
    import numpy as np
    rng = np.random.default_rng(3)
    # random sparse graph over 200 nodes
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 200, (150, 2))
             if a != b]
    got = (dedup.connected_components(_pairs_df(spark, pairs))
           .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.register("p", pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    want = con.sql(dedup.components_sql("SELECT id_a, id_b FROM p")
                   + " ORDER BY doc_id").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["component_id"].tolist() == [int(x) for x in want["component_id"]]


def test_components_rejoin_salted_bridge_pairs(spark):
    """The scenario _salted_buckets defers to this pass: an oversized
    bucket split into sub-buckets emits within-sub pairs plus
    canonical bridges — components must reunite the whole bucket."""
    sub1 = [(1, 2), (2, 3)]          # sub-bucket A (canonical 1)
    sub2 = [(7, 8), (8, 9)]          # sub-bucket B (canonical 7)
    bridge = [(1, 7)]                # canonical bridge
    comp = {r.doc_id: r.component_id for r in
            dedup.connected_components(
                _pairs_df(spark, sub1 + sub2 + bridge)).collect()}
    assert set(comp.values()) == {1} and len(comp) == 6


def test_keep_canonical(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string")
    pairs = _pairs_df(spark, [(0, 3), (3, 5)])   # cluster {0,3,5}
    kept = sorted(r.doc_id for r in
                  dedup.dedup_keep_canonical(df, pairs).collect())
    assert kept == [0, 1, 2, 4]                  # 3,5 dropped; singletons kept


def test_components_divergence_guard(spark):
    # a 200-link path cannot contract to stars in 2 alternation rounds
    with pytest.raises(ValueError, match="convergence"):
        dedup.connected_components(
            _pairs_df(spark, [(i, i + 1) for i in range(200)]), max_iter=2)


def test_components_long_path_converges_fast(spark):
    """The algorithmic point of large-star/small-star: a 200-node path
    (diameter 200 — hash-min would need ~200 rounds) contracts in a
    handful of alternation rounds."""
    got = {r.doc_id: r.component_id for r in
           dedup.connected_components(
               _pairs_df(spark, [(i, i + 1) for i in range(200)]),
               max_iter=12).collect()}
    assert set(got.values()) == {0} and len(got) == 201


def test_self_pairs_degenerate_input(spark):
    """A self-pair (x, x) keeps doc x in the output with its own
    component — matching the recursive-CTE oracle on the same input."""
    import pandas as pd
    pairs = [(7, 7), (1, 2)]
    got = {r.doc_id: r.component_id for r in
           dedup.connected_components(_pairs_df(spark, pairs)).collect()}
    assert got == {7: 7, 1: 1, 2: 1}
    con = duckdb.connect()
    con.register("p", pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    want = {int(r[0]): int(r[1]) for r in con.sql(
        dedup.components_sql("SELECT id_a, id_b FROM p")).fetchall()}
    assert got == want


def test_keep_canonical_with_absent_cluster_min(spark):
    """pairs referencing ids absent from df: the cluster keeps its
    min-id member PRESENT in df (pre-fix the whole cluster vanished)."""
    df = spark.createDataFrame([(3, "a"), (5, "b"), (9, "c")],
                               "doc_id long, text string")
    pairs = _pairs_df(spark, [(0, 3), (3, 5)])   # cluster {0,3,5}, 0 absent
    kept = sorted(r.doc_id for r in
                  dedup.dedup_keep_canonical(df, pairs).collect())
    assert kept == [3, 9]                        # 3 kept as present min; 5 dropped


def test_components_match_union_find_many_shapes(spark):
    """Randomized anchor vs an independent union-find reference across
    several graph shapes (sparse, dense, star-heavy, chain-heavy) —
    seeded, one Spark session."""
    import numpy as np

    def union_find(pairs, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-id canonical: path-compress fully then map to min of set
        comps = {}
        for n in nodes:
            comps.setdefault(find(n), []).append(n)
        return {n: min(members) for members in comps.values() for n in members}

    shapes = [
        ("sparse", lambda rng: rng.integers(0, 500, (200, 2))),
        ("dense", lambda rng: rng.integers(0, 60, (400, 2))),
        ("chains", lambda rng: np.stack([np.arange(0, 300, 1),
                                         np.arange(0, 300, 1)
                                         + rng.integers(1, 3, 300)], axis=1)),
        ("stars", lambda rng: np.stack([rng.integers(0, 10, 300),
                                        rng.integers(10, 400, 300)], axis=1)),
    ]
    for name, gen in shapes:
        rng = np.random.default_rng(hash(name) % 2**31)
        raw = gen(rng)
        pairs = [(int(a), int(b)) for a, b in raw]
        nodes = sorted({x for p in pairs for x in p})
        want = union_find(pairs, nodes)
        got = {r.doc_id: r.component_id for r in
               dedup.connected_components(_pairs_df(spark, pairs)).collect()}
        assert got == want, name
