"""Round-6: snapshot-backed IVF index with incremental append — parity
search(append(A,B)) == search(build(A∪B)) under fixed centroids,
exactly-once appends, and manifest-level partition pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import similarity
from raster_functions_spark.snapshots import SnapshotTable

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return sorted((r.query_id, r.neighbor_id, r.rank)
                  for r in df.select("query_id", "neighbor_id", "rank").collect())


def test_append_parity_with_fixed_centroids(spark, emb, tmp_path):
    """The VERDICT #7 parity contract: with the quantizer frozen,
    searching build(A)+append(B) equals searching build(A∪B) exactly —
    assignment depends only on the centroids, so the split cannot
    matter. Checked at a NON-exhaustive n_probe so list membership
    actually drives the result."""
    corpus = emb.filter(F.col("vec_id") >= 5)
    A = corpus.filter(F.col("vec_id") % 2 == 1)
    B = corpus.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") < 5)
    # fixed centroids from the FULL corpus sample (any fixed C works)
    sample = similarity._train_sample(corpus, "vec_id", "embedding", 500)
    C0 = similarity._kmeans_fit(sample.astype(np.float64), 8)

    p_inc = str(tmp_path / "inc")
    similarity.ivf_build_snapshot(A, p_inc, n_lists=8, centroids=C0)
    similarity.ivf_append(B, p_inc, run_id="ivf-1")
    got = similarity.ivf_search_snapshot(spark, p_inc, queries,
                                         k=3, n_probe=2)

    p_full = str(tmp_path / "full")
    similarity.ivf_build_snapshot(corpus, p_full, n_lists=8, centroids=C0)
    want = similarity.ivf_search_snapshot(spark, p_full, queries,
                                          k=3, n_probe=2)
    assert _rows(got) == _rows(want) and _rows(got)


def test_append_exactly_once_and_loaded_centroids(spark, emb, tmp_path):
    p = str(tmp_path / "idx")
    corpus = emb.filter(F.col("vec_id") >= 5)
    _, C = similarity.ivf_build_snapshot(
        corpus.filter(F.col("vec_id") % 2 == 1), p, n_lists=8)
    np.testing.assert_allclose(similarity.ivf_load_centroids(spark, p), C)
    t = SnapshotTable(spark, p)
    n1 = t.read().count()
    B = corpus.filter(F.col("vec_id") % 2 == 0)
    sid = similarity.ivf_append(B, p, run_id="ivf-1")
    n2 = t.read().count()
    assert n2 == n1 + B.count()
    # replay: same run_id → no-op, same snapshot id, same count
    assert similarity.ivf_append(B, p, run_id="ivf-1") == sid
    assert t.read().count() == n2
    # missing sidecar fails loudly
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivf_load_centroids(spark, str(tmp_path / "nope"))


def test_snapshot_search_prunes_at_manifest_level(spark, emb, tmp_path):
    """read(partition_values=probed) must open only the probed lists'
    files; the search result still matches the unpruned ivf_search."""
    p = str(tmp_path / "idx")
    corpus = emb.filter(F.col("vec_id") >= 5)
    table, C = similarity.ivf_build_snapshot(corpus, p, n_lists=8)
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.ivf_search_snapshot(spark, p, queries, k=3, n_probe=2)
    index_full = table.read()
    want = similarity.ivf_search(index_full, C, queries, k=3, n_probe=2)
    assert _rows(got) == _rows(want) and _rows(got)
    # pruning is real: a single-list read touches a strict file subset
    all_files = {f["path"] for f in table._manifest(table.current_id)}
    lists_present = sorted({f["partition"] for f in
                            table._manifest(table.current_id)
                            if f["partition"] is not None})
    one = [f for f in table._manifest(table.current_id)
           if f["partition"] in (None, lists_present[0])]
    assert len(one) < len(all_files)
    assert (table.read(partition_values=[lists_present[0]]).count()
            == index_full.filter(F.col("list_id") == int(lists_present[0])).count())


def test_streaming_ivf_ingest_matches_batch_build(spark, emb, tmp_path):
    """Stream two vector microbatches into the index; search must equal a
    one-shot build over the union with the same centroids."""
    import numpy as np
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    sample = similarity._train_sample(corpus, "vec_id", "embedding", 500)
    C0 = similarity._kmeans_fit(sample.astype(np.float64), 8)

    A = corpus.filter(F.col("vec_id") % 2 == 1)
    p = str(tmp_path / "idx")
    similarity.ivf_build_snapshot(A, p, n_lists=8, centroids=C0)
    # stream the other half in two file-microbatches
    B = corpus.filter(F.col("vec_id") % 2 == 0)
    src = str(tmp_path / "src")
    B.filter(F.col("vec_id") % 4 == 0).coalesce(1).write.parquet(src + "/a")
    B.filter(F.col("vec_id") % 4 == 2).coalesce(1).write.parquet(src + "/b")
    stream = (spark.readStream.schema(B.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = similarity.start_ivf_ingest(stream, p, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    t = SnapshotTable(spark, p)
    assert [s["run_id"] for s in t.snapshots()] == \
        ["ivf-build-0", "ivf-0", "ivf-1"]
    got = similarity.ivf_search_snapshot(spark, p, queries, k=3, n_probe=2)

    p2 = str(tmp_path / "full")
    similarity.ivf_build_snapshot(corpus, p2, n_lists=8, centroids=C0)
    want = similarity.ivf_search_snapshot(spark, p2, queries, k=3, n_probe=2)
    assert _rows(got) == _rows(want) and _rows(got)
