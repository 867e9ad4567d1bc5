"""Similarity search: brute-force correctness + ANN recall."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_cosine_topk_shape(spark, emb):
    from codegraph.simsearch import cosine_topk

    out = cosine_topk(emb, n_queries=5, k=3).toPandas()
    assert set(out["query_id"]) == set(range(5))
    assert (out.groupby("query_id")["rank"].max() == 3).all()
    # no self matches, cosine within [-1, 1]
    assert (out["query_id"] != out["vec_id"]).all()
    assert out["cosine"].between(-1.000001, 1.000001).all()
    # ranks strictly ordered by (cosine desc, vec_id)
    for _, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert (g["cosine"].diff().dropna() <= 1e-12).all()


def test_ann_recall(spark, emb):
    from codegraph.simsearch import ann_lsh_topk, cosine_topk

    exact = cosine_topk(emb, n_queries=10, k=5).toPandas()
    ann = ann_lsh_topk(emb, n_queries=10, k=5).toPandas()
    hits = 0
    total = 0
    for q in range(10):
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(ann[ann.query_id == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall >= 0.8, f"ANN recall {recall:.2f} < 0.8"


def test_ann_scales_planes_with_corpus(spark, emb):
    """Bucket count must track corpus size: at 10x the vectors the derived
    plane count rises (buckets stay ~target_bucket sized) and recall holds."""
    from codegraph.simsearch import ann_lsh_topk, cosine_topk

    big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    n = big.count()
    assert n >= 4 * emb.count()
    exact = cosine_topk(big, n_queries=10, k=5).toPandas()
    ann = ann_lsh_topk(big, n_queries=10, k=5).toPandas()
    hits = total = 0
    for q in range(10):
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(ann[ann.query_id == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.8
    # derived plane count grows with N: log2(N/64) buckets per table
    import math
    expect_planes = max(3, min(24, math.ceil(math.log2(max(2.0, n / 64)))))
    assert expect_planes > max(3, min(24, math.ceil(math.log2(max(2.0, emb.count() / 64)))))
    big.unpersist()


def test_ann_deterministic(spark, emb):
    from codegraph.simsearch import ann_lsh_topk

    a = ann_lsh_topk(emb, n_queries=3, k=3).orderBy("query_id", "rank").toPandas()
    b = ann_lsh_topk(emb, n_queries=3, k=3).orderBy("query_id", "rank").toPandas()
    assert a.equals(b)
