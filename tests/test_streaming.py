"""Structured-Streaming incremental indexing (foreachBatch + checkpoint)."""

import os

from pyspark.sql import functions as F


def test_stream_ingest_two_batches(spark, tmp_path):
    from codegraph import gen
    from codegraph.streaming import compact, start_ingest

    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop, exist_ok=True)

    # batch 1: repo0000 files
    pdf1 = gen.gen_source_pdf(0, 20)
    spark.createDataFrame(pdf1).write.mode("append").parquet(drop)
    q = start_ingest(spark, drop, out, ckpt)
    q.awaitTermination(300)

    s1, e1 = compact(spark, out)
    n_sym1 = s1.count()
    assert n_sym1 > 0
    assert e1.count() > 0

    # batch 2: repo0001 files land later; checkpoint resumes, only new files
    pdf2 = gen.gen_source_pdf(1, 20)
    spark.createDataFrame(pdf2).write.mode("append").parquet(drop)
    q2 = start_ingest(spark, drop, out, ckpt)
    q2.awaitTermination(300)

    s2, e2 = compact(spark, out)
    assert set(r["repo"] for r in s2.select("repo").distinct().collect()) == \
        {"repo0000", "repo0001"}
    # batch 1 symbols unchanged (exactly-once per batch via checkpoint)
    only_r0 = s2.filter("repo = 'repo0000'").count()
    assert only_r0 == n_sym1
    # edges dangling-drop still holds per batch universe
    sym_keys = s2.select("repo", F.col("key").alias("src_key"))
    assert e2.join(sym_keys, ["repo", "src_key"], "left_anti").count() == 0
