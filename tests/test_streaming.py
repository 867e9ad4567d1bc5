"""Structured-Streaming incremental indexing (foreachBatch + checkpoint)."""

import pytest

import os

from pyspark.sql import functions as F

# full-pipeline Spark e2e: minutes per test at tiny scale (fixed plan/stage
# overhead) - excluded from the fast subset via pytest -m "not slow"
pytestmark = pytest.mark.slow


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


def test_stateful_streaming_dedup(spark, tmp_path):
    """applyInPandasWithState exact-dedup: a sha is emitted once on first
    sight; duplicates in later micro-batches only bump the checkpointed
    state, and a RESTARTED stream recovers the seen-set from the
    checkpoint (no re-emission)."""
    import pandas as pd

    from codegraph.streaming import start_streaming_dedup

    drop = tmp_path / "drop"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    drop.mkdir()

    def land(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            drop / f"{name}.parquet", index=False)

    # batch 1: three unique docs; batch 2 file: one dup of doc 0 + one new
    land("b1", [(0, "alpha"), (1, "beta"), (2, "gamma")])
    land("b2", [(10, "alpha"), (3, "delta")])
    q = start_streaming_dedup(spark, str(drop), str(out), str(ckpt))
    q.awaitTermination(120)

    got = {(r["doc_id"]) for r in spark.read.parquet(str(out)).collect()}
    # 'alpha' emitted once, canonicalized to the MIN doc_id across the
    # micro-batch (both files land in one trigger) — the batch-twin rule
    assert len(got) == 4
    assert {0, 1, 2, 3} <= got and 10 not in got

    # restart with a new drop file: old shas suppressed via recovered state
    land("b3", [(20, "beta"), (4, "epsilon")])
    q2 = start_streaming_dedup(spark, str(drop), str(out), str(ckpt))
    q2.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert 4 in got2 and 20 not in got2
    assert len(got2) == 5


def test_streaming_dedup_first_batch_wins(spark, tmp_path):
    """Cross-batch canonical-id semantics: the FIRST micro-batch that sees a
    sha fixes the canonical id, even when a LATER batch carries a smaller
    doc_id — an append-mode stream cannot retract the emitted row. This is
    the documented divergence from the batch twin (textops.exact_dedup),
    which over the union of both batches would canonicalize to the global
    min (here 3, not 10)."""
    import pandas as pd

    from codegraph.streaming import start_streaming_dedup

    drop = tmp_path / "drop"
    drop.mkdir()

    def land(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            drop / f"{name}.parquet", index=False)

    land("b1", [(10, "zeta")])
    q = start_streaming_dedup(spark, str(drop), str(tmp_path / "out"),
                              str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    land("b2", [(3, "zeta")])  # smaller id, same content, later batch
    q2 = start_streaming_dedup(spark, str(drop), str(tmp_path / "out"),
                               str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    got = [r["doc_id"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()]
    assert got == [10]  # first batch won; no retraction, no re-emission


def test_stateful_streaming_dedup_emits_min_id(spark, tmp_path):
    """Ids landing out of order within one micro-batch: the canonical id is
    min(doc_id) — arrival/partition order must not matter (the batch twin
    textops.exact_dedup canonicalizes by min)."""
    import pandas as pd

    from codegraph.streaming import start_streaming_dedup

    drop = tmp_path / "drop"
    drop.mkdir()
    pd.DataFrame([(42, "same"), (7, "same"), (13, "same"), (9, "other")],
                 columns=["doc_id", "text"]).to_parquet(
        drop / "b1.parquet", index=False)
    q = start_streaming_dedup(spark, str(drop), str(tmp_path / "out"),
                              str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r["text_sha"]: r["doc_id"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert sorted(got.values()) == [7, 9]
