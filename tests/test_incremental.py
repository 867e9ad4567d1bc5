"""Incremental / deletion / purge semantics (F3, F4, J11, J12)."""

from pyspark.sql import functions as F


def test_mark_deleted_cascades(spark, tiny_result):
    from codegraph.pipeline import mark_deleted

    nodes, edges = tiny_result["nodes"], tiny_result["edges"]
    one = (nodes.filter("label = 'src__File' AND file_path LIKE '%.cs'")
           .select("repo", F.col("file_path").alias("path")).limit(1).collect()[0])
    diff = spark.createDataFrame([(one["repo"], one["path"], "D")],
                                 "repo string, path string, status string")
    marked = mark_deleted(nodes, edges, diff)
    f = marked.filter((F.col("label") == "src__File")
                      & (F.col("repo") == one["repo"])
                      & (F.col("file_path") == one["path"])).collect()
    assert all(r["deleted"] for r in f)
    # declared symbols cascade
    declared = (edges.filter("rel_type = 'src__DECLARES'")
                .filter((F.col("repo") == one["repo"])
                        & (F.col("src_key") == one["path"]))
                .select("repo", F.col("dst_key").alias("key")))
    n_declared = declared.count()
    assert n_declared > 0
    flagged = (marked.filter("label = 'src__Symbol' AND deleted")
               .join(declared, ["repo", "key"], "left_semi").count())
    assert flagged == n_declared
    # no NEW deletions outside the target repo (pre-existing deleted flags
    # from commit-log stubs stay as they were)
    before = nodes.filter("deleted").select("repo", "key")
    new_deleted = (marked.filter("deleted").select("repo", "key")
                   .exceptAll(before))
    assert new_deleted.filter(F.col("repo") != one["repo"]).count() == 0


def test_purge_removes_only_target_repo(spark, tiny_result, tmp_path):
    from codegraph.pipeline import purge

    out = str(tmp_path / "graph")
    tiny_result["nodes"].write.mode("overwrite").parquet(f"{out}/nodes")
    tiny_result["edges"].write.mode("overwrite").parquet(f"{out}/edges")
    purge(spark, out, "repo0000")
    # the LIVE table no longer contains the purged repo (atomic swap)
    kept = spark.read.parquet(f"{out}/nodes")
    assert kept.filter("repo = 'repo0000'").count() == 0
    assert kept.filter("repo = 'repo0001'").count() > 0
    live_edges = spark.read.parquet(f"{out}/edges")
    assert live_edges.filter("repo = 'repo0000'").count() == 0
