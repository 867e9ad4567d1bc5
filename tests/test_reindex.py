"""Re-index idempotency: delete-prior-symbols + upsert (J11)."""

import pytest

from pyspark.sql import functions as F

# full-pipeline Spark e2e: minutes per test at tiny scale (fixed plan/stage
# overhead) - excluded from the fast subset via pytest -m "not slow"
pytestmark = pytest.mark.slow


def test_strip_tfm():
    from codegraph.keys import strip_tfm

    assert strip_tfm("App(net8.0)") == "App"
    assert strip_tfm("App") == "App"
    assert strip_tfm("Lib.Core(net10.0)") == "Lib.Core"


def test_ts_generated_files_skipped():
    from codegraph.extract.dispatch import _extract_one

    ts_projects = {("r", "web"): "webapp"}
    content = "export class X {\n}\n"
    for path in ("web/src/a.d.ts", "web/src/a.generated.ts",
                 "web/dist/a.ts", "web/coverage/a.ts", "web/.nuxt/a.ts"):
        rows = _extract_one("r", path, content, 1, ts_projects, {})
        assert [r for r in rows if r["rec"] == "symbol"] == [], path
    rows = _extract_one("r", "web/src/a.ts", content, 1, ts_projects, {})
    assert [r for r in rows if r["rec"] == "symbol"]


def test_merge_reindex_idempotent(spark, tiny_source, tiny_result):
    # re-running the pipeline for ALL files and merging over the old graph
    # must equal the fresh graph (delete-prior + upsert == rebuild)
    from codegraph.pipeline import merge_reindex, run_pipeline

    old_nodes, old_edges = tiny_result["nodes"], tiny_result["edges"]
    res2 = run_pipeline(spark, tiny_source)
    reindexed = tiny_source.select("repo", "path").distinct()
    merged_nodes, merged_edges = merge_reindex(
        old_nodes, old_edges, res2["nodes"], res2["edges"], reindexed)
    # symbol rows must equal the fresh run's symbol rows exactly
    fresh = (res2["nodes"].filter("label = 'src__Symbol'")
             .select("repo", "key").orderBy("repo", "key").toPandas())
    got = (merged_nodes.filter("label = 'src__Symbol'")
           .select("repo", "key").orderBy("repo", "key").toPandas())
    assert fresh.equals(got)
    # no dangling old symbol-edges survive
    sym_keys = merged_nodes.filter("label = 'src__Symbol'") \
        .select("repo", F.col("key").alias("src_key"))
    contains = merged_edges.filter("rel_type = 'src__CONTAINS'")
    assert contains.join(sym_keys, ["repo", "src_key"], "left_anti").count() == 0
