"""Phase-level profile of the KG pipeline: extract / link(edges) / assemble.

Usage: python tools/profile_phases.py [fixture_dir] [cores]

Prints one JSON line: {"extract": s, "edges": s, "nodes": s, "total": s,
"n_nodes": N, "n_edges": N, "triples_per_sec": N}. The same split feeds
bench.py's phase block so BENCH_rN.json can adjudicate variance vs DAG
growth (r5 verdict #1a).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def profile(spark, fixture_dir: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from codegraph import pipeline as P
    from codegraph.materialize import _extract_stage

    src = spark.read.parquet(os.path.join(fixture_dir, "source_files.parquet"))
    cl = spark.read.parquet(os.path.join(fixture_dir, "commit_log.parquet"))
    ar = spark.read.parquet(os.path.join(fixture_dir, "assembly_refs.parquet"))
    pm = spark.read.parquet(os.path.join(fixture_dir, "pkg_metadata.parquet"))

    tmp = tempfile.mkdtemp(prefix="codegraph_profile_")
    out = {}
    try:
        t0 = time.time()
        filtered = P.discover(src)
        target = spark.sparkContext.defaultParallelism
        try:
            n_inputs = len(filtered.inputFiles())
        except Exception:
            n_inputs = target
        if n_inputs < target:
            filtered = filtered.repartition(target)
        _extract_stage(filtered, pm).write.mode("overwrite").parquet(tmp)
        out["extract"] = round(time.time() - t0, 3)

        records = spark.read.parquet(tmp)
        t1 = time.time()
        res = P.run_pipeline(spark, src, commit_log=cl, assembly_refs=ar,
                             pkg_metadata=pm, persist=True, records=records)
        out["n_edges"] = res["edges"].count()
        out["edges"] = round(time.time() - t1, 3)
        t2 = time.time()
        out["n_nodes"] = res["nodes"].count()
        out["nodes"] = round(time.time() - t2, 3)
        out["total"] = round(time.time() - t0, 3)
        out["triples_per_sec"] = round(
            (out["n_nodes"] + out["n_edges"]) / out["total"], 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()
    return out


def main():
    fixture_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/sf0.01"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from codegraph.session import get_spark
    spark = get_spark(app_name="codegraph-profile", cores=cores)
    # warm the JVM/codegen path once on the smallest fixture so the profile
    # measures steady state (same discipline as bench.py)
    from codegraph import gen
    warm = gen.ensure_fixture_local("sf0.001")
    profile(spark, warm)
    out = profile(spark, fixture_dir)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
