"""Round-7 measurement harness (bench.py is frozen for the driver).

Per-query isolation with the noop sink (guide §1.4): times the computation,
not the sink or toPandas. Also captures .explain("formatted") per query into
plans/r07/ and the kg_pipeline phase split.

Usage:
  python bench_extra.py queries [name ...]    # time doc_/emb_/rel_ queries
  python bench_extra.py kg [sf_dir]           # kg_pipeline phases (bench shape)
  python bench_extra.py plans <tag> [name...] # write plans/r07/<q>_<tag>.txt
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r07")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMALL_QUERIES = ("doc_minhash_lsh", "doc_simhash", "doc_langid",
                 "emb_cosine_topk", "rel_broadcast_join", "rel_groupby_stats")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    import __spark_entry__ as E
    from codegraph.session import get_spark

    spark = get_spark(app_name=f"bench-extra-{mode}", cores=CPUS)
    qs = E.queries()

    if mode == "kg":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
        from bench import run_kg_pipeline
        from codegraph import gen
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        fixture_dir = (E._ensure_bench_fixture(spark) if sf_name == "sf0.1"
                       else gen.ensure_fixture_local(gen.sf_name_from_dir(sf_dir)))
        warm = gen.ensure_fixture_local("sf0.001")
        t0 = time.time()
        run_kg_pipeline(spark, warm)
        log(f"warmup(sf0.001) {time.time()-t0:.1f}s")
        for i in range(int(os.environ.get("KG_WINDOWS", "2"))):
            t0 = time.time()
            nn, ne, phases = run_kg_pipeline(spark, fixture_dir)
            log(f"kg[{fixture_dir}] window{i+1} {time.time()-t0:.2f}s "
                f"phases={phases} nodes={nn} edges={ne}")
        return

    if mode == "plans":
        tag = sys.argv[2]
        names = sys.argv[3:] or list(SMALL_QUERIES)
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            out = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(out, "w") as f:
                f.write(p)
            log(f"wrote {out} ({p.count('Exchange')} Exchange refs)")
        return

    names = sys.argv[2:] or list(SMALL_QUERIES)
    # warm the JVM/codegen once on a cheap query
    noop(qs["rel_groupby_stats"](spark, SF_DIR))
    for name in names:
        spark.sparkContext.setJobDescription(f"bx:{name}")
        ts = [timed(lambda: noop(qs[name](spark, SF_DIR))) for _ in range(3)]
        log(f"{name}: best {min(ts):.3f}s  windows "
            + "/".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
