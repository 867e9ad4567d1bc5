"""Checkpoint-resume: a killed run restarts at the last completed stage and
produces identical tables (BASELINE.json north_star resumability)."""

import os


def test_resume_skips_completed_stages(spark, tiny_source, tmp_path):
    from codegraph.materialize import Ledger, run_checkpointed

    run_dir = str(tmp_path / "run1")
    r1 = run_checkpointed(spark, run_dir, tiny_source)
    e1 = (r1["edges"].orderBy("repo", "src_key", "rel_type", "dst_key")
          .toPandas())

    # simulate a restart: the ledger has all stages done; nothing recomputes
    extract_dir = os.path.join(run_dir, "extract")
    mtime = max(os.path.getmtime(os.path.join(extract_dir, f))
                for f in os.listdir(extract_dir))
    r2 = run_checkpointed(spark, run_dir, tiny_source)
    e2 = (r2["edges"].orderBy("repo", "src_key", "rel_type", "dst_key")
          .toPandas())
    mtime2 = max(os.path.getmtime(os.path.join(extract_dir, f))
                 for f in os.listdir(extract_dir))
    assert mtime2 == mtime, "extract stage was recomputed on resume"
    assert e1.equals(e2)


def test_resume_after_partial_run(spark, tiny_source, tmp_path):
    from codegraph.materialize import Ledger, checkpoint_stage, run_checkpointed

    run_dir = str(tmp_path / "run2")
    # simulate a run killed after the extract stage: only run stage 1
    from codegraph.materialize import _extract_stage
    from codegraph.pipeline import discover

    ledger = Ledger(run_dir)
    filtered = discover(tiny_source)
    checkpoint_stage(spark, ledger, "extract",
                     lambda: _extract_stage(filtered, None))
    assert ledger.is_done("extract")
    assert not ledger.is_done("edges")

    # the restarted run completes from there
    res = run_checkpointed(spark, run_dir, tiny_source)
    assert res["edges"].count() > 0
    assert ledger.is_done("edges")


def test_lineage_metrics(spark, tiny_source, tiny_result):
    from codegraph.materialize import lineage_metrics
    from codegraph.pipeline import discover

    m = lineage_metrics(discover(tiny_source), tiny_result["records"]).toPandas()
    assert m["rows_in"].sum() == discover(tiny_source).count()
    assert (m["symbols_out"] > 0).any()
