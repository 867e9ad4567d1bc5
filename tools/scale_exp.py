"""One-off config experiments on the 8-core scaling leg (the red metric).

Times the full KG pipeline over the scale_bench corpus at local[8] under
shuffle/Arrow config variants, to find configs that relieve the VM's
memory-bandwidth ceiling (BENCH/BASELINE.md). Results print one line per
variant; adopt winners into codegraph/session.py defaults.

Usage: python tools/scale_exp.py [n_repos cpf]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, run_kg_pipeline  # noqa: E402
from codegraph import gen  # noqa: E402
from codegraph.session import get_spark  # noqa: E402

VARIANTS = [
    ("arrow1024", {"spark.sql.execution.arrow.maxRecordsPerBatch": "1024"}),
    ("arrow512", {"spark.sql.execution.arrow.maxRecordsPerBatch": "512"}),
]

# measured 2026-08-17 on the 96x640x16 corpus (59.7M triples), local[8],
# SEQUENTIAL windows (one leg after another, NOT paired):
#   baseline (arrow batch 4096): 840.4 s   71,063 triples/s
#   zstd shuffle codec:          738.0 s   80,919 triples/s
#   arrow batch 2048:            428.1 s  139,493 triples/s
#   zstd + arrow 2048:           496.3 s  120,326 triples/s
#   arrow 1024 / 512:            596.5 s / 603.5 s
# CAVEAT established by a later PAIRED A/B/A/B at sf0.1 local[32]
# (4096: 46.5 s cold / 22.5 s warm; 2048: 24.3 s / 22.2 s): the first leg
# of a session sequence pays a ~2x cold penalty on this host, so the
# sequential sweep above overstates arrow-2048 (which ran third). Warm and
# paired, 2048 vs 4096 is a wash; 2048 stays the session default because it
# never measured slower and bounds per-worker peak memory. Same-config legs
# 40 min apart also swung 845 s vs 597 s - only paired or best-of-N windows
# are meaningful on this host.


def ensure_scale_fixture(n_repos: int, cpf: int) -> str:
    scale_dir = os.path.join(gen.FIXTURE_ROOT, f"scale_bench_{n_repos}x{cpf}")
    marker = os.path.join(scale_dir, "_DONE")
    if not gen.fixture_current(marker):
        os.makedirs(scale_dir, exist_ok=True)
        log(f"scale_exp: generating fixture ({n_repos}x640x{cpf})")
        s = get_spark(app_name="scale-exp-gen", cores=32)
        gen.source_table(s, n_repos, 640, classes_per_file=cpf).write.mode(
            "overwrite").parquet(os.path.join(scale_dir, "source_files.parquet"))
        gen.commit_log_table(s, n_repos, 640).write.mode(
            "overwrite").parquet(os.path.join(scale_dir, "commit_log.parquet"))
        s.createDataFrame(gen.gen_assembly_refs_pdf(n_repos)).write.mode(
            "overwrite").parquet(os.path.join(scale_dir, "assembly_refs.parquet"))
        s.createDataFrame(gen.gen_pkg_metadata_pdf()).write.mode(
            "overwrite").parquet(os.path.join(scale_dir, "pkg_metadata.parquet"))
        s.stop()
        gen.write_fixture_marker(marker)
    return scale_dir


def run_leg(name: str, conf: dict, scale_dir: str, warm_dir: str | None = None):
    s = get_spark(app_name=f"scale-exp-{name}", cores=8, extra_conf=conf)
    try:
        if warm_dir:
            run_kg_pipeline(s, warm_dir)  # burn JIT/codegen cold penalty
        t0 = time.time()
        nn, ne = run_kg_pipeline(s, scale_dir)
        dt = time.time() - t0
        print(f"RESULT {name}: {dt:.1f}s {(nn + ne) / dt:.0f} triples/s "
              f"({nn + ne} triples)", flush=True)
        return dt, (nn + ne) / dt
    finally:
        s.stop()


def main():
    paired = "--paired-zstd" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_repos = int(args[0]) if len(args) > 0 else (48 if paired else 96)
    cpf = int(args[1]) if len(args) > 1 else (8 if paired else 16)
    scale_dir = ensure_scale_fixture(n_repos, cpf)
    if paired:
        # A/B/A/B at the scale corpus: alternate the current default (lz4
        # shuffle codec) with zstd; per-session sf0.001 warmup burns the
        # first-leg cold penalty; best-of-2 per side is the only comparison
        # this host's window variance supports (BENCH/BASELINE.md).
        warm = gen.ensure_fixture_local("sf0.001")
        zstd = {"spark.io.compression.codec": "zstd"}
        best = {"lz4": float("inf"), "zstd": float("inf")}
        for rnd in range(2):
            for name, conf in (("lz4", {}), ("zstd", zstd)):
                dt, _thr = run_leg(f"{name}-{rnd}", conf, scale_dir, warm)
                best[name] = min(best[name], dt)
        print(f"PAIRED lz4 best {best['lz4']:.1f}s vs zstd best "
              f"{best['zstd']:.1f}s -> "
              f"{'zstd' if best['zstd'] < best['lz4'] else 'lz4'} wins "
              f"({abs(1 - best['zstd'] / best['lz4']) * 100:.1f}%)",
              flush=True)
        return
    for name, conf in VARIANTS:
        run_leg(name, conf, scale_dir)


if __name__ == "__main__":
    main()
