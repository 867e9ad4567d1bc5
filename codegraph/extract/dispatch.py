"""Extraction dispatch: one vectorized mapInPandas stage over the source table.

Handler selection mirrors SolutionProcessor.HandlerLookup:333-379 — filename
match first (package.json, pubspec.yaml), then case-insensitive extension
match (config.json:1-17). The ``lang`` input column is informational only,
exactly like the reference (it dispatches on path, never on a label).

Scale notes: the two dimension lookups the lexers need (TS project roots,
package metadata) are shipped as ``sc.broadcast`` variables — deserialized
once per executor, not pickled into every task closure — and their driver
footprint is bounded (names + dirs only, never file contents). At 100 TB the
package universe stays in the low millions of entries (the reference memoizes
the same lookups per project root, TypeScriptBridgeService.cs:16-19).
"""

from __future__ import annotations

import posixpath

import pandas as pd

from codegraph import keys
from codegraph.extract import csharp as cs
from codegraph.extract import textlike as tl
from codegraph.extract import tsdart as td
from codegraph.extract.base import Emitter
from codegraph.schema import EXTRACT_SCHEMA, HANDLER_LANG_TECH

_EXT_TO_HANDLER = {
    ".cs": "csharp", ".razor": "razor", ".xaml": "xaml", ".xml": "xml",
    ".json": "json", ".css": "css", ".html": "html", ".csproj": "csproj",
    ".ts": "typescript", ".tsx": "typescript", ".js": "javascript",
    ".dart": "dart",
}

# broadcast-dim safety cap: fail loudly instead of silently OOMing the driver
MAX_DIM_ROWS = 2_000_000


def handler_for_path(path: str) -> str | None:
    fname = posixpath.basename(path).lower()
    if fname == "package.json":
        return "packagejson"
    if fname == "pubspec.yaml":
        return "pubspec"
    ext = posixpath.splitext(fname)[1]
    return _EXT_TO_HANDLER.get(ext)


def _extract_into(em: Emitter, repo: str, path: str, content: str, min_acc: int,
                  ts_projects: dict, pkg_meta: dict,
                  ts_resolved: tuple | None = None,
                  ts_configs: dict | None = None) -> None:
    handler = handler_for_path(path)
    file_key = path  # fileKey == solution-relative path (FileService.cs:24-55)
    if handler is None:
        em.set_file(repo, path, "unknown", "unknown", "unknown")
        em.filemeta(None)
        return
    language, technology = HANDLER_LANG_TECH[handler]
    em.set_file(repo, path, handler, language, technology)
    if content is None:
        em.filemeta(None)
        return
    if handler == "csharp":
        cs.extract_csharp(em, content, repo, file_key, min_acc)
    elif handler == "razor":
        tl.extract_razor(em, content, repo, file_key, min_acc)
    elif handler == "xaml":
        tl.extract_xaml(em, content, repo, file_key, min_acc)
    elif handler == "xml":
        tl.extract_xml(em, content, file_key, min_acc)
    elif handler == "json":
        tl.extract_json(em, content, file_key, min_acc)
    elif handler == "css":
        tl.extract_css(em, content, file_key, min_acc)
    elif handler == "html":
        tl.extract_html(em, content, file_key, min_acc)
    elif handler == "csproj":
        tl.extract_csproj(em, content, file_key, min_acc, pkg_meta)
    elif handler == "packagejson":
        tl.extract_packagejson(em, content, file_key, min_acc, pkg_meta)
    elif handler == "pubspec":
        tl.extract_pubspec(em, content, file_key, min_acc)
    elif handler in ("typescript", "javascript"):
        td.extract_ts(em, content, repo, file_key, min_acc, ts_projects,
                      resolved=ts_resolved, ts_configs=ts_configs)
    elif handler == "dart":
        td.extract_dart(em, content, repo, file_key, min_acc)


def _extract_one(repo: str, path: str, content: str, min_acc: int,
                 ts_projects: dict, pkg_meta: dict,
                 ts_configs: dict | None = None) -> list[dict]:
    """Single-file extraction returning row dicts (test/debug convenience)."""
    em = Emitter()
    _extract_into(em, repo, path, content, min_acc, ts_projects, pkg_meta,
                  ts_configs=ts_configs)
    return em.rows


def extract_records(source_df, min_acc: int, ts_projects: dict | None,
                    pkg_meta: dict, ts_configs: dict | None = None):
    """source (repo, path, commit, lang, content) -> unified extraction
    records. ts_projects: {(repo, dir): project_name} from the package.json
    pre-scan (stand-in for FindProjectRoot, TypeScriptHandlerBase.cs:115-129);
    pkg_meta: {(source, pkg): (homepage, repository, project_url)};
    ts_configs: {(repo, dir): (include_json, exclude_json)} tsconfig file
    selection per project root (analyzer.ts:11-33).

    The dims ride as broadcast variables: unpacked once per executor JVM
    worker instead of being serialized into every task.

    ``ts_projects=None`` selects the large-dim join path: the source must
    already carry ``ts_project``/``ts_project_dir``/``ts_includes``/
    ``ts_excludes`` columns (from ``attach_ts_projects``) and the per-row
    values replace the in-UDF ancestor walk."""
    sc = source_df.sparkSession.sparkContext
    join_mode = ts_projects is None
    bc_ts = sc.broadcast({} if join_mode else ts_projects)
    bc_cfg = sc.broadcast(ts_configs or {})
    bc_pkg = sc.broadcast(pkg_meta)

    def _s(v):
        return v if isinstance(v, str) else None

    # Arrow-native batches on BOTH sides of the Python boundary (guide §4):
    # to_pydict() hands the lexers plain python strings in one C call per
    # column (no pandas object-array hop), and Emitter.to_arrow() returns
    # the record batch the same way. The function is otherwise unchanged.
    def run(batches):
        ts, pkg, cfg = bc_ts.value, bc_pkg.value, bc_cfg.value
        for rb in batches:
            d = rb.to_pydict()
            em = Emitter()
            if join_mode:
                for repo, path, content, proj, pdir, inc, exc, tsp, tsb in zip(
                        d["repo"], d["path"], d["content"],
                        d["ts_project"], d["ts_project_dir"],
                        d["ts_includes"], d["ts_excludes"],
                        d["ts_paths"], d["ts_baseurl"]):
                    resolved = (_s(proj), _s(pdir), _s(inc), _s(exc),
                                _s(tsp), _s(tsb))
                    _extract_into(em, repo, path, content, min_acc, ts, pkg,
                                  ts_resolved=resolved)
            else:
                for repo, path, content in zip(d["repo"], d["path"],
                                               d["content"]):
                    _extract_into(em, repo, path, content, min_acc, ts, pkg,
                                  ts_configs=cfg)
            if em.n:
                yield em.to_arrow()

    cols = ["repo", "path", "content"]
    if join_mode:
        cols += ["ts_project", "ts_project_dir", "ts_includes", "ts_excludes",
                 "ts_paths", "ts_baseurl"]
    return source_df.select(*cols).mapInArrow(run, schema=EXTRACT_SCHEMA)


def _dir_of_path():
    from pyspark.sql import functions as F

    return F.array_join(F.slice(F.split(F.col("path"), "/"), 1,
                                F.size(F.split(F.col("path"), "/")) - 1), "/")


def _ts_project_dim(source_df):
    """(repo, dir, name) per package.json — the same triples the broadcast
    dict holds, as a DataFrame. JSON parse stays executor-side (Catalyst
    ``get_json_object``). A package.json without a ``name`` still anchors a
    project: the analyzer falls back to the project-root directory name
    (analyzer.ts:56-68 readProjectName -> path.basename), repo id at the
    repo root."""
    from pyspark.sql import functions as F

    return (
        source_df
        .filter(F.lower(F.element_at(F.split(F.col("path"), "/"), -1)) == "package.json")
        .select("repo", _dir_of_path().alias("dir"),
                F.get_json_object(F.col("content"), "$.name").alias("pkg_name"))
        .select("repo", "dir",
                F.coalesce(
                    F.col("pkg_name"),
                    F.nullif(F.element_at(F.split(F.col("dir"), "/"), -1), F.lit("")),
                    F.col("repo")).alias("name"))
    )


def _ts_config_dim(source_df):
    """(repo, dir, include-json, exclude-json, paths-json, baseUrl) per
    tsconfig.json sitting at a project root. The reference feeds tsconfig
    into the TS program (analyzer.ts:11-33 parseJsonConfigFileContent):
    file selection comes from ``include``/``exclude``; module resolution
    honors ``compilerOptions.paths`` aliases under ``baseUrl``. The values
    ride as raw JSON strings; the in-UDF code parses them."""
    from pyspark.sql import functions as F

    return (
        source_df
        .filter(F.lower(F.element_at(F.split(F.col("path"), "/"), -1)) == "tsconfig.json")
        .select("repo", _dir_of_path().alias("dir"),
                F.get_json_object(F.col("content"), "$.include").alias("inc"),
                F.get_json_object(F.col("content"), "$.exclude").alias("exc"),
                F.get_json_object(F.col("content"),
                                  "$.compilerOptions.paths").alias("tspaths"),
                F.get_json_object(F.col("content"),
                                  "$.compilerOptions.baseUrl").alias("tsbase"))
    )


def scan_ts_projects(source_df) -> dict | None:
    """Pre-scan: project name per package.json directory; only the
    (repo, dir, name) triples — a bounded dim, no file contents — reach the
    driver, to be re-broadcast into the extraction stage.

    Returns ``None`` when the dim exceeds MAX_DIM_ROWS: callers must then
    resolve project roots Spark-side via ``attach_ts_projects`` (the
    path-prefix join) instead of a driver dict."""
    rows = _ts_project_dim(source_df).limit(MAX_DIM_ROWS + 1).collect()
    if len(rows) > MAX_DIM_ROWS:
        return None
    return {(r["repo"], r["dir"]): r["name"] for r in rows}


def scan_ts_configs(source_df) -> dict | None:
    """{(repo, project_dir): (include_json, exclude_json, paths_json,
    base_url)} for the broadcast path; ``None`` over the cap (join mode
    attaches the columns instead)."""
    rows = _ts_config_dim(source_df).limit(MAX_DIM_ROWS + 1).collect()
    if len(rows) > MAX_DIM_ROWS:
        return None
    return {(r["repo"], r["dir"]): (r["inc"], r["exc"], r["tspaths"],
                                    r["tsbase"]) for r in rows}


def attach_ts_projects(source_df):
    """Large-dim variant of the project-root walk: add ``ts_project`` /
    ``ts_project_dir`` columns resolving each file's governing package.json
    entirely Spark-side. Semantics match the in-UDF ancestor walk
    (TypeScriptHandlerBase.cs:115-129): nearest ancestor directory (longest
    prefix, "" = repo root) that holds a package.json with a name.

    Shape: explode each path's ancestor-dir prefixes (depth-bounded by the
    path itself), shuffle-join on (repo, dir) against the package dim, keep
    the longest match per file with one ``max_by``. No driver collect, no
    broadcast — both sides partition on the join key, so a >2M-package
    corpus never concentrates anywhere."""
    from pyspark.sql import functions as F

    dim = _ts_project_dim(source_df)
    # ancestors of a/b/c.ts -> ["", "a", "a/b"]; slice(parts,1,0) -> [] -> ""
    anc = F.expr(
        "transform(sequence(0, size(split(path,'/'))-1),"
        " i -> array_join(slice(split(path,'/'), 1, i), '/'))")
    cand = (source_df.select("repo", "path")
            .select("repo", "path", F.explode(anc).alias("dir"))
            .join(dim, ["repo", "dir"], "inner"))
    resolved = (cand.groupBy("repo", "path")
                .agg(F.max_by(F.struct(F.col("name").alias("ts_project"),
                                       F.col("dir").alias("ts_project_dir")),
                              F.length("dir")).alias("m"))
                .select("repo", "path", "m.ts_project", "m.ts_project_dir"))
    # tsconfig file-selection arrays ride along, joined on the resolved
    # project root (same keyspace, same partitioning — no broadcast)
    cfg = (_ts_config_dim(source_df)
           .select("repo", F.col("dir").alias("ts_project_dir"),
                   F.col("inc").alias("ts_includes"),
                   F.col("exc").alias("ts_excludes"),
                   F.col("tspaths").alias("ts_paths"),
                   F.col("tsbase").alias("ts_baseurl")))
    resolved = resolved.join(cfg, ["repo", "ts_project_dir"], "left")
    return source_df.join(resolved, ["repo", "path"], "left")


def collect_pkg_meta(pkg_metadata) -> dict | None:
    """Collect the package-metadata dim (nuspec/npm lookups) with a bounded
    row cap; callers broadcast the result via ``extract_records``.

    Returns ``None`` when the dim exceeds MAX_DIM_ROWS: the dim then never
    reaches the driver — callers extract with an empty dict and derive the
    URL records Spark-side via ``pkg_urls_via_join`` (mirroring the
    ``attach_ts_projects`` large-dim fallback)."""
    if pkg_metadata is None:
        return {}
    rows = pkg_metadata.limit(MAX_DIM_ROWS + 1).collect()
    if len(rows) > MAX_DIM_ROWS:
        return None
    return {(r["source"], r["pkg"]): (r["homepage"], r["repository"],
                                      r["project_url"]) for r in rows}


def pkg_dim_over_cap(pkg_metadata) -> bool:
    """Cheap re-detection of the large-dim condition for callers holding a
    PRECOMPUTED extraction output (checkpoint resume, staged bench runs):
    they never called ``collect_pkg_meta``, so they must learn join mode
    without pulling the dim to the driver. A column-pruned limit+count moves
    at most MAX_DIM_ROWS+1 constant rows — no payload columns, no collect of
    the metadata itself."""
    if pkg_metadata is None:
        return False
    from pyspark.sql import functions as F

    return (pkg_metadata.select(F.lit(1).alias("one"))
            .limit(MAX_DIM_ROWS + 1).count()) > MAX_DIM_ROWS


def pkg_urls_via_join(records, pkg_metadata):
    """Large-dim twin of the in-UDF nuspec/npm URL emission
    (``textlike.extract_csproj`` / ``extract_packagejson``, reference
    CsprojHandler.cs:139-201 + PackageJsonHandler.cs:125-228): when the
    package-metadata dim exceeds MAX_DIM_ROWS it never reaches the driver —
    URL records are instead derived by joining the extracted Dependency
    symbol rows against the metadata table on (source, pkg). Both sides
    partition on the join key; no driver collect, no broadcast.

    Emission parity with the dict path:
      * csproj deps (source 'nuspec'): URLs only when the PackageReference
        carried a Version; project_url then repository, both raw.
      * package.json deps (source 'npm'): homepage (trimmed, non-empty)
        raw; repository through the 15-rule normalization — a pandas UDF
        over the join output (dim-sized, not corpus-sized).
    Returns (repo, url_dep_key, url_key, url_name) rows; the caller unions
    them into the url record stream, where the downstream ``.distinct()``
    collapses multi-file duplicates exactly like emitter-path rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from codegraph import keys as K

    deps = (
        records
        .filter((F.col("rec") == "symbol") & (F.col("kind") == "Dependency")
                & F.col("lang").isin("csproj", "packagejson"))
        .select("repo", F.col("key").alias("url_dep_key"),
                F.col("name").alias("pkg_name"), "version",
                F.when(F.col("lang") == "csproj", F.lit("nuspec"))
                .otherwise(F.lit("npm")).alias("pkg_source"))
        .dropDuplicates(["repo", "url_dep_key", "pkg_source", "version"]))
    meta = pkg_metadata.select(F.col("source").alias("pkg_source"),
                               F.col("pkg").alias("pkg_name"),
                               "homepage", "repository", "project_url")
    j = deps.join(meta, ["pkg_source", "pkg_name"], "inner")

    @pandas_udf("string")
    def _norm_repo(urls: pd.Series) -> pd.Series:
        return urls.map(K.normalize_repository_url)

    nuspec = j.filter((F.col("pkg_source") == "nuspec")
                      & F.col("version").isNotNull())
    npm = j.filter(F.col("pkg_source") == "npm")
    parts = [
        nuspec.select("repo", "url_dep_key",
                      F.nullif(F.col("project_url"), F.lit("")).alias("url_name")),
        nuspec.select("repo", "url_dep_key",
                      F.nullif(F.col("repository"), F.lit("")).alias("url_name")),
        npm.select("repo", "url_dep_key",
                   F.nullif(F.trim(F.col("homepage")), F.lit("")).alias("url_name")),
        npm.select("repo", "url_dep_key",
                   F.nullif(_norm_repo("repository"), F.lit("")).alias("url_name")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.filter(F.col("url_name").isNotNull())
            .select("repo", "url_dep_key",
                    F.concat(F.lit("url:"), F.col("url_name")).alias("url_key"),
                    "url_name"))
