"""Extraction dispatch: one vectorized mapInPandas stage over the source table.

Handler selection mirrors SolutionProcessor.HandlerLookup:333-379 — filename
match first (package.json, pubspec.yaml), then case-insensitive extension
match (config.json:1-17). The ``lang`` input column is informational only,
exactly like the reference (it dispatches on path, never on a label).
"""

from __future__ import annotations

import posixpath

import pandas as pd

from codegraph import keys
from codegraph.extract import csharp as cs
from codegraph.extract import textlike as tl
from codegraph.extract import tsdart as td
from codegraph.extract.base import EXTRACT_COLUMNS, Emitter
from codegraph.schema import EXTRACT_SCHEMA, HANDLER_LANG_TECH

_EXT_TO_HANDLER = {
    ".cs": "csharp", ".razor": "razor", ".xaml": "xaml", ".xml": "xml",
    ".json": "json", ".css": "css", ".html": "html", ".csproj": "csproj",
    ".ts": "typescript", ".tsx": "typescript", ".js": "javascript",
    ".dart": "dart",
}


def handler_for_path(path: str) -> str | None:
    fname = posixpath.basename(path).lower()
    if fname == "package.json":
        return "packagejson"
    if fname == "pubspec.yaml":
        return "pubspec"
    ext = posixpath.splitext(fname)[1]
    return _EXT_TO_HANDLER.get(ext)


def _extract_one(repo: str, path: str, content: str, min_acc: int,
                 ts_projects: dict, pkg_meta: dict) -> list[dict]:
    handler = handler_for_path(path)
    file_key = path  # fileKey == solution-relative path (FileService.cs:24-55)
    if handler is None:
        em = Emitter(repo, path, "unknown", "unknown", "unknown")
        em.filemeta(None)
        return em.rows
    language, technology = HANDLER_LANG_TECH[handler]
    em = Emitter(repo, path, handler, language, technology)
    if content is None:
        em.filemeta(None)
        return em.rows
    if handler == "csharp":
        cs.extract_csharp(em, content, repo, file_key, min_acc)
    elif handler == "razor":
        tl.extract_razor(em, content, file_key, min_acc)
    elif handler == "xaml":
        tl.extract_xaml(em, content, file_key, min_acc)
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
        td.extract_ts(em, content, repo, file_key, min_acc, ts_projects)
    elif handler == "dart":
        td.extract_dart(em, content, repo, file_key, min_acc)
    return em.rows


def extract_records(source_df, min_acc: int, ts_projects: dict, pkg_meta: dict):
    """source (repo, path, commit, lang, content) -> unified extraction
    records. ts_projects: {(repo, dir): project_name} from the package.json
    pre-scan (stand-in for FindProjectRoot, TypeScriptHandlerBase.cs:115-129);
    pkg_meta: {(source, pkg): (homepage, repository, project_url)}."""

    def run(batches):
        for pdf in batches:
            rows: list[dict] = []
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                rows.extend(_extract_one(repo, path, content, min_acc,
                                         ts_projects, pkg_meta))
            if rows:
                yield pd.DataFrame(rows, columns=EXTRACT_COLUMNS)

    return source_df.select("repo", "path", "content").mapInPandas(
        run, schema=EXTRACT_SCHEMA)


def scan_ts_projects(source_df) -> dict:
    """Pre-scan: project name per package.json directory. Small dims —
    collected to the driver and broadcast into the extraction stage
    (the reference memoizes per projectRoot, TypeScriptBridgeService.cs:16-19)."""
    import json as jsonlib

    from pyspark.sql import functions as F

    rows = (
        source_df
        .filter(F.lower(F.element_at(F.split(F.col("path"), "/"), -1)) == "package.json")
        .select("repo", "path", "content")
        .collect()
    )
    out = {}
    for r in rows:
        try:
            name = jsonlib.loads(r["content"]).get("name")
        except (ValueError, TypeError):
            name = None
        if name:
            out[(r["repo"], posixpath.dirname(r["path"]))] = name
    return out
