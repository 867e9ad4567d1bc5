"""Git/commit subgraph: per-file metadata aggregation + commit ingestion.

Replaces the reference's repo-wide ``git log`` prefetch + per-file dictionary
probe (GitService.cs:17-94,221-255, GitLogParser.cs:65-114) with groupBy
aggregations over the ``commit_log`` side table, joined onto files (J9) with
NO explicit broadcast — per-file stats scale with the corpus, so the
broadcast-vs-shuffle decision is left to AQE's runtime size estimate
(pipeline.py:319-326) — the Spark shape of "prefetch once, probe per file".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraph import schema as S


def explode_changes(commit_log: DataFrame) -> DataFrame:
    return (
        commit_log.select(
            "repo", "hash", "author_name", "author_email", "date", "refs",
            F.explode("changed_files").alias("cf"))
        .select("repo", "hash", "author_name", "author_email", "date", "refs",
                F.col("cf.path").alias("path"),
                F.col("cf.is_deleted").alias("is_deleted"))
    )


def file_git_stats(commit_log: DataFrame) -> DataFrame:
    """Per-file: created/lastModified/commits/tags + per-author stats array
    (GitLogParser.cs:65-114 fold -> A1 groupBy aggregation)."""
    ch = explode_changes(commit_log)
    per_author = (
        ch.groupBy("repo", "path", "author_name")
        .agg(F.min("date").alias("first_commit"),
             F.max("date").alias("last_commit"),
             F.count("*").alias("commit_count"))
    )
    authors = (
        per_author.groupBy("repo", "path")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("author_name").alias("name"),
            "first_commit", "last_commit", "commit_count"))).alias("authors"))
    )
    tags = (
        ch.select("repo", "path", F.explode("refs").alias("ref"))
        .filter(F.lower(F.col("ref")).startswith("tag:"))
        .select("repo", "path", F.trim(F.expr("substring(ref, 5)")).alias("tag"))
        .groupBy("repo", "path")
        .agg(F.sort_array(F.collect_set("tag")).alias("tags"))
    )
    base = (
        ch.groupBy("repo", "path")
        .agg(F.min("date").alias("created"),
             F.max("date").alias("last_modified"),
             F.sort_array(F.collect_set("hash")).alias("commits"))
    )
    return (base.join(authors, ["repo", "path"], "left")
            .join(tags, ["repo", "path"], "left")
            .withColumn("tags", F.coalesce("tags", F.array())))


def authored_edges(files: DataFrame, stats: DataFrame) -> DataFrame:
    """file -> author src__AUTHORED with first/last/count props
    (UpsertFile.cypher:25-36). Only files present in the files table."""
    j = files.select("repo", F.col("key").alias("file_key"), "path") \
        .join(stats.select("repo", "path", "authors"), ["repo", "path"], "inner")
    return (
        j.select("repo", "file_key", F.explode("authors").alias("a"))
        .select("repo",
                F.col("file_key").alias("src_key"),
                F.lit(S.R_AUTHORED).alias("rel_type"),
                F.col("a.name").alias("dst_key"),
                F.col("a.first_commit").alias("first_commit"),
                F.col("a.last_commit").alias("last_commit"),
                F.col("a.commit_count").alias("commit_count"))
    )


def commit_nodes_and_edges(commit_log: DataFrame):
    """UpsertCommit.cypher:1-20 — commit nodes, PART_OF_PROJECT, COMMITTED
    (author -> commit), MODIFIED_FILE (commit -> file key) + file stubs
    created for changed paths (deleted flag)."""
    commits = (
        commit_log.select(
            "repo", F.col("hash").alias("key"),
            F.col("date"), F.col("message"),
            F.col("author_name"), F.col("author_email"))
    )
    part_of = commits.select(
        "repo", F.col("key").alias("src_key"),
        F.lit(S.R_PART_OF_PROJECT).alias("rel_type"),
        F.col("repo").alias("dst_key"))
    committed = commits.select(
        "repo", F.col("author_name").alias("src_key"),
        F.lit(S.R_COMMITTED).alias("rel_type"),
        F.col("key").alias("dst_key"))
    ch = explode_changes(commit_log)
    modified = ch.select(
        "repo", F.col("hash").alias("src_key"),
        F.lit(S.R_MODIFIED_FILE).alias("rel_type"),
        F.col("path").alias("dst_key"))  # file key == relative path
    # file stubs for changed paths (created if absent, UpsertCommit.cypher:17-19).
    # Reference sets f.deleted per commit in processing order (nondeterministic
    # under parallel pages); the replica's deterministic winner is the latest
    # commit touching the file.
    file_stubs = (
        ch.groupBy("repo", "path")
        .agg(F.expr("max_by(is_deleted, date)").alias("deleted"),
             F.max("date").alias("last_date"))
    )
    return commits, part_of, committed, modified, file_stubs
