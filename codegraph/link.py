"""Entity linking: mention resolution + dangling-edge drop.

Two distributed stages, all expressed as DataFrame joins so Catalyst picks
broadcast vs shuffle strategies (AQE skew-join enabled in session.py):

1. **Mention resolution** — the replica's stand-in for Roslyn semantic
   binding. C# extraction emits unresolved type/invocation mentions with an
   ordered candidate-namespace list (own namespace first, then usings, the
   C# lookup order). They are resolved against the per-repo symbol
   dictionary; the first matching namespace wins; unresolvable mentions are
   Roslyn error types -> no edge (MemberDependencyExtractor.cs:241,255,282).

2. **Dangling-edge drop (J1/F9)** — candidate edges survive only when BOTH
   endpoint keys exist as Symbol nodes in the same repo universe
   (MergeRelationships.cypher:1-5). This silently drops: all file-keyed
   edges (files are not Symbols), all BCL/keyword-type DEPENDS_ON, all
   TS/Dart edges (kind-token key mismatch) — reference behavior.

Graph universes are per-repo (each reference run targets one --database),
so every join key includes ``repo``.

Skew: hot in-repo names (a 'Util' class referenced by most files) concentrate
dictionary keys. ``salt > 0`` replicates the dictionary side S times and
routes each mention by a deterministic hash of its file path, bounding the
largest join partition (explicit skew salting per north_rule); AQE skew-join
splitting covers residual imbalance at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codegraph.extract.base import US


def build_dictionaries(symbols: DataFrame):
    """FQN dictionaries from deduped C# symbols.

    types:   (repo, ns, name, type_key, type_display)
    members: (repo, type_display, lookup_name, nparams, member_key)
    nss:     (repo, ns) — namespaces declared in-repo (same-assembly check,
             MemberDependencyExtractor.cs:53-75)
    """
    cs = symbols.filter(F.col("language") == "csharp")
    types = (
        cs.filter(F.col("kind") == "NamedType")
        .select(
            F.col("repo").alias("t_repo"),
            F.coalesce(F.col("namespace"), F.lit("")).alias("ns"),
            F.col("name"),
            F.col("key").alias("type_key"),
            F.expr("substring(fqn, 9)").alias("type_display"),  # strip 'global::'
        )
    )
    nss = types.select(F.col("t_repo").alias("n_repo"), "ns").distinct()
    methods = (
        cs.filter(F.col("kind") == "Method")
        .select(
            "repo", "key",
            F.expr("substring(fqn, 9)").alias("display"),
            F.col("name"),
        )
        .withColumn("head", F.expr("substring_index(display, '(', 1)"))
        .withColumn("params", F.regexp_extract("display", r"\((.*)\)$", 1))
        .withColumn("nparams", F.when(F.col("params") == "", F.lit(0))
                    .otherwise(F.size(F.split(F.col("params"), ","))))
    )
    # head = "Ns.Type.name"; lookup_name = last dot segment; '.ctor' symbols
    # get a '<ctor>' sentinel (their display segment is the type name)
    methods = (
        methods
        .withColumn("simple", F.element_at(F.split(F.col("head"), "\\."), -1))
        .withColumn(
            "type_display",
            F.expr("substring(head, 1, length(head) - length(simple) - 1)"),
        )
        .withColumn("lookup_name",
                    F.when(F.col("name") == ".ctor", F.lit("<ctor>"))
                    .otherwise(F.col("simple")))
        .select(F.col("repo").alias("mm_repo"), "type_display",
                "lookup_name", "nparams", F.col("key").alias("member_key"))
    )
    return types, methods, nss


_MENTION_ID_COLS = ["repo", "path", "m_kind", "m_from_key", "m_rel", "m_name",
                    "m_recv", "m_usings", "m_nargs", "m_args"]


def _resolve_types(mentions: DataFrame, types: DataFrame, name_col: str,
                   salt: int = 0) -> DataFrame:
    """Resolve ``name_col`` against the ordered candidate-namespace list.
    Keeps the first (lowest-priority-index) namespace that declares the name
    via a min_by aggregation (one shuffle with map-side partial agg — cheaper
    than a sort window); unresolved mentions drop (Roslyn error type => no
    edge). Adds columns t_key / t_display."""
    cands = mentions.select(
        "*", F.posexplode(F.split(F.col("m_usings"), US)).alias("prio", "cand_ns")
    )
    t = types
    join_cond = [F.col("repo") == F.col("t_repo"), F.col("cand_ns") == F.col("ns"),
                 F.col(name_col) == F.col("name")]
    if salt > 0:
        t = t.withColumn("d_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        cands = cands.withColumn("m_salt",
                                 F.pmod(F.xxhash64("path"), F.lit(salt)).cast("int"))
        join_cond.append(F.col("m_salt") == F.col("d_salt"))
    joined = cands.join(t, on=join_cond, how="inner") \
        .drop("t_repo", "ns", "name")
    return (
        joined.groupBy(*_MENTION_ID_COLS)
        .agg(F.expr("min_by(struct(type_key, type_display), prio)").alias("_r"))
        .select(*_MENTION_ID_COLS,
                F.col("_r.type_key").alias("t_key"),
                F.col("_r.type_display").alias("t_display"))
    )


def _as_edge(df: DataFrame, dst_col: str) -> DataFrame:
    return df.select("repo", F.col("m_from_key").alias("src_key"),
                     F.col("m_rel").alias("rel_type"),
                     F.col(dst_col).alias("dst_key"))


def resolve_mentions(records: DataFrame, symbols: DataFrame,
                     salt: int = 0) -> DataFrame:
    """mention records -> resolved candidate edges (repo, src_key, rel_type,
    dst_key). Duplicate mentions are collapsed first — MERGE semantics make
    edge multiplicity irrelevant (§1.4.4)."""
    types, members, nss = build_dictionaries(symbols)
    mentions = (
        records.filter(F.col("rec") == "mention")
        .select(*_MENTION_ID_COLS)
        .distinct()
    )

    # --- ONE type-resolution pass for every mention kind that names a type:
    #     type/ctor mentions resolve m_name, via/static resolve the receiver
    #     token. One explode + one dictionary join + one min_by instead of
    #     three parallel pipelines.
    needs_type = mentions.filter(
        F.col("m_kind").isin("type", "ctor", "invoke_via", "invoke_static"))
    needs_type = needs_type.withColumn(
        "resolve_tok",
        F.when(F.col("m_kind").isin("type", "ctor"), F.col("m_name"))
        .otherwise(F.col("m_recv")))
    resolved_t = _resolve_types(needs_type, types, "resolve_tok", salt)

    type_edges = _as_edge(resolved_t.filter(F.col("m_kind") == "type"), "t_key")

    # ctor: join the declared ctor by arg count (no-overload subset)
    ctors = members.filter(F.col("lookup_name") == "<ctor>")
    ctor_edges = _as_edge(
        resolved_t.filter(F.col("m_kind") == "ctor")
        .join(ctors, on=[F.col("repo") == F.col("mm_repo"),
                         F.col("t_display") == F.col("type_display"),
                         F.col("m_nargs") == F.col("nparams")], how="inner"),
        "member_key")

    # field/static-receiver invocations: member lookup on the resolved type
    via_edges = _as_edge(
        resolved_t.filter(F.col("m_kind").isin("invoke_via", "invoke_static"))
        .join(members, on=[F.col("repo") == F.col("mm_repo"),
                           F.col("t_display") == F.col("type_display"),
                           F.col("m_name") == F.col("lookup_name")], how="inner"),
        "member_key")

    # --- own-type invocations: m_recv already holds the type display --------
    im = mentions.filter(F.col("m_kind") == "invoke")
    own_edges = _as_edge(
        im.join(members, on=[F.col("repo") == F.col("mm_repo"),
                             F.col("m_recv") == F.col("type_display"),
                             F.col("m_name") == F.col("lookup_name")], how="inner"),
        "member_key")

    # --- using-directive mentions: external namespaces dangle; in-repo
    #     namespaces are same-assembly => no edge (RoslynSymbolProcessor.cs:47-65)
    um = mentions.filter(F.col("m_kind") == "using")
    ext_using = (
        um.join(nss, on=[um.repo == nss.n_repo, um.m_name == nss.ns], how="left_anti")
        .select("repo", F.col("m_from_key").alias("src_key"),
                F.col("m_rel").alias("rel_type"),
                F.concat(F.col("repo"), F.lit(":"), F.col("m_name")).alias("dst_key"))
    )

    return (type_edges.unionByName(ctor_edges).unionByName(own_edges)
            .unionByName(via_edges).unionByName(ext_using))


def link_edges(candidate_edges: DataFrame, symbols: DataFrame) -> DataFrame:
    """J1/F9: keep edges whose BOTH endpoints exist as Symbol nodes in the
    same repo (MergeRelationships.cypher:1-5); output distinct triples
    (apoc.merge.relationship is idempotent)."""
    sk = symbols.select("repo", F.col("key").alias("_k")).distinct()
    return (
        candidate_edges
        .join(sk.withColumnRenamed("_k", "src_key"), ["repo", "src_key"], "left_semi")
        .join(sk.withColumnRenamed("_k", "dst_key"), ["repo", "dst_key"], "left_semi")
        .select("repo", "src_key", "rel_type", "dst_key")
        .distinct()
    )
