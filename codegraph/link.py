"""Entity linking: mention resolution + dangling-edge drop.

Two distributed stages, all expressed as DataFrame joins so Catalyst picks
broadcast vs shuffle strategies (AQE skew-join enabled in session.py):

1. **Mention resolution** — the replica's stand-in for Roslyn semantic
   binding. C# extraction emits unresolved type/invocation mentions with an
   ordered candidate-namespace list (own namespace first, then usings, then
   the repo-wide ``global using`` pool — the compilation-level lookup of
   RoslynSymbolProcessor.cs:68-99). They are resolved against the per-repo
   symbol dictionary; the first matching namespace wins; unresolvable
   mentions are Roslyn error types -> no edge
   (MemberDependencyExtractor.cs:241,255,282).

   Member lookup is overload-aware: candidates on the resolved type are
   ranked by (0) declared-parameter-token equality against the mention's
   classified argument tokens, then (1) arity equality; mentions matching
   neither drop (Roslyn overload resolution failure => no edge). Method
   groups carry no argument list and match by name. User-defined operator
   mentions (``operator +``) resolve on the operand type; conversion
   mentions (``implicit operator int``) search BOTH the operand and target
   types, the two places C# allows the declaration.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraph.extract.base import US
from codegraph.extract.csharp import KEYWORD_TYPES


def build_dictionaries(symbols: DataFrame):
    """FQN dictionaries from deduped C# symbols.

    types:   (repo, ns, name, type_key, type_display)
    members: (repo, type_display, lookup_name, nparams, params, member_key)
             lookup_name is the display segment before '(' — plain name,
             '<ctor>' sentinel, 'operator +', 'implicit operator int', ...
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
    # head = "Ns.Type.name"; lookup_name = last dot segment (also 'operator +'
    # and 'implicit operator int' — conversion return tokens are non-dotted in
    # the subset); '.ctor' symbols get a '<ctor>' sentinel
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
                "lookup_name", "nparams", "params",
                F.col("key").alias("member_key"))
    )
    return types, methods, nss


_MENTION_ID_COLS = ["repo", "path", "m_kind", "m_from_key", "m_rel", "m_name",
                    "m_recv", "m_usings", "m_nargs", "m_args"]


def _resolve_types(mentions: DataFrame, types: DataFrame, name_col: str,
                   salt: int = 0, global_ns: DataFrame | None = None,
                   extra_ids: list[str] | None = None) -> DataFrame:
    """Resolve ``name_col`` against the ordered candidate-namespace list
    (file namespace, local usings, then the repo's global usings). Keeps the
    first (lowest-priority-index) namespace that declares the name via a
    min_by aggregation (one shuffle with map-side partial agg — cheaper than
    a sort window); unresolved mentions drop (Roslyn error type => no edge).
    Adds columns t_key / t_display."""
    ids = _MENTION_ID_COLS + (extra_ids or [])
    cands = mentions.select(
        "*", F.posexplode(F.split(F.col("m_usings"), US)).alias("prio", "cand_ns")
    )
    if global_ns is not None:
        # repo-wide global usings: lowest priority, broadcast (small dim)
        gu = mentions.join(
            F.broadcast(global_ns), on=[F.col("repo") == F.col("g_repo")]) \
            .withColumn("prio", (F.lit(100000)
                                 + F.pmod(F.crc32(F.col("cand_ns")), F.lit(1000)))
                        .cast("int")) \
            .drop("g_repo")
        cands = cands.unionByName(gu.select(*cands.columns))
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
        joined.groupBy(*ids)
        .agg(F.expr("min_by(struct(type_key, type_display), prio)").alias("_r"))
        .select(*ids,
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
    edge multiplicity irrelevant (§1.4.4).

    Shuffle budget (the whole resolution is TWO ranked lookups):
    1. ONE type-resolution pass — every mention kind that names a type
       explodes its candidate token(s) (conversions try operand AND target,
       the two places C# allows the declaration) x candidate namespaces,
       joins the type dictionary once, min_by(priority).
    2. ONE member-lookup pass — ctor/invoke/operator/conversion mentions
       explode their acceptable lookup names (1-2 each), join the member
       dictionary once, and rank: declared-param-token equality (0), arity
       or no-arg-list (1), else drop — the Roslyn overload-resolution-failure
       analog. Cast syntax prefers explicit over implicit via lookup order.
    """
    types, members, nss = build_dictionaries(symbols)
    # NO up-front distinct: the mention set is read 3x (global pool, type
    # pass, member pass) and a distinct would shuffle the full width each
    # time; the ranked min_by groupBys and the final edge distinct already
    # collapse duplicates
    mentions = records.filter(F.col("rec") == "mention").select(*_MENTION_ID_COLS)

    # repo-wide global-using namespace pool (RoslynSymbolProcessor.cs:68-99)
    global_ns = (mentions.filter(F.col("m_kind") == "global_using")
                 .select(F.col("repo").alias("g_repo"),
                         F.col("m_name").alias("cand_ns"))
                 .distinct())

    kind = F.col("m_kind")
    kw = F.array(*[F.lit(k) for k in sorted(KEYWORD_TYPES)])

    # --- pass 1: type resolution ------------------------------------------
    toks = (F.when(kind.isin("type", "ctor"), F.array("m_name"))
            .when(kind.isin("invoke_via", "invoke_static", "op"), F.array("m_recv"))
            .otherwise(F.array_distinct(F.array("m_recv", "m_name"))))  # conv_*
    needs_type = (
        mentions.filter(kind.isin("type", "ctor", "invoke_via", "invoke_static",
                                  "op", "conv_impl", "conv_expl"))
        .select("*", F.explode(toks).alias("resolve_tok"))
        .filter(F.col("resolve_tok").isNotNull() & (F.col("resolve_tok") != "")
                & ~F.array_contains(kw, F.col("resolve_tok"))
                & ~F.col("resolve_tok").startswith("System.")))
    resolved_t = _resolve_types(needs_type, types, "resolve_tok", salt, global_ns,
                                extra_ids=["resolve_tok"])

    type_edges = _as_edge(resolved_t.filter(kind == "type"), "t_key")

    # --- pass 2: member lookup ----------------------------------------------
    # own-type invocations (incl. method groups) skip type resolution: m_recv
    # already holds the containing type display
    own = (mentions.filter(kind == "invoke")
           .withColumn("t_display", F.col("m_recv"))
           .withColumn("resolve_tok", F.lit(None).cast("string")))
    member_mentions = resolved_t.filter(
        kind.isin("ctor", "invoke_via", "invoke_static", "op",
                  "conv_impl", "conv_expl")).drop("t_key") \
        .unionByName(own)
    impl_name = F.concat(F.lit("implicit operator "), F.col("m_name"))
    expl_name = F.concat(F.lit("explicit operator "), F.col("m_name"))
    lookups = (F.when(kind == "ctor", F.array(F.lit("<ctor>")))
               .when(kind == "conv_impl", F.array(impl_name))
               .when(kind == "conv_expl", F.array(expl_name, impl_name))
               .otherwise(F.array("m_name")))
    cand = member_mentions.select(
        "*", F.posexplode(lookups).alias("lrank", "lookup"))
    joined = cand.join(
        members,
        on=[F.col("repo") == F.col("mm_repo"),
            F.col("t_display") == F.col("type_display"),
            F.col("lookup") == F.col("lookup_name")],
        how="inner")
    norm_args = F.when(F.col("m_args").isNull(), F.lit(None)) \
        .otherwise(F.array_join(F.split(F.col("m_args"), US), ", "))
    rank = (
        F.when(norm_args.isNotNull() & ~norm_args.contains("?")
               & (F.col("params") == norm_args), F.lit(0))
        .when(F.col("m_nargs").isNull(), F.lit(1))
        .when(F.col("nparams") == F.col("m_nargs"), F.lit(1))
        .otherwise(F.lit(99)))
    joined = joined.withColumn("_rank", rank * 10 + F.col("lrank")) \
        .filter(F.col("_rank") < 990)
    member_edges = _as_edge(
        joined.groupBy(*_MENTION_ID_COLS)
        .agg(F.expr("min_by(member_key, struct(_rank, member_key))")
             .alias("member_key")),
        "member_key")

    # --- using-directive mentions: external namespaces dangle; in-repo
    #     namespaces are same-assembly => no edge (RoslynSymbolProcessor.cs:47-65)
    um = mentions.filter(kind == "using")
    ext_using = (
        um.join(nss, on=[um.repo == nss.n_repo, um.m_name == nss.ns], how="left_anti")
        .select("repo", F.col("m_from_key").alias("src_key"),
                F.col("m_rel").alias("rel_type"),
                F.concat(F.col("repo"), F.lit(":"), F.col("m_name")).alias("dst_key"))
    )

    return type_edges.unionByName(member_edges).unionByName(ext_using)


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
