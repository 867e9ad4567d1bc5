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

   Ambiguity is an error, not a guess (Roslyn analogs):
   * a name reachable ONLY through >=2 distinct ``global using`` namespaces
     is CS0104-ambiguous -> the mention drops (no edge);
   * an invocation whose argument tokens are partially unclassified ('?')
     tying >=2 same-arity overloads has no principled winner -> drops
     (Roslyn would bind by conversion rules the lexer cannot see).
   Generic method declarations (``Echo<T>(T)``) are looked up by their bare
   name (Roslyn infers type arguments at the call site) and matched by
   arity — but a generic winner emits NO edge: the reference keys edges off
   the CONSTRUCTED symbol display (``Echo<int>(int)``), which matches no
   declared node, so the edge drops at MergeRelationships. The successful
   bind still suppresses the extension-method fallback.

   Two member-lookup extensions mirror Roslyn's binding order:
   * **access chains, up to MAX_CHAIN_HOPS hops** — ``a.B().C()``,
     ``a.B().C().D().E()``, property hops (``a.Prop.M()``,
     ``this.Prop.M()``), awaited heads (``var r = await a.GetAsync();
     r.M()``), and their var-tracked equivalents (``var x = a.B();
     x.C()``: the local carries B's pending return): extraction emits a
     ``chain`` mention whose ``m_head`` lists the hop signatures. The hop
     dictionaries — ``retsig`` (per method declaration) and ``propsig``
     (per property/field) — pre-resolve their result tokens ONCE at
     dictionary scale against the DECLARING file's candidate namespaces
     (Roslyn resolves a return/property type at its declaration site);
     awaited tokens additionally unwrap ``Task<T>``/``ValueTask<T>`` to
     ``T`` (the awaiter's GetResult type). Resolution then consumes one
     hop per loop iteration as a single ranked dictionary join whose
     winning pre-resolved display becomes the next receiver, binding the
     final member on the outcome. Head-overload ambiguity, a keyword/BCL
     result, an awaited non-Task-shaped return, or a deeper-than-bound
     chain drops (the reference's dangling-edge outcome; Roslyn binds
     arbitrary depth semantically).
   * **extension methods** — receiver-typed calls that found NO applicable
     instance member fall through to an ``extsig`` dictionary of static
     methods keyed by their ``this``-parameter token (matched against the
     receiver type's simple name — class names are unique per repo in the
     fixture subset). Instance members always win, like C# lookup order.

   Shuffle width: every mention is first condensed to a 64-bit
   ``mid = xxhash64(identity columns)``. Candidate explosion, the
   dictionary joins, and the ranked min_by groupBys all move ONLY
   (repo, mid, tok, prio)-shaped rows; the wide identity columns
   (``m_usings``/``m_args``/``path``) never ride a shuffle. Output columns
   are recovered by a final narrow join against a per-mid dim. mids are
   scoped per repo (graph universes are per-repo), so a 64-bit collision
   needs ~2^32 mentions in ONE repo before the birthday bound bites.

2. **Dangling-edge drop (J1/F9)** — candidate edges survive only when BOTH
   endpoint keys exist as Symbol nodes in the same repo universe
   (MergeRelationships.cypher:1-5). This silently drops: all file-keyed
   edges (files are not Symbols), all BCL/keyword-type DEPENDS_ON, all
   TS/Dart edges (kind-token key mismatch) — reference behavior.

Graph universes are per-repo (each reference run targets one --database),
so every join key includes ``repo``.

Skew: hot in-repo names (a 'Util' class referenced by most files) concentrate
dictionary keys. ``salt > 0`` replicates the dictionary side S times and
routes each mention by its compact id, bounding the largest join partition
(explicit skew salting per north_rule); AQE skew-join splitting covers
residual imbalance at runtime.

Join strategy: the dictionary joins and the J1 endpoint semi-joins carry
explicit ``shuffle_hash`` hints — equi-joins on short keys where hashing the
(smaller) dictionary side beats sorting both sides. A hint is plan-time
advice: if the build side's size estimate is too large Spark ignores it, and
a misestimated build side can still OOM at runtime (there is no runtime
fallback to sort-merge), which is why the hint sits on the bounded
dictionary/key side, not the mention side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraph.extract.base import RS, US
from codegraph.extract.csharp import EXTERNAL_TYPE_DISPLAY, KEYWORD_TYPES


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
    # the subset); '.ctor' symbols get a '<ctor>' sentinel. Generic methods
    # display as 'Echo<T>' (SymbolMapper.cs:43-47) but are INVOKED by bare
    # name (Roslyn infers the type arguments), so the lookup key strips the
    # type-parameter list — guarded to `name<` shapes so 'operator <' stays.
    methods = (
        methods
        .withColumn("simple", F.element_at(F.split(F.col("head"), "\\."), -1))
        .withColumn(
            "type_display",
            F.expr("substring(head, 1, length(head) - length(simple) - 1)"),
        )
        # generic methods STAY in the dictionary so they win the ranked
        # lookup (suppressing the extension-method fallback, like Roslyn's
        # successful instance binding) — but the winner emits NO edge:
        # GetSymbolInfo returns the CONSTRUCTED method (Echo<int>(int)) and
        # SymbolMapper.BuildStableSymbolKey displays it without
        # .OriginalDefinition, so the edge key matches no declared node and
        # drops at MergeRelationships (MATCH, not MERGE).
        .withColumn("is_generic", F.col("simple").rlike("^\\w+<"))
        .withColumn("lookup_name",
                    F.when(F.col("name") == ".ctor", F.lit("<ctor>"))
                    .when(F.col("simple").rlike("^\\w+<"),
                          F.expr("substring_index(simple, '<', 1)"))
                    .otherwise(F.col("simple")))
        .select(F.col("repo").alias("mm_repo"), "type_display",
                "lookup_name", "nparams", "params", "is_generic",
                F.col("key").alias("member_key"))
    )
    return types, methods, nss


_MENTION_ID_COLS = ["repo", "path", "m_kind", "m_from_key", "m_rel", "m_name",
                    "m_recv", "m_usings", "m_nargs", "m_args", "m_head"]

# static bound on access-chain depth (a.B().C().D().E() = 3 hops). Each hop
# costs one bounded join round over chain-mention-scale frames, so the
# constant prices linearly; deeper chains than this drop (the reference
# binds arbitrary depth semantically — MemberDependencyExtractor.cs:77-182)
MAX_CHAIN_HOPS = 4

# priority assigned to every global-using candidate namespace: any local
# candidate (posexplode index < 100000) outranks the global pool, and ties
# WITHIN the pool are detected as Roslyn CS0104 ambiguity
_GLOBAL_PRIO = 100000


def _with_mid(mentions: DataFrame) -> DataFrame:
    """Condense the full mention identity into one 64-bit column. Nullable
    columns are coalesced to a \\x00 sentinel so a null can never alias a
    neighboring value (xxhash64 skips nulls)."""
    sent = F.lit("\x00")
    return mentions.withColumn(
        "mid",
        F.xxhash64("repo", "path", "m_kind", "m_from_key", "m_rel", "m_name",
                   F.coalesce(F.col("m_recv"), sent),
                   F.coalesce(F.col("m_usings"), sent),
                   F.coalesce(F.col("m_nargs").cast("string"), sent),
                   F.coalesce(F.col("m_args"), sent),
                   F.coalesce(F.col("m_head"), sent)))


def _resolve_types(cands_base: DataFrame, types: DataFrame,
                   salt: int = 0,
                   global_ns: DataFrame | None = None) -> DataFrame:
    """Resolve ``resolve_tok`` against the ordered candidate-namespace list
    (file namespace, local usings, then the repo's global usings). Keeps the
    first (lowest-priority-index) namespace that declares the name via a
    min_by aggregation (one shuffle with map-side partial agg — cheaper than
    a sort window); unresolved mentions drop (Roslyn error type => no edge),
    and mentions reachable ONLY through >=2 competing global usings drop too
    (CS0104 ambiguity => error type => no edge).

    Input: (repo, mid, resolve_tok, m_usings); the posexplode projects the
    wide m_usings away BEFORE the dictionary join, so the shuffle moves only
    (repo, mid, resolve_tok, prio, cand_ns). Output: (repo, mid,
    resolve_tok, t_key, t_display)."""
    ids = ["repo", "mid", "resolve_tok"]
    cands = cands_base.select(
        *ids, F.posexplode(F.split(F.col("m_usings"), US)).alias("prio", "cand_ns")
    )
    if global_ns is not None:
        # repo-wide global usings: lowest priority. Per-repo counts are tiny
        # but total rows scale with repo count, so no explicit broadcast —
        # AQE broadcasts at runtime while the dim stays small
        gu = (cands_base.select(*ids)
              .join(global_ns, on=[F.col("repo") == F.col("g_repo")])
              .withColumn("prio", F.lit(_GLOBAL_PRIO))
              .drop("g_repo"))
        cands = cands.unionByName(gu.select(*cands.columns))
    t = types
    join_cond = [F.col("repo") == F.col("t_repo"), F.col("cand_ns") == F.col("ns"),
                 F.col("resolve_tok") == F.col("name")]
    if salt > 0:
        t = t.withColumn("d_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        cands = cands.withColumn("m_salt",
                                 F.pmod(F.col("mid"), F.lit(salt)).cast("int"))
        join_cond.append(F.col("m_salt") == F.col("d_salt"))
    joined = cands.join(t.hint("shuffle_hash"), on=join_cond, how="inner") \
        .drop("t_repo", "ns", "name")
    g = (
        joined.groupBy(*ids)
        .agg(F.min("prio").alias("_p0"),
             F.expr("min_by(struct(type_key, type_display), "
                    "struct(prio, type_key))").alias("_r"),
             F.count_distinct(
                 F.when(F.col("prio") >= _GLOBAL_PRIO, F.col("type_key")))
             .alias("_nglob"))
    )
    return (
        g.filter((F.col("_p0") < _GLOBAL_PRIO) | (F.col("_nglob") <= 1))
        .select(*ids,
                F.col("_r.type_key").alias("t_key"),
                F.col("_r.type_display").alias("t_display"))
    )


def _as_edge(df: DataFrame, dst_col: str) -> DataFrame:
    return df.select("repo", F.col("m_from_key").alias("src_key"),
                     F.col("m_rel").alias("rel_type"),
                     F.col(dst_col).alias("dst_key"))


def resolve_mentions(records: DataFrame, symbols: DataFrame,
                     salt: int = 0, persist: bool = False) -> DataFrame:
    """mention records -> resolved candidate edges (repo, src_key, rel_type,
    dst_key). Duplicate mentions collapse inside the ranked groupBys — MERGE
    semantics make edge multiplicity irrelevant (§1.4.4).

    ``persist`` caches the frames that feed MULTIPLE downstream branches
    (``resolved_full`` feeds 4: type edges, member lookup, chain heads,
    extension fallback; ``bases`` 3; ``dim``/``ranked`` 2 each) — without it
    Spark re-executes the whole pass-1 explode+join+min_by subtree once per
    branch inside the single edge job (measured 2.3x on the full pipeline).
    Every cached frame is either dictionary-scale or a NARROW per-mid
    projection (64-bit mid + short strings), so the cache footprint stays
    a small fraction of the corpus at any scale; MEMORY_AND_DISK spills
    rather than OOMs on a misestimate. Caller owns cleanup via
    ``spark.catalog.clearCache()`` (the frames stay referenced lazily).

    Shuffle budget (the whole resolution is TWO ranked lookups over COMPACT
    64-bit mention ids):
    1. ONE type-resolution pass — every mention kind that names a type
       explodes its candidate token(s) (conversions try operand AND target,
       the two places C# allows the declaration) x candidate namespaces,
       joins the type dictionary once, min_by(priority).
    2. ONE member-lookup pass — ctor/invoke/operator/conversion mentions
       explode their acceptable lookup names (1-2 each), join the member
       dictionary once, and rank: declared-param-token equality (0), arity
       or no-arg-list (1), else drop — the Roslyn overload-resolution-failure
       analog. Cast syntax prefers explicit over implicit via lookup order.
       Unknown-arg ('?') rank ties among same-arity overloads drop
       (ambiguity => no edge).
    Output columns (m_from_key, m_rel) are recovered afterwards by one
    narrow join per pass against the deduped per-mid dim, so neither ranked
    shuffle ever carries the wide identity columns.
    """
    def _p(df: DataFrame) -> DataFrame:
        # UNCONDITIONAL persist (the ``persist`` flag is ignored here, by
        # design): every wrapped frame feeds >=2 downstream branches or a
        # loop iteration whose lineage nests the previous ones, so without
        # a cache boundary BOTH the executed work and the Catalyst plan
        # grow multiplicatively (persist substitutes InMemoryRelation at
        # analysis time, truncating the plan — optimizer time alone
        # dominated tiny-fixture runs before this). Every frame is either
        # dictionary-scale or a NARROW per-mid projection, MEMORY_AND_DISK
        # spills rather than OOMs, and the caller releases via
        # spark.catalog.clearCache().
        return df.persist()

    types, members, nss = build_dictionaries(symbols)
    mentions = _p(_with_mid(
        records.filter(F.col("rec") == "mention").select(*_MENTION_ID_COLS)))

    # narrow per-mid dim: ONLY the columns downstream passes need — the wide
    # m_usings / path columns are excluded, so this dedup shuffle and the
    # recovery joins stay compact. Side-channel records (retsig/extsig/
    # global_using) never resolve, so they stay out of the dim too.
    dim = (mentions.filter(~F.col("m_kind").isin("retsig", "extsig", "propsig",
                                                 "basesig", "global_using",
                                                 "optsig"))
           .select("repo", "mid", "m_kind", "m_from_key", "m_rel",
                   "m_name", "m_recv", "m_nargs", "m_args", "m_head")
           .dropDuplicates(["repo", "mid"]))
    dim = _p(dim)

    # repo-wide global-using namespace pool (RoslynSymbolProcessor.cs:68-99)
    global_ns = (mentions.filter(F.col("m_kind") == "global_using")
                 .select(F.col("repo").alias("g_repo"),
                         F.col("m_name").alias("cand_ns"))
                 .distinct())
    global_ns = _p(global_ns)

    kind = F.col("m_kind")
    kw = F.array(*[F.lit(k) for k in sorted(KEYWORD_TYPES)])

    # --- pass 1: type resolution ------------------------------------------
    toks = (F.when(kind.isin("type", "ctor"), F.array("m_name"))
            .when(kind.isin("invoke_via", "invoke_static", "op", "chain_via"),
                  F.array("m_recv"))
            .otherwise(F.array_distinct(F.array("m_recv", "m_name"))))  # conv_*
    needs_type = (
        mentions.filter(kind.isin("type", "ctor", "invoke_via", "invoke_static",
                                  "op", "conv_impl", "conv_expl", "chain_via"))
        .select("repo", "mid", "m_usings", F.explode(toks).alias("resolve_tok"))
        .filter(F.col("resolve_tok").isNotNull() & (F.col("resolve_tok") != "")
                & ~F.array_contains(kw, F.col("resolve_tok"))
                & ~F.col("resolve_tok").startswith("System.")))
    resolved_t = _resolve_types(needs_type, types, salt, global_ns)
    # recover the narrow output/ranking columns once per resolved mention
    resolved_full = _p(resolved_t.join(dim, ["repo", "mid"]))

    type_edges = _as_edge(resolved_full.filter(kind == "type"), "t_key")

    # --- inherited members: resolve declared base lists (basesig records)
    #     and pre-expand the member dictionary so EVERY lookup path (plain
    #     invocation, chain tail, extension-fallback trigger) sees base
    #     members at a deeper rank — Roslyn binds the call to the BASE's
    #     declaring symbol, and an own member hides a base member ------------
    base_sig = mentions.filter(F.col("m_kind") == "basesig")
    resolved_bases = _resolve_types(
        base_sig.select("repo", "mid",
                        F.col("m_name").alias("resolve_tok"), "m_usings"),
        types, salt, global_ns)
    bdim = (base_sig.select("repo", "mid",
                            F.col("m_recv").alias("derived_display"))
            .dropDuplicates(["repo", "mid"]))
    bases = (resolved_bases.join(bdim, ["repo", "mid"])
             .select(F.col("repo").alias("b_repo"), "derived_display",
                     F.col("t_display").alias("base_display"))
             .distinct())
    bases = _p(bases)

    def _inherit(mbrs: DataFrame, depth: int) -> DataFrame:
        return (mbrs.join(bases,
                          on=[mbrs.mm_repo == bases.b_repo,
                              mbrs.type_display == bases.base_display])
                .filter(F.col("lookup_name") != "<ctor>")  # ctors don't inherit
                .select("mm_repo",
                        F.col("derived_display").alias("type_display"),
                        "lookup_name", "nparams", "params", "is_generic",
                        "member_key")
                .withColumn("depth", F.lit(depth)))

    own_members = members.withColumn("depth", F.lit(0))
    lvl1 = _inherit(members, 1)
    lvl2 = _inherit(lvl1.drop("depth"), 2)  # grandparent, bounds the subset
    members = own_members.unionByName(lvl1).unionByName(lvl2)

    # optional-parameter signatures (optsig records): a method with default
    # values accepts call sites from min_nparams to nparams arguments
    # (Roslyn fills the defaults; CSharpErrorMessageFormat displays types
    # only, so the symbol table alone cannot see optionality). Keyed by the
    # member key — unique per member, preserved through the inherit
    # expansion — and built from the RAW records with a narrow projection
    # (no mid hashing, no wide identity columns), joined ONCE after the
    # union so the plan evaluates the optsig scan a single time.
    opts = (records.filter((F.col("rec") == "mention")
                           & (F.col("m_kind") == "optsig"))
            .select(F.col("m_from_key").alias("o_key"),
                    F.col("m_nargs").alias("min_nparams"))
            .distinct())
    members = _p(members.join(
        opts, on=[members.member_key == opts.o_key], how="left").drop("o_key"))

    # --- pass 2: member lookup ----------------------------------------------
    # own-type invocations (incl. method groups) skip type resolution: m_recv
    # already holds the containing type display
    mem_cols = ["repo", "mid", "m_kind", "m_name", "m_nargs", "m_args",
                "t_display"]
    own = (dim.filter(kind == "invoke")
           .withColumn("t_display", F.col("m_recv"))
           .select(*mem_cols))
    # base.M(): substitute the caller's own display with its declared base
    # (Roslyn base-access binds in the base type's scope); no base -> drop
    own_base = (dim.filter(kind == "invoke_base")
                .join(bases, on=[F.col("repo") == F.col("b_repo"),
                                 F.col("m_recv") == F.col("derived_display")])
                .withColumn("t_display", F.col("base_display"))
                .select(*mem_cols))
    member_mentions = resolved_full.filter(
        kind.isin("ctor", "invoke_via", "invoke_static", "op",
                  "conv_impl", "conv_expl")).select(*mem_cols) \
        .unionByName(own).unionByName(own_base)
    impl_name = F.concat(F.lit("implicit operator "), F.col("m_name"))
    expl_name = F.concat(F.lit("explicit operator "), F.col("m_name"))
    lookups = (F.when(kind == "ctor", F.array(F.lit("<ctor>")))
               .when(kind == "conv_impl", F.array(impl_name))
               .when(kind == "conv_expl", F.array(expl_name, impl_name))
               .otherwise(F.array("m_name")))
    norm_args = F.when(F.col("m_args").isNull(), F.lit(None)) \
        .otherwise(F.array_join(F.split(F.col("m_args"), US), ", "))

    # --- chained calls: bind each LATER member through the preceding
    #     call's return token (retsig dictionary), one hop per loop
    #     iteration, then ride the shared member-lookup join below. m_head
    #     carries the hop signatures RS-separated: one hop for a.B().C()
    #     and `var x = a.B(); x.C()`, two for a.B().C().D() ----------------
    # The result tokens resolve ONCE here, at DICTIONARY scale, against the
    # DECLARING file's candidate namespaces (the retsig/propsig records
    # carry them): Roslyn resolves a method's return type and a property's
    # declared type at the declaration site, not per call site. Tokens that
    # are keywords, BCL/external names, generic shapes (List<T>), or
    # CS0104-ambiguous never resolve -> null display -> any chain stepping
    # through them drops (the reference's dangling-edge outcome). Awaited
    # hops need the Task<T>/ValueTask<T>-unwrapped token (Roslyn: the
    # await-expression's type is the awaiter's GetResult type), so both
    # forms resolve side by side and the hop picks one by its await flag.
    rets_raw = (mentions.filter(F.col("m_kind") == "retsig")
                .select(F.col("repo"),
                        F.col("m_recv").alias("rt_display"),
                        F.col("m_name").alias("r_name"),
                        F.col("m_nargs").alias("r_nparams"),
                        F.when(F.col("m_args").isNull(), F.lit(""))
                        .otherwise(F.array_join(F.split(F.col("m_args"), US),
                                                ", "))
                        .alias("r_params"),
                        F.col("m_head").alias("r_ret"),
                        F.col("m_usings"))
                .distinct()
                .withColumn("r_prop", F.lit(False)))
    # property/field type dictionary: a property hop (`a.Prop.M()`) steps
    # through the member's declared type token instead of a call return.
    # Same bounded dictionary scale as retsig; r_nparams = -1 sentinel keeps
    # the shared rank expression exact-matching prop hops only.
    nargs_t = dict(mentions.dtypes)["m_nargs"]
    props_raw = (mentions.filter(F.col("m_kind") == "propsig")
                 .select(F.col("repo"),
                         F.col("m_recv").alias("rt_display"),
                         F.col("m_name").alias("r_name"),
                         F.lit(-1).cast(nargs_t).alias("r_nparams"),
                         F.lit("").alias("r_params"),
                         F.col("m_head").alias("r_ret"),
                         F.col("m_usings"))
                 .distinct()
                 .withColumn("r_prop", F.lit(True)))
    rets_raw = rets_raw.unionByName(props_raw).withColumn(
        "mid", F.xxhash64("repo", "rt_display", "r_name", "r_nparams",
                          "r_params", "r_ret", "r_prop"))
    unwrap_tok = F.regexp_extract(
        F.col("r_ret"),
        r"^(?:System\.Threading\.Tasks\.)?(?:Task|ValueTask)<(.+)>$", 1)
    ret_toks = (rets_raw.select(
        "repo", "mid", "m_usings",
        F.explode(F.array(
            F.struct(F.lit(False).alias("aw"), F.col("r_ret").alias("tok")),
            F.struct(F.lit(True).alias("aw"), unwrap_tok.alias("tok"))))
        .alias("t"))
        .select("repo", "mid", "m_usings", F.col("t.aw").alias("aw"),
                F.col("t.tok").alias("resolve_tok"))
        .filter((F.col("resolve_tok") != "")
                & ~F.array_contains(kw, F.col("resolve_tok"))
                & ~F.col("resolve_tok").startswith("System.")
                & ~F.col("resolve_tok").isin(*EXTERNAL_TYPE_DISPLAY.keys())))
    rdisp = (_resolve_types(ret_toks.drop("aw"), types, salt, global_ns)
             .join(ret_toks.select("repo", "mid", "resolve_tok", "aw"),
                   ["repo", "mid", "resolve_tok"])
             .groupBy("repo", "mid")
             .agg(F.max(F.when(~F.col("aw"), F.col("t_display")))
                  .alias("ret_display"),
                  F.max(F.when(F.col("aw"), F.col("t_display")))
                  .alias("await_display")))
    rets = _p(rets_raw.join(rdisp, ["repo", "mid"], "left")
              .select(F.col("repo").alias("rr_repo"), "rt_display", "r_name",
                      "r_nparams", "r_params", "r_prop", "r_ret",
                      "ret_display", "await_display"))
    chain_cols = ["repo", "mid", "m_head", "t_display"]
    ch_via = resolved_full.filter(kind == "chain_via").select(*chain_cols)
    ch_own = (dim.filter(kind == "chain_own")
              .withColumn("t_display", F.col("m_recv"))
              .select(*chain_cols))
    # hop loop: each iteration consumes ONE head signature — a single ranked
    # lookup in the pre-resolved retsig dictionary on the current receiver
    # type (overload ambiguity, a keyword/BCL result, or an awaited
    # non-Task-shaped return drops the chain, the reference's dangling-edge
    # outcome); the winning hop's pre-resolved display becomes the next
    # receiver directly — no per-hop type resolution. Chains whose hop list
    # is exhausted exit to the member-lookup join; MAX_CHAIN_HOPS static
    # iterations bound the depth (a deeper m_head leaves `pending` non-empty
    # after the loop and drops — the reference binds arbitrary depth,
    # MemberDependencyExtractor.cs:77-182, so raise the constant to widen).
    # All frames here are dictionary/chain-mention-scale: each hop adds ONE
    # bounded join round, not a corpus-wide shuffle.
    pending = (ch_via.unionByName(ch_own)
               .select("repo", "mid", "t_display",
                       F.split(F.col("m_head"), RS).alias("hops")))
    done = None
    for _hop in range(MAX_CHAIN_HOPS):
        hp = F.split(F.element_at(F.col("hops"), 1), US)
        raw_name = hp.getItem(0)
        is_prop = hp.getItem(1) == F.lit("P")
        cur = pending.select(
            "repo", "mid", "t_display",
            F.regexp_replace(raw_name, "^@", "").alias("h_name"),
            raw_name.startswith("@").alias("h_await"),
            is_prop.alias("h_prop"),
            F.when(is_prop, F.lit(-1))
            .otherwise(hp.getItem(1).cast("int")).alias("h_nargs"),
            F.array_join(
                F.slice(hp, F.lit(3), F.greatest(F.size(hp) - 2, F.lit(0))),
                ", ").alias("h_args"))
        hj = cur.join(
            rets,
            on=[F.col("repo") == F.col("rr_repo"),
                F.col("t_display") == F.col("rt_display"),
                F.col("h_name") == F.col("r_name"),
                F.col("h_prop") == F.col("r_prop")],
            how="inner")
        hrank = (F.when(~F.col("h_args").contains("?")
                        & (F.col("r_params") == F.col("h_args")), F.lit(0))
                 .when(F.col("r_nparams") == F.col("h_nargs"), F.lit(1))
                 .otherwise(F.lit(99)))
        hj = hj.withColumn("_hr", hrank).filter(F.col("_hr") < 99)
        hranked = (
            hj.groupBy("repo", "mid")
            .agg(F.min("_hr").alias("_h0"),
                 F.expr("min_by(struct(r_params, r_ret, ret_display, "
                        "await_display), struct(_hr, r_params))")
                 .alias("_minr"),
                 F.expr("max_by(struct(r_params, r_ret), struct(-_hr, r_params))")
                 .alias("_maxr"),
                 F.max(F.col("h_args").contains("?")).alias("_hunk"),
                 F.first("h_await").alias("h_await")))
        # head overload ambiguity mirrors the member pass: an arity-rank tie
        # with unclassified args (differing in params or raw return) is a
        # Roslyn error -> the whole chain drops. The ambiguity compare uses
        # the RAW token columns, not the resolved displays, so two
        # unresolvable-but-different overload returns still count as a tie.
        h_ok = (hranked
                .filter(~(F.col("_hunk") & (F.col("_h0") >= 1)
                          & ((F.col("_minr.r_params") != F.col("_maxr.r_params"))
                             | (F.col("_minr.r_ret") != F.col("_maxr.r_ret")))))
                .select("repo", "mid",
                        F.when(F.col("h_await"), F.col("_minr.await_display"))
                        .otherwise(F.col("_minr.ret_display"))
                        .alias("t_display"))
                .filter(F.col("t_display").isNotNull()))
        stepped = _p(h_ok.join(pending.select(
            "repo", "mid",
            F.expr("slice(hops, 2, greatest(size(hops) - 1, 0))")
            .alias("hops")), ["repo", "mid"]))
        fin = (stepped.filter(F.size("hops") == 0)
               .select("repo", "mid", "t_display"))
        done = fin if done is None else done.unionByName(fin)
        pending = stepped.filter(F.size("hops") > 0)
    chain_cand = (done
                  .join(dim.select("repo", "mid", "m_name", "m_nargs", "m_args"),
                        ["repo", "mid"])
                  .select("repo", "mid", "m_nargs",
                          norm_args.alias("norm_args"), "t_display",
                          F.lit(0).alias("lrank"),
                          F.col("m_name").alias("lookup")))

    # using-static imports: a bare call with no own member looks through the
    # file's `using static T;` types — the directive names the FULLY
    # QUALIFIED type, so the import display joins the member dictionary
    # directly (no namespace resolution); lrank = import order breaks the
    # (out-of-subset) two-import tie deterministically. INHERITED members
    # outrank the imports entirely: C# simple-name lookup stops at the
    # first enclosing-type-or-base scope that declares the NAME (even when
    # no overload there is applicable — that's an error, not a fallback),
    # so mentions whose own type inherits a member of that name drop here
    # (the extraction already excluded OWN members; m_recv carries the own
    # display for this check). The anti-join side is the depth>=1 slice of
    # the bounded member dictionary.
    inherited_names = (members.filter(F.col("depth") >= 1)
                       .select("mm_repo", "type_display", "lookup_name")
                       .distinct())
    us_cand = (dim.filter(kind == "invoke_ustatic")
               .join(inherited_names,
                     on=[F.col("repo") == F.col("mm_repo"),
                         F.col("m_recv") == F.col("type_display"),
                         F.col("m_name") == F.col("lookup_name")],
                     how="left_anti")
               .select("repo", "mid", "m_nargs",
                       norm_args.alias("norm_args"),
                       F.posexplode(F.split(F.col("m_head"), US))
                       .alias("lrank", "t_display"),
                       F.col("m_name").alias("lookup")))

    cand = member_mentions.select(
        "repo", "mid", "m_nargs", norm_args.alias("norm_args"), "t_display",
        F.posexplode(lookups).alias("lrank", "lookup")) \
        .unionByName(chain_cand).unionByName(us_cand)
    joined = cand.join(
        members.hint("shuffle_hash"),
        on=[F.col("repo") == F.col("mm_repo"),
            F.col("t_display") == F.col("type_display"),
            F.col("lookup") == F.col("lookup_name")],
        how="inner")
    rank = (
        F.when(F.col("norm_args").isNotNull() & ~F.col("norm_args").contains("?")
               & (F.col("params") == F.col("norm_args")), F.lit(0))
        .when(F.col("m_nargs").isNull(), F.lit(1))
        .when(F.col("nparams") == F.col("m_nargs"), F.lit(1))
        # default-parameter fill: fewer args than declared params, but at
        # least the required minimum — loses to any exact-arity candidate
        # (Roslyn prefers candidates needing no optional fill)
        .when((F.col("m_nargs") >= F.col("min_nparams"))
              & (F.col("m_nargs") < F.col("nparams")), F.lit(2))
        .otherwise(F.lit(99)))
    # implicit-numeric-widening tie-break inside arity rank: Roslyn's
    # betterness rules prefer the NEAREST target on the widening chain
    # int -> long -> double (C# 7.4.6.2: long beats double for an int
    # argument because long -> double converts implicitly and not back).
    # Per zipped (arg, param) pair: 0 exact, 1/2 = chain distance, null =
    # outside the chain (user types with conversion operators, strings,
    # '?' unknowns — the lexer cannot rank those, so they keep the old
    # neutral tie behavior via the WPEN_NEUTRAL penalty and, for '?', the
    # ambiguity drop below).
    wdist = F.expr(
        "CASE WHEN m_nargs IS NULL OR norm_args IS NULL OR nparams != m_nargs"
        " THEN NULL ELSE aggregate("
        "  zip_with(split(norm_args, ', '), split(params, ', '),"
        "    (a, p) -> CASE WHEN a = p THEN 0"
        "                   WHEN a = 'int' AND p = 'long' THEN 1"
        "                   WHEN a = 'int' AND p = 'double' THEN 2"
        "                   WHEN a = 'long' AND p = 'double' THEN 1"
        "                   ELSE NULL END),"
        "  0, (acc, x) -> acc + x) END")  # null pair -> null sum (outside)
    WPEN_NEUTRAL = 9
    wpen = F.coalesce(wdist, F.lit(WPEN_NEUTRAL))
    # rank folds (overload-rank, widening distance, inheritance depth,
    # lookup order): an own member at arity rank still beats a base member
    # at param-exact rank? No — Roslyn checks applicability per declaring
    # scope from the most derived type outward, but hiding only kicks in
    # for the SAME signature shape; the fold below prefers better overload
    # rank first, then the nearer widening target, then the shallower
    # declaration, matching the subset's hiding shapes
    joined = joined.withColumn(
        "_rank", rank * 1000 + wpen * 50 + F.col("depth") * 10
        + F.col("lrank")) \
        .filter(F.col("_rank") < 99000)
    ranked = (
        joined.groupBy("repo", "mid")
        .agg(F.min("_rank").alias("_r0"),
             F.expr("min_by(member_key, struct(_rank, member_key))")
             .alias("member_key"),
             F.expr("min_by(is_generic, struct(_rank, member_key))")
             .alias("_isgen"),
             # largest member_key AT the minimal rank: differs from
             # member_key iff the winning rank is tied between >=2 members
             F.expr("max_by(member_key, struct(-_rank, member_key))")
             .alias("_maxk"),
             F.max(F.coalesce(F.col("norm_args").contains("?"), F.lit(False)))
             .alias("_unk"))
    )
    ranked = _p(ranked)
    # arity-rank (rank 1 -> _rank 1000..1480) ties with unclassified args have
    # no principled winner: Roslyn would bind via conversions the lexer
    # cannot see, or report ambiguity — either way, guessing is wrong => no
    # edge. Cross-depth candidates are NOT ties (the depth term separates
    # them: the shallower declaration hides the base one). Method groups
    # (m_args null) keep the deterministic min-key pick.
    ambiguous = (F.col("_unk") & (F.col("_r0") >= 1000)
                 & (F.col("member_key") != F.col("_maxk")))
    # generic-method winners bind but emit NO edge: the reference keys the
    # edge off the CONSTRUCTED symbol's display (Echo<string>(string) /
    # Echo<int>(int) — SymbolMapper.BuildStableSymbolKey has no
    # .OriginalDefinition), which matches no declared node and drops at
    # MergeRelationships (MATCH, not MERGE). The win still counts for
    # lookup: it keeps the call out of the extension-method fallback below,
    # exactly like Roslyn's successful instance binding.
    member_edges = _as_edge(
        ranked.filter(~ambiguous).filter(~F.col("_isgen"))
        .select("repo", "mid", "member_key")
        .join(dim.select("repo", "mid", "m_from_key", "m_rel"),
              ["repo", "mid"]),
        "member_key")

    # --- extension-method fallback: receiver-typed calls that found NO
    #     instance member on the resolved type bind to a static method whose
    #     `this` parameter targets the receiver (Roslyn considers extensions
    #     only when no applicable instance method exists). Subset convention:
    #     the declared receiver token is the receiver type's simple name
    #     (class names are unique per repo in the fixture corpus). -----------
    exts = (mentions.filter(F.col("m_kind") == "extsig")
            .select(F.col("repo").alias("e_repo"),
                    F.col("m_recv").alias("e_recv"),
                    F.col("m_name").alias("e_name"),
                    F.col("m_nargs").alias("e_nargs"),
                    F.when(F.col("m_args").isNull(), F.lit(""))
                    .otherwise(F.array_join(F.split(F.col("m_args"), US), ", "))
                    .alias("e_params"),
                    F.col("m_head").alias("e_display"))
            .distinct())
    ext_base = (resolved_full.filter(kind == "invoke_via")
                .join(ranked.select("repo", "mid"), ["repo", "mid"],
                      "left_anti")
                .select("repo", "mid", "m_name", "m_nargs",
                        norm_args.alias("norm_args"),
                        F.element_at(F.split(F.col("t_display"), "\\."), -1)
                        .alias("t_simple")))
    ej = ext_base.join(
        exts,
        on=[F.col("repo") == F.col("e_repo"),
            F.col("m_name") == F.col("e_name"),
            F.col("t_simple") == F.col("e_recv")],
        how="inner")
    erank = (F.when(F.col("norm_args").isNotNull()
                    & ~F.col("norm_args").contains("?")
                    & (F.col("e_params") == F.col("norm_args")), F.lit(0))
             .when(F.col("m_nargs").isNull(), F.lit(1))
             .when(F.col("e_nargs") == F.col("m_nargs"), F.lit(1))
             .otherwise(F.lit(99)))
    ej = ej.withColumn("_er", erank).filter(F.col("_er") < 99)
    eranked = (
        ej.groupBy("repo", "mid")
        .agg(F.min("_er").alias("_e0"),
             F.expr("min_by(e_display, struct(_er, e_display))")
             .alias("e_display"),
             F.expr("max_by(e_display, struct(-_er, e_display))")
             .alias("_emax"),
             F.max(F.coalesce(F.col("norm_args").contains("?"), F.lit(False)))
             .alias("_eunk")))
    e_amb = (F.col("_eunk") & (F.col("_e0") >= 1)
             & (F.col("e_display") != F.col("_emax")))
    ext_edges = _as_edge(
        eranked.filter(~e_amb)
        .select("repo", "mid",
                F.concat(F.col("repo"), F.lit(":"), F.col("e_display"))
                .alias("member_key"))
        .join(dim.select("repo", "mid", "m_from_key", "m_rel"),
              ["repo", "mid"]),
        "member_key")

    # --- using-directive mentions: external namespaces dangle; in-repo
    #     namespaces are same-assembly => no edge (RoslynSymbolProcessor.cs:47-65)
    um = dim.filter(kind == "using")
    ext_using = (
        um.join(nss, on=[um.repo == nss.n_repo, um.m_name == nss.ns], how="left_anti")
        .select("repo", F.col("m_from_key").alias("src_key"),
                F.col("m_rel").alias("rel_type"),
                F.concat(F.col("repo"), F.lit(":"), F.col("m_name")).alias("dst_key"))
    )

    return (type_edges.unionByName(member_edges).unionByName(ext_edges)
            .unionByName(ext_using))


def link_edges(candidate_edges: DataFrame, symbols: DataFrame) -> DataFrame:
    """J1/F9: keep edges whose BOTH endpoints exist as Symbol nodes in the
    same repo (MergeRelationships.cypher:1-5); output distinct triples
    (apoc.merge.relationship is idempotent)."""
    sk = symbols.select("repo", F.col("key").alias("_k")).distinct()
    return (
        candidate_edges
        .join(sk.withColumnRenamed("_k", "src_key").hint("shuffle_hash"),
              ["repo", "src_key"], "left_semi")
        .join(sk.withColumnRenamed("_k", "dst_key").hint("shuffle_hash"),
              ["repo", "dst_key"], "left_semi")
        .select("repo", "src_key", "rel_type", "dst_key")
        .distinct()
    )
