"""Training-data pipeline operators over the ``documents`` table.

Every operator is expressed with JVM-side ``pyspark.sql.functions`` (no
Python UDFs in the hot path) and has a DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` built from the SAME primitive formulas, so the
driver's hash compare is a real cross-engine check:

* tokenization: ``lower(text)`` split on ``[^a-z0-9]+``
* portable token hash: left-fold ``(acc*131 + ascii(char)) % 2147483647``
  (31-bit polynomial rolling hash — overflow-safe in both engines)
* shingles: word 3-grams joined by a single space

Scale notes (100 TB): everything below is a scan + groupBy/join with
map-side partial aggregation; the near-dup pipeline is LSH-banded so the
candidate join is |bands| x |buckets| instead of |docs|^2; exact verification
touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"
HASH_MOD = 2147483647
HASH_BASE = 131

EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"]
ES_STOP = ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"]


def tokens_col(text_col: str = "text"):
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda t: t != "")


def _token_hash_sql(tok_expr: str) -> str:
    """31-bit polynomial rolling hash as a SQL expression (portable to
    DuckDB's list_reduce with the identical formula). Empty-string array
    elements are filtered: Spark's split-by-empty and DuckDB's string_split
    differ on boundary empties."""
    return (f"aggregate(filter(split({tok_expr}, ''), c -> c != ''), 0L, "
            f"(acc, c) -> (acc * {HASH_BASE} + ascii(c)) % {HASH_MOD})")


# ---------------------------------------------------------------------------
# exact dedup: hash-groupBy on the full text (first dedup stage at scale —
# cheapest shuffle, run before any near-dup machinery)
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    # one sha pass feeds both the group counts and the join probe side
    # (Catalyst re-executes shared subtrees per reference otherwise)
    h = F.sha2(F.col("text"), 256).alias("text_sha")
    with_h = _once(docs.select("doc_id", h))
    counts = with_h.groupBy("text_sha").agg(
        F.count("*").alias("dup_count"), F.min("doc_id").alias("canonical_id"))
    return (with_h.join(counts, "text_sha")
            .select("doc_id", "text_sha", "dup_count", "canonical_id"))


# ---------------------------------------------------------------------------
# word-3-gram shingles + exact jaccard pairs (oracle-checkable ground truth)
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    toks = tokens_col().alias("toks")
    d = docs.select("doc_id", toks)
    sh = F.when(
        F.size("toks") >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(sh).alias("shingle"))


def _once(df: DataFrame) -> DataFrame:
    """Materialize a frame consumed by several plan branches exactly once
    per invocation (lazy localCheckpoint: computed inside the first action,
    shared by every reference, re-computed on every fresh call — nothing
    persists across bench/oracle invocations). Without it Catalyst
    re-executes the shingle scan+explode once per referencing subtree
    (sizes, both inverted-index sides, the signature pass)."""
    return df.localCheckpoint(eager=False)


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram jaccard >= threshold via an inverted shingle index —
    pairs sharing at least one shingle (never the full cross join), then
    |A∩B| / (|A|+|B|-|A∩B|)."""
    sh = _once(shingles(docs))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                  .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("sz", "sz_b"), "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup: banded prefilter -> exact verify (the scale path:
# the exact-verify join runs only on LSH candidates, so the result EQUALS the
# brute-force answer while the shuffle is banded-bucket-sized)
#
# Banding is b bands x r rows: a pair collides in a band only when ALL r
# minhashes of that band agree, so P(candidate) = 1 - (1 - s^r)^b. With the
# default b=16, r=4 the S-curve threshold is (1/b)^(1/r) = 0.5: pairs at
# s >= 0.8 are caught with P >= 0.9998 while background similarity s <= 0.3
# generates < 12% of pairs as candidates (s <= 0.2: < 3%) — the candidate
# join stays bucket-sized instead of degenerating toward |docs|^2 the way a
# r=1 banding does (r=1: P(candidate at s=0.2) = 1-(1-s)^16 = 0.97).
# ---------------------------------------------------------------------------


def lsh_candidates(docs: DataFrame, bands: int = 16,
                   rows_per_band: int = 4) -> DataFrame:
    return _lsh_candidates_from(shingles(docs), bands, rows_per_band)


def _lsh_candidates_from(sh: DataFrame, bands: int = 16,
                         rows_per_band: int = 4) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from a (doc_id, shingle)
    frame. Each band's bucket is the hash of its r-tuple of minhashes; only
    same-(band, bucket) pairs join."""
    k = bands * rows_per_band
    h = F.expr(_token_hash_sql("shingle")).alias("h0")
    sh_h = sh.select("doc_id", h)
    # k permutation hashes: h_i = (a_i*h0 + b_i) mod p (universal family)
    perms = [(2 * i + 1, 7919 * (i + 1)) for i in range(k)]
    minhash_cols = [
        F.min((F.col("h0") * a + b) % HASH_MOD).alias(f"mh{i}")
        for i, (a, b) in enumerate(perms)
    ]
    sig = sh_h.groupBy("doc_id").agg(*minhash_cols)
    bands_df = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(*[F.col(f"mh{band * rows_per_band + r}")
                             for r in range(rows_per_band)]).alias("bucket"))
            for band in range(bands)
        ])).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    # ONE shingle pass feeds the signature build, the per-doc sizes, and
    # both inverted-index sides of the exact verify (was four full
    # scan+explode passes re-executed by Catalyst)
    sh = _once(shingles(docs))
    candidates = _lsh_candidates_from(sh, bands, rows_per_band)
    exact = _jaccard_pairs_for_sh(sh, candidates)
    return exact.filter(F.col("jaccard") >= threshold)


def jaccard_pairs_for(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    return _jaccard_pairs_for_sh(_once(shingles(docs)), candidates)


def _jaccard_pairs_for_sh(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact jaccard restricted to candidate pairs."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed("doc_id", "id_a")
    b = sh.withColumnRenamed("doc_id", "id_b")
    inter = (candidates.join(a, "id_a").join(b, ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                  .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("sz", "sz_b"), "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup: deterministic hashed bag-of-words vectors
# (dim buckets, token-hash % dim, count weights) compared by cosine via an
# INVERTED-INDEX join — pairs meet only on shared buckets, never the full
# cross join, so the shuffle is |buckets| x bucket-population instead of
# |docs|^2 (cosine > 0 requires >=1 shared bucket, so the result is exact).
# All arithmetic stays integer until one final division: dot products and
# squared norms of count vectors are exact ints, so the DuckDB twin computes
# bit-identical values (cosine^2 = dot^2 / (|a|^2 |b|^2)).
# ---------------------------------------------------------------------------


def doc_vectors(docs: DataFrame, dim: int = 256) -> DataFrame:
    """(doc_id, bucket, cnt): hashed bag-of-words count vector, sparse."""
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    h = F.expr(_token_hash_sql("tok")) % dim
    return (toks.select("doc_id", h.alias("bucket"))
            .groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt")))


def cosine_lsh_candidates(vectors: DataFrame, bands: int = 42,
                          rows_per_band: int = 12) -> DataFrame:
    """Sign-LSH (random-hyperplane) candidate pairs over sparse count
    vectors (doc_id, bucket, cnt). Plane p's sign for dimension ``bucket``
    is a deterministic ±1 from xxhash64(bucket, p); signature bit p =
    sign(Σ cnt·±1). Two docs at cosine s agree on a bit with
    P = 1 - arccos(s)/π, so banding b x r gives the OR-of-ANDs S-curve
    P(candidate) = 1 - (1 - p^r)^b. The defaults target the 0.95-cosine
    dedup regime: p(0.95) ≈ 0.899 -> miss ≈ 1e-6 per true pair, while
    background pairs at cosine ≤ 0.3 (p ≤ 0.60) surface < 10% as
    candidates — the candidate join stays bucket-sized instead of
    degenerating toward |docs|^2 the way the shared-bucket inverted index
    does when every doc shares hot hashed-BoW buckets.

    The k = b·r projections are computed as ONE Catalyst transform over the
    collected sparse vector (no k-way row explosion): per doc the work is
    nnz x k hash evaluations inside whole-stage codegen, linear-scan
    parallel — the 100 TB shape."""
    k = bands * rows_per_band
    # sign(bucket, p) = pmod(xxhash64(bucket, p), 2)*2 - 1, precomputed once
    # per DISTINCT dimension bucket (|dim| rows, broadcast) instead of
    # nnz x k interpreted xxhash evaluations per document; the per-doc fold
    # then only multiplies counts against the precomputed sign rows. Sign
    # inputs/types are identical, and the integer sums are order-invariant,
    # so the signatures are bit-identical to the per-entry evaluation.
    signs = (vectors.select("bucket").distinct()
             .withColumn("signs", F.transform(
                 F.sequence(F.lit(0), F.lit(k - 1)),
                 lambda p: F.pmod(F.xxhash64(F.col("bucket"), p),
                                  F.lit(2)) * 2 - 1)))
    # k sum-aggregate columns (one per projection) instead of a per-doc
    # interpreted fold over collected entries: the multiply-adds run inside
    # codegen'd HashAggregate update expressions, and the integer sums are
    # order-invariant, so the signature bits are unchanged
    vec = (vectors.join(F.broadcast(signs), "bucket")
           .groupBy("doc_id")
           .agg(*[F.sum(F.col("cnt") * F.get("signs", p)).alias(f"_pr{p}")
                  for p in range(k)]))
    bits = F.concat_ws("", F.array(*[
        F.when(F.col(f"_pr{p}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(k)]))
    sig = vec.select("doc_id", bits.alias("bits"))
    bands_df = (sig.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.col("bits").substr(
                    b * rows_per_band + 1, F.lit(rows_per_band))).alias("bucket"))
        )).alias("bb"))
        .select("doc_id", "bb.band", "bb.bucket"))
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())


def _cosine_sq_pairs(dots: DataFrame, sqn: DataFrame,
                     threshold: float) -> DataFrame:
    out = (dots
           .join(sqn.withColumnRenamed("doc_id", "id_a")
                 .withColumnRenamed("sq", "sq_a"), "id_a")
           .join(sqn.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("sq", "sq_b"), "id_b")
           .withColumn("cosine_sq", F.round(
               (F.col("dot") * F.col("dot")).cast("double")
               / (F.col("sq_a") * F.col("sq_b")), 6)))
    # threshold applied on the ROUNDED value with a round literal so the
    # DuckDB twin's constant compares identically (no float-literal drift)
    return (out.filter(F.col("cosine_sq") >= round(threshold * threshold, 6))
            .select("id_a", "id_b", "cosine_sq"))


def embedding_cosine_dedup(docs: DataFrame, dim: int = 256,
                           threshold: float = 0.95,
                           prefilter: bool = True,
                           bands: int = 42,
                           rows_per_band: int = 12) -> DataFrame:
    """Near-duplicate pairs by cosine of hashed-BoW embeddings:
    cosine^2(a, b) >= threshold^2, computed exactly in integers.

    ``prefilter=True`` (the scale path) generates candidates with sign-LSH
    over the same vectors and exact-verifies ONLY candidates, so the dot
    join is candidate-sized; the default banding makes a true pair at
    cosine >= 0.95 survive with P ≈ 1 - 1e-6 (the fixture-scale recall test
    asserts exact equality with the ``prefilter=False`` path, which the
    DuckDB oracle mirrors). ``prefilter=False`` is the exact inverted-index
    baseline: pairs meet on shared buckets — exact, but every hot bucket
    pairs its whole population, which degenerates at scale when background
    similarity keeps hot buckets populated."""
    # one tokenize+hash+count pass feeds the norms, the LSH signatures, and
    # both dot-product sides (was four re-executed vector builds)
    v = _once(doc_vectors(docs, dim))
    sqn = v.groupBy("doc_id").agg(F.sum(F.col("cnt") * F.col("cnt")).alias("sq"))
    if prefilter:
        cand = cosine_lsh_candidates(v, bands, rows_per_band)
        a = v.select(F.col("doc_id").alias("id_a"), "bucket",
                     F.col("cnt").alias("cnt_a"))
        b = v.select(F.col("doc_id").alias("id_b"), "bucket",
                     F.col("cnt").alias("cnt_b"))
        dots = (cand.join(a, "id_a").join(b, ["id_b", "bucket"])
                .groupBy("id_a", "id_b")
                .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot")))
    else:
        a = v.alias("a")
        b = v.alias("b")
        dots = (a.join(b, "bucket")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .groupBy(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot")))
    return _cosine_sq_pairs(dots, sqn, threshold)


# ---------------------------------------------------------------------------
# SimHash (31-bit, portable hash) — exact cross-engine parity
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 31) -> DataFrame:
    # one aggregation with ``bits`` vote columns instead of exploding every
    # token row ``bits`` ways (same integer votes — sum order irrelevant —
    # but the shuffle moves 31 longs per doc, not 31 rows per token, and
    # the two-level groupBy collapses to one)
    toks = (docs.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok"))
            .withColumn("h", F.expr(_token_hash_sql("tok"))))
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.expr(f"(shiftright(h, {b}) % 2) * 2 - 1")).alias(f"v{b}")
        for b in range(bits)])
    bitsum = F.expr(" + ".join(
        f"CASE WHEN v{b} >= 0 THEN shiftleft(1L, {b}) ELSE 0L END"
        for b in range(bits)))
    return votes.select("doc_id", bitsum.alias("simhash"))


# ---------------------------------------------------------------------------
# language ID (stopword-hit heuristic), quality score, token counts,
# fingerprint — all pure Catalyst expressions
# ---------------------------------------------------------------------------


def _stop_count(lst):
    arr = F.array(*[F.lit(w) for w in lst])
    return F.size(F.filter(tokens_col(), lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame) -> DataFrame:
    d = (docs.select(
        "doc_id",
        _stop_count(EN_STOP).alias("en_hits"),
        _stop_count(DE_STOP).alias("de_hits"),
        _stop_count(FR_STOP).alias("fr_hits"),
        _stop_count(ES_STOP).alias("es_hits")))
    best = F.greatest("en_hits", "de_hits", "fr_hits", "es_hits")
    pred = (F.when(best == 0, F.lit("unknown"))
            .when(F.col("en_hits") == best, F.lit("en"))
            .when(F.col("de_hits") == best, F.lit("de"))
            .when(F.col("fr_hits") == best, F.lit("fr"))
            .otherwise(F.lit("es")))
    return d.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame) -> DataFrame:
    toks = tokens_col()
    n_chars = F.length("text")
    n_words = F.size(toks)
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    stop = _stop_count(EN_STOP)
    mean_len = F.round(
        F.when(n_words > 0,
               F.aggregate(toks, F.lit(0).cast("long"),
                           lambda acc, t: acc + F.length(t)).cast("double") / n_words)
        .otherwise(F.lit(0.0)), 4)
    score = F.round(
        F.when(n_words > 0, F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.5
               + (stop.cast("double") / n_words) * 0.3
               + F.when(punct / n_chars < 0.1, 0.2).otherwise(0.0))
        .otherwise(0.0), 4)
    return docs.select(
        "doc_id", n_chars.alias("n_chars"), n_words.alias("n_words"),
        punct.alias("n_punct"), stop.alias("en_stopwords"),
        mean_len.alias("mean_word_len"), score.alias("quality"))


def token_counts(docs: DataFrame) -> DataFrame:
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe_ish = F.expr(
        "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]', 0))")
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe_ish.alias("bpe_tokens"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: sha256 of the whitespace-normalized lowercase
    text (stable content identity across formatting)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.sha2(norm, 256).alias("fingerprint"))
