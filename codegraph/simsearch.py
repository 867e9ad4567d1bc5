"""Similarity search over the ``embeddings`` table (array<float> dim-64).

* ``cosine_topk`` — exact brute-force top-k: query-set broadcast against the
  corpus, dot products as Catalyst ``aggregate``/``zip_with`` expressions
  (JVM-side, no Python). This is the correctness baseline and the oracle twin.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing; only
  same-bucket (any of T tables) pairs are scored. At 100 TB the bucket join
  replaces the |Q| x |N| cross product; recall is tested vs brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str, dim: int | None = None):
    """Dot product with the left-folded add order ((0.0 + p0) + p1) + ...
    With ``dim`` known the fold unrolls to plain codegen'd arithmetic —
    bit-identical doubles, an order of magnitude faster than the
    interpreted higher-order aggregate, which stays as the fallback for
    unknown dimensionality."""
    if dim is None:
        return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                           F.lit(0.0), lambda acc, v: acc + v)
    e = F.lit(0.0)
    for d in range(dim):
        e = e + F.get(F.col(a), d) * F.get(F.col(b), d)
    return e


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


# query-side literal cap: above this the query set is no longer a bounded
# dim and the pair generation falls back to the broadcast cross join
MAX_LITERAL_QUERIES = 64


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids.
    cosine = dot(q, v) / sqrt(dot(q, q) * dot(v, v)), rounded to 6 dp BEFORE
    ranking (deterministic cross-engine order); ties break on vec_id.

    The query set is a bounded dim (n_queries rows): below
    MAX_LITERAL_QUERIES it is collected ONCE — its cast vectors and
    Spark-computed squared norms come back as double literals — and every
    corpus row evaluates all |Q| cosines inside one codegen'd projection
    (scan -> project -> explode -> window; no join). The arithmetic is the
    same left-folded (0.0 + q0*v0) + q1*v1 ... chain on the same doubles,
    so the scores are bit-identical to the join form, which remains the
    over-cap fallback (a broadcast nested-loop join whose expressions
    evaluate interpreted — measured ~4x slower per pair)."""
    emb = _as_double(embeddings.select("vec_id", "embedding"), "embedding")
    emb = emb.withColumn("_n2", _dot("embedding", "embedding"))
    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"), F.col("_n2").alias("_qn2")))
    if n_queries <= MAX_LITERAL_QUERIES:
        qrows = q.collect()  # bounded: at most MAX_LITERAL_QUERIES rows
        entries = []
        for r in qrows:
            # query side stays the LEFT zip_with operand, so each product
            # is q_d * v_d exactly as in the join form; unrolling all
            # |Q| x dim terms instead would exceed the codegen method-size
            # limit and fall back to (slower) full interpretation
            qarr = F.array(*[F.lit(v) for v in r["qv"]])
            dot = F.aggregate(
                F.zip_with(qarr, F.col("embedding"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, v: acc + v)
            cos = F.round(
                dot / F.sqrt(F.lit(r["_qn2"]) * F.col("_n2")), 6)
            entries.append(F.struct(
                F.lit(r["query_id"]).alias("query_id"), cos.alias("cosine")))
        if not entries:
            scored = emb.select(
                F.col("vec_id").alias("query_id"), "vec_id",
                F.lit(0.0).alias("cosine")).limit(0)
        else:
            scored = (emb.select(
                "vec_id", F.explode(F.array(*entries)).alias("qc"))
                .select(F.col("qc.query_id").alias("query_id"), "vec_id",
                        F.col("qc.cosine").alias("cosine"))
                .filter(F.col("query_id") != F.col("vec_id")))
    else:
        pairs = q.crossJoin(emb.select(F.col("vec_id"),
                                       F.col("embedding").alias("vv"),
                                       F.col("_n2").alias("_vn2")))
        pairs = pairs.filter(F.col("query_id") != F.col("vec_id"))
        cos = F.round(
            _dot("qv", "vv") / F.sqrt(F.col("_qn2") * F.col("_vn2")), 6)
        scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine"))


def _hyperplanes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded, no RNG state). Each
    coefficient is a pure function of (table, plane, dim) so any prefix of
    planes is stable regardless of how many planes a run asks for."""
    import math

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = math.sin((table * 7919 + p * 131 + d) * 12.9898) * 43758.5453
            row.append(x - math.floor(x) - 0.5)
        planes.append(row)
    return planes


MAX_PLANES = 24
PLANES_FIXTURE = "/root/repo/fixtures/ann_planes.parquet"


def ensure_planes_fixture(path: str = PLANES_FIXTURE, n_tables: int = 8,
                          dim: int = 64) -> str:
    """Materialize the hyperplane coefficients (tbl, p, d, w) once so the
    DuckDB oracle can rebuild the EXACT same signatures: both engines then
    multiply identical float64 coefficients in identical order, making the
    bucket bits bit-reproducible cross-engine."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, MAX_PLANES, t)
        for p, row in enumerate(planes):
            for d, w in enumerate(row):
                rows.append({"tbl": t, "p": p, "d": d, "w": w})
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False), path)
    return path


def n_planes_for(n: int, target_bucket: int = 64) -> int:
    """Scale-aware plane count: expected bucket population stays
    ~target_bucket regardless of corpus size N."""
    import math

    return max(3, min(MAX_PLANES,
                      math.ceil(math.log2(max(2.0, n / target_bucket)))))


def ann_lsh_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                 n_planes: int | None = None, n_tables: int = 8, dim: int = 64,
                 target_bucket: int = 64, multiprobe: int = 1,
                 n_hint: int | None = None) -> DataFrame:
    """Random-hyperplane LSH: signature per (table), candidates = same-bucket
    pairs in ANY table, exact cosine rerank on candidates only.

    Scale-aware bucketing: the plane count grows with the corpus so the
    expected bucket population stays ~``target_bucket`` regardless of N —
    n_planes = log2(N / target_bucket) — which keeps the same-bucket join
    linear in N instead of N^2/2^planes. Recall lost to finer buckets is
    recovered by multiprobe: each query also probes every bucket within
    Hamming distance ``multiprobe`` of its own signature (n_planes extra
    probes per table at distance 1 — cheaper than doubling n_tables)."""
    emb = _as_double(embeddings.select("vec_id", "embedding"), "embedding")
    if n_planes is None:
        # n_hint lets callers supply a cached/estimated corpus size (e.g.
        # parquet row-count metadata or table stats) instead of paying a
        # full count() scan per invocation
        n = n_hint if n_hint is not None else embeddings.count()
        n_planes = n_planes_for(n, target_bucket)

    def bucket_expr(table: int):
        # the plane dots stay in aggregate/zip_with form: unrolling all
        # n_tables x n_planes x dim terms into one projection exceeds the
        # codegen method-size limit and falls back to full interpretation
        # (measured 5x SLOWER than the higher-order fold)
        planes = _hyperplanes(dim, n_planes, table)
        bits = []
        for pi, plane in enumerate(planes):
            arr = F.array(*[F.lit(v) for v in plane])
            dot = F.aggregate(F.zip_with(F.col("embedding"), arr, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, v: acc + v)
            bits.append(F.when(dot >= 0, F.lit(1 << pi)).otherwise(F.lit(0)))
        total = bits[0]
        for b in bits[1:]:
            total = total + b
        return total

    buckets = emb.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("table"), bucket_expr(t).alias("bucket"))
            for t in range(n_tables)])).alias("tb")
    ).select("vec_id", "tb.table", "tb.bucket")

    qb = buckets.filter(F.col("vec_id") < n_queries) \
        .select(F.col("vec_id").alias("query_id"), "table", "bucket")
    if multiprobe >= 1:
        # probe own bucket + all buckets one bit-flip away (Hamming<=1)
        probes = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        qb = qb.select("query_id", "table",
                       F.explode(F.array(*probes)).alias("bucket"))
    cands = (qb.join(buckets, ["table", "bucket"])
             .filter(F.col("query_id") != F.col("vec_id"))
             .select("query_id", "vec_id").distinct())

    q = emb.filter(F.col("vec_id") < n_queries) \
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    v = emb.select("vec_id", F.col("embedding").alias("vv"))
    scored = (cands.join(q, "query_id").join(v, "vec_id")
              .select("query_id", "vec_id",
                      F.round(_dot("qv", "vv", dim) /
                              F.sqrt(_dot("qv", "qv", dim)
                                     * _dot("vv", "vv", dim)), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine"))
