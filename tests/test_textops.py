"""Training-data operators: dedup family, text analysis."""

import hashlib

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_sha(spark, docs):
    from codegraph.textops import exact_dedup

    out = exact_dedup(docs).toPandas()
    src = docs.select("doc_id", "text").toPandas().set_index("doc_id")["text"]
    assert len(out) == len(src)
    for _, r in out.head(20).iterrows():
        assert r["text_sha"] == hashlib.sha256(
            src[r["doc_id"]].encode()).hexdigest()
    assert (out["dup_count"] >= 1).all()


def test_minhash_equals_bruteforce(spark, docs):
    # LSH prefilter + exact verify == brute-force exact jaccard
    from codegraph.textops import jaccard_pairs, minhash_lsh_pairs

    exact = jaccard_pairs(docs, threshold=0.5).toPandas()
    lsh = minhash_lsh_pairs(docs, threshold=0.5, bands=16).toPandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values.tolist()))
    assert key(exact) == key(lsh)


def test_lsh_candidate_bound_under_background_similarity(spark):
    """b x r banding must NOT degenerate toward the all-pairs join on a
    corpus with moderate background similarity (s ~ 0.2-0.4): with r=4 rows
    per band, P(candidate) = 1-(1-s^4)^16 < 12% at s=0.3, while the r=1
    banding of round 1 admitted ~97% of pairs at s=0.2."""
    import itertools
    from random import Random

    from codegraph.textops import jaccard_pairs, lsh_candidates, minhash_lsh_pairs

    rng = Random(7)
    pool = [f"word{i:03d}" for i in range(60)]
    rows = []
    # 80 docs drawing ~40 words from a shared pool -> pairwise shingle
    # overlap concentrates around s ~ 0.2-0.4
    for d in range(80):
        words = [pool[rng.randrange(len(pool))] for _ in range(40)]
        rows.append((d, " ".join(words)))
    # plant 3 true near-dup pairs (s >= 0.9): copy with one word changed
    for j, d in enumerate(range(100, 103)):
        base = rows[j][1].split()
        base[5] = "changed"
        rows.append((d, rows[j][1]))
        rows.append((d + 50, " ".join(base)))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    n = docs.count()
    all_pairs = n * (n - 1) // 2
    cands = lsh_candidates(docs).count()
    assert cands < 0.2 * all_pairs, (
        f"candidate join degenerated: {cands} of {all_pairs}")
    # the planted near-dups still survive prefilter + exact verify
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(docs).collect()}
    planted = {(100, 150), (101, 151), (102, 152)}
    assert planted <= lsh
    assert lsh == exact


def test_simhash_near_dup_distance(spark, docs):
    from codegraph.textops import jaccard_pairs, simhash

    sh = {r["doc_id"]: r["simhash"]
          for r in simhash(docs).collect()}
    pairs = jaccard_pairs(docs, threshold=0.5).collect()
    if not pairs:
        pytest.skip("no near-dup pairs at this sf")
    for p in pairs:
        ham = bin(sh[p["id_a"]] ^ sh[p["id_b"]]).count("1")
        assert ham <= 12, f"near-dup pair {p} has hamming {ham}"


def test_quality_and_tokens_python_parity(spark, docs):
    import re

    from codegraph.textops import quality_score, token_counts

    q = quality_score(docs).toPandas().set_index("doc_id")
    t = token_counts(docs).toPandas().set_index("doc_id")
    for r in docs.limit(10).collect():
        text = r["text"]
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        assert q.loc[r["doc_id"], "n_words"] == len(toks)
        assert q.loc[r["doc_id"], "n_chars"] == len(text)
        ws = [w for w in re.split(r"\s+", text) if w]
        assert t.loc[r["doc_id"], "ws_tokens"] == len(ws)


def test_langid_deterministic(spark, docs):
    from codegraph.textops import lang_id

    a = lang_id(docs).orderBy("doc_id").toPandas()
    b = lang_id(docs).orderBy("doc_id").toPandas()
    assert a.equals(b)
    assert set(a["pred_lang"]) <= {"en", "de", "fr", "es", "unknown"}


def test_embedding_prefilter_recall_equals_exact(spark, docs):
    """Sign-LSH prefilter recall at fixture scale: the prefiltered path
    (candidates -> exact verify) returns EXACTLY the pair set of the exact
    inverted-index path at threshold 0.95 — the property that keeps the
    doc_embed_dedup oracle (which mirrors the exact path in SQL) green."""
    from codegraph.textops import embedding_cosine_dedup

    pre = sorted(map(tuple, embedding_cosine_dedup(
        docs, dim=256, threshold=0.95, prefilter=True).collect()))
    exact = sorted(map(tuple, embedding_cosine_dedup(
        docs, dim=256, threshold=0.95, prefilter=False).collect()))
    assert exact, "fixture must contain planted near-dup pairs"
    assert pre == exact


def test_cosine_lsh_candidate_bound_under_background_similarity(spark):
    """Sign-LSH banding (b=42 x r=12) must NOT degenerate toward the
    all-pairs join on a corpus whose hashed-BoW background cosine sits
    around 0.2-0.4 (shared vocabulary): P(candidate) = 1-(1-p^12)^42 with
    p = 1-arccos(s)/pi stays under ~15% there, while pairs at s >= 0.95
    survive with P ~ 1-1e-6."""
    from random import Random

    from codegraph.textops import (cosine_lsh_candidates, doc_vectors,
                                   embedding_cosine_dedup)

    rng = Random(11)
    pool = [f"word{i:03d}" for i in range(100)]
    rows = []
    for d in range(80):
        rows.append((d, " ".join(pool[rng.randrange(len(pool))]
                                 for _ in range(40))))
    # planted near-dups: one word changed out of 40 -> cosine ~ 0.975
    for j, d in enumerate(range(100, 103)):
        base = rows[j][1].split()
        base[5] = "changed"
        rows.append((d, rows[j][1]))          # exact copy of doc j
        rows.append((d + 50, " ".join(base)))  # 39/40 overlap
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    n = docs.count()
    all_pairs = n * (n - 1) // 2
    cands = cosine_lsh_candidates(doc_vectors(docs, 256)).count()
    assert cands < 0.25 * all_pairs, (
        f"candidate join degenerated: {cands} of {all_pairs}")
    pre = {(r["id_a"], r["id_b"]) for r in embedding_cosine_dedup(
        docs, threshold=0.95, prefilter=True).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in embedding_cosine_dedup(
        docs, threshold=0.95, prefilter=False).collect()}
    planted = {(100, 150), (101, 151), (102, 152)}
    assert planted <= pre
    assert pre == exact


def test_embedding_cosine_dedup_matches_text_near_dups(spark, docs):
    """Hashed-BoW cosine near-dup (exact integer arithmetic over an inverted
    bucket index) finds the same pair set as the shingle-jaccard ground truth
    on this corpus (both are views of the same planted near-duplicates)."""
    from codegraph.textops import embedding_cosine_dedup, jaccard_pairs

    emb = {(r["id_a"], r["id_b"])
           for r in embedding_cosine_dedup(docs, dim=256, threshold=0.95).collect()}
    jac = {(r["id_a"], r["id_b"])
           for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert emb == jac
