"""Deduplication sketches and similarity search for training-data
pipelines: exact dedup, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding cosine ANN (brute-force baseline + LSH-bucketed scale path).

Engine-agnostic hashing: every sketch is built on a polynomial rolling
hash mod 2^31−1 (not xxhash64) so the DuckDB oracle can reproduce the
exact same signatures in plain SQL. At 100 TB the hash choice is
irrelevant to performance — the cost is the shuffle of (band, hash)
pairs — and reproducibility buys verifiable correctness.

Scale notes:
- MinHash LSH candidate generation shuffles (band_id, band_hash) —
  cardinality ≈ docs × n_bands, each row tiny; the self-join per bucket
  is the classic LSH join and AQE handles hot buckets (salt if a bucket
  degenerates, e.g. empty docs → drop empty token sets first).
- Brute-force ANN broadcasts the *query* side only; the corpus side
  streams. The LSH-bucketed variant prunes candidates by hyperplane
  sign-bucket equality before the exact rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_crawler_spark.tables import load

P31 = 2147483647  # 2^31 − 1, Mersenne prime

# (a, b) parameter pairs for the MinHash permutation family
# h_i(x) = (a_i·x + b_i) mod P31 — fixed constants, reproducible in SQL.
MINHASH_PERMS = tuple(
    (1_000_003 * (i + 1) % P31, 7_368_787 * (i + 13) % P31) for i in range(16)
)
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows
LSH_ROWS = 4


def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string mod 2^31−1 (see module doc)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % P31,
    )


def token_hashes(text: Column) -> Column:
    """Distinct-token hash set (array<long>) of a whitespace-tokenized doc."""
    toks = F.array_distinct(
        F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    )
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % P31,
        ),
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Hashes of word n-gram shingles (array<long>, distinct)."""
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    k = F.size(toks) - (n - 1)
    shingles = F.when(k > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(
        F.transform(
            shingles,
            lambda s: F.aggregate(
                F.split(s, ""),
                F.lit(0).cast("long"),
                lambda acc, c: (acc * 31 + F.ascii(c)) % P31,
            ),
        )
    )


def _perm_min(hashes: Column, a: int, b: int) -> Column:
    return F.array_min(F.transform(hashes, lambda h: (h * a + b) % P31))


def minhash_signature(hashes: Column) -> Column:
    """array<long> MinHash signature over a token-hash array."""
    return F.array(*[_perm_min(hashes, a, b) for (a, b) in MINHASH_PERMS])


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two hash-set arrays, 4 decimals."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4)


def _bit_votes(hashes: Column, bit: int) -> Column:
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda v, h: v
        + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )


def simhash32(hashes: Column) -> Column:
    """32-bit SimHash of a token-hash array: per-bit majority vote."""
    acc = F.lit(0).cast("long")
    for bit in range(32):
        acc = acc + F.when(_bit_votes(hashes, bit) > 0, F.lit(2 ** bit).cast("long")).otherwise(0)
    return acc


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------------------
# Embedding math (all-double, sequential-sum so the SQL oracle is
# bit-identical: both engines fold left over the same element order)
# --------------------------------------------------------------------------


def dot_double(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_double(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (norm_double(a) * norm_double(b))


# --------------------------------------------------------------------------
# Driver-contract queries
# --------------------------------------------------------------------------


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard between consecutive doc_ids — the verify kernel of
    near-dup detection, on deterministic pairs so the oracle is exact."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", shingle_hashes(F.col("text")).alias("sh")
    )
    a = docs.alias("a")
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id_b"), F.col("sh").alias("sh_b")
    ).alias("b")
    return (
        a.join(b, F.col("a.doc_id") == F.col("doc_id_b"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            (F.col("a.doc_id") + 1).alias("doc_id_next"),
            jaccard(F.col("a.sh"), F.col("sh_b")).alias("jaccard3"),
        )
    )


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH banding→bucket self-join candidate pairs (doc_a <
    doc_b sharing ≥1 band), the standard near-dup scale path."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", token_hashes(F.col("text")).alias("th"))
        .filter(F.size("th") > 0)
        .select("doc_id", minhash_signature(F.col("th")).alias("sig"))
    )
    bands = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda band: F.struct(
                    band.alias("band_id"),
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), band * LSH_ROWS + 1, LSH_ROWS),
                            lambda v: v.cast("string"),
                        ),
                        "-",
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", simhash32(token_hashes(F.col("text"))).alias("simhash")
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sim ≥ 0.45, a < b). Brute-force
    pair join at test SF; the LSH-bucketed variant is the scale path."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = emb.alias("a")
    b = emb.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.45)
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors
    (vec_id % 100 == 0). Query side broadcast; corpus side streams —
    at scale this is one pass over the corpus, no corpus shuffle."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    joined = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("embedding")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_sim")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path (brute-force q_ann_cosine_topk is
# the baseline). Random-hyperplane signs bucket the corpus; candidate
# generation is a bucket-equality join (shuffle on a small int key, AQE
# coalesced) instead of a cross join; exact cosine reranks in-bucket.
# Hyperplanes are integer-arithmetic pseudo-random — h_k[i] =
# ((k*8191 + i*127 + 13) mod 2003) - 1001 — so the DuckDB oracle can
# regenerate them exactly (no RNG state to ship).
# --------------------------------------------------------------------------

ANN_LSH_BITS = 6
ANN_DIM = 64


def _hyperplane_dot(col: Column, k: int) -> Column:
    idx = F.sequence(F.lit(0), F.lit(ANN_DIM - 1))
    weights = F.transform(
        idx, lambda i: ((F.lit(k * 8191) + i * 127 + 13) % 2003 - 1001).cast("double")
    )
    return F.aggregate(
        F.zip_with(col, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(col: Column) -> Column:
    """Sign-bucket id from ANN_LSH_BITS hyperplane projections."""
    bucket = F.lit(0)
    for k in range(ANN_LSH_BITS):
        bucket = bucket + F.when(
            _hyperplane_dot(col, k) >= 0, F.lit(1 << k)
        ).otherwise(F.lit(0))
    return bucket


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-3: candidates share a sign bucket.

    At 10^10 scale the bucket join shuffles on a small int key and each
    bucket's rerank is local — no corpus-wide cross join. Recall is
    traded for the prune (queries only see in-bucket neighbors), which
    is the documented ANN contract.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        "bucket",
    )
    cand = emb.join(queries, "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("embedding")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_sim")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )
