"""Full-text relevance search over the ``documents`` table: BM25
top-k for a fixed conjunctive keyword query.

The inverted-index shape a 100 TB corpus needs is exactly what the
DataFrame plan already is: per-document term frequencies are a narrow
map over the token array (no shuffle), corpus statistics (N, Σdl, per-
term document frequencies) are ONE map-side-combined aggregate that
reduces to a single broadcast row, and scoring + top-k is another
narrow map followed by a rank window. Nothing materializes per-(term,
doc) postings — with a fixed query the postings list is the filter,
not a table.

Float parity with the DuckDB oracle: idf is rounded to 6 decimals
immediately after the ln() (Java's Math.log and libm's log may differ
in the last ulp; rounding first makes the downstream products exact),
every arithmetic step is written in the identical order on both sides,
and the 3-term score sum is an explicit left-to-right `+` chain, never
an unordered SUM aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_crawler_spark.functions.textstats import tokens_col
from go_crawler_spark.tables import load

BM25_TERMS = ("spark", "join", "hash")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == term)).cast("long")


def _idf6(n_docs: Column, df: Column) -> Column:
    """round(ln((N − df + 0.5) / (df + 0.5) + 1), 6) — the Robertson-
    Sparck Jones idf, +1-smoothed so it is always positive."""
    return F.round(
        F.log(
            (n_docs.cast("double") - df.cast("double") + F.lit(0.5))
            / (df.cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )


def _tf_part(tf: Column, dl: Column, n_docs: Column, sum_dl: Column) -> Column:
    """tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), avgdl = Σdl / N."""
    avgdl = sum_dl.cast("double") / n_docs.cast("double")
    return (tf.cast("double") * F.lit(BM25_K1 + 1.0)) / (
        tf.cast("double")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl.cast("double") / avgdl)
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BM25_TOPK documents for the fixed query BM25_TERMS; ties on
    the rounded score break toward the smaller doc_id."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens_col(F.col("text"))
    d = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(toks, t).alias(f"tf_{t}") for t in BM25_TERMS],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).cast("long").alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    n, s = F.col("n_docs"), F.col("sum_dl")
    score = None
    for t in BM25_TERMS:
        part = _idf6(n, F.col(f"df_{t}")) * _tf_part(F.col(f"tf_{t}"), F.col("dl"), n, s)
        score = part if score is None else score + part
    # orderBy().limit() compiles to TakeOrderedAndProject — a parallel
    # per-partition top-k + driver merge of k·P rows, never a global
    # sort. The rank window runs over the k survivors only.
    top = (
        scored.select(
            "doc_id",
            *[f"tf_{t}" for t in BM25_TERMS],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# --------------------------------------------------------------------------
# Inverted-index build — the other half of search infrastructure: BM25
# above FILTERS with a fixed query; this MATERIALIZES the posting
# table an ad-hoc query engine serves from. Per term: document
# frequency, total term frequency, and the head of the posting list
# (top INDEX_POSTINGS docs by tf desc, doc_id asc) rendered as a
# "doc:tf" string so the value survives engine-agnostic hashing.
#
# Scale honesty: the naive collect_list-per-term aggregation buffers
# EVERY (doc, tf) pair of a hot term ("the" over 10^10 docs) in one
# aggregation state — unbounded memory. The plan here instead ranks
# with a per-term row_number Window (sort-based, spillable) and only
# the ≤ INDEX_POSTINGS survivors enter the list aggregate, so no
# operator state exceeds k rows per term. Both shuffles key on the
# term; stats and postings reuse the same partitioning (one Exchange,
# AQE-reused).
# --------------------------------------------------------------------------

INDEX_DF_MIN = 5  # drop hapax-ish terms: df >= 5
INDEX_POSTINGS = 8  # posting-list head length


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, tf_total, top_postings) for every term with df >=
    INDEX_DF_MIN; top_postings = "doc:tf,doc:tf,..." ranked tf desc,
    doc_id asc."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    head = tf.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= INDEX_POSTINGS
    )
    posts = head.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("rn").alias("rn"),
                            F.concat_ws(":", "doc_id", "tf").alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("top_postings")
    )
    return (
        stats.filter(F.col("df") >= INDEX_DF_MIN)
        .join(posts, "term")
        .select("term", "df", "tf_total", "top_postings")
    )


# --------------------------------------------------------------------------
# Per-document salient terms — the df-penalized (tf-idf-shaped) ranking
# that doc-level retrieval/labeling pipelines materialize next to the
# inverted index. The idf surrogate is integer-exact floor(1e6/df)
# (monotone in 1/df like log-idf, but engine-independent — no libm log
# whose last bit could differ between JVM and DuckDB).
# --------------------------------------------------------------------------

TFIDF_TOPK = 3  # salient terms kept per document
TFIDF_IDF_SCALE = 1_000_000


def q_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rnk, term, score) — top TFIDF_TOPK terms per doc by
    score = tf · floor(1e6/df), ties broken term-ascending.

    Scale shape: (doc, term, tf) and (term, df) are the inverted
    index's own aggregates (both shuffles key on the term / doc-term
    hash); the df side joins back BY TERM (pre-aggregated, one row per
    term — bounded), and the final Window partitions by doc_id over
    rows bounded by the doc's distinct-term count. No unbounded
    aggregation state, no driver-side vocab."""
    from go_crawler_spark.functions.textstats import _floordiv

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = tf.join(df_tbl, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * _floordiv(
                F.lit(TFIDF_IDF_SCALE).cast("long"), F.col("df")
            )
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "rnk", "term", "score")
    )


# --------------------------------------------------------------------------
# Posting-list delta + varint size estimate — the storage-planning
# statistic behind every inverted index at scale (gap encoding:
# Witten/Moffat/Bell, "Managing Gigabytes", ch. 3). Postings sorted by
# doc_id store GAPS, and a 7-bit varint then spends bytes only on the
# gap magnitude, so dense (high-df) terms compress hardest — the
# index-sizing decision for a 100 TB corpus (can the posting store fit
# on flash?) reads exactly this table. The reference materializes no
# index at all; this sizes the one q_inverted_index builds.
#
# Integer-exact on purpose: varint_bytes(gap) = 1 + [gap≥2^7] +
# [gap≥2^14] + [gap≥2^21] + [gap≥2^28] (doc_ids stay far below 2^35 at
# any SF), the first posting's gap is doc_id − (−1) so every gap ≥ 1,
# and savings_permille = (raw − varint)·1000 div raw — no floats, so
# DuckDB replays every row bit-for-bit.
#
# Scale shape: the gap window and the per-term aggregate BOTH key on
# the term — one Exchange, AQE-reused (the inverted index's exact
# pattern); the window sort is per-term and spillable, state never
# exceeds a sort run. No global sort, no collect.
# --------------------------------------------------------------------------

VARINT_STEPS = (128, 16384, 2097152, 268435456)  # 2^7, 2^14, 2^21, 2^28


def _varint_bytes(gap: Column) -> Column:
    b = F.lit(1).cast("long")
    for step in VARINT_STEPS:
        b = b + F.when(gap >= step, 1).otherwise(0).cast("long")
    return b


def q_postings_delta_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, raw_bytes, varint_bytes, savings_permille) for every
    term with df >= INDEX_DF_MIN: raw = 8 bytes/posting, varint = the
    7-bit gap encoding of the doc_id-sorted posting list."""
    from go_crawler_spark.functions.textstats import _floordiv

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    postings = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("term")
    ).distinct()
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = postings.withColumn(
        "gap", F.col("doc_id") - F.lag("doc_id", 1, -1).over(w)
    )
    agg = gaps.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(_varint_bytes(F.col("gap"))).cast("long").alias("varint_bytes"),
    )
    raw = (F.col("df") * 8).cast("long")
    return (
        agg.filter(F.col("df") >= INDEX_DF_MIN)
        .withColumn("raw_bytes", raw)
        .withColumn(
            "savings_permille",
            _floordiv(
                (F.col("raw_bytes") - F.col("varint_bytes")) * 1000,
                F.col("raw_bytes"),
            ),
        )
        .select("term", "df", "raw_bytes", "varint_bytes", "savings_permille")
    )
