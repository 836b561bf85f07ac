"""Round-kernel benchmark: the per-round dataflow at frontier scale.

The iterative BFS in engine.py is bounded by crawl depth; its per-round
DAG is what must scale from N to 4N executors (BASELINE.json). This
module runs ONE round of that DAG over an arithmetically-generated
pending frontier of millions of rows — no corpus materialization, no
image bytes (payloads only exist for fetched rows at 10^10 scale):

  synthetic pending (skewed hosts) → politeness dequeue (salted window)
  → fan-out discovery (relative hrefs) → canonicalize kernel →
  first-writer collapse → Bloom probe → exact anti-join → fresh count

Host skew is deterministic and power-law-ish (cubic transform of a
uniform hash) so the salted two-phase top-k actually earns its keep.
Child links overlap (~2× collision space) so dedupe does real work.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_crawler_spark.crawl.bloom import BloomShards
from go_crawler_spark.crawl.config import CrawlConfig
from go_crawler_spark.crawl.corpus import ROBOTS_SCHEMA
from go_crawler_spark.crawl.engine import CrawlEngine


def synthetic_pending(spark: SparkSession, n: int, n_hosts: int) -> DataFrame:
    """Frontier-shaped pending rows, deterministic, skewed by host."""
    u = (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 100_000.0)
    host_id = F.least(
        F.lit(n_hosts - 1), (F.lit(n_hosts) * F.pow(u, F.lit(3.0))).cast("int")
    )
    return (
        spark.range(n)
        .withColumn("host", F.format_string("h%04d.example.com", host_id))
        .withColumn(
            "url", F.format_string("https://%s/item/%d", F.col("host"), F.col("id"))
        )
        .select(
            F.xxhash64("url").alias("url_hash"),
            "url",
            "host",
            F.lit("PENDING").alias("status"),
            F.lit(1).alias("depth"),
            F.format_string("%012d", F.col("id")).alias("seq_path"),
            F.lit(0).alias("round"),
            F.lit(0.0).alias("priority"),
        )
    )


def synthetic_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    delays = (1.0, 2.0, 5.0)
    rows = [
        {
            "host": f"h{i:04d}.example.com",
            "disallow": ["/private"],
            "allow": [],
            "crawl_delay": delays[i % 3],
        }
        for i in range(n_hosts)
    ]
    return spark.createDataFrame(rows, schema=ROBOTS_SCHEMA)


def run_kernel(
    spark: SparkSession,
    n_rows: int = 2_000_000,
    n_hosts: int = 500,
    fanout: int = 6,
    round_seconds: float = 4000.0,
) -> dict:
    """One engine round at scale; returns throughput numbers."""
    cfg = CrawlConfig(
        round_seconds=round_seconds,
        bloom_shards=32,
        bloom_bits_per_shard=1 << 23,  # 32 MB total: 10 bits/key at 24M keys
        broadcast_dedupe=False,  # this stress round dequeues ~40% of a 2M
        # frontier — candidates are NOT politeness-bounded, so the exact
        # check must take the shuffle path, not broadcast 5M keys
    )
    robots = synthetic_robots(spark, n_hosts)
    eng = CrawlEngine(spark, cfg, corpus_df=None, robots_df=robots)

    pending = synthetic_pending(spark, n_rows, n_hosts).localCheckpoint(eager=True)

    t_bloom = time.time()
    bloom = BloomShards.build(pending.select("url_hash"), cfg)
    bloom_sec = time.time() - t_bloom

    t0 = time.time()
    dequeued = eng._dequeue(pending).persist()
    n_deq = dequeued.count()

    # fetch-sim: relative child hrefs into a ~50% colliding id space
    child_space = max(1, n_rows * fanout // 2)
    base = dequeued.select(
        "url",
        "depth",
        "seq_path",
        F.transform(
            F.sequence(F.lit(0), F.lit(fanout - 1)),
            lambda i: F.format_string(
                "/item/c%d",
                F.pmod(F.xxhash64(F.concat(F.col("url"), i.cast("string"))),
                       F.lit(child_space)),
            ),
        ).alias("outlinks"),
        F.lit(None).cast("string").alias("next_url"),
        F.lit(None).cast("int").alias("total_count"),
    )
    flagged = eng._discover(base)
    allowed = flagged.filter(~F.col("robots_reject")).drop("robots_reject")
    fresh = eng.dedupe_new(allowed, pending.select("url_hash"), bloom, 0)
    n_fresh = fresh.count()
    elapsed = time.time() - t0
    dequeued.unpersist()

    n_candidates = n_deq * fanout  # arithmetic: fanout per dequeued row
    processed = n_deq + n_candidates
    return {
        "pending_rows": n_rows,
        "hosts": n_hosts,
        "dequeued": int(n_deq),
        "candidates": int(n_candidates),
        "fresh": int(n_fresh),
        "bloom_build_sec": round(bloom_sec, 2),
        "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(processed / elapsed, 1),
    }


def run_fetch_round(
    spark: SparkSession,
    n_hosts: int = 48,
    details_per_host: int = 2500,
    corpus_path: str | None = None,
    light_metrics: bool = True,
    img_scale: int = 1,
) -> dict:
    """One full fetch round with image payloads: dequeue → corpus join →
    decode/verify (PSNR + caption) → discovery dedupe.

    This is the scaling-efficiency workload (BASELINE.md): the decode
    kernel is CPU-bound (zlib inflate + numpy PSNR per image), which is
    what actually dominates a crawl round's executor time at scale — the
    pure string kernel (run_kernel) saturates a single box's memory
    bandwidth long before 32 cores and is reported separately.

    Corpus generation (also CPU-heavy: PCG64 pixels + deflate) happens
    BEFORE timing via localCheckpoint.
    """
    from go_crawler_spark.crawl import corpus as corpus_mod
    from go_crawler_spark.crawl.config import CorpusSpec

    spec = CorpusSpec(
        n_hosts=n_hosts,
        lists_per_host=5,
        pages_per_list=5,
        details_per_page=max(1, details_per_host // 20),  # 5*5*dpp*0.8 ≈ target
        dup_frac=0.8,
        payloads=True,
        img_scale=img_scale,
    )
    cfg = CrawlConfig(round_seconds=1e7, bloom_shards=16)
    if corpus_path is None:
        # materialize generation ONCE as parquet (generation cost stays
        # out of the timed region), then read it back as a real source
        import tempfile

        corpus_path = tempfile.mkdtemp(prefix="gcs_fetch_corpus_") + "/corpus.parquet"
        corpus_mod.build_corpus(spark, spec).write.mode("overwrite").parquet(
            corpus_path
        )
    # metadata joins read the parquet SOURCE (column pruning keeps the
    # multi-GB `bytes` column out of the meta fetch-join — C8); the
    # payload rows alone are checkpointed into the block manager, the
    # stand-in for the page/blob store a real crawl reads payloads from
    # (a 32-way concurrent parquet read of large binaries GC-thrashes,
    # measured 75 s vs 19 s for the same decode at 8 cores)
    corpus_df = spark.read.parquet(corpus_path)
    n_corpus = corpus_df.count()
    payload_df = corpus_df.filter(
        (F.col("kind") == "detail") & F.col("fetch_ok") & F.col("bytes").isNotNull()
    ).localCheckpoint(eager=True)
    robots = corpus_mod.build_robots(spark, spec, cfg.disallow)
    eng = CrawlEngine(spark, cfg, corpus_df, robots, payload_df=payload_df)

    # pending = every detail page, plus all list pages (discovery work)
    from pyspark.sql import Window

    w = Window.orderBy("url_hash")
    pending = (
        corpus_df.select("url_hash", "url", "host")
        .withColumn("status", F.lit("PENDING"))
        .withColumn("depth", F.lit(1))
        .withColumn(
            "seq_path", F.format_string("%012d", F.row_number().over(w))
        )
        .withColumn("round", F.lit(0))
        .withColumn("priority", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    bloom = BloomShards.build(pending.select("url_hash"), cfg)

    # warmup round on a small slice: spawns python workers on every
    # slot, JITs the codegen'd stages, loads broadcast machinery — the
    # one-time costs a real multi-round crawl amortizes and a
    # single-round measurement would otherwise mis-charge to throughput
    warm = pending.limit(2000).localCheckpoint(eager=True)
    eng.run_round(warm, warm.select("url_hash"), 0, bloom,
                  with_payload_verify=True, light_metrics=True)

    t0 = time.time()
    _, trace, pages, stats, _edges = eng.run_round(
        pending, pending.select("url_hash"), 0, bloom,
        with_payload_verify=True, light_metrics=light_metrics
    )
    elapsed = time.time() - t0
    n_pages = pages.count() if pages is not None else 0
    # light mode: within-round duplicate candidates aren't counted — the
    # urls/sec figure is a lower bound
    extra = stats.dedup_skipped if stats.dedup_skipped >= 0 else 0
    processed = stats.dequeued + extra + stats.enqueued
    return {
        "corpus_urls": int(n_corpus),
        "dequeued": stats.dequeued,
        "images_decoded": int(n_pages),
        "candidates": extra + stats.enqueued,
        "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(processed / elapsed, 1),
        "images_per_sec": round(n_pages / elapsed, 1),
    }
