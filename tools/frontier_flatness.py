"""Round-cost flatness evidence: per-round wall time must stay ~flat as
the frontier accumulates terminal rows (VERDICT r1 'What's wrong' #4).

The r1 in-memory loop rewrote + eagerly checkpointed the ENTIRE frontier
every round — O(|frontier|) work and block-manager memory per round.
The merge-on-read loop (engine.run) touches only the live queue and the
round's fresh increment; the full seen set is only scanned map-side by
the broadcast-semi exact dedupe check. This bench holds ROUND WORK
constant (fixed 100k-row live queue, fixed politeness budgets, fixed
fanout) and grows the terminal ballast 10× twice (0 → 2M → 20M rows):
a flat elapsed time is the evidence that round cost no longer scales
with frontier size.

Usage: python tools/frontier_flatness.py            # prints JSON lines
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_crawler_spark.crawl.bloom import BloomShards  # noqa: E402
from go_crawler_spark.crawl.config import CrawlConfig  # noqa: E402
from go_crawler_spark.crawl.engine import CrawlEngine  # noqa: E402
from go_crawler_spark.crawl.kernelbench import (  # noqa: E402
    synthetic_pending,
    synthetic_robots,
)
from go_crawler_spark.session import get_spark  # noqa: E402

PENDING_ROWS = 100_000
N_HOSTS = 200
FANOUT = 6
BALLASTS = (0, 2_000_000, 20_000_000)


def terminal_ballast(spark, n: int):
    """n already-crawled rows: url_hash only (the dedupe check reads
    nothing else), disjoint id space from the live queue."""
    return (
        spark.range(n)
        .select(F.xxhash64(F.format_string("https://done/%d", "id")).alias("url_hash"))
    )


def one_round(spark, eng, pending, seen_hashes, bloom) -> dict:
    t0 = time.time()
    dequeued = eng._dequeue(pending).persist()
    n_deq = dequeued.count()
    child_space = PENDING_ROWS * FANOUT // 2
    base = dequeued.select(
        "url", "depth", "seq_path",
        F.transform(
            F.sequence(F.lit(0), F.lit(FANOUT - 1)),
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
    fresh = eng.dedupe_new(allowed, seen_hashes, bloom, 0).localCheckpoint(
        eager=True
    )
    n_fresh = fresh.count()
    # live-queue update exactly as engine.run does it
    new_pending = (
        pending.join(F.broadcast(dequeued.select("url_hash")), "url_hash", "left_anti")
        .unionByName(fresh)
        .localCheckpoint(eager=True)
    )
    new_pending.count()
    elapsed = time.time() - t0
    dequeued.unpersist()
    return {
        "dequeued": int(n_deq),
        "fresh": int(n_fresh),
        "elapsed_sec": round(elapsed, 2),
    }


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("frontier_flatness", cpus=cpus, shuffle_partitions=cpus)
    cfg = CrawlConfig(round_seconds=4000.0, bloom_shards=32,
                      bloom_bits_per_shard=1 << 23)
    eng = CrawlEngine(spark, cfg, corpus_df=None,
                      robots_df=synthetic_robots(spark, N_HOSTS))
    pending = synthetic_pending(spark, PENDING_ROWS, N_HOSTS).localCheckpoint(
        eager=True
    )
    results = []
    for ballast_n in BALLASTS:
        ballast = terminal_ballast(spark, ballast_n).localCheckpoint(eager=True)
        seen = pending.select("url_hash").unionByName(ballast)
        # bloom over the full seen set (built once per frontier state,
        # amortized over many rounds in a real run — not timed)
        bloom = BloomShards.build(seen, cfg)
        # warmup once (codegen + python workers), then best-of-3
        one_round(spark, eng, pending, seen, bloom)
        best = min(
            one_round(spark, eng, pending, seen, bloom)["elapsed_sec"]
            for _ in range(3)
        )
        row = {"frontier_rows": PENDING_ROWS + ballast_n,
               "ballast_rows": ballast_n, "round_sec_best_of_3": best}
        results.append(row)
        print(json.dumps(row), flush=True)
        ballast.unpersist()
    base = results[0]["round_sec_best_of_3"]
    print(json.dumps({
        "flatness_200x_frontier_vs_base":
            round(results[-1]["round_sec_best_of_3"] / base, 2),
        "note": "ratio ~1.0 = round cost independent of frontier size",
    }), flush=True)


if __name__ == "__main__":
    main()
