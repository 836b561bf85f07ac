"""spark-submit entry point for the crawl engine (SURVEY.md §7 M5).

  spark-submit --py-files dist/go_crawler_spark.zip scripts/run_crawl.py \
      [--corpus PATH] [--robots PATH] [--store DIR] [--rounds N] \
      [--round-seconds S] [--resume] [--synthetic-sf SCALE]

With --synthetic-sf the seeded generator builds the corpus in-session
(tests / demo); with --corpus/--robots it crawls pre-built tables. The
session is obtained from SparkSession.builder.getOrCreate(), so master,
executor sizing, and dynamic allocation come from spark-submit — the
engine itself never assumes local mode.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="parquet path of the corpus table")
    ap.add_argument("--robots", help="parquet path of the robots table")
    ap.add_argument("--store", help="snapshot store dir (enables resume)")
    ap.add_argument("--rounds", type=int, default=32)
    ap.add_argument("--round-seconds", type=float, default=60.0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic-sf", type=float, default=None,
                    help="generate a synthetic corpus at this scale instead")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip payload decode/verify (frontier-only run)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("go_crawler_spark.crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from go_crawler_spark.crawl import corpus as cm
    from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
    from go_crawler_spark.crawl.engine import CrawlEngine
    from go_crawler_spark.crawl.store import SnapshotStore

    cfg = CrawlConfig(round_seconds=args.round_seconds, max_rounds=args.rounds)
    spec = None
    if args.synthetic_sf is not None:
        s = args.synthetic_sf
        spec = CorpusSpec(
            n_hosts=max(2, int(12 * s)),
            lists_per_host=3,
            pages_per_list=4,
            details_per_page=max(4, int(32 * s)),
        )
        corpus_df = cm.build_corpus(spark, spec)
        robots_df = cm.build_robots(spark, spec, cfg.disallow, cfg.allow)
        seeds = cm.seeds(spec)
    elif args.corpus and args.robots:
        corpus_df = spark.read.parquet(args.corpus)
        robots_df = spark.read.parquet(args.robots)
        seeds = [
            (i, r["url"])
            for i, r in enumerate(
                corpus_df.filter("kind = 'list' AND page_no = 1")
                .select("url").orderBy("url").collect()
            )
        ]
    else:
        ap.error("need either --synthetic-sf or both --corpus and --robots")

    store = SnapshotStore(spark, args.store) if args.store else None
    eng = CrawlEngine(spark, cfg, corpus_df, robots_df, store=store)
    res = eng.run(
        seed_list=seeds,
        spec=spec,
        with_payload_verify=not args.no_verify,
        resume=args.resume,
    )
    print(json.dumps({
        "rounds": len(res.metrics),
        "metrics": [vars(m) for m in res.metrics],
        "frontier_rows": res.frontier.count(),
    }), file=sys.stdout)


if __name__ == "__main__":
    main()
