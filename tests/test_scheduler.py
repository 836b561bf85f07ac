"""Politeness dequeue properties: the salted two-phase top-k must equal
the naive single-window top-k on skewed data (SURVEY.md §2 F2, §4.2) —
salting changes partition sizes, never results.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from go_crawler_spark.crawl.config import CrawlConfig
from go_crawler_spark.crawl.engine import CrawlEngine
from go_crawler_spark.crawl.kernelbench import synthetic_pending, synthetic_robots


def test_salted_topk_equals_naive(spark):
    cfg = CrawlConfig(round_seconds=40.0, host_salt_buckets=4)
    robots = synthetic_robots(spark, 20)
    # skewed: host 0 gets ~12% of all rows (cubic transform)
    pending = synthetic_pending(spark, 20_000, 20).localCheckpoint(eager=True)
    eng = CrawlEngine(spark, cfg, corpus_df=None, robots_df=robots)

    got = {
        (r["url_hash"])
        for r in eng._dequeue(pending).select("url_hash").collect()
    }

    naive = (
        pending.join(eng.budgets.drop("disallow"), "host", "left")
        .withColumn("budget", F.coalesce("budget", F.lit(1)))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy("depth", "seq_path")
            ),
        )
        .filter(F.col("rn") <= F.col("budget"))
    )
    want = {(r["url_hash"]) for r in naive.select("url_hash").collect()}
    assert got == want
    assert len(got) > 0

    # budget actually binds: every host is capped
    per_host = (
        eng._dequeue(pending).groupBy("host").count().collect()
    )
    budgets = {
        r["host"]: r["budget"]
        for r in eng.budgets.select("host", "budget").collect()
    }
    for r in per_host:
        assert r["count"] <= budgets[r["host"]]


def test_budget_floor_semantics(spark):
    # floor(round_seconds / delay), min 1 — must equal CrawlConfig.budget
    cfg = CrawlConfig(round_seconds=10.0)
    robots = synthetic_robots(spark, 6)  # delays cycle 1.0, 2.0, 5.0
    eng = CrawlEngine(spark, cfg, corpus_df=None, robots_df=robots)
    rows = {r["host"]: r["budget"] for r in eng.budgets.collect()}
    delays = {f"h{i:04d}.example.com": (1.0, 2.0, 5.0)[i % 3] for i in range(6)}
    for host, budget in rows.items():
        assert budget == cfg.budget(delays[host])


def test_empty_seed_list_terminates(spark):
    """No valid seeds → zero rounds, empty frontier, no crash."""
    from go_crawler_spark.crawl import corpus as cm
    from go_crawler_spark.crawl.config import CorpusSpec

    spec = CorpusSpec(n_hosts=2, lists_per_host=1, pages_per_list=2,
                      details_per_page=2)
    cfg = CrawlConfig(round_seconds=10.0, max_rounds=5)
    eng = CrawlEngine(
        spark, cfg, cm.build_corpus(spark, spec),
        cm.build_robots(spark, spec, cfg.disallow),
    )
    res = eng.run(seed_list=[(0, "not a url"), (1, "ftp://nope/x")])
    assert res.metrics == []
    assert res.frontier.count() == 0
    assert res.trace.count() == 0
