"""Bloom shard properties (SURVEY.md §2 D1): no false negatives ever,
false-positive rate sane, incremental union correct."""

import numpy as np
import pandas as pd
import pytest

from go_crawler_spark.crawl.bloom import BloomShards
from go_crawler_spark.crawl.config import CrawlConfig

CFG = CrawlConfig(bloom_shards=4, bloom_bits_per_shard=1 << 16, bloom_hashes=5)


@pytest.fixture(scope="module")
def built(spark):
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], ["url_hash"])
    return keys, BloomShards.build(df, CFG)


def test_no_false_negatives(built):
    keys, bloom = built
    assert bloom.maybe_contains(pd.Series(keys)).all()


def test_false_positive_rate(built):
    keys, bloom = built
    rng = np.random.default_rng(8)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bloom.maybe_contains(pd.Series(fresh)).mean()
    # 5k keys over 4×64Kbit shards at k=5 → theoretical fp ≈ 0.3%
    assert fp < 0.02


def test_union_incremental(spark, built):
    keys, bloom = built
    extra = np.arange(10_000_000, 10_000_500, dtype=np.int64)
    delta = BloomShards.build(
        spark.createDataFrame([(int(k),) for k in extra], ["url_hash"]), CFG
    )
    merged = bloom.union(delta)
    assert merged.maybe_contains(pd.Series(extra)).all()
    assert merged.maybe_contains(pd.Series(keys)).all()


def test_negative_hash_sharding(built):
    _, bloom = built
    neg = pd.Series(np.array([-1, -12345678901234, -(2**62)], dtype=np.int64))
    bloom.maybe_contains(neg)  # must not raise / mis-index


def test_with_hashes_matches_build(spark, built):
    keys, bloom = built
    extra = np.arange(777, 2777, dtype=np.int64) * 1_000_003
    via_driver = bloom.with_hashes(extra)
    via_build = bloom.union(
        BloomShards.build(
            spark.createDataFrame([(int(k),) for k in extra], ["url_hash"]), CFG
        )
    )
    assert via_driver.maybe_contains(pd.Series(extra)).all()
    for sid in via_build.shards:
        assert (via_driver.shards[sid] == via_build.shards[sid]).all()


def test_saturation_estimate_and_rebuild(spark):
    """Saturation must degrade to correct-but-slower, never wrong: a
    drastically undersized filter still has NO false negatives (tier 2
    keeps exactness); fp_rate reports the saturation; rebuilding with
    doubled shards (the engine's policy) brings the estimate back down."""
    tiny = CrawlConfig(bloom_shards=1, bloom_bits_per_shard=1 << 10, bloom_hashes=5)
    keys = np.arange(5000, dtype=np.int64) * 97 + 13
    df = spark.createDataFrame([(int(k),) for k in keys], ["url_hash"])
    bloom = BloomShards.build(df, tiny)

    assert bloom.maybe_contains(pd.Series(keys)).all()  # never a false neg
    assert bloom.fp_rate() > 0.9 and bloom.saturated()  # honest estimate

    # the engine's rebuild policy: same keys, doubled shard count, until
    # the estimate clears the threshold — capacity doubles per step
    from dataclasses import replace

    cfg = tiny
    rebuilt = bloom
    for _ in range(12):
        if not rebuilt.saturated():
            break
        cfg = replace(cfg, bloom_shards=cfg.bloom_shards * 2)
        rebuilt = BloomShards.build(df, cfg)
    assert not rebuilt.saturated()
    assert rebuilt.maybe_contains(pd.Series(keys)).all()
    assert rebuilt.fp_rate() < bloom.fp_rate()


def test_engine_saturated_bloom_exactness(spark):
    """End-to-end: a crawl forced through a saturated 64-bit filter must
    produce byte-identical traces to the roomy-filter run — the exact
    tier guarantees results, the Bloom tier only prunes."""
    from go_crawler_spark.crawl import corpus
    from go_crawler_spark.crawl.config import CorpusSpec
    from go_crawler_spark.crawl.engine import CrawlEngine

    spec = CorpusSpec(n_hosts=2, lists_per_host=2, pages_per_list=2,
                      details_per_page=4, payloads=False)
    starved = CrawlConfig(round_seconds=36000.0, per_page=4, max_rounds=6,
                          bloom_shards=1, bloom_bits_per_shard=64,
                          bloom_hashes=2)
    roomy = CrawlConfig(round_seconds=36000.0, per_page=4, max_rounds=6,
                        bloom_shards=8, bloom_bits_per_shard=1 << 20,
                        bloom_hashes=5)
    corpus_df = corpus.build_corpus(spark, spec).localCheckpoint(eager=True)
    robots_df = corpus.build_robots(spark, spec, starved.disallow)

    runs = {}
    for name, cfg in (("starved", starved), ("roomy", roomy)):
        res = CrawlEngine(spark, cfg, corpus_df, robots_df).run(
            spec=spec, with_payload_verify=False
        )
        runs[name] = sorted(
            map(tuple, res.trace.select("round", "url", "status").collect())
        )
    assert runs["starved"] == runs["roomy"]
