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
