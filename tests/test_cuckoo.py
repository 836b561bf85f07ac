"""Cuckoo URL-seen filter (the north rule's "Bloom/cuckoo" second
half): membership/no-false-negative semantics, deletion (the re-fetch
hook Bloom can't offer), kick-path integrity, merge, saturation, and
the engine drop-in (golden trace identical to the Bloom run)."""

import numpy as np
import pandas as pd
import pytest

from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
from go_crawler_spark.crawl.cuckoo import CuckooShards, _insert_into


def _mk(n_keys: int, nb: int = 1 << 10, bs: int = 4, s: int = 4, seed: int = 1):
    rng = np.random.default_rng(seed)
    keys = rng.integers(-(2**62), 2**62, size=n_keys, dtype=np.int64)
    keys = np.unique(keys)
    f = CuckooShards({}, nb, bs, s).with_hashes(keys)
    return f, keys


def test_no_false_negatives_and_low_fp():
    f, keys = _mk(5000)
    assert not f.overflowed
    got = f.maybe_contains(pd.Series(keys))
    assert got.all()  # every inserted key reports maybe-seen
    rng = np.random.default_rng(2)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = probe[~np.isin(probe, keys)]
    fp = f.maybe_contains(pd.Series(probe)).mean()
    assert fp < 0.01  # 16-bit fp, 4-slot buckets: ~1e-4 expected


def test_delete_frees_membership():
    f, keys = _mk(3000)
    drop, keep = keys[:500], keys[500:]
    f2 = f.delete(drop)
    # kept keys: still no false negatives
    assert f2.maybe_contains(pd.Series(keep)).all()
    # deleted keys: gone except fingerprint twins (rare)
    still = f2.maybe_contains(pd.Series(drop)).sum()
    assert still <= 5
    # the original filter is untouched (value semantics)
    assert f.maybe_contains(pd.Series(drop)).all()
    # delete of a never-inserted key is a harmless no-op
    f3 = f2.delete(np.array([123456789], dtype=np.int64))
    assert f3.maybe_contains(pd.Series(keep)).all()


def test_kick_path_integrity():
    # small table at high load forces relocation chains; membership
    # must survive every kick
    f, keys = _mk(900, nb=1 << 8, bs=4, s=1)  # 1024 slots, ~88% load
    assert not f.overflowed
    assert f.maybe_contains(pd.Series(keys)).all()
    assert f.load_factor() > 0.8


def test_union_replays_occupied_slots():
    fa, ka = _mk(1500, seed=3)
    fb, kb = _mk(1500, seed=4)
    merged = fa.union(fb)
    assert merged.maybe_contains(pd.Series(ka)).all()
    assert merged.maybe_contains(pd.Series(kb)).all()


def test_saturation_flags():
    f, _ = _mk(4000, nb=1 << 8, bs=4, s=1)  # 4000 keys into 1024 slots
    assert f.saturated()  # overflowed or load past the knee
    f2, _ = _mk(500, nb=1 << 10, bs=4, s=4)
    assert not f2.saturated()


def test_idempotent_reinsert_uses_one_slot():
    keys = np.arange(100, dtype=np.int64) * 7919
    table = np.zeros((1 << 8, 4), dtype=np.uint16)
    assert _insert_into(table, keys)
    once = np.count_nonzero(table)
    assert _insert_into(table, keys)  # same keys again
    assert np.count_nonzero(table) == once


def test_config_validation():
    with pytest.raises(ValueError):
        CrawlConfig(seen_filter="xor")
    with pytest.raises(ValueError):
        CrawlConfig(cuckoo_buckets_per_shard=1000)  # not a power of two
    with pytest.raises(ValueError):
        CrawlConfig(cuckoo_bucket_size=0)


def test_engine_trace_identical_with_cuckoo(spark):
    """seen_filter='cuckoo' is a tier-1 physical choice only: the trace,
    metrics and seen set must equal the simulator golden exactly (the
    exact tier-2 backstop owns the semantics)."""
    import dataclasses

    from go_crawler_spark.crawl import corpus
    from go_crawler_spark.crawl.engine import CrawlEngine
    from go_crawler_spark.crawl.simulator import simulate

    spec = CorpusSpec(n_hosts=4, lists_per_host=1, pages_per_list=5,
                      details_per_page=5, dup_frac=0.6, fail_pct=20, seed=7)
    cfg = CrawlConfig(round_seconds=25.0, per_page=5, max_rounds=40)
    golden = simulate(spec, cfg)
    eng = CrawlEngine(
        spark,
        dataclasses.replace(cfg, seen_filter="cuckoo"),
        corpus.build_corpus(spark, spec),
        corpus.build_robots(spark, spec, cfg.disallow),
    )
    res = eng.run(spec=spec, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    assert got == [
        (rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace
    ]
    assert {r["url"] for r in res.frontier.select("url").collect()} == golden.seen
    assert [vars(m) for m in res.metrics] == golden.metrics
