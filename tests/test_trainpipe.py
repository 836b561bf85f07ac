"""Crawl→train composed pipeline (VERDICT r4 #7): value parity vs
DuckDB lives in the oracle suite (crawl_to_train); these pin (a) the
properties a hash can't express — gate coverage, dedup collapse,
prefix-sum contiguity — and (b) the ENGINE INTEGRATION: the same
crawl_to_train function over real CrawlResult.pages rows."""

from go_crawler_spark.functions.trainpipe import (
    TRAIN_DUP_BASE,
    TRAIN_MIN_CAPTION,
    TRAIN_MIN_SIDE,
    TRAIN_PACK_BUDGET,
    crawl_to_train,
    q_crawl_to_train,
)


def _check_manifest(rows):
    """Shared invariants over a crawl_to_train output: keep composition
    and exact prefix-sum contiguity of the packing manifest."""
    for r in rows:
        assert r["keep"] == (
            r["verified"] and r["image_ok"] and r["caption_len_ok"]
            and r["dup_keeper"]
        )
        if not r["keep"]:
            assert r["start_off"] == r["pack_first"] == r["pack_last"] == -1
    kept = sorted((r for r in rows if r["keep"]), key=lambda r: r["url_hash"])
    off = 0
    for r in kept:
        assert r["start_off"] == off
        assert r["pack_first"] == off // TRAIN_PACK_BUDGET
        assert r["pack_last"] == (
            (off + max(r["caption_len"], 1) - 1) // TRAIN_PACK_BUDGET
        )
        off += r["caption_len"]
    return kept


def test_crawl_to_train_synthetic_invariants(spark, sf_small):
    rows = q_crawl_to_train(spark, sf_small).collect()
    assert rows
    kept = _check_manifest(rows)
    assert kept
    # every gate genuinely rejects a slice (no vacuous flags)
    assert any(not r["verified"] for r in rows)
    assert any(not r["image_ok"] for r in rows)
    assert any(not r["dup_keeper"] for r in rows)
    # the planted re-crawl class collapses onto the first writer: a
    # tail doc (>= TRAIN_DUP_BASE) sharing its image with a lower id
    # is never the keeper
    by_hash = {r["url_hash"]: r for r in rows}
    for did in range(TRAIN_DUP_BASE, max(by_hash) + 1):
        if did in by_hash and (did - TRAIN_DUP_BASE) * 4 in by_hash:
            assert not by_hash[did]["dup_keeper"]
    # scrape column populated and in the codec's salary band
    assert all(18 <= r["salary_man"] <= 59 for r in rows)


def test_crawl_to_train_on_engine_pages(spark):
    """Feed real engine output (CrawlResult.pages, payload-verified by
    the decode kernel) through the SAME composed operator — the
    'crawler to training shards' story end to end."""
    from go_crawler_spark.crawl import corpus
    from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
    from go_crawler_spark.crawl.engine import CrawlEngine

    spec = CorpusSpec(n_hosts=2, lists_per_host=1, pages_per_list=3,
                      details_per_page=6, fail_pct=0)
    cfg = CrawlConfig(round_seconds=100.0, per_page=6, max_rounds=10)
    eng = CrawlEngine(
        spark, cfg,
        corpus.build_corpus(spark, spec),
        corpus.build_robots(spark, spec, cfg.disallow),
    )
    res = eng.run(spec=spec)
    assert res.pages is not None
    # wide bucket for spread 64-bit url_hash keys (monotone in the key)
    manifest = crawl_to_train(res.pages, pack_bucket=1 << 48)
    rows = manifest.collect()
    assert len(rows) == res.pages.count()
    kept = _check_manifest(rows)
    assert kept  # verified crawl output actually flows into shards
    # engine verify verdicts propagate: a kept page passed the decode
    # kernel, has curation-grade dims and a real caption
    pages_by_hash = {
        r["url_hash"]: r for r in res.pages.collect()
    }
    for r in kept:
        src = pages_by_hash[r["url_hash"]]
        assert src["decode_ok"] and src["pixels_ok"] and src["caption_ok"]
        assert min(src["w"], src["h"]) >= TRAIN_MIN_SIDE
        assert len(src["caption"]) >= TRAIN_MIN_CAPTION
        assert r["salary_man"] is not None
