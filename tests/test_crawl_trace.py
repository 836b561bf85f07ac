"""Golden-trace equivalence: Spark engine vs pure-Python simulator.

The correctness gate of the north rule: same URL-seen set + same crawl
order as the reference trace given the same seed list + politeness
budget (BASELINE.json), plus the per-row payload invariant.
"""

import pytest

from go_crawler_spark.crawl import corpus
from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
from go_crawler_spark.crawl.engine import CrawlEngine
from go_crawler_spark.crawl.simulator import golden_frames, simulate

SPEC = CorpusSpec(n_hosts=3, lists_per_host=2, pages_per_list=4, details_per_page=8)
CFG = CrawlConfig(round_seconds=45.0, per_page=8, max_rounds=40)
# round_seconds=45 with delays (1,2,5) → budgets (45,22,9): politeness
# actually defers work across rounds (7 rounds) without making the
# Spark loop pay 28 rounds of fixed job overhead in CI.


@pytest.fixture(scope="module")
def golden():
    return simulate(SPEC, CFG)


@pytest.fixture(scope="module")
def engine_result(spark):
    eng = CrawlEngine(
        spark,
        CFG,
        corpus.build_corpus(spark, SPEC),
        corpus.build_robots(spark, SPEC, CFG.disallow),
    )
    return eng.run(spec=SPEC)


def test_simulator_nontrivial(golden):
    assert golden.rounds > 3  # politeness defers → multiple rounds
    assert len(golden.seen) > 50
    assert any(t[5] == "FAILED" for t in golden.trace)  # fail path exercised
    assert sum(m["robots_skipped"] for m in golden.metrics) > 0
    assert sum(m["dedup_skipped"] for m in golden.metrics) > 0


def test_crawl_order_matches_golden(engine_result, golden):
    rows = engine_result.ordered_trace().orderBy("pos").select(
        "pos", "round", "url", "depth", "host", "status"
    ).collect()
    expect = [
        (pos, rnd, url, depth, host, status)
        for pos, (rnd, depth, _sp, url, host, status) in enumerate(golden.trace)
    ]
    got = [(r["pos"], r["round"], r["url"], r["depth"], r["host"], r["status"])
           for r in rows]
    assert got == expect


def test_url_seen_set_matches_golden(engine_result, golden):
    got = {r["url"] for r in engine_result.frontier.select("url").collect()}
    assert got == golden.seen


def test_final_statuses_match(engine_result, golden):
    got = {
        r["url"]: r["status"]
        for r in engine_result.frontier.select("url", "status").collect()
    }
    for url, status in golden.final_status.items():
        assert got[url] == status, url
    # everything never dequeued stays PENDING in both
    leftover = {u for u, s in got.items() if s == "PENDING"}
    assert leftover == golden.seen - set(golden.final_status)
    assert not leftover  # this config drains fully


def test_round_metrics_match(engine_result, golden):
    got = [vars(m) for m in engine_result.metrics]
    assert got == golden.metrics


def test_payload_invariant(engine_result):
    pages = engine_result.pages
    assert pages is not None
    rows = pages.collect()
    assert len(rows) > 30
    for r in rows:
        assert r["decode_ok"], r["url"]
        assert r["pixels_ok"], r["url"]
        assert r["caption_ok"], r["url"]
        assert r["psnr_db"] >= 40.0
        if r["fmt"] == "png":  # lossless → phash bit-exact; lossy phash is
            assert r["phash_dist"] == 0  # advisory metadata (avg-hash bits
            # near the block-mean threshold legitimately flip under
            # quantization of noise-like images)
    fmts = {r["fmt"] for r in rows}
    assert fmts == {"png", "jpeg"}  # both codec paths exercised


def test_golden_frames_shapes(golden):
    order, seen = golden_frames(golden)
    assert order[0]["pos"] == 0
    assert len(seen) == len(golden.seen)
    assert all(isinstance(r["url_hash"], int) for r in seen[:5])


# --- scenario 2: adversarial knobs (no payload verify, fast) ----------------
# higher failure rate, budget-1 host pressure, lower dup factor — the
# trace must still match the simulator exactly.

SPEC2 = CorpusSpec(n_hosts=4, lists_per_host=1, pages_per_list=5,
                   details_per_page=5, dup_frac=0.6, fail_pct=20, seed=7)
CFG2 = CrawlConfig(round_seconds=25.0, per_page=5, max_rounds=40)


def test_second_scenario_trace_and_seen(spark):
    golden = simulate(SPEC2, CFG2)
    assert golden.rounds == 7
    assert list(golden.final_status.values()).count("FAILED") == 6

    eng = CrawlEngine(
        spark,
        CFG2,
        corpus.build_corpus(spark, SPEC2),
        corpus.build_robots(spark, SPEC2, CFG2.disallow),
    )
    res = eng.run(spec=SPEC2, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace()
        .orderBy("pos")
        .select("round", "url", "status")
        .collect()
    ]
    expect = [(rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace]
    assert got == expect
    seen = {r["url"] for r in res.frontier.select("url").collect()}
    assert seen == golden.seen
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_allow_precedence_trace_and_seen(spark):
    """RFC 9309 Allow precedence end-to-end: ``Allow: /private/job``
    out-lengths the base ``Disallow: /private``, readmitting the URL
    class every earlier scenario rejected. The engine's longest-match
    Catalyst rule and the simulator's independently-derived max() rule
    must produce the identical trace — including the new FAILED rows
    (the corpus has no page for /private/job URLs) and zeroed
    robots_skipped counters."""
    import dataclasses

    cfg = dataclasses.replace(CFG2, allow=("/private/job",))
    base = simulate(SPEC2, CFG2)
    golden = simulate(SPEC2, cfg)
    # Allow actually changes the answer: rejected → crawled
    assert sum(m["robots_skipped"] for m in base.metrics) > 0
    assert sum(m["robots_skipped"] for m in golden.metrics) == 0
    assert golden.seen > base.seen  # strict superset: new URLs surface

    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC2),
        corpus.build_robots(spark, SPEC2, cfg.disallow, cfg.allow),
    )
    res = eng.run(spec=SPEC2, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    expect = [(rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace]
    assert got == expect
    seen = {r["url"] for r in res.frontier.select("url").collect()}
    assert seen == golden.seen
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_shuffle_fetch_strategy_same_results(spark):
    """broadcast_fetch=False (AQE shuffle join) is a physical-plan
    choice only — trace and seen set must be identical."""
    import dataclasses

    golden = simulate(SPEC2, CFG2)
    cfg = dataclasses.replace(CFG2, broadcast_fetch=False)
    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC2),
        corpus.build_robots(spark, SPEC2, cfg.disallow),
    )
    res = eng.run(spec=SPEC2, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    expect = [(rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace]
    assert got == expect


def test_scaled_payload_end_to_end(spark):
    """img_scale=2 corpora (4x pixel count, ids carry '@x2') must pass
    the full decode/verify invariant through the engine."""
    spec = CorpusSpec(n_hosts=2, lists_per_host=1, pages_per_list=2,
                      details_per_page=4, fail_pct=0, img_scale=2)
    cfg = CrawlConfig(round_seconds=100.0, per_page=4, max_rounds=10)
    golden = simulate(spec, cfg)
    eng = CrawlEngine(
        spark, cfg,
        corpus.build_corpus(spark, spec),
        corpus.build_robots(spark, spec, cfg.disallow),
    )
    res = eng.run(spec=spec)
    assert {r["url"] for r in res.frontier.select("url").collect()} == golden.seen
    rows = res.pages.collect()
    assert rows, "no pages decoded"
    for r in rows:
        assert r["image_id"].endswith("@x2")
        assert 48 <= r["w"] <= 128 and 48 <= r["h"] <= 128  # base [24,64] × 2
        assert r["pixels_ok"] and r["caption_ok"] and r["psnr_db"] >= 40.0


def test_priority_order_trace_matches_golden(spark):
    """cfg.order='priority' (north star: 'BFS/priority crawl ordering'):
    dequeue ranks by priority desc — a pure function of url_hash shared
    by engine and simulator — with the BFS key as tie-break. The golden
    trace must match exactly, and must genuinely differ from BFS."""
    import dataclasses

    cfg = dataclasses.replace(CFG2, order="priority")
    golden = simulate(SPEC2, cfg)
    golden_bfs = simulate(SPEC2, CFG2)
    assert golden.order != golden_bfs.order  # the mode changes the trace
    assert golden.seen == golden_bfs.seen  # ...but not what gets found

    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC2),
        corpus.build_robots(spark, SPEC2, cfg.disallow),
    )
    res = eng.run(spec=SPEC2, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    assert got == [
        (rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace
    ]
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_pagerank_order_trace_matches_golden(spark):
    """cfg.order='pagerank' (VERDICT r4 #4): the dequeue priority is the
    integer PageRank of each URL over the edges discovered so far,
    recomputed every pagerank_every rounds (URLs discovered since the
    last recompute rank at the teleport floor). The engine's Spark
    kernels (wide floor-division, broadcast rank join) must reproduce
    the simulator's independently-derived pure-Python bigint PageRank
    exactly — trace, metrics and seen set all pinned. Reference analog:
    the dequeue loop at /root/reference/internal/usecase/crawler.go:
    606-641 has no prioritization; this is the north rule's priority
    axis with a real link-authority signal."""
    import dataclasses

    cfg = dataclasses.replace(CFG2, order="pagerank", pagerank_every=2,
                              pagerank_iters=2)
    golden = simulate(SPEC2, cfg)
    golden_bfs = simulate(SPEC2, CFG2)
    golden_hash = simulate(SPEC2, dataclasses.replace(CFG2, order="priority"))
    # the mode changes the trace vs BOTH other orders…
    assert golden.order != golden_bfs.order
    assert golden.order != golden_hash.order
    # …but not what gets found (the scenario drains fully)
    assert golden.seen == golden_bfs.seen

    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC2),
        corpus.build_robots(spark, SPEC2, cfg.disallow),
    )
    res = eng.run(spec=SPEC2, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    assert got == [
        (rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace
    ]
    seen = {r["url"] for r in res.frontier.select("url").collect()}
    assert seen == golden.seen
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_pagerank_order_every_round_recompute(spark):
    """pagerank_every=1 (recompute each round) on the denser first
    scenario, bounded rounds: exercises rank staleness zero and the
    undrained boundary together."""
    import dataclasses

    cfg = dataclasses.replace(CFG, order="pagerank", pagerank_every=1,
                              pagerank_iters=3, max_rounds=5)
    golden = simulate(SPEC, cfg)
    assert golden.seen - set(golden.final_status)  # stops undrained

    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC),
        corpus.build_robots(spark, SPEC, cfg.disallow),
    )
    res = eng.run(spec=SPEC, with_payload_verify=False)
    got = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    assert got == [
        (rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace
    ]
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_non_drained_politeness_boundary(spark):
    """Hit max_rounds with work still pending: the trace, metrics, AND
    the carried-over PENDING set must match the simulator exactly at
    the boundary (r1 scenarios all drained fully — the politeness
    carry-over was never checked against an undrained stop)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_rounds=3)
    golden = simulate(SPEC, cfg)
    leftover_expect = golden.seen - set(golden.final_status)
    assert leftover_expect, "scenario must stop with work still pending"

    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC),
        corpus.build_robots(spark, SPEC, cfg.disallow),
    )
    res = eng.run(spec=SPEC, with_payload_verify=False)
    got_trace = [
        (r["round"], r["url"], r["status"])
        for r in res.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    assert got_trace == [
        (rnd, url, status) for rnd, _d, _s, url, _h, status in golden.trace
    ]
    got = {
        r["url"]: r["status"]
        for r in res.frontier.select("url", "status").collect()
    }
    assert {u for u, s in got.items() if s == "PENDING"} == leftover_expect
    assert [vars(m) for m in res.metrics] == golden.metrics


def test_config_eager_validation():
    """crawler_config.go-style eager validation (SURVEY §1.2)."""
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CorpusSpec(n_hosts=0)
    with _pytest.raises(ValueError):
        CorpusSpec(dup_frac=0.0)
    with _pytest.raises(ValueError):
        CorpusSpec(fail_pct=100)
    with _pytest.raises(ValueError):
        CrawlConfig(round_seconds=0)
    with _pytest.raises(ValueError):
        CrawlConfig(max_rounds=0)
    with _pytest.raises(ValueError):
        CrawlConfig(order="dfs")
    with _pytest.raises(ValueError):
        CrawlConfig(order="pagerank", pagerank_every=0)
    with _pytest.raises(ValueError):
        CrawlConfig(pagerank_iters=0)
    with _pytest.raises(ValueError):
        CrawlConfig(bloom_shards=0)
    with _pytest.raises(ValueError):
        CrawlConfig(disallow=("private",))  # must start with '/'
    with _pytest.raises(ValueError):
        CrawlConfig(allow=("job",))
    with _pytest.raises(ValueError):
        CrawlConfig(user_agent="")
    with _pytest.raises(ValueError):
        CrawlConfig(user_agent="bot\r\nX-Injected: 1")
    with _pytest.raises(ValueError):
        CrawlConfig(headers=(("", "v"),))
    with _pytest.raises(ValueError):
        CrawlConfig(headers=(("X-Ok", "a\nb"),))


def test_config_lineage_row(spark):
    """C9 sliver: the custom UA + header map (browser_client.go:57-60,
    crawler_config.go:36) surface as a one-row lineage frame."""
    cfg = CrawlConfig(
        user_agent="jobbot/2.1",
        headers=(("Accept-Language", "ja"), ("X-Client", "graft")),
    )
    eng = CrawlEngine(
        spark,
        cfg,
        corpus.build_corpus(spark, SPEC),
        corpus.build_robots(spark, SPEC, cfg.disallow, cfg.allow),
    )
    row = eng.config_lineage().collect()[0]
    assert row["user_agent"] == "jobbot/2.1"
    assert row["headers_json"] == (
        '{"Accept-Language": "ja", "X-Client": "graft"}'
    )
    assert row["order"] == "bfs" and row["disallow"] == "/private"


def test_opic_order_trace_matches_golden(spark):
    """cfg.order='opic': the dequeue priority is the OPIC running
    importance (cash + banked history) over the edges discovered so
    far — the authority estimate Abiteboul et al. designed to be read
    MID-crawl, recomputed on the pagerank_every cadence with
    not-yet-ranked URLs at the fresh-page endowment. The engine's
    exact-integer Spark kernel must reproduce the simulator's
    independently-derived pure-Python bigint OPIC bit-for-bit. The
    scenario is chosen so OPIC's order diverges from BOTH BFS and
    PageRank (the two signals genuinely disagree here), so equality
    pins the OPIC math, not a coincidence of rankings."""
    import dataclasses

    spec = CorpusSpec(
        n_hosts=4, lists_per_host=3, pages_per_list=4,
        details_per_page=6, payloads=False,
    )
    base = CrawlConfig(
        round_seconds=36000.0, per_page=6, max_rounds=6, bloom_shards=8
    )
    cfg = dataclasses.replace(
        base, order="opic", pagerank_every=1, opic_iters=2
    )
    golden = simulate(spec, cfg)
    golden_bfs = simulate(spec, base)
    golden_pr = simulate(
        spec,
        dataclasses.replace(
            base, order="pagerank", pagerank_every=1, pagerank_iters=2
        ),
    )
    assert golden.order != golden_bfs.order
    assert golden.order != golden_pr.order  # the signals disagree here
    assert golden.seen == golden_bfs.seen  # but find the same web

    eng = CrawlEngine(
        spark,
        cfg,
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
    seen = {r["url"] for r in res.frontier.select("url").collect()}
    assert seen == golden.seen
    assert [vars(m) for m in res.metrics] == golden.metrics
