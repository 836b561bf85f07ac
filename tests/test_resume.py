"""Checkpoint/resume (SURVEY.md §2 F6): kill after round k, resume from
the snapshot store, end state identical to an uninterrupted run.

This is the fix for the reference's non-transactional status flip
(/root/reference/internal/usecase/crawler.go:681-696): a crash between
delete-pending and save-success loses the job there; here a round is
invisible until its commit marker lands.
"""

import pytest

from go_crawler_spark.crawl import corpus
from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
from go_crawler_spark.crawl.engine import CrawlEngine
from go_crawler_spark.crawl.store import SnapshotStore

SPEC = CorpusSpec(n_hosts=2, lists_per_host=1, pages_per_list=3, details_per_page=6)
CFG = CrawlConfig(round_seconds=10.0, per_page=6, max_rounds=40)


def _snapshot(df):
    return {
        (r["url_hash"], r["url"], r["status"], r["depth"], r["seq_path"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def corpus_df(spark):
    return corpus.build_corpus(spark, SPEC).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def robots_df(spark):
    return corpus.build_robots(spark, SPEC, CFG.disallow)


def test_resume_equals_uninterrupted(spark, tmp_path_factory, corpus_df, robots_df):
    # uninterrupted reference run (no store)
    full = CrawlEngine(spark, CFG, corpus_df, robots_df).run(
        spec=SPEC, with_payload_verify=False
    )
    want = _snapshot(full.frontier)
    total_rounds = len(full.metrics)
    assert total_rounds >= 4

    # interrupted run: stop after 2 rounds, then resume from the store
    base = str(tmp_path_factory.mktemp("crawlstore"))
    store1 = SnapshotStore(spark, base)
    cfg_partial = CrawlConfig(
        round_seconds=CFG.round_seconds, per_page=CFG.per_page, max_rounds=2
    )
    CrawlEngine(spark, cfg_partial, corpus_df, robots_df, store=store1).run(
        spec=SPEC, with_payload_verify=False
    )
    assert store1.latest_step() == 2  # bootstrap + rounds 0,1 committed

    store2 = SnapshotStore(spark, base)
    resumed = CrawlEngine(spark, CFG, corpus_df, robots_df, store=store2).run(
        spec=SPEC, with_payload_verify=False, resume=True
    )
    got = _snapshot(store2.current_frontier())
    assert got == want
    assert _snapshot(resumed.frontier) == want
    # lineage: resumed run continued from round 2, not from scratch
    assert resumed.metrics[0].round == 2
    assert store2.latest_step() == total_rounds


def test_uncommitted_round_invisible(spark, tmp_path_factory, corpus_df, robots_df):
    base = str(tmp_path_factory.mktemp("crawlstore2"))
    store = SnapshotStore(spark, base)
    eng = CrawlEngine(spark, CFG, corpus_df, robots_df, store=store)
    frontier = eng.frontier_from_seeds(corpus.seeds(SPEC))
    # simulate a crash mid-step: data written, marker never lands
    store.append("frontier", frontier, 0)
    store.append("status_log", frontier.limit(1).selectExpr(
        "0 as round", "depth", "seq_path", "url_hash", "url", "host",
        "'SUCCESS' as status"), 5)
    assert store.latest_step() == -1
    assert store.read("frontier") is None  # nothing committed → nothing visible


def test_resume_with_payload_pages(spark, tmp_path_factory, corpus_df, robots_df):
    """Pages (decode/verify results) accumulate correctly across a
    resume: committed rounds' pages survive, resumed rounds append."""
    base = str(tmp_path_factory.mktemp("crawlstore3"))
    store1 = SnapshotStore(spark, base)
    cfg_partial = CrawlConfig(
        round_seconds=CFG.round_seconds, per_page=CFG.per_page, max_rounds=2
    )
    CrawlEngine(spark, cfg_partial, corpus_df, robots_df, store=store1).run(
        spec=SPEC, with_payload_verify=True
    )
    pages_before = store1.read("pages")
    n_before = pages_before.count() if pages_before is not None else 0

    store2 = SnapshotStore(spark, base)
    CrawlEngine(spark, CFG, corpus_df, robots_df, store=store2).run(
        spec=SPEC, with_payload_verify=True, resume=True
    )
    pages = store2.read("pages")
    assert pages is not None
    rows = pages.collect()
    assert len(rows) > n_before > 0
    # invariant holds on every stored page row, including pre-resume ones
    assert all(r["pixels_ok"] and r["caption_ok"] for r in rows)
    # one page row per successfully fetched detail URL, no dup appends
    assert len({r["url_hash"] for r in rows}) == len(rows)


def test_compaction_preserves_state(spark, tmp_path_factory, corpus_df, robots_df):
    """store.compact() collapses step dirs without changing any row —
    the merge-on-read frontier is identical before and after."""
    import os

    base = str(tmp_path_factory.mktemp("crawlstore4"))
    store = SnapshotStore(spark, base)
    CrawlEngine(spark, CFG, corpus_df, robots_df, store=store).run(
        spec=SPEC, with_payload_verify=False
    )
    before = _snapshot(store.current_frontier())
    n_dirs_before = len(os.listdir(os.path.join(base, "frontier")))
    assert n_dirs_before > 1

    store.compact("frontier")
    store.compact("status_log")
    assert len(os.listdir(os.path.join(base, "frontier"))) == 1
    assert _snapshot(store.current_frontier()) == before

    # a fresh store instance reads the compacted layout identically
    assert _snapshot(SnapshotStore(spark, base).current_frontier()) == before


def test_time_travel_read(spark, tmp_path_factory, corpus_df, robots_df):
    """Snapshot time-travel (Iceberg analog): current_frontier(as_of_step=k)
    reproduces the state a reader saw right after step k's commit —
    discoveries born later are invisible, and statuses resolve only
    flips committed by then."""
    base = str(tmp_path_factory.mktemp("crawlstore_tt"))
    store = SnapshotStore(spark, base)
    CrawlEngine(spark, CFG, corpus_df, robots_df, store=store).run(
        spec=SPEC, with_payload_verify=False
    )
    last = store.latest_step()
    assert last >= 2

    # as-of the bootstrap commit: only seeds, all PENDING
    f0 = store.current_frontier(as_of_step=0)
    rows0 = f0.collect()
    assert {r["status"] for r in rows0} == {"PENDING"}
    assert {r["depth"] for r in rows0} == {0}

    # as-of step 1 (round 0 committed): seeds resolved, round-1 births visible
    f1 = store.current_frontier(as_of_step=1)
    rows1 = {r["url"]: r for r in f1.collect()}
    assert any(r["status"] in ("SUCCESS", "FAILED") for r in rows1.values())
    assert max(r["round"] for r in rows1.values()) == 1

    # monotone growth: each snapshot is a superset of the previous
    n_by_step = [
        store.current_frontier(as_of_step=k).count() for k in range(last + 1)
    ]
    assert n_by_step == sorted(n_by_step)
    # and the full view equals the default (no as_of) read
    assert n_by_step[-1] == store.current_frontier().count()


def test_pagerank_resume_equals_uninterrupted(
    spark, tmp_path_factory, corpus_df, robots_df
):
    """order='pagerank' + resume: the resumed run hydrates the stored
    edge increments AND rebuilds the rank table that was in force at
    the resume point (computed at the last recompute round from state
    as of that step), so its dequeue order — not just its end state —
    matches the uninterrupted run exactly. Interrupting at round 3 with
    pagerank_every=2 lands the resume on a NON-recompute round, the
    case where a stale-blind resume would diverge."""
    import dataclasses

    from go_crawler_spark.crawl.simulator import simulate

    cfg = dataclasses.replace(CFG, order="pagerank", pagerank_every=2,
                              pagerank_iters=2)
    golden = simulate(SPEC, cfg)
    assert golden.rounds >= 5  # enough rounds to interrupt mid-cadence

    base = str(tmp_path_factory.mktemp("crawlstore_pr"))
    store1 = SnapshotStore(spark, base)
    cfg_partial = dataclasses.replace(cfg, max_rounds=3)
    CrawlEngine(spark, cfg_partial, corpus_df, robots_df, store=store1).run(
        spec=SPEC, with_payload_verify=False
    )
    assert store1.latest_step() == 3  # resume lands on round 3 (odd)

    store2 = SnapshotStore(spark, base)
    resumed = CrawlEngine(spark, cfg, corpus_df, robots_df, store=store2).run(
        spec=SPEC, with_payload_verify=False, resume=True
    )
    assert resumed.metrics[0].round == 3
    # the resumed rounds' trace must equal the golden trace rows for
    # rounds >= 3 — order included (the rank table in force matches)
    got = [
        (r["round"], r["url"], r["status"])
        for r in resumed.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    expect = [
        (rnd, url, status)
        for rnd, _d, _s, url, _h, status in golden.trace
        if rnd >= 3
    ]
    assert got == expect
    # end state identical to the full golden seen set
    seen = {
        r["url"] for r in store2.current_frontier().select("url").collect()
    }
    assert seen == golden.seen


def test_opic_resume_equals_uninterrupted(
    spark, tmp_path_factory, corpus_df, robots_df
):
    """order='opic' + resume: the OPIC rank order rides the same
    stored edge lineage and in-force-table rebuild as pagerank — a
    resumed crawl dequeues exactly as the uninterrupted one, including
    rounds where the table in force predates the resume point."""
    import dataclasses

    from go_crawler_spark.crawl.simulator import simulate

    cfg = dataclasses.replace(CFG, order="opic", pagerank_every=2,
                              opic_iters=2)
    golden = simulate(SPEC, cfg)
    assert golden.rounds >= 5  # enough rounds to interrupt mid-cadence

    base = str(tmp_path_factory.mktemp("crawlstore_opic"))
    store1 = SnapshotStore(spark, base)
    cfg_partial = dataclasses.replace(cfg, max_rounds=3)
    CrawlEngine(spark, cfg_partial, corpus_df, robots_df, store=store1).run(
        spec=SPEC, with_payload_verify=False
    )
    assert store1.latest_step() == 3  # resume lands on round 3 (odd)

    store2 = SnapshotStore(spark, base)
    resumed = CrawlEngine(spark, cfg, corpus_df, robots_df, store=store2).run(
        spec=SPEC, with_payload_verify=False, resume=True
    )
    assert resumed.metrics[0].round == 3
    got = [
        (r["round"], r["url"], r["status"])
        for r in resumed.ordered_trace().orderBy("pos")
        .select("round", "url", "status").collect()
    ]
    expect = [
        (rnd, url, status)
        for rnd, _d, _s, url, _h, status in golden.trace
        if rnd >= 3
    ]
    assert got == expect
    seen = {
        r["url"] for r in store2.current_frontier().select("url").collect()
    }
    assert seen == golden.seen
