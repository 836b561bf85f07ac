"""Pure-Python reference simulator → golden crawl trace (SURVEY.md §5.2).

The reference repo has zero tests, so the golden trace is derived from
its *semantics* (SURVEY.md §1.4/§2): BFS enumeration order
(seed_idx → page_no → link_idx, /root/reference/internal/usecase/
crawler.go:94,242-332,264), run-scoped URL-seen dedupe at enqueue
(crawler.go:448-456), next-link and total-count pagination
(crawler.go:240-401), plus the north rule's per-host politeness budget
and robots filter.

This file is deliberately boring imperative Python over dicts — no
Spark, no numpy — so it can serve as an independent oracle for the
engine. It shares ONLY the corpus topology (corpus.py), the URL kernel
(canonicalize.py) and the budget math (config.py) with the engine;
everything else is re-derived.

Deterministic total order: every frontier row carries a fixed-width
``seq_path`` ("0007.0003.0012"): seeds get their seed_idx, children get
parent_path + link_idx. Lexicographic order on (depth, seq_path) IS the
reference's BFS enumeration order. Dequeue per round = for each host,
the first ``budget(host)`` pending rows by (depth, seq_path); the
round's trace = its dequeued rows sorted by (depth, seq_path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from go_crawler_spark.crawl import corpus
from go_crawler_spark.crawl.canonicalize import canon_url, host_of, path_of, xxhash64_py
from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig


@dataclass
class SimResult:
    # ordered dequeue trace: (round, depth, seq_path, url, host, status)
    trace: list[tuple[int, int, str, str, str, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)  # all URLs ever enqueued
    final_status: dict[str, str] = field(default_factory=dict)
    rounds: int = 0
    metrics: list[dict] = field(default_factory=list)

    @property
    def order(self) -> list[str]:
        return [t[3] for t in self.trace]


def _discoveries(
    spec: CorpusSpec, cfg: CrawlConfig, page: dict
) -> list[tuple[int, str]]:
    """(link_idx, raw_href) for a fetched list page, in enumeration order:
    outlinks first (crawler.go:264), then the pagination continuation
    (next-link click crawler.go:315-330 / total-count build 346-401)."""
    out = list(enumerate(page["outlinks"]))
    n = len(page["outlinks"])
    if page["next_url"] is not None:
        out.append((n, page["next_url"]))
    if page["total_count"] is not None:
        page_count = math.ceil(page["total_count"] / cfg.per_page)
        base = page["url"].split("?", 1)[0]
        for p in range(2, page_count + 1):
            out.append((n + (p - 2), f"{base}?p={p}"))
    return out


def _order_key(cfg: CrawlConfig):
    """Total crawl-order key (F3) — the simulator twin of
    CrawlEngine._order_cols: BFS (depth, seq_path), or priority desc
    with the same tie-break."""
    if cfg.order == "priority":
        return lambda r: (-r["priority"], r["depth"], r["seq_path"])
    return lambda r: (r["depth"], r["seq_path"])


# Independently-derived integer PageRank twin for order='pagerank'
# (deliberately NOT imported from functions/linkgraph.py — the module
# invariant is that engine and simulator share only corpus/canonicalize/
# codec/budget, so golden equality pins the engine's wide-floordiv
# Spark kernels against plain Python bigint math). Values: 1e9 mass
# units per node, 15% teleport, 85/100 damping, all floor division.
_PR_SCALE = 1_000_000_000
_PR_TELEPORT = 150_000_000


def _pagerank_int(
    nodes: set[int], edges: set[tuple[int, int]], iters: int
) -> dict[int, int]:
    outdeg: dict[int, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: _PR_SCALE for n in nodes}
    for _ in range(iters):
        sums: dict[int, int] = {}
        for s, d in edges:
            if s in pr:  # engine twin: ranks⋈edges is an inner join
                sums[d] = sums.get(d, 0) + pr[s] // outdeg[s]
        pr = {n: _PR_TELEPORT + 85 * sums.get(n, 0) // 100 for n in nodes}
    return pr


# Independently-derived integer OPIC twin for order='opic' (same
# share-nothing rule as _pagerank_int: NOT imported from
# functions/linkgraph.py). Every node starts with 1e9 cash; each
# synchronous round banks cash into history, splits it by floor
# division along out-links, pools dangling cash, and redistributes
# the pot uniformly. Importance = cash + history; URLs missing from
# the table (discovered after the recompute) rank at the fresh-page
# endowment _OPIC_SCALE.
_OPIC_SCALE = 1_000_000_000


def _opic_int(
    nodes: set[int], edges: set[tuple[int, int]], iters: int
) -> dict[int, int]:
    outdeg: dict[int, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    cash = {v: _OPIC_SCALE for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(iters):
        pot = sum(c for v, c in cash.items() if v not in outdeg)
        inflow: dict[int, int] = {}
        for s, d in edges:
            if s in cash:  # engine twin: edges⋈state is an inner join
                inflow[d] = inflow.get(d, 0) + cash[s] // outdeg[s]
        share = pot // n
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: inflow.get(v, 0) + share for v in nodes}
    return {v: cash[v] + hist[v] for v in nodes}


def simulate(spec: CorpusSpec, cfg: CrawlConfig) -> SimResult:
    pages = {row["url"]: row for row in corpus.iter_rows(spec)}
    delays = {spec.host(i): spec.crawl_delay(i) for i in range(spec.n_hosts)}

    res = SimResult()
    # frontier rows: {url, host, depth, seq_path, h, priority, status}
    frontier: list[dict] = []
    for seed_idx, url in corpus.seeds(spec):
        cu = canon_url(None, url)
        assert cu is not None
        h = xxhash64_py(cu)
        frontier.append(
            {"url": cu, "host": host_of(cu), "depth": 0,
             "seq_path": f"{seed_idx:04d}", "h": h,
             "priority": CrawlConfig.priority_of(h)}
        )
        res.seen.add(cu)

    # rank-order twin state ('pagerank'/'opic'): edges discovered so
    # far (as hash pairs, deduped by the set) and the rank table in
    # force, with the mode's floor for URLs missing from the table
    rank_mode = cfg.order in ("pagerank", "opic")
    rank_floor = _OPIC_SCALE if cfg.order == "opic" else _PR_TELEPORT
    edges_seen: set[tuple[int, int]] = set()
    ranks: dict[int, int] = {}

    pending = list(frontier)
    for rnd in range(cfg.max_rounds):
        if not pending:
            break
        res.rounds = rnd + 1
        if rank_mode:
            if rnd % cfg.pagerank_every == 0:
                # recompute from everything seen / every edge discovered
                # in rounds < rnd — exactly the engine's cadence
                node_set = {xxhash64_py(u) for u in res.seen}
                if cfg.order == "opic":
                    ranks = _opic_int(node_set, edges_seen, cfg.opic_iters)
                else:
                    ranks = _pagerank_int(
                        node_set, edges_seen, cfg.pagerank_iters
                    )
            rk = dict(ranks)  # bind the in-force table for this round
            pending.sort(
                key=lambda r: (
                    -rk.get(r["h"], rank_floor), r["depth"], r["seq_path"]
                )
            )
        else:
            pending.sort(key=_order_key(cfg))
        taken_per_host: dict[str, int] = {}
        dequeued, deferred = [], []
        for row in pending:
            budget = cfg.budget(delays.get(row["host"], 1.0))
            if taken_per_host.get(row["host"], 0) < budget:
                taken_per_host[row["host"]] = taken_per_host.get(row["host"], 0) + 1
                dequeued.append(row)
            else:
                deferred.append(row)

        discovered: list[dict] = []
        n_ok = n_fail = n_robots = n_dup = 0
        for row in dequeued:  # already (depth, seq_path)-sorted
            page = pages.get(row["url"])
            ok = page is not None and page["fetch_ok"]
            status = "SUCCESS" if ok else "FAILED"
            if ok:
                n_ok += 1
            else:
                n_fail += 1
            res.final_status[row["url"]] = status
            res.trace.append(
                (rnd, row["depth"], row["seq_path"], row["url"], row["host"], status)
            )
            if not ok or page["kind"] != "list":
                continue
            for link_idx, href in _discoveries(spec, cfg, page):
                cu = canon_url(row["url"], href)
                if cu is None:
                    continue
                # RFC 9309: longest matching prefix wins, ties to Allow
                p = path_of(cu)
                dis = max(
                    (len(d) for d in cfg.disallow if p.startswith(d)), default=0
                )
                alw = max(
                    (len(a) for a in cfg.allow if p.startswith(a)), default=0
                )
                if dis > alw:
                    n_robots += 1
                    continue
                ch = xxhash64_py(cu)
                if rank_mode:
                    # edge: fetching page → robots-allowed candidate,
                    # INCLUDING already-seen targets (in-links to
                    # popular pages are what rank rewards) — the twin
                    # of the engine's edges_inc
                    edges_seen.add((row["h"], ch))
                discovered.append(
                    {
                        "url": cu,
                        "host": host_of(cu),
                        "depth": row["depth"] + 1,
                        "seq_path": f"{row['seq_path']}.{link_idx:04d}",
                        "h": ch,
                        "priority": CrawlConfig.priority_of(ch),
                    }
                )

        # within-batch first-writer-wins, then seen-set dedupe (D1-D3)
        discovered.sort(key=lambda r: (r["depth"], r["seq_path"]))
        fresh = []
        batch_seen: set[str] = set()
        for row in discovered:
            if row["url"] in res.seen or row["url"] in batch_seen:
                n_dup += 1
                continue
            batch_seen.add(row["url"])
            fresh.append(row)
        for row in fresh:
            res.seen.add(row["url"])
        pending = deferred + fresh
        res.metrics.append(
            {
                "round": rnd,
                "dequeued": len(dequeued),
                "success": n_ok,
                "failed": n_fail,
                "robots_skipped": n_robots,
                "dedup_skipped": n_dup,
                "enqueued": len(fresh),
            }
        )
    return res


def golden_frames(res: SimResult) -> tuple[list[dict], list[dict]]:
    """(golden_order rows, golden_seen rows) per FIXTURES.md §5."""
    order = [
        {
            "pos": pos,
            "round": rnd,
            "url_hash": xxhash64_py(url),
            "url": url,
            "depth": depth,
            "host": host,
            "status": status,
        }
        for pos, (rnd, depth, _sp, url, host, status) in enumerate(res.trace)
    ]
    seen = [{"url_hash": xxhash64_py(u), "url": u} for u in sorted(res.seen)]
    return order, seen
