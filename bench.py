"""Round benchmark: headline registry queries + crawl-frontier throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec},
   "sf": ..., "crawl": {...}}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] core count (default 32)
  SPARK_GRAFT_BENCH_SCALE  crawl corpus scale knob (default 1.0)

Queries are forced end-to-end with the noop sink (full compute, no
collect-to-driver skew). The crawl section runs the frontier engine on
a frontier-shaped synthetic corpus (no image bytes — the 10^10 logical
frontier only materializes payloads for fetched rows) and reports the
BASELINE.json headline: frontier URLs scheduled+deduped per second.
"""

from __future__ import annotations

import json
import os
import sys
import time


def warmup(spark, sf_dir: str) -> None:
    """Spin up the session's one-time machinery before any timed query:
    whole-stage codegen, the parquet reader, and the python worker pool
    — otherwise the first headline query absorbs ~3-5 s of session
    warmup and its number measures the JVM, not the plan."""
    from go_crawler_spark.tables import load

    load(spark, sf_dir, "lineitem").limit(50_000).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(10_000).mapInPandas(
        lambda it: it, schema="id bigint"
    ).write.format("noop").mode("overwrite").save()


# Queries slower than this get a second run (best-of-2, both published):
# this host's single-run times swing ±50-100% under episodic hypervisor
# fault storms (BENCH.md §1), so one sample cannot attribute a
# regression exactly where regressions would matter most.
HEAVY_RERUN_SEC = 3.0


def run_registry_queries(
    spark, sf_dir: str, names: list[str]
) -> tuple[dict[str, float], dict[str, list[float]]]:
    from go_crawler_spark.registry import REGISTRY

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        ts: list[float] = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(round(time.time() - t0, 3))
            if ts[0] <= HEAVY_RERUN_SEC:
                break
        timings[name] = min(ts)
        runs[name] = ts
        print(f"  {name}: {ts}s", file=sys.stderr)
    return timings, runs


def run_crawl_e2e(spark, scale: float, order: str = "bfs") -> dict:
    """End-to-end crawl over a payload-free corpus (depth-bounded, so
    the per-round driver overhead shows up here — the kernel bench
    below is the scale-honest number). order='pagerank' additionally
    prices the rank-table recompute + broadcast rank join per round
    (the north rule's priority axis with a real authority signal)."""
    from go_crawler_spark.crawl import corpus
    from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
    from go_crawler_spark.crawl.engine import CrawlEngine

    spec = CorpusSpec(
        n_hosts=max(4, int(24 * scale)),
        lists_per_host=4,
        pages_per_list=6,
        details_per_page=max(8, int(96 * scale)),
        payloads=False,
    )
    cfg = CrawlConfig(round_seconds=36000.0, per_page=spec.details_per_page,
                      max_rounds=8, bloom_shards=16, order=order)
    corpus_df = corpus.build_corpus(spark, spec).localCheckpoint(eager=True)
    n_corpus = corpus_df.count()
    robots_df = corpus.build_robots(spark, spec, cfg.disallow)

    eng = CrawlEngine(spark, cfg, corpus_df, robots_df)
    t0 = time.time()
    res = eng.run(spec=spec, with_payload_verify=False)
    elapsed = time.time() - t0

    scheduled = sum(m.dequeued for m in res.metrics)
    deduped = sum(m.dequeued + m.enqueued + m.dedup_skipped for m in res.metrics)
    return {
        "corpus_urls": int(n_corpus),
        "rounds": len(res.metrics),
        "scheduled_urls": int(scheduled),
        "frontier_urls_processed": int(deduped),
        "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(deduped / elapsed, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = float(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1.0"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from go_crawler_spark.session import get_spark

    # NOT pre-touching the heap here (SPARK_GRAFT_PRETOUCH): measured 215 s
    # to fault 16 GiB at session start in the host's slow mode — strictly
    # more fault work than lazy touch (sf0.1 queries use a few GiB), just
    # relocated. The kernel headline is guarded by best-of-2 instead.
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    headline = [
        "q1_pricing_summary",
        "broadcast_dim_join",
        "dedupe_anti_join",
        "politeness_topk_per_host",
        "sessionize",
        "minhash_lsh_candidates",
        "simhash",
        "ann_cosine_topk",
        "quality_score",
        "fingerprint",
        "job_posting_csv",  # composed 26-column scraper pipeline
        "embedding_neardup",  # LSH-bucketed near-dup scale path
        "neardup_components",  # star-contraction dedup clustering
        "ann_lsh_topk",  # the 100 TB ANN shape — regressions must be visible
        "ann_ivf_topk",  # coarse-quantizer ANN scale path
        "phash_neardup",  # banded perceptual-hash image near-dup
        "phash_components",  # image dedup clustering
        "train_mix_sample",  # stratified deterministic sampling
        "pii_scrub",  # regex PII redaction (pure narrow map)
        "boilerplate_strip",  # line-frequency boilerplate removal
        "corpus_keep",  # composed end-to-end corpus-assembly decision
        "decontaminate",  # eval-set n-gram overlap (broadcast probe)
        "gopher_quality_flags",  # integer Gopher rule set (narrow map)
        "video_frame_sample",  # multimodal video → sampled-frame features
        "audio_features",  # multimodal audio → integer clip features
        "robots_parse",
        "stream_windowed_counts",  # structured-streaming representative
        "semantic_dedup",  # SemDeDup cell-cosine gate
        "kmeans_assign",  # Lloyd iteration (broadcast assign + 1 shuffle)
        "dup_ngram_fraction",  # cross-doc duplicated-passage share
        "top_ngram_share",  # within-doc top-2-gram repetition (narrow map)
        "bm25_topk",  # keyword relevance top-k
        "source_mix_weights",  # temperature-resampled data mix
        "url_blocklist_filter",  # broadcast rule gate on the frontier
        "minhash_jaccard_estimate",  # sketch-accuracy audit
        "asof_join",  # point-in-time join (union-window composition)
        "range_join",  # bounded-interval join (bucket binning)
        "link_pagerank",  # iterative frontier-priority PageRank
        "multires_rollup",  # cascading minute→hour→day rollup
        "tile_partial_dup",  # quadrant-hash partial-dup image pairs
        "hll_distinct",  # HyperLogLog distinct sketch (256 registers)
        "cdc_chunk_dedup",  # content-defined-chunking storage dedup
        "ann_pq_adc_topk",  # product-quantization compressed-domain ANN
        "cms_heavy_hitters",  # count-min sketch frequency estimation
        "image_filter_gate",  # metadata-only image curation keep gate
        "seq_pack",  # two-phase prefix-sum context-window packing
        "quantile_sketch",  # mergeable histogram percentiles
        "inverted_index",  # posting-table build (bounded top-k state)
        "payload_header_sniff",  # JVM-only binary header parse
        "sitemap_parse",  # urlset render+parse narrow map
        "refetch_schedule",  # change-rate re-crawl intervals
        "anchor_text_topk",  # per-target anchor aggregation
        "crawl_trap_templates",  # per-template distinct-URL caps
        "tfidf_topk_terms",  # per-doc salient terms (integer idf)
        "host_budget_waterfill",  # max-min fair fetch-slot split
        "frontier_snapshot_diff",  # round-over-round CDC diff
        "ann_matryoshka_topk",  # dimension-cascade ANN scale path
        "domain_quality_gate",  # site-level curation verdict
        "caption_align_gate",  # CLIP-shaped multimodal agreement
        "perplexity_buckets",  # CCNet tercile LM-quality split
        "link_reciprocity",  # link-farm flag (edge-key semi-join)
        "crawl_to_train",  # composed pages→training-shards pipeline
        "exact_substr_coverage",  # duplicated-span union coverage
        "phash_reverse_search",  # multi-index hamming top-k retrieval
        "hits_scores",  # hubs/authorities link analysis
        "opic_importance",  # crawl-native online importance
        "aspect_bucket_pack",  # image-training batch assembly
        "dust_param_rules",  # canonicalize-before-fetch rule mining
        "domain_split",  # leakage-safe train/val/test assignment
        "bpe_top_pairs",  # tokenizer-training first merge
        "ngram_count_of_counts",  # LM smoothing statistics
        "shard_balance",  # token-balanced output shards
        "cocitation_pairs",  # related-page discovery from links
        "winnow_fingerprints",  # MOSS window-min document sketch
        "trustrank",  # seeded anti-spam propagation (Gyöngyi 2004)
        "containment_pairs",  # asymmetric subset-dup detection
        "host_graph_rank",  # uncrawled-URL priority via host supergraph
        "focused_frontier",  # pre-fetch topical priority (Chakrabarti)
        "mirror_hosts",  # replicated-host detection (Bharat-Broder)
        "dedup_best_copy",  # keep the highest-resolution dup-cluster copy
        "crawl_depth",  # BFS hop distance from seeds (Najork-Wiener)
        "spam_url_score",  # lexical pre-fetch spam gate (Ma 2009)
        "fuzzy_decontaminate",  # near-dup eval leakage (MinHash gate)
        "image_decontaminate",  # phash eval leakage (image twin)
        "redirect_resolve",  # 3xx alias resolution (pointer doubling)
        "priority_sample",  # weighted per-source sample (DLT 2007)
        "hll_set_ops",  # two-fleet overlap from mergeable registers
        "good_turing",  # LM discount table off the shared bigram pass
        "phash_dihedral",  # flip/rotation-invariant image dedup
        "phash_threshold_audit",  # precision/recall sweep for the cutoff
        "hrw_shard",  # rendezvous fleet sharding (map-side argmax)
        "heaps_vocab_growth",  # vocabulary-growth curve (tokenizer sizing)
        "postings_delta_bytes",  # gap+varint index size estimate
        "thumb_pyramid",  # multi-resolution image-tower sizing
        "host_skew",  # frontier Gini + top-1% share off the histogram
        "zipf_topk",  # rank x freq constancy over the vocabulary head
        "token_budget_apportion",  # exact largest-remainder quotas
        "cross_source_dup",  # which feeds mirror each other
    ]
    t_all = time.time()
    warmup(spark, sf_dir)
    queries, query_runs = run_registry_queries(spark, sf_dir, headline)

    from go_crawler_spark.crawl.kernelbench import run_kernel

    # Best-of-2: this host shows an episodic ~90%-system-CPU mode (first
    # touch of fresh JVM heap pages faults through the hypervisor) that
    # inflates identical runs 54 s -> 335 s. Run 1 warms the heap and
    # page tables; the best run is the plan's number, and both are
    # reported so the cold mode stays visible.
    kernel_runs = [
        run_kernel(spark, n_rows=int(2_000_000 * scale), n_hosts=500, fanout=6)
        for _ in range(2)
    ]
    # >2× spread between the two runs means the estimator has not
    # converged (the fault storm straddled both samples — measured
    # [172.9, 80.2] vs [17.5, 17.5] for the identical plan an hour
    # apart); one more sample then, all runs still published.
    times = [k["elapsed_sec"] for k in kernel_runs]
    if max(times) > 2 * min(times):
        kernel_runs.append(
            run_kernel(
                spark, n_rows=int(2_000_000 * scale), n_hosts=500, fanout=6
            )
        )
    kernel = min(kernel_runs, key=lambda k: k["elapsed_sec"])
    kernel["elapsed_sec_runs"] = [k["elapsed_sec"] for k in kernel_runs]
    crawl = run_crawl_e2e(spark, scale)
    crawl_pr = run_crawl_e2e(spark, scale, order="pagerank")
    crawl_opic = run_crawl_e2e(spark, scale, order="opic")
    total = round(time.time() - t_all, 2)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    # Full record first (the round artifact BENCH.md reads), then a
    # compact headline-only line LAST: the driver captures only the
    # final ~2000 chars of stdout, and the 60+-query detail line
    # overflowed that window in r4 (BENCH_r04.json parsed: null) — the
    # summary stays well under the window so the headline always parses.
    print(
        json.dumps(
            {
                "metric": "frontier_urls_scheduled_deduped_per_sec",
                "value": kernel["urls_per_sec"],
                "unit": "sec",
                "queries": queries,
                "query_runs": {
                    k: v for k, v in query_runs.items() if len(v) > 1
                },
                "sf": sf,
                "total_sec": total,
                "crawl_round_kernel": kernel,
                "crawl_e2e_bfs": crawl,
                "crawl_e2e_pagerank": crawl_pr,
                "crawl_e2e_opic": crawl_opic,
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    summary = {
        "metric": "frontier_urls_scheduled_deduped_per_sec",
        "value": kernel["urls_per_sec"],
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "total_sec": total,
        "n_queries": len(queries),
        "queries_total_sec": round(sum(queries.values()), 2),
        "crawl_round_kernel": {
            "urls_per_sec": kernel["urls_per_sec"],
            "elapsed_sec_runs": kernel["elapsed_sec_runs"],
        },
        "crawl_e2e_bfs": {
            "urls_per_sec": crawl["urls_per_sec"],
            "elapsed_sec": crawl["elapsed_sec"],
        },
        "crawl_e2e_pagerank": {
            "urls_per_sec": crawl_pr["urls_per_sec"],
            "elapsed_sec": crawl_pr["elapsed_sec"],
        },
        "crawl_e2e_opic": {
            "urls_per_sec": crawl_opic["urls_per_sec"],
            "elapsed_sec": crawl_opic["elapsed_sec"],
        },
    }
    line = json.dumps(summary)
    assert len(line) <= 1500, f"summary line too long ({len(line)} chars)"
    print(line, flush=True)


if __name__ == "__main__":
    main()
