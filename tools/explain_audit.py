"""Physical-plan audit: capture .explain("formatted") for key queries
and assert the plan properties the 100 TB design depends on.

Checks per query (PLANS.md records the evidence):
- parquet scans show pruned ReadSchema (column pruning reached the scan)
- filters on scan columns appear in PushedFilters (predicate pushdown)
- dim joins are BroadcastHashJoin (no shuffle of the fact side)
- aggregations are partial+final HashAggregate pairs (map-side combine)
- no CartesianProduct anywhere; BroadcastNestedLoopJoin only where the
  operator is a contains-join against a 47-row dim (location_parse)

Usage: python tools/explain_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_crawler_spark.registry import REGISTRY  # noqa: E402
from go_crawler_spark.session import get_spark  # noqa: E402

AUDITED = {
    # name -> (must_contain, must_not_contain)
    "q1_pricing_summary": (
        ["HashAggregate", "IsNotNull(l_shipdate)", "Scan parquet"],
        ["CartesianProduct"],
    ),
    "broadcast_dim_join": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct"],
    ),
    "dedupe_anti_join": (
        ["LeftAnti", "EqualTo(c_mktsegment,BUILDING)"],
        ["CartesianProduct"],
    ),
    "politeness_topk_per_host": (
        ["Window", "row_number"],
        ["CartesianProduct"],
    ),
    "pagination_expand": (
        ["Generate", "Scan parquet"],
        ["Exchange"],  # pure narrow pipeline: no shuffle at all
    ),
    "salary_parse": (
        ["Project", "Scan parquet"],
        ["Exchange", "CartesianProduct"],  # pure projection, no shuffle
    ),
    "top_ngram_share": (
        ["MapInPandas", "Scan parquet"],
        # the within-doc rule is an Arrow-batched per-doc argmax — a
        # per-doc statistic must never shuffle the corpus
        ["Exchange", "CartesianProduct"],
    ),
    "location_parse": (
        ["BroadcastNestedLoopJoin"],  # contains-join vs 47-row dim: expected
        ["CartesianProduct"],
    ),
    "asof_join": (
        # the union-window as-of composition: ONE shuffle + window, and
        # no join operator of any kind may appear
        ["Window", "Exchange"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "BroadcastHashJoin", "ShuffledHashJoin"],
    ),
    "range_join": (
        # bounded-interval binning: the containment predicate must ride
        # a bucket equi-join, never a nested-loop theta join
        ["Join"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "metrics_rollup": (
        ["HashAggregate"],
        ["CartesianProduct"],
    ),
    # similarity scale paths: all must be bucket equi-joins (hash join on
    # band/bucket keys), never an all-pairs product. The residual
    # non-equi parts (Hamming/img_id ordering, cosine rerank) must ride
    # the hash join as a post-condition, not force a nested loop.
    "phash_neardup": (
        # Window = hot-bucket cap guard, same hygiene as minhash
        ["Window", "BroadcastHashJoin", "bit_count"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    "minhash_lsh_candidates": (
        ["Window", "BroadcastHashJoin"],  # Window = hot-bucket cap guard
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "embedding_neardup": (
        ["BroadcastHashJoin", "zip_with"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "ann_lsh_topk": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # IVF: the K-row centroid cross is a broadcast NLJ by design (like
    # location_parse's 47-row dim); assignment must partial-aggregate
    # before any shuffle. max_by over a lexicographic struct plans as a
    # partial+final SortAggregate pair (struct ordering is not
    # hash-aggregable) — map-side combine is the property that matters,
    # and the partial sort's input arrives clustered by vec_id (the
    # centroid cross emits K consecutive rows per vector).
    "ann_ivf_topk": (
        ["BroadcastHashJoin", "SortAggregate", "partial_max_by"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # pure narrow pipeline: scan → synth kernel → sample kernel, no
    # shuffle anywhere; pixels never surface to the JVM between stages
    "video_frame_sample": (
        ["MapInPandas", "Scan parquet"],
        ["Exchange", "CartesianProduct"],
    ),
    # components: the returned plan is docs ⟕ final-star (the star comes
    # out of the last contraction checkpoint; each contraction round is
    # its own equi-join-only job). Nothing here may nested-loop.
    "neardup_components": (
        ["Scan parquet"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "phash_components": (
        ["MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # stratified sample: pure narrow map over the scan — the integer
    # hash gate and rate lookup must not introduce any shuffle
    "train_mix_sample": (
        ["Filter", "Scan parquet"],
        ["Exchange", "CartesianProduct"],
    ),
    # PII scrub: regex redaction is a narrow codegen map, no shuffle
    "pii_scrub": (
        ["Project", "Scan parquet"],
        ["Exchange", "CartesianProduct"],
    ),
    # boilerplate: two-pass line-frequency scheme — the df agg and the
    # line join are hash-keyed; the 1-row corpus count is broadcast
    "boilerplate_strip": (
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # composed corpus gate: the exact-dedup window (shuffle on text) and
    # the components join are the only wide ops; lang/quality/sample fuse
    # into the same narrow stage, nothing may nested-loop, and the
    # exact-keeper window must partition on xxhash64(text) — the raw
    # corpus text may never be an Exchange key
    "corpus_keep": (
        ["Window", "Scan parquet", "xxhash64"],
        [
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "hashpartitioning(text",
        ],
    ),
    # crawl→train composition: the caption-dedup window shuffles on the
    # 8-byte cap_key, the packing stage is windows + a broadcast bucket-
    # offset join — nothing may nested-loop or sort globally
    "crawl_to_train": (
        ["Window", "MapInPandas", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "Exchange rangepartitioning"],
    ),
    # tokenizer count + Gopher rules: pure narrow codegen maps, no shuffle
    "token_count_bpe": (
        ["Project", "Scan parquet"],
        ["Exchange", "CartesianProduct"],
    ),
    "gopher_quality_flags": (
        ["Project", "Scan parquet"],
        ["Exchange", "CartesianProduct"],
    ),
    # decontamination: eval shingle set broadcast, corpus side probes
    # map-side; the only shuffle is the per-doc hit-count re-aggregation
    "decontaminate": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin"],
    ),
    # semantic dedup: the pivot cross is a broadcast NLJ by design (tiny
    # centroid dim, like ann_ivf_topk); the within-cell pair join must be
    # a cell-keyed equi-join (SMJ/shuffle-hash — both sides are corpus-
    # sized at 100 TB), never an all-pairs product
    "semantic_dedup": (
        ["BroadcastNestedLoopJoin", "SortAggregate"],
        ["CartesianProduct"],
    ),
    # k-means: broadcast centroid assign (NLJ on the tiny dim) + ONE
    # shuffle per iteration for the (cell, pos) mean — no product
    "kmeans_assign": (
        ["BroadcastNestedLoopJoin", "HashAggregate"],
        ["CartesianProduct"],
    ),
    # BM25: corpus stats reduce to one broadcast row (NLJ against a
    # 1-row dim is a pass-through); top-k must be TakeOrderedAndProject
    # (parallel partial top-k), never a single-partition global sort
    "bm25_topk": (
        ["TakeOrderedAndProject", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # duplicated-passage share: both shuffles keyed on the shingle hash /
    # doc_id; the df table is pre-aggregated so the probe is an equi-join
    "dup_ngram_fraction": (
        ["HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # source mix: two tiny aggregates + 1-row broadcast crosses only
    "source_mix_weights": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # blocklist: the rule gate is a broadcast NLJ against the ~25-row
    # rule dim by design (prefix predicate can't equi-join); the verdict
    # join back to the frontier is a key equi-join
    "url_blocklist_filter": (
        ["BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    # PageRank: per-iteration rank attach + dst aggregation are long-
    # keyed equi-joins/aggregates; the only NLJ is the 1-row n_nodes
    # broadcast (a pass-through, like bm25's stats row). Nothing may
    # plan an all-pairs product.
    "link_pagerank": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct"],
    ),
    # HITS: same shape as PageRank — per-round src/dst-keyed equi-joins
    # and aggregates over (long, long) rows; the ℓ¹ totals are 1-row
    # broadcast pass-throughs. Nothing may plan an all-pairs product.
    "hits_scores": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct"],
    ),
    # OPIC: PageRank's iteration shape (src-join + dst-agg per round);
    # the dangling pot and node count ride 1-row broadcast aggregates
    # (BroadcastNestedLoopJoin over exactly one row is that broadcast,
    # not an all-pairs product — same as pagerank's n_nodes attach).
    "opic_importance": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct"],
    ),
    # aspect bucketing: the bucket argmin must stay a map-side fold —
    # no join for the 9-literal ladder; the only Exchanges key on
    # (bucket, chunk) for the two-phase prefix sum; offsets/totals
    # broadcast back.
    "aspect_bucket_pack": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # DUST rule mining: parse + 3-way explode are narrow (Generate);
    # two hash aggregations (per-bucket distincts, per-host-param
    # verdicts) and nothing else — no join of any kind.
    "dust_param_rules": (
        ["Generate", "HashAggregate", "Exchange"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # leakage-safe split: a pure narrow map — no Exchange anywhere
    "domain_split": (
        ["Project"],
        ["Exchange", "CartesianProduct"],
    ),
    # BPE candidates: words explode map-side (Generate), one corpus
    # shuffle to the word table, pair ranking over pre-aggregated rows
    "bpe_top_pairs": (
        ["Generate", "HashAggregate", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # count-of-counts: two counting aggregations, no join, no window
    "ngram_count_of_counts": (
        ["Generate", "HashAggregate", "Exchange"],
        ["CartesianProduct", "Window", "SortMergeJoin"],
    ),
    # shard balance: the single-task window runs on the small
    # (n_tokens, chunk) cell table only; doc rows rank within cells
    # and join offsets by broadcast — never a global range sort
    "shard_balance": (
        ["Window", "BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin", "Exchange rangepartitioning"],
    ),
    # co-citation: pairs expand WITHIN each citer's capped out-link
    # array (Generate over ≤ C(8,2) structs per citer — never a
    # self-join of the edge table on the Spark side) then one
    # pair-keyed count. The one BroadcastNestedLoopJoin is link_edges'
    # 1-row n_nodes attach (the intended broadcast, as in the other
    # linkgraph plans), so only true all-pairs shapes are forbidden.
    "cocitation_pairs": (
        ["Window", "Generate", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # exact-substring coverage: positional span hashes come from the
    # Arrow-batched rolling-hash kernel (MapInPandas — token text never
    # leaves the scan partition); the occurrence groupBy and the
    # join-back probe both key on the 8-byte hash; the interval union
    # is a per-doc Window. No nested loop anywhere.
    "exact_substr_coverage": (
        ["MapInPandas", "HashAggregate", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # winnowing fingerprints: span hashes from the same rolling-hash
    # kernel as exact_substr (MapInPandas — text never leaves the
    # scan); everything after rides ONE doc_id Exchange — the count /
    # window-min / lag-dedup are all Windows over that partitioning, so
    # no aggregate, no join, and no second shuffle of any kind
    "winnow_fingerprints": (
        ["MapInPandas", "Window"],
        [
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "SortMergeJoin",
            "HashAggregate",
            "Exchange rangepartitioning",
        ],
    ),
    # TrustRank: PageRank's plan shape — per-round trust attach + dst
    # aggregation are long-keyed equi-joins/aggregates over the
    # combined organic+farm edge table; the only NLJ-ish pieces are
    # the 1-row n_nodes/fstats broadcasts. No all-pairs product.
    "trustrank": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct"],
    ),
    # containment: the capped-LSH candidate equi-join (band kernel +
    # hot-bucket Window) plus two doc_id equi-joins attaching shingle
    # arrays to candidate rows — never an all-pairs product
    "containment_pairs": (
        ["MapInPandas", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # fuzzy decontamination: the shared capped-LSH candidate join
    # (band kernel + hot-bucket Window) plus doc_id/band_id equi-joins
    # attaching the band-key signature positions to candidate rows
    # only; the best-eval pick is a doc_id-keyed Window. Never an
    # all-pairs product.
    "fuzzy_decontaminate": (
        ["MapInPandas", "Window"],
        ["CartesianProduct"],
    ),
    # image decontamination: the shared capped phash-band equi-join
    # (synth kernel + hot-bucket Window) restricted to cross-split
    # pairs; the closest-eval pick is an img_id-keyed Window. Pixels
    # never shuffle; never an all-pairs product.
    "image_decontaminate": (
        ["MapInPandas", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # lexical URL spam gate: every feature is a JVM string expression
    # over the synthesized URL — a pure narrow map, no Exchange at any
    # corpus size (domain_split's plan class)
    "spam_url_score": (
        ["Project"],
        ["Exchange", "CartesianProduct"],
    ),
    # BFS crawl depth: DEPTH_MAX unrolled set-expansion rounds — each
    # an src-keyed equi-join + DISTINCT + anti-join over (long, long)
    # rows. The per-hop localCheckpoints truncate the visible lineage
    # (each level shows as Scan ExistingRDD), so the final plan to
    # assert on is the Union of levels left-joined to the node scan —
    # long-keyed, never an all-pairs product.
    "crawl_depth": (
        ["Union", "Exchange"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # best-copy keeper: the phash components pass (MapInPandas corpus
    # synth + star contraction) feeding one component-keyed Window
    # argmax; dims are a narrow integer projection. Never a product.
    "dedup_best_copy": (
        ["Window", "MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # mirror hosts: bottom-k sketch (host-keyed Window) → hot-fp cap
    # (fp-keyed Window) → fp equi-join pairing → host equi-joins for
    # the sketch sizes. Never a host×host product, never an NLJ (no
    # 1-row broadcast in this plan at all).
    "mirror_hosts": (
        ["Window", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # host-graph rank: PageRank's plan shape run over the contracted
    # host node set — per-round rank attach + dst aggregation are
    # long-keyed equi-joins/aggregates; the contraction itself is a
    # narrow floor-division projection (no extra shuffle beyond the
    # host-distinct). Only the 1-row n_nodes broadcast is NLJ-ish.
    "host_graph_rank": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct"],
    ),
    # focused frontier: one map-side per-edge derivation + one
    # partial-aggregated groupBy(dst) — a single long-keyed Exchange;
    # no row-level join may appear (the n_nodes attach is the 1-row
    # broadcast, as in pagerank).
    "focused_frontier": (
        ["HashAggregate", "Exchange"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # reverse image search: corpus band rows get the same hot-bucket
    # Window cap as phash_neardup; the query probe is a hash equi-join
    # on (band_id, band_val); the rerank is codegen'd bit_count; the
    # per-query top-k is a Window, never a global sort
    "phash_reverse_search": (
        ["Window", "BroadcastHashJoin", "bit_count"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # cascading rollup: three partial+final hash aggregates, each
    # coarser grain fed by the finer one — no join of any kind
    "multires_rollup": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # tile partial-dup: same banded-join hygiene as phash_neardup —
    # Window = hot-bucket cap, join must be a hash equi-join on the
    # (tile_id, tile_phash) key, never a product
    "tile_partial_dup": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # HLL: narrow hash map → ≤256-row partial+final aggregate; the
    # 1-row exact-audit cross is a broadcast pass-through
    "hll_distinct": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # CDC: bytes live and die inside the Arrow kernel — only 8-byte
    # chunk ids shuffle; df groupBy + equi-join + per-doc aggregate
    "cdc_chunk_dedup": (
        ["MapInPandas", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # PQ-ADC ANN: codebook and query LUT are broadcast equi-joins; the
    # encode min_by and ADC sum are partial+final hash aggregates; the
    # per-query top-k is a Window partitioned on query_id. Nothing may
    # plan an all-pairs product over the corpus.
    "ann_pq_adc_topk": (
        ["BroadcastHashJoin", "HashAggregate", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # count-min heavy hitters: sketch build collapses to ≤ d·w rows via
    # partial+final aggregate; probe joins the broadcast sketch; the
    # top-k cut must be TakeOrderedAndProject (parallel partial top-k)
    "cms_heavy_hitters": (
        ["TakeOrderedAndProject", "BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # image curation gate: one Arrow fetch kernel, then pure JVM rule
    # expressions — no join, no aggregate, no shuffle of any kind
    "image_filter_gate": (
        ["MapInPandas"],
        ["Exchange", "CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin"],
    ),
    # sequence packing: the whole point is NO single-partition global
    # window — the bucket offsets broadcast back and the row-level
    # window is partitioned by bucket
    "seq_pack": (
        ["BroadcastHashJoin", "Window", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # quantile sketch: one ≤256-row partial+final aggregate off the
    # scan; everything after runs on sketch-sized frames (the coverage
    # probe is a broadcast range-join — a BNLJ over ≤256×3 rows is the
    # intended plan, not a scale bug)
    "quantile_sketch": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # inverted index: posting-head rank must be a Window (spillable
    # sort), never an unbounded per-term collect_list; both aggregates
    # key on the term
    "inverted_index": (
        ["Window", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # header sniff: one Python stage (payload synth only), then pure
    # JVM expressions — the parse itself must not shuffle or re-enter
    # Python (exactly one MapInPandas in the plan)
    "payload_header_sniff": (
        ["MapInPandas"],
        ["Exchange", "CartesianProduct", "SortMergeJoin"],
    ),
    # sitemap ingestion: render + regexp-parse are one narrow map —
    # the XML body must never cross an Exchange
    "sitemap_parse": (
        ["Project", "Scan parquet"],
        ["Exchange", "CartesianProduct", "SortMergeJoin"],
    ),
    # re-fetch scheduling: exactly one partial+final aggregate keyed
    # on the 8-byte url id, then a narrow clamp projection
    "refetch_schedule": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin",
         "Window"],
    ),
    # anchor-text top-k: the rank Window must sit on PRE-AGGREGATED
    # (dst, anchor) counts (HashAggregate before it), never raw edges
    "anchor_text_topk": (
        ["HashAggregate", "Window", "row_number"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # crawl-trap profiling: template normalization is map-side; the
    # only shuffle keys on (host, template) with partial aggregation —
    # raw URLs never rank through a Window
    "crawl_trap_templates": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"],
    ),
    # tf-idf top-k: the df side joins back PRE-AGGREGATED by term and
    # the rank Window partitions per-doc rows bounded by distinct-term
    # count — no cross product, no unbounded collect state
    "tfidf_topk_terms": (
        ["HashAggregate", "Window", "row_number"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # waterfill: demand is a partial-agg groupBy; the cumulative Window
    # runs on the demand HISTOGRAM (+virtual zero row) and the level
    # joins back as a broadcast one-row side — per-host rows are never
    # globally sorted (no SortMergeJoin, no per-host Window)
    "host_budget_waterfill": (
        ["HashAggregate", "Window", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # snapshot diff: one full-outer equi-join on the 8-byte url key;
    # membership/status rules are map-side projections
    "frontier_snapshot_diff": (
        ["FullOuter"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"],
    ),
    # Matryoshka cascade: coarse pass streams the corpus against
    # broadcast queries (BNLJ on the tiny side is the sanctioned
    # broadcast cross); the rerank must be a broadcast hash join on
    # vec_id — never a corpus shuffle (no SortMergeJoin anywhere)
    "ann_matryoshka_topk": (
        ["BroadcastHashJoin", "Window", "row_number"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # domain gate: quality is computed pre-shuffle (text stays in its
    # scan partition); only (host, ints) aggregate, verdict broadcast
    # back — no sort join, no window
    "domain_quality_gate": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin", "Window"],
    ),
    # caption alignment: token hashing is map-side; aggregates key on
    # (doc_id, dim) then (doc_id) — int sums only, embedding arrays
    # ride one equi-join, raw text never shuffles, no window/cross
    "caption_align_gate": (
        ["HashAggregate"],
        ["CartesianProduct", "Window"],
    ),
    # perplexity terciles: the only Window runs on the doc-mean
    # HISTOGRAM (bounded distinct values); thresholds broadcast back
    # as a one-row side — documents are never globally sorted (the
    # tf⋈df term join may legitimately sort-merge on the term key)
    "perplexity_buckets": (
        ["HashAggregate", "Window"],
        ["CartesianProduct"],
    ),
    # reciprocity: the self-probe must be a LeftSemi on the 16-byte
    # edge key (first match discards the probe) — never a window,
    # never an unbounded join multiplying edge rows
    "link_reciprocity": (
        ["LeftSemi", "HashAggregate"],
        ["CartesianProduct", "Window"],
    ),
    # redirect resolution: REDIR_ROUNDS pointer-doubling self-joins on
    # the 8-byte ptr key, per-round state three longs per URL. The
    # per-round localCheckpoints truncate lineage (rounds show as Scan
    # ExistingRDD); the visible plan is the final long-keyed equi-join
    # — never a window, never an all-pairs product.
    "redirect_resolve": (
        ["Exchange"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"],
    ),
    # priority sampling: the corpus-wide window is SALTED — partitioned
    # on (source, doc_id%PRIO_SALT) — and the unsalted per-source
    # window only sees the ≤ PRIO_SALT·(k+1) survivors; no global
    # sort, no product.
    "priority_sample": (
        ["Window", "row_number"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # HLL set ops: each shard sketch is a partial+final HashAggregate
    # over hashed keys; the union merges ≤512 register ROWS; the final
    # one-row estimate/exact crosses are sanctioned broadcast NLJs.
    # Raw keys never ride a Window and nothing cross-products.
    "hll_set_ops": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin", "Window"],
    ),
    # Good-Turing: the corpus pass is the shared bigram-count
    # HashAggregate; ALL discount math joins the ≤8-row grid to the
    # N_r table as broadcast hash joins (plus the one-row totals
    # cross) — the corpus never re-shuffles for the grid.
    "good_turing": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin", "Window"],
    ),
    # dihedral phash: pixels decode in one Arrow-batched map; the only
    # shuffle keys on the 8-byte canonical hash (group sizes), joined
    # back broadcast — no window, no product, pixels never shuffle.
    "phash_dihedral": (
        ["MapInPandas", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "Window"],
    ),
    # threshold audit: banded candidates ride hash joins with the
    # hot-bucket cap Window (same hygiene as phash_neardup); the
    # 17-row threshold grid and one-row truth total are sanctioned
    # broadcast NLJ crosses. Nothing sort-merges or cross-products.
    "phash_threshold_audit": (
        ["MapInPandas", "BroadcastHashJoin", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # HRW sharding: one distinct-host HashAggregate, then the packed
    # rendezvous argmax is a pure map (array_max over a sequence
    # literal) — no join of any kind, no window, no product.
    "hrw_shard": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "Window"],
    ),
    # Heaps' curve: the corpus shuffle is the token-keyed min-bucket
    # HashAggregate (map-side partial agg first); the max-doc-id row
    # is a sanctioned one-row broadcast cross; the cumulative window
    # runs over ten bucket rows. Nothing sort-merges or products.
    "heaps_vocab_growth": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # postings varint sizing: distinct postings + per-term lag window
    # + per-term aggregate all key on the term (one Exchange, reused);
    # no join of any kind — never a product or a global sort.
    "postings_delta_bytes": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # pyramid sizing: dims decode in one Arrow-batched map; every
    # level/byte column is a narrow JVM expression — no join, no
    # shuffle of any kind, no window.
    "thumb_pyramid": (
        ["MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "Window", "Exchange"],
    ),
    # host-skew audit: the only corpus-sized shuffle is the host-key
    # demand HashAggregate; the Gini/top-share windows run over the
    # DISTINCT-DEMAND histogram (the waterfill trick — never a
    # per-host sort) and the one-row totals crosses are sanctioned
    # broadcast NLJs. Nothing sort-merges or cross-products.
    "host_skew": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # Zipf head: term frequencies are the one token-keyed
    # HashAggregate; the head is TakeOrderedAndProject (per-partition
    # top-K, never a global sort materialization); the rank window
    # and the one-row f1 broadcast cross run over ≤ K rows.
    "zipf_topk": (
        ["HashAggregate", "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # apportionment: one corpus pass (source-keyed HashAggregate);
    # the quota/remainder windows and one-row crosses run over
    # n_sources rows — sanctioned broadcast NLJs only.
    "token_budget_apportion": (
        ["HashAggregate", "Window"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # cross-source dup: distinct (key, source) with map-side partial
    # agg, then a key-keyed self-equi-join whose per-key fanout is
    # bounded by source cardinality — never a product, never a window.
    "cross_source_dup": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"],
    ),
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def exchanged_columns(plan: str) -> set[str]:
    """Column names that flow through any Exchange node (the shuffled
    payload). Parses formatted-explain sections: '(n) Exchange' followed
    by 'Input [k]: [col#id, ...]'."""
    import re

    cols: set[str] = set()
    sections = re.split(r"\n\(\d+\) ", plan)
    for sec in sections:
        if not sec.startswith("Exchange"):
            continue
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
        if m:
            for c in m.group(1).split(","):
                cols.add(c.strip().split("#")[0])
    return cols


def audit_engine_round() -> int:
    """Plan assertions for the engine's per-round DAG (VERDICT r1 #7):
    the structural answer to 'does the round survive 100×' —
    politeness dequeue stays a window (no global sort), the fetch join
    broadcasts the politeness-bounded side, payload BYTES never enter
    an Exchange, and the exact dedupe check is broadcast semi/anti (the
    frontier side is scanned, never shuffled)."""
    from go_crawler_spark.crawl import corpus as corpus_mod
    from go_crawler_spark.crawl.config import CorpusSpec, CrawlConfig
    from go_crawler_spark.crawl.engine import CrawlEngine
    from go_crawler_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("explain_audit_engine", cpus=4, shuffle_partitions=4)
    spec = CorpusSpec(n_hosts=3, lists_per_host=2, pages_per_list=3,
                      details_per_page=6)
    cfg = CrawlConfig(round_seconds=60.0, per_page=6, max_rounds=4)
    corpus_df = corpus_mod.build_corpus(spark, spec)
    robots_df = corpus_mod.build_robots(spark, spec, cfg.disallow, cfg.allow)
    eng = CrawlEngine(spark, cfg, corpus_df, robots_df)
    pending = eng.frontier_from_seeds(corpus_mod.seeds(spec))
    seen_hashes = pending.select("url_hash")

    # stage frames exactly as run_round composes them (lazy, no actions)
    dequeued = eng._dequeue(pending.filter(F.col("status") == "PENDING")).select(
        "url_hash", "url", "host", "depth", "seq_path"
    )
    # order='pagerank' dequeue: the rank table joins by url_hash as a
    # BROADCAST (no extra Exchange beyond the politeness window's own)
    ranks = pending.select("url_hash", F.lit(1).cast("long").alias("pr"))
    pr_dequeued = eng._dequeue(
        pending.filter(F.col("status") == "PENDING"), ranks
    ).select("url_hash", "url", "priority")
    corpus_meta = corpus_df.select(
        "url_hash", "kind", "next_url", "total_count", "outlinks", "fetch_ok"
    )
    hit = corpus_meta.join(F.broadcast(dequeued), "url_hash", "inner")
    payload = corpus_df.join(
        F.broadcast(dequeued.select("url_hash", "depth")), "url_hash", "inner"
    ).filter(
        F.col("fetch_ok") & (F.col("kind") == "detail") & F.col("bytes").isNotNull()
    ).select("url_hash", "url", "depth", "image_id", "bytes", "caption", "phash")
    flagged = eng._discover(hit.filter(F.col("fetch_ok") & (F.col("kind") == "list")))
    allowed = flagged.filter(~F.col("robots_reject")).drop("robots_reject")
    fresh = eng.dedupe_new(allowed, seen_hashes, bloom=None, round_no=0)
    pending_update = pending.join(
        F.broadcast(dequeued.select("url_hash")), "url_hash", "left_anti"
    ).unionByName(fresh)

    stages = {
        "round_dequeue": (
            dequeued,
            ["Window"],
            ["CartesianProduct", "BroadcastNestedLoopJoin", "Sort [", "Exchange rangepartitioning"],
        ),
        "round_dequeue_pagerank": (
            pr_dequeued,
            ["Window", "BroadcastHashJoin"],
            ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
             "Exchange rangepartitioning"],
        ),
        "round_fetch_join": (
            hit,
            ["BroadcastHashJoin"],
            ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin"],
        ),
        "round_payload_decode_side": (
            payload,
            ["BroadcastHashJoin"],
            ["CartesianProduct", "SortMergeJoin"],
        ),
        "round_dedupe_fresh": (
            fresh,
            ["BroadcastHashJoin", "LeftSemi", "LeftAnti"],
            ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        ),
        "round_pending_update": (
            pending_update,
            ["BroadcastHashJoin", "LeftAnti"],
            ["CartesianProduct", "SortMergeJoin"],
        ),
        # broadcast_fetch=False fallback: dequeue too large to broadcast
        # → shuffle equi-join on url_hash (AQE splits skewed partitions).
        # The audit corpus is tiny, so Catalyst would auto-broadcast it;
        # the shuffle_hash hint emulates the at-scale statistics where
        # neither side fits the broadcast threshold.
        "round_fetch_join_shuffle_fallback": (
            corpus_meta.join(dequeued.hint("shuffle_hash"), "url_hash", "inner"),
            ["ShuffledHashJoin", "Exchange"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
    }
    failures = 0
    print("\n# Engine round plans (run_round stages, lazily composed)\n")
    for name, (df, must, must_not) in stages.items():
        plan = plan_of(df)
        problems = [f"MISSING: {frag!r}" for frag in must if frag not in plan]
        problems += [
            f"FORBIDDEN PRESENT: {frag!r}" for frag in must_not if frag in plan
        ]
        if name == "round_payload_decode_side" and "bytes" in exchanged_columns(plan):
            problems.append("FORBIDDEN: payload `bytes` column crosses an Exchange")
        status = "OK" if not problems else "FAIL"
        failures += bool(problems)
        print(f"## {name} — {status}\n")
        for p in problems:
            print(f"- **{p}**")
        head = "\n".join(plan.splitlines()[:40])
        print(f"\n```\n{head}\n```\n")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit", cpus=4, shuffle_partitions=4)
    failures = 0
    print("# PLANS — physical-plan audit (generated by tools/explain_audit.py)\n")
    print(f"Input: `{sf_dir}`. Assertions: see tool header.\n")
    for name, (must, must_not) in AUDITED.items():
        fn, _ = REGISTRY[name]
        plan = plan_of(fn(spark, sf_dir))
        problems = []
        for frag in must:
            if frag not in plan:
                problems.append(f"MISSING: {frag!r}")
        for frag in must_not:
            if frag in plan:
                problems.append(f"FORBIDDEN PRESENT: {frag!r}")
        status = "OK" if not problems else "FAIL"
        if problems:
            failures += 1
        print(f"## {name} — {status}\n")
        for p in problems:
            print(f"- **{p}**")
        # keep the physical-plan header section only (first ~40 lines)
        head = "\n".join(plan.splitlines()[:60])
        print(f"\n```\n{head}\n```\n")
    failures += audit_engine_round()
    n_engine_stages = 6
    total = len(AUDITED) + n_engine_stages
    print(f"\n_{total - failures}/{total} plans clean._", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
