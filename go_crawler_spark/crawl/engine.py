"""The crawl engine: one DataFrame iteration per round (north rule core).

Re-expresses the reference's generate+execute loops
(/root/reference/internal/usecase/crawler.go:79-114, 606-699) as the
per-round DAG of SURVEY.md §3.2/§4:

    pending ⟵ frontier (merge-on-read status)
    → broadcast-join robots (budget)
    → salted two-phase per-host top-k (politeness dequeue, F2)
    → shuffle-join corpus on url_hash (the "fetch", A9; AQE skew-aware)
    → decode_verify mapInPandas (payload invariant, E18 — kernel #3)
    → posexplode outlinks + next-link + total-count pagination (B4-B7)
    → canonicalize kernel (B2+E4 — kernel #1)
    → first-writer-wins batch collapse (D3) → Bloom prefilter (kernel #2)
    → exact broadcast semi/anti vs the seen set (D1; the frontier is
      only scanned map-side, never shuffled) → checkpoint the fresh
      increment; the run loop updates the live queue + status log
    → metrics row; atomic round commit (store mode)

Exactly three Python kernels run per round, all Arrow-batched; every
other operator is native Catalyst (codegen'd regex/when/window/join).

Determinism: the dequeue order and discovery order derive ONLY from
data — ``(depth, seq_path)`` where seq_path is assigned from
(seed_idx, link_idx) at discovery (SURVEY.md §4.4). Task retries and
partition shuffles cannot change the trace.

Skew (§4.2): the per-host politeness window would hot-spot on power-law
hosts, so the top-k is two-phase — rank within (host, salt) keeping
≤ budget per salt bucket (local prune, bounds any partition to
salt_buckets × budget rows), then rank the survivors within host. Same
result set as a single global window, bounded partitions at any scale.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field, replace

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_crawler_spark.crawl import codec
from go_crawler_spark.crawl.bloom import BloomShards
from go_crawler_spark.crawl.canonicalize import canon_url, canonicalize_batch
from go_crawler_spark.crawl.config import CrawlConfig, CorpusSpec
from go_crawler_spark.crawl.corpus import seeds as corpus_seeds
from go_crawler_spark.crawl.store import SnapshotStore

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq_path", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),  # birth round (lineage)
        T.StructField("priority", T.DoubleType(), False),
    ]
)

_CANON_OUT = T.StructType(
    [
        T.StructField("base_url", T.StringType()),  # discovering page
        # (kept through canonicalization so order='pagerank' can record
        # the (base → child) edge; dropped before the frontier append)
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq_path", T.StringType()),
    ]
)

_VERIFY_OUT = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("phash_dist", T.IntegerType()),
    ]
)


def _decode_verify(batches):
    """Kernel #3: decode payload, verify vs regenerated ground truth.

    PSNR≥40 dB for lossy fmt, bit-exact for png; caption equality;
    phash hamming distance (input_hint invariant)."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in (
            "url_hash", "url", "host", "depth", "image_id", "w", "h", "fmt",
            "caption", "phash", "decode_ok", "pixels_ok", "psnr_db",
            "caption_ok", "phash_dist",
        )}
        for row in pdf.itertuples(index=False):
            decode_ok, pixels_ok, caption_ok = False, False, False
            psnr_db, phash_dist = 0.0, 64
            try:
                decoded, fmt = codec.decode(row.bytes)
                decode_ok = True
                truth = codec.truth_pixels(row.image_id)
                p = codec.psnr(decoded, truth)
                psnr_db = min(float(p), 99.0)
                # psnr == inf ⟺ zero SSE ⟺ bit-exact, so the png
                # equality check rides the same pass (no array_equal)
                pixels_ok = bool(
                    p == float("inf") if fmt == "png" else p >= 40.0
                )
                caption_ok = row.caption == codec.truth_caption(row.image_id)
                d = codec.phash64(decoded) ^ row.phash
                phash_dist = bin(d & ((1 << 64) - 1)).count("1")
            except Exception:  # noqa: BLE001 — malformed payload → not ok
                pass
            for k in ("url_hash", "url", "host", "depth", "image_id", "w", "h",
                      "fmt", "caption", "phash"):
                out[k].append(getattr(row, k))
            out["decode_ok"].append(decode_ok)
            out["pixels_ok"].append(pixels_ok)
            out["psnr_db"].append(psnr_db)
            out["caption_ok"].append(caption_ok)
            out["phash_dist"].append(phash_dist)
        yield pd.DataFrame(out)


def _tlog(label: str, t0: float) -> float:
    """Per-action wall timing, enabled with GCS_TIMING=1 (perf triage)."""
    if os.environ.get("GCS_TIMING"):
        print(f"GCS_T {label}: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)
    return time.time()


@dataclass
class RoundStats:
    round: int
    dequeued: int
    success: int
    failed: int
    robots_skipped: int
    dedup_skipped: int
    enqueued: int


@dataclass
class CrawlResult:
    frontier: DataFrame
    trace: DataFrame  # dequeue log: (round, pos-orderable), the crawl order
    pages: DataFrame | None
    metrics: list[RoundStats] = field(default_factory=list)
    order: str = "bfs"  # the run's crawl-order mode (cfg.order)

    def ordered_trace(self) -> DataFrame:
        """Total crawl order with a dense ``pos`` column.

        Scale-safe: ranks WITHIN each round (parallel window over the
        round partitions) and adds driver-side cumulative round offsets
        — rounds are few, rows are many, so no single-task global sort
        (the r1 version's unpartitioned Window.orderBy)."""
        counts = {
            r["round"]: r["count"]
            for r in self.trace.groupBy("round").count().collect()
        }
        off, offsets = 0, {}
        for rnd in sorted(counts):
            offsets[rnd] = off
            off += counts[rnd]
        if not offsets:
            return self.trace.withColumn("pos", F.lit(0))
        omap = F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
        if self.order in ("priority", "pagerank", "opic"):
            # rank-order traces record the rank-in-force at dequeue
            # time in the priority column, so the same key totalizes all
            key = [F.col("priority").desc(), F.col("depth"), F.col("seq_path")]
        else:
            key = [F.col("depth"), F.col("seq_path")]
        w = Window.partitionBy("round").orderBy(*key)
        return (
            self.trace.withColumn("rk", F.row_number().over(w))
            .withColumn(
                "pos",
                (F.col("rk") - 1 + omap[F.col("round")]).cast("int"),
            )
            .drop("rk")
        )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        corpus_df: DataFrame,
        robots_df: DataFrame,
        store: SnapshotStore | None = None,
        payload_df: DataFrame | None = None,
    ):
        """``payload_df`` optionally separates the payload-bytes access
        path from the metadata table (production shape: metadata in a
        columnar table whose scans column-prune; payloads fetched from
        a blob/page store). Defaults to ``corpus_df`` — one table serving
        both, with Parquet column pruning doing the separation."""
        self.spark = spark
        self.cfg = cfg
        self.robots = robots_df
        self.store = store
        self.payload = payload_df if payload_df is not None else corpus_df
        # budget per host, computed once (floor semantics, CrawlConfig.budget)
        self.budgets = F.broadcast(
            robots_df.select(
                "host",
                "disallow",
                "allow",
                F.greatest(
                    F.lit(1),
                    F.floor(F.lit(cfg.round_seconds) / F.col("crawl_delay")),
                ).cast("int").alias("budget"),
            )
        )
        # fetch side: corpus projected to what the round needs; `bytes`
        # stays prunable until the verify stage (C8 — the Spark analog of
        # the reference's browser resource blocking)
        self.corpus = corpus_df

    def config_lineage(self) -> DataFrame:
        """One constant row of fetch-client lineage (C9): the custom
        User-Agent and extra headers the reference pins on its browser
        client (/root/reference/internal/infra/browser_client.go:57-60,
        internal/config/crawler_config.go:36), plus the politeness knobs
        that shaped this run. Joinable onto any run artifact for
        provenance; fetches here are a corpus join, so nothing is sent
        over a wire."""
        import json

        row = (
            self.cfg.user_agent,
            json.dumps(dict(self.cfg.headers), sort_keys=True),
            float(self.cfg.round_seconds),
            self.cfg.order,
            ",".join(self.cfg.disallow),
            ",".join(self.cfg.allow),
        )
        return self.spark.createDataFrame(
            [row],
            "user_agent string, headers_json string, round_seconds double,"
            " order string, disallow string, allow string",
        )

    # -- frontier bootstrap -------------------------------------------

    def frontier_from_seeds(self, seed_list: list[tuple[int, str]]) -> DataFrame:
        from go_crawler_spark.crawl.canonicalize import host_of, xxhash64_py

        rows = []
        for idx, url in seed_list:
            cu = canon_url(None, url)
            if cu is None:  # B9 validity gate
                continue
            h = xxhash64_py(cu)
            rows.append(
                (h, cu, host_of(cu), "PENDING", 0, f"{idx:04d}", 0,
                 CrawlConfig.priority_of(h))
            )
        return self.spark.createDataFrame(rows, schema=FRONTIER_SCHEMA)

    def _order_cols(self) -> list:
        """The total crawl-order key (F3): BFS = (depth, seq_path);
        priority/pagerank modes rank by priority desc first, same
        tie-break (pagerank rewrites the priority column at dequeue
        time from the latest rank table)."""
        if self.cfg.order in ("priority", "pagerank", "opic"):
            return [F.col("priority").desc(), F.col("depth"), F.col("seq_path")]
        return [F.col("depth"), F.col("seq_path")]

    # -- one round -----------------------------------------------------

    def _dequeue(
        self, pending: DataFrame, ranks: DataFrame | None = None
    ) -> DataFrame:
        # Hosts absent from robots_df default to the budget for the
        # default crawl-delay 1.0 — the SAME rule the simulator applies
        # (simulator.py: delays.get(host, 1.0) → cfg.budget), so corpora
        # whose robots table doesn't cover every host cannot diverge.
        # robots_df's per-host disallow/allow must equal cfg.disallow /
        # cfg.allow (corpus.build_robots guarantees it); the simulator
        # uses the global sets.
        if ranks is not None:
            # rank orders ('pagerank'/'opic'): the priority column is
            # live — join the latest rank table by url_hash; URLs
            # discovered after the last recompute rank at the mode's
            # floor (pagerank: teleport mass; opic: the fresh-page
            # cash endowment — same rule in the simulator twin).
            # Broadcast is the right strategy while the
            # rank table fits (bounded by |seen|); past broadcast size
            # drop the hint and this becomes a shuffle equi-join on the
            # 8-byte key — pending shuffles either way for the window
            # below, so no extra Exchange is introduced. Ranks are
            # exact longs < 2^53 wherever the trace is compared, so the
            # double cast is lossless there.
            pending = (
                pending.join(F.broadcast(ranks), "url_hash", "left")
                .withColumn(
                    "priority",
                    F.coalesce(
                        F.col("pr").cast("double"),
                        F.lit(float(self._rank_floor())),
                    ),
                )
                .drop("pr")
            )
        salted = pending.join(
            self.budgets.drop("disallow", "allow"), "host", "left"
        ).withColumn(
            "budget", F.coalesce("budget", F.lit(self.cfg.budget(1.0)))
        ).withColumn(
            "salt", F.pmod(F.xxhash64("url_hash"), F.lit(self.cfg.host_salt_buckets))
        )
        w1 = Window.partitionBy("host", "salt").orderBy(*self._order_cols())
        w2 = Window.partitionBy("host").orderBy(*self._order_cols())
        return (
            salted.withColumn("rn1", F.row_number().over(w1))
            .filter(F.col("rn1") <= F.col("budget"))  # local prune per salt
            .withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= F.col("budget"))
            .drop("rn1", "rn", "salt", "budget")
        )

    def _discover(self, fetched_lists: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(candidates pre-dedupe, robots-rejected) from fetched list pages.

        Candidate enumeration order == the reference's: outlinks by
        position (crawler.go:264), then next-link (crawler.go:315-330)
        or total-count pages (crawler.go:346-401, ceil at line 371)."""
        base = fetched_lists.select(
            F.col("url").alias("base_url"), "depth", "seq_path",
            "outlinks", "next_url", "total_count",
        )
        outl = base.select(
            "base_url", "depth", "seq_path",
            F.posexplode("outlinks").alias("link_idx", "href"),
        )
        nxt = base.filter(F.col("next_url").isNotNull()).select(
            "base_url", "depth", "seq_path",
            F.size("outlinks").alias("link_idx"),
            F.col("next_url").alias("href"),
        )
        pag = (
            base.filter(F.col("total_count").isNotNull())
            .withColumn(
                "page_count",
                F.ceil(F.col("total_count") / F.lit(self.cfg.per_page)).cast("int"),
            )
            .filter(F.col("page_count") >= 2)
            .select(
                "base_url", "depth", "seq_path", "outlinks",
                F.explode(F.sequence(F.lit(2), F.col("page_count"))).alias("page_no"),
            )
            .select(
                "base_url", "depth", "seq_path",
                (F.size("outlinks") + F.col("page_no") - 2).alias("link_idx"),
                F.concat(
                    # strip the whole query — same rule as the simulator's
                    # url.split('?', 1)[0] (one definition of page-one)
                    F.regexp_replace("base_url", r"\?.*$", ""),
                    F.lit("?p="),
                    F.col("page_no"),
                ).alias("href"),  # buildPaginatedURL query-mode (B7)
            )
        )
        # child order key + depth are computed JVM-side (codegen'd
        # format_string) so the Python kernel only touches URL strings
        cands = (
            outl.unionByName(nxt)
            .unionByName(pag)
            .select(
                "base_url",
                "href",
                (F.col("depth") + 1).alias("depth"),
                F.format_string("%s.%04d", "seq_path", "link_idx").alias("seq_path"),
            )
        )

        # kernel #1: canonicalize (resolve + NFKC + validity gate)
        def canon(batches):
            for pdf in batches:
                res = canonicalize_batch(pdf["base_url"], pdf["href"])
                keep = res.notna()
                yield pd.DataFrame(
                    {
                        "base_url": pdf["base_url"][keep],
                        "url": res[keep],
                        "depth": pdf["depth"][keep],
                        "seq_path": pdf["seq_path"][keep],
                    }
                )

        canoned = cands.mapInPandas(canon, schema=_CANON_OUT).withColumn(
            "host", F.parse_url("url", F.lit("HOST"))
        ).withColumn("path", F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/")))

        joined = canoned.join(self.budgets.drop("budget"), "host", "left")
        # RFC 9309 precedence: longest matching prefix wins, Allow takes
        # ties; hosts absent from robots_df (null rule arrays) → 0 vs 0
        # → allowed. Same rule in the simulator (independent derivation).
        from go_crawler_spark.functions.parsing import robots_longest_match

        dis_len = F.when(
            F.col("disallow").isNotNull(),
            robots_longest_match(F.col("disallow"), F.col("path")),
        ).otherwise(F.lit(0))
        alw_len = F.when(
            F.col("allow").isNotNull(),
            robots_longest_match(F.col("allow"), F.col("path")),
        ).otherwise(F.lit(0))
        return joined.withColumn("robots_reject", dis_len > alw_len).drop(
            "disallow", "allow", "path"
        )

    def dedupe_new(
        self,
        allowed: DataFrame,
        seen_hashes: DataFrame,
        bloom: BloomShards | None,
        round_no: int,
    ) -> DataFrame:
        """Candidates (url, host, depth, seq_path) → fresh PENDING rows.

        D3 first-writer-wins collapse, then the two-tier seen check:
        Bloom-negative rows skip the exact check entirely (at 10^10
        scale the overwhelming majority of genuinely-new URLs);
        Bloom-positive rows get the exact backstop (reference is exact,
        §1.4). The exact check never shuffles the frontier: the round's
        candidate set is politeness-bounded (≤ dequeued × fanout), so
        the Bloom-positive keys BROADCAST, the 10^10-row seen set is
        scanned map-side by a broadcast LeftSemi (at rest this scan is
        the Iceberg bucket-pruned read), and the small seen subset
        broadcasts back for the anti-join. Fallback for unbounded
        rounds (cfg.broadcast_dedupe=False): plain shuffle anti-join.
        """
        collapsed = (
            allowed.withColumn("url_hash", F.xxhash64("url"))
            .groupBy("url_hash")
            .agg(F.min(F.struct("depth", "seq_path", "url", "host")).alias("s"))
            .select("url_hash", "s.depth", "s.seq_path", "s.url", "s.host")
        )

        if bloom is not None:
            bc = self.spark.sparkContext.broadcast(bloom)

            def probe(batches):
                for pdf in batches:
                    yield pdf.assign(maybe_seen=bc.value.maybe_contains(pdf["url_hash"]))

            probed = collapsed.mapInPandas(
                probe,
                schema=T.StructType(
                    collapsed.schema.fields
                    + [T.StructField("maybe_seen", T.BooleanType())]
                ),
            )
            definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        else:
            definitely_new = None
            maybe = collapsed

        seen = seen_hashes.select("url_hash")
        if self.cfg.broadcast_dedupe:
            # maybe appears in two jobs (semi build + anti probe); its
            # upstream groupBy shuffle is reused across them, so only the
            # post-shuffle bloom-probe map re-runs — no persist needed
            seen_sub = seen.join(
                F.broadcast(maybe.select("url_hash")), "url_hash", "left_semi"
            )
            survivors = maybe.join(F.broadcast(seen_sub), "url_hash", "left_anti")
        else:
            survivors = maybe.join(seen, "url_hash", "left_anti")
        return (
            survivors if definitely_new is None
            else definitely_new.unionByName(survivors)
        ).select(
            "url_hash", "url", "host", F.lit("PENDING").alias("status"),
            "depth", "seq_path", F.lit(round_no + 1).alias("round"),
            # Spark twin of CrawlConfig.priority_of (pmod ≡ python %)
            F.pmod(F.col("url_hash"), F.lit(1_000_000)).cast("double")
            .alias("priority"),
        )

    def run_round(
        self,
        pending: DataFrame,
        seen_hashes: DataFrame,
        round_no: int,
        bloom: BloomShards | None,
        with_payload_verify: bool = True,
        light_metrics: bool = False,
        ranks: DataFrame | None = None,
    ) -> tuple[
        DataFrame, DataFrame, DataFrame | None, RoundStats, DataFrame | None
    ]:
        """Returns (fresh increment [checkpointed], trace, pages, stats,
        edge increment [checkpointed; None unless order='pagerank']).

        ``pending`` is the live queue (PENDING rows only); ``seen_hashes``
        is the url_hash set of every discovery ever (union of the
        checkpointed increments) — the round only READS it, map-side.
        Nothing here touches, rewrites, or re-materializes the full
        frontier: per-round work is bounded by |pending| + |increment|.

        Action discipline (the driver loop is the engine's only
        iterative part, so per-round job count is the constant factor
        that survives to 10^10 scale): exactly three materializing
        actions per round — trace-status + robots/candidate counts
        (FUSED into one job via a unioned pair of tiny aggregates),
        pages count, and the fresh-increment checkpoint — everything
        downstream reuses those materialized frames. order='pagerank'
        adds exactly one more (action 4: the edge-increment checkpoint,
        bounded by dequeued × fanout edge keys), plus one rank-table
        checkpoint per ``pagerank_every`` rounds in run()."""
        dequeued = self._dequeue(
            pending.filter(F.col("status") == "PENDING"), ranks
        ).select("url_hash", "url", "host", "depth", "seq_path", "priority").persist()

        # The "fetch" join. The dequeued set is bounded by the politeness
        # budgets (sum of per-host budgets per round), so it broadcasts —
        # the corpus side is neither shuffled nor broadcast: payload
        # bytes stay in their partitions and decode runs map-side (the
        # Spark analog of the reference's resource blocking, C8 — never
        # move bytes you haven't asked for). Misses (URL not in corpus)
        # are recovered with a broadcast anti-join and marked FAILED.
        corpus_meta = self.corpus.select(
            "url_hash", "kind", "next_url", "total_count", "outlinks", "fetch_ok"
        )
        deq_side = F.broadcast(dequeued) if self.cfg.broadcast_fetch else dequeued
        # hit is politeness-bounded (≤ dequeued rows) but inherits the
        # corpus scan's partitioning — right-size it so the discovery
        # stages downstream don't run hundreds of near-empty tasks
        # (coalesce is a no-op when the scan already has fewer)
        hit = (
            corpus_meta.join(deq_side, "url_hash", "inner")
            .withColumn("ok", F.coalesce(F.col("fetch_ok"), F.lit(False)))
            .coalesce(self.spark.sparkContext.defaultParallelism)
            .persist()
        )
        miss = dequeued.join(
            F.broadcast(hit.select("url_hash")), "url_hash", "left_anti"
        )
        trace = (
            hit.select(
                F.lit(round_no).alias("round"), "depth", "seq_path", "url_hash",
                "url", "host", "priority",
                F.when(F.col("ok"), "SUCCESS").otherwise("FAILED").alias("status"),
            )
            .unionByName(
                miss.select(
                    F.lit(round_no).alias("round"), "depth", "seq_path",
                    "url_hash", "url", "host", "priority",
                    F.lit("FAILED").alias("status"),
                )
            )
            .persist()
        )
        t0 = time.time()
        flagged = self._discover(
            hit.filter(F.col("ok") & (F.col("kind") == "list"))
        )
        if light_metrics:
            # throughput mode: skip the robots/candidate counts — stats
            # carry -1 sentinels (run()'s pending arithmetic only needs
            # dequeued and enqueued)
            status_counts = {
                r["status"]: r["count"]
                for r in trace.groupBy("status").count().collect()  # action 1
            }
            n_candidates, n_robots = -1, -1
            t0 = _tlog("a1_trace_counts", t0)
        else:
            # actions 1+3 FUSED: one job computes (and, via the persists,
            # caches) both the trace statuses and the discovery frame —
            # two tiny aggregates unioned, one driver round-trip instead
            # of two (the fixed per-round driver cost is the e2e loop's
            # serial axis, so every action fold shows up in urls/sec)
            flagged = flagged.persist()
            rows = (
                trace.groupBy(F.col("status").alias("key"))
                .count()
                .withColumn("src", F.lit("trace"))
                .unionByName(
                    flagged.groupBy(
                        F.col("robots_reject").cast("string").alias("key")
                    )
                    .count()
                    .withColumn("src", F.lit("robots"))
                )
                .collect()  # action 1
            )
            status_counts = {
                r["key"]: r["count"] for r in rows if r["src"] == "trace"
            }
            reject_counts = {
                r["key"] == "true": r["count"]
                for r in rows
                if r["src"] == "robots"
            }
            n_candidates = int(reject_counts.get(False, 0))
            n_robots = int(reject_counts.get(True, 0))
            t0 = _tlog("a1_trace_discover_counts", t0)
        n_dequeued = sum(status_counts.values())
        n_ok = int(status_counts.get("SUCCESS", 0))
        allowed = flagged.filter(~F.col("robots_reject")).drop("robots_reject")

        pages = None
        if with_payload_verify:
            keys = dequeued.select("url_hash", "depth")
            payload = (
                self.payload.join(
                    F.broadcast(keys) if self.cfg.broadcast_fetch else keys,
                    "url_hash",
                    "inner",
                )
                .filter(
                    F.col("fetch_ok")
                    & (F.col("kind") == "detail")
                    & F.col("bytes").isNotNull()
                )
                .select(
                    "url_hash", "url", "host", "depth", "image_id", "bytes",
                    "w", "h", "fmt", "caption", "phash",
                )
            )
            pages = payload.mapInPandas(_decode_verify, schema=_VERIFY_OUT).withColumn(
                "round", F.lit(round_no)
            ).persist()
            pages.count()  # action 2 — decode map-side over corpus partitions
            t0 = _tlog("a2_decode_verify", t0)

        # action 3: checkpoint ONLY the fresh increment (bounded by the
        # round's politeness budget × fanout) — the count afterwards
        # reads the materialized blocks, it does not recompute
        fresh = self.dedupe_new(
            allowed, seen_hashes, bloom, round_no
        ).localCheckpoint(eager=True)
        n_fresh = fresh.count()
        t0 = _tlog("a3_dedupe_fresh", t0)

        edges_inc = None
        if self.cfg.order in ("pagerank", "opic"):
            # action 4 (rank modes only): the round's discovered-edge
            # increment — (fetching page → robots-allowed candidate),
            # INCLUDING links to already-seen URLs (in-links to popular
            # pages are exactly what rank rewards). Only 16-byte hash
            # pairs materialize; checkpointed because `flagged`/`hit`
            # unpersist at round end but the recompute in run() reads
            # edges rounds later. Simulator twin: the edges_set.add in
            # simulator.simulate's discovery loop.
            edges_inc = (
                allowed.select(
                    F.xxhash64("base_url").alias("src"),
                    F.xxhash64("url").alias("dst"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            t0 = _tlog("a4_edges_inc", t0)

        stats = RoundStats(
            round=round_no,
            dequeued=n_dequeued,
            success=n_ok,
            failed=n_dequeued - n_ok,
            robots_skipped=n_robots,
            dedup_skipped=(n_candidates - n_fresh) if n_candidates >= 0 else -1,
            enqueued=int(n_fresh),
        )
        dequeued.unpersist()
        hit.unpersist()
        if not light_metrics:
            flagged.unpersist()
        return fresh, trace, pages, stats, edges_inc

    def _rank_floor(self) -> int:
        """Priority for URLs absent from the rank table (discovered
        after the last recompute): pagerank's teleport mass, or OPIC's
        fresh-page cash endowment. The simulator twins pin both."""
        if self.cfg.order == "opic":
            from go_crawler_spark.functions.linkgraph import OPIC_SCALE

            return OPIC_SCALE
        from go_crawler_spark.functions.linkgraph import PR_TELEPORT

        return PR_TELEPORT

    def _rank_table(
        self, nodes: DataFrame, edges: DataFrame | None
    ) -> DataFrame:
        """(url_hash, pr) over every known node — the rank-order
        dequeue priority source, checkpointed eagerly (one action; the
        table is read by every dequeue until the next recompute).
        order='pagerank' ranks by damped PageRank mass; order='opic'
        by the OPIC running importance (cash + banked history) —
        both exact-integer kernels from functions/linkgraph."""
        from go_crawler_spark.functions.linkgraph import (
            opic_scores,
            pagerank_ranks,
        )

        if edges is None:
            edges = self.spark.createDataFrame([], "src long, dst long")
        node_ids = nodes.select(F.col("url_hash").alias("doc_id"))
        if self.cfg.order == "opic":
            ranked = opic_scores(node_ids, edges, self.cfg.opic_iters).select(
                "doc_id", F.col("importance").alias("pr")
            )
        else:
            ranked = pagerank_ranks(node_ids, edges, self.cfg.pagerank_iters)
        return (
            ranked.select(F.col("doc_id").alias("url_hash"), "pr")
            .localCheckpoint(eager=True)
        )

    # -- full run ------------------------------------------------------

    def run(
        self,
        seed_list: list[tuple[int, str]] | None = None,
        spec: CorpusSpec | None = None,
        use_bloom: bool = True,
        with_payload_verify: bool = True,
        resume: bool = False,
    ) -> CrawlResult:
        spark = self.spark
        cfg = self.cfg

        start_round = 0
        if resume and self.store is not None and self.store.latest_step() >= 0:
            base = self.store.current_frontier()
            start_round = self.store.latest_step()  # step k+1 ⇒ rounds 0..k done
        else:
            if seed_list is None:
                assert spec is not None, "need seeds or a corpus spec"
                seed_list = corpus_seeds(spec)
            base = self.frontier_from_seeds(seed_list)
            if self.store is not None:
                self.store.append("frontier", base, 0)
                self.store.commit_step(0)

        # Merge-on-read, in memory (the twin of SnapshotStore's design):
        # the frontier is carried as IMMUTABLE increments — the base
        # (seeds or resumed snapshot) plus one checkpointed fresh batch
        # per round — and the accumulated status-log (the traces).
        # Nothing ever rewrites or re-checkpoints the full frontier; the
        # only per-round materializations are the fresh increment
        # (inside run_round) and the live queue below, so round cost
        # stays flat as terminal rows accumulate instead of growing
        # O(|frontier|) (the r1 in-memory loop's scale killer).
        base = base.localCheckpoint(eager=True)
        increments: list[DataFrame] = [base]
        seen_hashes = base.select("url_hash")
        pending_df = base.filter(F.col("status") == "PENDING")
        # pending count is maintained arithmetically across rounds —
        # no per-round full-frontier scan just to decide termination
        pending = pending_df.count()
        bloom_cfg = cfg  # grows bloom_shards on saturation rebuilds
        # tier-1 filter family (cfg.seen_filter): Bloom bitmaps or cuckoo
        # fingerprint buckets — identical engine interface; tier 2 keeps
        # the seen set exact either way, so this is a physical choice
        if use_bloom:
            if cfg.seen_filter == "cuckoo":
                from go_crawler_spark.crawl.cuckoo import CuckooShards

                bloom = CuckooShards.build(base.select("url_hash"), cfg)
            else:
                bloom = BloomShards.build(base.select("url_hash"), cfg)
        else:
            bloom = None

        traces: list[DataFrame] = []
        pages_parts: list[DataFrame] = []
        metrics: list[RoundStats] = []
        # order='pagerank' state: discovered-edge increments (one
        # checkpointed frame per round; store-committed alongside the
        # frontier when a store is attached) and the latest rank table.
        use_pr = cfg.order in ("pagerank", "opic")
        edge_incs: list[DataFrame] = []
        ranks_df: DataFrame | None = None
        if use_pr and start_round > 0 and self.store is not None:
            # resume parity: hydrate the edge history from the store,
            # and rebuild the rank table that was IN FORCE at the
            # resume point — computed at round r0 = the last recompute
            # round, from frontier/edge state as of step r0 — so a
            # resumed crawl dequeues exactly as the uninterrupted one.
            stored = self.store.read("edges")
            if stored is not None:
                edge_incs.append(
                    stored.select("src", "dst").localCheckpoint(eager=True)
                )
            r0 = (start_round // cfg.pagerank_every) * cfg.pagerank_every
            if r0 < start_round:  # else round start_round recomputes anyway
                nodes0 = self.store.read("frontier", as_of_step=r0)
                ed0 = self.store.read("edges", as_of_step=r0)
                ranks_df = self._rank_table(
                    nodes0.select("url_hash"),
                    None if ed0 is None else ed0.select("src", "dst").distinct(),
                )

        for k in range(start_round, start_round + cfg.max_rounds):
            if pending == 0:
                break
            if use_pr and k % cfg.pagerank_every == 0:
                # one extra action per pagerank_every rounds: recompute
                # the rank table over everything seen so far and
                # checkpoint it (it is read by every dequeue until the
                # next recompute). distinct() across increments because
                # the same (src, dst) edge can re-surface in later
                # rounds (pages re-linking already-seen URLs).
                if edge_incs:
                    edges = edge_incs[0]
                    for e in edge_incs[1:]:
                        edges = edges.unionByName(e)
                    edges = edges.distinct()
                else:
                    edges = None
                ranks_df = self._rank_table(seen_hashes, edges)
            fresh, trace, pages, stats, edges_inc = self.run_round(
                pending_df, seen_hashes, k, bloom, with_payload_verify,
                ranks=ranks_df,
            )
            if use_pr and edges_inc is not None:
                edge_incs.append(edges_inc)
            if pages is not None:
                pages_parts.append(pages)
            if self.store is not None:
                self.store.append("frontier", fresh, k + 1)
                self.store.append("status_log", trace, k + 1)
                if edges_inc is not None:
                    # pagerank lineage: the discovered-edge increments
                    # ride the same atomic step commit, so a resumed
                    # run could rebuild the rank table from the store
                    # instead of starting edge-blind
                    self.store.append("edges", edges_inc, k + 1)
                if pages is not None:
                    self.store.append("pages", pages, k + 1)
                self.store.append(
                    "metrics", spark.createDataFrame([vars(stats)]), k + 1
                )
                self.store.commit_step(k + 1)
            if bloom is not None and stats.enqueued > 0:
                if stats.enqueued <= 1_000_000:
                    # politeness-bounded delta: collect 8B keys, set bits
                    # driver-side (one job, no shuffle)
                    rows = fresh.select("url_hash").collect()
                    bloom = bloom.with_hashes([r["url_hash"] for r in rows])
                else:  # giant round: distributed build + merge
                    bloom = bloom.union(
                        type(bloom).build(fresh.select("url_hash"), bloom_cfg)
                    )
                # saturation policy (bloom.py module doc): estimated fp
                # above threshold → rebuild from the exact seen set with
                # doubled shard count. Amortized: each rebuild doubles
                # capacity, so O(log growth) rebuilds per crawl — one
                # extra counted action per rebuild, not per round.
                if bloom.saturated():
                    bloom_cfg = replace(
                        bloom_cfg, bloom_shards=bloom_cfg.bloom_shards * 2
                    )
                    bloom = type(bloom).build(
                        seen_hashes.unionByName(fresh.select("url_hash")),
                        bloom_cfg,
                    )
            increments.append(fresh)
            seen_hashes = seen_hashes.unionByName(fresh.select("url_hash"))
            # live-queue update: drop the dequeued rows (politeness-
            # bounded ⇒ they BROADCAST into a map-side anti-join), append
            # the fresh increment; the checkpoint is O(|pending|) — the
            # live queue — never O(|frontier|)
            deq_keys = trace.select("url_hash")
            deq_side = F.broadcast(deq_keys) if cfg.broadcast_fetch else deq_keys
            pending_df = (
                pending_df.join(deq_side, "url_hash", "left_anti")
                .unionByName(fresh)
                .localCheckpoint(eager=True)
            )
            traces.append(trace)
            metrics.append(stats)
            pending += stats.enqueued - stats.dequeued

        if traces:
            all_trace = traces[0]
            for t in traces[1:]:
                all_trace = all_trace.unionByName(t)
        else:
            all_trace = spark.createDataFrame(
                [],
                schema="round int, depth int, seq_path string, url_hash long, "
                "url string, host string, priority double, status string",
            )
        all_pages = None
        if pages_parts:
            all_pages = pages_parts[0]
            for p in pages_parts[1:]:
                all_pages = all_pages.unionByName(p)

        # final frontier: lazy merge-on-read view — union of the
        # immutable increments ⟕ the last status flip per url_hash
        # (exactly SnapshotStore.current_frontier's shape); consumers
        # pay for the resolve only if they read it
        all_disc = increments[0]
        for inc in increments[1:]:
            all_disc = all_disc.unionByName(inc)
        if traces:
            flips = all_trace.groupBy("url_hash").agg(
                F.max_by("status", "round").alias("new_status")
            )
            frontier_view = (
                all_disc.join(flips, "url_hash", "left")
                .withColumn("status", F.coalesce("new_status", F.col("status")))
                .drop("new_status")
            )
        else:
            frontier_view = all_disc
        return CrawlResult(
            frontier=frontier_view, trace=all_trace, pages=all_pages,
            metrics=metrics, order=cfg.order,
        )
