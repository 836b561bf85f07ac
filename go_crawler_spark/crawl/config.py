"""Crawl + corpus configuration (the graft's settings/crawler.yaml analog).

The reference drives everything from a validated YAML config
(/root/reference/internal/config/crawler_config.go:26-106). Here the
same knobs are dataclasses validated in ``__post_init__`` — eager
validation mirroring go-playground/validator semantics — and defined
ONCE so the engine, the simulator, and the tests can never disagree on
budget math.

Politeness budget: the reference sleeps ``crawl_sleep_seconds`` between
list-page fetches (/root/reference/internal/usecase/crawler.go:109,
settings/crawler.yaml:9) — one global rate. The north rule upgrades it
to per-host robots crawl-delay: within a round of ``round_seconds``, a
host may be fetched ``floor(round_seconds / crawl_delay)`` times (≥1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

ROBOTS_DISALLOW = ("/private",)
CRAWL_DELAYS = (1.0, 2.0, 5.0)  # cycled per host index


@dataclass(frozen=True)
class CorpusSpec:
    """Deterministic synthetic-web topology (seeded)."""

    n_hosts: int = 3
    lists_per_host: int = 2
    pages_per_list: int = 4
    details_per_page: int = 8
    dup_frac: float = 0.8  # detail-id modulus fraction → ~20% duplicate links
    fail_pct: int = 5  # % of detail fetches that deterministically fail (C7)
    seed: int = 42
    payloads: bool = True  # False → frontier-shaped corpus without image
    # bytes (bench mode: the 10^10 logical frontier materializes payloads
    # only for fetched rows, SURVEY.md §7 M6)
    img_scale: int = 1  # image dims multiplier (encoded into image_id as
    # "@xN"); bench uses 4 → ~100-250 KB payloads, the realistic regime
    # where decode dominates a fetch round

    def __post_init__(self) -> None:
        if self.n_hosts < 1 or self.lists_per_host < 1:
            raise ValueError("n_hosts and lists_per_host must be >= 1")
        if not (0.0 < self.dup_frac <= 1.0):
            raise ValueError("dup_frac in (0, 1]")
        if not (0 <= self.fail_pct < 100):
            raise ValueError("fail_pct in [0, 100)")

    @property
    def details_per_host(self) -> int:
        """Distinct detail ids per host (duplicate links collapse onto these)."""
        total = self.lists_per_host * self.pages_per_list * self.details_per_page
        return max(1, int(total * self.dup_frac))

    def host(self, i: int) -> str:
        return f"h{i:02d}.example.com"

    def strategy(self, i: int) -> str:
        """Alternate the reference's two pagination strategies
        (/root/reference/internal/usecase/crawler.go:216-228)."""
        return "next_link" if i % 2 == 0 else "total_count"

    def crawl_delay(self, i: int) -> float:
        return CRAWL_DELAYS[i % len(CRAWL_DELAYS)]


@dataclass(frozen=True)
class CrawlConfig:
    """Engine run parameters (validated eagerly, crawler_config.go style)."""

    round_seconds: float = 60.0
    max_rounds: int = 64
    per_page: int = 8  # items per list page for total_count math (B5)
    bloom_shards: int = 8  # shard count for EITHER seen filter (cuckoo
    # shares it: the saturation rebuild doubles shards in both designs)
    bloom_bits_per_shard: int = 1 << 20
    bloom_hashes: int = 5
    seen_filter: str = "bloom"  # tier-1 URL-seen filter: "bloom"
    # (OR-accumulating bitmaps) or "cuckoo" (16-bit-fingerprint buckets;
    # supports delete() for re-fetch scheduling). Tier 2 (exact
    # broadcast anti-join) is identical either way, so the golden trace
    # cannot depend on the choice — pinned by test.
    cuckoo_buckets_per_shard: int = 1 << 14  # power of two (XOR relocation)
    cuckoo_bucket_size: int = 4
    host_salt_buckets: int = 4  # skew: hot-host salting fan-out (F2/§4.2)
    broadcast_fetch: bool = True  # fetch join strategy: broadcast the
    # politeness-bounded dequeued side (bytes never shuffle — the normal
    # case); False → shuffle join on url_hash with AQE skew splitting,
    # for rounds whose dequeue exceeds broadcast size
    broadcast_dedupe: bool = True  # exact-seen check strategy: broadcast
    # the Bloom-positive candidate keys into a map-side semi scan of the
    # seen set (frontier never shuffles — right when candidates are
    # politeness-bounded); False → shuffle anti-join, for stress rounds
    # whose candidate set exceeds broadcast size (e.g. kernelbench)
    disallow: tuple[str, ...] = field(default=ROBOTS_DISALLOW)
    allow: tuple[str, ...] = ()  # RFC 9309 Allow rules: the longest
    # matching prefix wins between allow and disallow, ties to allow —
    # an empty tuple reproduces pure-Disallow behavior exactly
    user_agent: str = "pyspark-crawl-frontier/1.0"  # C9: the reference
    # pins a custom UA + header map on its browser client
    # (/root/reference/internal/infra/browser_client.go:57-60, header map
    # at internal/config/crawler_config.go:36). Fetches here are a join
    # against the corpus table, so the client identity is validated
    # eagerly and recorded as run lineage (CrawlEngine.config_lineage)
    # rather than sent over a wire.
    headers: tuple[tuple[str, str], ...] = ()  # extra request headers
    # as (name, value) pairs — a tuple-of-pairs so the frozen dataclass
    # stays hashable
    order: str = "bfs"  # crawl ordering: "bfs" = (depth, seq_path) —
    # the reference's enumeration order; "priority" = priority desc
    # first (ties by depth, seq_path), priority being a deterministic
    # pure function of url_hash (priority_of) so engine and simulator
    # derive it identically; "pagerank" = priority is the integer
    # PageRank of the URL over the edges DISCOVERED SO FAR (recomputed
    # every pagerank_every rounds; URLs discovered after the last
    # recompute rank at the teleport floor), same tie-break. The rank
    # math is exact int64 on both sides (engine: linkgraph's wide
    # floor-division kernels; simulator: independently-derived pure
    # Python), so the golden trace pins the integration bit-for-bit.
    # The reference's dequeue loop has no prioritization at all
    # (/root/reference/internal/usecase/crawler.go:606-641); this is
    # the north rule's non-trivial "priority" axis. "opic" = priority
    # is the OPIC running importance (cash + history; Abiteboul 2003 —
    # the estimate designed to be read mid-crawl) over the same
    # discovered-edge table, recomputed on the same pagerank_every
    # cadence; URLs discovered after the last recompute rank at the
    # fresh-page endowment (OPIC_SCALE). Same exact-integer twin
    # discipline as order='pagerank'.
    pagerank_every: int = 2  # recompute cadence (rounds) for rank orders
    pagerank_iters: int = 2  # damped power iterations per recompute
    opic_iters: int = 2  # synchronous OPIC rounds per recompute

    def __post_init__(self) -> None:
        if self.order not in ("bfs", "priority", "pagerank", "opic"):
            raise ValueError(
                "order must be 'bfs', 'priority', 'pagerank' or 'opic'"
            )
        if self.pagerank_every < 1 or self.pagerank_iters < 1:
            raise ValueError("pagerank_every and pagerank_iters must be >= 1")
        if self.opic_iters < 1:
            raise ValueError("opic_iters must be >= 1")
        if self.round_seconds <= 0:
            raise ValueError("round_seconds must be > 0")
        if self.max_rounds < 1:
            raise ValueError("max_rounds must be >= 1")
        if self.bloom_shards < 1 or self.bloom_hashes < 1:
            raise ValueError("bloom params must be >= 1")
        if self.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError("seen_filter must be 'bloom' or 'cuckoo'")
        nb = self.cuckoo_buckets_per_shard
        if nb < 2 or (nb & (nb - 1)) != 0:
            raise ValueError("cuckoo_buckets_per_shard must be a power of two >= 2")
        if self.cuckoo_bucket_size < 1:
            raise ValueError("cuckoo_bucket_size must be >= 1")
        for rule in (*self.disallow, *self.allow):
            if not rule.startswith("/"):
                raise ValueError(
                    f"robots rule {rule!r} must be a path starting with '/'"
                )
        if not self.user_agent or set(self.user_agent) & {"\r", "\n"}:
            raise ValueError("user_agent must be non-empty without CR/LF")
        for name, value in self.headers:
            if not name or set(name + value) & {"\r", "\n"}:
                raise ValueError(f"invalid header {name!r} (empty or CR/LF)")

    @staticmethod
    def priority_of(url_hash: int) -> float:
        """Deterministic priority from the (xxhash64) url hash — ONE
        definition shared by the engine (via the Spark twin expression)
        and the simulator. Python % and Spark pmod agree for negative
        hashes (both non-negative results)."""
        return float(url_hash % 1_000_000)

    def budget(self, crawl_delay: float) -> int:
        """Fetches allowed for a host per round — floor semantics, min 1.

        Defined once; the simulator and the engine's window filter both
        call this (SURVEY.md §7 'politeness budget exactness')."""
        return max(1, math.floor(self.round_seconds / crawl_delay))
