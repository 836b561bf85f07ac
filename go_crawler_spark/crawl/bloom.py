"""Partitioned Bloom URL-seen filter as broadcast shards (SURVEY.md §2 D1).

The reference probes Redis per URL (EXISTS key,
/root/reference/internal/infra/crawl_job_client.go:187-197) — one RTT
per candidate. At 10^10 URLs the Spark-native equivalent is two-tier:

tier 1 (this file): S Bloom shards, shard = pmod(url_hash, S), each an
  m-bit numpy bitmap built distributively (applyInPandas per shard
  group), collected (S small bitmaps, NOT the keys) and broadcast.
  Probing is the engine's sanctioned vectorized kernel #2 — pure numpy
  bit math over Arrow batches. A negative probe proves the URL is new.

tier 2 (engine.py): exact ``left_anti`` join for the maybe-seen rows
  only — kills false positives, preserving the reference's exact-set
  semantics (§1.4).

Scale math: shard count S and bits/shard m are chosen so each shard ≪
executor memory: 10^10 keys at 10 bits/key ≈ 12.5 GB total → S=1024
shards of ~12 MB, each broadcast-sized. In this sandbox the defaults
(CrawlConfig) are 8 shards × 1 Mbit. k hash probes are derived from the
64-bit url_hash by splitting + Knuth-style remix — no per-row hashing
beyond the one xxhash64 Spark already computed JVM-side.

Saturation policy: bitmaps are fixed-size and only ever OR-accumulate,
so over enough rounds the fill ratio rises and the estimated
false-positive rate (worst-shard fill^k, exposed by ``fp_rate``) climbs
toward 1 — at which point every candidate pays the tier-2 exact check:
correct, just slower. The engine therefore REBUILDS the filter from the
exact seen set with doubled shard count whenever ``fp_rate`` crosses
``SATURATION_FP`` (shard = pmod(hash, S), so doubling S halves each
shard's key load at constant per-shard m). Rebuilds are amortized —
each one doubles capacity, so a crawl triggers O(log growth) rebuilds
total — and never lossy: the filter is always rebuilt from the exact
frontier key set, and tier 2 keeps semantics exact regardless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from go_crawler_spark.crawl.config import CrawlConfig

# estimated-fp threshold above which the engine rebuilds with more shards
SATURATION_FP = 0.02


def _probe_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher): derived entirely from the existing 64-bit url_hash."""
    h = hashes.astype(np.uint64)
    h1 = h ^ (h >> np.uint64(33))
    h2 = (h * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h2 |= np.uint64(1)  # odd so all k probes differ
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


class BloomShards:
    """Immutable set of S bitmaps keyed by pmod(url_hash, S)."""

    def __init__(self, shards: dict[int, np.ndarray], m: int, k: int, s: int):
        self.shards = shards  # shard id -> uint8 bitmap of m/8 bytes
        self.m = m
        self.k = k
        self.s = s

    @classmethod
    def build(cls, hashes_df: DataFrame, cfg: CrawlConfig) -> "BloomShards":
        """Build from a one-column DataFrame of long ``url_hash``.

        Distributed: each shard's bitmap is OR-accumulated inside its
        own applyInPandas group (one shuffle on shard id), and only the
        S finished bitmaps travel to the driver."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        m, k, s = cfg.bloom_bits_per_shard, cfg.bloom_hashes, cfg.bloom_shards
        out_schema = T.StructType(
            [
                T.StructField("shard", T.IntegerType()),
                T.StructField("bitmap", T.BinaryType()),
            ]
        )

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bitmap = np.zeros(m // 8, dtype=np.uint8)
            pos = _probe_positions(pdf["url_hash"].to_numpy(), m, k).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
            return pd.DataFrame({"shard": [key[0]], "bitmap": [bitmap.tobytes()]})

        rows = (
            hashes_df.select(
                F.pmod(F.col("url_hash"), F.lit(s)).cast("int").alias("shard"),
                "url_hash",
            )
            .groupBy("shard")
            .applyInPandas(build_shard, schema=out_schema)
            .collect()
        )
        shards = {r["shard"]: np.frombuffer(r["bitmap"], dtype=np.uint8) for r in rows}
        return cls(shards, m, k, s)

    def maybe_contains(self, hashes: pd.Series) -> pd.Series:
        """Vectorized probe (kernel #2): True = maybe seen, False = new."""
        h = hashes.to_numpy(dtype=np.int64)
        result = np.zeros(len(h), dtype=bool)
        shard_ids = ((h % self.s) + self.s) % self.s
        for sid in np.unique(shard_ids):
            bitmap = self.shards.get(int(sid))
            idx = np.nonzero(shard_ids == sid)[0]
            if bitmap is None:
                continue  # empty shard: definitely new
            pos = _probe_positions(h[idx], self.m, self.k)
            bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            result[idx] = bits.all(axis=1)
        return pd.Series(result, index=hashes.index)

    def fill_ratio(self) -> float:
        """Worst-shard fraction of set bits (popcount/m) — the shard
        that governs the false-positive rate."""
        if not self.shards:
            return 0.0
        return max(
            float(np.unpackbits(bm).sum()) / self.m for bm in self.shards.values()
        )

    def fp_rate(self) -> float:
        """Estimated false-positive probability ≈ (worst-shard fill)^k —
        the standard Bloom estimate from the observed bit density (no
        key count needed, so it stays cheap to evaluate per round)."""
        return self.fill_ratio() ** self.k

    def saturated(self, threshold: float = SATURATION_FP) -> bool:
        return self.fp_rate() > threshold

    def with_hashes(self, hashes) -> "BloomShards":
        """Return a copy with extra keys OR-ed in, built driver-side.

        Per-round deltas are politeness-bounded (thousands of keys, 8
        bytes each) — collecting them and setting bits locally is one
        cheap job instead of a shuffle + applyInPandas + collect. The
        distributed ``build`` path remains for the initial full-frontier
        construction where keys are billions."""
        import numpy as np  # noqa: PLC0415

        h = np.asarray(hashes, dtype=np.int64)
        shards = {k: v.copy() for k, v in self.shards.items()}
        shard_ids = ((h % self.s) + self.s) % self.s
        for sid in np.unique(shard_ids):
            bitmap = shards.get(int(sid))
            if bitmap is None:
                bitmap = np.zeros(self.m // 8, dtype=np.uint8)
                shards[int(sid)] = bitmap
            pos = _probe_positions(h[shard_ids == sid], self.m, self.k).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return BloomShards(shards, self.m, self.k, self.s)

    def union(self, other: "BloomShards") -> "BloomShards":
        """Incremental per-round maintenance: OR-in a round's new keys
        (add-only, SURVEY.md §7 'Bloom shard lifecycle')."""
        assert (self.m, self.k, self.s) == (other.m, other.k, other.s)
        merged = dict(self.shards)
        for sid, bm in other.shards.items():
            merged[sid] = np.bitwise_or(merged[sid], bm) if sid in merged else bm
        return BloomShards(merged, self.m, self.k, self.s)
