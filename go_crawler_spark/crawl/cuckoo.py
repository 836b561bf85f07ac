"""Partitioned cuckoo URL-seen filter as broadcast shards (SURVEY.md §2
D1 — the north rule names "Bloom/cuckoo"; this is the cuckoo half).

Same two-tier architecture as bloom.py (tier 1 probabilistic broadcast
shards, tier 2 exact anti-join backstop in engine.py), same shard
keying (pmod(url_hash, S)), same engine interface — ``CrawlConfig.
seen_filter='cuckoo'`` swaps it in with zero engine-semantics change
(the golden trace is identical by construction; a test pins it).

Why a cuckoo filter at all (Fan et al., CoNLL 2014 "Cuckoo Filter:
Practically Better Than Bloom"):

- **deletion**: a Bloom bitmap can only OR-accumulate; a cuckoo slot
  can be freed. A continuous frontier that re-enqueues URLs on a
  re-fetch schedule (q_refetch_schedule) must REMOVE the url from the
  seen filter when its re-fetch comes due, or pay the exact-check
  backstop for every hot URL forever. ``delete`` is that operation.
- **space at equal fp**: 16-bit fingerprints at 4 slots/bucket give
  fp ≈ 2·4/2^16 ≈ 0.012% at ~8.4 bits/key (95% load) — Bloom needs
  ~21 bits/key for that rate.

Layout per shard: ``n_buckets × bucket_size`` uint16 fingerprints
(0 = empty slot). n_buckets is a power of two so the partial-key
cuckoo relocation ``i2 = i1 XOR H(fp)`` stays in range and is an
involution (either index recovers the other — which is also what makes
``union`` possible: a stored (bucket, fp) pair fully determines its
alternate bucket, so merging replays occupied slots as inserts).

Scale math: 10^10 keys × ~2.1 bytes/key ≈ 22 GB total → S=1024 shards
of ~21 MB, each broadcast-sized (same budget shape as bloom.py).
Probing is pure vectorized numpy over Arrow batches — two gathers and
two compares per key, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from go_crawler_spark.crawl.config import CrawlConfig

# load factor above which the engine should rebuild with more shards
# (cuckoo insert failure probability rises sharply past ~0.95 at
# bucket_size 4 — Fan et al. table 2)
SATURATION_LOAD = 0.94
MAX_KICKS = 500

_FP_MUL = np.uint64(0x9E3779B97F4A7C15)  # fingerprint mix (golden ratio)
_IDX_MUL = np.uint64(0xFF51AFD7ED558CCD)  # bucket-index mix (murmur fmix)
_FPH_MUL = np.uint64(0x5BD1E995)  # fp → alt-index displacement mix


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint per 64-bit hash."""
    fp = ((h.astype(np.uint64) * _FP_MUL) >> np.uint64(48)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _index1(h: np.ndarray, nb: int) -> np.ndarray:
    """Primary bucket index — independent bits from the shard residue."""
    mixed = (h.astype(np.uint64) * _IDX_MUL) >> np.uint64(32)
    return (mixed & np.uint64(nb - 1)).astype(np.int64)


def _fp_hash(fp: np.ndarray, nb: int) -> np.ndarray:
    """Displacement H(fp) for i2 = i1 ^ H(fp); nonzero so i2 != i1."""
    d = (fp.astype(np.uint64) * _FPH_MUL) & np.uint64(nb - 1)
    return np.where(d == 0, np.uint64(1), d).astype(np.int64)


class CuckooShards:
    """Immutable-by-convention set of S bucket tables keyed by
    pmod(url_hash, S). Mutating ops (with_hashes / delete / union)
    return copies, matching BloomShards' value semantics."""

    def __init__(
        self,
        shards: dict[int, np.ndarray],
        nb: int,
        bs: int,
        s: int,
        overflowed: bool = False,
    ):
        self.shards = shards  # shard id -> (nb, bs) uint16 table
        self.nb = nb  # buckets per shard (power of two)
        self.bs = bs  # slots per bucket
        self.s = s  # shard count
        self.overflowed = overflowed  # an insert exhausted MAX_KICKS

    # -- construction ---------------------------------------------------

    @classmethod
    def build(cls, hashes_df: DataFrame, cfg: CrawlConfig) -> "CuckooShards":
        """Distributed build: each shard's bucket table fills inside its
        own applyInPandas group (one shuffle on shard id); only the S
        finished tables travel to the driver — same plan shape as
        BloomShards.build."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        nb, bs, s = cfg.cuckoo_buckets_per_shard, cfg.cuckoo_bucket_size, cfg.bloom_shards
        out_schema = T.StructType(
            [
                T.StructField("shard", T.IntegerType()),
                T.StructField("table", T.BinaryType()),
                T.StructField("overflowed", T.BooleanType()),
            ]
        )

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros((nb, bs), dtype=np.uint16)
            ok = _insert_into(table, pdf["url_hash"].to_numpy(np.int64))
            return pd.DataFrame(
                {"shard": [key[0]], "table": [table.tobytes()], "overflowed": [not ok]}
            )

        rows = (
            hashes_df.select(
                F.pmod(F.col("url_hash"), F.lit(s)).cast("int").alias("shard"),
                "url_hash",
            )
            .groupBy("shard")
            .applyInPandas(build_shard, schema=out_schema)
            .collect()
        )
        shards = {
            r["shard"]: np.frombuffer(r["table"], dtype=np.uint16).reshape(nb, bs).copy()
            for r in rows
        }
        overflowed = any(r["overflowed"] for r in rows)
        return cls(shards, nb, bs, s, overflowed)

    # -- probe (kernel #2, vectorized) -----------------------------------

    def maybe_contains(self, hashes: pd.Series) -> pd.Series:
        """True = maybe seen, False = definitely new. Two gathers + two
        compares per key; no false negatives for non-deleted keys."""
        h = hashes.to_numpy(dtype=np.int64)
        result = np.zeros(len(h), dtype=bool)
        shard_ids = ((h % self.s) + self.s) % self.s
        for sid in np.unique(shard_ids):
            table = self.shards.get(int(sid))
            if table is None:
                continue  # empty shard: definitely new
            idx = np.nonzero(shard_ids == sid)[0]
            hs = h[idx]
            fp = _fingerprints(hs)
            i1 = _index1(hs, self.nb)
            i2 = i1 ^ _fp_hash(fp, self.nb)
            hit = (table[i1] == fp[:, None]).any(axis=1)
            hit |= (table[i2] == fp[:, None]).any(axis=1)
            result[idx] = hit
        return pd.Series(result, index=hashes.index)

    # -- incremental maintenance -----------------------------------------

    def with_hashes(self, hashes) -> "CuckooShards":
        """Copy with extra keys inserted driver-side (politeness-bounded
        per-round deltas, same contract as BloomShards.with_hashes)."""
        h = np.asarray(hashes, dtype=np.int64)
        shards = {k: v.copy() for k, v in self.shards.items()}
        overflowed = self.overflowed
        shard_ids = ((h % self.s) + self.s) % self.s
        for sid in np.unique(shard_ids):
            table = shards.get(int(sid))
            if table is None:
                table = np.zeros((self.nb, self.bs), dtype=np.uint16)
                shards[int(sid)] = table
            if not _insert_into(table, h[shard_ids == sid]):
                overflowed = True
        return CuckooShards(shards, self.nb, self.bs, self.s, overflowed)

    def delete(self, hashes) -> "CuckooShards":
        """Copy with one matching fingerprint slot freed per key — the
        re-fetch-scheduling hook a Bloom filter cannot provide. Deleting
        a never-inserted key is a no-op (it can only remove a
        same-fingerprint twin, which keeps no-false-negative semantics
        for every key still logically present, per the cuckoo-filter
        contract: delete only what you inserted)."""
        h = np.asarray(hashes, dtype=np.int64)
        shards = {k: v.copy() for k, v in self.shards.items()}
        shard_ids = ((h % self.s) + self.s) % self.s
        for j in range(len(h)):
            table = shards.get(int(shard_ids[j]))
            if table is None:
                continue
            hs = h[j : j + 1]
            fp = _fingerprints(hs)[0]
            i1 = int(_index1(hs, self.nb)[0])
            i2 = int(i1 ^ _fp_hash(np.array([fp]), self.nb)[0])
            for i in (i1, i2):
                slots = np.nonzero(table[i] == fp)[0]
                if len(slots):
                    table[i, slots[0]] = 0
                    break
        return CuckooShards(shards, self.nb, self.bs, self.s, self.overflowed)

    def union(self, other: "CuckooShards") -> "CuckooShards":
        """Merge another filter's occupied (bucket, fp) slots by
        replaying them as inserts — sound because i1 ^ H(fp) is an
        involution, so a stored pair fully determines both homes."""
        assert (self.nb, self.bs, self.s) == (other.nb, other.bs, other.s)
        shards = {k: v.copy() for k, v in self.shards.items()}
        overflowed = self.overflowed or other.overflowed
        for sid, ot in other.shards.items():
            table = shards.get(sid)
            if table is None:
                shards[sid] = ot.copy()
                continue
            buckets, slots = np.nonzero(ot)
            for b, sl in zip(buckets.tolist(), slots.tolist()):
                if not _place_fp(table, int(b), int(ot[b, sl])):
                    overflowed = True
        return CuckooShards(shards, self.nb, self.bs, self.s, overflowed)

    # -- saturation policy ------------------------------------------------

    def load_factor(self) -> float:
        """Worst-shard occupied-slot fraction."""
        if not self.shards:
            return 0.0
        return max(
            float(np.count_nonzero(t)) / (self.nb * self.bs)
            for t in self.shards.values()
        )

    def fp_rate(self) -> float:
        """≈ 2·bs/2^16 scaled by load — the standard cuckoo estimate."""
        return self.load_factor() * 2.0 * self.bs / 65536.0

    def saturated(self, threshold: float = SATURATION_LOAD) -> bool:
        """Rebuild trigger: any failed insert, or worst-shard load past
        the kick-storm knee — same doubled-shard rebuild policy as the
        Bloom path (doubling S halves each shard's key load)."""
        return self.overflowed or self.load_factor() > threshold


def _place_fp(table: np.ndarray, i: int, fp: int) -> bool:
    """Insert one fingerprint starting at bucket i, kicking as needed.
    Deterministic victim choice (slot = kick count modulo bs) so builds
    are reproducible across runs and engines."""
    nb, bs = table.shape
    fp_arr = np.array([fp], dtype=np.uint16)
    alt = int(i ^ _fp_hash(fp_arr, nb)[0])
    for b in (i, alt):
        free = np.nonzero(table[b] == 0)[0]
        if len(free):
            table[b, free[0]] = fp
            return True
    b = i
    for kick in range(MAX_KICKS):
        slot = kick % bs
        victim = int(table[b, slot])
        table[b, slot] = fp
        fp = victim
        b = int(b ^ _fp_hash(np.array([fp], dtype=np.uint16), nb)[0])
        free = np.nonzero(table[b] == 0)[0]
        if len(free):
            table[b, free[0]] = fp
            return True
    return False  # caller marks the filter overflowed (tier 2 stays exact)


def _insert_into(table: np.ndarray, hashes: np.ndarray) -> bool:
    """Insert a key batch. Bulk fast path first: most keys land in a
    free slot of their primary bucket without any Python-loop work;
    only collisions fall through to the per-key kick loop."""
    ok = True
    h = hashes.astype(np.int64)
    nb, bs = table.shape
    fp = _fingerprints(h)
    i1 = _index1(h, nb)
    # dedupe (bucket, fp) pairs: same key inserted twice is one slot
    order = np.lexsort((fp, i1))
    keep = np.ones(len(h), dtype=bool)
    keep[order[1:]] = (np.diff(i1[order]) != 0) | (np.diff(fp[order]) != 0)
    # also skip pairs already stored (idempotent re-insert)
    present = (table[i1] == fp[:, None]).any(axis=1)
    i2 = i1 ^ _fp_hash(fp, nb)
    present |= (table[i2] == fp[:, None]).any(axis=1)
    todo = np.nonzero(keep & ~present)[0]
    for j in todo.tolist():  # per-key placement (bulk of work is above)
        if not _place_fp(table, int(i1[j]), int(fp[j])):
            ok = False
    return ok
