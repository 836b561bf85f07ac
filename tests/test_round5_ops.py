"""Property tests for the round-5 additions: exact-substring span
coverage, reverse image search (multi-index hamming top-k), and HITS
hubs/authorities. The value-hash gate lives in the oracle suite; these
pin the invariants a hash can't express — brute-force equality against
an independent pure-Python replay, and the multi-index pigeonhole
recall guarantee.
"""

from pyspark.sql import functions as F

from go_crawler_spark.functions.cleaning import (
    EXSUB_DEN,
    EXSUB_K,
    EXSUB_NUM,
    q_exact_substr_coverage,
)
from go_crawler_spark.functions.linkgraph import (
    HITS_ITERS,
    HITS_SCALE,
    PR_FANOUT,
    PR_LCG_A,
    PR_LCG_C,
    PR_LCG_K,
    q_hits_scores,
)
from go_crawler_spark.functions.multimodal import (
    PHASH_MAX_HAMMING,
    PHASH_N_DOCS,
    REVSEARCH_TOPK,
    _phash_rows,
    _revsearch_query_rows,
    q_phash_reverse_search,
)
from go_crawler_spark.functions.similarity import P31
from go_crawler_spark.tables import load


def _poly(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P31
    return acc


def test_exact_substr_coverage_matches_bruteforce(spark, sf_small):
    """Span-union coverage equals an independent pure-Python replay:
    global k-gram occurrence counts, duplicated spans, merged-interval
    token coverage, and the integer-rational drop verdict."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    }
    spans: dict[int, list[tuple[int, int]]] = {}
    occ: dict[int, int] = {}
    n_tok: dict[int, int] = {}
    for did, text in docs.items():
        toks = [t for t in text.strip().split() if t]
        n_tok[did] = len(toks)
        ps = []
        for i in range(len(toks) - EXSUB_K + 1):
            h = _poly(" ".join(toks[i : i + EXSUB_K]))
            ps.append((i + 1, h))
            occ[h] = occ.get(h, 0) + 1
        spans[did] = ps
    expect = {}
    for did in docs:
        cov, prev_end = 0, 0
        for pos, h in spans[did]:  # positions already ascending
            if occ[h] >= 2:
                cov += max(0, pos + EXSUB_K - max(pos, prev_end))
                prev_end = max(prev_end, pos + EXSUB_K)
        drop = n_tok[did] > 0 and cov * EXSUB_DEN >= n_tok[did] * EXSUB_NUM
        expect[did] = (n_tok[did], cov, drop)
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["exsub_drop"])
        for r in q_exact_substr_coverage(spark, sf_small).collect()
    }
    assert got == expect
    # the corpus must actually exercise both verdicts and partial cover
    assert any(v[2] for v in got.values()) or all(
        v[1] == 0 for v in got.values()
    )
    assert all(0 <= v[1] <= v[0] for v in got.values())


def test_exact_substr_coverage_vs_distinct_ratio(spark, sf_small):
    """Coverage is the span-UNION, so it is bounded by K times the
    duplicated-shingle count but can be far smaller when dup shingles
    overlap one run — the quantity dup_ngram_fraction can't see."""
    rows = q_exact_substr_coverage(spark, sf_small).collect()
    nonzero = [r for r in rows if r["covered_tokens"] > 0]
    if nonzero:  # overlap compression must actually occur somewhere
        assert any(r["covered_tokens"] % EXSUB_K != 0 for r in nonzero) or any(
            r["covered_tokens"] < EXSUB_K * 2 for r in nonzero
        )


def test_phash_reverse_search_recall_and_ranks(spark, sf_small):
    """Multi-index pigeonhole: any corpus image within Hamming radius 3
    of a query shares ≥1 of the 4 16-bit bands, so the banded result
    must contain every such image unless outranked by topk closer ones.
    Ranks are consecutive from 1; hamming is non-decreasing in rank."""
    got = {}
    for r in q_phash_reverse_search(spark, sf_small).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["img_id"], r["hamming"])
        )
    assert got, "queries must exist at this SF"
    corpus = _phash_rows(range(PHASH_N_DOCS))
    queries = _revsearch_query_rows(
        sorted({q % 200_000 for q in got})
    )
    for q in queries:
        qh = q["qhash"] & 0xFFFFFFFFFFFFFFFF
        res = sorted(got[q["query_id"]])
        ranks = [t[0] for t in res]
        assert ranks == list(range(1, len(res) + 1))
        assert len(res) <= REVSEARCH_TOPK
        hams = [t[2] for t in res]
        assert hams == sorted(hams)
        # brute-force every corpus image within radius 3 (≪ topk here)
        close = sorted(
            (bin(qh ^ (r["phash"] & 0xFFFFFFFFFFFFFFFF)).count("1"), r["img_id"])
            for r in corpus
            if bin(qh ^ (r["phash"] & 0xFFFFFFFFFFFFFFFF)).count("1") <= 3
        )
        found = {(t[2], t[1]) for t in res}
        for ham, img in close[:REVSEARCH_TOPK]:
            assert (ham, img) in found
    # the planted geometry puts every query's base within the neardup
    # radius, so recall of the self-match is total
    assert all(
        any(t[1] % 100_000 == q % 200_000 and t[2] <= PHASH_MAX_HAMMING
            for t in res)
        for q, res in got.items()
    )


def test_hits_scores_matches_bruteforce(spark, sf_small):
    """Integer HITS equals an independent pure-Python replay of the
    LCG edge synthesis and the ℓ¹-rescaled mutual-reinforcement
    rounds; each rescaled vector sums to ≤ HITS_SCALE (floor loss)
    and within n_nodes of it."""
    doc_ids = sorted(
        r["doc_id"]
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    )
    n = len(doc_ids)
    edges = set()
    for src in doc_ids:
        for k in range(PR_FANOUT):
            dst = (src * PR_LCG_A + k * PR_LCG_K + PR_LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            edges.add((src, dst))
    hub = {d: HITS_SCALE for d in doc_ids}
    auth = {}
    for _ in range(HITS_ITERS):
        raw = {d: 0 for d in doc_ids}
        for s, d in edges:
            raw[d] += hub[s]
        tot = sum(raw.values())
        auth = {d: raw[d] * HITS_SCALE // tot for d in doc_ids}
        raw = {d: 0 for d in doc_ids}
        for s, d in edges:
            raw[s] += auth[d]
        tot = sum(raw.values())
        hub = {d: raw[d] * HITS_SCALE // tot for d in doc_ids}
    got = {
        r["doc_id"]: (r["auth"], r["hub"])
        for r in q_hits_scores(spark, sf_small).collect()
    }
    assert got == {d: (auth[d], hub[d]) for d in doc_ids}
    for vec in (auth, hub):
        s = sum(vec.values())
        assert HITS_SCALE - n <= s <= HITS_SCALE
    # mutual reinforcement is non-degenerate: scores differentiate
    assert len(set(auth.values())) > 1 and len(set(hub.values())) > 1


def test_hits_deterministic_under_repartition(spark, sf_small):
    """Bit-identical longs regardless of partitioning (the wide
    floor-division discipline — no float ever carries a value)."""
    base = q_hits_scores(spark, sf_small)
    re = base.repartition(13).select("doc_id", "auth", "hub")
    a = {r["doc_id"]: (r["auth"], r["hub"]) for r in base.collect()}
    b = {r["doc_id"]: (r["auth"], r["hub"]) for r in re.collect()}
    assert a == b


def test_opic_matches_bruteforce(spark, sf_small):
    """Integer OPIC equals an independent pure-Python replay: LCG edges
    minus the planted danglers' out-links, then OPIC_ITERS synchronous
    cash-banking + distribution rounds with the uniform dangling-pot
    redistribution. Also pins that the dangling path is real (the pot
    is nonzero) and total cash never grows (floor leaks only)."""
    from go_crawler_spark.functions.linkgraph import (
        OPIC_DANGLE_MOD,
        OPIC_ITERS,
        OPIC_SCALE,
        q_opic_importance,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    )
    n = len(doc_ids)
    edges = set()
    for src in doc_ids:
        if src % OPIC_DANGLE_MOD == 0:
            continue
        for k in range(PR_FANOUT):
            dst = (src * PR_LCG_A + k * PR_LCG_K + PR_LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            edges.add((src, dst))
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    danglers = [d for d in doc_ids if d not in outdeg]
    assert danglers  # the planted path must exist at this SF
    cash = {d: OPIC_SCALE for d in doc_ids}
    hist = {d: 0 for d in doc_ids}
    total_prev = sum(cash.values())
    for _ in range(OPIC_ITERS):
        pot = sum(cash[d] for d in danglers)
        assert pot > 0
        inflow = {d: 0 for d in doc_ids}
        for s, d in edges:
            inflow[d] += cash[s] // outdeg[s]
        hist = {d: hist[d] + cash[d] for d in doc_ids}
        share = pot // n
        cash = {d: inflow[d] + share for d in doc_ids}
        total = sum(cash.values())
        assert total <= total_prev  # mass leaks via floors, never grows
        total_prev = total
    got = {
        r["doc_id"]: (r["cash"], r["hist"], r["importance"])
        for r in q_opic_importance(spark, sf_small).collect()
    }
    assert got == {
        d: (cash[d], hist[d], cash[d] + hist[d]) for d in doc_ids
    }
    # the running estimate differentiates pages (usable as a priority)
    assert len({v[2] for v in got.values()}) > 1


def test_aspect_bucket_pack_matches_bruteforce(spark, sf_small):
    """Bucket argmin and batch placement equal an exact-fraction
    Python replay; every kept batch is full with distinct slots; the
    dropped tail per bucket is exactly n_bucket mod ASPECT_BATCH."""
    from fractions import Fraction

    from go_crawler_spark.functions.multimodal import (
        ASPECT_BATCH,
        ASPECT_LADDER,
        q_aspect_bucket_pack,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    )
    assign: dict[int, tuple] = {}
    buckets: dict[int, list[int]] = {}
    for d in doc_ids:
        w = 256 + (d * 37 % 129) * 8
        h = 256 + (d * 53 % 129) * 8
        best = min(
            (
                (abs(Fraction(w, h) - Fraction(bw, bh)), i, bw, bh)
                for i, (bw, bh) in enumerate(ASPECT_LADDER)
            )
        )
        assign[d] = (w, h, best[1], best[2], best[3])
        buckets.setdefault(best[1], []).append(d)
    expect = {}
    for bid, ds in buckets.items():
        n_full = len(ds) // ASPECT_BATCH * ASPECT_BATCH
        for rn, d in enumerate(sorted(ds), start=1):
            w, h, _, bw, bh = assign[d]
            expect[d] = (
                w, h, bid, bw, bh,
                (rn - 1) // ASPECT_BATCH, (rn - 1) % ASPECT_BATCH,
                rn <= n_full,
            )
    got = {
        r["doc_id"]: (
            r["w"], r["h"], r["bucket_id"], r["bucket_w"], r["bucket_h"],
            r["batch_idx"], r["slot"], r["keep"],
        )
        for r in q_aspect_bucket_pack(spark, sf_small).collect()
    }
    assert got == expect
    # structural invariants: full batches have all ASPECT_BATCH slots
    full: dict[tuple, set] = {}
    for d, v in got.items():
        if v[7]:
            full.setdefault((v[2], v[5]), set()).add(v[6])
    assert full and all(
        s == set(range(ASPECT_BATCH)) for s in full.values()
    )
    dropped: dict[int, int] = {}
    for d, v in got.items():
        if not v[7]:
            dropped[v[2]] = dropped.get(v[2], 0) + 1
    for bid, ds in buckets.items():
        assert dropped.get(bid, 0) == len(ds) % ASPECT_BATCH
    assert len(buckets) > 1  # the ladder is actually exercised


def test_dust_param_rules_planted_classes(spark, sf_small):
    """The mixed-radix synthesis plants 'ref'/'session' as content-
    irrelevant and 'page' as content-bearing; the miner must recover
    exactly that on every host, with support counted only where the
    param actually varied within a bucket."""
    from go_crawler_spark.functions.parsing import q_dust_param_rules

    rows = q_dust_param_rules(spark, sf_small).collect()
    assert rows
    by_param: dict[str, list] = {}
    for r in rows:
        by_param.setdefault(r["param"], []).append(r)
    assert set(by_param) == {"page", "ref", "session"}
    for r in by_param["ref"] + by_param["session"]:
        assert r["irrelevant"] and r["violations"] == 0 and r["supports"] >= 1
    for r in by_param["page"]:
        assert not r["irrelevant"] and r["violations"] >= 1
    # every counted group is accounted for: supports+violations never
    # exceed the group count (nv<2 groups are evidence-free)
    assert all(
        r["supports"] + r["violations"] <= r["n_groups"] for r in rows
    )


def test_domain_split_no_straddle_and_proportions(spark, sf_small):
    """Every host lands in exactly one split (the leakage-safety
    property a row-level split lacks), all three splits are non-empty
    at this SF, and the bucket is the documented reduced mix."""
    from go_crawler_spark.functions.cleaning import (
        DOMAIN_MOD,
        SPLIT_MIX_A,
        SPLIT_MIX_P,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        q_domain_split,
    )

    rows = q_domain_split(spark, sf_small).collect()
    host_splits: dict[str, set] = {}
    for r in rows:
        host_splits.setdefault(r["host"], set()).add(r["split"])
        dom = r["doc_id"] % DOMAIN_MOD
        b = (dom % SPLIT_MIX_P) * SPLIT_MIX_A % SPLIT_MIX_P % 100
        assert r["split_bucket"] == b
        want = (
            "train" if b < SPLIT_TRAIN_PCT
            else "val" if b < SPLIT_VAL_PCT
            else "test"
        )
        assert r["split"] == want
    assert all(len(s) == 1 for s in host_splits.values())
    assert {s for ss in host_splits.values() for s in ss} == {
        "train", "val", "test",
    }
    # a row-level split WOULD straddle: two docs of one host exist
    multi = [h for h, _ in host_splits.items()]
    from collections import Counter

    per_host = Counter(r["host"] for r in rows)
    assert multi and max(per_host.values()) >= 2


def test_bpe_top_pairs_matches_bruteforce(spark, sf_small):
    """The first BPE merge's candidate list equals a pure-Python
    replay: word-frequency table, count-weighted adjacent char pairs,
    (count desc, pair asc) ranking."""
    from collections import Counter

    from go_crawler_spark.functions.textstats import (
        BPE_TOPK,
        q_bpe_top_pairs,
    )

    texts = [
        r["text"]
        for r in load(spark, sf_small, "documents").select("text").collect()
    ]
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.strip().lower().split() if w)
    pc: Counter = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += n
    expect = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in q_bpe_top_pairs(spark, sf_small)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    # the ranking is over genuinely weighted counts, not raw vocab
    assert got[0][1] > 1


def test_ngram_count_of_counts_matches_bruteforce(spark, sf_small):
    """N_c equals a pure-Python bigram count; the tail pools at
    CC_MAX_C + 1; Σ_c N_c = distinct bigram count (nothing dropped)."""
    from collections import Counter

    from go_crawler_spark.functions.textstats import (
        CC_MAX_C,
        q_ngram_count_of_counts,
    )

    texts = [
        r["text"]
        for r in load(spark, sf_small, "documents").select("text").collect()
    ]
    bc: Counter = Counter()
    for t in texts:
        ws = [w for w in t.strip().lower().split() if w]
        for i in range(len(ws) - 1):
            bc[(ws[i], ws[i + 1])] += 1
    nc: Counter = Counter()
    for c in bc.values():
        nc[min(c, CC_MAX_C + 1)] += 1
    got = {
        r["c"]: r["n_bigrams"]
        for r in q_ngram_count_of_counts(spark, sf_small).collect()
    }
    assert got == dict(nc)
    assert sum(got.values()) == len(bc)


def test_shard_balance_matches_bruteforce(spark, sf_small):
    """Serpentine shard assignment equals the pure-Python replay of
    (n_tokens desc, doc_id) ranking + folded round-robin; every shard
    receives a near-equal doc count, and the token totals balance to
    within a small multiple of the largest document."""
    from go_crawler_spark.functions.textstats import (
        SHARD_N,
        q_shard_balance,
    )

    rows = [
        (r["doc_id"], len(r["text"].split()))
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    ranked = sorted(rows, key=lambda t: (-t[1], t[0]))
    expect = {}
    for r0, (did, nt) in enumerate(ranked):
        pos = r0 % SHARD_N
        shard = pos if (r0 // SHARD_N) % 2 == 0 else SHARD_N - 1 - pos
        expect[did] = (nt, r0 + 1, shard)
    got = {
        r["doc_id"]: (r["n_tokens"], r["rank"], r["shard"])
        for r in q_shard_balance(spark, sf_small).collect()
    }
    assert got == expect
    # balance: doc counts differ by ≤1; token totals by ≤ 2·max item
    from collections import Counter

    n_by = Counter(v[2] for v in got.values())
    tok_by: Counter = Counter()
    for v in got.values():
        tok_by[v[2]] += v[0]
    assert len(n_by) == SHARD_N
    assert max(n_by.values()) - min(n_by.values()) <= 1
    max_item = max(v[0] for v in got.values())
    assert max(tok_by.values()) - min(tok_by.values()) <= 2 * max_item


def test_cocitation_pairs_matches_bruteforce(spark, sf_small):
    """Co-citation counts equal the pure-Python replay of the capped
    LCG edge lists; every reported pair is ordered (a < b) and its
    count never exceeds the citing-page total."""
    from go_crawler_spark.functions.linkgraph import (
        COCIT_CAP,
        COCIT_MIN,
        q_cocitation_pairs,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    )
    n = len(doc_ids)
    outlinks: dict[int, set] = {}
    for src in doc_ids:
        for k in range(PR_FANOUT):
            dst = (src * PR_LCG_A + k * PR_LCG_K + PR_LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            outlinks.setdefault(src, set()).add(dst)
    from collections import Counter

    pc: Counter = Counter()
    for src, ds in outlinks.items():
        capped = sorted(ds)[:COCIT_CAP]
        for i in range(len(capped)):
            for j in range(i + 1, len(capped)):
                pc[(capped[i], capped[j])] += 1
    expect = {p: c for p, c in pc.items() if c >= COCIT_MIN}
    got = {
        (r["a"], r["b"]): r["n_cocited"]
        for r in q_cocitation_pairs(spark, sf_small).collect()
    }
    assert got == expect
    assert got and all(a < b for a, b in got)
    assert max(got.values()) <= len(outlinks)


def test_winnow_fingerprints_matches_bruteforce(spark, sf_small):
    """The winnowed fingerprint set equals an independent pure-Python
    replay of the Schleimer 2003 selection rule (window min, rightmost
    tie-break, distinct), and the winnowing guarantee holds: every
    window of WINNOW_W k-gram positions contains >= 1 fingerprint."""
    from go_crawler_spark.functions.cleaning import (
        WINNOW_W,
        q_winnow_fingerprints,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    }
    expect: set = set()
    pos_by_doc: dict[int, set] = {}
    for did, text in docs.items():
        toks = [t for t in text.strip().split() if t]
        hs = [
            _poly(" ".join(toks[i : i + EXSUB_K]))
            for i in range(len(toks) - EXSUB_K + 1)
        ]
        for s in range(len(hs) - WINNOW_W + 1):
            # min hash in window [s, s+W); ties -> rightmost position
            best = max(
                range(s, s + WINNOW_W), key=lambda i: (-hs[i], i)
            )
            expect.add((did, best + 1, hs[best]))
            pos_by_doc.setdefault(did, set()).add(best + 1)
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in q_winnow_fingerprints(spark, sf_small).collect()
    }
    assert got == expect
    assert got  # the corpus must actually produce fingerprints
    # guarantee: selected positions are never more than W apart, so any
    # shared run of >= W+K-1 tokens shares a fingerprint
    for did, ps in pos_by_doc.items():
        sp = sorted(ps)
        assert all(b - a <= WINNOW_W for a, b in zip(sp, sp[1:]))
    # density: winnowing keeps far fewer than all positions (expected
    # 2/(W+1)); allow slack but require real compression corpus-wide
    n_spans = sum(
        max(0, len([t for t in txt.strip().split() if t]) - EXSUB_K + 1)
        for txt in docs.values()
    )
    assert len(got) * 2 < n_spans + 2 * len(docs) * WINNOW_W


def test_trustrank_matches_bruteforce(spark, sf_small):
    """Engine TrustRank equals an independent pure-Python replay of the
    seeded integer propagation (Python ints are exact — no wide-div
    helper shared with the engine), and the demotion semantics hold:
    seeds are never farm pages, and the planted farm's mean trust sits
    below the seed mean (farms only collect organic leak-in)."""
    from go_crawler_spark.functions.linkgraph import (
        FARM_MOD,
        TR_ITERS,
        TR_SCALE,
        TR_SEED_MOD,
        TR_TELEPORT,
        farm_edges,
        link_edges,
        q_trustrank,
    )

    docs = load(spark, sf_small, "documents").select("doc_id")
    nodes = [r["doc_id"] for r in docs.collect()]
    edges = {
        (r["src"], r["dst"])
        for r in link_edges(docs).select("src", "dst").collect()
    } | {(r["src"], r["dst"]) for r in farm_edges(docs).collect()}
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    seed = {
        v: (v % TR_SEED_MOD == 1 and v % FARM_MOD != 0) for v in nodes
    }
    trust = {v: TR_SCALE if seed[v] else 0 for v in nodes}
    for _ in range(TR_ITERS):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += trust[s] // outdeg[s]
        trust = {
            v: inflow[v] * 85 // 100 + (TR_TELEPORT if seed[v] else 0)
            for v in nodes
        }
    expect = {
        v: (seed[v], v % FARM_MOD == 0, trust[v]) for v in nodes
    }
    got = {
        r["doc_id"]: (r["is_seed"], r["is_farm"], r["trust"])
        for r in q_trustrank(spark, sf_small).collect()
    }
    assert got == expect
    seeds = [v for v in nodes if seed[v]]
    farm = [v for v in nodes if v % FARM_MOD == 0]
    assert seeds and farm
    assert not any(seed[v] for v in farm)  # vetting excludes the farm
    mean_seed = sum(trust[v] for v in seeds) // len(seeds)
    mean_farm = sum(trust[v] for v in farm) // len(farm)
    assert mean_farm < mean_seed


def test_containment_pairs_matches_bruteforce(spark, sf_small):
    """Containment columns equal a pure-Python replay over the pinned
    LSH candidate pair set (candidate generation is pinned by its own
    oracle/tests; the new logic under test is the containment math),
    plus the Broder bounds: n_common <= min(|A|,|B|), ppm in [0, 1e6],
    flag <=> max side containment >= threshold."""
    from go_crawler_spark.functions.similarity import (
        CONTAIN_PPM_THRESH,
        q_containment_pairs,
        q_minhash_lsh_candidates,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def sh3(text: str) -> set:
        toks = [t for t in text.strip().split() if t]
        return {
            _poly(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)
        }

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_lsh_candidates(spark, sf_small).collect()
    }
    assert pairs
    expect = {}
    for a, b in pairs:
        sa, sb = sh3(texts[a]), sh3(texts[b])
        common = len(sa & sb)
        ca = common * 1_000_000 // len(sa) if sa else 0
        cb = common * 1_000_000 // len(sb) if sb else 0
        expect[(a, b)] = (
            len(sa), len(sb), common, ca, cb,
            max(ca, cb) >= CONTAIN_PPM_THRESH,
        )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_sh_a"], r["n_sh_b"], r["n_common"],
            r["contain_a_ppm"], r["contain_b_ppm"], r["subset_flag"],
        )
        for r in q_containment_pairs(spark, sf_small).collect()
    }
    assert got == expect
    for na, nb, common, ca, cb, _flag in got.values():
        assert common <= min(na, nb)
        assert 0 <= ca <= 1_000_000 and 0 <= cb <= 1_000_000


def test_containment_flags_subset_jaccard_misses(spark):
    """The semantic point of containment: a short doc wholly embedded in
    a long one reaches 1e6 ppm containment (flagged) while its Jaccard
    stays below the near-dup resemblance threshold."""
    from go_crawler_spark.functions.similarity import (
        CONTAIN_PPM_THRESH,
        jaccard,
        shingle_hashes,
    )
    from go_crawler_spark.functions.textstats import _floordiv

    quote = "alpha beta gamma delta epsilon zeta"
    host = quote + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    df = spark.createDataFrame([(quote, host)], "a string, b string")
    row = df.select(
        F.size(shingle_hashes(F.col("a"))).cast("long").alias("n_a"),
        F.size(
            F.array_intersect(
                shingle_hashes(F.col("a")), shingle_hashes(F.col("b"))
            )
        )
        .cast("long")
        .alias("n_common"),
        jaccard(shingle_hashes(F.col("a")), shingle_hashes(F.col("b"))).alias(
            "jac"
        ),
    ).select(
        "n_a",
        "n_common",
        "jac",
        _floordiv(F.col("n_common") * 1_000_000, F.col("n_a")).alias("ca"),
    ).collect()[0]
    assert row["ca"] == 1_000_000  # every quote shingle is in the host
    assert row["ca"] >= CONTAIN_PPM_THRESH
    assert row["jac"] < 0.1  # resemblance misses this duplication class


def test_host_graph_rank_matches_bruteforce(spark, sf_small):
    """Host-supergraph rank equals a pure-Python integer replay of the
    contraction + damped propagation (exact ints, no shared helpers),
    every host keeps a rank row (uncrawled-URL priority needs one even
    for sink hosts), and intra-host edges contribute nothing."""
    from go_crawler_spark.functions.linkgraph import (
        HOST_BLOCK,
        PR_ITERS,
        PR_SCALE,
        PR_TELEPORT,
        link_edges,
        q_host_graph_rank,
    )

    docs = load(spark, sf_small, "documents").select("doc_id")
    pages = [r["doc_id"] for r in docs.collect()]
    n_pages: dict[int, int] = {}
    for p in pages:
        n_pages[p // HOST_BLOCK] = n_pages.get(p // HOST_BLOCK, 0) + 1
    hedges = {
        (r["src"] // HOST_BLOCK, r["dst"] // HOST_BLOCK)
        for r in link_edges(docs).select("src", "dst").collect()
        if r["src"] // HOST_BLOCK != r["dst"] // HOST_BLOCK
    }
    outdeg: dict[int, int] = {}
    for s, _ in hedges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {h: PR_SCALE for h in n_pages}
    for _ in range(PR_ITERS):
        inflow = {h: 0 for h in n_pages}
        for s, d in hedges:
            inflow[d] += pr[s] // outdeg[s]
        pr = {h: PR_TELEPORT + inflow[h] * 85 // 100 for h in n_pages}
    got = {
        r["host_id"]: (r["n_pages"], r["pr"])
        for r in q_host_graph_rank(spark, sf_small).collect()
    }
    assert got == {h: (n_pages[h], pr[h]) for h in n_pages}
    # the contraction really shrank the iteration domain
    assert len(n_pages) < len(pages)


def test_focused_frontier_matches_bruteforce(spark, sf_small):
    """Focused-crawl priority equals a pure-Python replay of the
    per-target inbound-evidence aggregation, and the blend is bounded:
    priority_ppm is in [0, 1e6] (weights sum to 10, scale 1e5), with
    the gate exactly prio >= FOCUS_PRIORITY_MIN."""
    from go_crawler_spark.functions.linkgraph import (
        ANCHOR_MOD,
        FOCUS_PAGE_MOD,
        FOCUS_PAGE_TOPICAL,
        FOCUS_PRIORITY_MIN,
        FOCUS_TOPIC_ANCHORS,
        FOCUS_W_ANCHOR,
        FOCUS_W_PARENT,
        link_edges,
        q_focused_frontier,
    )

    docs = load(spark, sf_small, "documents").select("doc_id")
    edges = [
        (r["src"], r["dst"])
        for r in link_edges(docs).select("src", "dst").collect()
    ]
    agg: dict[int, list[int]] = {}
    for s, d in edges:
        row = agg.setdefault(d, [0, 0, 0])
        row[0] += 1
        row[1] += 1 if s % ANCHOR_MOD < FOCUS_TOPIC_ANCHORS else 0
        row[2] += 1 if s % FOCUS_PAGE_MOD < FOCUS_PAGE_TOPICAL else 0
    expect = {}
    for d, (n_in, na, npar) in agg.items():
        prio = (na * FOCUS_W_ANCHOR + npar * FOCUS_W_PARENT) * 100_000 // n_in
        expect[d] = (n_in, na, npar, prio, prio >= FOCUS_PRIORITY_MIN)
    got = {
        r["dst"]: (
            r["n_inlinks"],
            r["n_topic_anchors"],
            r["n_topic_parents"],
            r["priority_ppm"],
            r["crawl_next"],
        )
        for r in q_focused_frontier(spark, sf_small).collect()
    }
    assert got == expect
    assert all(0 <= v[3] <= 1_000_000 for v in got.values())
    assert any(v[4] for v in got.values())
    assert not all(v[4] for v in got.values())


def test_mirror_hosts_matches_bruteforce(spark, sf_small):
    """Mirror detection equals a pure-Python replay of the sketch /
    capped-pairing / resemblance math, and the planted semantics hold:
    the flagged set is exactly the planted (h-1, h ≡ 1 mod MIRROR_MOD)
    predecessor pairs, each sharing its full sketch."""
    from go_crawler_spark.functions.linkgraph import HOST_BLOCK
    from go_crawler_spark.functions.similarity import (
        MIRROR_FP_A,
        MIRROR_FP_CAP,
        MIRROR_FP_P,
        MIRROR_MOD,
        MIRROR_PPM_MIN,
        MIRROR_SKETCH_K,
        q_mirror_hosts,
    )

    docs = load(spark, sf_small, "documents").select("doc_id")
    pages = [r["doc_id"] for r in docs.collect()]
    fps: dict[int, set[int]] = {}
    for p in pages:
        h = p // HOST_BLOCK
        src = (h - 1) * HOST_BLOCK + p % HOST_BLOCK if h % MIRROR_MOD == 1 else p
        fps.setdefault(h, set()).add(src % MIRROR_FP_P * MIRROR_FP_A % MIRROR_FP_P)
    sketch = {h: sorted(s)[:MIRROR_SKETCH_K] for h, s in fps.items()}
    by_fp: dict[int, list[int]] = {}
    for h, sk in sketch.items():
        for fp in sk:
            by_fp.setdefault(fp, []).append(h)
    shared: dict[tuple[int, int], int] = {}
    for fp, hosts in by_fp.items():
        if len(hosts) > MIRROR_FP_CAP:
            continue
        hosts = sorted(hosts)
        for i, a in enumerate(hosts):
            for b in hosts[i + 1:]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    expect = {}
    for (a, b), n in shared.items():
        res = n * 1_000_000 // min(len(sketch[a]), len(sketch[b]))
        expect[(a, b)] = (
            n, len(sketch[a]), len(sketch[b]), res, res >= MIRROR_PPM_MIN
        )
    got = {
        (r["host_a"], r["host_b"]): (
            r["n_shared"], r["k_a"], r["k_b"],
            r["resemblance_ppm"], r["is_mirror"],
        )
        for r in q_mirror_hosts(spark, sf_small).collect()
    }
    assert got == expect
    planted = {
        (h - 1, h) for h in fps if h % MIRROR_MOD == 1 and h - 1 in fps
    }
    assert planted
    assert {p for p, v in got.items() if v[4]} == planted
    # a full mirror shares its entire sketch
    assert all(got[p][0] == min(got[p][1], got[p][2]) for p in planted)


def test_dedup_best_copy_matches_bruteforce(spark, sf_small):
    """Best-copy keeper equals a pure-Python replay over the golden
    component map, exactly one keep per component, and the rule is
    live in both directions: some cluster's keeper is NOT the min-id
    canonical (the variant out-resolved its base) and some cluster's
    keeper IS the base (resolution broke the other way)."""
    from go_crawler_spark.functions.multimodal import (
        BESTCOPY_BASE_PX,
        BESTCOPY_SCALE_MOD,
        PHASH_VARIANT_OFFSET,
        phash_components_golden,
        q_dedup_best_copy,
    )

    comp = {i: c for i, c, _ in phash_components_golden()}
    members: dict[int, list[int]] = {}
    for i, c in comp.items():
        members.setdefault(c, []).append(i)

    def npx(i: int) -> int:
        side = BESTCOPY_BASE_PX * (1 + i % BESTCOPY_SCALE_MOD)
        return side * side

    keeper = {
        c: min(ms, key=lambda i: (-npx(i), i)) for c, ms in members.items()
    }
    expect = {
        i: (comp[i], npx(i), keeper[comp[i]] == i) for i in comp
    }
    got = {
        r["img_id"]: (r["component"], r["n_pixels"], r["keep"])
        for r in q_dedup_best_copy(spark, sf_small).collect()
    }
    assert got == expect
    per_comp = {}
    for i, (c, _, k) in got.items():
        per_comp[c] = per_comp.get(c, 0) + (1 if k else 0)
    assert all(n == 1 for n in per_comp.values())
    multi = [c for c, ms in members.items() if len(ms) > 1]
    assert multi
    variant_wins = [
        c for c in multi if keeper[c] >= PHASH_VARIANT_OFFSET
    ]
    base_wins = [c for c in multi if keeper[c] < PHASH_VARIANT_OFFSET]
    assert variant_wins and base_wins
    # the rule genuinely differs from the min-id canonical
    assert any(keeper[c] != min(members[c]) for c in multi)


def test_crawl_depth_matches_bruteforce(spark, sf_small):
    """BFS crawl depth equals a pure-Python BFS over the collected edge
    set, the wavefront is monotone (every hop-h node has an in-edge
    from a hop-(h-1) node), and both reached and unreached classes
    exist at this corpus size."""
    from go_crawler_spark.functions.linkgraph import (
        DEPTH_MAX,
        DEPTH_SEED_MOD,
        link_edges,
        q_crawl_depth,
    )

    docs = load(spark, sf_small, "documents").select("doc_id")
    nodes = [r["doc_id"] for r in docs.collect()]
    adj: dict[int, list[int]] = {}
    for r in link_edges(docs).select("src", "dst").collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    hop = {v: 0 for v in nodes if v % DEPTH_SEED_MOD == 0}
    frontier = set(hop)
    for h in range(1, DEPTH_MAX + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, []):
                if v not in hop:
                    nxt.add(v)
        for v in nxt:
            hop[v] = h
        frontier = nxt
    expect = {
        v: (v % DEPTH_SEED_MOD == 0, hop.get(v, -1)) for v in nodes
    }
    got = {
        r["doc_id"]: (r["is_seed"], r["first_hop"])
        for r in q_crawl_depth(spark, sf_small).collect()
    }
    assert got == expect
    hops = {v for _, v in got.values()}
    assert {0, 1, -1} <= hops  # seeds, first wave, and unreached all exist
    # monotone wavefront: every hop-h node has a hop-(h-1) in-neighbor
    rev: dict[int, list[int]] = {}
    for u, vs in adj.items():
        for v in vs:
            rev.setdefault(v, []).append(u)
    for v, (_, h) in got.items():
        if h > 0:
            assert any(got[u][1] == h - 1 for u in rev.get(v, []))


def test_spam_url_score_matches_bruteforce(spark, sf_small):
    """Lexical spam verdict equals a pure-Python replay computed FROM
    THE URL STRING (not the synthesis class), and the classes the
    weights provably separate behave: clean product pages never flag;
    hyphen-stuffed, deep-path, and IP-host classes always flag."""
    from go_crawler_spark.functions.parsing import (
        SPAMURL_DEPTH_FREE,
        SPAMURL_DIGIT_FREE,
        SPAMURL_THRESHOLD,
        SPAMURL_W_DEPTH,
        SPAMURL_W_DIGIT,
        SPAMURL_W_HYPHEN,
        SPAMURL_W_IP,
        q_spam_url_score,
    )
    import re

    rows = q_spam_url_score(spark, sf_small).collect()
    assert rows
    cls_flags: dict[int, list[bool]] = {}
    for r in rows:
        url = r["url"]
        host = url.split("/", 1)[0]
        n_digits = sum(c.isdigit() for c in url)
        n_hyphens = url.count("-")
        path_depth = url.count("/")
        host_is_ip = re.fullmatch(r"[0-9.]+", host) is not None
        score = (
            n_hyphens * SPAMURL_W_HYPHEN
            + max(0, n_digits - SPAMURL_DIGIT_FREE) * SPAMURL_W_DIGIT
            + max(0, path_depth - SPAMURL_DEPTH_FREE) * SPAMURL_W_DEPTH
            + (SPAMURL_W_IP if host_is_ip else 0)
        )
        assert (
            r["url_len"], r["n_digits"], r["n_hyphens"], r["path_depth"],
            r["host_is_ip"], r["spam_score"], r["is_spam"],
        ) == (
            len(url), n_digits, n_hyphens, path_depth,
            host_is_ip, score, score >= SPAMURL_THRESHOLD,
        )
        cls_flags.setdefault(r["url_key"] % 5, []).append(r["is_spam"])
    assert set(cls_flags) == {0, 1, 2, 3, 4}
    assert not any(cls_flags[0])  # clean pages never flag
    assert all(cls_flags[1])  # 6 hyphens * 5 = 30 >= threshold
    assert all(cls_flags[2])  # depth 7 -> (7-4)*10 = 30 >= threshold
    assert all(cls_flags[4])  # IP host alone = 40 >= threshold
    # digit-heavy class flags in the typical case (short-id outliers may
    # legitimately score clean -- the verdict is string-derived)
    flagged3 = sum(cls_flags[3]) / len(cls_flags[3])
    assert flagged3 > 0.9


def test_fuzzy_decontaminate_matches_bruteforce(spark, sf_small):
    """Fuzzy decontamination equals a pure-Python replay over the
    pinned LSH candidate pair set (candidate generation is pinned by
    its own oracle; the logic under test is the cross-split
    restriction, signature matching, and best-eval selection), and it
    catches leakage exact decontamination misses: some fuzzy-flagged
    doc is NOT exact-flagged."""
    from go_crawler_spark.functions.cleaning import (
        DECON_EVAL_MOD,
        FUZZYDECON_MIN_MATCH,
        q_decontaminate,
        q_fuzzy_decontaminate,
    )
    from go_crawler_spark.functions.similarity import (
        MINHASH_PERMS,
        P31,
        q_minhash_lsh_candidates,
    )

    docs = load(spark, sf_small, "documents").select("doc_id", "text").collect()

    def poly(s: str) -> int:
        acc = 0
        for c in s:
            acc = (acc * 31 + ord(c)) % P31
        return acc

    sig = {}
    for r in docs:
        hs = {poly(t) for t in r["text"].split() if t}
        if hs:
            sig[r["doc_id"]] = [
                min((h * a + b) % P31 for h in hs) for (a, b) in MINHASH_PERMS
            ]
    cand = [
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_lsh_candidates(spark, sf_small).collect()
    ]
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for a, b in cand:
        if (a % DECON_EVAL_MOD == 0) == (b % DECON_EVAL_MOD == 0):
            continue
        t, e = (b, a) if a % DECON_EVAL_MOD == 0 else (a, b)
        n = sum(x == y for x, y in zip(sig[t], sig[e]))
        per_doc.setdefault(t, []).append((n, e))
    expect = {}
    for r in docs:
        d = r["doc_id"]
        if d % DECON_EVAL_MOD == 0:
            continue
        ms = per_doc.get(d, [])
        if ms:
            best_n, best_e = max(ms, key=lambda t: (t[0], -t[1]))
            expect[d] = (len(ms), best_e, best_n, best_n >= FUZZYDECON_MIN_MATCH)
        else:
            expect[d] = (0, -1, 0, False)
    got = {
        r["doc_id"]: (
            r["n_cand"], r["eval_id"], r["n_match"], r["fuzzy_contaminated"]
        )
        for r in q_fuzzy_decontaminate(spark, sf_small).collect()
    }
    assert got == expect
    flagged = {d for d, v in got.items() if v[3]}
    assert flagged and len(flagged) < len(got)
    exact_flagged = {
        r["doc_id"]
        for r in q_decontaminate(spark, sf_small).collect()
        if r["contaminated"]
    }
    assert flagged - exact_flagged  # fuzzy catches what exact misses


def test_image_decontaminate_matches_bruteforce(spark, sf_small):
    """Image decontamination equals an in-test pure-Python replay over
    the full phash corpus (banded candidates + hot-bucket cap +
    cross-split restriction + closest-eval pick), and the flagged set
    is exactly the planted near-copies whose twin landed in the eval
    split — both directions (train base / eval variant and eval base /
    train variant)."""
    from go_crawler_spark.functions.multimodal import (
        _PHASH_BANDS,
        IMGDECON_EVAL_MOD,
        IMGDECON_NO_MATCH,
        PHASH_MAX_BUCKET,
        PHASH_MAX_HAMMING,
        PHASH_N_DOCS,
        PHASH_VARIANT_OFFSET,
        _phash_rows,
        q_image_decontaminate,
    )

    rows = _phash_rows(range(PHASH_N_DOCS))
    from collections import Counter

    bucket_n: Counter = Counter()
    for r in rows:
        h = r["phash"] & 0xFFFFFFFFFFFFFFFF
        for k in range(_PHASH_BANDS):
            bucket_n[(k, (h >> (16 * k)) & 0xFFFF)] += 1
    per_train: dict[int, list[tuple[int, int]]] = {}
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            ea = ra["img_id"] % IMGDECON_EVAL_MOD == 0
            eb = rb["img_id"] % IMGDECON_EVAL_MOD == 0
            if ea == eb:
                continue
            ha = ra["phash"] & 0xFFFFFFFFFFFFFFFF
            hb = rb["phash"] & 0xFFFFFFFFFFFFFFFF
            if not any(
                (ha >> (16 * k)) & 0xFFFF == (hb >> (16 * k)) & 0xFFFF
                and bucket_n[(k, (ha >> (16 * k)) & 0xFFFF)]
                <= PHASH_MAX_BUCKET
                for k in range(_PHASH_BANDS)
            ):
                continue
            t, e = (rb, ra) if ea else (ra, rb)
            per_train.setdefault(t["img_id"], []).append(
                (bin(ha ^ hb).count("1"), e["img_id"])
            )
    expect = {}
    for r in rows:
        t = r["img_id"]
        if t % IMGDECON_EVAL_MOD == 0:
            continue
        ms = per_train.get(t, [])
        if ms:
            hm, ev = min(ms)
            expect[t] = (len(ms), ev, hm, hm <= PHASH_MAX_HAMMING)
        else:
            expect[t] = (0, -1, IMGDECON_NO_MATCH, False)
    got = {
        r["img_id"]: (r["n_cand"], r["eval_img"], r["hamming"], r["img_contaminated"])
        for r in q_image_decontaminate(spark, sf_small).collect()
    }
    assert got == expect
    # The flagged set is exactly the planted cross-split near-copies:
    # bases whose variant is eval (did%10==7, variant_id%7==0 is false,
    # did%7==2 makes the VARIANT eval) and variants whose base is eval.
    flagged = {t for t, v in got.items() if v[3]}
    expect_flagged = set()
    for did in range(PHASH_N_DOCS):
        if did % 10 != 7:
            continue  # no planted variant
        vid = did + PHASH_VARIANT_OFFSET
        base_eval = did % IMGDECON_EVAL_MOD == 0
        var_eval = vid % IMGDECON_EVAL_MOD == 0
        if var_eval and not base_eval:
            expect_flagged.add(did)  # train base leaked via eval variant
        if base_eval and not var_eval:
            expect_flagged.add(vid)  # train variant leaked via eval base
    assert flagged == expect_flagged
    # both leak directions present
    assert any(t < PHASH_VARIANT_OFFSET for t in flagged)
    assert any(t >= PHASH_VARIANT_OFFSET for t in flagged)


def test_redirect_resolve_matches_bruteforce(spark, sf_small):
    """Pointer-doubling resolution equals a sequential pointer chase
    over the engine's own edge table (independent of the oracle's
    closed-form permutation inverse), chains are acyclic and shorter
    than the block, and every full block realizes every chain length
    0..REDIR_BLOCK−1 exactly once."""
    from go_crawler_spark.functions.linkgraph import (
        REDIR_BLOCK,
        q_redirect_resolve,
        redirect_edges,
    )

    docs_df = load(spark, sf_small, "documents").select("doc_id")
    ids = [r["doc_id"] for r in docs_df.collect()]
    nxt = {r["src"]: r["dst"] for r in redirect_edges(docs_df).collect()}
    expect = {}
    for d in ids:
        cur, hops = d, 0
        while cur in nxt:
            cur = nxt[cur]
            hops += 1
            assert hops < REDIR_BLOCK
        expect[d] = (hops == 0, cur, hops)
    got = {
        r["doc_id"]: (r["is_terminal"], r["final_url"], r["n_hops"])
        for r in q_redirect_resolve(spark, sf_small).collect()
    }
    assert got == expect
    from collections import Counter

    members = Counter(d // REDIR_BLOCK for d in ids)
    full = {b for b, c in members.items() if c == REDIR_BLOCK}
    ragged = len(ids) - len(full) * REDIR_BLOCK
    lengths: dict[int, set[int]] = {}
    for d, (_, _, h) in got.items():
        if d // REDIR_BLOCK in full:
            lengths.setdefault(d // REDIR_BLOCK, set()).add(h)
    assert lengths and all(
        s == set(range(REDIR_BLOCK)) for s in lengths.values()
    )
    n_term = sum(1 for t, _, _ in got.values() if t)
    assert n_term == len(full) + ragged


def test_priority_sample_matches_bruteforce(spark, sf_small):
    """Salted two-phase top-k equals the full per-source sort: same
    sample membership, ranks, τ threshold, and ŵ estimates as a
    pure-Python replay of the Duffield-Lund-Thorup definition."""
    from collections import defaultdict

    from go_crawler_spark.functions.textstats import (
        PRIO_K,
        PRIO_SCALE,
        SAMPLE_MINSTD,
        SAMPLE_P31,
        q_priority_sample,
    )

    rows = (
        load(spark, sf_small, "documents")
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        w = max(r["n_chars"], 1)
        h = (
            (r["doc_id"] % SAMPLE_P31)
            * SAMPLE_MINSTD
            % SAMPLE_P31
            * SAMPLE_MINSTD
            % SAMPLE_P31
            + 1
        )
        groups[r["source"]].append((w * PRIO_SCALE // h, r["doc_id"], w))
    expect = {}
    counts = {}
    for src, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tau = items[PRIO_K][0] if len(items) > PRIO_K else 0
        counts[src] = min(PRIO_K, len(items))
        for rk, (key, did, w) in enumerate(items[:PRIO_K], 1):
            expect[(src, did)] = (w, key, rk, tau, max(w * PRIO_SCALE, tau))
    sampled = q_priority_sample(spark, sf_small).collect()
    got = {
        (r["source"], r["doc_id"]): (
            r["w"],
            r["prio_key"],
            r["rk"],
            r["tau_key"],
            r["w_hat_scaled"],
        )
        for r in sampled
    }
    assert got == expect
    per_src = defaultdict(int)
    for src, _ in got:
        per_src[src] += 1
    assert dict(per_src) == counts


def test_hll_set_ops_parity_and_merge(spark, sf_small):
    """The three estimates equal an independent pure-Python sketch
    (union registers = elementwise max of the shard registers — the
    merge law), exacts match real distinct counts, inclusion-exclusion
    is replayed bit-for-bit, and the union estimate lands in the
    2/sqrt(m) band."""
    import pandas as pd

    from go_crawler_spark.functions.sketches import (
        HLL_M,
        HLL_MIX_A,
        HLL_MIX_B,
        HLL_VALUE_BITS,
        q_hll_set_ops,
    )

    li = pd.read_parquet(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )

    def sketch(keys):
        regs: dict[int, int] = {}
        for k in keys:
            h = (_poly(k) * HLL_MIX_A) % P31 * HLL_MIX_B % P31
            j, v = h % HLL_M, h // HLL_M
            rank = (HLL_VALUE_BITS + 1) - (v.bit_length() if v else 0)
            regs[j] = max(regs.get(j, 0), rank)
        return regs

    def est(regs):
        s = sum(2.0 ** (-m) for m in regs.values()) + (HLL_M - len(regs))
        return (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M / s

    in_a = li["l_suppkey"] % 2 == 0
    ka = [str(k) for k in li["l_orderkey"][in_a]]
    kb = [str(k) for k in li["l_orderkey"][~in_a]]
    ra, rb = sketch(ka), sketch(kb)
    ru = {
        j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)
    }  # the merge law: registers max, keys never re-read
    assert ru == sketch(ka + kb)  # merged sketch == sketch of the union
    row = q_hll_set_ops(spark, sf_small).collect()[0]
    assert row["m"] == HLL_M
    assert row["est_a"] == est(ra)
    assert row["est_b"] == est(rb)
    assert row["est_union"] == est(ru)
    assert row["est_intersect"] == est(ra) + est(rb) - est(ru)
    sa, sb = set(ka), set(kb)
    assert row["exact_a"] == len(sa)
    assert row["exact_b"] == len(sb)
    assert row["exact_union"] == len(sa | sb)
    assert row["exact_intersect"] == len(sa & sb)
    assert abs(row["est_union"] - len(sa | sb)) <= 0.125 * len(sa | sb)


def test_good_turing_matches_bruteforce(spark, sf_small):
    """The discount table equals a pure-Python Good-Turing replay:
    exact N_r / N_{r+1} / N, the r* division, and the unseen mass p0 —
    and the classic sanity r* < r for heavy-tailed N_r holds at r=1."""
    from collections import Counter

    from go_crawler_spark.functions.textstats import GT_MAX_R, q_good_turing

    texts = [
        r["text"]
        for r in load(spark, sf_small, "documents").select("text").collect()
    ]
    bc: Counter = Counter()
    for t in texts:
        ws = [w for w in t.strip().lower().split() if w]
        for i in range(len(ws) - 1):
            bc[(ws[i], ws[i + 1])] += 1
    nr: Counter = Counter(bc.values())
    total = sum(bc.values())
    n1 = nr.get(1, 0)
    expected = {
        r: (
            nr[r],
            nr.get(r + 1, 0),
            (r + 1) * nr.get(r + 1, 0) / nr[r],
            total,
            n1 / total,
        )
        for r in range(1, GT_MAX_R + 1)
        if nr.get(r, 0) > 0
    }
    got = {
        row["r"]: (
            row["n_r"],
            row["n_r1"],
            row["r_star"],
            row["total_grams"],
            row["p0_unseen"],
        )
        for row in q_good_turing(spark, sf_small).collect()
    }
    assert got == expected
    assert 1 in got and got[1][2] < 1.0  # singleton mass discounts down
    assert 0.0 < got[1][4] < 1.0


def test_phash_dihedral_matches_golden_and_invariance(spark, sf_small):
    """Spark rows equal the pixel-road golden replay; every planted
    flip/rotation groups with its base under the canonical hash while
    its PLAIN phash differs (the hole this op closes); and the
    canonical hash is invariant under all 8 dihedral transforms."""
    import numpy as np

    from go_crawler_spark.functions.multimodal import (
        DIH_PLANT_MOD,
        DIH_VARIANT_OFFSET,
        _phash_pixels,
        dihedral_min_hash,
        dihedral_transform,
        phash64_int,
        phash_dihedral_golden,
        q_phash_dihedral,
    )

    golden = phash_dihedral_golden()
    got = sorted(
        (
            r["img_id"],
            r["phash"],
            r["dihedral_phash"],
            r["canon_img"],
            r["group_size"],
        )
        for r in q_phash_dihedral(spark, sf_small).collect()
    )
    assert got == golden
    rows = {r[0]: r for r in golden}
    planted = [
        d for d in range(PHASH_N_DOCS) if d % DIH_PLANT_MOD == 3
    ]
    assert planted
    for d in planted:
        base, var = rows[d], rows[d + DIH_VARIANT_OFFSET]
        assert var[2] == base[2] and var[3] == d  # same canon group
        assert var[4] == base[4] == 2
        assert var[1] != base[1]  # plain phash misses the transform
    for d in (0, 3, 76, 151):  # invariance, incl. the float-road trap doc
        px = _phash_pixels(d)
        canons = {
            dihedral_min_hash(
                phash64_int(np.ascontiguousarray(dihedral_transform(px, k)))
            )
            for k in range(8)
        }
        assert len(canons) == 1


def test_phash_threshold_audit_matches_golden(spark, sf_small):
    """Sweep rows equal the brute-force golden; flagged/tp counts are
    monotone in t; the accounting identities hold on every row."""
    from go_crawler_spark.functions.multimodal import (
        phash_threshold_audit_golden,
        q_phash_threshold_audit,
    )

    golden = phash_threshold_audit_golden()
    got = sorted(
        (
            r["t"],
            r["n_flagged"],
            r["n_tp"],
            r["n_fp"],
            r["n_fn"],
            r["n_true_total"],
        )
        for r in q_phash_threshold_audit(spark, sf_small).collect()
    )
    assert got == golden
    for (t0, f0, tp0, *_), (t1, f1, tp1, *_) in zip(got, got[1:]):
        assert f1 >= f0 and tp1 >= tp0
    for t, fl, tp, fp, fn, tt in got:
        assert fp == fl - tp and fn == tt - tp and 0 <= tp <= tt


def test_hrw_shard_minimal_movement_and_bruteforce(spark, sf_small):
    """Rendezvous assignment equals a pure-Python argmax replay at both
    fleet sizes, and the grow N→N+1 moves hosts ONLY to the new shard
    (the HRW minimal-movement guarantee), at roughly a 1/(N+1) rate."""
    from go_crawler_spark.functions.relational import (
        HRW_A,
        HRW_C,
        HRW_N_A,
        HRW_N_B,
        HRW_P,
        q_hrw_shard,
    )

    rows = q_hrw_shard(spark, sf_small).collect()
    assert rows

    def owner(h: int, n: int) -> int:
        best = max(
            (h % HRW_P + (s + 1) * HRW_C) * HRW_A % HRW_P * 64 + (63 - s)
            for s in range(n)
        )
        return 63 - best % 64

    moved = 0
    for r in rows:
        assert r["shard_a"] == owner(r["host_num"], HRW_N_A)
        assert r["shard_b"] == owner(r["host_num"], HRW_N_B)
        assert 0 <= r["shard_a"] < HRW_N_A
        assert 0 <= r["shard_b"] < HRW_N_B
        assert r["moved"] == (r["shard_a"] != r["shard_b"])
        if r["moved"]:
            # an existing shard can never steal a host during a grow
            assert r["shard_b"] == HRW_N_B - 1
            moved += 1
    # E[moved] = n_hosts/HRW_N_B; loose 3x bounds keep this SF-stable
    n = len(rows)
    assert n / (3 * HRW_N_B) <= moved <= 3 * n / HRW_N_B


def test_heaps_vocab_growth_matches_bruteforce(spark, sf_small):
    """Cumulative vocab/token curve equals an independent pure-Python
    prefix replay, is monotone, and ends at the corpus totals."""
    from go_crawler_spark.functions.textstats import (
        HEAPS_BUCKETS,
        q_heaps_vocab_growth,
    )

    docs = (
        load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    )
    mx = max(r["doc_id"] for r in docs) + 1
    tok_per_b = [0] * HEAPS_BUCKETS
    first: dict[str, int] = {}
    for r in docs:
        b = r["doc_id"] * HEAPS_BUCKETS // mx
        for t in r["text"].strip().lower().split():
            if not t:
                continue
            tok_per_b[b] += 1
            if t not in first or first[t] > b:
                first[t] = b
    cum_t, cum_v, expect = 0, 0, []
    vocab_per_b = [0] * HEAPS_BUCKETS
    for t, b in first.items():
        vocab_per_b[b] += 1
    for b in range(HEAPS_BUCKETS):
        cum_t += tok_per_b[b]
        cum_v += vocab_per_b[b]
        expect.append((b, cum_t, cum_v))
    got = sorted(
        (r["bucket"], r["cum_tokens"], r["cum_vocab"])
        for r in q_heaps_vocab_growth(spark, sf_small).collect()
    )
    assert got == expect
    assert got[-1][2] == len(first)  # total distinct vocabulary


def test_postings_delta_bytes_matches_bruteforce(spark, sf_small):
    """Gap/varint byte totals equal a pure-Python posting-list replay,
    and compression never exceeds the raw 8-byte/posting size."""
    from go_crawler_spark.functions.search import (
        INDEX_DF_MIN,
        VARINT_STEPS,
        q_postings_delta_bytes,
    )

    docs = (
        load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    )
    posts: dict[str, set[int]] = {}
    for r in docs:
        for t in set(r["text"].strip().lower().split()):
            if t:
                posts.setdefault(t, set()).add(r["doc_id"])

    def vbytes(gap: int) -> int:
        return 1 + sum(1 for s in VARINT_STEPS if gap >= s)

    expect = {}
    for term, ids in posts.items():
        if len(ids) < INDEX_DF_MIN:
            continue
        ordered = sorted(ids)
        gaps = [ordered[0] + 1] + [
            b - a for a, b in zip(ordered, ordered[1:])
        ]
        var = sum(vbytes(g) for g in gaps)
        raw = 8 * len(ids)
        expect[term] = (len(ids), raw, var, (raw - var) * 1000 // raw)
    got = {
        r["term"]: (
            r["df"],
            r["raw_bytes"],
            r["varint_bytes"],
            r["savings_permille"],
        )
        for r in q_postings_delta_bytes(spark, sf_small).collect()
    }
    assert got == expect
    for df, raw, var, _ in got.values():
        assert var <= raw


def test_thumb_pyramid_matches_bruteforce(spark, sf_small):
    """Pyramid sizing equals a pure-Python replay over the decoded
    dims, level 0 is always stored (codec min edge 24 ≥ PYR_MIN_DIM),
    and the tower never exceeds the 4/3 geometric bound by more than
    halving-rounding slack."""
    from go_crawler_spark.crawl import codec
    from go_crawler_spark.functions.multimodal import (
        PYR_MAX_LVL,
        PYR_MIN_DIM,
        PYR_N_DOCS,
        q_thumb_pyramid_bytes,
    )

    expect = {}
    for did in range(PYR_N_DOCS):
        px, _ = codec.decode(codec.payload_for(f"doc-{did}")["bytes"])
        w, h = int(px.shape[1]), int(px.shape[0])
        pyr, n = 0, 0
        for lv in range(PYR_MAX_LVL + 1):
            cw = (w + (1 << lv) - 1) >> lv
            ch = (h + (1 << lv) - 1) >> lv
            if min(cw, ch) < PYR_MIN_DIM:
                continue
            pyr += cw * ch * 3
            n += 1
        base = w * h * 3
        expect[did] = (w, h, n, base, pyr, pyr * 1000 // base)
    got = {
        r["doc_id"]: (
            r["w"],
            r["h"],
            r["n_levels"],
            r["base_bytes"],
            r["pyramid_bytes"],
            r["overhead_permille"],
        )
        for r in q_thumb_pyramid_bytes(spark, sf_small).collect()
    }
    assert got == expect
    for w, h, n, base, pyr, perm in got.values():
        assert n >= 1 and pyr >= base
        # Σ 1/4^l < 4/3; ceil rounding adds o(1) per level
        assert perm <= 1400


def test_host_skew_matches_bruteforce(spark, sf_small):
    """Histogram Gini and top-1% share equal the textbook per-host-sort
    computation replayed in pure Python — proving the tie-group
    closed form needs no host sort — and land in their legal ranges."""
    from go_crawler_spark.functions.relational import (
        SKEW_HOST_MOD,
        q_host_skew,
    )

    demands: dict[int, int] = {}
    for r in load(spark, sf_small, "orders").select("o_orderkey").collect():
        h = r["o_orderkey"] % SKEW_HOST_MOD
        demands[h] = demands.get(h, 0) + 1
    ds = sorted(demands.values())  # ascending; rank i+1
    n, t = len(ds), sum(ds)
    r_sum = sum((i + 1) * d for i, d in enumerate(ds))
    gini = (2 * r_sum - (n + 1) * t) * 1000 // (n * t)
    k = (n + 99) // 100
    top = sum(sorted(ds, reverse=True)[:k])
    row = q_host_skew(spark, sf_small).collect()
    assert len(row) == 1
    got = row[0]
    assert got["n_hosts"] == n
    assert got["total_demand"] == t
    assert got["gini_permille"] == gini
    assert got["top1pct_hosts"] == k
    assert got["top1pct_share_permille"] == top * 1000 // t
    assert 0 <= got["gini_permille"] < 1000
    # the hottest k hosts hold at least their uniform share
    assert got["top1pct_share_permille"] >= k * 1000 // n


def test_zipf_topk_matches_bruteforce(spark, sf_small):
    """The vocabulary head equals a pure-Python frequency sort (ties
    freq desc, term asc), products and permilles are exact integers,
    and rank 1 pins rf_permille = 1000 by construction."""
    import collections

    from go_crawler_spark.functions.textstats import ZIPF_TOPK, q_zipf_topk

    cnt: collections.Counter = collections.Counter()
    for r in load(spark, sf_small, "documents").select("text").collect():
        cnt.update(t for t in r["text"].strip().lower().split() if t)
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOPK]
    f1 = head[0][1]
    expect = [
        (i + 1, term, f, (i + 1) * f, (i + 1) * f * 1000 // f1)
        for i, (term, f) in enumerate(head)
    ]
    got = sorted(
        (
            r["rank"],
            r["term"],
            r["freq"],
            r["rf_product"],
            r["rf_permille"],
        )
        for r in q_zipf_topk(spark, sf_small).collect()
    )
    assert got == expect
    assert got[0][4] == 1000


def test_token_budget_apportion_exact_sum(spark, sf_small):
    """Largest-remainder quotas equal a pure-Python Hamilton replay and
    Σ alloc == budget EXACTLY; every bonus goes to a strictly larger
    remainder than any non-bonus source (up to the source tiebreak)."""
    import math

    from go_crawler_spark.functions.textstats import (
        APPORTION_BUDGET,
        MIX_ALPHA,
        MIX_SCALE,
        q_token_budget_apportion,
    )

    per: dict[str, int] = {}
    for r in (
        load(spark, sf_small, "documents").select("source", "text").collect()
    ):
        per[r["source"]] = per.get(r["source"], 0) + len(
            [t for t in r["text"].strip().split() if t]
        )
    tot = sum(per.values())
    wq = {
        s: math.floor((n / tot) ** MIX_ALPHA * MIX_SCALE)
        for s, n in per.items()
    }
    sum_wq = sum(wq.values())
    fq = {s: w * APPORTION_BUDGET // sum_wq for s, w in wq.items()}
    rem = {s: wq[s] * APPORTION_BUDGET - fq[s] * sum_wq for s in wq}
    leftover = APPORTION_BUDGET - sum(fq.values())
    order = sorted(wq, key=lambda s: (-rem[s], s))
    alloc = {
        s: fq[s] + (1 if i < leftover else 0) for i, s in enumerate(order)
    }
    got = {
        r["source"]: (
            r["src_tokens"],
            r["floor_quota"],
            r["rem_num"],
            r["alloc"],
        )
        for r in q_token_budget_apportion(spark, sf_small).collect()
    }
    assert got == {
        s: (per[s], fq[s], rem[s], alloc[s]) for s in per
    }
    assert sum(a for _, _, _, a in got.values()) == APPORTION_BUDGET


def test_cross_source_dup_matches_bruteforce(spark, sf_small):
    """Source-pair shared-key counts equal a pure-Python replay over
    the same leading-5-token keys (split-on-space, empties retained),
    pairs are strictly ordered, and counts are positive."""
    import itertools

    from go_crawler_spark.functions.cleaning import q_cross_source_dup

    seen: dict[str, set[str]] = {}
    for r in (
        load(spark, sf_small, "documents").select("source", "text").collect()
    ):
        k = " ".join(r["text"].split(" ")[:5])
        seen.setdefault(k, set()).add(r["source"])
    expect: dict[tuple[str, str], int] = {}
    for srcs in seen.values():
        for a, b in itertools.combinations(sorted(srcs), 2):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    got = {
        (r["src_a"], r["src_b"]): r["n_shared_keys"]
        for r in q_cross_source_dup(spark, sf_small).collect()
    }
    assert got == expect
    assert got  # the synthetic corpus does contain cross-source keys
    assert all(a < b for a, b in got)
    assert all(n >= 1 for n in got.values())
