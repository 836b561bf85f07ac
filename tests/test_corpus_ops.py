"""Property tests for the round-3 corpus-assembly additions: semantic
dedup, BM25, k-means, duplicated-passage share, source mixing, URL
blocklist, and the MinHash accuracy audit. The value-hash gate lives in
the oracle suite; these tests pin the semantic invariants a hash can't
express (recall of planted dups, rank monotonicity, rule attribution).
"""

from pyspark.sql import functions as F

from go_crawler_spark.functions.cleaning import q_dup_ngram_fraction
from go_crawler_spark.functions.parsing import q_url_blocklist_filter
from go_crawler_spark.functions.search import BM25_TERMS, BM25_TOPK, q_bm25_topk
from go_crawler_spark.functions.similarity import (
    IVF_PIVOT_MOD,
    IVF_PIVOT_REM,
    NEARDUP_DUP_OFFSET,
    q_kmeans_assign,
    q_minhash_jaccard_estimate,
    q_semantic_dedup,
)
from go_crawler_spark.functions.textstats import q_source_mix_weights


def test_semantic_dedup_drops_planted_dups(spark, sf_small):
    """Every planted near-duplicate that lands in its original's cell
    must be dropped with the original (a lower id) as culprit — the
    planted perturbation is far inside the cosine threshold."""
    rows = {r["vec_id"]: r for r in q_semantic_dedup(spark, sf_small).collect()}
    planted = [vid for vid in rows if vid >= NEARDUP_DUP_OFFSET]
    assert planted, "corpus must contain planted dups"
    same_cell = [
        vid
        for vid in planted
        if rows[vid - NEARDUP_DUP_OFFSET]["cell"] == rows[vid]["cell"]
    ]
    # the perturbed copy should almost always share the original's cell
    assert len(same_cell) >= len(planted) * 9 // 10
    for vid in same_cell:
        assert rows[vid]["keep"] is False
        assert rows[vid]["dup_of"] is not None
        assert rows[vid]["dup_of"] < vid
    # keeps are exactly the rows with no culprit
    assert all((r["dup_of"] is None) == r["keep"] for r in rows.values())


def test_bm25_ranking_properties(spark, sf_small):
    rows = q_bm25_topk(spark, sf_small).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == BM25_TOPK
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every top-scoring doc matches at least one query term
    assert all(
        sum(r[f"tf_{t}"] for t in BM25_TERMS) > 0 for r in rows
    )


def test_kmeans_assign_cells_and_convergence_direction(spark, sf_small):
    df = q_kmeans_assign(spark, sf_small)
    rows = df.collect()
    pivots = {
        r["vec_id"]
        for r in rows
        if r["vec_id"] % IVF_PIVOT_MOD == IVF_PIVOT_REM
    }
    for r in rows:
        assert r["cell_init"] in pivots
        assert r["cell_final"] in pivots
        assert r["moved"] == (r["cell_init"] != r["cell_final"])
    # the mean update must not be a no-op NOR a complete reshuffle
    moved = sum(r["moved"] for r in rows)
    assert 0 <= moved < len(rows) // 2


def test_kmeans_assign_deterministic_under_repartition(spark, sf_small):
    a = {
        (r["vec_id"], r["cell_final"])
        for r in q_kmeans_assign(spark, sf_small).repartition(13).collect()
    }
    b = {
        (r["vec_id"], r["cell_final"])
        for r in q_kmeans_assign(spark, sf_small).repartition(3).collect()
    }
    assert a == b


def test_dup_ngram_fraction_invariants(spark, sf_small):
    rows = q_dup_ngram_fraction(spark, sf_small).collect()
    assert rows
    assert all(0 <= r["n_dup"] <= r["n_shingles"] for r in rows)
    # the synthetic corpus is dup-heavy: some cross-doc 8-grams exist
    assert any(r["n_dup"] > 0 for r in rows)
    # a doc with zero shingles is never dup_heavy
    assert all(r["dup_heavy"] is False for r in rows if r["n_shingles"] == 0)


def test_source_mix_weights_temperature(spark, sf_small):
    rows = q_source_mix_weights(spark, sf_small).collect()
    total_ppm = sum(r["weight_ppm"] for r in rows)
    # floor-division rounds each weight down: sum within n_sources ppm
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    tot_tokens = sum(r["src_tokens"] for r in rows)
    assert sum(r["expected_tokens"] for r in rows) <= tot_tokens
    # alpha < 1 compresses the mix: the smallest source gains share,
    # the largest loses share
    lo = min(rows, key=lambda r: r["src_tokens"])
    hi = max(rows, key=lambda r: r["src_tokens"])
    if lo["src_tokens"] < hi["src_tokens"]:
        assert lo["weight_ppm"] * tot_tokens > lo["src_tokens"] * 1_000_000
        assert hi["weight_ppm"] * tot_tokens < hi["src_tokens"] * 1_000_000


def test_url_blocklist_matches_scalar_rules(spark, sf_small):
    """Recompute the verdicts in pure Python (independent derivation)."""
    out = q_url_blocklist_filter(spark, sf_small).collect()
    assert out
    rules = []
    for k in range(25):  # nation has 25 rows, n_nationkey 0..24
        host_pat = f"shop{k}.example.com" if k % 2 == 0 else "*"
        rules.append((k, host_pat, f"/cat{k}"))
    for r in out:
        url = r["url"]
        assert url.startswith("https://")
        host, _, path = url[len("https://"):].partition("/")
        path = "/" + path
        matches = [
            (rid, prefix)
            for rid, hp, prefix in rules
            if (hp == "*" or hp == host) and path.startswith(prefix)
        ]
        if matches:
            best = sorted(matches, key=lambda m: (-len(m[1]), m[0]))[0][0]
            assert r["blocked"] is True and r["matched_rule"] == best, url
        else:
            assert r["blocked"] is False and r["matched_rule"] is None, url


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_small):
    rows = q_minhash_jaccard_estimate(spark, sf_small).collect()
    assert rows
    assert all(0 <= r["sig_matches"] <= 16 for r in rows)
    assert all(abs(r["est_jaccard"] - r["sig_matches"] / 16.0) < 1e-12 for r in rows)
    # sketch quality: the mean absolute error of a 16-perm MinHash on
    # LSH-selected (i.e. similarity-biased) pairs stays well under 0.25
    mae = sum(abs(r["est_jaccard"] - r["exact_jaccard"]) for r in rows) / len(rows)
    assert mae < 0.25, mae


def test_top_ngram_share_matches_bruteforce(spark, sf_small):
    """Third derivation of the top-2-gram rule: the Spark side folds the
    longest run over sorted hashes, the DuckDB oracle window-ranks group
    counts, and this test recomputes every row with Counter — including
    the tie-break (max count, then smallest hash)."""
    import collections

    import pandas as pd

    from go_crawler_spark.functions.similarity import P31
    from go_crawler_spark.functions.textstats import (
        TOPNGRAM_DEN,
        TOPNGRAM_N,
        TOPNGRAM_NUM,
        q_top_ngram_share,
    )

    docs = pd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % P31
        return acc

    expected = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ts = [t for t in text.strip().split() if t]
        grams = [
            " ".join(ts[i : i + TOPNGRAM_N])
            for i in range(len(ts) - TOPNGRAM_N + 1)
        ]
        counts = collections.Counter(poly(g) for g in grams)
        n = len(grams)
        if counts:
            top_count = max(counts.values())
            top_hash = min(h for h, c in counts.items() if c == top_count)
        else:
            top_count, top_hash = 0, None
        expected[did] = (
            n,
            top_count,
            top_hash,
            n > 0 and top_count * TOPNGRAM_DEN >= n * TOPNGRAM_NUM,
        )

    rows = q_top_ngram_share(spark, sf_small).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (
            r["n_ngrams"],
            r["top_count"],
            r["top_hash"],
            r["repetitive"],
        ) == expected[r["doc_id"]], r["doc_id"]
    # non-degenerate: the corpus's small vocabulary repeats bigrams
    assert any(r["top_count"] >= 2 for r in rows)


def test_link_pagerank_matches_bruteforce(spark, sf_small):
    """Integer PageRank == an independent pure-Python replay: same LCG
    edges, same exact floor-divisions, dict-based iteration."""
    import pandas as pd

    from go_crawler_spark.functions.linkgraph import (
        PR_FANOUT,
        PR_ITERS,
        PR_LCG_A,
        PR_LCG_C,
        PR_LCG_K,
        PR_SCALE,
        PR_TELEPORT,
        q_link_pagerank,
    )

    ids = sorted(
        pd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ]
    )
    n = len(ids)
    edges = set()
    for src in ids:
        for k in range(PR_FANOUT):
            dst = (src * PR_LCG_A + k * PR_LCG_K + PR_LCG_C) % n
            if dst == src:
                dst = (dst + 1) % n
            edges.add((src, dst))
    outdeg = {}
    for src, _ in edges:
        outdeg[src] = outdeg.get(src, 0) + 1
    pr = {i: PR_SCALE for i in ids}
    for _ in range(PR_ITERS):
        s = {i: 0 for i in ids}
        for src, dst in edges:
            s[dst] += pr[src] // outdeg[src]
        pr = {i: PR_TELEPORT + (85 * s[i]) // 100 for i in ids}

    rows = q_link_pagerank(spark, sf_small).collect()
    assert len(rows) == n
    for r in rows:
        assert (r["outdeg"], r["pr"]) == (outdeg[r["doc_id"]], pr[r["doc_id"]]), (
            r["doc_id"]
        )
    # non-degenerate: damping must actually differentiate ranks
    assert len({r["pr"] for r in rows}) > 1
    # total mass stays bounded by the initial mass (damping contracts)
    assert sum(r["pr"] for r in rows) <= n * PR_SCALE


def test_multires_rollup_matches_pandas(spark, sf_small):
    """Cascade result == direct day-grain aggregation over the raw
    events (counts, floor-cents sums, distinct minute/hour buckets)."""
    import math

    import pandas as pd

    from go_crawler_spark.functions.relational import q_multires_rollup

    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["sec"] = ev["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
    ev["cents"] = [int(math.floor(v * 100)) for v in ev["value"]]
    ev["day"] = ev["sec"] - ev["sec"] % 86400
    expected = {}
    for (day, et), g in ev.groupby(["day", "event_type"]):
        expected[(day, et)] = (
            len(g),
            int(g["cents"].sum()),
            g["sec"].floordiv(60).nunique(),
            g["sec"].floordiv(3600).nunique(),
        )

    rows = q_multires_rollup(spark, sf_small).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (
            r["n_events"], r["sum_cents"], r["n_minutes"], r["n_hours"]
        ) == expected[(r["day"], r["event_type"])], (r["day"], r["event_type"])
    # cascade must be genuinely multi-resolution on this stream
    assert any(r["n_hours"] > 1 for r in rows)


def test_tile_partial_dup_catches_what_phash_misses(spark, sf_small):
    """The planted large-overlay variants must (a) ALL be recovered by
    the tile join with exactly 3 of 4 quadrants matching, and (b) in
    the majority sit outside whole-image phash's Hamming budget — the
    class separation the operator exists for. (b) is a majority claim,
    not per-image: a noise overlay averages to mid-gray in the DCT low
    frequencies, so images whose quadrant was already mid-toned move
    fewer than 8 bits (measured: 7 of 30 stay within budget)."""
    from go_crawler_spark.crawl import codec
    from go_crawler_spark.functions.multimodal import (
        PHASH_MAX_HAMMING,
        TILE_MIN_MATCH,
        TILE_N_DOCS,
        TILE_VARIANT_OFFSET,
        _phash_pixels,
        _tile_rows,
        q_tile_partial_dup,
    )

    rows = q_tile_partial_dup(spark, sf_small).collect()
    got = {(r["img_a"], r["img_b"]): r["n_tiles"] for r in rows}
    planted = [d for d in range(TILE_N_DOCS) if d % 10 == 4]
    for d in planted:
        assert got.get((d, d + TILE_VARIANT_OFFSET)) == 3, d
    assert all(n >= TILE_MIN_MATCH for n in got.values())
    # every planted doc must emit variant tile rows
    variant_ids = {r["img_id"] for r in _tile_rows(planted)}
    assert all(d + TILE_VARIANT_OFFSET in variant_ids for d in planted)
    # (b) whole-image phash Hamming for the overlay class blows the
    # near-dup budget for the majority of planted variants (recompute
    # via the same codec, pure Python) — those are exactly the pairs
    # phash near-dup cannot recover but the tile join (a) just did
    import numpy as np

    missed_by_phash = 0
    for d in planted:
        base = _phash_pixels(d)
        edited = base.copy()
        h, w = edited.shape[:2]
        rng = np.random.Generator(np.random.PCG64(d + 5_000_000))
        edited[: h // 2, : w // 2] = rng.integers(
            0, 256, size=(h // 2, w // 2, 3), dtype=np.uint8
        )
        ham = bin(
            (codec.phash64(base) & 0xFFFFFFFFFFFFFFFF)
            ^ (codec.phash64(edited) & 0xFFFFFFFFFFFFFFFF)
        ).count("1")
        if ham > PHASH_MAX_HAMMING:
            missed_by_phash += 1
    assert missed_by_phash >= len(planted) * 2 // 3, missed_by_phash


def test_hll_distinct_accuracy_and_parity(spark, sf_small):
    """HLL raw estimate == an independent pure-Python sketch over the
    same keys, and lands within the 2/sqrt(m) error band of the exact
    count (the estimator's design guarantee at distinct >> m)."""
    import pandas as pd

    from go_crawler_spark.functions.sketches import (
        HLL_M,
        HLL_MIX_A,
        HLL_MIX_B,
        HLL_VALUE_BITS,
        q_hll_distinct,
    )
    from go_crawler_spark.functions.similarity import P31

    keys = [
        str(k)
        for k in pd.read_parquet(
            f"{sf_small}/lineitem.parquet", columns=["l_orderkey"]
        )["l_orderkey"]
    ]

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % P31
        return acc

    regs: dict[int, int] = {}
    for k in keys:
        h = (poly(k) * HLL_MIX_A) % P31 * HLL_MIX_B % P31
        j, v = h % HLL_M, h // HLL_M
        rank = (HLL_VALUE_BITS + 1) - (v.bit_length() if v else 0)
        regs[j] = max(regs.get(j, 0), rank)
    s = sum(2.0 ** (-m) for m in regs.values()) + (HLL_M - len(regs))
    expected_est = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M / s

    row = q_hll_distinct(spark, sf_small).collect()[0]
    assert row["m"] == HLL_M
    assert row["n_zero_registers"] == HLL_M - len(regs)
    assert row["indicator_sum"] == s  # dyadic sum: exactly equal
    assert row["raw_estimate"] == expected_est
    exact = len(set(keys))
    assert row["exact_distinct"] == exact
    # 2/sqrt(256) = 12.5% band (≈2σ for the raw HLL estimator)
    assert abs(row["raw_estimate"] - exact) <= 0.125 * exact


def test_cdc_chunk_dedup_finds_shared_templates(spark, sf_small):
    """Chunk accounting == the golden replay, every doc's shared
    header/footer bytes are detected as dup, and chunk bounds hold."""
    from go_crawler_spark.functions.multimodal import (
        CDC_MAX,
        CDC_MIN,
        cdc_chunk_dedup_golden,
        cdc_chunks,
        cdc_payload,
        q_cdc_chunk_dedup,
    )

    golden = {d: rest for d, *rest in cdc_chunk_dedup_golden()}
    rows = q_cdc_chunk_dedup(spark, sf_small).collect()
    assert len(rows) == len(golden)
    for r in rows:
        assert [
            r["n_chunks"], r["total_bytes"], r["dup_chunks"], r["dup_bytes"]
        ] == golden[r["doc_id"]], r["doc_id"]
    # the shared-template structure must actually dedupe: every doc
    # shares its header with ~19 others, so dup bytes are nonzero
    assert all(r["dup_bytes"] > 0 for r in rows)
    # and unique body content must survive as non-dup bytes
    assert all(r["dup_bytes"] < r["total_bytes"] for r in rows)
    # chunker invariants: bounds respected, lengths sum to payload
    for d in (0, 7, 123):
        payload = cdc_payload(d)
        chunks = cdc_chunks(payload)
        assert sum(ln for _, ln in chunks) == len(payload)
        assert all(ln <= CDC_MAX for _, ln in chunks)
        assert all(ln >= CDC_MIN for _, ln in chunks[:-1])


def test_asof_join_matches_bruteforce(spark, sf_small):
    """The union-window as-of composition must equal the literal
    definition: for each click, the view of the same user with the
    largest ts <= click ts (None when no prior view)."""
    import pandas as pd

    from go_crawler_spark.functions.relational import q_asof_join

    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    # epoch micros per value, exactly as unix_micros computes them
    # (explicit [us] cast: pandas 2.x already keeps parquet micros)
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    views = ev[ev.event_type == "view"]
    expected = {}
    for r in ev[ev.event_type == "click"].itertuples():
        prior = views[(views.user_id == r.user_id) & (views.us <= r.us)]
        if len(prior):
            best = prior.loc[prior.us.idxmax()]
            expected[r.event_id] = (int(best.event_id), r.us - int(best.us))
        else:
            expected[r.event_id] = (None, None)

    rows = q_asof_join(spark, sf_small).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (r["asof_view_id"], r["lag_us"]) == expected[r["click_id"]], (
            r["click_id"]
        )
    assert any(r["asof_view_id"] is not None for r in rows)


def test_range_join_matches_bruteforce(spark, sf_small):
    """Bucket-binned interval join == the literal O(n*m) containment
    scan, including windows long enough to straddle a bucket boundary."""
    import pandas as pd

    from go_crawler_spark.functions.relational import q_range_join

    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")  # micros
    errors = ev[ev.event_type == "error"]
    clicks = ev[ev.event_type == "click"]
    expected = set()
    for w in errors.itertuples():
        end = w.us + (w.event_id % 10 + 1) * 60_000_000
        for c in clicks.itertuples():
            if w.us <= c.us < end:
                expected.add((w.event_id, c.event_id, c.us - w.us))

    got = {
        (r["win_id"], r["click_id"], r["offset_us"])
        for r in q_range_join(spark, sf_small).collect()
    }
    assert got == expected
    assert expected, "scenario must produce at least one contained click"


def test_pq_adc_planted_twin_and_replay(spark, sf_small):
    """Two PQ-ADC invariants a value-hash can't express:
    (a) planted-twin retrieval — a tiny perturbation of each query
        encodes to the same PQ codes, so its ADC distance is the
        query's own quantization floor and it must appear in the
        top-5 (this is the 'near neighbors are far closer than
        noise' regime PQ is deployed for at corpus scale);
    (b) exact pure-Python replay parity on the real embeddings table —
        codes, ADC sums, and the (adc_dist, neighbor_id) ranking all
        reproduced independently in numpy, integer-for-integer."""
    import numpy as np

    from go_crawler_spark.functions.similarity import (
        ANN_DIM,
        PQ_M,
        PQ_PIVOT_MOD,
        PQ_PIVOT_REM,
        PQ_SCALE,
        PQ_SUBDIM,
        PQ_TOPK,
        pq_adc_topk,
        q_ann_pq_adc_topk,
    )
    from go_crawler_spark.tables import load

    # --- (a) planted twins -------------------------------------------------
    rng_rows = []
    for vid in range(400):
        g = np.random.Generator(np.random.PCG64(vid))
        if vid % 100 == 1:  # twin of query vid-1: same vector + epsilon
            g = np.random.Generator(np.random.PCG64(vid - 1))
            v = g.uniform(-1.0, 1.0, ANN_DIM) + 1e-4
        else:
            v = g.uniform(-1.0, 1.0, ANN_DIM)
        rng_rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    got: dict[int, set[int]] = {}
    for r in pq_adc_topk(emb).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid in (0, 100, 200, 300):
        assert qid + 1 in got[qid], f"twin {qid + 1} missing from top-5 of {qid}"

    # --- (b) numpy replay on the parquet table ------------------------------
    import pandas as pd

    e = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    X = np.stack(e.embedding.values).astype(np.float64)
    ids = e.vec_id.values.astype(np.int64)
    XQ = np.floor(X * PQ_SCALE).astype(np.int64)
    piv = (ids % PQ_PIVOT_MOD) == PQ_PIVOT_REM
    cb_ids = ids[piv]
    codes = np.zeros((len(ids), PQ_M), dtype=np.int64)
    for m in range(PQ_M):
        sub = XQ[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        cw = sub[piv]
        d = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(-1)
        order = np.lexsort((np.broadcast_to(cb_ids, d.shape), d), axis=1)[:, 0]
        codes[:, m] = cb_ids[order]
    pos_of = {c: i for i, c in enumerate(cb_ids)}
    expected = set()
    for qi in np.where(ids % 100 == 0)[0]:
        adc = np.zeros(len(ids), dtype=np.int64)
        for m in range(PQ_M):
            sub = XQ[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            lut = ((sub[qi][None, :] - sub[piv]) ** 2).sum(-1)
            adc += lut[[pos_of[c] for c in codes[:, m]]]
        cand = sorted(
            (int(adc[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != ids[qi]
        )[:PQ_TOPK]
        for rank, (dist, nid) in enumerate(cand, start=1):
            expected.add((int(ids[qi]), nid, dist, rank))
    got_rows = {
        (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
        for r in q_ann_pq_adc_topk(spark, sf_small).collect()
    }
    assert got_rows == expected and len(expected) > 0


def test_cms_heavy_hitters_bounds_and_replay(spark, sf_small):
    """Count-min invariants: the estimate is an UPPER bound on the exact
    count for every key (collisions only inflate), the exact column is
    the true per-user event count, ranking is (estimate DESC, user_id
    ASC), and the whole sketch replays exactly in pure Python."""
    import pandas as pd

    from go_crawler_spark.functions.sketches import (
        CMS_A,
        CMS_B,
        CMS_D,
        CMS_TOPK,
        CMS_W,
        P31,
        q_cms_heavy_hitters,
    )

    ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id"])
    exact = ev.user_id.value_counts().to_dict()
    # pure-Python sketch
    table = [dict() for _ in range(CMS_D)]
    for u in ev.user_id:
        for j in range(CMS_D):
            b = ((int(u) % P31) * CMS_A[j] + CMS_B[j]) % P31 % CMS_W
            table[j][b] = table[j].get(b, 0) + 1
    est = {
        int(u): min(
            table[j][((int(u) % P31) * CMS_A[j] + CMS_B[j]) % P31 % CMS_W]
            for j in range(CMS_D)
        )
        for u in exact
    }
    order = sorted(exact, key=lambda u: (-est[int(u)], int(u)))[:CMS_TOPK]
    rows = q_cms_heavy_hitters(spark, sf_small).collect()
    assert [r["user_id"] for r in rows] == [int(u) for u in order]
    for r in rows:
        assert r["exact_count"] == exact[r["user_id"]]
        assert r["cms_estimate"] == est[r["user_id"]]
        assert r["cms_estimate"] >= r["exact_count"]  # CMS upper bound
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_image_filter_gate_rules_bite_and_replay(spark, sf_small):
    """Curation-gate invariants: keep == AND of the five flags, every
    rule both accepts and rejects someone (no vacuous thresholds — the
    Gopher-flag discipline), and a row sample replays exactly from the
    codec in pure Python (independent of the Spark kernel AND of the
    oracle's SQL derivation)."""
    from go_crawler_spark.crawl import codec
    from go_crawler_spark.functions.multimodal import (
        IMG_GATE_AR_DEN,
        IMG_GATE_AR_NUM,
        IMG_GATE_MAX_BYTES,
        IMG_GATE_MIN_CAPTION,
        IMG_GATE_MIN_SIDE,
        IMG_GATE_N_DOCS,
        IMG_GATE_POP_HI,
        IMG_GATE_POP_LO,
        image_gate_id,
        q_image_filter_gate,
    )

    rows = {r["doc_id"]: r for r in q_image_filter_gate(spark, sf_small).collect()}
    assert len(rows) == IMG_GATE_N_DOCS
    flag_cols = [
        "min_side_ok", "aspect_ok", "bytes_ok", "caption_ok", "phash_entropy_ok"
    ]
    for c in flag_cols:
        vals = {r[c] for r in rows.values()}
        assert vals == {True, False}, f"rule {c} is vacuous: {vals}"
    assert any(r["keep"] for r in rows.values())
    assert any(not r["keep"] for r in rows.values())
    for r in rows.values():
        assert r["keep"] == all(r[c] for c in flag_cols)
    # pure-Python replay on a deterministic sample
    for did in (0, 17, 150, 205, 299):
        p = codec.payload_for(image_gate_id(did))
        r = rows[did]
        assert (r["w"], r["h"], r["n_bytes"]) == (p["w"], p["h"], len(p["bytes"]))
        assert r["caption_len"] == len(p["caption"])
        pop = bin(p["phash"] & 0xFFFFFFFFFFFFFFFF).count("1")
        assert r["phash_pop"] == pop
        assert r["min_side_ok"] == (min(p["w"], p["h"]) >= IMG_GATE_MIN_SIDE)
        assert r["aspect_ok"] == (
            max(p["w"], p["h"]) * IMG_GATE_AR_DEN
            <= min(p["w"], p["h"]) * IMG_GATE_AR_NUM
        )
        assert r["bytes_ok"] == (len(p["bytes"]) <= IMG_GATE_MAX_BYTES)
        assert r["caption_ok"] == (len(p["caption"]) >= IMG_GATE_MIN_CAPTION)
        assert r["phash_entropy_ok"] == (IMG_GATE_POP_LO <= pop <= IMG_GATE_POP_HI)


def test_seq_pack_contiguity_and_replay(spark, sf_small):
    """Packing-manifest invariants: offsets are a gapless prefix sum in
    doc_id order (doc i starts exactly where doc i-1 ended), window
    spans are consistent (pack_first <= pack_last, n_packs matches, a
    doc spanning k windows has >= (k-1)*BUDGET - slack tokens), and the
    whole manifest replays from a pure-Python cumulative sum."""
    import pandas as pd

    from go_crawler_spark.functions.textstats import (
        SEQPACK_BUDGET,
        q_seq_pack,
    )

    rows = sorted(
        q_seq_pack(spark, sf_small).collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    # gapless prefix sum
    off = 0
    for r in rows:
        assert r["start_off"] == off, r["doc_id"]
        off += r["n_tokens"]
    # span consistency + replay of the window cuts
    multi = 0
    for r in rows:
        span = max(r["n_tokens"], 1)
        assert r["pack_first"] == r["start_off"] // SEQPACK_BUDGET
        assert r["pack_last"] == (r["start_off"] + span - 1) // SEQPACK_BUDGET
        assert r["n_packs"] == r["pack_last"] - r["pack_first"] + 1 >= 1
        if r["n_packs"] > 1:
            multi += 1
            # spanning k windows requires crossing k-1 boundaries
            assert span > (r["n_packs"] - 1) * SEQPACK_BUDGET - SEQPACK_BUDGET
    # the corpus must actually exercise boundary crossings
    assert multi > 0
    # independent n_tokens check against pandas whitespace split
    docs = pd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).set_index("doc_id")
    for r in rows[:50]:
        toks = [t for t in docs.loc[r["doc_id"], "text"].strip().split() if t]
        assert r["n_tokens"] == len(toks)


def test_quantile_sketch_brackets_exact_percentiles(spark, sf_small):
    """The sketch's bin must BRACKET the exact discrete percentile (the
    design guarantee: error <= one bin width), cumulative counts must
    be consistent, and the whole read-off replays in pure Python."""
    import numpy as np
    import pandas as pd

    from go_crawler_spark.functions.sketches import (
        QSK_BIN_W,
        QSK_BINS,
        QSK_PCTS,
        q_quantile_sketch,
    )

    docs = pd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["text"]
    )
    n_tok = np.array(
        [len([t for t in s.strip().split() if t]) for s in docs["text"]],
        dtype=np.int64,
    )
    bins = np.minimum(n_tok // QSK_BIN_W, QSK_BINS - 1)
    total = len(n_tok)
    rows = {r["pct"]: r for r in q_quantile_sketch(spark, sf_small).collect()}
    assert set(rows) == set(QSK_PCTS)
    srt = np.sort(n_tok)
    for p, r in rows.items():
        assert r["total_count"] == total
        assert r["bin_lo"] == r["bin_idx"] * QSK_BIN_W
        assert r["bin_hi"] == r["bin_lo"] + QSK_BIN_W
        # replay: smallest bin covering p% of docs
        order = np.sort(bins)
        k = int(np.searchsorted(np.arange(1, total + 1) * 100, p * total))
        assert r["bin_idx"] == order[k]
        assert r["cum_count"] == int((bins <= r["bin_idx"]).sum())
        assert r["cum_count"] * 100 >= p * total
        # bracket: the exact discrete percentile value falls in the bin
        # (or clamps into the top bin)
        exact = srt[k]
        assert min(exact // QSK_BIN_W, QSK_BINS - 1) == r["bin_idx"]


def test_inverted_index_replays_in_pure_python(spark, sf_small):
    """Full pure-Python replay of the posting build — df/tf accounting,
    the df floor, tf-desc/doc-asc ranking with its tie-break, and the
    rendered posting-head string — independent of both engines."""
    import collections

    import pandas as pd

    from go_crawler_spark.functions.search import (
        INDEX_DF_MIN,
        INDEX_POSTINGS,
        q_inverted_index,
    )

    docs = pd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    tf: dict[str, dict[int, int]] = collections.defaultdict(dict)
    for did, text in zip(docs["doc_id"], docs["text"]):
        for t in text.lower().strip().split():
            if t:
                tf[t][did] = tf[t].get(did, 0) + 1
    expected = {}
    for term, posting in tf.items():
        if len(posting) < INDEX_DF_MIN:
            continue
        head = sorted(posting.items(), key=lambda kv: (-kv[1], kv[0]))
        head = head[:INDEX_POSTINGS]
        expected[term] = (
            len(posting),
            sum(posting.values()),
            ",".join(f"{d}:{c}" for d, c in head),
        )
    rows = q_inverted_index(spark, sf_small).collect()
    got = {r["term"]: (r["df"], r["tf_total"], r["top_postings"]) for r in rows}
    assert got == expected and len(expected) > 0


def test_payload_header_sniff_roundtrip(spark, sf_small):
    """Encoder↔parser round-trip: the JVM expression parse of (magic,
    fmt, w, h) must equal the codec truth for every payload, including
    dims above 255 (the u16 high byte must actually engage)."""
    from go_crawler_spark.crawl import codec
    from go_crawler_spark.functions.multimodal import (
        SNIFF_N_DOCS,
        q_payload_header_sniff,
    )

    rows = {r["doc_id"]: r for r in q_payload_header_sniff(spark, sf_small).collect()}
    assert len(rows) == SNIFF_N_DOCS
    for did, r in rows.items():
        p = codec.payload_for(f"doc-{did}")
        assert r["magic_ok"] is True
        assert (r["fmt"], r["w"], r["h"]) == (p["fmt"], p["w"], p["h"]), did
        assert r["n_bytes"] == len(p["bytes"])
    # u16 high-byte engagement: parse an @x8 payload (dims up to 512)
    big = codec.payload_for("doc-0@x8")
    assert max(big["w"], big["h"]) > 255, "scenario must exceed one byte"
    import pandas as pd

    from pyspark.sql import functions as F
    from go_crawler_spark.functions.multimodal import _u16le

    df = spark.createDataFrame(
        pd.DataFrame({"bytes": [big["bytes"]]})
    ).select(_u16le(F.col("bytes"), 6).alias("w"), _u16le(F.col("bytes"), 8).alias("h"))
    got = df.collect()[0]
    assert (got["w"], got["h"]) == (big["w"], big["h"])


def test_domain_quality_gate_verdict_math(spark, sf_small):
    from go_crawler_spark.functions.cleaning import (
        DOMAIN_KEEP_DEN,
        DOMAIN_KEEP_NUM,
        DOMAIN_MOD,
        q_domain_quality_gate,
    )

    rows = q_domain_quality_gate(spark, sf_small).collect()
    assert rows
    g_n = len(rows)
    g_sum = sum(r["quality"] for r in rows)
    hosts: dict[str, list] = {}
    for r in rows:
        assert r["host"] == f"site-{r['doc_id'] % DOMAIN_MOD}.example.org"
        hosts.setdefault(r["host"], []).append(r)
    for host, hr in hosts.items():
        n = len(hr)
        s = sum(r["quality"] for r in hr)
        keep = s * g_n * DOMAIN_KEEP_DEN >= g_sum * n * DOMAIN_KEEP_NUM
        for r in hr:
            assert r["host_n_docs"] == n
            assert r["host_sum_quality"] == s
            assert r["domain_keep"] == keep
    # the relative rule actually splits the synthetic corpus
    verdicts = {r["domain_keep"] for r in rows}
    assert verdicts == {True, False}


def test_caption_align_gate_matches_bruteforce(spark, sf_small):
    import numpy as np
    import pyarrow.parquet as pq

    from go_crawler_spark.tables import load

    from go_crawler_spark.functions.multimodal import (
        ALIGN_FIX,
        q_caption_align_gate,
    )
    from go_crawler_spark.functions.similarity import ANN_DIM, _poly_py

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_small, "documents").collect()
    }
    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    emb = {
        int(v): np.array(e, dtype=np.float64)
        for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    expect = {}
    for d, qv in emb.items():
        qfix = np.floor(qv * ALIGN_FIX).astype(np.int64)
        w = np.zeros(ANN_DIM, dtype=np.int64)
        for tok in docs.get(d, "").lower().split():
            h = _poly_py(tok)
            w[h % ANN_DIM] += 1 if (h // ANN_DIM) % 2 == 0 else -1
        dot = int(w @ qfix) if np.any(w) else 0
        expect[d] = (
            dot,
            int(w @ w),
            int(qfix @ qfix),
            dot >= 0,
        )
    got = {
        r["doc_id"]: (
            r["dot_fixed"], r["cap_norm2"], r["img_norm2"], r["keep"]
        )
        for r in q_caption_align_gate(spark, sf_small).collect()
    }
    assert got == expect
    assert {v[3] for v in got.values()} == {True, False}


def test_perplexity_buckets_matches_bruteforce(spark, sf_small):
    from collections import Counter

    from go_crawler_spark.functions.cleaning import (
        PPLX_SCALE,
        q_perplexity_buckets,
    )
    from go_crawler_spark.tables import load

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in load(spark, sf_small, "documents").collect()
    }
    df: Counter = Counter()
    tfs = {d: Counter(toks) for d, toks in docs.items()}
    for ctr in tfs.values():
        df.update(ctr.keys())
    per_doc = {}
    for d, ctr in tfs.items():
        if not ctr:
            continue
        n = sum(ctr.values())
        s = sum(tf * (PPLX_SCALE // df[t]) for t, tf in ctr.items())
        per_doc[d] = (n, s, s // n)
    means = sorted(m for _, _, m in per_doc.values())
    n_all = len(means)
    # smallest value whose cumulative coverage reaches 1/3 (resp. 2/3)
    t1 = means[(n_all + 2) // 3 - 1]
    t2 = means[(2 * n_all + 2) // 3 - 1]
    expect = {
        d: (n, s, m, "head" if m <= t1 else "tail" if m > t2 else "middle")
        for d, (n, s, m) in per_doc.items()
    }
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["surprisal_sum"], r["doc_mean"], r["bucket"]
        )
        for r in q_perplexity_buckets(spark, sf_small).collect()
    }
    assert got == expect
    assert {v[3] for v in got.values()} == {"head", "middle", "tail"}
