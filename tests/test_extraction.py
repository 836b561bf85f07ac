"""Parser unit tests vs curated Japanese strings (SURVEY.md §5.4):
range inheritance, prefecture shadowing, full-width folding, counter
patterns — reference semantics cited per case.
"""

import pytest
from pyspark.sql import functions as F

from go_crawler_spark.functions.extraction import (
    benefits_cols,
    parse_bonus,
    parse_raise,
    salary_cols,
    with_location,
)
from go_crawler_spark.functions.parsing import normalize_string_native


def _one(spark, s, colfn):
    df = spark.createDataFrame([(s,)], ["s"])
    return df.select(colfn(F.col("s")).alias("v")).collect()[0]["v"]


def _salary(spark, s):
    df = spark.createDataFrame([(s,)], ["s"])
    cols = salary_cols(F.col("s"))
    r = df.select(
        cols["salary_min"].alias("mn"),
        cols["salary_max"].alias("mx"),
        cols["salary_unit"].alias("u"),
    ).collect()[0]
    return r["mn"], r["mx"], r["u"]


def test_salary_range_unit_inheritance(spark):
    # 400~500万円 → min inherits 万 (job_posting_parser.go:268-274)
    assert _salary(spark, "年収400~500万円") == (4_000_000, 5_000_000, "年給")
    # both sides carry units
    assert _salary(spark, "月給25万円~35万円") == (250_000, 350_000, "月給")
    # full-width tilde accepted by the range regex ([~～])
    assert _salary(spark, "月給25万円～35万円") == (250_000, 350_000, "月給")


def test_salary_single_and_fail(spark):
    assert _salary(spark, "時給1300円") == (1300, None, "時給")
    assert _salary(spark, "") == (0, None, "不明")
    assert _salary(spark, "応相談") == (0, None, "不明")
    # single with unit suffix
    assert _salary(spark, "日給2千円") == (2000, None, "日給")


def test_raise_bonus_counters(spark):
    # pattern precedence (constants/scraper.go:12-27): slash form first
    assert _one(spark, "昇給/年2回", parse_raise) == 2
    assert _one(spark, "昇給は年3回です", parse_raise) == 3
    assert _one(spark, "年4回も昇給", parse_raise) == 4
    assert _one(spark, "昇給あり", parse_raise) == 1  # keyword fallback
    assert _one(spark, "何もなし", parse_raise) is None
    assert _one(spark, "賞与/年2回", parse_bonus) == 2
    assert _one(spark, "ボーナス/年1回", parse_bonus) == 1
    assert _one(spark, "ボーナスあり", parse_bonus) == 1
    assert _one(spark, "特になし", parse_bonus) is None


def test_benefits_flags(spark):
    df = spark.createDataFrame([("社会保険完備、交通費支給、退職金制度あり",)], ["s"])
    flags = benefits_cols(F.col("s"))
    row = df.select(*[c.alias(n) for n, c in flags.items()]).collect()[0]
    assert row["social_insurance"] and row["transport_allowance"]
    assert row["retirement_plan"]
    assert not row["paid_leave"] and not row["flex_time"]


@pytest.mark.parametrize(
    "raw,code,name,city",
    [
        # 東京都 contains 京都府's short name 京都 — min-code rule → 13
        ("東京都渋谷区1-2-3", "13", "東京都", "渋谷区"),
        ("京都市下京区", "26", "京都府", "市下京区"),  # reference quirk kept:
        # the city regex anchors on the first 都/道/府/県 char — in 京都市
        # that's the 都 of 京都, so the lazy capture swallows 市下京区
        ("北海道札幌市中央区", "01", "北海道", "札幌市"),
        ("神奈川県横浜市西区", "14", "神奈川県", "横浜市"),
        ("所在地未定", None, None, None),
    ],
)
def test_location_parse(spark, raw, code, name, city):
    df = spark.createDataFrame([(raw,)], ["loc_raw"])
    r = with_location(df, "loc_raw", spark).collect()[0]
    assert r["pref_code"] == code
    assert r["pref_name"] == name
    assert r["city"] == city


def test_normalize_native(spark):
    got = _one(spark, "　３５０万円（月給）\x07　", normalize_string_native)
    assert got == "350万円(月給)"


def test_scraper_pipeline_columns(spark, sf_small):
    from go_crawler_spark.scraper import CSV_HEADERS, scrape_documents

    df = scrape_documents(spark, sf_small)
    assert tuple(df.columns) == CSV_HEADERS
    # doc 12: %4=0 正社員, %3=0 月給 range, %5=2 福岡, %7=5 広島 HQ, %2=0 住宅手当
    r = df.filter(
        F.col("URL") == "https://jobs.example.com/detail/12"
    ).collect()[0].asDict()
    assert r["雇用形態"] == "正社員"
    assert r["給与(単位)"] == "月給"
    assert r["給与(下限)"] == str((12 % 30 + 18) * 10000)
    assert r["タイトル"] == "求人タイトル12"
    assert r["勤務地(都道府県コード)"] == "40"  # 福岡県
    assert r["勤務地(市区町村)"] == "久留米市"
    assert r["本社(都道府県コード)"] == "34"  # 広島県
    assert r["職務内容"] == "Webサービスの開発運用12"
    assert r["応募要件"] == "開発経験3年以上"
    assert r["福利厚生(原文)"] == "社会保険完備、交通費支給、住宅手当、退職金制度"
    # no column is constant-"" rendered: every col non-empty somewhere
    maxlen = df.select(
        *[F.max(F.length(c)).alias(str(i)) for i, c in enumerate(df.columns)]
    ).collect()[0]
    empty_cols = [c for i, c in enumerate(df.columns) if not maxlen[str(i)]]
    assert not empty_cols, empty_cols
    # HQ case 6 (海外) renders empty pref/city but keeps the raw text
    r6 = df.filter(
        F.col("URL") == "https://jobs.example.com/detail/6"
    ).collect()[0].asDict()
    assert r6["本社(都道府県コード)"] == "" and r6["本社(原文)"] == "海外(シンガポール)"


def test_multimodal_meta_extract(spark, sf_small):
    from go_crawler_spark.functions.multimodal import (
        decode_external,
        q_image_meta_extract,
        resize_nn,
        sample_frames,
    )
    import numpy as np
    import pytest as _pytest

    rows = q_image_meta_extract(spark, sf_small).collect()
    assert len(rows) == 200
    r = rows[0]
    assert r["n_bytes"] > 0 and r["fmt"] in ("png", "jpeg")
    assert (r["thumb_w"], r["thumb_h"]) == (16, 16)
    # deterministic: same doc_id → same phash on a second run
    again = {x["doc_id"]: x["phash"] for x in q_image_meta_extract(spark, sf_small).collect()}
    assert again[r["doc_id"]] == r["phash"]
    # real numpy resize
    px = np.arange(48 * 32 * 3, dtype=np.uint8).reshape(48, 32, 3)
    assert resize_nn(px, 8, 8).shape == (8, 8, 3)
    # stub contract: absent libs raise NotImplementedError, not ImportError
    with _pytest.raises(NotImplementedError):
        decode_external(b"xx", "jpeg")
    with _pytest.raises(NotImplementedError):
        sample_frames(b"xx", 5)


def test_embedding_neardup_recall_vs_bruteforce(spark, sf_small):
    """The LSH-bucketed near-dup result must equal brute-force ground
    truth on the planted corpus (recall 1.0 at test SF): candidates come
    from (table, bucket) equi-joins, so this pins that no planted pair
    slips through the T×B hyperplane tables — deterministic, not flaky,
    because the hyperplanes are fixed integer constants."""
    from go_crawler_spark.functions.similarity import (
        NEARDUP_THRESHOLD,
        cosine,
        neardup_corpus,
        q_embedding_neardup,
    )
    from go_crawler_spark.tables import load

    got = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in q_embedding_neardup(spark, sf_small).collect()
    }
    corpus = neardup_corpus(
        load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    brute = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        .collect()
    }
    assert got == brute and len(brute) == 50  # one planted pair per vec_id%10==7


def test_minhash_lsh_hot_bucket_guard(spark, tmp_path):
    """A planted mega-bucket (40 identical docs) must be dropped, not
    expanded into O(n²) candidate pairs; the drop must be observable via
    minhash_lsh_hot_buckets. Without the guard the corpus below yields
    40·39/2 = 780 pairs from one bucket family."""
    from go_crawler_spark.functions.similarity import (
        minhash_lsh_hot_buckets,
        q_minhash_lsh_candidates,
    )

    docs = [(i, "boiler plate text repeated verbatim") for i in range(40)]
    docs += [(100, "unique alpha beta gamma"), (101, "unique alpha beta gamma")]
    docs += [(200, "another singleton document entirely")]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_lsh_candidates(spark, sf_dir, max_bucket=16).collect()
    }
    assert pairs == {(100, 101)}  # mega-bucket gone, small bucket intact

    hot = minhash_lsh_hot_buckets(spark, sf_dir, max_bucket=16).collect()
    assert len(hot) == 4  # identical docs share all 4 band buckets
    assert all(r["bucket_n"] == 40 for r in hot)

    # default cap (512) keeps everything at this scale
    ungated = {
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_lsh_candidates(spark, sf_dir).collect()
    }
    assert len(ungated) == 780 + 1


def test_phash_neardup_recall_and_parity(spark, sf_small):
    """The banded phash join must equal pure-Hamming brute force over
    the corpus (recall 1.0 — pairs within distance 3 always share one
    of the 4 bands by pigeonhole; the planted variants sit at 0-2), and
    every planted variant pair must be found."""
    from go_crawler_spark.functions.multimodal import (
        PHASH_MAX_HAMMING,
        PHASH_VARIANT_OFFSET,
        _phash_rows,
        q_phash_neardup,
    )
    from go_crawler_spark.tables import load as load_table

    got = {
        (r["img_a"], r["img_b"], r["hamming"])
        for r in q_phash_neardup(spark, sf_small).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_small, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 300)
        .collect()
    ]
    rows = _phash_rows(sorted(doc_ids))
    brute = set()
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            x, y = sorted((ra, rb), key=lambda r: r["img_id"])
            ham = bin((x["phash"] ^ y["phash"]) & (2**64 - 1)).count("1")
            if ham <= PHASH_MAX_HAMMING:
                brute.add((x["img_id"], y["img_id"], ham))
    assert got == brute and len(got) > 0
    planted = {p for p in brute if p[1] == p[0] + PHASH_VARIANT_OFFSET}
    assert planted <= got
    assert len(planted) == sum(1 for d in doc_ids if d % 10 == 7)


def test_phash_hot_bucket_guard(spark):
    """A planted constant-color image class (600 identical phashes) must
    be dropped, not expanded into 600·599/2 pairs — and a small distinct
    bucket must survive the cap. Mirrors the MinHash guard test."""
    from go_crawler_spark.functions.multimodal import (
        phash_hot_buckets_for,
        phash_neardup_pairs,
    )

    # flood class: all four 16-bit bands = 0; survivors live in a band-3
    # bucket of their own (value 5), differ by 1 bit in band 0, and sit
    # ≥14 bits from the flood hash (so no flood×survivor pair can pass
    # the Hamming rerank even ungated)
    rows = [(i, 0) for i in range(600)]
    rows += [(1000, (5 << 48) | 0x7FF3), (1001, (5 << 48) | 0x7FF1)]
    corpus = spark.createDataFrame(rows, "img_id long, phash long")

    pairs = {
        (r["img_a"], r["img_b"], r["hamming"])
        for r in phash_neardup_pairs(corpus, max_bucket=16).collect()
    }
    assert pairs == {(1000, 1001, 1)}

    hot = phash_hot_buckets_for(corpus, max_bucket=16).collect()
    # bands 0-3 of the flood hash are all value 0; bands 1-2 also catch
    # the two survivors (their middle bands are 0 too)
    assert {(r["band_id"], r["bucket_n"]) for r in hot} == {
        (0, 600), (1, 602), (2, 602), (3, 600),
    }

    # with the cap effectively off, the flood explodes quadratically —
    ungated = {
        (r["img_a"], r["img_b"])
        for r in phash_neardup_pairs(corpus, max_bucket=1_000_000).collect()
    }
    assert len(ungated) == 600 * 599 // 2 + 1  # what the guard prevents


def test_video_frame_sample(spark, sf_small):
    """Container round-trip + sampling rule + distributed == golden."""
    from go_crawler_spark.functions.multimodal import (
        VIDEO_SAMPLE_EVERY,
        q_video_frame_sample,
        sample_frames_project,
        video_bytes,
        video_frame_golden,
    )

    # scalar: sampled indices are exactly every-Nth, t_ms integer math
    vid = video_bytes(7)
    frames = list(sample_frames_project(vid, VIDEO_SAMPLE_EVERY))
    n_frames = frames[0][0]
    assert [f[1] for f in frames] == list(range(0, n_frames, VIDEO_SAMPLE_EVERY))
    fps = 10 + 7 % 5
    assert all(t == j * 1000 // fps for _, j, t, _px in frames)

    # distributed run reproduces the pure-Python golden exactly
    got = {
        (r["vid_id"], r["frame_idx"]): (
            r["n_frames"], r["t_ms"], r["w"], r["h"], r["phash"]
        )
        for r in q_video_frame_sample(spark, sf_small).collect()
    }
    gold = {
        (v, j): (n, t, w, h, p) for v, n, j, t, w, h, p in video_frame_golden()
    }
    assert got == gold and len(got) > 0


def test_audio_features(spark, sf_small):
    """Scalar feature math + distributed == golden."""
    from go_crawler_spark.functions.multimodal import (
        audio_bytes,
        audio_features_of,
        audio_features_golden,
        q_audio_features,
    )

    f = audio_features_of(audio_bytes(5))
    rate = (8 + 5 % 3) * 1000
    n = 2000 + (5 * 37) % 1500
    assert f["sample_rate"] == rate and f["n_samples"] == n
    assert f["duration_ms"] == n * 1000 // rate
    assert 0 < f["peak"] <= 1050 and f["sum_sq"] > 0
    assert f["zero_crossings"] > 0

    got = {
        tuple(r) for r in q_audio_features(spark, sf_small).collect()
    }
    assert got == set(audio_features_golden()) and len(got) > 0


def test_ann_ivf_structure_and_recall(spark, sf_small):
    """IVF top-k: ranks are dense 1..n per query, n <= IVF_TOPK, and
    recall vs brute-force top-3 clears the pinned floor. The corpus is
    deterministic so recall is a constant (measured 0.467 on the
    clusterless near-random test embeddings — the prune's documented
    price; real clustered corpora recall far higher)."""
    from go_crawler_spark.functions.similarity import (
        IVF_TOPK,
        q_ann_cosine_topk,
        q_ann_ivf_topk,
    )

    ivf = q_ann_ivf_topk(spark, sf_small).collect()
    assert len(ivf) > 0
    per_q: dict[int, list] = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r)
    for rows in per_q.values():
        assert len(rows) <= IVF_TOPK
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_cosine_topk(spark, sf_small).collect()
        if r["rank"] <= IVF_TOPK
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(got & brute) / len(brute) >= 0.4


def _union_find(nodes, edges):
    """Reference union-find (path compression) → {node: min-id root}."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id root for every node
    return {n: find(n) for n in nodes}


def test_cc_star_contraction_vs_unionfind(spark):
    """Star contraction on a pathological graph — a 60-node chain (the
    worst case for label propagation: diameter 59), a 12-clique, one
    isolated pair — must match union-find exactly and converge well
    inside CC_MAX_ITER (O(log² n) rounds)."""
    from go_crawler_spark.functions.similarity import (
        CC_MAX_ITER,
        cc_star_contraction,
    )

    chain = [(i, i + 1) for i in range(100, 160)]
    clique = [(a, b) for a in range(500, 512) for b in range(a + 1, 512)]
    pair = [(900, 901)]
    edges = chain + clique + pair
    nodes = sorted({n for e in edges for n in e})
    expected = _union_find(nodes, edges)

    df = spark.createDataFrame(edges, "u long, v long")
    star = {r.u: r.v for r in cc_star_contraction(df, CC_MAX_ITER).collect()}
    got = {n: star.get(n, n) for n in nodes}
    assert got == expected


def test_neardup_components_vs_unionfind(spark, sf_small):
    """The full operator must equal union-find over its own verified
    edge set: same components, canonical = min doc_id, singletons map
    to themselves."""
    from go_crawler_spark.functions.similarity import (
        neardup_edges,
        q_neardup_components,
    )
    from go_crawler_spark.tables import load

    edges = [(r.u, r.v) for r in neardup_edges(spark, sf_small).collect()]
    docs = [r.doc_id for r in
            load(spark, sf_small, "documents").select("doc_id").collect()]
    expected = _union_find(sorted(set(docs)), edges)

    rows = q_neardup_components(spark, sf_small).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.component == expected[r.doc_id], r
        assert r.is_canonical == (r.component == r.doc_id)
    # the corpus plants real dups: at least one non-trivial component
    assert any(not r.is_canonical for r in rows)


def test_phash_components_variants_clustered(spark, sf_small):
    """Planted phash variants (doc%10==7 has a perturbed copy at
    +100000) must land in their base image's component with the base as
    canonical; unrelated images stay singletons."""
    from go_crawler_spark.functions.multimodal import (
        PHASH_N_DOCS,
        PHASH_VARIANT_OFFSET,
        q_phash_components,
    )

    comp = {r.img_id: r for r in q_phash_components(spark, sf_small).collect()}
    planted = [d for d in range(PHASH_N_DOCS) if d % 10 == 7]
    for d in planted:
        v = d + PHASH_VARIANT_OFFSET
        assert comp[v].component == comp[d].component
        assert comp[d].is_canonical and not comp[v].is_canonical
    # unrelated high-entropy images: overwhelming majority canonical
    n_canon = sum(1 for r in comp.values() if r.is_canonical)
    assert n_canon >= len(comp) - 2 * len(planted)


def test_train_mix_sample_deterministic_and_gated(spark, sf_small):
    """The sample gate must be a pure function of doc_id: identical row
    set across runs and under different partitioning, and every kept row
    respects its stratum's rate."""
    from go_crawler_spark.functions.textstats import (
        TRAIN_MIX_PERMILLE,
        q_train_mix_sample,
    )

    rows = q_train_mix_sample(spark, sf_small).collect()
    again = {
        (r.doc_id, r.lang_pred, r.bucket, r.rate_permille)
        for r in q_train_mix_sample(spark, sf_small)
        .repartition(13)
        .collect()
    }
    assert {(r.doc_id, r.lang_pred, r.bucket, r.rate_permille)
            for r in rows} == again
    for r in rows:
        assert r.rate_permille == TRAIN_MIX_PERMILLE[
            r.lang_pred if r.lang_pred in TRAIN_MIX_PERMILLE else "other"
        ]
        assert 0 <= r.bucket < r.rate_permille


def test_pii_scrub_redacts_everything(spark, sf_small):
    """Every rendered doc carries exactly one email, IP, and phone; the
    clean text must contain the placeholders and no residual PII."""
    from go_crawler_spark.functions.cleaning import q_pii_scrub

    rows = q_pii_scrub(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
        assert "<EMAIL>" in r.clean_text
        assert "<IP>" in r.clean_text
        assert "<PHONE>" in r.clean_text
        assert "@" not in r.clean_text
        assert "example.com" not in r.clean_text


def test_boilerplate_strip_threshold(spark, sf_small):
    """The universal nav header (100% doc frequency) and the 20%-shared
    footer must be stripped at the 10% threshold; the unique body and
    per-doc tag line must survive, in order."""
    from go_crawler_spark.functions.cleaning import q_boilerplate_strip

    rows = q_boilerplate_strip(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_lines_stripped == 2 and r.n_lines_kept == 2
        lines = r.clean_text.split("\n")
        assert len(lines) == 2
        assert lines[1] == f"tag doc-{r.doc_id}"
        assert "NAV" not in r.clean_text and "footer" not in r.clean_text


def test_corpus_keep_composition(spark, sf_small):
    """The composed keep decision must equal the conjunction of the four
    standalone gates, each recomputed via its own registry query — so a
    drift in any sub-operator breaks this test even before the oracle."""
    from go_crawler_spark.functions.cleaning import QUALITY_MIN, q_corpus_keep
    from go_crawler_spark.functions.similarity import q_neardup_components
    from go_crawler_spark.functions.textstats import (
        q_exact_dedup,
        q_quality_score,
        q_train_mix_sample,
    )

    rows = {r.doc_id: r for r in q_corpus_keep(spark, sf_small).collect()}
    keepers = {r.keeper_id for r in q_exact_dedup(spark, sf_small).collect()}
    canon = {
        r.doc_id
        for r in q_neardup_components(spark, sf_small).collect()
        if r.is_canonical
    }
    sampled = {r.doc_id for r in q_train_mix_sample(spark, sf_small).collect()}
    quality = {
        r.doc_id: r.quality for r in q_quality_score(spark, sf_small).collect()
    }
    assert set(rows) == set(quality)  # exactly one decision per document
    for d, r in rows.items():
        assert r.is_exact_keeper == (d in keepers)
        assert r.is_neardup_canonical == (d in canon)
        assert r.sampled == (d in sampled)
        assert r.quality == quality[d]
        assert r.keep == (
            r.is_exact_keeper
            and r.is_neardup_canonical
            and r.sampled
            and r.quality >= QUALITY_MIN
        )
    kept = sum(1 for r in rows.values() if r.keep)
    assert 0 < kept < len(rows)  # the gate actually discriminates


def test_token_count_bpe_matches_python_re(spark, sf_small):
    """The JVM regexp_extract_all count must agree with Python's re
    module on every document (the pattern stays in the Java∩RE2∩Python
    common subset, so all three engines tokenize identically)."""
    import re

    from go_crawler_spark.functions.textstats import (
        BPE_TOKEN_RE,
        q_token_count_bpe,
    )
    from go_crawler_spark.tables import load

    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_small, "documents").collect()
    }
    pat = re.compile(BPE_TOKEN_RE)
    for r in q_token_count_bpe(spark, sf_small).collect():
        assert r.n_tokens_bpe == len(pat.findall(texts[r.doc_id]))
        assert r.n_tokens_ws == len(texts[r.doc_id].split())
        # BPE pretokens are at least as fine-grained as whitespace words
        assert r.n_tokens_bpe >= r.n_tokens_ws


def test_gopher_flags_recompute(spark, sf_small):
    """Every flag recomputed in plain Python per document."""
    import re

    from go_crawler_spark.functions.textstats import (
        GOPHER_MIN_WORDS,
        GOPHER_SYMBOL_RE,
        STOPWORDS_EN,
        q_gopher_quality_flags,
    )
    from go_crawler_spark.tables import load

    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_small, "documents").collect()
    }
    rows = q_gopher_quality_flags(spark, sf_small).collect()
    assert len(rows) == len(texts)
    sym = re.compile(GOPHER_SYMBOL_RE)
    seen_keep = set()
    for r in rows:
        toks = texts[r.doc_id].split()
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        low = [t.lower() for t in toks]
        exp = {
            "words_ok": n >= GOPHER_MIN_WORDS,
            "word_len_ok": 3 * n <= sum_len <= 10 * n,
            "symbol_ok": len(sym.findall(texts[r.doc_id])) * 10 <= n,
            "stopword_ok": sum(1 for s in STOPWORDS_EN if s in low) >= 2,
            "repetition_ok": (n - len(set(toks))) * 10 <= n * 3,
            "alpha_ok": sum(1 for t in toks if re.search("[A-Za-z]", t)) * 10
            >= n * 8,
        }
        assert r.n_words == n
        for name, want in exp.items():
            assert getattr(r, name) == want, (r.doc_id, name)
        assert r.gopher_keep == all(exp.values())
        seen_keep.add(r.gopher_keep)
    assert seen_keep == {True, False}  # the rules actually discriminate


def test_decontaminate_planted(spark, sf_small):
    """Non-eval documents whose text is an exact copy of an eval
    document must be flagged with 100% shingle overlap; eval docs never
    appear in the output; overlap is bounded by the shingle count."""
    from go_crawler_spark.functions.cleaning import (
        DECON_EVAL_MOD,
        q_decontaminate,
    )
    from go_crawler_spark.tables import load

    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_small, "documents").collect()
    }
    eval_texts = {
        t for d, t in texts.items() if d % DECON_EVAL_MOD == 0
    }
    rows = {r.doc_id: r for r in q_decontaminate(spark, sf_small).collect()}
    assert rows and all(d % DECON_EVAL_MOD != 0 for d in rows)
    assert len(rows) == sum(1 for d in texts if d % DECON_EVAL_MOD != 0)
    for d, r in rows.items():
        assert 0 <= r.n_overlap <= r.n_shingles
        if texts[d] in eval_texts and r.n_shingles > 0:
            assert r.n_overlap == r.n_shingles and r.contaminated


def test_ann_matryoshka_parity_and_recall(spark, sf_small):
    """Matryoshka cascade: exact algorithm parity vs an independent
    numpy replay (coarse prefix rank → shortlist → full-dim rerank,
    identical rounding and tie-breaks), plus recall vs full-dim
    brute-force top-k on the same decay-weighted corpus (measured 1.0
    at sf0.001/sf0.01; floor pinned at 0.8)."""
    import numpy as np
    import pyarrow.parquet as pq

    from go_crawler_spark.functions.similarity import (
        MRL_DECAY,
        MRL_PREFIX,
        MRL_SHORTLIST,
        MRL_TOPK,
        q_ann_matryoshka_topk,
    )

    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    raw = np.array(
        [np.array(x) for x in t["embedding"].to_pylist()], dtype=np.float64
    )
    w = float(MRL_DECAY) / (float(MRL_DECAY) + np.arange(raw.shape[1]))
    emb = raw * w
    nrm = np.linalg.norm(emb, axis=1)
    pnrm = np.linalg.norm(emb[:, :MRL_PREFIX], axis=1)

    def topk(scores, nids, k):
        order = np.lexsort((nids, -scores))
        return [(int(n), float(s)) for n, s in
                zip(nids[order][:k], scores[order][:k])]

    expect = {}
    recalls = []
    for qi in np.where(ids % 100 == 0)[0]:
        mask = ids != ids[qi]
        nids = ids[mask]
        full = np.round((emb[mask] @ emb[qi]) / (nrm[mask] * nrm[qi]), 6)
        pre = np.round(
            (emb[mask][:, :MRL_PREFIX] @ emb[qi][:MRL_PREFIX])
            / (pnrm[mask] * pnrm[qi]),
            6,
        )
        shortlist = [n for n, _ in topk(pre, nids, MRL_SHORTLIST)]
        sl = np.isin(nids, shortlist)
        mrl = topk(full[sl], nids[sl], MRL_TOPK)
        for rank, (n, s) in enumerate(mrl, start=1):
            expect[(int(ids[qi]), rank)] = (n, s)
        brute = {n for n, _ in topk(full, nids, MRL_TOPK)}
        recalls.append(len(brute & {n for n, _ in mrl}) / MRL_TOPK)

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in q_ann_matryoshka_topk(spark, sf_small).collect()
    }
    assert set(got) == set(expect)
    for key, (nid, sim) in expect.items():
        gnid, gsim = got[key]
        assert gnid == nid, (key, nid, gnid)
        assert abs(gsim - sim) < 1e-9, (key, sim, gsim)
    assert sum(recalls) / len(recalls) >= 0.8
