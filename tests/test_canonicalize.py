"""URL kernel semantics + xxhash64 Spark parity (SURVEY.md §2 B2/B9/E4)."""

from pyspark.sql import functions as F

from go_crawler_spark.crawl.canonicalize import canon_url, xxhash64_py

BASE = "https://h00.example.com/list/0?p=2"


def test_absolute_passthrough():
    # resolveURL: absolute URLs pass through (crawler.go:162-179)
    assert canon_url(BASE, "https://other.example.com/x") == "https://other.example.com/x"


def test_relative_resolution():
    assert canon_url(BASE, "/job/5") == "https://h00.example.com/job/5"
    assert canon_url(BASE, "../job/5") == "https://h00.example.com/job/5"


def test_fragment_stripped_and_default_port():
    assert canon_url(BASE, "https://h00.example.com/job/5#desc") == (
        "https://h00.example.com/job/5"
    )
    assert canon_url(None, "https://h00.example.com:443/a") == "https://h00.example.com/a"
    assert canon_url(None, "http://h00.example.com:80/a") == "http://h00.example.com/a"
    assert canon_url(None, "https://h00.example.com:8443/a") == (
        "https://h00.example.com:8443/a"
    )


def test_validity_gate():
    # NewCrawlJob's ParseRequestURI gate (crawl_job.go:29-40)
    assert canon_url(None, "notaurl") is None
    assert canon_url(None, "ftp://h/x") is None
    assert canon_url(None, "https:///nohost") is None


def test_nfkc_and_case():
    # width.Narrow parity: full-width chars narrowed (E4)
    assert canon_url(None, "ｈｔｔｐｓ://ＨＯＳＴ.example.com/Ｘ") == (
        "https://host.example.com/X"
    )
    assert canon_url(None, "HTTPS://MiXeD.ExAmPlE.com/Path") == (
        "https://mixed.example.com/Path"
    )


def test_empty_path_and_query_kept():
    assert canon_url(None, "https://h.example.com") == "https://h.example.com/"
    # query strings stay byte-exact (exact-string seen-set keying, §1.4)
    assert canon_url(None, "https://h.example.com/l?b=2&a=1") == (
        "https://h.example.com/l?b=2&a=1"
    )


def test_batch_fast_path_parity():
    """canonicalize_batch's vectorized tier must agree with canon_url."""
    import pandas as pd

    from go_crawler_spark.crawl.canonicalize import canonicalize_batch

    bases = [
        BASE,
        "https://h01.example.com/",
        "https://h.example.com:8443/list/3?p=9",
        "http://h.example.com/a/b",
        "HTTPS://Upper.example.com/x",  # non-canonical base → slow path
    ]
    hrefs = [
        "/job/5",
        "/job/5?x=1&y=2",
        "/a/b/c.html",
        "/p%20q",
        "../job/9",  # dot segment → slow path
        "/job/5#frag",  # fragment → slow path
        "//other.example.com/z",  # protocol-relative → slow path
        "/日本語/パス",  # non-ASCII → slow path
        "job/7",  # not root-relative → slow path
        "https://abs.example.com/ok",
        "/x/..",  # trailing dot-dot → slow path
        "/x/.",
        "notaurl",
        "",
    ]
    pairs = [(b, h) for b in bases for h in hrefs]
    got = canonicalize_batch(
        pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs])
    )
    for i, (b, h) in enumerate(pairs):
        assert got[i] == canon_url(b, h), (b, h, got[i], canon_url(b, h))


def test_xxhash64_matches_spark(spark):
    samples = [
        "",
        "a",
        "abc",
        "https://h00.example.com/job/5",
        "https://h01.example.com/list/1?p=12",
        "日本語のＵＲＬテスト",
        "x" * 100,
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxhash64_py(s) == got[s], f"hash mismatch for {s!r}"


def test_xxhash64_long_input_parity(spark):
    # >32-byte inputs exercise the 4-lane stripe path
    samples = ["y" * n for n in (31, 32, 33, 63, 64, 65, 100)]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxhash64_py(s) == got[s]
