"""Scrape/parse operator family (SURVEY.md §2 E): the reference's
26-field extraction pipeline re-expressed as Catalyst Column ladders.

Reusable Column builders (``*_col``) are consumed by the scraper
projection (go_crawler_spark.scraper) and by the ``q_*`` driver-contract
wrappers below. Everything here is JVM-side (regexp_*, when/otherwise,
try_to_timestamp) — whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_crawler_spark.tables import load

# ---------------------------------------------------------------------------
# Column builders (reference parity, cited per function)
# ---------------------------------------------------------------------------

# Six accepted date layouts, tried in order —
# /root/reference/internal/infra/job_posting_parser.go:106-124
DATE_FORMATS_SPARK = (
    "yyyy年MM月dd日",
    "yyyy/MM/dd",
    "yyyy-MM-dd",
    "yyyy.MM.dd",
    "yyyy年MM月dd日HH時mm分",
    "yyyy/MM/dd HH:mm",
)


def parse_posted_at(col: Column) -> Column:
    """Multi-format date parse, first-success-wins (parser.go:106-124)."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in DATE_FORMATS_SPARK]
    return F.coalesce(*attempts)


def extract_total_count(col: Column) -> Column:
    """Total-count extraction: first ``[0-9,]+`` run, commas stripped,
    cast int — /root/reference/internal/usecase/crawler.go:413-430."""
    raw = F.regexp_extract(col, r"[0-9][0-9,]*", 0)
    return F.nullif(F.replace(raw, F.lit(","), F.lit("")), F.lit("")).cast("int")


def parse_amount_yen(col: Column) -> Column:
    """Money parse with unit multipliers 億=1e8 / 万=1e4 / 千=1e3.

    The reference iterates a Go map (nondeterministic when two units
    co-occur, /root/reference/internal/infra/job_posting_parser.go:136-174);
    we fix precedence 億 > 万 > 千 — a deterministic superset documented
    in SURVEY.md §2 E7. Digits: first decimal run before the unit;
    fallback strips all non-digits.
    """
    num = F.regexp_extract(col, r"(\d+(?:\.\d+)?)", 1)
    plain = F.nullif(F.regexp_replace(col, r"[^0-9]", ""), F.lit(""))
    return (
        F.when(
            col.contains("億") & (num != ""),
            (num.cast("double") * 100_000_000).cast("long"),
        )
        .when(
            col.contains("万") & (num != ""),
            (num.cast("double") * 10_000).cast("long"),
        )
        .when(
            col.contains("千") & (num != ""),
            (num.cast("double") * 1_000).cast("long"),
        )
        .otherwise(plain.cast("long"))
    )


# Ordered contains-ladder classifiers. Order is load-bearing: the
# reference checks cases sequentially (first match wins).
JOB_TYPE_LADDER = (  # parser.go:73-94
    ("正社員", "正社員"),
    ("契約社員", "契約社員"),
    ("アルバイト", "アルバイト"),
    ("パート", "パート"),
    ("業務委託", "業務委託"),
    ("派遣", "派遣社員"),
)

SALARY_TYPE_LADDER = (  # parser.go:324-337
    ("年収", "年収"),
    ("年給", "年収"),
    ("月給", "月給"),
    ("日給", "日給"),
    ("時給", "時給"),
)

HOLIDAY_POLICY_LADDER = (  # parser.go:382-398 — 完全… must precede 週休二日制
    ("完全週休二日制", "完全週休二日制"),
    ("週休二日制", "週休二日制"),
    ("週休制", "週休制"),
    ("シフト制", "シフト制"),
)

WORKPLACE_LADDER = (  # parser.go:409-421 — フルリモート unreachable (kept)
    ("出社", "出社"),
    ("在宅", "リモート"),
    ("リモート", "リモート"),
    ("ハイブリッド", "ハイブリッド"),
)


def contains_ladder(
    col: Column, ladder: tuple[tuple[str, str], ...], default: str = "不明"
) -> Column:
    """Ordered strings.Contains ladder → when/otherwise chain (codegen)."""
    expr: Column | None = None
    for needle, label in ladder:
        cond = col.contains(needle)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(default)


def parse_optional_uint(col: Column) -> Column:
    """Strip non-digits; empty → NULL (parser.go:350-371)."""
    return F.nullif(F.regexp_replace(col, r"[^0-9]", ""), F.lit("")).cast("long")


def normalize_string_native(col: Column) -> Column:
    """The JVM-side 95% of the reference's normalizeString
    (parser.go:617-641): fullwidth digit/symbol folding + unicode-space
    trim + control-char strip. Full NFKC parity lives in the
    vectorized kernel (functions/kernels.py) for the canonicalize path;
    this native form is used in extraction ladders where the input
    alphabet is known.
    """
    c = F.translate(
        col,
        "０１２３４５６７８９：－．（）／＼〜～",
        "0123456789:-.()/\\~~",
    )
    c = F.regexp_replace(c, r"[ 　]", " ")
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    return F.trim(c)


# ---------------------------------------------------------------------------
# Driver-contract queries (oracle-paired)
# ---------------------------------------------------------------------------


def q_extract_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 over documents.text + events.props (digits appear in props)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        extract_total_count(F.col("props")).alias("total_count"),
    )


def q_date_parse_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: render o_orderdate into one of 4 layouts (picked by key mod),
    then recover it via the first-success coalesce ladder. The render +
    reparse round-trip makes the multi-format parse oracle-checkable on
    deterministic inputs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # render/parse parity
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4
    rendered = (
        F.when(k == 0, F.date_format("o_orderdate", "yyyy年MM月dd日"))
        .when(k == 1, F.date_format("o_orderdate", "yyyy/MM/dd"))
        .when(k == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "yyyy.MM.dd"))
    )
    df = orders.select("o_orderkey", rendered.alias("posted_at_raw"))
    return df.select(
        "o_orderkey",
        "posted_at_raw",
        F.date_format(parse_posted_at(F.col("posted_at_raw")), "yyyy-MM-dd").alias(
            "posted_at"
        ),
    )


def q_classifier_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E11/E13-shaped ordered ladder over p_type (first match wins)."""
    part = load(spark, sf_dir, "part")
    ladder = (
        ("ECONOMY", "economy"),
        ("STANDARD", "standard"),
        ("MEDIUM", "medium"),
        ("PROMO", "promo"),
        ("LARGE", "large"),
        ("SMALL", "small"),
    )
    return part.select(
        "p_partkey",
        contains_ladder(F.col("p_type"), ladder, default="unknown").alias(
            "type_class"
        ),
    )


def q_amount_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: synthesize unit-suffixed money strings from part rows, parse
    back to yen with fixed 億>万>千 precedence."""
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey") % 4
    raw = (
        F.when(k == 0, F.concat(F.lit("月給"), F.col("p_size").cast("string"), F.lit("万円")))
        .when(k == 1, F.concat(F.col("p_size").cast("string"), F.lit("千円")))
        .when(k == 2, F.concat(F.lit("年収0."), (F.col("p_size") % 10).cast("string"), F.lit("億円")))
        .otherwise(F.concat(F.lit("時給 "), (F.col("p_size") * 13).cast("string"), F.lit("円")))
    )
    df = part.select("p_partkey", raw.alias("salary_raw"))
    return df.select(
        "p_partkey",
        "salary_raw",
        parse_amount_yen(F.col("salary_raw")).alias("amount_yen"),
    )


def q_optional_uint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: digit-strip parse over event props JSON fragments."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", parse_optional_uint(F.col("props")).alias("holidays")
    )


# ---------------------------------------------------------------------------
# B7/B8: pagination URL construction + page-one normalization
# (/root/reference/internal/usecase/crawler.go:476-516, 527-564)
# ---------------------------------------------------------------------------


def q_paginated_url_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: the four buildPaginatedURL modes over synthesized bases.

    Query mode sets/replaces the param (Go url.Values.Set + Encode —
    single-param bases, so the alphabetical re-encode is a no-op);
    Path joins '/{param}/{page}'; Segment appends '/{param}{page}';
    None passes through.
    """
    part = load(spark, sf_dir, "part")
    mode = F.col("p_partkey") % 4
    page = (F.col("p_size") % 20 + 1).cast("string")
    base = F.format_string("https://x.example.com/list/%d", F.col("p_partkey"))
    base_q = F.concat(base, F.lit("?p=1"))
    trimmed = F.regexp_replace(base, r"/$", "")
    page_url = (
        F.when(mode == 0, base)  # None
        .when(mode == 1, F.concat(F.regexp_replace(base_q, r"\?p=\d+$", ""),
                                  F.lit("?p="), page))  # Query (replace)
        .when(mode == 2, F.concat(trimmed, F.lit("/page/"), page))  # Path
        .otherwise(F.concat(trimmed, F.lit("/page"), page))  # Segment
    )
    return part.select(
        "p_partkey",
        mode.cast("int").alias("mode"),
        page_url.alias("page_url"),
    )


def q_page_one_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: normalizeToPageOneURL — strip '/param/N', '/paramN', or the
    query param, per mode (anchored regexes, crawler.go:541/549/556)."""
    part = load(spark, sf_dir, "part")
    mode = F.col("p_partkey") % 3
    n = (F.col("p_size") % 20 + 1).cast("string")
    raw = (
        F.when(mode == 0, F.format_string("https://x.example.com/list/%d", F.col("p_partkey")))
        .when(mode == 1, F.concat(F.format_string("https://x.example.com/list/%d", F.col("p_partkey")), F.lit("/page/"), n))
        .otherwise(F.concat(F.format_string("https://x.example.com/list/%d", F.col("p_partkey")), F.lit("/page"), n))
    )
    raw = F.when(mode == 0, F.concat(raw, F.lit("?p="), n)).otherwise(raw)
    normalized = (
        F.when(mode == 0, F.regexp_replace(raw, r"\?p=\d+$", ""))  # Query: del param
        .when(mode == 1, F.regexp_replace(raw, r"/page/\d+$", "/"))  # Path
        .otherwise(F.regexp_replace(raw, r"/page\d+$", "/"))  # Segment
    )
    return part.select(
        "p_partkey", raw.alias("raw_url"), normalized.alias("page_one_url")
    )


def q_attr_extract_empty_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: CSS attribute extraction with empty-value skip.

    The reference's ExtractAttribute collects the attribute of every
    selector match and silently drops empty values
    (/root/reference/internal/infra/html_document.go:84-98; the caller
    skips empties at browser_client.go:270-272). Graft analog: all
    href captures of an anchor pattern, empties filtered — the
    ``array_compact``-style semantics of SURVEY §2 E2, all JVM-side."""
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    second = F.when(k % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/b/"), k.cast("string"))
    )
    third = F.when(k % 2 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/q/"), k.cast("string"))
    )
    html = F.concat(
        F.lit('<a href="/p/'), k.cast("string"), F.lit('">x</a>'),
        F.lit('<a href="'), second, F.lit('">y</a>'),
        F.lit('<a href="'), third, F.lit('">z</a>'),
    )
    attrs = F.filter(
        F.regexp_extract_all(html, F.lit(r'href="([^"]*)"'), 1),
        lambda v: v != "",
    )
    return part.select(
        "p_partkey",
        html.alias("html"),
        F.size(attrs).cast("long").alias("n_attrs"),
        F.array_join(attrs, ",").alias("attrs_joined"),
    )


def q_query_reencode_multiparam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 (query mode, full fidelity): multi-param query re-encode.

    Go's url.Values.Set("p", page) + Encode() re-emits ALL query params
    sorted by key (/root/reference/internal/usecase/crawler.go:487-495)
    — a base with several params gets alphabetically re-ordered, not
    just suffixed. Re-expressed as split → drop old p → append new →
    array_sort → join. Param values here are alphanumeric, so Go's
    percent-escaping is the identity; whole-string sort equals Go's
    key sort because '=' (0x3D) < any key character."""
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    page = (F.col("p_size") % 20 + 1).cast("string")
    base = F.concat(
        F.lit("https://x.example.com/list?page_size=20&q=term"),
        k.cast("string"),
        F.when(k % 2 == 0, F.concat(F.lit("&p="), (k % 7 + 2).cast("string")))
        .otherwise(F.lit("")),
    )
    path = F.substring_index(base, "?", 1)
    params = F.split(F.substring_index(base, "?", -1), "&")
    kept = F.filter(params, lambda x: ~x.startswith("p="))
    new_params = F.array_sort(
        F.concat(kept, F.array(F.concat(F.lit("p="), page)))
    )
    return part.select(
        "p_partkey",
        base.alias("base_url"),
        F.concat(path, F.lit("?"), F.array_join(new_params, "&")).alias("page_url"),
    )


# ---------------------------------------------------------------------------
# robots.txt parsing (north-rule addition — the reference has NO robots
# handling, SURVEY §1.4; the engine consumes a parsed robots_df, and
# this operator is the text → (crawl_delay, disallow) front of that)
# ---------------------------------------------------------------------------

# the User-agent: * group: everything after the star line up to the
# next User-agent line (or end of file); (?s) lets . cross newlines
_ROBOTS_STAR_BLOCK = r"(?s)User-agent:[ \t]*\*[ \t]*\n(.*?)(?:User-agent:|$)"


def robots_cols(txt: Column, round_seconds: float) -> dict[str, Column]:
    """Parse a robots.txt body: the ``User-agent: *`` group's
    Disallow and Allow paths (order of appearance), Crawl-delay
    (default 1.0), and the derived per-round politeness budget
    (max(1, floor(round_seconds / delay)) — CrawlConfig.budget).
    All Catalyst: one block extract + regexp_extract_all ladders."""
    block = F.regexp_extract(txt, _ROBOTS_STAR_BLOCK, 1)
    disallow = F.regexp_extract_all(block, F.lit(r"Disallow:[ \t]*(\S+)"), 1)
    # capital A cannot match inside "Disallow:" (lowercase 'a' there)
    allow = F.regexp_extract_all(block, F.lit(r"Allow:[ \t]*(\S+)"), 1)
    delay = F.coalesce(
        F.nullif(
            F.regexp_extract(block, r"Crawl-delay:[ \t]*([0-9.]+)", 1), F.lit("")
        ).cast("double"),
        F.lit(1.0),
    )
    budget = F.greatest(
        F.lit(1), F.floor(F.lit(round_seconds) / delay)
    ).cast("long")
    return {
        "crawl_delay": delay,
        "disallow": disallow,
        "allow": allow,
        "budget": budget,
    }


def robots_longest_match(rules: Column, path: Column) -> Column:
    """Length of the longest rule prefix in ``rules`` matching ``path``
    (0 if none) — the RFC 9309 §2.2.2 specificity key."""
    return F.aggregate(
        F.filter(rules, lambda p: path.startswith(p)),
        F.lit(0),
        lambda acc, p: F.greatest(acc, F.length(p)),
    )


def robots_path_allowed(
    path: Column, disallow: Column, allow: Column
) -> Column:
    """RFC 9309 precedence: the most specific (longest-prefix) matching
    rule wins; a tie between an Allow and a Disallow of equal length
    goes to Allow (least restrictive). No rule matching → allowed."""
    return robots_longest_match(disallow, path) <= robots_longest_match(
        allow, path
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots.txt → per-host politeness config. Synthesizes a realistic
    robots body per supplier row (foreign-bot group first — which must
    be IGNORED — then the * group with a keyed number of Disallow,
    Allow, comment, and optional Crawl-delay lines), then parses it
    back. A probe path under /private exercises Allow precedence both
    ways: rows with ``Allow: /private/job`` (k%5==0) readmit the probe
    past the shorter ``Disallow: /private``, unless an even longer
    exact Disallow (k%4==0) wins it back."""
    sup = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    delay_line = F.when(
        k % 3 == 0, F.concat(F.lit("Crawl-delay: "), (k % 9 + 1).cast("string"),
                             F.lit("\n"))
    ).otherwise(F.lit(""))
    second_dis = F.when(
        k % 2 == 0, F.concat(F.lit("Disallow: /tmp/"), k.cast("string"),
                             F.lit("\n"))
    ).otherwise(F.lit(""))
    allow_priv = F.when(
        k % 5 == 0, F.lit("Allow: /private/job\n")
    ).otherwise(F.lit(""))
    probe_dis = F.when(
        k % 4 == 0,
        F.concat(F.lit("Disallow: /private/job/"), (k % 10).cast("string"),
                 F.lit("\n")),
    ).otherwise(F.lit(""))
    txt = F.concat(
        F.lit("# synthetic robots\nUser-agent: OtherBot\nDisallow: /\n\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /private\n"),
        second_dis,
        probe_dis,
        delay_line,
        F.lit("Allow: /public\n"),
        allow_priv,
    )
    cols = robots_cols(F.col("robots_txt"), round_seconds=60.0)
    probe = F.concat(F.lit("/private/job/"), (k % 10).cast("string"))
    return sup.select("s_suppkey", txt.alias("robots_txt")).select(
        "s_suppkey",
        "robots_txt",
        cols["crawl_delay"].alias("crawl_delay"),
        F.array_join(cols["disallow"], ",").alias("disallow_joined"),
        F.array_join(cols["allow"], ",").alias("allow_joined"),
        cols["budget"].alias("budget"),
        probe.alias("probe_path"),
        robots_path_allowed(probe, cols["disallow"], cols["allow"]).alias(
            "probe_allowed"
        ),
    )


def q_json_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: CrawlJob record ⟷ JSON codec round-trip
    (/root/reference/internal/infra/model.go:13-28 — the Redis value is
    a JSON {id,url,status}); to_json → from_json must be identity."""
    from pyspark.sql import types as T

    orders = load(spark, sf_dir, "orders")
    rec = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.format_string("https://jobs.example.com/detail/%d", "o_orderkey").alias("url"),
            F.when(F.col("o_orderstatus") == "F", "SUCCESS")
            .otherwise("PENDING")
            .alias("status"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    )
    df = orders.select("o_orderkey", rec.alias("record_json"))
    back = F.from_json("record_json", schema)
    return df.select(
        "o_orderkey",
        "record_json",
        back.getField("id").alias("job_id"),
        back.getField("url").alias("job_url"),
        back.getField("status").alias("job_status"),
    )


def q_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier hygiene beyond robots.txt: every candidate URL checked
    against an operator-maintained blocklist of (host-or-wildcard,
    path-prefix) rules with robots-style longest-prefix-wins
    attribution (ties → smallest rule_id).

    Shape is the 100 TB one: the rule table is tiny and broadcast; the
    match is a broadcast join (the host equality/wildcard + prefix
    predicate runs map-side), then one groupBy on the URL key picks the
    winning rule — the frontier never shuffles its payload. URLs are
    synthesized deterministically from ``orders`` and rules from
    ``nation`` so the oracle replays both sides exactly."""
    orders = load(spark, sf_dir, "orders")
    urls = orders.select(
        "o_orderkey",
        F.format_string("shop%d.example.com", F.col("o_custkey") % 40).alias(
            "host"
        ),
        F.format_string(
            "/cat%d/item%d", F.col("o_orderkey") % 25, F.col("o_orderkey")
        ).alias("path"),
    )
    nation = load(spark, sf_dir, "nation")
    rules = nation.select(
        F.col("n_nationkey").cast("long").alias("rule_id"),
        F.when(
            F.col("n_nationkey") % 2 == 0,
            F.format_string("shop%d.example.com", F.col("n_nationkey") % 40),
        )
        .otherwise(F.lit("*"))
        .alias("host_pat"),
        F.format_string("/cat%d", F.col("n_nationkey")).alias("path_prefix"),
    )
    cond = (
        (F.col("host_pat") == "*") | (F.col("host_pat") == F.col("host"))
    ) & F.col("path").startswith(F.col("path_prefix"))
    hits = (
        urls.join(F.broadcast(rules), cond)
        .groupBy("o_orderkey")
        .agg(
            F.max_by(
                "rule_id",
                F.struct(
                    F.length("path_prefix").alias("l"),
                    (-F.col("rule_id")).alias("nr"),
                ),
            ).alias("matched_rule")
        )
    )
    return urls.join(hits, "o_orderkey", "left").select(
        "o_orderkey",
        F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias("url"),
        F.col("matched_rule").isNotNull().alias("blocked"),
        "matched_rule",
    )


# ---------------------------------------------------------------------------
# Sitemap.xml parse (north-rule crawl surface, sibling of robots.txt:
# the reference fetches list pages to discover detail URLs
# (/root/reference/internal/usecase/crawler.go list-link extraction);
# a web-scale frontier additionally ingests sitemaps — the protocol's
# bulk discovery channel — so the parse belongs next to robots_parse)
# ---------------------------------------------------------------------------

# sitemaps.org changefreq → re-fetch seconds (crawl-scheduler hint)
SITEMAP_FREQS = ("always", "hourly", "daily", "weekly", "monthly", "yearly")
SITEMAP_FREQ_SEC = (60, 3600, 86400, 604800, 2592000, 31536000)


def _freq_to_sec(freq: Column) -> Column:
    out = F.lit(None).cast("long")
    for name, sec in zip(SITEMAP_FREQS, SITEMAP_FREQ_SEC):
        out = F.when(freq == name, F.lit(sec).cast("long")).otherwise(out)
    return out


def sitemap_cols(xml: Column) -> dict[str, Column]:
    """Parse a sitemaps.org urlset body: per-entry <loc>, <lastmod>,
    <changefreq>, <priority>, reduced to the columns a frontier
    scheduler consumes. All Catalyst (regexp_extract_all + array
    folds); the XML body never leaves the executor that scanned it."""
    locs = F.regexp_extract_all(xml, F.lit(r"<loc>([^<]*)</loc>"), 1)
    lastmods = F.regexp_extract_all(xml, F.lit(r"<lastmod>([^<]*)</lastmod>"), 1)
    freqs = F.regexp_extract_all(
        xml, F.lit(r"<changefreq>([^<]*)</changefreq>"), 1
    )
    prios = F.regexp_extract_all(xml, F.lit(r"<priority>([^<]*)</priority>"), 1)
    return {
        "n_urls": F.size(locs).cast("long"),
        "first_loc": F.element_at(locs, 1),
        # ISO dates are zero-padded → lexicographic max == newest
        "lastmod_max": F.array_max(lastmods),
        # "0.5" → 5, "1.0" → 10: drop the dot, cast (zero-pad safe)
        "max_priority_tenths": F.array_max(
            F.transform(
                prios,
                lambda p: F.replace(p, F.lit("."), F.lit("")).cast("long"),
            )
        ),
        "min_refetch_sec": F.array_min(F.transform(freqs, _freq_to_sec)),
    }


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion: synthesize a urlset XML per supplier host
    (entry count, dates, changefreq and priority all keyed off
    s_suppkey so the DuckDB oracle renders the identical body), then
    parse it back into frontier-scheduler columns. Narrow map end to
    end — one scan, zero shuffles; at 100 TB each sitemap body is
    parsed where it lands and only the ~40-byte summary row survives."""
    sup = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")

    def entry(j: Column) -> Column:
        month = F.lpad(((k * 7 + j) % 12 + 1).cast("string"), 2, "0")
        day = F.lpad(((k + j * 3) % 28 + 1).cast("string"), 2, "0")
        tenths = (k + j) % 10 + 1
        prio = F.when(tenths == 10, F.lit("1.0")).otherwise(
            F.concat(F.lit("0."), tenths.cast("string"))
        )
        freq = F.element_at(
            F.array(*[F.lit(s) for s in SITEMAP_FREQS]),
            ((k + j) % 6 + 1).cast("int"),
        )
        return F.concat(
            F.lit("<url><loc>https://host-"),
            k.cast("string"),
            F.lit(".example.com/page/"),
            j.cast("string"),
            F.lit("</loc><lastmod>2024-"),
            month,
            F.lit("-"),
            day,
            F.lit("</lastmod><changefreq>"),
            freq,
            F.lit("</changefreq><priority>"),
            prio,
            F.lit("</priority></url>\n"),
        )

    xml = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset>\n'),
        F.array_join(
            F.transform(F.sequence(F.lit(1).cast("long"), k % 5 + 1), entry), ""
        ),
        F.lit("</urlset>"),
    )
    cols = sitemap_cols(F.col("sitemap_xml"))
    return sup.select("s_suppkey", xml.alias("sitemap_xml")).select(
        "s_suppkey",
        cols["n_urls"].alias("n_urls"),
        cols["first_loc"].alias("first_loc"),
        cols["lastmod_max"].alias("lastmod_max"),
        cols["max_priority_tenths"].alias("max_priority_tenths"),
        cols["min_refetch_sec"].alias("min_refetch_sec"),
    )


# ---------------------------------------------------------------------------
# Crawl-trap defense: per-(host, URL-template) distinct-URL caps. The
# canonical anti-trap control on a production frontier — calendars,
# session ids and faceted search mint unbounded distinct URLs under one
# path template, and the scheduler caps fetches per template instead of
# drowning (the reference is immune only because its URL space is a
# fixed config, SURVEY.md §1.4; at 10^10 URLs the cap IS the defense).
# ---------------------------------------------------------------------------

TRAP_TEMPLATE_CAP = 16  # distinct URLs tolerated per (host, template)


def q_crawl_trap_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile discovered URLs by (host, digit-normalized template):
    distinct-URL count, raw hit count, over-cap flag and excess. URLs
    are synthesized from ``orders`` with four deliberately different
    template classes (product pages, calendar pages, bounded tag
    pages, session-id links) so the cap separates them.

    Scale shape: template normalization is a narrow regexp map; the
    only shuffle keys on (host, template) with partial aggregation —
    raw URLs never shuffle (count + count_distinct aggregate them
    map-side first). Output is template-cardinality, not URL-
    cardinality."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    path = (
        F.when(k % 4 == 0, F.concat(F.lit("/p/"), k.cast("string")))
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("/cal/"),
                (k % 50 + 2000).cast("string"),
                F.lit("/"),
                (k % 12 + 1).cast("string"),
            ),
        )
        .when(k % 4 == 2, F.concat(F.lit("/tag/"), (k % 30).cast("string")))
        .otherwise(
            F.concat(
                F.lit("/s/"),
                # reduce k first: k may exceed ~3.5e9 at very large SF,
                # and 3.5e9 * 2654435761 overflows int64 (Spark wraps,
                # DuckDB raises) — (k mod p) * A stays < 2^62 (ADVICE r4)
                ((k % 1000000007) * 2654435761 % 1000000007).cast("string")
            )
        )
    )
    urls = orders.select(
        F.format_string("shop%d.example.com", F.col("o_custkey") % 20).alias(
            "host"
        ),
        path.alias("path"),
    ).select(
        "host",
        "path",
        F.regexp_replace("path", "[0-9]+", "N").alias("template"),
    )
    prof = urls.groupBy("host", "template").agg(
        F.countDistinct("path").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    return prof.select(
        "host",
        "template",
        "n_urls",
        "n_hits",
        (F.col("n_urls") > TRAP_TEMPLATE_CAP).alias("over_cap"),
        F.greatest(
            F.lit(0).cast("long"), F.col("n_urls") - TRAP_TEMPLATE_CAP
        ).alias("excess_urls"),
    )


# --- DUST: irrelevant-query-parameter mining -----------------------------------
# "Different URLs with Similar Text" (Bar-Yossef, Keidar & Schonfeld,
# WWW 2007): a crawler that learns which query parameters never change
# page content can canonicalize them away BEFORE fetching — the
# highest-leverage dedup there is, since it prevents the fetch instead
# of deduping the payload. This is the parameter-deletion rule class:
# for a candidate parameter p, bucket URLs by everything EXCEPT p's
# value; a bucket where p varies but the content hash does not is
# supporting evidence, a bucket where content varies with p is a
# violation; the rule "drop p on host H" is valid iff it has support
# and zero violations.
#
# The URL corpus is synthesized from orders by a mixed-radix decode of
# o_orderkey (every (host, path, page, ref, session) combination
# materializes), with content a pure function of (host, path, page) —
# so "page" accumulates violations and "ref"/"session" only support.
# The operator itself starts from the URL STRING (regex parse is part
# of what the oracle verifies), not the synthesis columns.
#
# Scale shape: parse + explode are narrow maps; the first groupBy keys
# on (param, residual-URL) — bounded-length strings here; at 10^10
# URLs the key would be xxhash64(residual) with survivors re-checked,
# the boilerplate-strip discipline — and the per-bucket state is two
# exact distinct-counts over small ints. The second groupBy is
# (host, param): hosts × 3 rows. No window, no join anywhere.

DUST_PARAMS = ("page", "ref", "session")
DUST_P_PATH = 50  # mixed-radix widths of the synthetic URL space
DUST_P_PAGE = 3
DUST_P_REF = 4
DUST_P_SESSION = 5
DUST_P_HOST = 8


def dust_urls(orders: DataFrame) -> DataFrame:
    """(url, content_hash) rows: mixed-radix URL synthesis over
    o_orderkey; content depends on host/path/page only."""
    o = F.col("o_orderkey")
    p = o % DUST_P_PATH
    g = F.expr(f"o_orderkey div {DUST_P_PATH}") % DUST_P_PAGE
    r = F.expr(f"o_orderkey div {DUST_P_PATH * DUST_P_PAGE}") % DUST_P_REF
    s = (
        F.expr(f"o_orderkey div {DUST_P_PATH * DUST_P_PAGE * DUST_P_REF}")
        % DUST_P_SESSION
    )
    h = (
        F.expr(
            f"o_orderkey div "
            f"{DUST_P_PATH * DUST_P_PAGE * DUST_P_REF * DUST_P_SESSION}"
        )
        % DUST_P_HOST
    )
    return orders.select(
        F.format_string(
            "https://h%d.example.com/cat/%d?page=%d&ref=%d&session=%d",
            h, p, g, r, s,
        ).alias("url"),
        (((h + 1) * 1009 + p * 97 + g * 31) % 1000000007)
        .cast("long")
        .alias("content_hash"),
    )


def q_dust_param_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (host, param): DUST parameter-deletion rule mining —
    (host, param, n_groups, supports, violations, irrelevant) where a
    group is a set of URLs identical except for the param's value,
    support = group where the param varies but content does not,
    violation = group where content varies too, and irrelevant
    (the rule "this param never matters on this host") requires
    support ≥ 1 and violations = 0."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    urls = dust_urls(orders)
    host = F.regexp_extract("url", r"^https://([^/]+)/", 1)
    path = F.regexp_extract("url", r"^https://[^/]+(/[^?]*)", 1)
    vals = {
        p: F.regexp_extract("url", rf"[?&]{p}=([0-9]+)", 1)
        for p in DUST_PARAMS
    }
    parsed = urls.select(
        "content_hash",
        host.alias("host"),
        path.alias("path"),
        *[vals[p].alias(f"v_{p}") for p in DUST_PARAMS],
    )
    # one row per (candidate param, URL): residual = all parts except
    # the candidate's value, in a fixed name=value order
    variants = parsed.select(
        "content_hash",
        "host",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("param"),
                        F.concat_ws(
                            "&",
                            F.col("host"),
                            F.col("path"),
                            *[
                                F.concat(F.lit(f"{q}="), F.col(f"v_{q}"))
                                for q in DUST_PARAMS
                                if q != p
                            ],
                        ).alias("residual"),
                        F.col(f"v_{p}").alias("pval"),
                    )
                    for p in DUST_PARAMS
                ]
            )
        ).alias("x"),
    ).select(
        "content_hash",
        "host",
        F.col("x.param").alias("param"),
        F.col("x.residual").alias("residual"),
        F.col("x.pval").alias("pval"),
    )
    groups = variants.groupBy("host", "param", "residual").agg(
        F.countDistinct("pval").cast("long").alias("nv"),
        F.countDistinct("content_hash").cast("long").alias("nh"),
    )
    rules = groups.groupBy("host", "param").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(
            ((F.col("nv") >= 2) & (F.col("nh") == 1)).cast("long")
        ).alias("supports"),
        F.sum(
            ((F.col("nv") >= 2) & (F.col("nh") >= 2)).cast("long")
        ).alias("violations"),
    )
    return rules.select(
        "host",
        "param",
        "n_groups",
        "supports",
        "violations",
        ((F.col("supports") >= 1) & (F.col("violations") == 0)).alias(
            "irrelevant"
        ),
    )


# --- lexical URL spam scoring ------------------------------------------------
# Ma, Saul, Savage & Voelker, KDD 2009 ("Beyond blacklists: learning to
# detect malicious web sites from suspicious URLs"): spam/malicious
# URLs are separable from benign ones by LEXICAL features alone —
# length, digit density, hyphenated keyword stuffing, path depth,
# IP-literal hosts — so a crawler can gate them BEFORE spending a
# fetch, complementing the blocklist (exact rules) and DUST (parameter
# rules) passes with a statistical pre-fetch verdict.
#
# Scale shape: every feature is a JVM-side string expression over the
# URL column — a pure narrow map, ZERO shuffles at any corpus size
# (the same plan class as domain_split). The features are computed
# from the URL STRING, never from the synthesis class, so the score
# would transfer to real frontier URLs unchanged.
#
# Synthesis (five URL populations from ``orders``, keys replayed
# exactly by the oracle): clean product pages, hyphen-stuffed keyword
# spam, deep session paths, digit-heavy tracking paths, IP-literal
# hosts. Integer weights; is_spam at SPAMURL_THRESHOLD.

SPAMURL_W_HYPHEN = 5  # per hyphen in the URL
SPAMURL_W_DIGIT = 3  # per digit beyond the free allowance
SPAMURL_DIGIT_FREE = 6  # digits a benign URL may carry (ids, years)
SPAMURL_W_DEPTH = 10  # per path segment beyond the free depth
SPAMURL_DEPTH_FREE = 4
SPAMURL_W_IP = 40  # IP-literal host
SPAMURL_THRESHOLD = 30


def spamurl_synth(orders: DataFrame) -> DataFrame:
    """(url) — five deterministic URL populations keyed on o_orderkey
    (k mod 5 picks the class; every digit below 1e9 so no engine can
    overflow)."""
    k = F.col("o_orderkey")
    host = F.concat(
        F.lit("shop"), (k % 20).cast("string"), F.lit(".example.com")
    )
    ip_host = F.concat(
        F.lit("10."),
        (k % 250).cast("string"),
        F.lit("."),
        (k % 199).cast("string"),
        F.lit(".7"),
    )
    url = (
        F.when(
            k % 5 == 0,
            F.concat(host, F.lit("/p/"), (k % 100000).cast("string")),
        )
        .when(
            k % 5 == 1,
            F.concat(
                host,
                F.lit("/buy-cheap-best-deal-extra-now-"),
                (k % 1000).cast("string"),
            ),
        )
        .when(
            k % 5 == 2,
            F.concat(
                host,
                F.lit("/a/b/c/d/e/f/"),
                (k % 1000).cast("string"),
            ),
        )
        .when(
            k % 5 == 3,
            F.concat(
                host,
                F.lit("/x/"),
                ((k % 1000000007) * 2654435761 % 1000000007).cast("string"),
                (((k + 1) % 1000000007) * 2654435761 % 1000000007).cast(
                    "string"
                ),
                ((k * 7 + 3) % 1000000).cast("string"),
            ),
        )
        .otherwise(
            F.concat(ip_host, F.lit("/p/"), (k % 100000).cast("string"))
        )
    )
    return orders.select(F.col("o_orderkey").alias("url_key"), url.alias("url"))


def _count_char(col: Column, pattern: str) -> Column:
    """Occurrences of a single-char class via length difference —
    identical semantics in Spark and DuckDB regexp_replace."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, pattern, F.lit("")))
    ).cast("long")


def q_spam_url_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url_key, url, url_len, n_digits, n_hyphens, path_depth,
    host_is_ip, spam_score, is_spam) — the lexical pre-fetch spam
    verdict for every synthesized frontier URL; zero shuffles."""
    urls = spamurl_synth(load(spark, sf_dir, "orders"))
    host = F.substring_index(F.col("url"), "/", 1)
    n_digits = _count_char(F.col("url"), "[0-9]")
    n_hyphens = _count_char(F.col("url"), "-")
    path_depth = _count_char(F.col("url"), "/")
    host_is_ip = host.rlike("^[0-9.]+$")
    score = (
        n_hyphens * SPAMURL_W_HYPHEN
        + F.greatest(
            F.lit(0).cast("long"), n_digits - SPAMURL_DIGIT_FREE
        )
        * SPAMURL_W_DIGIT
        + F.greatest(
            F.lit(0).cast("long"), path_depth - SPAMURL_DEPTH_FREE
        )
        * SPAMURL_W_DEPTH
        + F.when(host_is_ip, F.lit(SPAMURL_W_IP)).otherwise(0).cast("long")
    ).cast("long")
    return urls.select(
        "url_key",
        "url",
        F.length("url").cast("long").alias("url_len"),
        n_digits.alias("n_digits"),
        n_hyphens.alias("n_hyphens"),
        path_depth.alias("path_depth"),
        host_is_ip.alias("host_is_ip"),
        score.alias("spam_score"),
        (score >= SPAMURL_THRESHOLD).alias("is_spam"),
    )
