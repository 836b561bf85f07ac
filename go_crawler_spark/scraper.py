"""Scraper stage: the 26-column JobPosting projection + CSV sink.

Re-expresses /root/reference/internal/usecase/scraper.go:74-121 (worker
pool over HTML files → extractJobPosting → CSV) as ONE Spark projection:
the pool/channel machinery disappears into partition parallelism, the
per-field extraction dispatcher (scraper.go:395-411, E17) becomes a
config-driven map of field → Column-expression builder, and the CSV
exporter (internal/infra/csv_exporter.go:91-125, A14-16) becomes
``write.option("header", true).csv`` with the reference's exact 26
headers (internal/constants/scraper.go:36-44), null→"" rendering
(csv_exporter.go:32-37) and yyyy-MM-dd dates (csv_exporter.go:111).

First-match-wins selector semantics (scraper.go:189-191) map to
``element_at(regexp_extract_all(...), 1)`` — see ``extract_first``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_crawler_spark.functions.extraction import (
    BENEFIT_KEYWORDS,
    benefits_cols,
    parse_bonus,
    parse_raise,
    salary_cols,
    with_location,
)
from go_crawler_spark.functions.parsing import (
    HOLIDAY_POLICY_LADDER,
    JOB_TYPE_LADDER,
    WORKPLACE_LADDER,
    contains_ladder,
    normalize_string_native,
    parse_optional_uint,
    parse_posted_at,
)

# CSV header order — internal/constants/scraper.go:36-44 (verbatim)
CSV_HEADERS = (
    "会社名", "タイトル", "URL",
    "勤務地(都道府県コード)", "勤務地(都道府県)", "勤務地(市区町村)", "勤務地(原文)",
    "本社(都道府県コード)", "本社(都道府県)", "本社(市区町村)", "本社(原文)",
    "雇用形態", "給与(下限)", "給与(上限)", "給与(単位)", "投稿日",
    "職務内容", "昇給", "賞与", "業務内容詳細", "応募要件", "勤務形態",
    "年間休日", "休日・休暇", "勤務時間", "福利厚生(原文)",
)


def extract_first(col: Column, pattern: str) -> Column:
    """E1/E3 'first match wins': FindAllString → [0]
    (html_document.go:133-154 + scraper.go:189-191)."""
    return F.element_at(F.regexp_extract_all(col, F.lit(pattern), 0), 1)


# Extraction config: field → regex over the page text (the graft analog
# of settings/scraper.yaml's selector table; E17's dispatcher shape).
FIELD_PATTERNS = {
    "company": r"【([^】]+)】",
    "title": r"】([^\n 【]+)",
    "salary_text": r"(?:月給|年収|時給|日給)[^\s]*",
    "posted_text": r"\d{4}年\d{2}月\d{2}日|\d{4}/\d{2}/\d{2}|\d{4}-\d{2}-\d{2}",
    "holidays_text": r"年間休日\d+日",
    "hours_text": r"\d{1,2}:\d{2}\s*[~～]\s*\d{1,2}:\d{2}",
}


def job_posting_frame(pages: DataFrame, text_col: str, url_col: str) -> DataFrame:
    """pages(text, url) → typed JobPosting columns (pre-flatten).

    One narrow projection: every field is a codegen'd expression over
    the normalized text; the only join is the broadcast prefecture dim
    (via with_location, called by the caller because it needs a
    SparkSession handle).
    """
    text = normalize_string_native(F.col(text_col))
    sal = salary_cols(text)
    flags = benefits_cols(text)
    df = pages.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("raw_text"),
        text.alias("text"),
        extract_first(text, FIELD_PATTERNS["company"]).alias("company_m"),
        extract_first(text, FIELD_PATTERNS["title"]).alias("title_m"),
        contains_ladder(text, JOB_TYPE_LADDER).alias("job_type"),
        sal["salary_min"].alias("salary_min"),
        sal["salary_max"].alias("salary_max"),
        sal["salary_unit"].alias("salary_unit"),
        F.date_format(
            parse_posted_at(extract_first(text, FIELD_PATTERNS["posted_text"])),
            "yyyy-MM-dd",
        ).alias("posted_at"),
        parse_raise(text).alias("raise_count"),
        parse_bonus(text).alias("bonus_count"),
        contains_ladder(text, HOLIDAY_POLICY_LADDER).alias("holiday_policy"),
        contains_ladder(text, WORKPLACE_LADDER).alias("workplace"),
        parse_optional_uint(
            extract_first(text, FIELD_PATTERNS["holidays_text"])
        ).alias("annual_holidays"),
        extract_first(text, FIELD_PATTERNS["hours_text"]).alias("work_hours"),
        *[c.alias(name) for name, c in flags.items()],
    )
    # strip the 【】 capture leftovers: regexp_extract_all returns the
    # full match; pull the group via regexp_extract on the match
    return (
        df.withColumn(
            "company", F.regexp_extract("company_m", r"【([^】]+)】", 1)
        )
        .withColumn(
            "title",
            F.regexp_extract(F.coalesce("title_m", F.lit("")), r"】(.+)", 1),
        )
        .drop("company_m", "title_m")
    )


def flatten_for_csv(jp: DataFrame) -> DataFrame:
    """26-column flatten with the reference's rendering rules:
    nullable numbers → "" (csv_exporter.go:32-37 formatUint), dates
    already yyyy-MM-dd, booleans folded into the raw benefits string
    column (the reference emits only the raw string, csv_exporter.go:123)."""
    s = lambda c: F.coalesce(F.col(c).cast("string"), F.lit(""))  # noqa: E731
    return jp.select(
        s("company").alias("会社名"),
        s("title").alias("タイトル"),
        s("url").alias("URL"),
        s("pref_code").alias("勤務地(都道府県コード)"),
        s("pref_name").alias("勤務地(都道府県)"),
        s("city").alias("勤務地(市区町村)"),
        s("loc_raw").alias("勤務地(原文)"),
        s("hq_pref_code").alias("本社(都道府県コード)"),
        s("hq_pref_name").alias("本社(都道府県)"),
        s("hq_city").alias("本社(市区町村)"),
        s("hq_loc_raw").alias("本社(原文)"),
        s("job_type").alias("雇用形態"),
        s("salary_min").alias("給与(下限)"),
        s("salary_max").alias("給与(上限)"),
        s("salary_unit").alias("給与(単位)"),
        s("posted_at").alias("投稿日"),
        s("job_description").alias("職務内容"),
        s("raise_count").alias("昇給"),
        s("bonus_count").alias("賞与"),
        s("job_detail").alias("業務内容詳細"),
        s("requirements").alias("応募要件"),
        s("workplace").alias("勤務形態"),
        s("annual_holidays").alias("年間休日"),
        s("holiday_policy").alias("休日・休暇"),
        s("work_hours").alias("勤務時間"),
        s("benefits_raw").alias("福利厚生(原文)"),
    )


def write_csv(df26: DataFrame, path: str) -> None:
    """A14-A16: header row + rows; Spark writes partitioned shards (the
    reference's single-file exporter is a 1-partition special case —
    coalesce(1) if a single file is required)."""
    df26.write.mode("overwrite").option("header", True).csv(path)


def scrape_documents(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query (rows-only): full scraper pipeline over a
    synthesized job-posting page per documents row."""
    from go_crawler_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    k = F.col("doc_id") % 5
    loc = (
        F.when(k == 0, "東京都港区").when(k == 1, "大阪府堺市")
        .when(k == 2, "福岡県久留米市").when(k == 3, "北海道函館市")
        .otherwise("愛知県豊田市")
    )
    page_text = F.concat(
        F.lit("【会社"), (F.col("doc_id") % 97).cast("string"), F.lit("】"),
        F.lit("求人タイトル"), F.col("doc_id").cast("string"), F.lit(" "),
        loc, F.lit(" 正社員 月給"), (F.col("doc_id") % 30 + 18).cast("string"),
        F.lit("万円~"), (F.col("doc_id") % 30 + 25).cast("string"),
        F.lit("万円 昇給/年1回 賞与/年"), (F.col("doc_id") % 3 + 1).cast("string"),
        F.lit("回 社会保険完備、交通費支給 年間休日1"),
        (F.col("doc_id") % 10 + 10).cast("string"),
        F.lit("日 完全週休二日制 9:00~18:00 リモート 2024年0"),
        (F.col("doc_id") % 9 + 1).cast("string"), F.lit("月15日"),
    )
    pages = docs.select(
        F.format_string("https://jobs.example.com/detail/%d", "doc_id").alias("url"),
        page_text.alias("page_text"),
        loc.alias("loc_raw"),
    )
    jp = job_posting_frame(pages, "page_text", "url")
    jp = jp.join(pages.select("url", "loc_raw"), "url")
    jp = with_location(jp, "loc_raw", spark)
    # HQ fields: the reference extracts a second Location from another
    # selector; same op, absent in this page template → empty
    jp = (
        jp.withColumn("hq_pref_code", F.lit(None).cast("string"))
        .withColumn("hq_pref_name", F.lit(None).cast("string"))
        .withColumn("hq_city", F.lit(None).cast("string"))
        .withColumn("hq_loc_raw", F.lit(None).cast("string"))
        .withColumn("job_description", F.lit(None).cast("string"))
        .withColumn("job_detail", F.lit(None).cast("string"))
        .withColumn("requirements", F.lit(None).cast("string"))
        .withColumn(
            "benefits_raw",
            F.concat_ws(
                ";",
                *[
                    F.when(F.col(name), F.lit(kw))
                    for name, kw in BENEFIT_KEYWORDS
                ],
            ),
        )
    )
    return flatten_for_csv(jp)
