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

from go_crawler_spark.scraper_config import FieldSpec, load_scraper_config
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


# Extraction config: field → regex over the page text, loaded from the
# validated YAML selector table (settings/scraper.yaml — A2/E17's config
# surface, mirroring internal/config/scraper_config.go:12-53). Loaded at
# import so a malformed default table fails eagerly; FIELD_PATTERNS stays
# as the pattern view for callers that only need the regexes.
FIELD_CONFIG = load_scraper_config()
FIELD_PATTERNS = {name: spec.pattern for name, spec in FIELD_CONFIG.items()}


def field_col(text: Column, spec: FieldSpec) -> Column:
    """E17 dispatch: one selector-table row → one Column expression.

    mode 'match' → first full match wins (ExtractText); 'group' →
    group-1 of the first match, empty → NULL (the regex: refinement);
    'attr' → comma-joined non-empty attr="…" values inside pattern
    matches (ExtractAttribute's empty-skip, html_document.go:84-98)."""
    if spec.mode == "match":
        return extract_first(text, spec.pattern)
    if spec.mode == "group":
        return F.nullif(F.regexp_extract(text, spec.pattern, 1), F.lit(""))
    attrs = F.filter(
        F.regexp_extract_all(
            text, F.lit(f'{spec.attr}="([^"]*)"'), 1
        ),
        lambda v: v != "",
    )
    return F.array_join(attrs, ",")


def _labeled(text: Column, key: str, config: dict | None = None) -> Column:
    """Group-1 of the first match of a labeled-segment pattern; NULL if
    the label is absent (ExtractText empty → nil field)."""
    return field_col(text, (config or FIELD_CONFIG)[key])


def job_posting_frame(
    pages: DataFrame,
    text_col: str,
    url_col: str,
    config: dict[str, FieldSpec] | None = None,
) -> DataFrame:
    """pages(text, url) → typed JobPosting columns (pre-flatten).

    One narrow projection: every field is a codegen'd expression over
    the normalized text; the only join is the broadcast prefecture dim
    (via with_location, called by the caller because it needs a
    SparkSession handle). ``config`` swaps the selector table (default:
    the validated settings/scraper.yaml), so a selector change is a
    config deployment, not a code change — the reference's model.
    """
    cfg = config or FIELD_CONFIG
    text = normalize_string_native(F.col(text_col))
    sal = salary_cols(text)
    flags = benefits_cols(text)
    df = pages.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("raw_text"),
        text.alias("text"),
        field_col(text, cfg["company"]).alias("company_m"),
        field_col(text, cfg["title"]).alias("title_m"),
        contains_ladder(text, JOB_TYPE_LADDER).alias("job_type"),
        sal["salary_min"].alias("salary_min"),
        sal["salary_max"].alias("salary_max"),
        sal["salary_unit"].alias("salary_unit"),
        F.date_format(
            parse_posted_at(field_col(text, cfg["posted_text"])),
            "yyyy-MM-dd",
        ).alias("posted_at"),
        parse_raise(text).alias("raise_count"),
        parse_bonus(text).alias("bonus_count"),
        contains_ladder(text, HOLIDAY_POLICY_LADDER).alias("holiday_policy"),
        contains_ladder(text, WORKPLACE_LADDER).alias("workplace"),
        parse_optional_uint(
            field_col(text, cfg["holidays_text"])
        ).alias("annual_holidays"),
        field_col(text, cfg["hours_text"]).alias("work_hours"),
        _labeled(text, "loc", cfg).alias("loc_raw"),
        _labeled(text, "hq_loc", cfg).alias("hq_loc_raw"),
        _labeled(text, "job_description", cfg).alias("job_description"),
        _labeled(text, "job_detail", cfg).alias("job_detail"),
        _labeled(text, "requirements", cfg).alias("requirements"),
        _labeled(text, "benefits", cfg).alias("benefits_raw"),
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


def synth_page_text(doc_id: Column) -> Column:
    """Deterministic job-posting page text per doc_id.

    Every field the 26-column projection extracts is present as a
    labeled or pattern-recognizable segment, with doc_id-keyed variety
    on each axis. The text uses ASCII digits/colons/tilde and ideographs
    only, so ``normalize_string_native`` is the identity on it — which
    is what lets the DuckDB oracle (oracles.JOB_POSTING_CSV) replay the
    exact pipeline on the raw rendered string."""
    d = doc_id
    loc = (
        F.when(d % 5 == 0, "東京都港区").when(d % 5 == 1, "大阪府堺市")
        .when(d % 5 == 2, "福岡県久留米市").when(d % 5 == 3, "北海道函館市")
        .otherwise(F.lit("愛知県豊田市"))
    )
    hq = (
        F.when(d % 7 == 0, "東京都千代田区丸の内")
        .when(d % 7 == 1, "奈良県奈良市")
        .when(d % 7 == 2, "大阪府吹田市")
        .when(d % 7 == 3, "沖縄県那覇市")
        .when(d % 7 == 4, "京都市伏見区")  # short-name-only match (E16 shadow)
        .when(d % 7 == 5, "広島県広島市中区")
        .otherwise(F.lit("海外(シンガポール)"))  # no prefecture → NULL loc
    )
    job_type = (
        F.when(d % 4 == 0, "正社員").when(d % 4 == 1, "契約社員")
        .when(d % 4 == 2, "アルバイト").otherwise(F.lit("業務委託"))
    )
    salary = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("月給"), (d % 30 + 18).cast("string"), F.lit("万円~"),
                     (d % 30 + 25).cast("string"), F.lit("万円")),
        )
        .when(
            d % 3 == 1,
            F.concat(F.lit("年収"), (d % 200 + 300).cast("string"), F.lit("万円~"),
                     (d % 200 + 400).cast("string"), F.lit("万円")),
        )
        .otherwise(
            F.concat(F.lit("時給"), ((d % 10 + 9) * 100).cast("string"), F.lit("円~"),
                     ((d % 10 + 12) * 100).cast("string"), F.lit("円")),
        )
    )
    benefits = F.concat(
        F.lit("社会保険完備、交通費支給"),
        F.when(d % 2 == 0, "、住宅手当").otherwise(F.lit("")),
        F.when(d % 4 == 0, "、退職金制度").otherwise(F.lit("")),
    )
    holiday = (
        F.when(d % 3 == 0, "完全週休二日制").when(d % 3 == 1, "週休二日制")
        .otherwise(F.lit("シフト制"))
    )
    workplace = (
        F.when(d % 4 == 0, "リモート").when(d % 4 == 1, "出社")
        .when(d % 4 == 2, "ハイブリッド").otherwise(F.lit("在宅"))
    )
    mm = F.format_string("%02d", d % 9 + 1)
    posted = (
        F.when(d % 3 == 0, F.concat(F.lit("2024年"), mm, F.lit("月15日")))
        .when(d % 3 == 1, F.concat(F.lit("2024/"), mm, F.lit("/15")))
        .otherwise(F.concat(F.lit("2024-"), mm, F.lit("-15")))
    )
    return F.concat(
        F.lit("【会社"), (d % 97).cast("string"), F.lit("】"),
        F.lit("求人タイトル"), d.cast("string"),
        F.lit(" 勤務地:"), loc,
        F.lit(" 本社:"), hq,
        F.lit(" "), job_type,
        F.lit(" "), salary,
        F.lit(" 昇給/年"), (d % 2 + 1).cast("string"),
        F.lit("回 賞与/年"), (d % 3 + 1).cast("string"), F.lit("回"),
        F.lit(" 福利厚生:"), benefits,
        F.lit(" 年間休日"), (d % 15 + 105).cast("string"), F.lit("日"),
        F.lit(" "), holiday,
        F.lit(" "), (d % 3 + 8).cast("string"), F.lit(":00~18:00"),
        F.lit(" "), workplace,
        F.lit(" "), posted,
        F.lit(" 仕事内容:Webサービスの開発運用"), d.cast("string"),
        F.lit(" 詳細:配属チームは"), (d % 20 + 3).cast("string"), F.lit("名規模"),
        F.lit(" 応募要件:開発経験"), (d % 5 + 1).cast("string"), F.lit("年以上"),
    )


def scrape_documents(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query (oracle-paired: oracles.JOB_POSTING_CSV):
    the full 26-column scraper pipeline over a synthesized job-posting
    page per documents row — all 26 columns computed, none constant.

    Two ``with_location`` passes (勤務地 + 本社) mirror the reference's
    two Location structs (internal/domain/model/job_posting.go:24-25,
    scraper.go:182-381); HQ runs first so the second pass's un-prefixed
    pref_code/pref_name/city columns are the 勤務地 ones."""
    from go_crawler_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        F.format_string("https://jobs.example.com/detail/%d", "doc_id").alias("url"),
        synth_page_text(F.col("doc_id")).alias("page_text"),
    )
    jp = job_posting_frame(pages, "page_text", "url")
    jp = with_location(jp, "hq_loc_raw", spark).withColumnsRenamed(
        {"pref_code": "hq_pref_code", "pref_name": "hq_pref_name", "city": "hq_city"}
    )
    jp = with_location(jp, "loc_raw", spark)
    return flatten_for_csv(jp)
