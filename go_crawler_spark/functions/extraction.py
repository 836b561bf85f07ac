"""Scraper extraction operators (SURVEY.md §2 E8-E10, E15-E16).

The reference's per-field Go parsers re-expressed as Catalyst Column
expressions — regexp ladders, when/otherwise chains, and one broadcast
dim join (prefectures). No Python in any of these paths.

Determinism upgrades (documented in SURVEY.md §1.4/§2):
- prefecture match: the reference iterates a Go map (nondeterministic
  when an input matches several prefectures, e.g. 東京都… contains the
  short name of 京都府) — we take the MIN prefecture code, a fixed
  deterministic superset.
- amount units: fixed 億>万>千 precedence (parsing.parse_amount_yen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_crawler_spark.functions.parsing import contains_ladder, parse_amount_yen
from go_crawler_spark.tables import load

# --- E8/E9: raise / bonus counters -----------------------------------------
# Exact pattern lists from /root/reference/internal/constants/scraper.go:12-27;
# first capture wins (job_posting_parser.go:185-206, 217-239), fallback:
# keyword presence → 1, else NULL.

RAISE_PATTERNS = (
    r"昇給[／/]年(\d+)回",
    r"昇給.*年(\d+)回",
    r"年(\d+)回.*昇給",
    r"昇給.*(\d+)回[／/]年",
    r"昇給.*(\d+)回.*年",
)

BONUS_PATTERNS = (
    r"賞与[／/]年(\d+)回",
    r"賞与.*年(\d+)回",
    r"年(\d+)回.*賞与",
    r"賞与.*(\d+)回[／/]年",
    r"賞与.*(\d+)回.*年",
    r"ボーナス[／/]年(\d+)回",
    r"ボーナス.*年(\d+)回",
)


def _pattern_counter(
    col: Column, patterns: tuple[str, ...], keywords: tuple[str, ...]
) -> Column:
    attempts = [
        F.nullif(F.regexp_extract(col, p, 1), F.lit("")).cast("long")
        for p in patterns
    ]
    fallback = None
    for kw in keywords:
        cond = col.contains(kw)
        fallback = cond if fallback is None else (fallback | cond)
    attempts.append(F.when(fallback, F.lit(1)).cast("long"))
    return F.coalesce(*attempts)


def parse_raise(col: Column) -> Column:
    return _pattern_counter(col, RAISE_PATTERNS, ("昇給",))


def parse_bonus(col: Column) -> Column:
    return _pattern_counter(col, BONUS_PATTERNS, ("賞与", "ボーナス"))


# --- E10: salary range with unit inheritance --------------------------------
# /root/reference/internal/infra/job_posting_parser.go:251-313 and
# constants/scraper.go:29-30. Range first; min inherits max's unit when
# missing (400~500万円 → 400万円~500万円); single fallback; both-fail →
# (0, NULL, 不明). A parse failure inside a matched branch returns the
# error triple immediately (no fall-through) — replicated with nested when.

SALARY_RANGE_RE = r"([\d.,]+(?:万|千|億)?円?)\s*[~～]\s*([\d.,]+(?:万|千|億)?円?)"
SALARY_SINGLE_RE = r"(\d+(?:\.\d+)?[万億千]?)"
_UNIT_RE = r"(万|千|億)"

SALARY_TYPE_LADDER = (  # parser.go:324-337 (年収/年給 both → 年給 enum value)
    ("年収", "年給"),
    ("年給", "年給"),
    ("月給", "月給"),
    ("日給", "日給"),
    ("時給", "時給"),
)


def salary_cols(col: Column) -> dict[str, Column]:
    """Returns {salary_min, salary_max, salary_unit} Columns."""
    min_str = F.regexp_extract(col, SALARY_RANGE_RE, 1)
    max_str = F.regexp_extract(col, SALARY_RANGE_RE, 2)
    min_unit = F.regexp_extract(min_str, _UNIT_RE, 1)
    max_unit = F.regexp_extract(max_str, _UNIT_RE, 1)
    min_eff = F.when(
        (min_unit == "") & (max_unit != ""), F.concat(min_str, max_unit)
    ).otherwise(min_str)
    amin = parse_amount_yen(min_eff)
    amax = parse_amount_yen(max_str)
    single = F.regexp_extract(col, SALARY_SINGLE_RE, 1)
    asingle = parse_amount_yen(single)

    has_range = min_str != ""
    range_ok = has_range & amin.isNotNull() & amax.isNotNull()
    single_ok = (single != "") & asingle.isNotNull()
    unit = contains_ladder(col, SALARY_TYPE_LADDER, default="不明")

    return {
        "salary_min": (
            F.when(has_range, F.when(range_ok, amin).otherwise(0))
            .when(single_ok, asingle)
            .otherwise(0)
            .cast("long")
        ),
        "salary_max": F.when(range_ok, amax).cast("long"),
        "salary_unit": F.when(
            range_ok | (~has_range & single_ok), unit
        ).otherwise("不明"),
    }


# --- E15: 18 benefits flags --------------------------------------------------
# Keyword set and field order from job_posting_parser.go:432-493.

BENEFIT_KEYWORDS = (
    ("social_insurance", "社会保険完備"),
    ("transport_allowance", "交通費支給"),
    ("housing_allowance", "住宅手当"),
    ("company_housing", "社宅・寮"),
    ("rent_subsidy", "家賃補助"),
    ("meal_allowance", "食事手当"),
    ("cafeteria_provided", "社員食堂"),
    ("training_support", "研修制度"),
    ("certification_support", "資格取得支援"),
    ("paid_leave", "有給休暇"),
    ("special_leave", "特別休暇"),
    ("flex_time", "フレックスタイム"),
    ("short_working_hours", "時短勤務"),
    ("childcare_support", "育児支援"),
    ("maternity_leave", "産前産後休暇"),
    ("parental_leave", "育児休暇"),
    ("elder_care_support", "介護支援"),
    ("retirement_plan", "退職金制度"),
)


def benefits_cols(col: Column) -> dict[str, Column]:
    return {name: col.contains(kw) for name, kw in BENEFIT_KEYWORDS}


# --- E16: location via broadcast prefecture dim ------------------------------
# 47-entry map from job_posting_parser.go:509-557; short name = full name
# minus a 都/府/県 suffix (parser.go:580-592); city regex from
# constants/scraper.go:31 with punctuation trim (parser.go:652-656).

PREFECTURES = (
    ("01", "北海道"), ("02", "青森県"), ("03", "岩手県"), ("04", "宮城県"),
    ("05", "秋田県"), ("06", "山形県"), ("07", "福島県"), ("08", "茨城県"),
    ("09", "栃木県"), ("10", "群馬県"), ("11", "埼玉県"), ("12", "千葉県"),
    ("13", "東京都"), ("14", "神奈川県"), ("15", "新潟県"), ("16", "富山県"),
    ("17", "石川県"), ("18", "福井県"), ("19", "山梨県"), ("20", "長野県"),
    ("21", "岐阜県"), ("22", "静岡県"), ("23", "愛知県"), ("24", "三重県"),
    ("25", "滋賀県"), ("26", "京都府"), ("27", "大阪府"), ("28", "兵庫県"),
    ("29", "奈良県"), ("30", "和歌山県"), ("31", "鳥取県"), ("32", "島根県"),
    ("33", "岡山県"), ("34", "広島県"), ("35", "山口県"), ("36", "徳島県"),
    ("37", "香川県"), ("38", "愛媛県"), ("39", "高知県"), ("40", "福岡県"),
    ("41", "佐賀県"), ("42", "長崎県"), ("43", "熊本県"), ("44", "大分県"),
    ("45", "宮崎県"), ("46", "鹿児島県"), ("47", "沖縄県"),
)

CITY_RE = r"(?:都|道|府|県)[\s ]*(\S+?[市区町村])"


def short_pref_name(name: str) -> str:
    return name[:-1] if name[-1] in "都府県" else name


def prefecture_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (code, name, short_pref_name(name)) for code, name in PREFECTURES
    ]
    return spark.createDataFrame(rows, "pref_code string, pref_name string, short_name string")


def with_location(df: DataFrame, raw: str, spark: SparkSession) -> DataFrame:
    """Adds pref_code / pref_name / city via a broadcast contains-join.

    The dim is 47 rows — always broadcast; the contains predicate makes
    this a broadcast nested-loop join, which Catalyst keeps map-side
    (no shuffle of the fact table). Ambiguity resolved by MIN code.
    """
    dim = F.broadcast(prefecture_dim(spark))
    cond = F.col(raw).contains(F.col("pref_name")) | F.col(raw).contains(
        F.col("short_name")
    )
    matched = (
        df.join(dim, cond, "left")
        .groupBy(*df.columns)
        .agg(F.min(F.struct("pref_code", "pref_name")).alias("pref"))
        .select(*df.columns, "pref.pref_code", "pref.pref_name")
    )
    city = F.regexp_extract(F.col(raw), CITY_RE, 1)
    city = F.regexp_replace(city, r"^[\p{P}\p{S}]+|[\p{P}\p{S}]+$", "")
    return matched.withColumn(
        "city", F.when(F.col("pref_code").isNotNull(), F.nullif(city, F.lit("")))
    )


# ---------------------------------------------------------------------------
# Driver-contract queries (oracle-paired; inputs synthesized
# deterministically from the test tables so DuckDB can replay them)
# ---------------------------------------------------------------------------


def q_salary_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey") % 6
    sz = F.col("p_size").cast("string")
    sz2 = (F.col("p_size") * 2).cast("string")
    raw = (
        F.when(k == 0, F.concat(F.lit("月給"), sz, F.lit("万円~"), sz2, F.lit("万円")))
        .when(k == 1, F.concat(F.lit("年収"), sz, F.lit("~"), sz2, F.lit("万円")))
        .when(k == 2, F.concat(F.lit("時給"), (F.col("p_size") * 13).cast("string"), F.lit("円")))
        .when(k == 3, F.concat(F.lit("日給 "), sz, F.lit("千円 ~ "), sz2, F.lit("千円")))
        .when(k == 4, F.lit(""))
        .otherwise(F.lit("応相談"))
    )
    df = part.select("p_partkey", raw.alias("salary_raw"))
    cols = salary_cols(F.col("salary_raw"))
    return df.select(
        "p_partkey",
        "salary_raw",
        cols["salary_min"].alias("salary_min"),
        cols["salary_max"].alias("salary_max"),
        cols["salary_unit"].alias("salary_unit"),
    )


def q_raise_bonus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey") % 6
    n = (F.col("p_size") % 4 + 1).cast("string")
    raw = (
        F.when(k == 0, F.concat(F.lit("昇給/年"), n, F.lit("回 賞与/年2回")))
        .when(k == 1, F.concat(F.lit("賞与 年"), n, F.lit("回支給")))
        .when(k == 2, F.concat(F.lit("年"), n, F.lit("回ほど賞与あり")))
        .when(k == 3, F.lit("昇給あり、ボーナスなし"))
        .when(k == 4, F.concat(F.lit("ボーナス/年"), n, F.lit("回")))
        .otherwise(F.lit("特になし"))
    )
    df = part.select("p_partkey", raw.alias("detail_raw"))
    return df.select(
        "p_partkey",
        "detail_raw",
        parse_raise(F.col("detail_raw")).alias("raise_count"),
        parse_bonus(F.col("detail_raw")).alias("bonus_count"),
    )


def q_benefits_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    pieces = [
        F.when(
            (F.col("p_partkey").bitwiseAND(F.lit(1 << (i % 7)))) != 0, F.lit(kw)
        )
        for i, (_, kw) in enumerate(BENEFIT_KEYWORDS)
    ]
    df = part.select(
        "p_partkey", F.concat_ws("、", *pieces).alias("benefits_raw")
    )
    flags = benefits_cols(F.col("benefits_raw"))
    return df.select(
        "p_partkey",
        "benefits_raw",
        *[c.alias(name) for name, c in flags.items()],
    )


def q_location_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    k = F.col("c_custkey") % 8
    raw = (
        F.when(k == 0, F.lit("東京都渋谷区1-2-3"))
        .when(k == 1, F.lit("大阪府大阪市北区梅田"))
        .when(k == 2, F.lit("北海道札幌市中央区"))
        .when(k == 3, F.lit("神奈川県横浜市西区みなとみらい"))
        .when(k == 4, F.lit("京都市下京区"))
        .when(k == 5, F.lit("愛知県名古屋市中村区"))
        .when(k == 6, F.lit("福岡県福岡市博多区"))
        .otherwise(F.lit("所在地未定"))
    )
    df = cust.select("c_custkey", raw.alias("loc_raw"))
    return with_location(df, "loc_raw", spark).select(
        "c_custkey", "loc_raw", "pref_code", "pref_name", "city"
    )
