"""Scraper config surface (A2/E17) + the physical CSV sink (A14-16).

The selector table is a validated YAML (scraper_config.py, mirroring
internal/config/scraper_config.go:59-76 — eager failure on a bad config)
and the CSV test exercises the ACTUAL written artifact: write → re-read
with header → equality with the in-memory 26-column frame, mirroring the
reference exporter's header-first + flush-on-close contract
(internal/infra/csv_exporter.go:59-135).
"""

import pytest
from pyspark.sql import functions as F

from go_crawler_spark.scraper import CSV_HEADERS, scrape_documents, write_csv
from go_crawler_spark.scraper_config import (
    REQUIRED_FIELDS,
    FieldSpec,
    load_scraper_config,
)


def test_default_config_loads_and_covers_required():
    cfg = load_scraper_config()
    assert set(REQUIRED_FIELDS) <= set(cfg)
    assert all(isinstance(s, FieldSpec) for s in cfg.values())


@pytest.mark.parametrize(
    "entry",
    [
        {"pattern": ""},  # empty pattern
        {"pattern": "(unclosed"},  # regex that doesn't compile
        {"pattern": "x", "mode": "css"},  # unknown mode
        {"pattern": "nogroup", "mode": "group"},  # group mode, no capture
        {"pattern": "x", "mode": "attr"},  # attr mode without attr name
        {"pattern": "x", "attr": "href"},  # attr name without attr mode
        {"pattern": "x", "selector": "h1"},  # unknown key
    ],
)
def test_bad_field_entry_raises_eagerly(tmp_path, entry):
    import yaml

    cfg = {f: {"pattern": "(a)", "mode": "group"} for f in REQUIRED_FIELDS}
    cfg["company"] = entry
    p = tmp_path / "scraper.yaml"
    p.write_text(yaml.safe_dump({"fields": cfg}, allow_unicode=True))
    with pytest.raises(ValueError):
        load_scraper_config(p)


def test_missing_required_field_raises(tmp_path):
    import yaml

    cfg = {f: {"pattern": "(a)", "mode": "group"} for f in REQUIRED_FIELDS[1:]}
    p = tmp_path / "scraper.yaml"
    p.write_text(yaml.safe_dump({"fields": cfg}, allow_unicode=True))
    with pytest.raises(ValueError, match="missing required"):
        load_scraper_config(p)


def test_config_driven_pipeline_matches_default(spark, sf_small):
    """job_posting_frame driven through an explicitly loaded config must
    equal the module-default path (same YAML → same plan)."""
    from go_crawler_spark.functions.extraction import with_location
    from go_crawler_spark.scraper import (
        flatten_for_csv,
        job_posting_frame,
        synth_page_text,
    )
    from go_crawler_spark.tables import load as load_table

    docs = load_table(spark, sf_small, "documents").limit(50)
    pages = docs.select(
        F.format_string("https://jobs.example.com/detail/%d", "doc_id").alias(
            "url"
        ),
        synth_page_text(F.col("doc_id")).alias("page_text"),
    )
    cfg = load_scraper_config()
    jp = job_posting_frame(pages, "page_text", "url", config=cfg)
    jp = with_location(jp, "hq_loc_raw", spark).withColumnsRenamed(
        {
            "pref_code": "hq_pref_code",
            "pref_name": "hq_pref_name",
            "city": "hq_city",
        }
    )
    jp = with_location(jp, "loc_raw", spark)
    via_config = flatten_for_csv(jp).collect()
    via_default = (
        scrape_documents(spark, sf_small)
        .filter(F.col("URL").isin([r["URL"] for r in via_config]))
        .collect()
    )
    assert sorted(via_config) == sorted(via_default)


def test_write_csv_roundtrip(spark, sf_small, tmp_path):
    """A14-16 end-to-end through the PHYSICAL sink: write_csv →
    spark.read.csv(header) → same header order and same rows as the
    in-memory frame. Spark's CSV reader maps an empty field back to
    NULL, so the read side is re-normalized with coalesce('') — the same
    null→"" rendering rule the exporter itself applies."""
    df26 = scrape_documents(spark, sf_small).limit(200).cache()
    out = str(tmp_path / "jobs_csv")
    write_csv(df26, out)

    back = spark.read.option("header", True).csv(out)
    assert tuple(back.columns) == CSV_HEADERS  # header row, exact order
    norm = back.select(
        *[F.coalesce(F.col(f"`{c}`"), F.lit("")).alias(c) for c in CSV_HEADERS]
    )
    assert sorted(map(tuple, norm.collect())) == sorted(
        map(tuple, df26.collect())
    )
    df26.unpersist()
