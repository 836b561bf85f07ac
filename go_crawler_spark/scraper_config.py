"""Validated YAML selector table for the scraper (A2's config surface +
E17's dispatcher table).

Mirrors /root/reference/internal/config/scraper_config.go:12-53 +
/root/reference/settings/scraper.yaml: the reference drives its per-field
extraction from a YAML table of SelectorConfig entries (selector +
optional attr / regex), validated eagerly at load
(scraper_config.go:59-76 — a bad config fails the run before any page is
touched). The graft's pages are text, so the selector analog is a regex
pattern with a per-field extraction ``mode``:

- ``match`` — first full match wins (the reference's ExtractText path,
  internal/infra/html_document.go:133-154 + scraper.go:189-191);
- ``group`` — group-1 of the first match, empty → NULL (the reference's
  ``regex:`` refinement, scraper_config.go:15 + scraper.go:189-203);
- ``attr``  — all ``attr="…"`` values inside pattern matches, empties
  skipped (ExtractAttribute, html_document.go:84-98).

The default table (``settings/scraper.yaml`` next to this module) encodes
the same field set ``scraper.job_posting_frame`` consumes; loading a
different file swaps the whole selector surface without code changes —
exactly the reference's deployment story.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

import yaml

MODES = ("match", "group", "attr")

# every field job_posting_frame consumes — validate:"required" analog:
# a table missing any of these fails eagerly, like the validator tags on
# ScraperConfig/DetailsConfig (scraper_config.go:24-53)
REQUIRED_FIELDS = (
    "company",
    "title",
    "salary_text",
    "posted_text",
    "holidays_text",
    "hours_text",
    "loc",
    "hq_loc",
    "job_description",
    "job_detail",
    "requirements",
    "benefits",
)

def _default_config_text() -> str:
    """The packaged default table, read zip-safely: under spark-submit
    --py-files the package is imported from a zip, where __file__ paths
    don't exist on the filesystem — importlib.resources handles both."""
    from importlib import resources

    return (
        resources.files("go_crawler_spark")
        .joinpath("settings/scraper.yaml")
        .read_text(encoding="utf-8")
    )


@dataclass(frozen=True)
class FieldSpec:
    """One selector-table row: pattern + extraction mode (+ attr name)."""

    pattern: str
    mode: str = "match"
    attr: str = ""

    def __post_init__(self) -> None:
        if not self.pattern:
            raise ValueError("pattern is required and must be non-empty")
        try:
            compiled = re.compile(self.pattern)
        except re.error as exc:
            raise ValueError(f"invalid regex {self.pattern!r}: {exc}") from exc
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {self.mode!r}")
        if self.mode == "group" and compiled.groups < 1:
            raise ValueError(
                f"mode 'group' requires a capture group in {self.pattern!r}"
            )
        if self.mode == "attr" and not self.attr:
            raise ValueError("mode 'attr' requires a non-empty attr name")
        if self.mode != "attr" and self.attr:
            raise ValueError("attr is only valid with mode 'attr'")


def load_scraper_config(path: str | Path | None = None) -> dict[str, FieldSpec]:
    """Load + eagerly validate the selector table; raises ValueError on
    any malformed entry, unknown key, or missing required field (the
    go-playground/validator behavior of LoadScraperConfig)."""
    if path is None:
        p: str | Path = "settings/scraper.yaml (packaged default)"
        text = _default_config_text()
    else:
        p = Path(path)
        text = p.read_text(encoding="utf-8")
    raw = yaml.safe_load(text)
    if not isinstance(raw, dict) or not isinstance(raw.get("fields"), dict):
        raise ValueError(f"{p}: expected a top-level 'fields' mapping")
    fields: dict[str, FieldSpec] = {}
    for name, entry in raw["fields"].items():
        if not isinstance(entry, dict):
            raise ValueError(f"{p}: field {name!r} must be a mapping")
        unknown = set(entry) - {"pattern", "mode", "attr"}
        if unknown:
            raise ValueError(f"{p}: field {name!r} has unknown keys {unknown}")
        try:
            fields[name] = FieldSpec(**entry)
        except (TypeError, ValueError) as exc:
            raise ValueError(f"{p}: field {name!r}: {exc}") from exc
    missing = [f for f in REQUIRED_FIELDS if f not in fields]
    if missing:
        raise ValueError(f"{p}: missing required fields {missing}")
    return fields
