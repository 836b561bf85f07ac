"""Seeded synthetic web: the corpus the engine crawls (SURVEY.md §7 M0).

Topology models the reference's two-stage site structure — list pages
that paginate (by next-link or by total-count math,
/root/reference/internal/usecase/crawler.go:240-334, 346-401) linking
to detail pages that carry the graft's image+caption payload.

Everything is a pure function of (CorpusSpec, url): both the Spark
generator (distributed, mapInPandas over a page-index range — scales to
bench size without driver materialization) and the pure-Python
simulator read the SAME functions, so golden-trace disagreements can
only come from the engine, never the data.

Link mix deliberately exercises the URL kernel: absolute links,
relative ("/job/N"), dot-segment ("../job/N"), fragment-bearing
("...#desc"), and robots-disallowed ("/private/job/N") — mapping to
resolveURL semantics (crawler.go:162-179) plus the north rule's robots
filter. ~20% of detail links are duplicates (dup_frac) to make the
dedupe tier do real work.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from go_crawler_spark.crawl import codec
from go_crawler_spark.crawl.canonicalize import xxhash64_py
from go_crawler_spark.crawl.config import CorpusSpec

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), True),
        T.StructField("next_url", T.StringType(), True),
        T.StructField("total_count", T.IntegerType(), True),
        T.StructField("outlinks", T.ArrayType(T.StringType()), True),
        T.StructField("fetch_ok", T.BooleanType(), False),
        # payload (BASELINE.json input_hint)
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("allow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
    ]
)


def list_url(spec: CorpusSpec, i: int, lst: int, page: int) -> str:
    return f"https://{spec.host(i)}/list/{lst}?p={page}"


def detail_url(spec: CorpusSpec, i: int, detail_id: int) -> str:
    return f"https://{spec.host(i)}/job/{detail_id}"


def detail_id_at(spec: CorpusSpec, lst: int, page: int, j: int) -> int:
    raw = (lst * spec.pages_per_list + (page - 1)) * spec.details_per_page + j
    return raw % spec.details_per_host


def detail_href(spec: CorpusSpec, i: int, lst: int, page: int, j: int) -> str:
    """The href exactly as it appears in the page (pre-resolution)."""
    did = detail_id_at(spec, lst, page, j)
    host = spec.host(i)
    if did % 17 == 0:
        return f"https://{host}/private/job/{did}"  # robots-disallowed
    if j % 7 == 3:
        return f"https://{host}/job/{did}#desc"  # fragment → stripped
    if j % 5 == 2:
        return f"../job/{did}"  # dot-segment relative
    if j % 3 == 1:
        return f"/job/{did}"  # root-relative
    return f"https://{host}/job/{did}"


def seeds(spec: CorpusSpec) -> list[tuple[int, str]]:
    """Fixed seed list — page 1 of every (host, list) chain, in
    enumeration order (the crawl-trace's first component, F3)."""
    out = []
    idx = 0
    for i in range(spec.n_hosts):
        for lst in range(spec.lists_per_host):
            out.append((idx, list_url(spec, i, lst, 1)))
            idx += 1
    return out


def _list_page_row(spec: CorpusSpec, i: int, lst: int, page: int) -> dict:
    url = list_url(spec, i, lst, page)
    outlinks = [
        detail_href(spec, i, lst, page, j) for j in range(spec.details_per_page)
    ]
    strategy = spec.strategy(i)
    next_url = (
        list_url(spec, i, lst, page + 1)
        if strategy == "next_link" and page < spec.pages_per_list
        else None
    )
    total_count = (
        spec.pages_per_list * spec.details_per_page
        if strategy == "total_count" and page == 1
        else None
    )
    return {
        "url": url,
        "url_hash": xxhash64_py(url),
        "host": spec.host(i),
        "kind": "list",
        "page_no": page,
        "next_url": next_url,
        "total_count": total_count,
        "outlinks": outlinks,
        "fetch_ok": True,
        "image_id": None,
        "bytes": None,
        "w": None,
        "h": None,
        "fmt": None,
        "caption": None,
        "phash": None,
    }


def _detail_page_row(spec: CorpusSpec, i: int, did: int) -> dict:
    url = detail_url(spec, i, did)
    image_id = f"{spec.host(i)}-job-{did}"
    if spec.img_scale > 1:
        image_id += f"@x{spec.img_scale}"
    if spec.payloads:
        payload = codec.payload_for(image_id)
    else:  # frontier-shaped bench corpus: typed metadata, no bytes
        w, h = codec.truth_dims(image_id)
        payload = {
            "image_id": image_id,
            "bytes": None,
            "w": w,
            "h": h,
            "fmt": codec.truth_fmt(image_id),
            "caption": codec.truth_caption(image_id),
            "phash": None,
        }
    fetch_ok = (xxhash64_py(url) % 100 + 100) % 100 >= spec.fail_pct
    return {
        "url": url,
        "url_hash": xxhash64_py(url),
        "host": spec.host(i),
        "kind": "detail",
        "page_no": None,
        "next_url": None,
        "total_count": None,
        "outlinks": [],
        "fetch_ok": fetch_ok,
        **payload,
    }


def n_pages(spec: CorpusSpec) -> tuple[int, int]:
    """(list-page count, detail-page count)."""
    return (
        spec.n_hosts * spec.lists_per_host * spec.pages_per_list,
        spec.n_hosts * spec.details_per_host,
    )


def page_row_at(spec: CorpusSpec, k: int) -> dict:
    """Corpus row by dense index k — the distribution unit."""
    nl, _ = n_pages(spec)
    if k < nl:
        per_host = spec.lists_per_host * spec.pages_per_list
        i, rem = divmod(k, per_host)
        lst, page0 = divmod(rem, spec.pages_per_list)
        return _list_page_row(spec, i, lst, page0 + 1)
    k -= nl
    i, did = divmod(k, spec.details_per_host)
    return _detail_page_row(spec, i, did)


def iter_rows(spec: CorpusSpec) -> Iterator[dict]:
    nl, nd = n_pages(spec)
    for k in range(nl + nd):
        yield page_row_at(spec, k)


def robots_rows(
    spec: CorpusSpec,
    disallow: tuple[str, ...],
    allow: tuple[str, ...] = (),
) -> list[dict]:
    return [
        {
            "host": spec.host(i),
            "disallow": list(disallow),
            "allow": list(allow),
            "crawl_delay": spec.crawl_delay(i),
        }
        for i in range(spec.n_hosts)
    ]


def build_corpus(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Distributed corpus generation: spark.range over the page index,
    rows built per-partition in Arrow batches (no driver materialization
    — at bench scale this is the difference between seconds and OOM)."""
    nl, nd = n_pages(spec)
    total = nl + nd
    parts = min(32, max(2, total // 256))

    def gen(batches):
        import pandas as pd

        # int columns that may hold None: force pandas nullable-Int dtypes,
        # otherwise pandas silently upcasts to float64 and 64-bit hashes
        # (phash) lose their low bits in the Arrow round-trip
        int_cols = {"page_no": "Int32", "total_count": "Int32",
                    "w": "Int32", "h": "Int32", "phash": "Int64"}
        for pdf in batches:
            rows = [page_row_at(spec, int(k)) for k in pdf["id"]]
            # build column-wise from object Series: pd.DataFrame(rows)
            # would coerce int-with-None columns to float64 at
            # construction, before any astype could save the bits
            out = pd.DataFrame(
                {
                    f.name: pd.Series([r[f.name] for r in rows], dtype=object)
                    for f in CORPUS_SCHEMA.fields
                }
            )
            for c, dt in int_cols.items():
                out[c] = out[c].astype(dt)
            yield out

    return (
        spark.range(0, total, numPartitions=parts)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def build_robots(
    spark: SparkSession,
    spec: CorpusSpec,
    disallow: tuple[str, ...],
    allow: tuple[str, ...] = (),
) -> DataFrame:
    return spark.createDataFrame(
        robots_rows(spec, disallow, allow), schema=ROBOTS_SCHEMA
    )
