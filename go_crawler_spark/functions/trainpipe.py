"""Crawl→train composition: the full "crawler output to training
shards" story in one oracle-paired operator (VERDICT r4 "Next round"
#7).

The engine's ``CrawlResult.pages`` frame (payload-verified image +
caption rows, engine.py _VERIFY_OUT) is what a multimodal training
pipeline ingests. ``crawl_to_train`` is the composed per-page decision
+ manifest over that frame:

    scrape   — pull structured fields out of the caption (the E-family
               extraction ladder applied to the crawl's own output;
               reference analog: the CSV scraper over fetched pages,
               /root/reference/internal/usecase/scraper.go)
    gates    — payload verification (decode/pixels/caption equality,
               E18), image curation (min-side + aspect, the
               DataComp-style keep rules), caption-length floor
    dedup    — exact caption dedup, first-writer (min url_hash) wins
               (D3's analog on the content axis: the same image
               re-fetched under different URLs collapses once)
    seq-pack — distributed prefix-sum packing manifest over the kept
               captions in url_hash order (textstats.q_seq_pack's
               two-phase shape, parameterized bucket width)

Scale shape: everything before the dedup window is a narrow map; the
dedup window shuffles once keyed on the 8-byte caption hash; the
packing stage is the bucketed prefix sum (the only single-task window
covers the bucket table, |keys|/pack_bucket rows). No collect, no
global row sort, no Python in the composed operator itself (the
registry entry's page SYNTHESIS uses one Arrow kernel to render the
deterministic corpus, exactly like image_filter_gate).

The packer's unit is caption length in code points — a deterministic
tokenizer stand-in both engines count identically; a production run
swaps in textstats' BPE counter without touching the plan shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_crawler_spark.crawl import codec
from go_crawler_spark.tables import load

TRAIN_N_DOCS = 400  # synthetic corpus: doc_id < 400
TRAIN_DUP_BASE = 320  # doc_id >= 320 re-crawl image (doc_id-320)*4 → dups
TRAIN_MIN_SIDE = 32  # image curation: smallest side floor (base dims 24..64)
TRAIN_AR_NUM = 3  # aspect ok iff 2*max_side <= 3*min_side
TRAIN_AR_DEN = 2
TRAIN_MIN_CAPTION = 30  # caption code-point floor
TRAIN_PACK_BUDGET = 512  # packer context-window budget (code points)
TRAIN_PACK_BUCKET = 100  # prefix-sum bucket width for the registry entry
# deterministic verify-flag residues for the synthetic corpus (the real
# pages frame carries the engine's actual decode/verify verdicts)
TRAIN_DECODE_MOD = 37
TRAIN_PIXELS_MOD = 23
TRAIN_CAPTION_MOD = 29
# caption scrape: the codec renders 月給{NN}万円〜 with ASCII digits
TRAIN_SALARY_RE = "月給([0-9]+)万円"


def train_image_id(doc_id: int) -> str:
    """Synthetic crawl image id: the tail TRAIN_DUP_BASE.. docs re-crawl
    an earlier image (exact-dup class); every 5th id is the @x4 upscale
    class (trips nothing here — big dims pass the curation gate — but
    keeps both codec size classes in the frame)."""
    eff = doc_id if doc_id < TRAIN_DUP_BASE else (doc_id - TRAIN_DUP_BASE) * 4
    return f"train-{eff}@x4" if eff % 5 == 0 else f"train-{eff}"


def crawl_to_train(
    pages: DataFrame, pack_bucket: int = TRAIN_PACK_BUCKET
) -> DataFrame:
    """Composed crawl→train manifest over a pages-shaped frame.

    ``pages`` needs (url_hash, w, h, caption, decode_ok, pixels_ok,
    caption_ok) — the engine's CrawlResult.pages satisfies this
    directly. Returns one row per page: scraped fields, each gate
    verdict, the composed ``keep``, and for kept rows the seq-pack
    span (start_off / pack_first / pack_last, −1 sentinels otherwise
    so every column stays exact-integer for the oracle hash).

    ``pack_bucket`` is the prefix-sum bucket width on the url_hash
    axis; pass a power of two near |keys|/10^4 for real (spread)
    hashes — integer `div` is monotone in the key even across the
    sign boundary, so bucket order composes with in-bucket order."""
    min_side = F.least("w", "h")
    max_side = F.greatest("w", "h")
    flags = pages.select(
        "url_hash",
        "w",
        "h",
        # scrape: structured salary field out of the caption ladder
        F.regexp_extract("caption", TRAIN_SALARY_RE, 1)
        .cast("long")
        .alias("salary_man"),
        F.length("caption").cast("long").alias("caption_len"),
        (
            F.col("decode_ok") & F.col("pixels_ok") & F.col("caption_ok")
        ).alias("verified"),
        (
            (min_side >= TRAIN_MIN_SIDE)
            & (max_side * TRAIN_AR_DEN <= min_side * TRAIN_AR_NUM)
        ).alias("image_ok"),
        (F.length("caption") >= TRAIN_MIN_CAPTION).alias("caption_len_ok"),
        F.xxhash64("caption").alias("cap_key"),
    )
    # exact caption dedup: one shuffle keyed on the 8-byte caption hash
    w_dup = Window.partitionBy("cap_key")
    gated = flags.withColumn(
        "dup_keeper", F.min("url_hash").over(w_dup) == F.col("url_hash")
    ).withColumn(
        "keep",
        F.col("verified")
        & F.col("image_ok")
        & F.col("caption_len_ok")
        & F.col("dup_keeper"),
    )
    # seq-pack the kept captions in url_hash order: bucketed prefix sum
    # (q_seq_pack's two-phase shape — the bucket table is the only
    # single-task window)
    kept = gated.filter("keep").select(
        "url_hash",
        "caption_len",
        F.expr(f"url_hash div {int(pack_bucket)}").alias("bucket"),
    )
    bsums = kept.groupBy("bucket").agg(
        F.sum("caption_len").alias("b_len")
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bsums.select(
        "bucket",
        F.coalesce(F.sum("b_len").over(w_b), F.lit(0)).alias("b_off"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("url_hash")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        kept.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_off",
            (
                F.col("b_off")
                + F.coalesce(F.sum("caption_len").over(w_in), F.lit(0))
            ).cast("long"),
        )
        .select(
            "url_hash",
            "start_off",
            F.expr(f"start_off div {TRAIN_PACK_BUDGET}").alias("pack_first"),
            F.expr(
                f"(start_off + greatest(caption_len, 1) - 1)"
                f" div {TRAIN_PACK_BUDGET}"
            ).alias("pack_last"),
        )
    )
    neg = F.lit(-1).cast("long")
    return gated.join(placed, "url_hash", "left").select(
        "url_hash",
        "salary_man",
        "caption_len",
        "verified",
        "image_ok",
        "caption_len_ok",
        "dup_keeper",
        "keep",
        F.coalesce(F.col("start_off"), neg).alias("start_off"),
        F.coalesce(F.col("pack_first"), neg).alias("pack_first"),
        F.coalesce(F.col("pack_last"), neg).alias("pack_last"),
    )


def train_pages_inputs() -> list[tuple[int, int, int, str]]:
    """Golden (url_hash, w, h, caption) rows for the oracle's VALUES
    table — rendered by the same pure-Python codec the Spark kernel
    calls, so the comparison checks the Spark plumbing end to end
    (the image_meta_extract / image_filter_gate discipline)."""
    rows = []
    for did in range(TRAIN_N_DOCS):
        iid = train_image_id(did)
        px = codec.truth_pixels(iid)
        rows.append((did, px.shape[1], px.shape[0], codec.truth_caption(iid)))
    return rows


def q_crawl_to_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: synthesize the deterministic crawl-pages frame
    (doc_id stands in for url_hash; verify flags are doc_id residues —
    the real frame's flags come from the engine's decode kernel) and
    run the composed crawl→train decision + packing manifest."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < TRAIN_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                iid = train_image_id(did)
                px = codec.truth_pixels(iid)
                rows.append(
                    {
                        "url_hash": did,
                        "w": int(px.shape[1]),
                        "h": int(px.shape[0]),
                        "caption": codec.truth_caption(iid),
                        "decode_ok": did % TRAIN_DECODE_MOD != 0,
                        "pixels_ok": did % TRAIN_PIXELS_MOD != 0,
                        "caption_ok": did % TRAIN_CAPTION_MOD != 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url_hash", "w", "h", "caption",
                    "decode_ok", "pixels_ok", "caption_ok",
                ],
            )

    pages = docs.mapInPandas(
        synth,
        schema=(
            "url_hash long, w int, h int, caption string,"
            " decode_ok boolean, pixels_ok boolean, caption_ok boolean"
        ),
    )
    return crawl_to_train(pages, pack_bucket=TRAIN_PACK_BUCKET)
