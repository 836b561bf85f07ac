"""Multimodal column operators: binary payloads + typed metadata.

The training-data contract (brief): image/audio/video travel as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over mapInPandas.

What's REAL here: the Spark-side plumbing (schemas, batch iteration,
partition behavior), the engine codec decode (crawl/codec.py), nearest-
neighbor resize, and average-hash features — all numpy. What's STUBBED:
decoders that need image/audio libs absent from this container (PIL /
libjpeg / ffmpeg) — each is import-gated and raises NotImplementedError
with the exact production signature, so swapping in the real library is
a one-function change (tests assert the stub contract).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_crawler_spark.crawl import codec
from go_crawler_spark.tables import load

try:  # pragma: no cover — not present in this container
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None

try:  # pragma: no cover
    import av as _pyav  # video frames
except ImportError:
    _pyav = None


def resize_nn(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (real, not stubbed)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def decode_external(payload: bytes, fmt: str) -> np.ndarray:
    """Decode a real-world image format via PIL.

    Production signature; stubbed here — the container has no image
    libs. The engine's own payload format decodes via codec.decode."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "PIL not available in this container; plug Image.open(BytesIO(payload))"
        )
    raise NotImplementedError  # pragma: no cover


def sample_frames(payload: bytes, every_n: int) -> list[np.ndarray]:
    """Sample every-Nth frame from a video payload via PyAV.

    Production signature; stubbed — no ffmpeg/av in this container."""
    if _pyav is None:
        raise NotImplementedError(
            "PyAV not available; plug av.open(BytesIO(payload)).decode(video=0)"
        )
    raise NotImplementedError  # pragma: no cover


_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_phash", T.LongType()),
    ]
)


def q_image_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary→metadata pipeline over synthesized image payloads:
    encode (deterministic from doc_id) → decode → phash → 16×16 thumb →
    thumb phash. Rows-only check (the codec is sha-seeded; no SQL
    oracle), but fully deterministic — same values every run.

    The two mapInPandas stages model the real shape: stage 1 is the
    "fetch" producing binary + typed metadata, stage 2 consumes binary
    without ever surfacing pixels to the JVM."""
    # deterministic subset (doc_id < 200), NOT limit(200): the golden
    # VALUES oracle (oracles.IMAGE_META_EXTRACT) pins these exact rows
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                p = codec.payload_for(f"doc-{int(did)}")
                rows.append(
                    {"doc_id": int(did), "bytes": p["bytes"], "fmt": p["fmt"]}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    payload = docs.mapInPandas(
        synth,
        schema="doc_id long, bytes binary, fmt string",
    )

    def extract(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px, fmt = codec.decode(row.bytes)
                thumb = resize_nn(px, 16, 16)
                out.append(
                    {
                        "doc_id": row.doc_id,
                        "n_bytes": len(row.bytes),
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "fmt": fmt,
                        "phash": codec.phash64(px),
                        "thumb_w": thumb.shape[1],
                        "thumb_h": thumb.shape[0],
                        "thumb_phash": codec.phash64(thumb),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in _META_SCHEMA.fields])

    return payload.mapInPandas(extract, schema=_META_SCHEMA)


# --- perceptual-hash near-duplicate detection -------------------------------
# The image analog of MinHash LSH: near-identical images (re-encodes,
# small crops/edits) land within a few bits of each other in the 64-bit
# average-hash, so banding the hash into 4 × 16-bit keys and equi-joining
# on (band_id, band_val) finds candidates without an all-pairs scan —
# one differing pair-bit can break at most one band, so pairs within
# Hamming distance 3 ALWAYS share a band (pigeonhole), and the planted
# variants here stay well under that. Exact Hamming rerank
# (bit_count(a XOR b), JVM-side) kills band collisions.

PHASH_N_DOCS = 300  # deterministic subset: doc_id < 300
PHASH_VARIANT_OFFSET = 100_000  # planted near-dup img_id = doc_id + offset
PHASH_MAX_HAMMING = 8
_PHASH_BANDS = 4  # 64-bit hash → 4 × 16-bit bands
# Hot-bucket guard, same hygiene as MinHash LSH (similarity.LSH_MAX_BUCKET):
# a constant-color image class floods one 16-bit band value and would emit
# O(n²) pairs; band rows in buckets larger than this are dropped (the drop
# is observable via phash_hot_buckets, and the golden oracle applies the
# identical cap).
PHASH_MAX_BUCKET = 512


def _phash_pixels(doc_id: int) -> np.ndarray:
    """Deterministic high-entropy 32×32 RGB image per doc (PCG64-seeded).

    The engine corpus's truth_pixels are deliberately blocky (codec
    invariants), which concentrates their phashes — unusable for a
    near-dup operator whose whole point is that unrelated images sit
    ~32 bits apart. Photo-like entropy puts unrelated pairs at
    Binomial(64, ½) Hamming distance, far above the threshold."""
    rng = np.random.Generator(np.random.PCG64(doc_id))
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


def _phash_rows(doc_ids) -> list[dict]:
    """Deterministic (img_id, phash) corpus: one base image per doc, plus
    a perturbed near-copy for doc_id % 10 == 7 (a small brightness patch
    — the re-encode/minor-edit class phash dedup exists to catch)."""
    rows = []
    for did in doc_ids:
        did = int(did)
        px = _phash_pixels(did)
        rows.append({"img_id": did, "phash": codec.phash64(px)})
        if did % 10 == 7:
            edited = px.copy()
            h, w = edited.shape[:2]
            patch = edited[: h // 8, : w // 8].astype(np.int16)
            edited[: h // 8, : w // 8] = np.clip(patch + 9, 0, 255).astype(
                np.uint8
            )
            rows.append(
                {
                    "img_id": did + PHASH_VARIANT_OFFSET,
                    "phash": codec.phash64(edited),
                }
            )
    return rows


def phash_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < PHASH_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = _phash_rows(pdf["doc_id"])
            yield pd.DataFrame(rows, columns=["img_id", "phash"])

    return docs.mapInPandas(synth, schema="img_id long, phash long")


def _phash_band_rows(corpus: DataFrame) -> DataFrame:
    """(img_id, phash) → one row per 16-bit band: (img_id, phash,
    band_id, band_val)."""
    return corpus.select(
        "img_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"b{b}")
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )


def phash_candidate_pairs(
    corpus: DataFrame, max_bucket: int = PHASH_MAX_BUCKET
) -> DataFrame:
    """Banded candidate pairs over an (img_id, phash) corpus with their
    exact Hamming distance, NO distance filter: banded equi-join, hot
    buckets dropped. The window count uses the same (band_id, band_val)
    hash-partitioning the self-join needs, so the Exchange is reused,
    not repeated (the _capped_bands pattern, similarity.py). Near-dup
    detection filters this to ≤ PHASH_MAX_HAMMING; decontamination
    scores every surviving candidate."""
    bands = _phash_band_rows(corpus)
    w = Window.partitionBy("band_id", "band_val")
    bands = (
        bands.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= F.lit(max_bucket))
        .drop("bucket_n")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("img_a"),
            F.col("b.img_id").alias("img_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
    )


def phash_neardup_pairs(
    corpus: DataFrame, max_bucket: int = PHASH_MAX_BUCKET
) -> DataFrame:
    """Near-dup pairs over an (img_id, phash) corpus: banded equi-join,
    hot buckets dropped, exact Hamming rerank."""
    return phash_candidate_pairs(corpus, max_bucket).filter(
        F.col("hamming") <= PHASH_MAX_HAMMING
    )


def phash_hot_buckets_for(
    corpus: DataFrame, max_bucket: int = PHASH_MAX_BUCKET
) -> DataFrame:
    """The band buckets the guard drops: (band_id, band_val, bucket_n)
    with bucket_n > max_bucket — pipelines log/count this alongside the
    pair query so the drop is observable, never silent."""
    bands = _phash_band_rows(corpus)
    return (
        bands.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > F.lit(max_bucket))
    )


def phash_hot_buckets(
    spark: SparkSession, sf_dir: str, max_bucket: int = PHASH_MAX_BUCKET
) -> DataFrame:
    return phash_hot_buckets_for(phash_corpus(spark, sf_dir), max_bucket)


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs via banded equi-join + Hamming
    rerank: (img_a, img_b, hamming) with hamming ≤ PHASH_MAX_HAMMING
    among pairs sharing ≥1 of 4 16-bit bands whose bucket is not
    degenerate (> PHASH_MAX_BUCKET members).

    Scale shape: band rows are (img_id, band_id, band_val int) — the
    join shuffles 4 tiny rows per image on exact band keys, never
    pixels, never all-pairs; the rerank is codegen'd bit_count(XOR).
    At 100 TB this is the same bucket-equi-join plan as MinHash LSH,
    with the same hot-bucket hygiene (a constant-color image class
    floods one band value; the cap bounds any bucket's pair output)."""
    return phash_neardup_pairs(phash_corpus(spark, sf_dir))


# --- video frame-sampling ---------------------------------------------------
# Video travels as one opaque binary cell per row; frame-sampling is the
# canonical training-data op (every-Nth frame → per-frame features).
# External containers (mp4/mkv) need ffmpeg, absent here — sample_frames
# above keeps that production signature stubbed. The REAL path below
# runs the same Spark plumbing on the project's own container format:
# VID1 | u16 n_frames | u16 fps | n_frames × [u32 len | codec payload].
# The kernel parses the container, decodes ONLY the sampled frames
# (seeks over the rest by length prefix — at 100 TB you skip ~2/3 of
# the decode work and all skipped bytes stay in the same cell, no
# shuffle), and emits integer-typed per-frame features.

VIDEO_N_DOCS = 60  # deterministic subset: doc_id < 60
VIDEO_SAMPLE_EVERY = 3
_VID_MAGIC = b"VID1"


def video_bytes(vid_id: int) -> bytes:
    """Deterministic video container for a doc: 8 + vid_id % 5 frames,
    each the codec payload of image id ``vid-{vid_id}-f{j}``."""
    n_frames = 8 + vid_id % 5
    fps = 10 + vid_id % 5
    parts = [_VID_MAGIC, struct.pack("<HH", n_frames, fps)]
    for j in range(n_frames):
        fb = codec.payload_for(f"vid-{vid_id}-f{j}")["bytes"]
        parts.append(struct.pack("<I", len(fb)))
        parts.append(fb)
    return b"".join(parts)


def sample_frames_project(payload: bytes, every_n: int):
    """Parse the project container; yield (n_frames, frame_idx, t_ms,
    pixels) for every-Nth frame, seeking past unsampled frames."""
    if payload[:4] != _VID_MAGIC:
        raise ValueError("bad video magic")
    n_frames, fps = struct.unpack("<HH", payload[4:8])
    off = 8
    for j in range(n_frames):
        (ln,) = struct.unpack("<I", payload[off : off + 4])
        off += 4
        if j % every_n == 0:
            px, _ = codec.decode(payload[off : off + ln])
            yield n_frames, j, j * 1000 // fps, px
        off += ln


_FRAME_SCHEMA = (
    "vid_id long, n_frames int, frame_idx int, t_ms long, "
    "w int, h int, phash long"
)


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video binary → sampled-frame features: one row per every-3rd
    frame with (t_ms, w, h, phash). Two mapInPandas stages like the
    image pipeline; pixels never surface to the JVM. Golden-VALUES
    oracle (oracles.VIDEO_FRAME_SAMPLE) pins every output value."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < VIDEO_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = [
                {"vid_id": int(did), "bytes": video_bytes(int(did))}
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["vid_id", "bytes"])

    payload = docs.mapInPandas(synth, schema="vid_id long, bytes binary")

    def sample(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for n_frames, j, t_ms, px in sample_frames_project(
                    row.bytes, VIDEO_SAMPLE_EVERY
                ):
                    out.append(
                        {
                            "vid_id": row.vid_id,
                            "n_frames": n_frames,
                            "frame_idx": j,
                            "t_ms": t_ms,
                            "w": px.shape[1],
                            "h": px.shape[0],
                            "phash": codec.phash64(px),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "vid_id", "n_frames", "frame_idx", "t_ms", "w", "h", "phash",
                ],
            )

    return payload.mapInPandas(sample, schema=_FRAME_SCHEMA)


def video_frame_golden() -> list[tuple]:
    """Pure-Python replay over the full subset — the rows the oracle pins."""
    out = []
    for vid in range(VIDEO_N_DOCS):
        for n_frames, j, t_ms, px in sample_frames_project(
            video_bytes(vid), VIDEO_SAMPLE_EVERY
        ):
            out.append(
                (vid, n_frames, j, t_ms, px.shape[1], px.shape[0],
                 codec.phash64(px))
            )
    return out


# --- audio feature extraction -----------------------------------------------
# Audio as an opaque PCM binary cell: AUD1 | u16 sample_rate | u32
# n_samples | int16-LE samples. Real-world codecs (mp3/ogg) would need
# ffmpeg (absent — stubbed above with sample_frames' sibling signature);
# the project container exercises the identical Spark plumbing. Features
# are ALL integer math (sum of squares instead of float RMS, peak,
# zero-crossings, duration in ms via integer division) so the golden
# oracle is exact with no fold-order care.

AUDIO_N_DOCS = 80  # deterministic subset: doc_id < 80
_AUD_MAGIC = b"AUD1"


def audio_bytes(aud_id: int) -> bytes:
    """Deterministic PCM clip: integer sawtooth + PCG64 dither, length
    and rate varying with the id (pure function, no side state)."""
    rate = (8 + aud_id % 3) * 1000  # 8/9/10 kHz
    n = 2000 + (aud_id * 37) % 1500
    period = 20 + aud_id % 30
    t = np.arange(n, dtype=np.int64)
    saw = ((t % period) * 2000 // period - 1000).astype(np.int64)
    rng = np.random.Generator(np.random.PCG64(aud_id + 7_000_000))
    dither = rng.integers(-50, 51, size=n, dtype=np.int64)
    samples = np.clip(saw + dither, -32768, 32767).astype("<i2")
    return (
        _AUD_MAGIC
        + struct.pack("<HI", rate, n)
        + samples.tobytes()
    )


def audio_features_of(payload: bytes) -> dict:
    """Integer features of one clip (vectorized numpy, no per-sample
    Python): duration_ms, sum of squares, peak |amplitude|,
    zero-crossing count."""
    if payload[:4] != _AUD_MAGIC:
        raise ValueError("bad audio magic")
    rate, n = struct.unpack("<HI", payload[4:10])
    s = np.frombuffer(payload, dtype="<i2", offset=10, count=n).astype(np.int64)
    signs = s >= 0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_ms": int(n) * 1000 // int(rate),
        "sum_sq": int(np.einsum("i,i->", s, s)),
        "peak": int(np.abs(s).max()),
        "zero_crossings": int(np.count_nonzero(signs[1:] != signs[:-1])),
    }


_AUDIO_SCHEMA = (
    "aud_id long, sample_rate int, n_samples int, duration_ms long, "
    "sum_sq long, peak int, zero_crossings int"
)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio binary → integer feature row per clip; two mapInPandas
    stages (synth payload, extract), samples never surface to the JVM."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < AUDIO_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = [
                {"aud_id": int(did), "bytes": audio_bytes(int(did))}
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["aud_id", "bytes"])

    payload = docs.mapInPandas(synth, schema="aud_id long, bytes binary")

    cols = [
        "aud_id", "sample_rate", "n_samples", "duration_ms",
        "sum_sq", "peak", "zero_crossings",
    ]

    def extract(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.append({"aud_id": row.aud_id, **audio_features_of(row.bytes)})
            yield pd.DataFrame(out, columns=cols)

    return payload.mapInPandas(extract, schema=_AUDIO_SCHEMA)


def audio_features_golden() -> list[tuple]:
    """Pure-Python replay over the full subset for the oracle."""
    out = []
    for aud in range(AUDIO_N_DOCS):
        f = audio_features_of(audio_bytes(aud))
        out.append(
            (aud, f["sample_rate"], f["n_samples"], f["duration_ms"],
             f["sum_sq"], f["peak"], f["zero_crossings"])
        )
    return out


def phash_neardup_golden(
    max_bucket: int = PHASH_MAX_BUCKET,
) -> list[tuple[int, int, int]]:
    """Pure-Python replay of the banded join + hot-bucket cap + rerank
    over the full PHASH_N_DOCS corpus — the golden rows the DuckDB
    oracle pins. Same kernel (codec.phash64), same band rule, same cap,
    brute-forced."""
    import collections

    rows = _phash_rows(range(PHASH_N_DOCS))
    bucket_n: collections.Counter = collections.Counter()
    for r in rows:
        h = r["phash"] & 0xFFFFFFFFFFFFFFFF
        for k in range(_PHASH_BANDS):
            bucket_n[(k, (h >> (16 * k)) & 0xFFFF)] += 1
    out = []
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            x, y = sorted((ra, rb), key=lambda r: r["img_id"])
            ha = x["phash"] & 0xFFFFFFFFFFFFFFFF
            hb = y["phash"] & 0xFFFFFFFFFFFFFFFF
            shares_band = any(
                (ha >> (16 * k)) & 0xFFFF == (hb >> (16 * k)) & 0xFFFF
                and bucket_n[(k, (ha >> (16 * k)) & 0xFFFF)] <= max_bucket
                for k in range(_PHASH_BANDS)
            )
            hamming = bin(ha ^ hb).count("1")
            if shares_band and hamming <= PHASH_MAX_HAMMING:
                out.append((x["img_id"], y["img_id"], hamming))
    return sorted(out)


# --- image eval-set decontamination ------------------------------------------
# The image twin of cleaning.q_fuzzy_decontaminate: vision benchmarks
# leak into web crawls as re-encoded/lightly-edited copies (the
# ImageNet-in-LAION class), which byte-exact dedup misses but phash
# catches. Train images whose perceptual hash sits within
# PHASH_MAX_HAMMING of ANY eval-split image are flagged, over the
# SAME capped band candidates as phash near-dup (identical kernel +
# hot-bucket hygiene, so the contamination gate can never drift from
# the dedup family), restricted to pairs that cross the split.
#
# Scale shape: candidates are the banded equi-join (4 int rows per
# image, never pixels); per train image the output keeps only the
# closest eval image (row_number window, bounded by the bucket cap).

IMGDECON_EVAL_MOD = 7  # img_id ≡ 0 (mod 7) → held-out benchmark image
IMGDECON_NO_MATCH = 64  # sentinel Hamming for "no eval candidate"


def q_image_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per train (non-eval) image: candidate eval images from the shared
    capped phash bands, the closest eval image by exact Hamming distance
    (ties to the lower eval_img), and the contamination verdict. Images
    with no eval candidate pin (0, -1, 64, false)."""
    corpus = phash_corpus(spark, sf_dir)
    is_eval = F.col("img_id") % IMGDECON_EVAL_MOD == 0
    cand = phash_candidate_pairs(corpus)
    a_eval = F.col("img_a") % IMGDECON_EVAL_MOD == 0
    b_eval = F.col("img_b") % IMGDECON_EVAL_MOD == 0
    cross = cand.filter(a_eval != b_eval).select(
        F.when(a_eval, F.col("img_b")).otherwise(F.col("img_a")).alias(
            "img_id"
        ),
        F.when(a_eval, F.col("img_a")).otherwise(F.col("img_b")).alias(
            "eval_img"
        ),
        "hamming",
    )
    w = Window.partitionBy("img_id").orderBy(
        F.asc("hamming"), F.asc("eval_img")
    )
    best = (
        cross.withColumn(
            "n_cand", F.count(F.lit(1)).over(Window.partitionBy("img_id"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("img_id", F.col("n_cand").cast("long"), "eval_img", "hamming")
    )
    return (
        corpus.filter(~is_eval)
        .select("img_id")
        .join(best, "img_id", "left")
        .select(
            "img_id",
            F.coalesce(F.col("n_cand"), F.lit(0).cast("long")).alias(
                "n_cand"
            ),
            F.coalesce(F.col("eval_img"), F.lit(-1).cast("long")).alias(
                "eval_img"
            ),
            F.coalesce(
                F.col("hamming").cast("int"),
                F.lit(IMGDECON_NO_MATCH).cast("int"),
            ).alias("hamming"),
            (
                F.coalesce(
                    F.col("hamming"), F.lit(IMGDECON_NO_MATCH)
                )
                <= PHASH_MAX_HAMMING
            ).alias("img_contaminated"),
        )
    )


def image_decontaminate_golden(
    max_bucket: int = PHASH_MAX_BUCKET,
) -> list[tuple[int, int, int, int, bool]]:
    """Pure-Python replay of the cross-split banded candidates +
    closest-eval selection over the full PHASH_N_DOCS corpus — the
    golden rows the DuckDB oracle pins. Same kernel (codec.phash64),
    same band rule, same cap, brute-forced."""
    import collections

    rows = _phash_rows(range(PHASH_N_DOCS))
    bucket_n: collections.Counter = collections.Counter()
    for r in rows:
        h = r["phash"] & 0xFFFFFFFFFFFFFFFF
        for k in range(_PHASH_BANDS):
            bucket_n[(k, (h >> (16 * k)) & 0xFFFF)] += 1
    per_train: dict[int, list[tuple[int, int]]] = {}
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            ea = ra["img_id"] % IMGDECON_EVAL_MOD == 0
            eb = rb["img_id"] % IMGDECON_EVAL_MOD == 0
            if ea == eb:
                continue
            ha = ra["phash"] & 0xFFFFFFFFFFFFFFFF
            hb = rb["phash"] & 0xFFFFFFFFFFFFFFFF
            shares_band = any(
                (ha >> (16 * k)) & 0xFFFF == (hb >> (16 * k)) & 0xFFFF
                and bucket_n[(k, (ha >> (16 * k)) & 0xFFFF)] <= max_bucket
                for k in range(_PHASH_BANDS)
            )
            if not shares_band:
                continue
            t, e = (rb, ra) if ea else (ra, rb)
            per_train.setdefault(t["img_id"], []).append(
                (bin(ha ^ hb).count("1"), e["img_id"])
            )
    out = []
    for r in rows:
        t = r["img_id"]
        if t % IMGDECON_EVAL_MOD == 0:
            continue
        ms = per_train.get(t, [])
        if ms:
            hm, ev = min(ms)
            out.append((t, len(ms), ev, hm, hm <= PHASH_MAX_HAMMING))
        else:
            out.append((t, 0, -1, IMGDECON_NO_MATCH, False))
    return sorted(out)


# --- image near-dup clustering ----------------------------------------------

def q_phash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-level dedup clustering: phash near-dup pairs → connected
    components (large-star/small-star contraction, shared with the text
    path) → canonical image per cluster. Deduping the image side of a
    100 TB crawl = filter is_canonical; the contraction never touches
    pixels, only (img_id, img_id) long pairs."""
    from go_crawler_spark.functions.similarity import cc_star_contraction

    pairs = q_phash_neardup(spark, sf_dir).select(
        F.col("img_a").alias("u"), F.col("img_b").alias("v")
    )
    star = cc_star_contraction(pairs)
    return (
        phash_corpus(spark, sf_dir)
        .select("img_id")
        .join(
            star.select(F.col("u").alias("img_id"), F.col("v").alias("comp")),
            "img_id",
            "left",
        )
        .select(
            "img_id",
            F.coalesce(F.col("comp"), F.col("img_id")).alias("component"),
        )
        .withColumn("is_canonical", F.col("component") == F.col("img_id"))
    )


# --- tile-hash partial-duplicate detection -----------------------------------
# Whole-image phash catches re-encodes and small edits (Hamming ≤ 8);
# it MISSES the partial-duplicate class — the same photo with a large
# overlay (logo, caption bar, watermark panel) flips far more than 8
# bits. Tiling the image into a 2×2 grid and hashing each quadrant
# independently localizes the edit: the overlay destroys one tile's
# hash and leaves the other three bit-identical, so an equi-join on
# (tile_id, tile_phash) with a ≥2-matching-tiles gate recovers the
# pair. Same scale shape as every sketch join here: 4 long-typed rows
# per image, bucket equi-join with a hot-bucket cap (a flat-color
# image class floods one tile hash), never pixels, never all-pairs.

TILE_N_DOCS = 300  # deterministic subset: doc_id < 300
TILE_VARIANT_OFFSET = 200_000  # planted partial-dup img_id = doc_id + offset
TILE_GRID = 2  # 2×2 quadrants
TILE_MIN_MATCH = 2  # pair iff ≥2 of 4 tiles hash-identical
TILE_MAX_BUCKET = 512  # same hot-bucket hygiene as PHASH_MAX_BUCKET


def tile_hashes(px: np.ndarray) -> list[tuple[int, int]]:
    """(tile_id, phash64(tile)) for the TILE_GRID×TILE_GRID grid."""
    h, w = px.shape[:2]
    out = []
    for r in range(TILE_GRID):
        for c in range(TILE_GRID):
            tile = px[
                r * h // TILE_GRID : (r + 1) * h // TILE_GRID,
                c * w // TILE_GRID : (c + 1) * w // TILE_GRID,
            ]
            out.append((r * TILE_GRID + c, codec.phash64(tile)))
    return out


def _tile_rows(doc_ids) -> list[dict]:
    """Deterministic (img_id, tile_id, tile_phash) corpus: one base
    image per doc, plus a large-overlay partial-dup for doc_id % 10 ==
    4 (top-left quadrant replaced by unrelated noise — the watermark/
    caption-panel class whole-image phash cannot catch)."""
    rows = []
    for did in doc_ids:
        did = int(did)
        px = _phash_pixels(did)
        for tid, th in tile_hashes(px):
            rows.append({"img_id": did, "tile_id": tid, "tile_phash": th})
        if did % 10 == 4:
            edited = px.copy()
            h, w = edited.shape[:2]
            rng = np.random.Generator(np.random.PCG64(did + 5_000_000))
            edited[: h // 2, : w // 2] = rng.integers(
                0, 256, size=(h // 2, w // 2, 3), dtype=np.uint8
            )
            for tid, th in tile_hashes(edited):
                rows.append(
                    {
                        "img_id": did + TILE_VARIANT_OFFSET,
                        "tile_id": tid,
                        "tile_phash": th,
                    }
                )
    return rows


def tile_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < TILE_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = _tile_rows(pdf["doc_id"])
            yield pd.DataFrame(
                rows, columns=["img_id", "tile_id", "tile_phash"]
            )

    return docs.mapInPandas(
        synth, schema="img_id long, tile_id int, tile_phash long"
    )


def tile_partial_dup_pairs(
    tiles: DataFrame, max_bucket: int = TILE_MAX_BUCKET
) -> DataFrame:
    """(img_a, img_b, n_tiles): pairs sharing ≥ TILE_MIN_MATCH
    bit-identical tiles, hot tile buckets dropped. The bucket-count
    window rides the same (tile_id, tile_phash) hash partitioning the
    self-join needs (the _capped_bands pattern), so the Exchange is
    reused."""
    w = Window.partitionBy("tile_id", "tile_phash")
    tiles = (
        tiles.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= F.lit(max_bucket))
        .drop("bucket_n")
    )
    a, b = tiles.alias("a"), tiles.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tile_id") == F.col("b.tile_id"))
            & (F.col("a.tile_phash") == F.col("b.tile_phash"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .groupBy(
            F.col("a.img_id").alias("img_a"), F.col("b.img_id").alias("img_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_tiles"))
        .filter(F.col("n_tiles") >= TILE_MIN_MATCH)
    )


def q_tile_partial_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-duplicate image pairs via quadrant-hash equi-join:
    (img_a, img_b, n_tiles) with n_tiles ≥ 2 of 4 quadrants identical.

    Catches the large-overlay class (logo/caption/watermark panels)
    that whole-image phash near-dup misses; at 100 TB this shuffles 4
    (long, int, long) rows per image on exact tile keys — the same
    bucket-equi-join plan as MinHash/phash LSH, same hot-bucket cap."""
    return tile_partial_dup_pairs(tile_corpus(spark, sf_dir))


def tile_partial_dup_golden(
    max_bucket: int = TILE_MAX_BUCKET,
) -> list[tuple[int, int, int]]:
    """Pure-Python replay of the capped tile join over the full
    TILE_N_DOCS corpus — the golden rows the DuckDB oracle pins."""
    import collections

    rows = _tile_rows(range(TILE_N_DOCS))
    by_img: dict[int, dict[int, int]] = collections.defaultdict(dict)
    bucket_n: collections.Counter = collections.Counter()
    for r in rows:
        by_img[r["img_id"]][r["tile_id"]] = r["tile_phash"]
        bucket_n[(r["tile_id"], r["tile_phash"])] += 1
    ids = sorted(by_img)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = sum(
                1
                for tid, th in by_img[a].items()
                if by_img[b].get(tid) == th
                and bucket_n[(tid, th)] <= max_bucket
            )
            if n >= TILE_MIN_MATCH:
                out.append((a, b, n))
    return sorted(out)


# --- content-defined-chunking storage dedup ----------------------------------
# A crawl store at 100 TB holds page payloads whose bytes massively
# overlap (shared HTML headers/footers/templates around unique bodies).
# Fixed-size blocks miss the overlap the moment one byte shifts;
# content-defined chunking (FastCDC-style gear hash) cuts at content-
# derived boundaries, so identical byte runs produce identical chunks
# at any offset, and a chunk-hash groupBy finds every duplicated run
# corpus-wide. Scale shape: the payload bytes stay inside the Arrow
# kernel (never shuffled); only (doc_id, chunk_hash, chunk_len) longs
# cross the wire, and the dedup is one hash-keyed aggregation + join.

CDC_N_DOCS = 200  # deterministic subset: doc_id < 200
CDC_MASK = (1 << 9) - 1  # boundary: gear & mask == mask → ~768 B average
CDC_MIN = 256  # never cut before this many bytes
CDC_MAX = 4096  # force a cut at this many bytes
_CDC_GEAR = np.random.Generator(np.random.PCG64(2026)).integers(
    0, 1 << 32, size=256, dtype=np.uint64
)
_CDC_HEADER_TEMPLATES = 10  # docs share one of 10 'site header' templates
_CDC_FOOTER_TEMPLATES = 7


def _cdc_template(seed: int, size: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()


def cdc_payload(doc_id: int) -> bytes:
    """Deterministic page payload: shared site header + unique body
    (the project codec's compressed image for this doc) + shared
    footer — the overlap structure real crawl payloads have."""
    tpl = doc_id % _CDC_HEADER_TEMPLATES
    header = _cdc_template(9_000_000 + tpl, 3072 + (tpl * 131) % 512)
    body = codec.payload_for(f"cdc-{doc_id}")["bytes"]
    ftpl = doc_id % _CDC_FOOTER_TEMPLATES
    footer = _cdc_template(9_500_000 + ftpl, 2048 + (ftpl * 97) % 512)
    return header + body + footer


def cdc_chunks(payload: bytes) -> list[tuple[int, int]]:
    """(chunk_hash, chunk_len) list via gear-hash content-defined
    chunking: cut where the rolling gear hash's low CDC_MASK bits are
    all ones, subject to [CDC_MIN, CDC_MAX] bounds. Chunk identity is
    an 8-byte blake2b of the chunk bytes (deterministic stdlib)."""
    import hashlib

    buf = np.frombuffer(payload, dtype=np.uint8)
    out = []
    start = 0
    h = 0
    i = 0
    n = len(buf)
    while i < n:
        h = ((h << 1) + int(_CDC_GEAR[buf[i]])) & 0xFFFFFFFF
        i += 1
        length = i - start
        if (length >= CDC_MIN and (h & CDC_MASK) == CDC_MASK) or length >= CDC_MAX:
            chunk = payload[start:i]
            digest = hashlib.blake2b(chunk, digest_size=8).digest()
            out.append(
                (int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF, length)
            )
            start = i
            h = 0
    if start < n:
        chunk = payload[start:]
        digest = hashlib.blake2b(chunk, digest_size=8).digest()
        out.append(
            (int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF, n - start)
        )
    return out


def cdc_chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash, chunk_len) — payload bytes are
    synthesized and chunked inside one Arrow kernel; only long-typed
    chunk identities leave it."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < CDC_N_DOCS
    )

    def chunker(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                for idx, (ch, ln) in enumerate(cdc_chunks(cdc_payload(did))):
                    out.append(
                        {
                            "doc_id": did,
                            "chunk_idx": idx,
                            "chunk_hash": ch,
                            "chunk_len": ln,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "chunk_idx", "chunk_hash", "chunk_len"]
            )

    return docs.mapInPandas(
        chunker,
        schema="doc_id long, chunk_idx int, chunk_hash long, chunk_len int",
    )


def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc storage-dedup accounting: (doc_id, n_chunks, total_bytes,
    dup_chunks, dup_bytes) where a chunk is dup iff its content hash
    occurs ≥2 times corpus-wide (the shared header/footer runs).

    Plan: chunk kernel → groupBy chunk_hash (pre-aggregated df, 8-byte
    keys only) → equi-join back → per-doc aggregate. At 100 TB the
    chunk-hash table is the dedup index a blob store maintains; bytes
    never cross an Exchange."""
    rows = cdc_chunk_rows(spark, sf_dir)
    df = rows.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    return (
        rows.join(df, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("total_bytes"),
            F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_chunks"),
            F.sum(F.when(F.col("occ") >= 2, F.col("chunk_len")).otherwise(0))
            .cast("long")
            .alias("dup_bytes"),
        )
    )


def cdc_chunk_dedup_golden() -> list[tuple[int, int, int, int, int]]:
    """Pure-Python replay over the full CDC_N_DOCS corpus — the per-doc
    rows the DuckDB oracle pins."""
    import collections

    per_doc = {d: cdc_chunks(cdc_payload(d)) for d in range(CDC_N_DOCS)}
    occ: collections.Counter = collections.Counter()
    for chunks in per_doc.values():
        for ch, _ in chunks:
            occ[ch] += 1
    out = []
    for d, chunks in sorted(per_doc.items()):
        n = len(chunks)
        total = sum(ln for _, ln in chunks)
        dup = [(ch, ln) for ch, ln in chunks if occ[ch] >= 2]
        out.append((d, n, total, len(dup), sum(ln for _, ln in dup)))
    return out


def phash_components_golden() -> list[tuple[int, int, bool]]:
    """Pure-Python union-find over the golden pair list — the rows the
    DuckDB oracle pins (one per corpus image)."""
    ids = sorted(r["img_id"] for r in _phash_rows(range(PHASH_N_DOCS)))
    parent = {i: i for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in phash_neardup_golden():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(i, find(i), find(i) == i) for i in ids]


# --- metadata-only image curation gate ---------------------------------------
# The image analog of the composed corpus-keep decision: DataComp/LAION-
# style filtering decides keep/drop from CHEAP metadata (dimensions,
# byte size, caption, hash entropy) long before any expensive model or
# even a full decode runs. Reference analog: the validity gate + field
# ladders of SURVEY.md §2 B9/E5 lifted to the image modality.
#
# Scale shape: stage 1 (the "fetch" kernel) is the only place binary
# payload exists — it emits a ~50-byte metadata row per image and the
# bytes die inside the Arrow batch, so at 100 TB the gate shuffles
# nothing but metadata. Every rule is then a JVM-side integer/length
# expression (whole-stage codegen, zero Python in the gate itself),
# which is what lets the DuckDB oracle RE-DERIVE the rules in SQL from
# the golden inputs instead of replaying a Python black box.
#
# Thresholds are calibrated so each rule rejects a real slice of the
# synthesized corpus (no vacuous flags — same discipline as the Gopher
# rule set in textstats.py): the @x4 upscaled class trips the byte
# ceiling, the base class trips min-side, templated captions spread
# across the length cut, and the popcount band clips the hash-entropy
# tails.

IMG_GATE_N_DOCS = 300  # doc_id < 300; 200..299 are @x4 upscales
IMG_GATE_MIN_SIDE = 32
IMG_GATE_AR_NUM = 3  # aspect ok iff 2*max_side <= 3*min_side (ratio <= 1.5)
IMG_GATE_AR_DEN = 2
IMG_GATE_MAX_BYTES = 100_000  # decode-bomb guard
IMG_GATE_MIN_CAPTION = 31  # unicode chars
IMG_GATE_POP_LO = 26  # phash popcount band: near-constant images sit
IMG_GATE_POP_HI = 38  # at the tails (all-0/all-1-ish hashes)


def image_gate_id(doc_id: int) -> str:
    return f"doc-{doc_id}" if doc_id < 200 else f"doc-{doc_id}@x4"


def image_gate_inputs() -> list[tuple[int, str, int, int, int, str, int]]:
    """Golden (doc_id, image_id, w, h, n_bytes, caption, phash) rows —
    the oracle's VALUES table; rule logic is NOT replayed here."""
    rows = []
    for did in range(IMG_GATE_N_DOCS):
        p = codec.payload_for(image_gate_id(did))
        rows.append(
            (did, p["image_id"], p["w"], p["h"], len(p["bytes"]),
             p["caption"], p["phash"])
        )
    return rows


def q_image_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only curation gate over synthesized image payloads:
    fetch-kernel emits metadata (bytes never leave the Arrow batch),
    then five JVM-side rules AND into the keep decision."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < IMG_GATE_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                p = codec.payload_for(image_gate_id(int(did)))
                rows.append(
                    {
                        "doc_id": int(did),
                        "w": p["w"],
                        "h": p["h"],
                        "n_bytes": len(p["bytes"]),
                        "caption": p["caption"],
                        "phash": p["phash"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "n_bytes", "caption", "phash"]
            )

    meta = docs.mapInPandas(
        synth,
        schema="doc_id long, w int, h int, n_bytes int, caption string, phash long",
    )
    min_side = F.least("w", "h")
    max_side = F.greatest("w", "h")
    flags = meta.select(
        "doc_id",
        "w",
        "h",
        "n_bytes",
        F.length("caption").cast("int").alias("caption_len"),
        F.bit_count("phash").cast("int").alias("phash_pop"),
        (min_side >= IMG_GATE_MIN_SIDE).alias("min_side_ok"),
        (max_side * IMG_GATE_AR_DEN <= min_side * IMG_GATE_AR_NUM).alias(
            "aspect_ok"
        ),
        (F.col("n_bytes") <= IMG_GATE_MAX_BYTES).alias("bytes_ok"),
        (F.length("caption") >= IMG_GATE_MIN_CAPTION).alias("caption_ok"),
        F.bit_count("phash").between(IMG_GATE_POP_LO, IMG_GATE_POP_HI).alias(
            "phash_entropy_ok"
        ),
    )
    return flags.withColumn(
        "keep",
        F.col("min_side_ok")
        & F.col("aspect_ok")
        & F.col("bytes_ok")
        & F.col("caption_ok")
        & F.col("phash_entropy_ok"),
    )


# --- JVM-only payload header sniff -------------------------------------------
# Parsing the 9-byte payload header (MAGIC ++ fmt ++ w:u16le ++ h:u16le)
# with BUILT-IN expressions — substring on binary, hex, conv — means a
# 100 TB metadata pass never crosses the JVM↔Python Arrow boundary at
# all: whole-stage codegen reads 9 bytes per row and the multi-GB
# payload column is never copied into a Python worker. (The synth
# stage below is a Python kernel only because the payload itself is
# synthesized; a real lake scans parquet directly into this parse.)
#
# Correctness is an encoder↔parser round-trip: Spark derives (fmt, w,
# h) FROM THE BYTES by expression, the oracle pins the codec's truth
# values per doc_id — if either the encoder or the JVM parse drifted a
# bit, the hash gate catches it.

SNIFF_N_DOCS = 200


def _u16le(col_bytes, pos: int):
    """Little-endian uint16 at 1-indexed byte offset pos, via built-ins."""
    lo = F.conv(F.hex(F.substring(col_bytes, pos, 1)), 16, 10).cast("long")
    hi = F.conv(F.hex(F.substring(col_bytes, pos + 1, 1)), 16, 10).cast("long")
    return lo + hi * 256


def q_payload_header_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, magic_ok, fmt, w, h, n_bytes) parsed from the binary
    payload column entirely with JVM expressions."""
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < SNIFF_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                p = codec.payload_for(f"doc-{int(did)}")
                rows.append({"doc_id": int(did), "bytes": p["bytes"]})
            yield pd.DataFrame(rows, columns=["doc_id", "bytes"])

    payload = docs.mapInPandas(synth, schema="doc_id long, bytes binary")
    b = F.col("bytes")
    return payload.select(
        "doc_id",
        (F.hex(F.substring(b, 1, 4)) == F.lit("47435349")).alias("magic_ok"),
        F.when(F.hex(F.substring(b, 5, 1)) == "00", "png")
        .otherwise("jpeg")
        .alias("fmt"),
        _u16le(b, 6).alias("w"),
        _u16le(b, 8).alias("h"),
        F.length(b).cast("long").alias("n_bytes"),
    )


def payload_sniff_golden() -> list[tuple[int, str, int, int, int]]:
    """Codec-truth (doc_id, fmt, w, h, n_bytes) — the oracle's VALUES;
    derived from the ENCODER side while Spark parses the bytes, so the
    comparison is a real round-trip."""
    out = []
    for did in range(SNIFF_N_DOCS):
        p = codec.payload_for(f"doc-{did}")
        out.append((did, p["fmt"], p["w"], p["h"], len(p["bytes"])))
    return out


# --------------------------------------------------------------------------
# Caption–image alignment gate (CLIP-score-shaped curation; the
# DataComp/LAION pipelines' second multimodal filter after the
# metadata gate in q_image_filter_gate: drop pairs whose caption does
# not agree with the image embedding). The caption side is embedded by
# deterministic feature hashing — token → (dim, ±1) via the shared
# polynomial hash — and the "CLIP score" is the inner product against
# a fixed-point integerization of the image embedding, so the whole
# gate is exact int64 arithmetic: no float SUM whose accumulation
# order could differ between engines, no cosine boundary.
# --------------------------------------------------------------------------

ALIGN_FIX = 4096  # power-of-two fixed-point scale: float·4096 floors exactly


def q_caption_align_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dot_fixed, cap_norm2, img_norm2, keep): keep ⇔ the
    hashed-caption / image-embedding inner product is non-negative
    (cosine sign == dot sign since norms are positive).

    Scale shape: tokens explode map-side and aggregate on (doc_id,
    dim) — bounded at 64 rows per doc after the partial agg — then one
    equi-join per doc to fetch the embedding (512 B payload) and a
    final (doc_id) agg. The embedding's fixed-point fold is an
    in-array fold (deterministic order); every cross-row SUM is
    integer, so shuffle order cannot perturb the result."""
    from go_crawler_spark.functions.similarity import ANN_DIM, poly_hash
    from go_crawler_spark.functions.textstats import _floordiv, tokens_col

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * ALIGN_FIX).cast("long"),
        ).alias("qfix"),
    )
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    h = poly_hash(F.col("tok"))
    sparse = (
        toks.select(
            "doc_id",
            (h % ANN_DIM).alias("dim"),
            F.when(
                _floordiv(h, F.lit(ANN_DIM).cast("long")) % 2 == 0, F.lit(1)
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("w"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    dotted = (
        sparse.join(emb, "doc_id")
        .select(
            "doc_id",
            (
                F.col("w")
                * F.element_at(F.col("qfix"), (F.col("dim") + 1).cast("int"))
            ).alias("contrib"),
            (F.col("w") * F.col("w")).alias("w2"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").cast("long").alias("dot_fixed"),
            F.sum("w2").cast("long").alias("cap_norm2"),
        )
    )
    norms = emb.select(
        "doc_id",
        F.aggregate(
            F.col("qfix"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ).alias("img_norm2"),
    )
    return (
        norms.join(dotted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dot_fixed"), F.lit(0).cast("long")).alias(
                "dot_fixed"
            ),
            F.coalesce(F.col("cap_norm2"), F.lit(0).cast("long")).alias(
                "cap_norm2"
            ),
            "img_norm2",
            (
                F.coalesce(F.col("dot_fixed"), F.lit(0).cast("long")) >= 0
            ).alias("keep"),
        )
    )


# --- reverse image search (multi-index hamming top-k) ------------------------
# Retrieval flip of q_phash_neardup: given Q query images, find each
# one's top-k nearest corpus images by phash Hamming distance. The
# multi-index hashing trick (Norouzi et al., CVPR 2012): split the
# 64-bit hash into 4 × 16-bit bands; any pair within Hamming radius 3
# shares at least one exact band (pigeonhole), so candidates come from
# 4 equi-joins on (band_id, band_val) — never a Q×N scan — and the
# exact bit_count(XOR) rerank runs only on candidates. Hot corpus
# buckets are capped exactly like the near-dup pass (a constant-color
# class would otherwise make every query pay O(bucket) rerank).

REVSEARCH_MOD = 25  # queries: perturbed copies of doc_id % 25 == 7 bases
# residue 7 ⇒ every other query's base ALSO has a planted near-dup
# variant (doc_id % 10 == 7), so ranks ≥ 2 are exercised, not just the
# trivial self-match
REVSEARCH_RES = 7
REVSEARCH_TOPK = 3
REVSEARCH_QUERY_OFFSET = 200_000  # query_id = doc_id + offset


def _revsearch_query_rows(doc_ids) -> list[dict]:
    """Deterministic (query_id, qhash) rows: the base image with a
    small brightness patch in the BOTTOM-RIGHT corner (disjoint from
    _phash_rows' top-left near-dup patch), so a query is a few bits
    from its base but not byte-identical to any corpus row."""
    rows = []
    for did in doc_ids:
        did = int(did)
        px = _phash_pixels(did).copy()
        h, w = px.shape[:2]
        patch = px[-(h // 8):, -(w // 8):].astype(np.int16)
        px[-(h // 8):, -(w // 8):] = np.clip(patch + 9, 0, 255).astype(
            np.uint8
        )
        rows.append(
            {"query_id": did + REVSEARCH_QUERY_OFFSET,
             "qhash": codec.phash64(px)}
        )
    return rows


def revsearch_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        (F.col("doc_id") < PHASH_N_DOCS)
        & (F.col("doc_id") % REVSEARCH_MOD == REVSEARCH_RES)
    )

    def synth(batches):
        for pdf in batches:
            rows = _revsearch_query_rows(pdf["doc_id"])
            yield pd.DataFrame(rows, columns=["query_id", "qhash"])

    return docs.mapInPandas(synth, schema="query_id long, qhash long")


def phash_reverse_topk(
    queries: DataFrame,
    corpus: DataFrame,
    topk: int = REVSEARCH_TOPK,
    max_bucket: int = PHASH_MAX_BUCKET,
) -> DataFrame:
    """(query_id, rank, img_id, hamming) top-k per query via banded
    candidate join + exact Hamming rerank. Corpus band rows in
    degenerate buckets are dropped (same cap + same reused Exchange as
    phash_neardup_pairs); query band rows are Q×4 and never capped."""
    from pyspark.sql import Window

    cb = _phash_band_rows(corpus)
    w = Window.partitionBy("band_id", "band_val")
    cb = (
        cb.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= F.lit(max_bucket))
        .drop("bucket_n")
    )
    qb = queries.select(
        "query_id",
        "qhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("qhash"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"b{b}")
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    cand = (
        qb.join(cb, ["band_id", "band_val"])
        .select("query_id", "qhash", "img_id", "phash")
        .distinct()
    )
    ranked = cand.select(
        "query_id",
        "img_id",
        F.bit_count(F.col("qhash").bitwiseXOR(F.col("phash"))).alias(
            "hamming"
        ),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy("hamming", "img_id")
        ),
    )
    return ranked.filter(F.col("rank") <= topk).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "img_id",
        "hamming",
    )


def q_phash_reverse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse image search: top-REVSEARCH_TOPK corpus images per query
    by phash Hamming distance, candidates from 4 × 16-bit band
    equi-joins (multi-index hashing), exact bit_count rerank.

    Scale shape: a query fans out to exactly 4 (band_id, band_val)
    probe rows; the join shuffles int keys only — pixels and payloads
    never move; the rerank and top-k window run on candidate rows
    (bounded by band collisions + the bucket cap), not on Q×N."""
    return phash_reverse_topk(
        revsearch_queries(spark, sf_dir), phash_corpus(spark, sf_dir)
    )


def phash_reverse_golden(
    topk: int = REVSEARCH_TOPK, max_bucket: int = PHASH_MAX_BUCKET
) -> list[tuple[int, int, int, int]]:
    """Pure-Python replay of the banded candidate rule + cap + rerank
    over the full corpus/query sets — the golden (query_id, rank,
    img_id, hamming) rows the DuckDB oracle pins."""
    import collections

    corpus = _phash_rows(range(PHASH_N_DOCS))
    queries = _revsearch_query_rows(
        d for d in range(PHASH_N_DOCS) if d % REVSEARCH_MOD == REVSEARCH_RES
    )
    bucket_n: collections.Counter = collections.Counter()
    for r in corpus:
        h = r["phash"] & 0xFFFFFFFFFFFFFFFF
        for k in range(_PHASH_BANDS):
            bucket_n[(k, (h >> (16 * k)) & 0xFFFF)] += 1
    out = []
    for q in queries:
        qh = q["qhash"] & 0xFFFFFFFFFFFFFFFF
        cands = []
        for r in corpus:
            ch = r["phash"] & 0xFFFFFFFFFFFFFFFF
            shares = any(
                (qh >> (16 * k)) & 0xFFFF == (ch >> (16 * k)) & 0xFFFF
                and bucket_n[(k, (ch >> (16 * k)) & 0xFFFF)] <= max_bucket
                for k in range(_PHASH_BANDS)
            )
            if shares:
                cands.append((bin(qh ^ ch).count("1"), r["img_id"]))
        for rank, (ham, img) in enumerate(sorted(cands)[:topk], start=1):
            out.append((q["query_id"], rank, img, ham))
    return sorted(out)


# --- aspect-ratio bucketing + batch packing -----------------------------------
# Image-training batch assembly (the aspect-bucket scheme popularized
# by NovelAI's SD training writeup and SDXL: group images into
# near-equal-area resolution buckets so a batch shares one shape, no
# mutilating square crop). Two stages, both exact-integer:
#
#   1. bucket argmin — each image picks the ladder bucket minimizing
#      |w/h − bw/bh|. Comparing the fractions exactly: the diff for
#      bucket b scales to a common denominator as
#      |w·bh − bw·h| · (ASPECT_LCM / bh), an int64 (< 2^41), so the
#      argmin is a map-side fold over a 9-literal array — ZERO
#      shuffle, no float ever, ties to the lower bucket_id.
#   2. batch numbering — within each bucket, images order by doc_id
#      and pack into ASPECT_BATCH-sized batches; the trailing partial
#      batch is flagged keep=false (a training loader drops or pads
#      it). Rank-within-bucket uses the same chunked two-phase prefix
#      sum as textstats.q_seq_pack: per-(bucket, chunk) counts, one
#      tiny single-task window over the chunk table, then windows
#      WITHIN chunks — bounded partitions at any corpus size (a naive
#      Window.partitionBy(bucket) would drag N/9 rows into one task).
#
# (w, h) are synthesized from doc_id by engine-agnostic integer math —
# the bucketing/packing arithmetic is the operator under test; real
# decode paths live in q_image_meta_extract / q_image_filter_gate.

# 64-aligned, ~0.5 MP ladder from 2:1 to 1:2
ASPECT_LADDER = [
    (1024, 512), (960, 576), (896, 640), (832, 704), (768, 768),
    (704, 832), (640, 896), (576, 960), (512, 1024),
]
# lcm of the ladder heights (64·lcm(8..16) = 64·720720)
ASPECT_LCM = 46_126_080
ASPECT_BATCH = 16  # images per training batch
ASPECT_CHUNK = 100  # doc_id range per prefix-sum chunk


def _aspect_wh():
    """Deterministic synthetic (w, h) per doc_id: 256..1280, step 8 —
    spans the ladder's AR range both ways. Pure integer expressions
    mirrored verbatim in the oracle."""
    w = (F.lit(256) + (F.col("doc_id") * 37 % 129) * 8).cast("long")
    h = (F.lit(256) + (F.col("doc_id") * 53 % 129) * 8).cast("long")
    return w, h


def aspect_bucket(w, h):
    """(bucket_id, bucket_w, bucket_h) struct: exact-integer argmin of
    |w/h − bw/bh| over ASPECT_LADDER, ties to the lower bucket_id.
    Map-side fold over literals — no shuffle, no floats."""
    ladder = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("bid"),
                F.lit(bw).cast("long").alias("bw"),
                F.lit(bh).cast("long").alias("bh"),
                # common-denominator multiplier, a compile-time literal
                F.lit(ASPECT_LCM // bh).cast("long").alias("m"),
            )
            for i, (bw, bh) in enumerate(ASPECT_LADDER)
        ]
    )

    def diff(e):
        return F.abs(w * e["bh"] - e["bw"] * h) * e["m"]

    init = F.struct(
        F.lit(2**62).cast("long").alias("d"),
        F.lit(-1).cast("long").alias("bid"),
        F.lit(0).cast("long").alias("bw"),
        F.lit(0).cast("long").alias("bh"),
    )
    # strict < keeps the first (lowest-bid) entry on ties — the ladder
    # array is in bid order, matching the oracle's ORDER BY d, bid
    return F.aggregate(
        ladder,
        init,
        lambda acc, e: F.when(
            diff(e) < acc["d"],
            F.struct(
                diff(e).alias("d"),
                e["bid"].alias("bid"),
                e["bw"].alias("bw"),
                e["bh"].alias("bh"),
            ),
        ).otherwise(acc),
    )


def q_aspect_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per image: synthetic (w, h), its aspect bucket, and its batch
    placement — (doc_id, w, h, bucket_id, bucket_w, bucket_h,
    batch_idx, slot, keep); keep=false marks the trailing partial
    batch of each bucket."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    w_c, h_c = _aspect_wh()
    t = docs.select(
        "doc_id",
        w_c.alias("w"),
        h_c.alias("h"),
        aspect_bucket(w_c, h_c).alias("b"),
    ).select(
        "doc_id",
        "w",
        "h",
        F.col("b.bid").alias("bucket_id"),
        F.col("b.bw").alias("bucket_w"),
        F.col("b.bh").alias("bucket_h"),
        F.expr(f"doc_id div {ASPECT_CHUNK}").alias("chunk"),
    )
    cell = t.groupBy("bucket_id", "chunk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_chunk = (
        Window.partitionBy("bucket_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = cell.select(
        "bucket_id",
        "chunk",
        F.coalesce(F.sum("cnt").over(w_chunk), F.lit(0))
        .cast("long")
        .alias("c_off"),
    )
    totals = t.groupBy("bucket_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bucket")
    )
    w_in = Window.partitionBy("bucket_id", "chunk").orderBy("doc_id")
    placed = (
        t.join(F.broadcast(offsets), ["bucket_id", "chunk"])
        .join(F.broadcast(totals), "bucket_id")
        .withColumn(
            "rn",
            (F.col("c_off") + F.row_number().over(w_in)).cast("long"),
        )
    )
    return placed.select(
        "doc_id",
        "w",
        "h",
        "bucket_id",
        "bucket_w",
        "bucket_h",
        F.expr(f"(rn - 1) div {ASPECT_BATCH}").alias("batch_idx"),
        ((F.col("rn") - 1) % ASPECT_BATCH).cast("long").alias("slot"),
        (
            F.col("rn")
            <= F.expr(f"n_bucket div {ASPECT_BATCH}") * ASPECT_BATCH
        ).alias("keep"),
    )


# --- best-copy keeper selection -----------------------------------------------
# The retrieval half of image dedup: q_phash_components picks the
# cluster's canonical as the MIN img_id — an arbitrary but stable
# choice. A curation pipeline wants the BEST copy instead: among
# near-identical images, keep the highest-resolution one (LAION-5B
# and DataComp both dedupe toward the largest variant — re-encodes
# and thumbnails drop, the original survives). The rule is pure
# metadata: argmax by pixel count, img_id ascending as the
# deterministic tie-break, one row_number window per component —
# never a pixel comparison, and the window's partition is a dup
# cluster (bounded by the upstream hot-bucket cap), not the corpus.
#
# Resolution synthesis (the phash corpus is dimensionless): scale
# class = 1 + img_id % BESTCOPY_SCALE_MOD, dims = 32·scale. The
# planted variant (img_id = base + 100000, and 100000 ≡ 1 mod 3)
# always lands in a DIFFERENT scale class than its base, so every
# planted dup pair exercises the rule — sometimes the edited copy is
# the bigger one and wins over the min-id canonical.

BESTCOPY_SCALE_MOD = 3  # scale classes 1..3 → 32/64/96 px squares
BESTCOPY_BASE_PX = 32


def q_dedup_best_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(img_id, component, width, height, n_pixels, keep) — keep marks
    the highest-resolution member of each phash dup cluster (ties to
    the lower img_id); singleton components keep themselves."""
    comp = q_phash_components(spark, sf_dir).select("img_id", "component")
    scale = (F.lit(1) + F.col("img_id") % BESTCOPY_SCALE_MOD).cast("long")
    dims = comp.select(
        "img_id",
        "component",
        (F.lit(BESTCOPY_BASE_PX) * scale).alias("width"),
        (F.lit(BESTCOPY_BASE_PX) * scale).alias("height"),
        (F.lit(BESTCOPY_BASE_PX) * scale * BESTCOPY_BASE_PX * scale).alias(
            "n_pixels"
        ),
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_pixels"), F.asc("img_id")
    )
    return dims.select(
        "img_id",
        "component",
        "width",
        "height",
        "n_pixels",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# --- dihedral-invariant perceptual hash ---------------------------------------
# Mirrored and rotated re-posts (the watermark-evading flip class) sit
# ~32 bits from their original under plain phash — invisible to every
# Hamming-threshold dedup above. The dihedral-canonical hash closes
# that hole: min over the 8 symmetries of the square (4 rotations × 2
# flips), so an image and any flipped/rotated copy share one exact
# 64-bit signature and dedup becomes a hash groupBy again.
#
# The 100 TB trick is WHERE the 8 variants come from. The hash is an
# 8×8 block grid, and a dihedral transform of the pixels permutes
# those 64 blocks exactly (32 divides into 8 uniform 4-px blocks; the
# grid total is symmetry-invariant) — so the kernel computes ONE hash
# from pixels and derives the other 7 by permuting its 64 bits: pure
# integer ops on an 8-byte value, ~500× cheaper than re-hashing pixels
# 8 times, and the canonical hash costs the same map-side pass as the
# plain one. The permutation algebra demands integer-exact block
# comparisons: codec.phash64's float block means re-round when a flip
# reorders the summation (measured: 1-in-330 boundary bit flips), so
# this op hashes with phash64_int — the same 8×8 average-hash decided
# by 64·block_sum > grid_sum over exact int64s, permutation-invariant
# by construction. The golden oracle deliberately takes the other road
# (transform the PIXELS 8 times, re-hash each through phash64_int),
# so the bit-permutation algebra is verified against the pixel-space
# ground truth rather than against itself.
#
# Reference analog: none — the reference crawler (nrad-K/go-crawler)
# stores page bodies opaquely; image-level dedup is this repo's
# training-pipeline extension (same family as q_phash_neardup).

DIH_VARIANT_OFFSET = 300_000  # planted transformed copy: doc_id + offset
DIH_PLANT_MOD = 10  # doc_id % 10 == 3 → a dihedral copy exists
_DIH_SHIFTS = np.uint64(63) - np.arange(64, dtype=np.uint64)


def phash64_int(px: np.ndarray) -> int:
    """Integer-exact 8×8 average-hash: bit b = (64·block_sum_b >
    grid_sum) over exact int64 channel sums — the same hash family as
    codec.phash64 but with no float anywhere, so block values permute
    EXACTLY under dihedral transforms (codec's float means re-round
    when a flip reorders the block summation). Requires dimensions
    divisible by 8 (the 32×32 corpus)."""
    s = px.astype(np.int64).sum(axis=2)
    h, w = s.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    blocks = s.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    total = int(blocks.sum())
    val = 0
    for bit in blocks.flatten() * 64 > total:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


def dihedral_transform(px: np.ndarray, k: int) -> np.ndarray:
    """Element k of the dihedral group D4 on a square image: optional
    horizontal flip (k >= 4), then k % 4 CCW quarter-rotations."""
    if k >= 4:
        px = px[:, ::-1]
    return np.rot90(px, k % 4)


def _dih_perms() -> np.ndarray:
    """(8, 64) bit-index permutations: variant k's flattened block j is
    the plain hash's block _DIH_PERMS[k][j]. Built by applying the SAME
    numpy transforms to an 8×8 index grid that dihedral_transform
    applies to pixels, so the permutation is correct by construction."""
    idx = np.arange(64).reshape(8, 8)
    return np.stack(
        [dihedral_transform(idx, k).flatten() for k in range(8)]
    )


_DIH_PERMS = _dih_perms()


def dihedral_min_hash(phash: int) -> int:
    """Canonical (min-over-D4) hash from ONE plain phash via bit
    permutation — no pixels touched. Unsigned min; signed int64 out."""
    h = np.uint64(phash & 0xFFFFFFFFFFFFFFFF)
    bits = (h >> _DIH_SHIFTS) & np.uint64(1)  # bits[i] = block i (row-major)
    weights = np.uint64(1) << _DIH_SHIFTS
    variants = (bits[_DIH_PERMS] * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    canon = int(variants.min())
    return canon - (1 << 64) if canon >= (1 << 63) else canon


def _dih_rows(doc_ids) -> list[dict]:
    """Deterministic corpus: one base image per doc plus, for doc_id %
    DIH_PLANT_MOD == 3, a flipped/rotated copy (non-identity element
    1 + doc_id % 7 — all seven symmetries exercised across the corpus).
    Each row carries the plain phash (from pixels, via the
    integer-exact kernel) and the bit-permutation canonical hash."""
    rows = []
    for did in doc_ids:
        did = int(did)
        px = _phash_pixels(did)
        for img_id, pixels in (
            (did, px),
            *(
                ((did + DIH_VARIANT_OFFSET,
                  dihedral_transform(px, 1 + did % 7)),)
                if did % DIH_PLANT_MOD == 3
                else ()
            ),
        ):
            ph = phash64_int(np.ascontiguousarray(pixels))
            rows.append(
                {
                    "img_id": img_id,
                    "phash": ph,
                    "dihedral_phash": dihedral_min_hash(ph),
                }
            )
    return rows


def dihedral_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < PHASH_N_DOCS
    )

    def synth(batches):
        for pdf in batches:
            rows = _dih_rows(pdf["doc_id"])
            yield pd.DataFrame(
                rows, columns=["img_id", "phash", "dihedral_phash"]
            )

    return docs.mapInPandas(
        synth, schema="img_id long, phash long, dihedral_phash long"
    )


def q_phash_dihedral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flip/rotation-invariant exact dedup groups: (img_id, phash,
    dihedral_phash, canon_img, group_size) — images sharing a
    dihedral-canonical hash group together (canon_img = min img_id),
    catching the mirrored-re-post class plain phash Hamming misses.

    Scale shape: pixels decode map-side and emit two longs; grouping is
    one groupBy + join back on the 8-byte canonical hash — the exact-
    dedup plan (textstats.q_exact_dedup), never a pixel shuffle, never
    a pairwise compare."""
    corpus = dihedral_corpus(spark, sf_dir)
    groups = corpus.groupBy("dihedral_phash").agg(
        F.min("img_id").alias("canon_img"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    )
    return corpus.join(groups, "dihedral_phash").select(
        "img_id", "phash", "dihedral_phash", "canon_img", "group_size"
    )


def phash_dihedral_golden() -> list[tuple[int, int, int, int, int]]:
    """Pure-Python replay via the PIXEL road: every row's canonical
    hash is min over phash64_int of the 8 dihedral_transform'd pixel
    arrays — never the bit permutation the engine uses — then the
    same min/count grouping, brute-forced."""
    rows = []
    for did in range(PHASH_N_DOCS):
        px = _phash_pixels(did)
        imgs = [(did, px)]
        if did % DIH_PLANT_MOD == 3:
            imgs.append(
                (did + DIH_VARIANT_OFFSET, dihedral_transform(px, 1 + did % 7))
            )
        for img_id, pixels in imgs:
            ph = phash64_int(np.ascontiguousarray(pixels))
            variants = [
                phash64_int(
                    np.ascontiguousarray(dihedral_transform(pixels, k))
                )
                & 0xFFFFFFFFFFFFFFFF
                for k in range(8)
            ]
            canon = min(variants)
            canon = canon - (1 << 64) if canon >= (1 << 63) else canon
            rows.append((img_id, ph, canon))
    by_canon: dict[int, list[int]] = {}
    for img_id, _, canon in rows:
        by_canon.setdefault(canon, []).append(img_id)
    return sorted(
        (img_id, ph, canon, min(by_canon[canon]), len(by_canon[canon]))
        for img_id, ph, canon in rows
    )


# --- phash threshold accuracy audit -------------------------------------------
# "Which Hamming threshold?" is the decision every phash dedup above
# hard-codes (PHASH_MAX_HAMMING = 8); this operator MEASURES it: the
# full precision/recall sweep over t = 0..PHAUDIT_MAX_T against the
# corpus's planted ground truth (the brightness-edited variants at
# img_id = base + PHASH_VARIANT_OFFSET). A curation pipeline runs this
# on a labeled sample, reads off the t where false positives explode,
# and applies that t to the 100 TB corpus — measured, not guessed.
#
# Scale shape: the only full-data work is the shared capped banded
# candidate join (phash_candidate_pairs — 4 int rows per image, hot
# buckets dropped); the sweep itself aggregates candidates to a
# ≤65-row (hamming, counts) table map-side, and the 17-threshold grid
# joins THAT, so threshold tuning is free at any corpus size. Recall's
# denominator counts ALL planted pairs, so banding misses (a true pair
# sharing no band) land in n_fn — the audit grades the whole pipeline,
# not just the rerank.

PHAUDIT_MAX_T = 16  # sweep Hamming thresholds 0..16


def q_phash_threshold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, n_flagged, n_tp, n_fp, n_fn, n_true_total) for each Hamming
    threshold t = 0..PHAUDIT_MAX_T over the banded phash candidates:
    pairs flagged at ≤ t, true/false positives against the planted
    variant truth, and misses (including pairs banding never saw)."""
    corpus = phash_corpus(spark, sf_dir)
    cand = phash_candidate_pairs(corpus)
    is_true = (F.col("img_b") - F.col("img_a")) == PHASH_VARIANT_OFFSET
    per_h = cand.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_at_h"),
        F.sum(F.when(is_true, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_true_at_h"),
    )
    grid = spark.createDataFrame(
        [(t,) for t in range(PHAUDIT_MAX_T + 1)], "t long"
    )
    swept = (
        grid.join(F.broadcast(per_h), F.col("hamming") <= F.col("t"), "left")
        .groupBy("t")
        .agg(
            F.coalesce(F.sum("n_at_h"), F.lit(0))
            .cast("long")
            .alias("n_flagged"),
            F.coalesce(F.sum("n_true_at_h"), F.lit(0))
            .cast("long")
            .alias("n_tp"),
        )
    )
    total = corpus.filter(F.col("img_id") >= PHASH_VARIANT_OFFSET).agg(
        F.count(F.lit(1)).cast("long").alias("n_true_total")
    )
    return swept.crossJoin(F.broadcast(total)).select(
        "t",
        "n_flagged",
        "n_tp",
        (F.col("n_flagged") - F.col("n_tp")).cast("long").alias("n_fp"),
        (F.col("n_true_total") - F.col("n_tp")).cast("long").alias("n_fn"),
        "n_true_total",
    )


def phash_threshold_audit_golden(
    max_bucket: int = PHASH_MAX_BUCKET,
) -> list[tuple[int, int, int, int, int, int]]:
    """Pure-Python replay: brute-force capped banded candidates (same
    rule as phash_neardup_golden, no distance cutoff), then the per-
    threshold precision/recall counts."""
    import collections

    rows = _phash_rows(range(PHASH_N_DOCS))
    bucket_n: collections.Counter = collections.Counter()
    for r in rows:
        h = r["phash"] & 0xFFFFFFFFFFFFFFFF
        for k in range(_PHASH_BANDS):
            bucket_n[(k, (h >> (16 * k)) & 0xFFFF)] += 1
    cands = []  # (hamming, is_true)
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            x, y = sorted((ra, rb), key=lambda r: r["img_id"])
            ha = x["phash"] & 0xFFFFFFFFFFFFFFFF
            hb = y["phash"] & 0xFFFFFFFFFFFFFFFF
            shares_band = any(
                (ha >> (16 * k)) & 0xFFFF == (hb >> (16 * k)) & 0xFFFF
                and bucket_n[(k, (ha >> (16 * k)) & 0xFFFF)] <= max_bucket
                for k in range(_PHASH_BANDS)
            )
            if shares_band:
                cands.append(
                    (
                        bin(ha ^ hb).count("1"),
                        y["img_id"] - x["img_id"] == PHASH_VARIANT_OFFSET,
                    )
                )
    n_true_total = sum(
        1 for r in rows if r["img_id"] >= PHASH_VARIANT_OFFSET
    )
    out = []
    for t in range(PHAUDIT_MAX_T + 1):
        flagged = [c for c in cands if c[0] <= t]
        tp = sum(1 for c in flagged if c[1])
        out.append(
            (
                t,
                len(flagged),
                tp,
                len(flagged) - tp,
                n_true_total - tp,
                n_true_total,
            )
        )
    return out


# --------------------------------------------------------------------------
# Thumbnail-pyramid storage sizing — the planning statistic for a
# multi-resolution image tower (mipmap / image-pyramid storage: every
# serving stack keeps halved-resolution copies down to a floor so
# vision models and preview UIs never resize at read time). Per image:
# level l stores ceil(w/2^l) × ceil(h/2^l) × 3 bytes while the smaller
# edge is still ≥ PYR_MIN_DIM, and the geometric series prices the
# whole tower at ~4/3 of the base — THE number a 100 TB image corpus
# reads before materializing pyramids. The reference stores one
# original per URL (/root/reference: single-copy page store) and never
# sizes derived assets.
#
# Gate shape: the (w, h) dims come off the REAL payload decode (same
# mapInPandas road as image_meta_extract — pixels never reach the
# JVM), while ALL pyramid math is JVM-side integer expressions; the
# oracle carries only golden (doc_id, w, h) from the pure-Python codec
# replay and re-derives every level in SQL independently, so the hash
# gate checks the sizing algebra, not a copied result. overhead is
# pyramid·1000 div base (≥ 0 — never a negative floordiv, where Spark
# div truncates toward zero but DuckDB // floors).
# --------------------------------------------------------------------------

PYR_MIN_DIM = 8  # smallest stored thumbnail edge
PYR_MAX_LVL = 12  # level scan bound (dims < 32·2^12 always hold)
PYR_N_DOCS = 200  # pinned corpus: doc_id < 200 (documents ≥ 500 at any SF)


def thumb_pyramid_golden() -> list[tuple[int, int, int]]:
    """Pure-Python codec replay: (doc_id, w, h) for the pinned corpus —
    the oracle's only input; all sizing math re-derives in SQL."""
    out = []
    for did in range(PYR_N_DOCS):
        px, _fmt = codec.decode(codec.payload_for(f"doc-{did}")["bytes"])
        out.append((did, int(px.shape[1]), int(px.shape[0])))
    return out


def q_thumb_pyramid_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w, h, n_levels, base_bytes, pyramid_bytes,
    overhead_permille): halved-resolution tower sizing per decoded
    image, levels kept while min(ceil(w/2^l), ceil(h/2^l)) ≥
    PYR_MIN_DIM."""
    from go_crawler_spark.functions.textstats import _floordiv

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < PYR_N_DOCS
    )

    def dims(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                px, _fmt = codec.decode(
                    codec.payload_for(f"doc-{int(did)}")["bytes"]
                )
                rows.append(
                    {
                        "doc_id": int(did),
                        "w": int(px.shape[1]),
                        "h": int(px.shape[0]),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h"])

    meta = docs.mapInPandas(dims, schema="doc_id long, w long, h long")

    def ceil_div(a, p):
        return _floordiv(a + p - 1, p)

    pows = F.array(
        *[F.lit(1 << lv).cast("long") for lv in range(PYR_MAX_LVL + 1)]
    )
    lvl_bytes = F.transform(
        pows,
        lambda p: F.when(
            F.least(ceil_div(F.col("w"), p), ceil_div(F.col("h"), p))
            >= PYR_MIN_DIM,
            ceil_div(F.col("w"), p) * ceil_div(F.col("h"), p) * 3,
        ).otherwise(F.lit(0).cast("long")),
    )
    base = (F.col("w") * F.col("h") * 3).cast("long")
    return (
        meta.withColumn(
            "n_levels",
            F.size(F.filter(lvl_bytes, lambda b: b > 0)).cast("long"),
        )
        .withColumn(
            "pyramid_bytes",
            F.aggregate(
                lvl_bytes, F.lit(0).cast("long"), lambda acc, b: acc + b
            ),
        )
        .select(
            "doc_id",
            "w",
            "h",
            "n_levels",
            base.alias("base_bytes"),
            "pyramid_bytes",
            _floordiv(F.col("pyramid_bytes") * 1000, base).alias(
                "overhead_permille"
            ),
        )
    )
