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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
