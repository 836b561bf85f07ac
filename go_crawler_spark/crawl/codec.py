"""Deterministic image payload codec, PSNR, and perceptual hash.

The graft payload (`BASELINE.json` input_hint) is an image+caption pair
`(image_id, bytes, w, h, fmt, caption, phash)`. Real image libraries
(PIL/libjpeg) are not in this container, so the corpus uses a
self-contained deterministic codec with the two properties the payload
invariant needs:

- ``png``  — lossless: zlib over raw RGB; decode is bit-exact.
- ``jpeg`` — lossy stand-in: per-channel quantization (step 4, mid-rise)
  then zlib. Max abs error 2 ⇒ PSNR ≈ 47 dB > the 40 dB gate, so the
  verify kernel exercises the real lossy-compare path.

Ground-truth pixels and captions are pure functions of ``image_id``
(SHA-256 → PCG64), so the verify kernel can regenerate truth on any
executor without shipping a second copy of the corpus — the same trick
a real crawl uses when the fetch payload is checked against a content
hash rather than a stored duplicate.

Everything here is numpy-vectorized per image; the engine only calls it
inside the Arrow-batched ``decode_verify`` kernel (SURVEY.md §2 E18).
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np

MAGIC = b"GCSI"  # go-crawler-spark image
_QUANT_STEP = 4

# caption template fragments — full-width Japanese text so the
# normalization kernel (SURVEY.md §2 E4) has real work to do
_CAPTION_JOBS = ("エンジニア", "デザイナー", "営業", "事務", "看護師", "調理師")
_CAPTION_PREFS = ("東京都", "大阪府", "北海道", "京都府", "福岡県", "愛知県")
_CAPTION_TYPES = ("正社員", "契約社員", "アルバイト", "業務委託")
_FW_DIGITS = str.maketrans("0123456789", "０１２３４５６７８９")


def _seed_from_id(image_id: str) -> np.random.Generator:
    digest = hashlib.sha256(image_id.encode("utf-8")).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(digest[:8], "little")))


_SCALE_RE = re.compile(r"@x(\d+)$")


def _scale_of(image_id: str) -> int:
    """Image size multiplier encoded in the id ("…@x4" → 4, default 1).

    Keeping the scale inside the id preserves the pure-function
    property the verify kernel depends on: truth pixels derive from the
    id alone, no side-channel config."""
    m = _SCALE_RE.search(image_id)
    return int(m.group(1)) if m else 1


def truth_dims(image_id: str) -> tuple[int, int]:
    """Deterministic (w, h); base [24, 64] × the id's @x scale."""
    rng = _seed_from_id(image_id)
    s = _scale_of(image_id)
    w = int(rng.integers(24, 65)) * s
    h = int(rng.integers(24, 65)) * s
    return w, h


def truth_pixels(image_id: str) -> np.ndarray:
    """Ground-truth RGB uint8 array (h, w, 3), pure function of id."""
    rng = _seed_from_id(image_id)
    s = _scale_of(image_id)
    w = int(rng.integers(24, 65)) * s
    h = int(rng.integers(24, 65)) * s
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def truth_fmt(image_id: str) -> str:
    digest = hashlib.sha256(image_id.encode("utf-8")).digest()
    return "png" if digest[8] % 2 == 0 else "jpeg"


def truth_caption(image_id: str) -> str:
    """Deterministic Japanese caption with full-width digits/symbols."""
    digest = hashlib.sha256(image_id.encode("utf-8")).digest()
    job = _CAPTION_JOBS[digest[9] % len(_CAPTION_JOBS)]
    pref = _CAPTION_PREFS[digest[10] % len(_CAPTION_PREFS)]
    jtype = _CAPTION_TYPES[digest[11] % len(_CAPTION_TYPES)]
    salary_man = 18 + digest[12] % 42  # 18..59 万円
    num = str(int.from_bytes(digest[13:16], "little") % 100000)
    return (
        f"求人ＩＤ：{num.translate(_FW_DIGITS)}　{pref}の{job}（{jtype}）"
        f"　月給{salary_man}万円〜"
    )


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode RGB uint8 (h, w, 3) → payload bytes."""
    h, w = pixels.shape[:2]
    if fmt == "jpeg":
        data = (pixels // _QUANT_STEP) * _QUANT_STEP + _QUANT_STEP // 2
        data = data.astype(np.uint8)
    elif fmt == "png":
        data = pixels
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    fmt_byte = b"\x00" if fmt == "png" else b"\x01"
    return MAGIC + fmt_byte + struct.pack("<HH", w, h) + zlib.compress(data.tobytes(), 6)


def decode(payload: bytes) -> tuple[np.ndarray, str]:
    """Decode payload bytes → (RGB uint8 array, fmt)."""
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    fmt = "png" if payload[4:5] == b"\x00" else "jpeg"
    w, h = struct.unpack("<HH", payload[5:9])
    raw = zlib.decompress(payload[9:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    uint8 inputs take an integer SSE path (int16 diff, int64 einsum
    accumulate — 4× less memory traffic than the float64 form and
    bit-identical: the squared diffs are integers ≤ 65025 whose float64
    sum is exact, so sse/n equals the float64 mean exactly)."""
    if a.shape != b.shape:
        return 0.0
    if a.dtype == np.uint8 and b.dtype == np.uint8:
        d = a.astype(np.int16)
        d -= b
        d = d.ravel()
        mse = float(np.einsum("i,i->", d, d, dtype=np.int64)) / d.size
    else:
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: gray → 8×8 block means → bits vs mean.

    Signed int64 so it round-trips through Spark LongType.
    """
    gray = pixels.mean(axis=2, dtype=np.float64)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    # segment-sum both axes in two vectorized passes (the 64 slice.mean()
    # calls of the naive form cost ~1 ms/img in numpy dispatch overhead
    # alone — half the whole verify kernel)
    sums = np.add.reduceat(np.add.reduceat(gray, ys[:8], axis=0), xs[:8], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    blocks = sums / counts
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


def payload_for(image_id: str) -> dict:
    """Full deterministic payload row for an image id."""
    pixels = truth_pixels(image_id)
    fmt = truth_fmt(image_id)
    h, w = pixels.shape[:2]
    return {
        "image_id": image_id,
        "bytes": encode(pixels, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": truth_caption(image_id),
        "phash": phash64(pixels),
    }
