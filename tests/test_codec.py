"""Payload codec invariants (input_hint: PSNR≥40 lossy, exact lossless)."""

import numpy as np

from go_crawler_spark.crawl import codec


def test_png_roundtrip_exact():
    px = codec.truth_pixels("img-a")
    decoded, fmt = codec.decode(codec.encode(px, "png"))
    assert fmt == "png"
    assert np.array_equal(decoded, px)
    assert codec.psnr(decoded, px) == float("inf")


def test_jpeg_lossy_psnr_above_gate():
    px = codec.truth_pixels("img-b")
    decoded, fmt = codec.decode(codec.encode(px, "jpeg"))
    assert fmt == "jpeg"
    assert not np.array_equal(decoded, px)  # genuinely lossy
    assert np.abs(decoded.astype(int) - px.astype(int)).max() <= 2
    assert 40.0 <= codec.psnr(decoded, px) < 60.0


def test_determinism_and_dims():
    a1, a2 = codec.truth_pixels("same-id"), codec.truth_pixels("same-id")
    assert np.array_equal(a1, a2)
    b = codec.truth_pixels("other-id")
    assert a1.shape != b.shape or not np.array_equal(a1, b)
    w, h = codec.truth_dims("same-id")
    assert a1.shape == (h, w, 3)
    assert codec.truth_caption("same-id") == codec.truth_caption("same-id")
    assert "万円" in codec.truth_caption("same-id")


def test_phash_int64_and_stability():
    px = codec.truth_pixels("img-c")
    p1 = codec.phash64(px)
    assert -(1 << 63) <= p1 < (1 << 63)
    assert p1 == codec.phash64(px)
    # lossless decode → identical phash
    decoded, _ = codec.decode(codec.encode(px, "png"))
    assert codec.phash64(decoded) == p1


def test_payload_for_consistency():
    row = codec.payload_for("h00.example.com-job-7")
    decoded, fmt = codec.decode(row["bytes"])
    assert fmt == row["fmt"]
    assert decoded.shape == (row["h"], row["w"], 3)
    assert row["caption"] == codec.truth_caption("h00.example.com-job-7")
