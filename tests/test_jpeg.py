"""Baseline JPEG codec (functions/jpeg.py) — pure-numpy ITU-T T.81.

Pins: (1) bounded-error round-trip on random images, (2) EXACT
round-trip of solid-colour frames against the closed-form DC formula
the mm6 oracle uses — enumerated over all 256 id-derived colour
classes, so the driver gate can never hit an unchecked colour, (3)
stream robustness: byte stuffing, non-multiple-of-8 dims, grayscale,
unsupported-feature errors, (4) the decode_image dispatcher now
routes JPEG for real.
"""

from __future__ import annotations

import numpy as np
import pytest

from hi_csa_db_spark.functions.jpeg import (
    decode_jpeg,
    dc_roundtrip_value,
    encode_jpeg,
    rgb_to_ycbcr,
    scaled_quant_tables,
    ycbcr_to_rgb,
)


def test_roundtrip_random_bounded_error():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # random noise is the worst case for DCT coding; quality 90 keeps
    # even that within a moderate band, and smooth content is near-exact
    assert err.max() <= 64
    assert err.mean() < 12


def test_roundtrip_smooth_gradient_tight():
    x = np.linspace(0, 255, 64)
    img = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)), np.full((64, 64), 128.0)],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4


def test_grayscale_roundtrip():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=85))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 48


def test_solid_color_closed_form_all_256_classes():
    """The mm6 oracle contract: for every colour class the fixtures can
    produce (doc_id mod 256 determines all three channels), the REAL
    codec's decoded frame is uniform and equals the closed-form DC
    round-trip — the exact chain the DuckDB oracle computes."""
    luma_q, chroma_q = scaled_quant_tables(75)
    ql, qc = int(luma_q[0, 0]), int(chroma_q[0, 0])
    assert (ql, qc) == (8, 9)  # pinned: the oracle hard-codes these
    for i in range(256):
        r, g, b = i % 256, (i * 7) % 256, (i * 13) % 256
        img = np.full((16, 16, 3), (r, g, b), np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        assert (out.min(axis=(0, 1)) == out.max(axis=(0, 1))).all(), i
        y, cb, cr = rgb_to_ycbcr(img[:1, :1])[0, 0]
        pred = ycbcr_to_rgb(
            np.array(
                [[[
                    dc_roundtrip_value(y, ql),
                    dc_roundtrip_value(cb, qc),
                    dc_roundtrip_value(cr, qc),
                ]]],
                np.float64,
            )
        )[0, 0]
        assert (out[0, 0] == pred).all(), (i, out[0, 0], pred)


def test_byte_stuffing_survives():
    # a mid-gray field at quality 1 produces long 1-runs in the entropy
    # stream -> stuffed 0xFF bytes; decode must un-stuff them
    img = np.full((32, 32, 3), 255, np.uint8)
    payload = encode_jpeg(img, quality=50)
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert (out.min(axis=(0, 1)) == out.max(axis=(0, 1))).all()


def test_nonmultiple_of_8_dims_and_quality_range():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 15, 3), dtype=np.uint8)
    for q in (1, 50, 100):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
    with pytest.raises(ValueError):
        encode_jpeg(img, quality=0)


def test_unsupported_features_raise_cleanly():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    img = np.zeros((8, 8, 3), np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_decode_image_dispatches_jpeg():
    from hi_csa_db_spark.operators.multimodal import decode_image

    img = np.full((16, 16, 3), (10, 200, 30), np.uint8)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)
    # quality-95 solid colour decodes within a pixel or two of source
    assert np.abs(out[0, 0].astype(int) - [10, 200, 30]).max() <= 3


def test_420_subsampling_roundtrip():
    x = np.linspace(0, 255, 45)
    img = np.stack(
        [np.tile(x, (33, 1)), np.tile(x[::-1], (33, 1)), np.full((33, 45), 90.0)],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is box-averaged 2x2; smooth content stays tight
    assert err.mean() < 4 and err.max() <= 16


def test_420_solid_matches_444_closed_form():
    # a constant plane subsamples to the same constant, so the mm6
    # closed form predicts 4:2:0 output identically to 4:4:4
    for i in (3, 77, 200):
        rgb = (i % 256, (i * 7) % 256, (i * 13) % 256)
        img = np.full((16, 16, 3), rgb, np.uint8)
        o444 = decode_jpeg(encode_jpeg(img, quality=75, subsample="444"))
        o420 = decode_jpeg(encode_jpeg(img, quality=75, subsample="420"))
        assert (o444[0, 0] == o420[0, 0]).all()
        assert (o420.min(axis=(0, 1)) == o420.max(axis=(0, 1))).all()


def test_420_odd_dims():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    assert out.shape == img.shape


def test_restart_markers_roundtrip_identical():
    # RSTn markers + DC-predictor resets must not change decoded output
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 3, 7):
        payload = encode_jpeg(img, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI present
        assert (decode_jpeg(payload) == base).all()


def test_restart_markers_with_420():
    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    out = decode_jpeg(
        encode_jpeg(img, quality=85, subsample="420", restart_interval=2)
    )
    assert (out == base).all()


def test_missequenced_restart_detected():
    img = np.zeros((24, 24, 3), np.uint8)
    payload = bytearray(encode_jpeg(img, quality=75, restart_interval=1))
    # corrupt the first restart marker's sequence number (D0 -> D5)
    idx = payload.find(b"\xff\xd0", payload.find(b"\xff\xda"))
    assert idx > 0
    payload[idx + 1] = 0xD5
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(payload))
