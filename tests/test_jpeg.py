"""Library-free baseline JPEG codec tests (operators/jpeg.py): round-trip
fidelity, exactness on piecewise-constant fixtures, subsampling, error
paths, and the decode_image / extract_image_features wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bonobo_sqlalchemy_spark.operators import multimodal as M
from bonobo_sqlalchemy_spark.operators.jpeg import (
    QUANT_FLAT8,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def test_constant_gray_roundtrip_exact():
    # flat-8 quant: DC of a constant block quantizes without remainder,
    # so the lossy codec is exact here (the property the oracle query uses)
    for v in (0, 1, 77, 128, 254, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img))
        assert out.shape == (16, 24, 3)
        assert (out == v).all(), v


def test_quadrant_gray_roundtrip_exact():
    # four distinct block levels: nonzero DC diffs through the Huffman
    # path, still exact
    img = np.empty((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 13, 200, 91, 255
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert (out[:, :, 0] == img).all()
    assert (out[:, :, 1] == img).all() and (out[:, :, 2] == img).all()


def test_gradient_gray_close():
    # AC path engaged for real; flat-8 quant keeps error tiny on smooth data
    img = np.linspace(0, 255, 24 * 24).reshape(24, 24).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 4, err


def test_rgb_444_odd_dims_close():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert out.shape == img.shape
    # worst case: random noise through color convert + quant; bounded
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24


def test_rgb_420_subsampled_close():
    yy, xx = np.mgrid[0:20, 0:28]
    img = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, np.full_like(xx, 120)], axis=2
    ).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, subsample="4:2:0"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_custom_quant_table_roundtrips():
    # a non-flat table exercises per-coefficient dequant (incl. the
    # zigzag-order DQT storage round trip)
    q = np.arange(1, 65, dtype=np.int64)
    img = np.full((8, 8), 100, dtype=np.uint8)
    img[2:5, 3:6] = 140
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quant=q))
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 16


def test_arithmetic_sof_raises_not_implemented():
    # minimal SOF9 (arithmetic-coded) file: the branch must refuse loudly,
    # not mis-decode (progressive SOF2 decodes for real as of round 12)
    payload = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + b"\x01\x11\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_baseline(payload)


def test_progressive_matches_baseline_exactly():
    """Progressive mode reorders the entropy coding of the SAME quantized
    coefficients, so decoding the progressive stream must reproduce the
    baseline decode bit-for-bit — across gray/RGB, odd dims, both
    subsampling layouts, and the 4:2:0 case where the non-interleaved AC
    grid is smaller than the MCU-padded DC grid."""
    from bonobo_sqlalchemy_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:20, 0:28]
    cases = [
        (np.full((16, 16), 77, dtype=np.uint8), {}),
        (np.linspace(0, 255, 24 * 24).reshape(24, 24).astype(np.uint8), {}),
        (rng.integers(0, 256, (17, 23, 3), dtype=np.uint8), {}),
        (
            np.stack(
                [(xx * 4) % 256, (yy * 5) % 256, np.full_like(xx, 120)], axis=2
            ).astype(np.uint8),
            {"subsample": "4:2:0"},
        ),
        # 18x26 at 4:2:0: Y's non-interleaved grid (3x4 blocks) < padded
        # MCU grid (4x4) — AC scans must not touch the padding row
        (rng.integers(0, 256, (18, 26, 3), dtype=np.uint8), {"subsample": "4:2:0"}),
    ]
    for img, kw in cases:
        base = decode_jpeg_baseline(encode_jpeg_baseline(img, **kw))
        prog = decode_jpeg_baseline(encode_jpeg_progressive(img, **kw))
        assert (base == prog).all(), (img.shape, kw)


def test_progressive_ac_refinement_machinery_engaged():
    """The scan script genuinely exercises successive approximation: with
    Al=1 first passes, any odd-magnitude coefficient forces a refinement
    bit, and newly-visible |coeff|==1 values appear only in the
    refinement scan. A noisy image under a fine quant table guarantees
    both, and the stream still decodes identically to baseline."""
    from bonobo_sqlalchemy_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    q = np.full(64, 2, dtype=np.int64)  # fine table -> rich coefficients
    base = decode_jpeg_baseline(encode_jpeg_baseline(img, quant=q))
    prog_payload = encode_jpeg_progressive(img, quant=q)
    prog = decode_jpeg_baseline(prog_payload)
    assert (base == prog).all()
    # progressive stream is a genuinely different encoding of the data
    assert prog_payload != encode_jpeg_baseline(img, quant=q)


def test_not_a_jpeg_raises_value_error():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x89PNG\r\n\x1a\nnope")


def test_decode_image_routes_jpeg():
    img = np.full((8, 8), 42, dtype=np.uint8)
    out = np.asarray(M.decode_image(encode_jpeg_baseline(img)))
    assert out.shape == (8, 8, 3) and (out == 42).all()


def test_extract_image_features_over_jpeg_payloads(spark):
    rows = []
    for i, v in [(1, 10), (2, 250)]:
        img = np.full((16, 16), v, dtype=np.uint8)
        rows.append((i, bytearray(encode_jpeg_baseline(img))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in M.extract_image_features(df).collect()}
    assert got[1].mean_r == 10.0 and got[2].mean_r == 250.0
    assert got[1].height == 16 and got[1].width == 16


def test_quant_table_validation():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg_baseline(img, quant=np.zeros(64, dtype=np.int64))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg_baseline(img, subsample="4:2:2")
