"""High-bit-depth (9..16 bpp) codec support: uint16 lossless roundtrips,
hi-depth lossy PSNR, WCT6 container, native-dtype emission.

The reference is uint8-only (validation.py:80 contract); hi-depth is a
JPEG2000-parity extension for medical/scientific imagery, routed through the
whole-image XLA lifting path with int32 codes (codec/pipeline.py docstring).
"""

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import decode, decode_at_level, encode, icon_from_stream
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def _img16(shape, peak=65535, seed=0):
    return np.random.default_rng(seed).integers(0, peak + 1, size=shape, dtype=np.uint16)


@pytest.mark.parametrize("wavelet", ["haar_int", "legall5.3"])
def test_u16_lossless_roundtrip_bitexact(wavelet):
    x = _img16((3, 64, 96))
    stream = encode(x, levels=3, wavelet=wavelet)
    assert stream.bit_depth == 16 and stream.layout == "global"
    rec = np.asarray(decode(stream, emit_u8=True))
    assert rec.dtype == np.uint16
    np.testing.assert_array_equal(rec, x)


def test_u16_lossless_rct_roundtrip():
    x = _img16((3, 48, 64), seed=2)
    stream = encode(x, levels=2, wavelet="legall5.3", color="rct")
    rec = np.asarray(decode(stream, emit_u8=True))
    np.testing.assert_array_equal(rec, x)


def test_12bit_lossless_roundtrip():
    x = _img16((1, 64, 64), peak=4095, seed=3)
    stream = encode(x, levels=3, wavelet="haar_int", bit_depth=12)
    assert stream.bit_depth == 12
    rec = np.asarray(decode(stream, emit_u8=True))
    assert rec.dtype == np.uint16
    np.testing.assert_array_equal(rec, x)


def test_u16_lossy_cdf97_psnr():
    # smooth 16-bit ramp + noise: quantization error ~ step, tiny vs peak
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    x = np.clip(20000 + 150 * xx + 90 * yy, 0, 65535).astype(np.uint16)[None]
    stream = encode(x, levels=3, wavelet="cdf97", spec=QuantSpec(base_step=8.0))
    rec = np.asarray(decode(stream, emit_u8=True))
    assert rec.dtype == np.uint16
    p = float(psnr(rec.astype(np.float32), x.astype(np.float32), peak=65535.0))
    assert p > 60.0, p


def test_u16_requires_lifting_wavelet():
    x = _img16((1, 32, 32))
    with pytest.raises(ValueError, match="lifting wavelet"):
        encode(x, levels=2, wavelet="haar")


def test_bit_depth_range_validated():
    x = _img16((1, 32, 32))
    with pytest.raises(ValueError, match="bit_depth"):
        encode(x, levels=2, wavelet="haar_int", bit_depth=17)


def test_icon_and_decode_at_level_u16():
    x = _img16((3, 64, 64), seed=5)
    stream = encode(x, levels=3, wavelet="legall5.3")
    icon = np.asarray(icon_from_stream(stream))
    assert icon.dtype == np.uint16 and icon.shape == (3, 8, 8)
    half = np.asarray(decode_at_level(stream, 1, emit_u8=True))
    assert half.dtype == np.uint16 and half.shape == (3, 32, 32)
    full = np.asarray(decode_at_level(stream, 0, emit_u8=True))
    np.testing.assert_array_equal(full, x)


def test_wct6_container_roundtrip():
    x = _img16((3, 64, 96), seed=7)
    stream = encode(x, levels=3, wavelet="legall5.3")
    data = C.serialize(stream)
    assert data[:4] == b"WCT6"
    back = C.deserialize(data)
    assert back.bit_depth == 16 and back.layout == "global"
    assert back.details[0][0].dtype == np.int32
    rec = np.asarray(decode(back, emit_u8=True))
    np.testing.assert_array_equal(rec, x)


def test_wct6_layered_and_truncated():
    x = _img16((1, 64, 64), seed=8)
    stream = encode(x, levels=2, wavelet="haar_int")
    data = C.serialize(stream, quality_layers=3)
    assert data[:4] == b"WCT6"
    full = C.deserialize(data)
    np.testing.assert_array_equal(np.asarray(decode(full, emit_u8=True)), x)
    prev = C.deserialize(data, max_layers=1)
    rec = np.asarray(decode(prev, emit_u8=True))
    p = float(psnr(rec.astype(np.float32), x.astype(np.float32), peak=65535.0))
    assert p > 20.0, p


def test_wct6_corruption_containment():
    x = _img16((1, 64, 64), seed=9)
    stream = encode(x, levels=2, wavelet="legall5.3")
    data = bytearray(C.serialize(stream))
    n = C._scan_trailer_units(bytes(data))
    tr = C._read_trailer(bytes(data), n)
    st, en = tr[0][0], tr[1][0]
    data[(st + en) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="plane 0"):
        C.deserialize(bytes(data))
    back = C.deserialize(bytes(data), on_error="zero")
    assert not np.any(np.asarray(back.details[0][0]))
    rec = np.asarray(decode(back, emit_u8=True))
    assert rec.shape == x.shape and rec.dtype == np.uint16


def test_u8_streams_unchanged():
    """8-bit encodes must still produce WCT4/WCT5 (format stability)."""
    x8 = np.random.default_rng(0).integers(0, 256, size=(1, 64, 64), dtype=np.uint8)
    s = encode(x8, levels=2)
    assert s.bit_depth == 8
    assert C.serialize(s)[:4] == b"WCT4"
    assert C.serialize(s, quality_layers=2)[:4] == b"WCT5"
