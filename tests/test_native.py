"""Native C++ entropy codecs (Rice + context-modeled range coder): lossless
roundtrip + compression on realistic deadzone-code distributions."""

import numpy as np
import pytest

from wicca_tpu.native.rice import native_available, rc_decode, rc_encode, rice_decode, rice_encode


def test_native_builds():
    assert native_available(), "g++ is in the image; the native codec should build"


@pytest.mark.parametrize("dtype", [np.int8, np.int16])
def test_roundtrip_random(dtype):
    rng = np.random.default_rng(0)
    codes = rng.integers(-100, 100, size=10_000).astype(dtype)
    data = rice_encode(codes)
    out = rice_decode(data, codes.size, dtype)
    np.testing.assert_array_equal(out, codes)


def test_roundtrip_sparse_and_size():
    # deadzone detail codes: mostly zeros with a laplacian-ish tail
    rng = np.random.default_rng(1)
    codes = np.where(rng.random(100_000) < 0.9, 0, rng.integers(-30, 30, 100_000)).astype(np.int8)
    data = rice_encode(codes)
    np.testing.assert_array_equal(rice_decode(data, codes.size, np.int8), codes)
    if native_available():
        # ~90% zeros: zero-run mode -> well under 2 bits/value
        assert len(data) < codes.size // 4


def test_roundtrip_extremes():
    codes = np.array([0, 127, -128, 1, -1, 64, -64] * 100, dtype=np.int8)
    np.testing.assert_array_equal(rice_decode(rice_encode(codes), codes.size, np.int8), codes)
    codes16 = np.array([0, 32767, -32768, 5, -5] * 50, dtype=np.int16)
    np.testing.assert_array_equal(rice_decode(rice_encode(codes16), codes16.size, np.int16), codes16)


def test_empty_plane():
    codes = np.zeros(0, dtype=np.int8)
    assert rice_decode(rice_encode(codes), 0, np.int8).size == 0


def test_all_zero_plane_tiny():
    codes = np.zeros(4096, dtype=np.int8)
    data = rice_encode(codes)
    np.testing.assert_array_equal(rice_decode(data, 4096, np.int8), codes)
    if native_available():
        assert len(data) < 64  # zero-run mode: ~25 bits per 512-block


def test_bitstream_golden_fixture():
    """The Rice BITSTREAM format is frozen (CLAUDE.md invariant): old .wct
    files must keep decoding. These bytes were produced by the shipped r1
    coder — any encoder change that alters them needs a NEW codec id, not an
    in-place format edit (ADVICE r1)."""
    if not native_available():
        pytest.skip("numpy fallback uses its own RAW0 framing")
    i8 = np.array(
        [0, 0, 0, 1, -1, 2, -2, 127, -128, 0, 0, 5, -7, 0, 33, -33, 0, 0, 0, 0, 1, 0, -1, 0],
        np.int8,
    ).reshape(2, 12)
    i16 = np.array(
        [0, 0, 1, -1, 256, -256, 32767, -32768, 0, 3, -3, 1000, -1000, 0, 0, 7], np.int16
    ).reshape(2, 8)
    golden_i8 = bytes.fromhex("0800800864fefffcffef01a01a3c79010000040800")
    golden_i16 = bytes.fromhex("1a0000001000020000e13ffcf9ffbfff0f0030000a00e8e3f9000000000700")
    assert rice_encode(i8) == golden_i8
    assert rice_encode(i16) == golden_i16
    np.testing.assert_array_equal(rice_decode(golden_i8, i8.size, np.int8).reshape(i8.shape), i8)
    np.testing.assert_array_equal(rice_decode(golden_i16, i16.size, np.int16).reshape(i16.shape), i16)


# --- context-modeled range coder (container codec id 1) ---


@pytest.mark.skipif(not native_available(), reason="rc requires the native library")
@pytest.mark.parametrize("dtype", [np.int8, np.int16])
def test_rc_roundtrip_random(dtype):
    rng = np.random.default_rng(0)
    codes = rng.integers(-100, 100, size=(3, 50, 80)).astype(dtype)
    np.testing.assert_array_equal(rc_decode(rc_encode(codes), codes.shape, dtype), codes)


@pytest.mark.skipif(not native_available(), reason="rc requires the native library")
def test_rc_roundtrip_extremes():
    codes = np.array([0, 127, -128, 1, -1, 64, -64] * 100, dtype=np.int8).reshape(7, 100)
    np.testing.assert_array_equal(rc_decode(rc_encode(codes), codes.shape, np.int8), codes)
    codes16 = np.array([0, 32767, -32768, 5, -5] * 60, dtype=np.int16).reshape(3, 100)
    np.testing.assert_array_equal(rc_decode(rc_encode(codes16), codes16.shape, np.int16), codes16)


@pytest.mark.skipif(not native_available(), reason="rc requires the native library")
def test_rc_roundtrip_adversarial_shapes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (1, 999), (999, 1), (2, 3, 5), (1, 8, 8)]:
        codes = rng.integers(-30, 31, size=shape).astype(np.int8)
        np.testing.assert_array_equal(rc_decode(rc_encode(codes), shape, np.int8), codes)
    assert rc_decode(rc_encode(np.zeros((0, 4), np.int8)), (0, 4), np.int8).size == 0


@pytest.mark.skipif(not native_available(), reason="rc requires the native library")
def test_rc_beats_rice_on_clustered_planes():
    """The context model's reason to exist: spatially clustered significance
    (what deadzone wavelet details look like) codes well below order-0."""
    rng = np.random.default_rng(2)
    z = np.zeros((2, 256, 384), np.int8)
    for _ in range(150):
        y, x = rng.integers(0, 250), rng.integers(0, 378)
        z[rng.integers(0, 2), y : y + 4, x : x + 6] = rng.integers(-20, 20, (4, 6))
    assert len(rc_encode(z)) < 0.85 * len(rice_encode(z))


@pytest.mark.skipif(not native_available(), reason="rc requires the native library")
def test_rc_bitstream_golden_fixture():
    """The rc BITSTREAM format (codec id 1) is frozen like Rice's: any
    encoder change that alters these bytes needs a NEW codec id."""
    i8 = np.array(
        [0, 0, 0, 1, -1, 2, -2, 127, -128, 0, 0, 5, -7, 0, 33, -33, 0, 0, 0, 0, 1, 0, -1, 0],
        np.int8,
    ).reshape(2, 12)
    i16 = np.array(
        [0, 0, 1, -1, 256, -256, 32767, -32768, 0, 3, -3, 1000, -1000, 0, 0, 7], np.int16
    ).reshape(2, 8)
    golden_i8 = bytes.fromhex("00166d66faf2a523eee51129ac8f8edebc3614")
    golden_i16 = bytes.fromhex("00298e244bb34f47997a3dcddfff161220256bbd5d79ba78beb5ff37")
    assert rc_encode(i8) == golden_i8
    assert rc_encode(i16) == golden_i16
    np.testing.assert_array_equal(rc_decode(golden_i8, i8.shape, np.int8), i8)
    np.testing.assert_array_equal(rc_decode(golden_i16, i16.shape, np.int16), i16)
