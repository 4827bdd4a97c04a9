"""Transcode: reshape .wct files (layers / resolution / entropy codec)
without re-running the DWT; results match the direct decode paths."""

import numpy as np
import pytest

from wicca_tpu.codec.container import load, save
from wicca_tpu.codec.pipeline import decode, decode_at_level, encode
from wicca_tpu.codec.transcode import drop_finest_levels, transcode
from wicca_tpu.core.quant import QuantSpec


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (3, 96, 160), np.uint8)


def test_drop_levels_haar_matches_decode_at_level(img):
    s = encode(img, levels=4, spec=QuantSpec(base_step=2.0), wavelet="haar")
    for r in (1, 2, 3):
        t = drop_finest_levels(s, r)
        assert t.levels == 4 - r
        got = np.asarray(decode(t, emit_u8=True))
        want = np.asarray(decode_at_level(s, r, emit_u8=True))
        np.testing.assert_array_equal(got, want)


def test_drop_levels_haar_int_lossless(img):
    s = encode(img, levels=3, wavelet="haar_int")
    t = drop_finest_levels(s, 1)
    got = np.asarray(decode(t, emit_u8=True))
    want = np.asarray(decode_at_level(s, 1, emit_u8=True))
    np.testing.assert_array_equal(got, want)


def test_drop_levels_global_layout(img):
    # hi-depth streams use whole-image lifting (layout='global')
    x16 = (img.astype(np.uint16) << 4)
    s = encode(x16, levels=3, wavelet="legall5.3", bit_depth=12)
    t = drop_finest_levels(s, 1)
    got = np.asarray(decode(t, emit_u8=True))
    want = np.asarray(decode_at_level(s, 1, emit_u8=True))
    np.testing.assert_array_equal(got, want)


def test_drop_levels_rejects_tiled_wide(img):
    s = encode(img, levels=3, wavelet="legall5.3")
    assert s.layout == "tiled"
    with pytest.raises(ValueError, match="tiled"):
        drop_finest_levels(s, 1)
    with pytest.raises(ValueError, match="drop_levels"):
        drop_finest_levels(s, 3)


def test_transcode_file_layers_and_levels(img, tmp_path):
    s = encode(img, levels=4, spec=QuantSpec(base_step=1.0), wavelet="haar")
    src = tmp_path / "full.wct"
    save(s, str(src), quality_layers=3)

    # layer truncation: transcoded file decodes like load(max_layers=2)
    dst = tmp_path / "l2.wct"
    info = transcode(src, dst, max_layers=2)
    assert info["bytes_out"] < info["bytes_in"]
    got = np.asarray(decode(load(str(dst)), emit_u8=True))
    want = np.asarray(decode(load(str(src), max_layers=2), emit_u8=True))
    np.testing.assert_array_equal(got, want)

    # resolution drop: file-level path matches decode_at_level
    dst2 = tmp_path / "half.wct"
    info2 = transcode(src, dst2, drop_levels=1, codec="rc")
    assert info2["levels"] == 3 and info2["orig_shape"] == (48, 80)
    got2 = np.asarray(decode(load(str(dst2)), emit_u8=True))
    want2 = np.asarray(decode_at_level(s, 1, emit_u8=True))
    np.testing.assert_array_equal(got2, want2)


def test_transcode_preserves_source_layering(img, tmp_path):
    """A codec-only rewrite keeps the source's SNR layers (ADVICE r2: the old
    quality_layers=1 default silently flattened progressive streams)."""
    from wicca_tpu.codec.container import peek_layers

    s = encode(img, levels=3, spec=QuantSpec(base_step=1.0), wavelet="haar")
    src = tmp_path / "layered.wct"
    save(s, str(src), quality_layers=3, codec="rice")
    assert peek_layers(str(src)) == 3

    dst = tmp_path / "recodec.wct"
    transcode(src, dst, codec="rc")  # no quality_layers: preserve
    assert peek_layers(str(dst)) == 3
    # the transcoded file still decodes progressively, matching the source
    for ml in (1, 2, 3):
        np.testing.assert_array_equal(
            np.asarray(decode(load(str(dst), max_layers=ml), emit_u8=True)),
            np.asarray(decode(load(str(src), max_layers=ml), emit_u8=True)),
        )

    # truncation clamps the preserved count; flat sources stay flat
    dst2 = tmp_path / "trunc.wct"
    transcode(src, dst2, max_layers=2)
    assert peek_layers(str(dst2)) == 2
    flat = tmp_path / "flat.wct"
    save(s, str(flat))
    dstf = tmp_path / "flat2.wct"
    transcode(flat, dstf, codec="rc")
    assert peek_layers(str(dstf)) == 1


def test_transcode_recodec_identical(img, tmp_path):
    s = encode(img, levels=3, wavelet="haar_int")
    src = tmp_path / "rice.wct"
    save(s, str(src), codec="rice")
    dst = tmp_path / "rc.wct"
    transcode(src, dst, codec="rc")
    np.testing.assert_array_equal(
        np.asarray(decode(load(str(dst)), emit_u8=True)),
        np.asarray(decode(load(str(src)), emit_u8=True)),
    )
