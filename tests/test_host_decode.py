"""Host decode path (codec/host_decode.py): the CPU-side inverse used when
the measured link bandwidth makes device decode transfer-bound. Contract:
bit-identical to decode(stream, emit_u8=True) for haar / haar_int /
global-layout integer wavelets and none/rct color (module docstring);
within 1 gray level for ict (float fusion tolerance)."""

import numpy as np
import pytest

from wicca_tpu.codec import host_decode
from wicca_tpu.codec import rd
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.codec.transfer import fetch_stream
from wicca_tpu.core.quant import QuantSpec


def photo(h, w, seed=0, channels=3):
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, channels), np.float32)
    for octave, amp in ((4, 18.0), (16, 30.0), (64, 42.0)):
        n = rng.normal(0, 1, (h // octave + 2, w // octave + 2, channels)).astype(np.float32)
        img += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC).reshape(h, w, channels)
    img += 128
    return np.moveaxis(np.clip(img, 0, 255).astype(np.uint8), -1, 0)


def _host(stream):
    return fetch_stream(stream, force=False)


@pytest.mark.parametrize("levels", [1, 2, 3, 5])
@pytest.mark.parametrize("shape", [(256, 320), (250, 318)])
def test_haar_bit_exact(levels, shape):
    x = photo(*shape, seed=levels)
    s = _host(encode(x, levels=levels, spec=QuantSpec(base_step=1.0)))
    want = np.asarray(decode(s, emit_u8=True))
    got = host_decode.host_decode(s)
    assert got.dtype == np.uint8 and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("offset", [0.5, 0.3])
def test_haar_recon_offset(offset):
    x = photo(192, 256, seed=11)
    s = _host(encode(x, levels=4, spec=QuantSpec(base_step=2.0)))
    want = np.asarray(decode(s, emit_u8=True, recon_offset=offset))
    got = host_decode.host_decode(s, recon_offset=offset)
    np.testing.assert_array_equal(got, want)


def test_haar_band_div_bit_exact():
    x = photo(256, 256, seed=12)
    s = rd.truncate(_host(encode(x, levels=3, spec=QuantSpec(base_step=0.5))), target_bpp=1.0)
    want = np.asarray(decode(s, emit_u8=True))
    np.testing.assert_array_equal(host_decode.host_decode(s), want)


def test_haar_int_lossless_bit_exact():
    x = photo(250, 322, seed=13)
    s = _host(encode(x, levels=4, wavelet="haar_int"))
    got = host_decode.host_decode(s)
    np.testing.assert_array_equal(got, x)  # lossless
    np.testing.assert_array_equal(got, np.asarray(decode(s, emit_u8=True)))


def test_haar_int_truncated_bit_exact():
    x = photo(256, 256, seed=14)
    s = rd.truncate(_host(encode(x, levels=3, wavelet="haar_int")), target_bpp=2.0)
    want = np.asarray(decode(s, emit_u8=True))
    np.testing.assert_array_equal(host_decode.host_decode(s), want)


def test_rct_color_bit_exact():
    x = photo(192, 224, seed=15)
    s = _host(encode(x, levels=3, wavelet="haar_int", color="rct"))
    want = np.asarray(decode(s, emit_u8=True))
    np.testing.assert_array_equal(host_decode.host_decode(s), want)
    np.testing.assert_array_equal(host_decode.host_decode(s), x)


def test_ict_color_within_one_gray_level():
    x = photo(192, 224, seed=16)
    s = _host(encode(x, levels=3, spec=QuantSpec(base_step=1.0), color="ict", chroma_gain=2.0))
    want = np.asarray(decode(s, emit_u8=True)).astype(np.int16)
    got = host_decode.host_decode(s).astype(np.int16)
    assert np.abs(got - want).max() <= 1
    assert np.mean(got != want) < 1e-3


def test_hidepth_global_int_bit_exact():
    rng = np.random.default_rng(17)
    x = (rng.integers(0, 4096, (1, 160, 192)) & 0xFFF).astype(np.uint16)
    s = _host(encode(x, levels=3, wavelet="legall5.3", bit_depth=12))
    got = host_decode.host_decode(s)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, x)
    np.testing.assert_array_equal(got, np.asarray(decode(s, emit_u8=True)))


def test_legall53_tiled_lossless_bit_exact():
    """The tile-local reversible 5/3 host mirror: lossless roundtrip AND
    equal to the fused-kernel decode at depths that exercise multiple
    passes and the tile grid (dims > one (512, 1024) tile when halved)."""
    from wicca_tpu.codec.pipeline import decode_at_level

    x = photo(1100, 1300, seed=18)
    s = _host(encode(x, levels=5, wavelet="legall5.3"))
    got = host_decode.host_decode(s)
    np.testing.assert_array_equal(got, x)  # lossless
    np.testing.assert_array_equal(got, np.asarray(decode(s, emit_u8=True)))
    for tl in (1, 3):
        np.testing.assert_array_equal(
            host_decode.host_decode(s, target_level=tl),
            np.asarray(decode_at_level(s, tl, emit_u8=True)),
        )
    small = rd.truncate(_host(encode(x, levels=3, wavelet="legall5.3")), target_bpp=2.0)
    np.testing.assert_array_equal(
        host_decode.host_decode(small), np.asarray(decode(small, emit_u8=True))
    )


def test_native53_matches_numpy(monkeypatch):
    """The C++ whole-plane 5/3 unlift (clamp groups = tiles) must equal the
    per-tile numpy loop exactly, multi-tile and multi-pass."""
    from wicca_tpu.native.rice import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    x = photo(1100, 1300, seed=70)
    s = _host(encode(x, levels=4, wavelet="legall5.3"))
    got_native = host_decode.host_decode(s)
    monkeypatch.setenv("WICCA_TPU_NO_NATIVE_IDWT", "1")
    got_numpy = host_decode.host_decode(s)
    monkeypatch.delenv("WICCA_TPU_NO_NATIVE_IDWT")
    np.testing.assert_array_equal(got_native, got_numpy)
    np.testing.assert_array_equal(got_native, x)


def test_unsupported_streams_raise():
    x = photo(256, 256, seed=18)
    s = _host(encode(x, levels=2, wavelet="bior4.4"))  # tiled float wavelet
    assert not host_decode.supported(s)
    with pytest.raises(ValueError):
        host_decode.host_decode(s)


def test_native_matches_numpy(monkeypatch):
    """The C++ idwt kernels must reproduce the numpy mirror bit-for-bit
    (same contract as the PACK1 kernels)."""
    from wicca_tpu.native.rice import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    for wavelet, spec in (("haar", QuantSpec(base_step=1.5)), ("haar_int", None)):
        x = photo(250, 318, seed=21)
        kw = {"spec": spec} if spec else {}
        s = _host(encode(x, levels=5, wavelet=wavelet, **kw))
        got_native = host_decode.host_decode(s)
        monkeypatch.setenv("WICCA_TPU_NO_NATIVE_IDWT", "1")
        got_numpy = host_decode.host_decode(s)
        monkeypatch.delenv("WICCA_TPU_NO_NATIVE_IDWT")
        np.testing.assert_array_equal(got_native, got_numpy)


def test_decode_folder_host_path_bit_identical(tmp_path):
    """decode_folder(path='host') must write byte-identical images to the
    device path, and report the route in its metrics."""
    import cv2

    from wicca_tpu.codec.batch import decode_folder, encode_folder

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"im{i}.png"), np.moveaxis(photo(96, 128, seed=30 + i), 0, -1)[..., ::-1])
    wct = tmp_path / "wct"
    encode_folder(src, wct, levels=3, spec=QuantSpec(base_step=1.0))
    out_dev = tmp_path / "dev"
    out_host = tmp_path / "host"
    m_dev = decode_folder(wct, out_dev, path="device")
    m_host = decode_folder(wct, out_host, path="host")
    assert m_dev["device_decoded"] == 3 and m_dev["host_decoded"] == 0
    assert m_host["host_decoded"] == 3 and m_host["device_decoded"] == 0
    for i in range(3):
        a = (out_dev / f"im{i}.png").read_bytes()
        b = (out_host / f"im{i}.png").read_bytes()
        assert a == b


def test_host_decode_at_level_bit_exact():
    """Host progressive decode must equal decode_at_level for every depth
    (previews never upload a coefficient on the host route)."""
    from wicca_tpu.codec.pipeline import decode_at_level

    x = photo(250, 318, seed=50)
    for wavelet, kw in (("haar", {"spec": QuantSpec(base_step=1.0)}), ("haar_int", {})):
        s = _host(encode(x, levels=5, wavelet=wavelet, **kw))
        for tl in (0, 1, 2, 5):
            got = host_decode.host_decode(s, target_level=tl)
            want = np.asarray(decode_at_level(s, tl, emit_u8=True))
            np.testing.assert_array_equal(got, want)
    # truncated stream previews widen band_div exactly like the device
    small = rd.truncate(_host(encode(x, levels=3, wavelet="haar_int")), target_bpp=2.0)
    for tl in (1, 2):
        np.testing.assert_array_equal(
            host_decode.host_decode(small, target_level=tl),
            np.asarray(decode_at_level(small, tl, emit_u8=True)),
        )


def test_decode_folder_at_level_host_matches_device(tmp_path):
    import cv2

    from wicca_tpu.codec.batch import decode_folder, encode_folder

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"im{i}.png"), np.moveaxis(photo(128, 160, seed=60 + i), 0, -1)[..., ::-1])
    wct = tmp_path / "wct"
    encode_folder(src, wct, levels=3, spec=QuantSpec(base_step=1.0))
    m_host = decode_folder(wct, tmp_path / "th_host", at_level=2, path="host")
    m_dev = decode_folder(wct, tmp_path / "th_dev", at_level=2, path="device")
    assert m_host["host_decoded"] == 2 and m_dev["device_decoded"] == 2
    for i in range(2):
        a = (tmp_path / "th_host" / f"im{i}.png").read_bytes()
        b = (tmp_path / "th_dev" / f"im{i}.png").read_bytes()
        assert a == b


def test_decode_route_cost_model(monkeypatch):
    """auto routing: slow measured link -> host; fast link / CPU -> device."""
    import math

    from wicca_tpu.codec import batch, transfer

    x = photo(768, 1024, seed=40)
    s = _host(encode(x, levels=3, spec=QuantSpec(base_step=1.0)))
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: 40e6)
    assert batch._decode_route(s, 0, "auto") == "host"
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: 20e9)
    assert batch._decode_route(s, 0, "auto") == "device"
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: math.inf)
    assert batch._decode_route(s, 0, "auto") == "device"
    # progressive previews also route host on a slow link (the coefficient
    # upload dominates, not the shrunken D2H); forcing always wins
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: 40e6)
    assert batch._decode_route(s, 1, "auto") == "host"
    assert batch._decode_route(s, 0, "device") == "device"
    # ict streams: auto stays deterministic (device); host only when forced
    s_ict = _host(encode(photo(768, 1024, seed=41), levels=3,
                         spec=QuantSpec(base_step=1.0), color="ict"))
    assert batch._decode_route(s_ict, 0, "auto") == "device"
    assert batch._decode_route(s_ict, 0, "host") == "host"


def test_grayscale_and_alpha():
    g = photo(128, 160, seed=19, channels=1)
    s = _host(encode(g, levels=3, spec=QuantSpec(base_step=1.0)))
    np.testing.assert_array_equal(host_decode.host_decode(s), np.asarray(decode(s, emit_u8=True)))
    rgba = photo(128, 160, seed=20, channels=4)
    s4 = _host(encode(rgba, levels=2, wavelet="haar_int", color="rct"))
    np.testing.assert_array_equal(host_decode.host_decode(s4), np.asarray(decode(s4, emit_u8=True)))


def test_supported_gated_on_transposed_detail_storage(monkeypatch):
    """The host mirrors assume (h, w)-oriented detail bands; if the fused
    kernels re-enable transposed pass-local storage (_T_LVLS > 0), haar
    streams must fall back to the device path instead of mis-orienting
    bands (CLAUDE.md invariant: all consumers honor detail_is_transposed)."""
    from wicca_tpu.ops import dwt_pallas

    x = photo(64, 96, seed=50)
    s = _host(encode(x, levels=2, spec=QuantSpec(base_step=1.0)))
    assert host_decode.supported(s)
    monkeypatch.setattr(dwt_pallas, "_T_LVLS", 2)
    assert not host_decode.supported(s)
