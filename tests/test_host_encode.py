"""Host encode path (codec/host_encode.py): BIT-IDENTICAL CodeStreams to
the device encode — every plane equal AND the serialized container bytes
equal — plus cost-model routing in encode_folder."""

import numpy as np
import pytest

from wicca_tpu.codec import host_encode
from wicca_tpu.codec.container import serialize
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.codec.transfer import fetch_stream
from wicca_tpu.core.quant import QuantSpec

from tests.test_host_decode import photo


def _host(stream):
    return fetch_stream(stream, force=False)


@pytest.mark.parametrize("levels", [1, 3, 5])
@pytest.mark.parametrize("shape", [(256, 320), (250, 318)])
@pytest.mark.parametrize("step", [1.0, 0.5, 4.0])
def test_bit_identical_streams(levels, shape, step):
    x = photo(*shape, seed=levels)
    spec = QuantSpec(base_step=step)
    want = _host(encode(x, levels=levels, spec=spec))
    got = host_encode.host_encode(x, levels=levels, spec=spec)
    np.testing.assert_array_equal(np.asarray(got.ll), np.asarray(want.ll))
    for (a_bands, b_bands) in zip(got.details, want.details):
        for a, b in zip(a_bands, b_bands):
            assert np.asarray(a).dtype == np.asarray(b).dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert serialize(got) == serialize(want)


def test_native_matches_numpy(monkeypatch):
    from wicca_tpu.native.rice import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    x = photo(250, 318, seed=9)
    a = host_encode.host_encode(x, levels=4, spec=QuantSpec(base_step=1.5))
    monkeypatch.setenv("WICCA_TPU_NO_NATIVE_IDWT", "1")
    b = host_encode.host_encode(x, levels=4, spec=QuantSpec(base_step=1.5))
    monkeypatch.delenv("WICCA_TPU_NO_NATIVE_IDWT")
    assert serialize(a) == serialize(b)


def test_pad_modes_and_hh_gain():
    x = photo(100, 130, seed=10)
    for mode, const in (("replicate", 0), ("constant", 7), ("reflect", 0)):
        spec = QuantSpec(base_step=1.0, hh_gain=2.0)
        want = _host(encode(x, levels=3, spec=spec, mode=mode, constant=const))
        got = host_encode.host_encode(x, levels=3, spec=spec, mode=mode, constant=const)
        assert serialize(got) == serialize(want)


def test_roundtrip_through_decode():
    x = photo(192, 256, seed=11)
    s = host_encode.host_encode(x, levels=4, spec=QuantSpec(base_step=1.0))
    rec = np.asarray(decode(s, emit_u8=True))
    from wicca_tpu.core.metrics import psnr

    assert float(psnr(rec.astype(np.float32), x.astype(np.float32))) > 40


def test_supported_gate():
    x = photo(64, 64, seed=12)
    assert host_encode.supported_encode(x, "haar", "none", 8)
    assert not host_encode.supported_encode(x, "haar", "ict", 8)
    assert not host_encode.supported_encode(x, "bior4.4", "none", 8)
    assert not host_encode.supported_encode(x, "haar", "none", 12)
    assert not host_encode.supported_encode(x.astype(np.float32), "haar", "none", 8)


def test_encode_folder_host_path_bit_identical(tmp_path):
    import cv2

    from wicca_tpu.codec.batch import decode_folder, encode_folder

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"im{i}.png"), np.moveaxis(photo(96, 128, seed=20 + i), 0, -1)[..., ::-1])
    out_dev = tmp_path / "dev"
    out_host = tmp_path / "host"
    m_dev = encode_folder(src, out_dev, levels=3, spec=QuantSpec(base_step=1.0), path="device")
    m_host = encode_folder(src, out_host, levels=3, spec=QuantSpec(base_step=1.0), path="host")
    assert m_dev["device_encoded"] == 3 and m_host["host_encoded"] == 3
    for i in range(3):
        assert (out_dev / f"im{i}.wct").read_bytes() == (out_host / f"im{i}.wct").read_bytes()
    # host-encoded .wct decodes normally
    decode_folder(out_host, tmp_path / "rec", path="host")
    assert len(list((tmp_path / "rec").glob("*.png"))) == 3
