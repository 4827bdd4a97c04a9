"""RGBA (alpha-plane) support: the 4th component rides the wavelet path
untouched while color transforms rotate RGB only (JPEG2000 MCT semantics)."""

import numpy as np
import pytest

from wicca_tpu.codec.container import deserialize, serialize
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.core.quant import QuantSpec


@pytest.fixture(scope="module")
def rgba():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (4, 96, 160), np.uint8)
    img[3, :48] = 255  # realistic alpha: opaque block + gradient
    img[3, 48:] = np.linspace(0, 255, 48, dtype=np.uint8)[:, None]
    return img


def test_rgba_lossless_rct_bit_exact(rgba):
    stream = encode(rgba, levels=3, wavelet="legall5.3", color="rct")
    rec = np.asarray(decode(deserialize(serialize(stream)), emit_u8=True))
    np.testing.assert_array_equal(rec, rgba)


def test_rgba_lossy_ict_roundtrip(rgba):
    stream = encode(rgba.astype(np.float32), levels=3, spec=QuantSpec(base_step=1.0),
                    wavelet="bior4.4", color="ict", chroma_gain=2.0)
    rec = np.asarray(decode(deserialize(serialize(stream)), emit_u8=True))
    assert rec.shape == rgba.shape and rec.dtype == np.uint8
    err = np.abs(rec.astype(np.int32) - rgba.astype(np.int32))
    assert err.mean() < 4.0


def test_cli_keep_alpha_roundtrip(tmp_path):
    import cv2

    from wicca_tpu.cli import main

    rng = np.random.default_rng(1)
    rgba_hwc = rng.integers(0, 256, (64, 80, 4), np.uint8)
    src = tmp_path / "a.png"
    cv2.imwrite(str(src), cv2.cvtColor(rgba_hwc, cv2.COLOR_RGBA2BGRA))
    wct = tmp_path / "a.wct"
    out = tmp_path / "a_rec.png"
    assert main(["encode", str(src), str(wct), "--levels", "2",
                 "--wavelet", "legall5.3", "--color", "rct", "--keep-alpha"]) == 0
    assert main(["decode", str(wct), str(out)]) == 0
    rec = cv2.cvtColor(cv2.imread(str(out), cv2.IMREAD_UNCHANGED), cv2.COLOR_BGRA2RGBA)
    np.testing.assert_array_equal(rec, rgba_hwc)


def test_cli_default_still_drops_alpha(tmp_path):
    import cv2

    from wicca_tpu.cli import main

    rgba_hwc = np.random.default_rng(2).integers(0, 256, (32, 32, 4), np.uint8)
    src = tmp_path / "b.png"
    cv2.imwrite(str(src), cv2.cvtColor(rgba_hwc, cv2.COLOR_RGBA2BGRA))
    wct = tmp_path / "b.wct"
    out = tmp_path / "b_rec.png"
    assert main(["encode", str(src), str(wct), "--levels", "2", "--wavelet", "haar_int"]) == 0
    assert main(["decode", str(wct), str(out)]) == 0
    rec = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)
    assert rec.ndim == 3 and rec.shape[2] == 3
