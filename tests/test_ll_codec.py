"""WCT10 LL-plane coding (serialize ll_codec=): the raw float32 LL is a
rate floor at shallow depths (levels=3 -> 1.5 bpp of LL alone); 'rice'
stores integer LLs losslessly, 'quant' midtread-quantizes float LLs.
Default 'raw' must stay byte-for-byte what WCT4..9 wrote."""

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import decode, encode, with_metadata
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def photo(h=192, w=256, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for octave, amp in ((4, 18.0), (16, 30.0), (64, 42.0)):
        n = rng.normal(0, 1, (h // octave + 2, w // octave + 2, 3)).astype(np.float32)
        img += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.moveaxis(np.clip(img + 128, 0, 255).astype(np.uint8), -1, 0)


def test_default_raw_layout_unchanged():
    s = encode(photo(), levels=3, spec=QuantSpec(base_step=1.0))
    assert C.serialize(s) == C.serialize(s, ll_codec="raw")
    assert C.serialize(s)[:4] == b"WCT4"


def test_quant_ll_float_stream_smaller_and_near_lossless():
    x = photo(seed=1)
    s = encode(x, levels=3, spec=QuantSpec(base_step=1.0))
    raw = C.serialize(s)
    coded = C.serialize(s, ll_codec="quant", ll_step=0.125)
    assert coded[:4] == b"WC10"
    assert len(coded) < len(raw) - 1000  # the LL floor actually shrank
    back = C.deserialize(coded)
    # LL within half a quantization step everywhere
    assert np.abs(np.asarray(back.ll) - np.asarray(s.ll)).max() <= 0.0626
    rec = np.asarray(decode(back))
    ref = np.asarray(decode(s))
    assert float(psnr(rec, ref)) > 55  # sub-visible vs the raw-LL decode
    info = C.inspect(coded)
    assert info["version"] == 10 and info["ll_mode"] == "quant"
    assert info["ll_step"] == pytest.approx(0.125)
    assert info["integrity"] == "ok"


def test_rice_ll_integer_stream_lossless_and_smaller():
    x = photo(seed=2)
    s = encode(x, levels=3, wavelet="legall5.3", color="rct")
    raw = C.serialize(s)
    coded = C.serialize(s, ll_codec="rice")
    assert len(coded) < len(raw)
    back = C.deserialize(coded)
    np.testing.assert_array_equal(np.asarray(back.ll), np.asarray(s.ll))
    np.testing.assert_array_equal(np.asarray(decode(back, emit_u8=True)), x)  # lossless
    assert C.inspect(coded)["ll_mode"] == "rice"


def test_ll_codec_validation():
    x = photo(seed=3)
    s_f = encode(x, levels=2, spec=QuantSpec(base_step=1.0))
    s_i = encode(x, levels=2, wavelet="haar_int")
    with pytest.raises(ValueError, match="quant"):
        C.serialize(s_f, ll_codec="rice")
    with pytest.raises(ValueError, match="rice"):
        C.serialize(s_i, ll_codec="quant")
    with pytest.raises(ValueError, match="ll_codec"):
        C.serialize(s_f, ll_codec="zip")


def test_ll_codec_composes_with_layers_metadata_and_divisors(tmp_path):
    from wicca_tpu.codec import rd
    from wicca_tpu.codec.transfer import fetch_stream

    x = photo(seed=4)
    s = rd.truncate(
        fetch_stream(encode(x, levels=3, spec=QuantSpec(base_step=0.5)), force=False),
        target_bpp=2.5,
    )
    s = with_metadata(s, {"k": b"v"})
    p = tmp_path / "a.wct"
    C.save(s, str(p), quality_layers=2, ll_codec="quant", ll_step=0.25)
    back = C.load(str(p))
    assert dict(back.metadata) == {"k": b"v"}
    assert back.band_div == s.band_div
    assert np.abs(np.asarray(back.ll) - np.asarray(s.ll)).max() <= 0.1251
    trunc = C.load(str(p), max_layers=1)
    assert trunc.spec.base_step == pytest.approx(s.spec.base_step * 2)
    info = C.inspect(str(p))
    assert info["version"] == 10 and info["quality_layers"] == 2


def test_ll_section_protected_by_trailer():
    x = photo(seed=5)
    s = encode(x, levels=2, spec=QuantSpec(base_step=1.0))
    data = bytearray(C.serialize(s, ll_codec="quant"))
    # corrupt a byte inside the LL blob (unit 0)
    data[80] ^= 0xFF
    assert C.inspect(bytes(data))["integrity"] == "corrupt"
    with pytest.raises(ValueError, match="corrupt"):
        C.deserialize(bytes(data))


def test_cli_ll_codec(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.cli import main

    src = tmp_path / "im.png"
    cv2.imwrite(str(src), np.moveaxis(photo(seed=6), 0, -1)[..., ::-1])
    wq = tmp_path / "q.wct"
    assert main(["encode", str(src), str(wq), "--levels", "3",
                 "--ll-codec", "quant", "--ll-step", "0.25"]) == 0
    assert wq.read_bytes()[:4] == b"WC10"
    assert main(["decode", str(wq), str(tmp_path / "rec.png")]) == 0
    wr = tmp_path / "r.wct"
    assert main(["encode", str(src), str(wr), "--levels", "3",
                 "--wavelet", "legall5.3", "--color", "rct",
                 "--ll-codec", "rice"]) == 0
    a = cv2.imread(str(src))
    assert main(["decode", str(wr), str(tmp_path / "rl.png")]) == 0
    np.testing.assert_array_equal(cv2.imread(str(tmp_path / "rl.png")), a)


def test_transcode_and_batch_ll_codec(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.codec.batch import decode_folder, encode_folder
    from wicca_tpu.codec.transcode import transcode

    src = tmp_path / "in"
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"f{i}.png"), np.moveaxis(photo(seed=10 + i), 0, -1)[..., ::-1])
    out = tmp_path / "wct"
    m = encode_folder(src, out, levels=3, wavelet="legall5.3", color="rct",
                      ll_codec="rice")
    for p in sorted(out.glob("*.wct")):
        assert p.read_bytes()[:4] == b"WC10"
    rec = tmp_path / "rec"
    decode_folder(out, rec)
    for i in range(2):  # lossless end to end through the coded LL
        a = cv2.imread(str(src / f"f{i}.png"))
        b = cv2.imread(str(rec / f"f{i}.png"))
        np.testing.assert_array_equal(a, b)

    # transcode: retro-pack the LL of an existing raw-LL archive losslessly
    raw_path = tmp_path / "raw.wct"
    from wicca_tpu.codec.container import load, save

    s = encode(photo(seed=12), levels=3, wavelet="legall5.3")
    save(s, str(raw_path))
    m = transcode(raw_path, tmp_path / "packed.wct", ll_codec="rice")
    assert m["bytes_out"] < m["bytes_in"]
    back = load(str(tmp_path / "packed.wct"))
    np.testing.assert_array_equal(np.asarray(back.ll), np.asarray(s.ll))
