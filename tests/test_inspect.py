"""Container inspector (`codec.container.inspect` + CLI `info`): a
structural dump with CRC audit that never entropy-decodes — the opj_dump
analog for .wct streams. The reference has no persistence format (SURVEY.md
§5), so this surface is new; the tests pin that the inspector's report
agrees with what serialize wrote and with what deserialize would do."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import encode
from wicca_tpu.core.quant import QuantSpec


def _img(shape=(3, 96, 128), seed=0, dtype=np.uint8):
    hi = 256 if dtype == np.uint8 else 4096
    return np.random.default_rng(seed).integers(0, hi, size=shape, dtype=dtype)


def _stream(levels=3, **kw):
    return encode(_img(), levels=levels, spec=QuantSpec(base_step=1.0), **kw)


def test_inspect_flat_stream_matches_encode():
    s = _stream(levels=3)
    data = C.serialize(s)
    info = C.inspect(data)
    assert info["version"] == 4
    assert info["wavelet"] == "haar"
    assert info["levels"] == 3
    assert info["channels"] == 3
    assert info["orig_shape"] == (96, 128)
    assert info["quality_layers"] == 1 and info["complete_layers"] == 1
    assert info["layout"] == "tiled"
    assert info["checksummed"] and info["integrity"] == "ok"
    assert info["corrupt_sections"] == []
    assert len(info["planes"]) == 9
    assert [p["band"] for p in info["planes"][:3]] == ["lh", "hl", "hh"]
    assert info["planes"][0]["level"] == 1 and info["planes"][-1]["level"] == 3
    assert info["entropy_bytes"] == sum(p["nbytes"] for p in info["planes"])
    assert info["total_bytes"] == len(data)
    assert info["bpp"] == pytest.approx(8 * len(data) / (96 * 128))
    # raw-source ratio counts all channels at the stream bit depth
    assert info["compression_ratio"] == pytest.approx(3 * 96 * 128 / len(data))
    # plane geometry halves per level
    l1 = info["planes"][0]["shape"]
    l3 = info["planes"][-1]["shape"]
    assert l1 == (3, 48, 64) and l3 == (3, 12, 16)


def test_inspect_accepts_path_and_no_trailer(tmp_path):
    s = _stream()
    p = tmp_path / "x.wct"
    p.write_bytes(C.serialize(s, checksums=False))
    info = C.inspect(str(p))
    assert not info["checksummed"]
    assert info["integrity"] == "unverified"
    assert info["total_bytes"] == p.stat().st_size


def test_inspect_layered_stream():
    s = _stream()
    data = C.serialize(s, quality_layers=3)
    info = C.inspect(data)
    assert info["version"] == 5
    assert info["quality_layers"] == 3 and info["complete_layers"] == 3
    assert len(info["planes"]) == 27
    # layer 0 keeps the stored dtype; refinements are ternary int8
    assert all(p["dtype"] == "int8" for p in info["planes"] if p["layer"] > 0)
    assert {p["layer"] for p in info["planes"]} == {0, 1, 2}


def test_inspect_truncated_layered_prefix():
    s = _stream()
    data = C.serialize(s, quality_layers=3, checksums=False)
    # keep the header + directory + first-layer sections only: find the
    # prefix that deserialize accepts with allow_truncated
    cut = len(data) * 2 // 3
    info = C.inspect(data[:cut])
    assert info["complete_layers"] < 3
    assert len(info["planes"]) == 9 * info["complete_layers"]


def test_inspect_flags_exactly_the_sections_deserialize_rejects():
    s = _stream()
    data = bytearray(C.serialize(s))
    n = C._scan_trailer_units(bytes(data))
    tr = C._read_trailer(bytes(data), n)
    start, end = tr[3][0], tr[4][0]  # plane index 3 (unit 4)
    data[(start + end) // 2] ^= 0xFF
    info = C.inspect(bytes(data))
    assert info["integrity"] == "corrupt"
    assert info["corrupt_sections"] == ["section 4"]
    with pytest.raises(ValueError, match="corrupt"):
        C.deserialize(bytes(data))
    # and a clean stream round-trips the audit
    assert C.inspect(C.serialize(s))["integrity"] == "ok"


def test_inspect_corrupt_header_reported():
    s = _stream()
    data = bytearray(C.serialize(s))
    data[10] ^= 0x01  # inside the fixed header (unit 0)
    info = C.inspect(bytes(data), verify=True)
    assert info["integrity"] == "corrupt"
    assert "header/LL" in info["corrupt_sections"]


def test_inspect_wct7_visual_weighting_and_wct6_hidepth():
    s7 = encode(_img(), levels=2, spec=QuantSpec(base_step=1.0, hh_gain=2.0))
    i7 = C.inspect(C.serialize(s7))
    assert i7["version"] == 7 and i7["hh_gain"] == pytest.approx(2.0)

    s6 = encode(_img(dtype=np.uint16), levels=2, wavelet="legall5.3", bit_depth=12)
    i6 = C.inspect(C.serialize(s6))
    assert i6["version"] == 6 and i6["bit_depth"] == 12
    assert i6["wavelet"] == "legall5.3"
    assert i6["compression_ratio"] == pytest.approx(
        2 * 3 * 96 * 128 / i6["total_bytes"])


def test_inspect_rejects_non_wct():
    with pytest.raises(ValueError, match="not a WCT container"):
        C.inspect(b"JFIF" + b"\0" * 64)


def test_cli_info_human_json_and_exit_codes(tmp_path):
    s = _stream()
    good = tmp_path / "good.wct"
    good.write_bytes(C.serialize(s))
    bad = tmp_path / "bad.wct"
    raw = bytearray(C.serialize(s))
    n = C._scan_trailer_units(bytes(raw))
    tr = C._read_trailer(bytes(raw), n)
    raw[(tr[1][0] + tr[2][0]) // 2] ^= 0xFF
    bad.write_bytes(bytes(raw))

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "wicca_tpu", "info", str(good), "--planes"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "WCT4" in r.stdout and "integrity: ok" in r.stdout
    assert "L1 lh" in r.stdout

    r = subprocess.run(
        [sys.executable, "-m", "wicca_tpu", "info", "--json", str(good), str(bad)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 1  # one corrupt file -> audit failure
    lines = [json.loads(line) for line in r.stdout.splitlines()]
    assert lines[0]["integrity"] == "ok" and lines[1]["integrity"] == "corrupt"
    assert lines[0]["file"] == str(good)
