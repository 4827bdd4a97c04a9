"""Container metadata box (WCT8): application key/value data carried by the
stream — the JPEG2000 XML/UUID-box analog (EXIF dumps, ICC profiles, notes).
The reference has no persistence format (SURVEY.md §5); this pins that
metadata survives serialize/load/transcode, never perturbs the image data,
and is protected by the integrity trailer."""

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import decode, encode, with_metadata
from wicca_tpu.core.quant import QuantSpec


def _img(seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(3, 96, 128), dtype=np.uint8)


def _stream(**kw):
    return encode(_img(), levels=3, spec=QuantSpec(base_step=1.0), **kw)


META = {"exif": b"\x49\x49\x2a\x00fake-tiff-block", "note": "hello éé", "icc": b"\x00" * 300}


def test_metadata_roundtrip_and_magic():
    s = with_metadata(_stream(), META)
    data = C.serialize(s)
    assert data[:4] == b"WCT8"
    back = C.deserialize(data)
    got = dict(back.metadata)
    assert got["exif"] == META["exif"]
    assert got["note"].decode("utf-8") == META["note"]  # str stored utf-8
    assert got["icc"] == META["icc"]
    # image payload identical to the metadata-free stream
    plain = C.deserialize(C.serialize(_stream()))
    assert np.array_equal(np.asarray(back.ll), np.asarray(plain.ll))
    for a, b in zip(back.details, plain.details):
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
    assert np.array_equal(np.asarray(decode(back, emit_u8=True)),
                          np.asarray(decode(plain, emit_u8=True)))


def test_metadata_with_quality_layers_and_truncation():
    s = with_metadata(_stream(), {"k": b"v"})
    data = C.serialize(s, quality_layers=3)
    assert data[:4] == b"WCT8"
    back = C.deserialize(data, max_layers=1)
    assert dict(back.metadata) == {"k": b"v"}
    assert back.spec.base_step == pytest.approx(4.0)  # 2 missing layers


def test_metadata_composes_with_hh_gain_and_hidepth():
    sw = encode(_img(), levels=2, spec=QuantSpec(base_step=1.0, hh_gain=2.0))
    data = C.serialize(with_metadata(sw, {"a": b"1"}))
    back = C.deserialize(data)
    assert back.spec.hh_gain == pytest.approx(2.0)
    assert dict(back.metadata) == {"a": b"1"}

    x16 = np.random.default_rng(1).integers(0, 4096, (1, 64, 64), dtype=np.uint16)
    s16 = with_metadata(encode(x16, levels=2, wavelet="legall5.3", bit_depth=12), {"d": b"12"})
    b16 = C.deserialize(C.serialize(s16))
    assert b16.bit_depth == 12 and dict(b16.metadata) == {"d": b"12"}
    assert np.array_equal(np.asarray(decode(b16, emit_u8=True)), x16)  # still lossless


def test_transcode_preserves_metadata(tmp_path):
    from wicca_tpu.codec.transcode import transcode

    src, dst = tmp_path / "a.wct", tmp_path / "b.wct"
    C.save(with_metadata(_stream(), {"who": b"me"}), str(src), quality_layers=2)
    transcode(src, dst, codec="rice", drop_levels=1)
    back = C.load(str(dst))
    assert dict(back.metadata) == {"who": b"me"}
    assert back.levels == 2


def test_inspect_reports_metadata_and_trailer_protects_it():
    s = with_metadata(_stream(), META)
    data = C.serialize(s)
    info = C.inspect(data)
    assert info["version"] == 8
    assert info["metadata"] == {"exif": len(META["exif"]), "note": len(META["note"].encode()), "icc": 300}
    # metadata is inside unit 0: corrupting it fails header verification
    bad = bytearray(data)
    pos = data.index(b"fake-tiff-block")
    bad[pos] ^= 0xFF
    assert C.inspect(bytes(bad))["integrity"] == "corrupt"
    with pytest.raises(ValueError, match="corrupt"):
        C.deserialize(bytes(bad))


def test_corrupt_metadata_block_is_a_valueerror_not_struct_error():
    import struct

    s = with_metadata(_stream(), {"k": b"v"})
    data = bytearray(C.serialize(s))
    n_items_off = (4 + struct.calcsize("<BBBIIffII") + struct.calcsize("<Bf")
                   + 1 + 4 + 4)
    struct.pack_into("<H", data, n_items_off, 0xFFFF)  # claim 65535 items
    with pytest.raises(ValueError, match="metadata"):
        C.deserialize(bytes(data))
    info = C.inspect(bytes(data))  # dump degrades instead of raising
    assert info["metadata_error"] is not None
    assert info["integrity"] == "corrupt"


def test_metadata_validation():
    with pytest.raises(ValueError, match="key too long"):
        C.serialize(with_metadata(_stream(), {"k" * 70000: b"v"}))
    # empty dict clears: serializes back to the ordinary magic
    s = with_metadata(with_metadata(_stream(), {"k": b"v"}), {})
    assert C.serialize(s)[:4] == b"WCT4"


def test_encode_folder_metadata(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.codec.batch import encode_folder

    src = tmp_path / "in"
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"f{i}.png"),
                    np.random.default_rng(i).integers(0, 256, (64, 64, 3), dtype=np.uint8))
    out = tmp_path / "out"
    encode_folder(src, out, levels=2, metadata={"session": "night-3", "rig": b"\x07"})
    for p in sorted(out.glob("*.wct")):
        back = C.load(str(p))
        assert dict(back.metadata) == {"session": b"night-3", "rig": b"\x07"}


def test_cli_meta_flag_and_info(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.cli import main

    src = tmp_path / "im.png"
    cv2.imwrite(str(src), np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8))
    wct = tmp_path / "im.wct"
    assert main(["encode", str(src), str(wct), "--levels", "2",
                 "--meta", "camera=test-rig", "--meta", "scene=unit"]) == 0
    assert main(["info", str(wct)]) == 0
    out = capsys.readouterr().out
    assert "metadata: camera (8B), scene (4B)" in out
    assert "WCT8" in out
    assert main(["encode", str(src), str(wct), "--meta", "novalue"]) == 2
    capsys.readouterr()
    assert main(["encode", str(src), str(wct), "--levels", "2", "--meta", "a=1"]) == 0
    assert main(["decode", str(wct), str(tmp_path / "rec.png")]) == 0
    assert "[metadata: a]" in capsys.readouterr().out


def test_metadata_does_not_enter_the_jit_cache_key():
    """ADVICE r3 (medium): metadata must be stripped before the jitted decode
    core — distinct per-file metadata must NOT retrace/recompile decode."""
    from wicca_tpu.codec import pipeline as P

    base = _stream()
    a = with_metadata(base, {"file": b"one"})
    b = with_metadata(base, {"file": b"two", "extra": b"x" * 1000})
    decode(base, emit_u8=True)
    n0 = P._decode_jit._cache_size()
    np.testing.assert_array_equal(
        np.asarray(decode(a, emit_u8=True)), np.asarray(decode(b, emit_u8=True))
    )
    assert P._decode_jit._cache_size() == n0  # no new traces for metadata
    from wicca_tpu.codec.pipeline import decode_at_level

    decode_at_level(base, 1)
    n1 = P._decode_at_level_jit._cache_size()
    decode_at_level(a, 1)
    decode_at_level(b, 1)
    assert P._decode_at_level_jit._cache_size() == n1


def test_inspect_corrupt_metadata_reports_zero_complete_layers():
    """ADVICE r3: a layered stream whose metadata block is corrupt must not
    claim all layers complete (the parse never reached them)."""
    import struct

    s = with_metadata(_stream(), {"k": b"v"})
    data = bytearray(C.serialize(s, quality_layers=3))
    n_items_off = (4 + struct.calcsize("<BBBIIffII") + struct.calcsize("<Bf")
                   + 1 + 4 + 4)
    struct.pack_into("<H", data, n_items_off, 0xFFFF)
    info = C.inspect(bytes(data))
    assert info["metadata_error"] is not None
    assert info["complete_layers"] == 0
    assert info["planes"] == []


def test_cli_info_exit_1_on_corrupt_metadata(tmp_path, capsys):
    """ADVICE r3: `info` must exit nonzero when the metadata box is corrupt,
    even without a CRC pass (--no-verify)."""
    import struct

    from wicca_tpu.cli import main

    s = with_metadata(_stream(), {"k": b"v"})
    data = bytearray(C.serialize(s))
    n_items_off = (4 + struct.calcsize("<BBBIIffII") + struct.calcsize("<Bf")
                   + 1 + 4 + 4)
    struct.pack_into("<H", data, n_items_off, 0xFFFF)
    bad = tmp_path / "bad.wct"
    bad.write_bytes(bytes(data))
    assert main(["info", str(bad), "--no-verify"]) == 1
    assert "metadata: CORRUPT" in capsys.readouterr().out
    assert main(["info", "--json", str(bad), "--no-verify"]) == 1
