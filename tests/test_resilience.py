"""Container integrity trailer: CRC-verified sections, corrupt-plane
containment (on_error='zero'), and backward/forward compatibility.

The reference has no persistence format at all (SURVEY.md §5 'Checkpoint /
resume': final CSVs only); error resilience here follows JPEG2000's
philosophy (resync + graceful degradation) adapted to the .wct layout.
"""

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _stream(levels=3, seed=0, **kw):
    return encode(_img((3, 96, 128), seed=seed), levels=levels, spec=QuantSpec(base_step=1.0), **kw)


def _units(data):
    """(unit spans via the trailer) -> list of (start, end) per plane section."""
    n = C._scan_trailer_units(data)
    assert n is not None, "no trailer found"
    tr = C._read_trailer(data, n)
    return [(tr[i][0], tr[i + 1][0]) for i in range(n - 1)]


def test_checksummed_roundtrip_identity():
    s = _stream()
    data = C.serialize(s)
    back = C.deserialize(data)
    assert np.array_equal(np.asarray(back.ll), np.asarray(s.ll))
    for a, b in zip(back.details, s.details):
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_no_checksums_is_smaller_and_loads():
    s = _stream()
    with_t = C.serialize(s, checksums=True)
    without = C.serialize(s, checksums=False)
    assert len(without) < len(with_t)
    assert len(with_t) - len(without) == 13 + 12 * (1 + s.levels * 3)
    back = C.deserialize(without)  # no trailer -> verification skipped
    assert np.array_equal(np.asarray(back.ll), np.asarray(s.ll))


def test_corrupt_blob_raises_by_default_and_zeroes_on_request():
    s = _stream()
    data = bytearray(C.serialize(s))
    spans = _units(bytes(data))
    # flip a payload byte in the middle of plane 2's entropy blob
    start, end = spans[2]
    pos = (start + end) // 2
    data[pos] ^= 0xFF
    with pytest.raises(ValueError, match="plane 2"):
        C.deserialize(bytes(data))
    back = C.deserialize(bytes(data), on_error="zero")
    # the corrupt band decodes as zeros; everything else survives
    assert not np.any(np.asarray(back.details[0][2]))
    assert np.array_equal(np.asarray(back.details[0][0]), np.asarray(s.details[0][0]))
    rec = np.asarray(decode(back))
    ref = np.asarray(decode(s))
    # one zeroed finest-level band: clearly degraded but still an image
    assert float(psnr(rec, ref)) > 15.0


def test_corrupt_length_field_is_contained():
    """Corruption of a section's OWN length field must not desync the rest —
    unit offsets come from the trailer, not from the damaged meta."""
    s = _stream()
    data = bytearray(C.serialize(s))
    spans = _units(bytes(data))
    start, _ = spans[4]
    data[start + 10] ^= 0x7F  # nbytes field ("<BBIII": codec, dtype, sh, sw, nbytes)
    back = C.deserialize(bytes(data), on_error="zero")
    assert not np.any(np.asarray(back.details[1][1]))
    for i, (a, b) in enumerate(zip(back.details[0], s.details[0])):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"plane {i} desynced"


def test_corrupt_header_or_ll_always_raises():
    s = _stream()
    data = bytearray(C.serialize(s))
    data[40] ^= 0x01  # inside the LL plane bytes
    with pytest.raises(ValueError, match="header/LL"):
        C.deserialize(bytes(data), on_error="zero")


def test_corrupt_levels_byte_detected_by_scan():
    s = _stream(levels=3)
    data = bytearray(C.serialize(s))
    data[4 + 1] = 2  # levels byte -> header-implied unit count changes
    with pytest.raises(ValueError, match="header corrupt"):
        C.deserialize(bytes(data))


def test_whole_level_corrupt_geometry_unrecoverable():
    s = _stream()
    data = bytearray(C.serialize(s))
    spans = _units(bytes(data))
    for i in range(3, 6):  # all three level-2 bands
        st, en = spans[i]
        data[(st + en) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="unrecoverable"):
        C.deserialize(bytes(data), on_error="zero")


def test_layered_corrupt_refinement_keeps_prefix():
    s = _stream()
    data = bytearray(C.serialize(s, quality_layers=3))
    spans = _units(bytes(data))
    n_planes = s.levels * 3
    # corrupt plane 0's layer-1 refinement: its layer-0 base must survive,
    # i.e. the plane equals the codes right-shifted (sign-magnitude) by 2
    st, en = spans[1 * n_planes + 0]
    data[(st + en) // 2] ^= 0xFF
    back = C.deserialize(bytes(data), on_error="zero")
    full = np.asarray(s.details[0][0]).astype(np.int32)
    got = np.asarray(back.details[0][0]).astype(np.int32)
    # midpoint-widened 1-layer prefix: |got - full| < 2**2
    assert np.all(np.abs(got - full) < 4)
    # an untouched plane reproduces exactly
    assert np.array_equal(np.asarray(back.details[0][1]), np.asarray(s.details[0][1]))


def test_layered_truncated_prefix_still_decodes():
    s = _stream()
    data = C.serialize(s, quality_layers=3)  # checksums on
    spans = _units(data)
    n_planes = s.levels * 3
    cut = spans[2 * n_planes - 1][1]  # end of layer 1 (two complete layers)
    back = C.deserialize(data[:cut], allow_truncated=True)
    ref = C.deserialize(C.serialize(s, quality_layers=3), max_layers=2)
    assert np.array_equal(np.asarray(back.details[1][1]), np.asarray(ref.details[1][1]))


def test_lossless_stream_corruption_zeroing():
    s = _stream(wavelet="legall5.3")
    x = _img((3, 96, 128), seed=0)
    data = bytearray(C.serialize(s))
    spans = _units(bytes(data))
    st, en = spans[0]
    data[(st + en) // 2] ^= 0xFF
    back = C.deserialize(bytes(data), on_error="zero")
    rec = np.asarray(decode(back, emit_u8=True))
    # no longer bit-exact (a band was dropped) but still recognizably the image
    assert rec.shape == x.shape
    assert float(psnr(rec, x)) > 15.0


def test_save_load_on_error_passthrough(tmp_path):
    s = _stream()
    p = tmp_path / "x.wct"
    C.save(s, str(p))
    data = bytearray(p.read_bytes())
    spans = _units(bytes(data))
    st, en = spans[1]
    data[(st + en) // 2] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        C.load(str(p))
    back = C.load(str(p), on_error="zero")
    assert not np.any(np.asarray(back.details[0][1]))
