"""Container back-compat: WCT1/WCT2 streams must keep decoding with the
transform geometry of their era (ADVICE r1: v1 wide-wavelet streams were
encoded with the *global* lifting transform; routing them through today's
tile-local Pallas inverse mis-decodes at every (512,1024) tile seam)."""

import struct

import jax.numpy as jnp
import numpy as np

from wicca_tpu.codec import decode, deserialize, encode, serialize
from wicca_tpu.codec.container import _MAGIC, _MAGIC_V1, _MAGIC_V2, _WAVELETS
from wicca_tpu.codec.pipeline import CodeStream
from wicca_tpu.core.lifting import dwt2_level_lifting
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.pad import pad_to_multiple
from wicca_tpu.core.quant import QuantSpec, quantize_deadzone
from wicca_tpu.native.rice import rice_encode


def _global_float_stream(img, levels, wavelet, spec):
    """Rebuild the WCT1-era encoder path: whole-image XLA lifting + deadzone
    int16 codes (the pipeline's pre-Pallas fallback for wide wavelets)."""
    x = pad_to_multiple(img, 1 << levels, mode="replicate").astype(jnp.float32)
    ll = x
    details = []
    for lvl in range(1, levels + 1):
        ll, lh, hl, hh = dwt2_level_lifting(ll, wavelet)
        step = spec.detail_step(lvl)
        details.append(tuple(quantize_deadzone(b, step, jnp.int16) for b in (lh, hl, hh)))
    return CodeStream(
        ll=ll, details=tuple(details), spec=spec, levels=levels,
        orig_shape=(img.shape[-2], img.shape[-1]), wavelet=wavelet, layout="global",
    )


def _serialize_v1(stream):
    """Emit the WCT1 wire format (no color fields, no layout byte)."""
    ll = np.asarray(stream.ll, dtype=np.float32)
    lead = ll.shape[0] if ll.ndim == 3 else 1
    out = bytearray()
    out += _MAGIC_V1
    out += struct.pack(
        "<BBBIIffII",
        _WAVELETS[stream.wavelet], stream.levels, lead,
        stream.orig_shape[0], stream.orig_shape[1],
        stream.spec.base_step, stream.spec.level_gain,
        ll.shape[-2], ll.shape[-1],
    )
    out += ll.tobytes()
    for bands in stream.details:
        for b in bands:
            plane = np.asarray(b)
            assert plane.dtype == np.int16
            data = rice_encode(plane)
            out += struct.pack("<BIII", 1, plane.shape[-2], plane.shape[-1], len(data))
            out += data
    return bytes(out)


def test_v1_global_db2_stream_decodes_with_global_inverse():
    # H=1024 spans two (512,1024) row tiles: the tiled inverse would be wrong
    # by ~150 gray levels around the seam (ADVICE r1, verified empirically)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1, 1024, 64), np.uint8)
    spec = QuantSpec(base_step=1.0)
    stream = _global_float_stream(img, levels=3, wavelet="db2", spec=spec)
    loaded = deserialize(_serialize_v1(stream))
    assert loaded.wavelet == "db2" and loaded.layout == "global"
    rec = np.asarray(decode(loaded))
    # whole image reconstructs cleanly — no tile-seam band
    assert float(psnr(rec, img.astype(np.float32))) > 40.0
    seam = rec[:, 500:524, :]
    assert np.abs(seam - img[:, 500:524, :].astype(np.float32)).max() < 8.0
    # and byte-identical to decoding the in-memory global stream directly
    np.testing.assert_array_equal(rec, np.asarray(decode(stream)))


def test_wct3_layout_byte_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (1, 96, 96), np.uint8)
    spec = QuantSpec(base_step=1.0)
    g = _global_float_stream(img, levels=2, wavelet="bior4.4", spec=spec)
    blob = serialize(g)
    assert blob[:4] == _MAGIC
    back = deserialize(blob)
    assert back.layout == "global"
    np.testing.assert_array_equal(np.asarray(decode(back)), np.asarray(decode(g)))

    t = encode(img, levels=2, spec=spec, wavelet="bior4.4")
    assert t.layout == "tiled"
    assert deserialize(serialize(t)).layout == "tiled"


def _serialize_legacy(stream, version):
    """Emit the WCT2/WCT3 wire formats (Rice planes, no per-plane codec byte;
    v2 additionally lacks the layout byte)."""
    from wicca_tpu.codec.container import _COLORS, _LAYOUTS

    ll = np.asarray(stream.ll, dtype=np.float32)
    lead = ll.shape[0] if ll.ndim == 3 else 1
    out = bytearray()
    out += {2: _MAGIC_V2, 3: b"WCT3"}[version]
    out += struct.pack(
        "<BBBIIffII",
        _WAVELETS[stream.wavelet], stream.levels, lead,
        stream.orig_shape[0], stream.orig_shape[1],
        stream.spec.base_step, stream.spec.level_gain,
        ll.shape[-2], ll.shape[-1],
    )
    out += struct.pack("<Bf", _COLORS[stream.color], stream.chroma_gain)
    if version >= 3:
        out += struct.pack("<B", _LAYOUTS[stream.layout])
    out += ll.tobytes()
    for bands in stream.details:
        for b in bands:
            plane = np.asarray(b)
            dt = {np.dtype(np.int8): 0, np.dtype(np.int16): 1}[plane.dtype]
            data = rice_encode(plane)
            out += struct.pack("<BIII", dt, plane.shape[-2], plane.shape[-1], len(data))
            out += data
    return bytes(out)


def test_wct2_streams_read_as_tiled():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (1, 80, 80), np.uint8)
    stream = encode(img, levels=2, wavelet="db2")
    back = deserialize(_serialize_legacy(stream, version=2))
    assert back.layout == "tiled"
    np.testing.assert_array_equal(np.asarray(decode(back)), np.asarray(decode(stream)))


def test_wct3_rice_only_planes_still_decode():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (3, 80, 80), np.uint8)
    stream = encode(img, levels=2, wavelet="haar")
    back = deserialize(_serialize_legacy(stream, version=3))
    assert back.layout == "tiled"
    np.testing.assert_array_equal(np.asarray(decode(back)), np.asarray(decode(stream)))


def test_wct4_codec_choices_roundtrip():
    from wicca_tpu.native.rice import native_available

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (3, 96, 96), np.uint8)
    stream = encode(img, levels=3, wavelet="haar")
    ref = np.asarray(decode(stream))
    sizes = {}
    for codec in ("rice", "rc", "auto"):
        if codec != "rice" and not native_available():
            continue
        blob = serialize(stream, codec=codec)
        assert blob[:4] == _MAGIC
        back = deserialize(blob)
        np.testing.assert_array_equal(np.asarray(decode(back)), ref)
        sizes[codec] = len(blob)
    if "rc" in sizes:
        # auto is decode-cost-aware: never larger than rice, and within the
        # _RC_MIN_WIN threshold of the unconditional-smaller rc stream
        from wicca_tpu.codec.container import _RC_MIN_WIN

        assert sizes["auto"] <= sizes["rice"]
        assert sizes["auto"] <= sizes["rc"] / (1.0 - _RC_MIN_WIN) + 64


def test_cdf53_alias_is_name_stable():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (3, 70, 70), np.uint8)
    stream = encode(img, levels=2, wavelet="cdf53")
    assert stream.wavelet == "legall5.3"
    back = deserialize(serialize(stream))
    assert back.wavelet == stream.wavelet
    np.testing.assert_array_equal(np.asarray(decode(back, emit_u8=True)), img)


# ---------------------------------------------------------------------------
# WCT5 quality layers (SNR scalability)
# ---------------------------------------------------------------------------


def _smooth_img(shape, seed):
    """Smooth-ish test image (pure noise defeats the deadzone quantizer)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (shape[0], shape[1] // 8, shape[2] // 8)).astype(np.float32)
    up = np.kron(base, np.ones((1, 8, 8), np.float32))
    up += rng.normal(0, 4, shape).astype(np.float32)
    return np.clip(up, 0, 255).astype(np.uint8)


def test_layered_full_roundtrip_exact():
    """All layers reproduce the CodeStream exactly (codes and spec)."""
    img = _smooth_img((3, 128, 160), 20)
    stream = encode(img, levels=3, spec=QuantSpec(base_step=1.0))
    blob = serialize(stream, quality_layers=4)
    assert blob[:4] == b"WCT5"
    back = deserialize(blob)
    assert back.spec.base_step == stream.spec.base_step
    for a, b in zip(back.details, stream.details):
        for p, q in zip(a, b):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
    np.testing.assert_array_equal(np.asarray(decode(back)), np.asarray(decode(stream)))


def test_layer_prefix_equals_coarser_step_encode():
    """max_layers=k decodes bit-identically to encoding at step*2**(L-k)."""
    img = _smooth_img((1, 128, 128), 21)
    stream = encode(img, levels=3, spec=QuantSpec(base_step=1.0))
    blob = serialize(stream, quality_layers=3)
    for k, mult in ((1, 4.0), (2, 2.0)):
        got = deserialize(blob, max_layers=k)
        assert got.spec.base_step == mult
        want = encode(img, levels=3, spec=QuantSpec(base_step=mult))
        for a, b in zip(got.details, want.details):
            for p, q in zip(a, b):
                np.testing.assert_array_equal(np.asarray(p), np.asarray(q).astype(np.asarray(p).dtype))
        np.testing.assert_array_equal(np.asarray(decode(got)), np.asarray(decode(want)))


def test_layered_lossless_stream():
    """Lossless 5/3 stream: full layers stay bit-exact; a prefix is a usable
    lossy preview."""
    img = _smooth_img((3, 96, 96), 22)
    stream = encode(img, levels=2, wavelet="legall5.3", color="rct")
    blob = serialize(stream, quality_layers=3)
    full = deserialize(blob)
    np.testing.assert_array_equal(np.asarray(decode(full, emit_u8=True)), img)
    prev = deserialize(blob, max_layers=1)
    rec = np.asarray(decode(prev, emit_u8=True))
    p = float(psnr(jnp.asarray(rec.astype(np.float32)), jnp.asarray(img.astype(np.float32))))
    assert p > 25.0, p


def test_truncated_prefix_decodes():
    img = _smooth_img((1, 128, 128), 23)
    stream = encode(img, levels=2, spec=QuantSpec(base_step=1.0))
    # checksums=False: the cut arithmetic below targets layer records, not the
    # integrity trailer (checksummed truncation is tests/test_resilience.py)
    blob = serialize(stream, quality_layers=3, checksums=False)
    one_layer = deserialize(blob, max_layers=1)
    # chop mid-way through layer 2's records: layer 1 must survive
    cut = len(blob) - (len(blob) - len(serialize(stream, quality_layers=1, checksums=False))) // 4
    got = deserialize(blob[:cut], allow_truncated=True)
    assert got.spec.base_step in (2.0, 4.0)  # 1 or 2 complete layers
    import pytest

    with pytest.raises(ValueError):
        deserialize(blob[:cut])
    # a prefix too short for even one layer still errors
    with pytest.raises(ValueError):
        deserialize(blob[: len(blob) // 20], allow_truncated=True)
    del one_layer


def test_layered_size_overhead_is_modest():
    img = _smooth_img((3, 256, 256), 24)
    stream = encode(img, levels=3, spec=QuantSpec(base_step=2.0))
    flat = len(serialize(stream))
    layered = len(serialize(stream, quality_layers=3))
    assert layered < flat * 1.6, (flat, layered)


def test_codec_auto_is_decode_cost_aware():
    """auto picks rice on dense/noisy planes where rc's size win is marginal
    (rc decodes ~5-6x slower), and rc on clustered deadzone planes where the
    win is real (>= _RC_MIN_WIN)."""
    from wicca_tpu.codec.container import _RC_MIN_WIN, _encode_plane
    from wicca_tpu.native.rice import native_available, rc_encode, rice_encode

    if not native_available():
        import pytest

        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(7)
    dense = rng.integers(-40, 41, (3, 256, 256)).astype(np.int8)
    cid_dense, _ = _encode_plane(dense, "auto")
    # sparse clustered plane: zero background with a few dense patches (the
    # spatial structure rc's neighbor contexts exploit)
    clustered = np.zeros((3, 256, 256), np.int8)
    clustered[:, 64:128, 64:192] = rng.integers(-6, 7, (3, 64, 128)).astype(np.int8)
    clustered[:, 180:220, 30:90] = rng.integers(-12, 13, (3, 40, 60)).astype(np.int8)
    cid_clu, _ = _encode_plane(clustered, "auto")
    rice_d, rc_d = len(rice_encode(dense)), len(rc_encode(dense))
    rice_c, rc_c = len(rice_encode(clustered)), len(rc_encode(clustered))
    # the fixture planes must actually straddle the threshold
    assert rc_d >= (1.0 - _RC_MIN_WIN) * rice_d
    assert rc_c < (1.0 - _RC_MIN_WIN) * rice_c
    assert cid_dense == 0 and cid_clu == 1


def test_codec_auto_probe_skips_rc_on_big_dense_planes(monkeypatch):
    """For planes above _PROBE_MIN_BYTES, auto codes every 8th row first and
    skips the expensive full rc pass when the probed win is clearly under
    the threshold — same codec choice, a fraction of the encode CPU."""
    import wicca_tpu.codec.container as C
    from wicca_tpu.native import rice as R

    if not R.native_available():
        import pytest

        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(21)
    dense = rng.integers(-40, 41, (3, 1024, 1024)).astype(np.int8)  # 3 MB
    calls = []
    real_rc = R.rc_encode
    monkeypatch.setattr(R, "rc_encode", lambda p: calls.append(p.nbytes) or real_rc(p))
    monkeypatch.setattr(C, "rc_encode", lambda p: calls.append(p.nbytes) or real_rc(p))
    cid, _ = C._encode_plane(dense, "auto")
    assert cid == 0
    # only the 1/8-row probe hit rc, never the full plane
    assert calls and max(calls) < dense.nbytes // 4
    # and the probe path agrees with the exact decision
    monkeypatch.setattr(C, "_PROBE_MIN_BYTES", 1 << 60)  # force exact compare
    cid_exact, _ = C._encode_plane(dense, "auto")
    assert cid_exact == cid


def test_codec_auto_probe_no_vertical_aliasing():
    """The probe samples CONTIGUOUS row bands, not strided rows: ::8
    sampling destroyed the vertical context rc exploits, under-probing its
    win >10x on 8-row-banded content and misrouting it to rice."""
    import wicca_tpu.codec.container as C
    from wicca_tpu.native import rice as R

    if not R.native_available():
        import pytest

        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(33)
    banded = np.repeat(rng.integers(-25, 26, (3, 128, 1024)).astype(np.int8), 8, axis=1)
    assert banded.nbytes >= C._PROBE_MIN_BYTES
    full_win = 1.0 - len(R.rc_encode(banded)) / len(R.rice_encode(banded))
    assert full_win > 0.10  # the fixture really is rc-favorable
    cid, _ = C._encode_plane(banded, "auto")
    assert cid == 1
