"""Packed host<->device stream transfer (codec/transfer.py): the tunnel
fast path must be BIT-EXACT in both directions — serialize() of a packed
fetch produces identical container bytes, and put_stream lands identical
planes on device. Runs on CPU with packing force-enabled (the production
gate enables it only off-CPU)."""

import dataclasses

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec import transfer as T
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.core.quant import QuantSpec


def _img(seed=0, shape=(3, 160, 192)):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _planes_equal(a, b):
    assert np.array_equal(np.asarray(a.ll), np.asarray(b.ll))
    for da, db in zip(a.details, b.details):
        for pa, pb in zip(da, db):
            assert pa.dtype == pb.dtype
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


# ---- field pack/unpack primitives ----


@pytest.mark.parametrize("width", [8, 16])
@pytest.mark.parametrize("k", [1, 2, 3, 5, 7])
def test_fields_roundtrip_np(width, k):
    if k >= width:
        pytest.skip("k < width")
    rng = np.random.default_rng(k)
    n = 8 * 997
    z = rng.integers(0, 1 << k, n).astype(np.uint8 if width == 8 else np.uint16)
    b = T._pack_fields_np(z, k)
    assert b.size == n * k // 8
    np.testing.assert_array_equal(T._unpack_fields_np(b, k, n, width), z)


@pytest.mark.parametrize("width,k", [(8, 3), (8, 7), (16, 5), (16, 11), (16, 15)])
def test_fields_np_jnp_byte_identical(width, k):
    import jax

    rng = np.random.default_rng(k)
    n = 8 * 513
    z = rng.integers(0, 1 << k, n).astype(np.uint8 if width == 8 else np.uint16)
    b_np = T._pack_fields_np(z, k)
    b_j = np.asarray(jax.jit(lambda x: T._pack_fields_jnp(x, k))(z))
    np.testing.assert_array_equal(b_np, b_j)
    u_j = np.asarray(jax.jit(lambda x: T._unpack_fields_jnp(x, k, width))(b_np))
    np.testing.assert_array_equal(u_j, z)


def test_zigzag_full_range():
    for width, dt in ((8, np.int8), (16, np.int16)):
        lo, hi = np.iinfo(dt).min, np.iinfo(dt).max
        c = np.arange(lo, hi + 1, dtype=dt)
        z = T._zigzag_np(c, width)
        assert z.dtype == (np.uint8 if width == 8 else np.uint16)
        np.testing.assert_array_equal(T._unzigzag_np(z, width), c)
        # small |c| -> small z (entropy-friendly ordering)
        assert T._zigzag_np(np.array([0], dt), width)[0] == 0
        assert T._zigzag_np(np.array([-1], dt), width)[0] == 1
        assert T._zigzag_np(np.array([1], dt), width)[0] == 2


# ---- end-to-end: fetch_stream ----


@pytest.mark.parametrize("wavelet", ["haar", "legall5.3", "bior4.4"])
def test_fetch_stream_bit_exact_and_bytes_identical(wavelet):
    s = encode(_img(1), levels=3, spec=QuantSpec(base_step=1.0), wavelet=wavelet)
    plain = T.fetch_stream(s, force=False)
    packed = T.fetch_stream(s, force=True)
    _planes_equal(plain, packed)
    assert C.serialize(packed) == C.serialize(plain)  # disk bytes unchanged


@pytest.mark.parametrize(
    "maker",
    [
        lambda: np.zeros((3, 128, 160), np.uint8),  # all-zero details
        lambda: _img(2),  # dense noise
        lambda: np.tile(np.arange(160, dtype=np.uint8), (3, 128, 1)),  # smooth
    ],
    ids=["zeros", "noise", "smooth"],
)
def test_fetch_stream_content_extremes(maker):
    s = encode(maker(), levels=2, spec=QuantSpec(base_step=1.0))
    _planes_equal(T.fetch_stream(s, force=False), T.fetch_stream(s, force=True))


def test_fetch_stream_odd_sizes_and_grayscale():
    # odd dims exercise SEG padding; single-channel exercises lead=1
    x = _img(3, shape=(1, 100, 116))
    s = encode(x, levels=2, spec=QuantSpec(base_step=2.0))
    _planes_equal(T.fetch_stream(s, force=False), T.fetch_stream(s, force=True))


def test_fetch_stream_int_wavelet_ll_int32():
    s = encode(_img(4), levels=2, wavelet="haar_int")
    plain = T.fetch_stream(s, force=False)
    packed = T.fetch_stream(s, force=True)
    _planes_equal(plain, packed)
    assert np.asarray(packed.ll).dtype == np.int32
    # lossless contract survives the packed fetch
    assert np.array_equal(np.asarray(decode(packed, emit_u8=True)), _img(4))


def test_fetch_stream_hidepth_falls_back():
    x16 = np.random.default_rng(5).integers(0, 4096, (1, 64, 64), dtype=np.uint16)
    s = encode(x16, levels=2, wavelet="legall5.3", bit_depth=12)
    got = T.fetch_stream(s, force=True)  # int32 planes -> plain path
    _planes_equal(T.fetch_stream(s, force=False), got)


# ---- end-to-end: put_stream ----


@pytest.mark.parametrize("wavelet", ["haar", "legall5.3"])
def test_put_stream_bit_exact(wavelet):
    s = encode(_img(6), levels=3, spec=QuantSpec(base_step=1.0), wavelet=wavelet)
    host = T.fetch_stream(s, force=False)
    dev = T.put_stream(host, force=True)
    _planes_equal(host, dev)
    np.testing.assert_array_equal(
        np.asarray(decode(dev, emit_u8=True)), np.asarray(decode(host, emit_u8=True))
    )


def test_put_stream_roundtrips_container(tmp_path):
    s = encode(_img(7), levels=3, spec=QuantSpec(base_step=1.0))
    C.save(T.fetch_stream(s, force=True), str(tmp_path / "a.wct"))
    host = C.load(str(tmp_path / "a.wct"))
    dev = T.put_stream(host, force=True)
    _planes_equal(host, dev)


def test_put_stream_empty_corrections():
    # a stream whose planes are all zeros -> k=1, zero corrections
    s = encode(np.full((3, 128, 128), 128, np.uint8), levels=2, spec=QuantSpec(base_step=4.0))
    host = T.fetch_stream(s, force=False)
    _planes_equal(host, T.put_stream(host, force=True))


# ---- helpers / policy ----


def test_parallel_fetch_matches_asarray():
    import jax.numpy as jnp

    x = jnp.arange(5_000_000, dtype=jnp.int32).reshape(100, 50_000) * 3
    np.testing.assert_array_equal(T.fetch_array_parallel(x, force=True), np.asarray(x))
    small = jnp.arange(100)
    np.testing.assert_array_equal(T.fetch_array_parallel(small, force=True), np.asarray(small))


def test_enabled_gate_env(monkeypatch):
    monkeypatch.setenv("WICCA_TPU_PACKED_TRANSFER", "off")
    assert not T.enabled()
    monkeypatch.setenv("WICCA_TPU_PACKED_TRANSFER", "on")
    assert T.enabled()
    monkeypatch.setenv("WICCA_TPU_PACKED_TRANSFER", "auto")
    import jax

    assert T.enabled() == (jax.default_backend() != "cpu")


def test_packed_is_actually_smaller_on_photo_like_content():
    """The scheme must beat raw bytes on deadzone codes of natural-ish
    images (the whole point) — guard against silent regressions."""
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    img = np.clip(
        128 + 60 * np.sin(xx / 31) + 50 * np.cos(yy / 43)
        + np.random.default_rng(0).normal(0, 12, yy.shape),
        0, 255,
    ).astype(np.uint8)[None]
    s = encode(np.repeat(img, 3, axis=0), levels=5, spec=QuantSpec(base_step=1.0))
    planes = T._stream_planes(s)
    meta = T._plane_meta([(p.shape, np.dtype(p.dtype).name) for p in planes])
    stats = np.asarray(T._stats_fn(meta)(planes))
    kcs, off = [], 0
    for m in meta:
        kcs.append(T._choose_kc(stats[off : off + m.width - 1], m))
        off += m.width - 1
    ll_bytes = T._ll_nbytes(s.ll.shape, s.ll.dtype)
    raw = sum(m.n * (m.width // 8) for m in meta) + ll_bytes
    packed = T.packed_nbytes(meta, tuple(kcs), ll_bytes)
    assert packed < 0.75 * raw


def test_folder_pipeline_identical_with_packing(tmp_path, monkeypatch):
    """encode_folder/decode_folder with packing forced on must produce
    byte-identical .wct files and pixel-identical reconstructions."""
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.codec.batch import decode_folder, encode_folder

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"f{i}.png"),
                    np.random.default_rng(i).integers(0, 256, (96, 128, 3), dtype=np.uint8))
    outs, recs = {}, {}
    for mode in ("off", "on"):
        monkeypatch.setenv("WICCA_TPU_PACKED_TRANSFER", mode)
        out, rec = tmp_path / f"wct_{mode}", tmp_path / f"rec_{mode}"
        encode_folder(src, out, levels=3, spec=QuantSpec(base_step=1.0))
        decode_folder(out, rec)
        outs[mode] = {p.name: p.read_bytes() for p in sorted(out.glob("*.wct"))}
        recs[mode] = {p.name: cv2.imread(str(p)).tobytes() for p in sorted(rec.glob("*.png"))}
    assert outs["on"] == outs["off"] and len(outs["on"]) == 3
    assert recs["on"] == recs["off"]


def test_native_matches_numpy(monkeypatch):
    """The C++ PACK1 kernels (native/pack.cpp) must produce byte-identical
    upload parts and identical reconstructions vs the numpy reference."""
    from wicca_tpu.native.rice import native_available

    if not native_available():
        pytest.skip("native lib unavailable")
    s = encode(_img(9), levels=3, spec=QuantSpec(base_step=1.0))
    planes = [np.asarray(p) for p in T._stream_planes(s)]
    meta = T._plane_meta([(p.shape, p.dtype.name) for p in planes])
    native = [T._pack_plane_host(p, m) for p, m in zip(planes, meta)]
    monkeypatch.setattr(T, "_native_lib", lambda: None)
    ref = [T._pack_plane_host(p, m) for p, m in zip(planes, meta)]
    for (kb_n, parts_n), (kb_r, parts_r) in zip(native, ref):
        assert kb_n == kb_r
        assert len(parts_n) == len(parts_r)
        for a, b in zip(parts_n, parts_r):
            np.testing.assert_array_equal(a, b)
    # reconstruction: packed fetch with native on == native off
    packed_native = T.fetch_stream(s, force=True)
    monkeypatch.undo()
    packed_np = T.fetch_stream(s, force=True)
    _planes_equal(packed_native, packed_np)


def test_sticky_kc_selection_reuses_valid_tuples():
    """Frames of one folder must reuse the first frame's (k, C) tuple when
    still valid (each distinct tuple is a fresh remote pack compile), and
    recompute when a plane's escape tail outgrows its cap."""
    T._STICKY_KCS.clear()

    def smooth(seed):
        base = np.tile(np.arange(192, dtype=np.float32), (160, 1))
        n = np.random.default_rng(seed).normal(0, 2.0, base.shape)
        return np.clip(base + n, 0, 255).astype(np.uint8)[None].repeat(3, 0)

    a = encode(smooth(20), levels=2, spec=QuantSpec(base_step=1.0))
    pa = T._stream_planes(a)
    meta = T._plane_meta([(p.shape, np.dtype(p.dtype).name) for p in pa])
    stats_a = np.asarray(T._stats_fn(meta)(pa))
    kcs_a = T._choose_kcs_sticky(stats_a, meta)
    # a "next frame" whose tails are slightly SMALLER: a fresh choice could
    # pick tighter caps, but the sticky tuple is still valid -> reused
    stats_b = np.maximum(stats_a - 1, 0)
    kcs_b = T._choose_kcs_sticky(stats_b, meta)
    assert kcs_b == kcs_a  # valid tuple reused verbatim (no recompile)

    # force invalidity: a dense stream whose tails exceed the sticky caps
    dense = encode(
        np.random.default_rng(5).integers(0, 256, (3, 160, 192), np.uint8),
        levels=2, spec=QuantSpec(base_step=0.05),
    )
    pd = T._stream_planes(dense)
    kcs_d = T._choose_kcs_sticky(np.asarray(T._stats_fn(meta)(pd)), meta)
    assert kcs_d != kcs_a  # recomputed (and the recomputed tuple is valid)
    # and packed fetch stays bit-exact under the sticky policy
    _planes_equal(T.fetch_stream(dense, force=False), T.fetch_stream(dense, force=True))
    T._STICKY_KCS.clear()
