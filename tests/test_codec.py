"""End-to-end codec pipeline: encode (fused DWT+quant) -> decode, PSNR and
shape-chain handling, including the large-image tile-padding path."""

import numpy as np
import pytest

import wicca_tpu.ops.dwt_pallas as dp
from wicca_tpu.codec.pipeline import (
    CodeStream,
    compression_ratio,
    decode,
    encode,
    entropy_ratio,
    icon_from_stream,
)
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("levels", [1, 3, 5])
def test_encode_decode_psnr(levels):
    x = _img((3, 128, 128), seed=levels)
    stream = encode(x, levels=levels, spec=QuantSpec(base_step=1.0))
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape
    assert float(psnr(rec, x.astype(np.float32))) > 35.0


def test_encode_decode_odd_shape():
    x = _img((3, 101, 173), seed=7)
    stream = encode(x, levels=3)
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape
    assert float(psnr(rec, x.astype(np.float32))) > 30.0


def test_icon_from_stream_and_ratio():
    x = _img((3, 64, 64), seed=1)
    stream = encode(x, levels=2)
    icon = np.asarray(icon_from_stream(stream))
    assert icon.shape == (3, 16, 16) and icon.dtype == np.uint8
    # stored int8 codes are ~raw size; the compression signal is entropy:
    # a smooth image's deadzone codes are overwhelmingly zero
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    smooth = np.clip(128 + 60 * np.sin(xx / 19) + 50 * np.cos(yy / 23), 0, 255).astype(np.uint8)[None]
    deep = encode(np.repeat(smooth, 3, axis=0), levels=5, spec=QuantSpec(base_step=4.0))
    assert 0.8 < compression_ratio(deep) < 1.3
    assert entropy_ratio(deep) > 3.0


def test_stream_is_pytree():
    import jax

    x = _img((1, 32, 32))
    stream = encode(x, levels=2)
    leaves = jax.tree_util.tree_leaves(stream)
    assert len(leaves) == 1 + 3 * 2
    assert isinstance(jax.tree_util.tree_map(lambda a: a, stream), CodeStream)


def test_tile_padding_path(monkeypatch):
    # shrink the tile caps so small CPU-interpret tests exercise the
    # pad-to-tile + shape-chain crop logic used for real 52 MP images
    monkeypatch.setattr(dp, "_TILE_H", 32)
    monkeypatch.setattr(dp, "_TILE_W", 64)
    x = _img((1, 80, 150), seed=3)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=0.5))
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape
    assert float(psnr(rec, x.astype(np.float32))) > 35.0


def test_icon_pallas_tile_padding_bit_exact(monkeypatch):
    from wicca_tpu.core.haar import haar_icon

    monkeypatch.setattr(dp, "_TILE_H", 32)
    monkeypatch.setattr(dp, "_TILE_W", 64)
    for depth in (2, 5):
        x = _img((3, 90, 170), seed=depth)
        got = np.asarray(dp.icon_pallas(x, depth))
        want = np.asarray(haar_icon(x, depth))
        np.testing.assert_array_equal(got, want)


def test_container_roundtrip(tmp_path):
    from wicca_tpu.codec.container import load, save

    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    img = np.clip(120 + 70 * np.sin(xx / 13) + 40 * np.cos(yy / 17), 0, 255).astype(np.uint8)
    x = np.stack([img, img[::-1], img // 2])
    stream = encode(x, levels=3, spec=QuantSpec(base_step=2.0))
    path = tmp_path / "img.wct"
    nbytes = save(stream, str(path))
    assert nbytes < x.size  # entropy coding beats raw for smooth content
    loaded = load(str(path))
    assert loaded.levels == stream.levels and loaded.orig_shape == stream.orig_shape
    np.testing.assert_array_equal(np.asarray(loaded.ll), np.asarray(stream.ll))
    for (a, b, c), (x2, y2, z2) in zip(loaded.details, stream.details):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(y2))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(z2))
    rec1 = np.asarray(decode(stream))
    rec2 = np.asarray(decode(loaded))
    np.testing.assert_array_equal(rec1, rec2)


@pytest.mark.parametrize("wavelet", ["db2", "bior4.4"])
def test_encode_decode_wide_wavelets(wavelet, tmp_path):
    from wicca_tpu.codec.container import load, save

    x = _img((3, 96, 96), seed=11)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0), wavelet=wavelet)
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape
    assert float(psnr(rec, x.astype(np.float32))) > 35.0
    path = tmp_path / "w.wct"
    save(stream, str(path))
    loaded = load(str(path))
    assert loaded.wavelet == wavelet
    np.testing.assert_array_equal(np.asarray(decode(loaded)), rec)


def test_progressive_decode_at_level():
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _img((3, 160, 200), seed=13)
    stream = encode(x, levels=5, spec=QuantSpec(base_step=1.0))
    # level == levels: the LL band itself, cropped to ceil dims
    top = np.asarray(decode_at_level(stream, 5))
    assert top.shape == (3, 5, 7)
    # level 0 == full decode
    np.testing.assert_array_equal(
        np.asarray(decode_at_level(stream, 0)), np.asarray(decode(stream))
    )
    # intermediate level approximates the block mean of the original
    mid = np.asarray(decode_at_level(stream, 2))
    assert mid.shape == (3, 40, 50)
    # compare against the true level-2 LL (bit-exact path)
    true_ll2 = np.asarray(encode(x, levels=2).ll)[..., :40, :50]
    assert np.abs(mid - true_ll2).max() < 6.0  # quantized details perturb mildly
    # u8 emission
    u8 = np.asarray(decode_at_level(stream, 2, emit_u8=True))
    assert u8.dtype == np.uint8 and u8.shape == (3, 40, 50)
    with pytest.raises(ValueError):
        decode_at_level(stream, 9)


def test_rd_curve_monotone():
    from wicca_tpu.codec.rd import rd_curve

    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    img = np.clip(128 + 60 * np.sin(xx / 9) + 40 * np.cos(yy / 11), 0, 255).astype(np.uint8)[None]
    pts = rd_curve(img, steps=(0.5, 2.0, 8.0), levels=3, actual_bytes=True)
    psnrs = [p["psnr_db"] for p in pts]
    bpps = [p["bpp_actual"] for p in pts]
    assert psnrs[0] > psnrs[1] > psnrs[2]  # finer step -> higher PSNR
    assert bpps[0] > bpps[1] > bpps[2]     # finer step -> more bits
    # Rice coder lands within ~25% of the Shannon bound on these codes
    for p in pts:
        assert p["bpp_actual"] < p["bpp_entropy"] * 1.6 + 0.3


def _photo_like(h=96, w=96):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.clip(128 + 60 * np.sin(xx / 9) + 40 * np.cos(yy / 11), 0, 255).astype(np.uint8)[None]


def test_encode_to_bpp_meets_budget_tightly():
    from wicca_tpu.codec.rd import _grid_step, encode_to_bpp, rd_point

    img = _photo_like()
    stream, info = encode_to_bpp(img, 1.0, levels=3, rate="actual")
    assert info["met"] and info["bpp"] <= 1.0
    # tight: one grid notch finer would blow the budget
    finer = _grid_step(round(4 * np.log2(info["step"] / 0.125)) - 1)
    over = rd_point(img, finer, levels=3, actual_bytes=True)
    assert over["bpp_actual"] > 1.0


def test_encode_to_bpp_entropy_rate_and_unreachable():
    from wicca_tpu.codec.rd import encode_to_bpp

    img = _photo_like()
    stream, info = encode_to_bpp(img, 2.0, levels=3, rate="entropy")
    assert info["met"] and info["bpp"] <= 2.0
    # an absurdly small budget is reported as unmet, not silently wrong
    _, info2 = encode_to_bpp(img, 1e-6, levels=3, rate="entropy")
    assert not info2["met"]


def test_encode_to_psnr_meets_bar_frugally():
    from wicca_tpu.codec.rd import _grid_step, encode_to_psnr, rd_point

    img = _photo_like()
    stream, info = encode_to_psnr(img, 38.0, levels=3)
    assert info["met"] and info["psnr_db"] >= 38.0
    # frugal: one grid notch coarser would miss the bar
    coarser = _grid_step(round(4 * np.log2(info["step"] / 0.125)) + 1)
    under = rd_point(img, coarser, levels=3)
    assert under["psnr_db"] < 38.0


def test_rate_control_rejects_lossless_wavelets():
    from wicca_tpu.codec.rd import encode_to_bpp, encode_to_psnr

    img = _photo_like()
    with pytest.raises(ValueError):
        encode_to_bpp(img, 1.0, levels=2, wavelet="legall5.3")
    with pytest.raises(ValueError):
        encode_to_psnr(img, 40.0, levels=2, wavelet="haar_int")


# ---------------------------------------------------------------------------
# Lossless streams (integer wavelets: legall5.3 / haar_int)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wavelet", ["legall5.3", "haar_int"])
@pytest.mark.parametrize("shape", [(3, 96, 96), (1, 37, 53)])
def test_lossless_encode_decode_bit_exact(wavelet, shape):
    x = _img(shape, seed=7)
    stream = encode(x, levels=3, wavelet=wavelet)
    rec = np.asarray(decode(stream, emit_u8=True))
    assert rec.dtype == np.uint8
    np.testing.assert_array_equal(rec, x)
    # detail codes are int16, LL stays integer
    for bands in stream.details:
        for b in bands:
            assert b.dtype == np.int16


@pytest.mark.parametrize("wavelet", ["legall5.3", "haar_int"])
def test_lossless_container_roundtrip(wavelet, tmp_path):
    from wicca_tpu.codec.container import load, save

    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    img = np.clip(120 + 70 * np.sin(xx / 13) + 40 * np.cos(yy / 17), 0, 255).astype(np.uint8)
    x = np.stack([img, img[::-1], img // 2])
    stream = encode(x, levels=3, wavelet=wavelet)
    path = tmp_path / "ll.wct"
    nbytes = save(stream, str(path))
    assert nbytes < x.size  # lossless still beats raw on smooth content
    loaded = load(str(path))
    assert loaded.wavelet == ("legall5.3" if wavelet == "legall5.3" else "haar_int")
    rec = np.asarray(decode(loaded, emit_u8=True))
    np.testing.assert_array_equal(rec, x)


def test_lossless_progressive_decode():
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _img((3, 64, 64), seed=3)
    stream = encode(x, levels=3, wavelet="legall5.3")
    full = np.asarray(decode_at_level(stream, 0, emit_u8=True))
    np.testing.assert_array_equal(full, x)
    for t in (1, 2, 3):
        small = np.asarray(decode_at_level(stream, t))
        assert small.shape[-2:] == (64 >> t, 64 >> t)
    # target_level == levels returns the LL band itself
    np.testing.assert_array_equal(
        np.asarray(decode_at_level(stream, 3)), np.asarray(stream.ll)
    )


@pytest.mark.parametrize("wavelet", ["db2", "bior4.4"])
def test_progressive_decode_float_lifting(wavelet):
    """decode_at_level for float lifting wavelets: coarse reconstruction at
    level t equals the t-level decode of a freshly-truncated pyramid."""
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _img((1, 64, 64), seed=5)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0), wavelet=wavelet)
    full = np.asarray(decode_at_level(stream, 0))
    np.testing.assert_allclose(full, np.asarray(decode(stream)), atol=1e-5)
    for t in (1, 2):
        small = np.asarray(decode_at_level(stream, t))
        assert small.shape[-2:] == (64 >> t, 64 >> t)
    np.testing.assert_allclose(
        np.asarray(decode_at_level(stream, 3)), np.asarray(stream.ll), atol=1e-6
    )


@pytest.mark.slow
def test_lossless_53_multitile_progressive():
    """Multi-tile 5/3 Pallas streams: full decode is bit-exact and every
    progressive level equals the encoder's own intermediate LL (the partial
    pass must clamp at the encoder's tile boundaries — orig_k plumbing)."""
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _img((1, 1024, 2048), seed=21)
    st = encode(x, levels=5, wavelet="legall5.3")
    np.testing.assert_array_equal(np.asarray(decode(st, emit_u8=True)), x)
    for t in (2, 4):
        got = np.asarray(decode_at_level(st, t))
        want = np.asarray(encode(x, levels=t, wavelet="legall5.3").ll)
        np.testing.assert_array_equal(got, want[:, : got.shape[-2], : got.shape[-1]])


# ---------------------------------------------------------------------------
# Color transforms (RCT / ICT)
# ---------------------------------------------------------------------------


def _photo_like(shape=(3, 96, 128), seed=13):
    """Strongly channel-correlated smooth content (color transforms only
    help when channels correlate, as in photographs: luma carries nearly
    all the signal, chroma varies slowly)."""
    yy, xx = np.mgrid[0 : shape[1], 0 : shape[2]].astype(np.float32)
    rng = np.random.default_rng(seed)
    # luminance: smooth waves + edges + texture, SHARED across channels
    # (in photographs fine detail is overwhelmingly luminance)
    base = 120 + 70 * np.sin(xx / 11) + 45 * np.cos(yy / 17)
    base += 25 * ((xx.astype(int) // 32 + yy.astype(int) // 24) % 2)
    base += rng.normal(0, 2.5, base.shape)
    gains = (1.0, 0.92, 0.85)
    chans = [g * base + 8 * np.sin(xx / 40 + c) for c, g in enumerate(gains[: shape[0]])]
    return np.clip(np.stack(chans), 0, 255).astype(np.uint8)


def test_rct_exact_inverse():
    from wicca_tpu.core.color import rct_fwd, rct_inv

    x = _img((3, 40, 56), seed=31).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(rct_inv(rct_fwd(x))), x)


def test_ict_inverse_close():
    from wicca_tpu.core.color import ict_fwd, ict_inv

    x = _img((3, 40, 56), seed=32).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ict_inv(ict_fwd(x))), x, atol=1e-3)


def test_lossless_rct_stream_bit_exact_and_smaller():
    from wicca_tpu.codec.pipeline import estimated_entropy_bytes

    x = _photo_like()
    plain = encode(x, levels=3, wavelet="legall5.3")
    rct = encode(x, levels=3, wavelet="legall5.3", color="rct")
    np.testing.assert_array_equal(np.asarray(decode(rct, emit_u8=True)), x)
    # decorrelation must shrink the entropy estimate on correlated content
    assert estimated_entropy_bytes(rct) < estimated_entropy_bytes(plain)


def test_ict_stream_roundtrip_and_container(tmp_path):
    from wicca_tpu.codec.container import load, save

    x = _photo_like(seed=14)
    st = encode(x, levels=3, spec=QuantSpec(base_step=1.0), color="ict", chroma_gain=2.0)
    rec = np.asarray(decode(st, emit_u8=True))
    assert rec.shape == x.shape
    assert float(psnr(rec.astype(np.float32), x.astype(np.float32))) > 33.0
    path = tmp_path / "c.wct"
    save(st, str(path))
    loaded = load(str(path))
    assert loaded.color == "ict" and abs(loaded.chroma_gain - 2.0) < 1e-6
    np.testing.assert_array_equal(np.asarray(decode(loaded, emit_u8=True)), rec)


def test_color_validation_errors():
    x = _img((3, 32, 32))
    with pytest.raises(ValueError):
        encode(x, levels=2, color="rct")  # float wavelet + rct
    with pytest.raises(ValueError):
        encode(x, levels=2, wavelet="legall5.3", color="ict")
    with pytest.raises(ValueError):
        encode(_img((32, 32)), levels=2, color="rct")  # not 3-channel


def test_color_progressive_and_icon():
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _photo_like(seed=15)
    st = encode(x, levels=3, wavelet="legall5.3", color="rct")
    full = np.asarray(decode_at_level(st, 0, emit_u8=True))
    np.testing.assert_array_equal(full, x)
    small = np.asarray(decode_at_level(st, 2, emit_u8=True))
    assert small.shape == (3, 24, 32)
    ic = np.asarray(icon_from_stream(st))
    assert ic.dtype == np.uint8 and ic.shape == (3, 12, 16)
    # icon is an approximate RGB rendering of the coarse band
    ref_icon = np.asarray(icon_from_stream(encode(x, levels=3, wavelet="legall5.3")))
    assert np.abs(ic.astype(int) - ref_icon.astype(int)).mean() < 4.0


def test_rd_point_with_ict_color():
    from wicca_tpu.codec.rd import rd_point

    x = _photo_like(seed=16)
    plain = rd_point(x, 2.0, levels=3, actual_bytes=True)
    ict = rd_point(x, 2.0, levels=3, actual_bytes=True, color="ict", chroma_gain=2.0)
    # decorrelation + coarse chroma: fewer bits on correlated content
    assert ict["bpp_actual"] < plain["bpp_actual"]


@pytest.mark.slow
def test_bior44_pallas_multitile():
    """Multi-tile 9/7 Pallas streams: roundtrip quality and progressive
    levels consistent with the encoder's own intermediates."""
    from wicca_tpu.codec.pipeline import decode_at_level

    x = _img((1, 1024, 2048), seed=23)
    st = encode(x, levels=5, spec=QuantSpec(base_step=1.0), wavelet="bior4.4")
    rec = np.asarray(decode(st))
    assert float(psnr(rec, x.astype(np.float32))) > 35.0
    got = np.asarray(decode_at_level(st, 2))
    want = np.asarray(encode(x, levels=2, spec=QuantSpec(base_step=1.0), wavelet="bior4.4").ll)
    # same tile grid + same levels; only the quantization of levels 1-2
    # differs (absent in the partial decode input), so LLs agree closely
    assert np.abs(got - want[:, : got.shape[-2], : got.shape[-1]]).max() < 8.0


# ---------------------------------------------------------------------------
# Spatial random access (decode_region)
# ---------------------------------------------------------------------------


def test_decode_region_haar_exact():
    from wicca_tpu.codec.pipeline import decode_region

    x = _img((3, 80, 100), seed=21)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0))
    full = np.asarray(decode(stream))
    roi = np.asarray(decode_region(stream, 17, 53, 33, 97))
    np.testing.assert_array_equal(roi, full[..., 17:53, 33:97])
    # u8 emission and single-pixel region
    px = np.asarray(decode_region(stream, 5, 6, 7, 8, emit_u8=True))
    assert px.shape == (3, 1, 1) and px.dtype == np.uint8


def test_decode_region_haar_reads_fraction_of_planes():
    """On a tall image the slice is proportional to the region, not the image."""
    from wicca_tpu.codec.pipeline import decode_region

    x = _img((1, 1024, 64), seed=22)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0))
    full = np.asarray(decode(stream))
    roi = np.asarray(decode_region(stream, 500, 540, 0, 64))
    np.testing.assert_array_equal(roi, full[..., 500:540, :])


def test_decode_region_tiled_legall_tile_aligned():
    from wicca_tpu.codec.pipeline import decode_region

    # 1200 rows span three 512-row encoder tiles (single pass at levels<=3)
    x = _img((1, 1200, 96), seed=23)
    stream = encode(x, levels=2, wavelet="legall5.3")
    full = np.asarray(decode(stream))
    roi = np.asarray(decode_region(stream, 520, 700, 10, 90))
    np.testing.assert_array_equal(roi, full[..., 520:700, 10:90])


def test_decode_region_tiled_float_wavelet():
    from wicca_tpu.codec.pipeline import decode_region

    x = _img((1, 1100, 80), seed=24)
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0), wavelet="bior4.4")
    full = np.asarray(decode(stream))
    roi = np.asarray(decode_region(stream, 600, 800, 0, 80))
    np.testing.assert_array_equal(roi, full[..., 600:800, :])


def test_decode_region_tiled_multipass_exact():
    """Depth > 3 tiled wide wavelets run a pass CASCADE; the hierarchical
    region decode (region_plan, VERDICT r2 #8) must stay bit-identical to the
    full-decode crop across pass boundaries and tile seams."""
    from wicca_tpu.codec.pipeline import decode_region

    x = _img((1, 1100, 96), seed=26)
    for wavelet in ("legall5.3", "bior4.4"):
        stream = encode(x, levels=5, spec=QuantSpec(base_step=1.0), wavelet=wavelet)
        full = np.asarray(decode(stream))
        for window in ((520, 700, 10, 90), (0, 40, 0, 96), (1050, 1100, 30, 60)):
            roi = np.asarray(decode_region(stream, *window))
            r0, r1, c0, c1 = window
            np.testing.assert_array_equal(roi, full[..., r0:r1, c0:c1], err_msg=f"{wavelet} {window}")


def test_region_plan_fraction_math():
    """Shape-only accounting: on an 8K-class depth-5 tiled stream a 512x512
    window touches a small fraction of the coefficients (the old coarsest-
    grid alignment of (512,1024)<<3 pixels would touch 100%)."""
    import dataclasses as _dc

    from wicca_tpu.codec.pipeline import region_coefficient_fraction

    # build a shape-faithful synthetic stream: per-pass tile padding as the
    # encoder applies it (pass inputs pad to (512,1024) multiples)
    H, W, levels = 4352, 7680, 5
    sizes, shapes, lvl = [], [], 0
    h, w = H, W
    while lvl < levels:
        k = min(3, levels - lvl)
        h = -(-h // 512) * 512
        w = -(-w // 1024) * 1024
        for i in range(1, k + 1):
            shapes.append((h >> i, w >> i))
        h, w = h >> k, w >> k
        lvl += k
    details = tuple(
        tuple(np.zeros((1, sh, sw), np.int16) for _ in range(3)) for sh, sw in shapes
    )
    stream = CodeStream(
        ll=np.zeros((1, shapes[-1][0], shapes[-1][1]), np.float32),
        details=details, spec=QuantSpec(base_step=1.0), levels=levels,
        orig_shape=(H, W), wavelet="bior4.4", layout="tiled",
    )
    frac = region_coefficient_fraction(stream, 2000, 2512, 3000, 3512)
    assert frac < 0.25, frac


def test_decode_region_global_lifting_margin():
    """Global-layout streams (v1-era wide wavelets): the halo margin covers
    the inverse cascade, so the window matches the full inverse to float
    rounding (XLA fuses/FMA-contracts shape-dependently, so bitwise equality
    across shapes is not achievable for jitted float lifting)."""
    import dataclasses as _dc

    from wicca_tpu.codec.pipeline import decode_region
    from wicca_tpu.core.lifting import dwt2_level_lifting
    from wicca_tpu.core.pad import pad_to_multiple
    from wicca_tpu.core.quant import quantize_deadzone
    import jax.numpy as jnp

    x = _img((1, 256, 320), seed=25)
    spec = QuantSpec(base_step=1.0)
    xx = pad_to_multiple(x, 4, mode="replicate").astype(jnp.float32)
    ll, details = xx, []
    for lvl in (1, 2):
        ll, lh, hl, hh = dwt2_level_lifting(ll, "bior4.4")
        details.append(tuple(quantize_deadzone(b, spec.detail_step(lvl), jnp.int16) for b in (lh, hl, hh)))
    stream = CodeStream(ll=ll, details=tuple(details), spec=spec, levels=2,
                        orig_shape=(256, 320), wavelet="bior4.4", layout="global")
    full = np.asarray(decode(stream))
    roi = np.asarray(decode_region(stream, 100, 180, 120, 260))
    np.testing.assert_allclose(roi, full[..., 100:180, 120:260], atol=2e-3)


def test_decode_region_bounds_and_lossless():
    from wicca_tpu.codec.pipeline import decode_region

    x = _img((3, 96, 96), seed=26)
    stream = encode(x, levels=2, wavelet="legall5.3", color="rct")
    roi = np.asarray(decode_region(stream, 10, 60, 20, 70, emit_u8=True))
    np.testing.assert_array_equal(roi, x[..., 10:60, 20:70])
    with pytest.raises(ValueError):
        decode_region(stream, -1, 5, 0, 5)
    with pytest.raises(ValueError):
        decode_region(stream, 0, 5, 90, 100)
