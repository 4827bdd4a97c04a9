"""Post-compression R-D truncation (codec/rd.py PCRD half + WCT9 band_div):
divisor semantics must be exact (floor-division = coarser-step encode),
allocation must meet budgets with monotone quality, and the truncated
streams must ride every decode path and the container."""

import dataclasses

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec import rd
from wicca_tpu.codec.pipeline import decode, decode_at_level, decode_region, encode
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def photo(h=256, w=320, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for octave, amp in ((4, 18.0), (16, 30.0), (64, 42.0)):
        n = rng.normal(0, 1, (h // octave + 2, w // octave + 2, 3)).astype(np.float32)
        img += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
    img += 128
    return np.moveaxis(np.clip(img, 0, 255).astype(np.uint8), -1, 0)


def _host(stream):
    from wicca_tpu.codec.transfer import fetch_stream

    return fetch_stream(stream, force=False)


def test_uniform_divisor_equals_coarser_step():
    """floor(floor(x/q)/d) == floor(x/(q d)): a stream divided uniformly by
    d with band_div set decodes like a direct encode at step q*d."""
    x = photo(seed=1)
    q, d = 1.0, 4
    fine = _host(encode(x, levels=3, spec=QuantSpec(base_step=q)))
    n_planes = 3 * 3
    details = tuple(
        tuple(
            (np.sign(p.astype(np.int32)) * (np.abs(p.astype(np.int32)) // d)).astype(p.dtype)
            for p in bands
        )
        for bands in fine.details
    )
    manual = dataclasses.replace(fine, details=details, band_div=(d,) * n_planes)
    direct = encode(x, levels=3, spec=QuantSpec(base_step=q * d))
    rec_m = np.asarray(decode(manual, emit_u8=True))
    rec_d = np.asarray(decode(direct, emit_u8=True))
    # float32 |x|/q edge rounding can flip a handful of codes; demand
    # near-identity, not bit equality
    assert np.mean(rec_m != rec_d) < 1e-3
    assert float(psnr(rec_m.astype(np.float32), rec_d.astype(np.float32))) > 55


def test_synthesis_gains_shapes_and_positivity():
    for wavelet in ("haar", "bior4.4", "db2", "legall5.3"):
        g = rd.synthesis_gains(wavelet, 3)
        assert len(g) == 3 and all(len(row) == 3 for row in g)
        assert all(v > 0 for row in g for v in row)
    # haar block-mean convention: unit detail error -> 4**level image SSE
    g = rd.synthesis_gains("haar", 3)
    assert g[0][0] == pytest.approx(4.0) and g[1][0] == pytest.approx(16.0)


def test_measure_and_allocate_monotone_budgets():
    s = _host(encode(photo(seed=2), levels=3, spec=QuantSpec(base_step=0.5)))
    tables = rd.measure(s)
    assert len(tables) == 9
    full = sum(t.rates[0] for t in tables)
    prev_rate, prev_dist = None, None
    for frac in (1.0, 0.5, 0.25, 0.1):
        divs, rate, dist = rd.allocate(tables, int(full * frac))
        assert rate <= int(full * frac) or all(
            d == t.divs[-1] for d, t in zip(divs, tables)
        )
        if prev_rate is not None:
            assert rate <= prev_rate and dist >= prev_dist
        prev_rate, prev_dist = rate, dist


def test_truncate_meets_budget_and_beats_naive():
    """The PCRD point must be at least as good as the naive single-step
    encode at the same file size — that is the whole feature."""
    x = photo(h=320, w=384, seed=3)
    xf = x.astype(np.float32)
    fine = _host(encode(x, levels=4, spec=QuantSpec(base_step=0.5)))
    target_bpp = 1.0
    small = rd.truncate(fine, target_bpp=target_bpp)
    blob = C.serialize(small)
    h, w = x.shape[-2:]
    got_bpp = 8.0 * len(blob) / (h * w)
    assert got_bpp <= target_bpp * 1.02
    p_pcrd = float(psnr(np.asarray(decode(small)), xf))
    # naive single-step encode at the SAME file size (encode_to_bpp's bpp is
    # per SAMPLE = per-pixel bpp / channels)
    naive, info = rd.encode_to_bpp(x, 8.0 * len(blob) / x.size, levels=4, rate="actual")
    p_naive = float(psnr(np.asarray(decode(naive)), xf))
    assert p_pcrd >= p_naive - 0.05, (p_pcrd, p_naive, info)


def test_wct9_container_roundtrip_and_inspect():
    x = photo(seed=4)
    small = rd.truncate(
        _host(encode(x, levels=3, spec=QuantSpec(base_step=0.5))), target_bpp=1.5
    )
    assert small.band_div and len(small.band_div) == 9
    blob = C.serialize(small)
    assert blob[:4] == b"WCT9"
    back = C.deserialize(blob)
    assert back.band_div == small.band_div
    for a, b in zip(back.details, small.details):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    np.testing.assert_array_equal(
        np.asarray(decode(back, emit_u8=True)), np.asarray(decode(small, emit_u8=True))
    )
    info = C.inspect(blob)
    assert info["version"] == 9
    assert info["band_div"] == list(small.band_div)
    assert info["integrity"] == "ok"


def test_wct9_with_metadata_and_layers(tmp_path):
    from wicca_tpu.codec.pipeline import with_metadata

    x = photo(seed=5)
    small = rd.truncate(
        _host(encode(x, levels=2, spec=QuantSpec(base_step=0.5))), target_bpp=2.0
    )
    small = with_metadata(small, {"k": b"v"})
    p = tmp_path / "a.wct"
    C.save(small, str(p), quality_layers=2)
    back = C.load(str(p))
    assert dict(back.metadata) == {"k": b"v"} and back.band_div == small.band_div
    trunc = C.load(str(p), max_layers=1)  # layer prefix composes with band_div
    assert trunc.spec.base_step == pytest.approx(small.spec.base_step * 2)


def test_truncated_region_and_progressive_decode_consistent():
    x = photo(h=256, w=256, seed=6)
    small = rd.truncate(
        _host(encode(x, levels=3, spec=QuantSpec(base_step=0.5))), target_bpp=1.0
    )
    full = np.asarray(decode(small, emit_u8=True))
    win = np.asarray(decode_region(small, 32, 96, 64, 160, emit_u8=True))
    np.testing.assert_array_equal(win, full[..., 32:96, 64:160])
    half = np.asarray(decode_at_level(small, 1, emit_u8=True))
    assert half.shape[-2:] == (128, 128)


def test_integer_wavelet_truncation_bounded_error():
    x = photo(seed=7)
    lossless = _host(encode(x, levels=3, wavelet="legall5.3"))
    tables = rd.measure(lossless)
    full = sum(t.rates[0] for t in tables)
    small = rd.truncate(lossless, target_bytes=int(full * 0.4))
    assert small.band_div
    rec = np.asarray(decode(small, emit_u8=True))
    assert float(psnr(rec.astype(np.float32), x.astype(np.float32))) > 30
    blob = C.serialize(small)
    assert len(blob) < full * 0.6
    back = C.deserialize(blob)
    np.testing.assert_array_equal(np.asarray(decode(back, emit_u8=True)), rec)
    # progressive decode must widen band_div codes exactly like decode():
    # manually widening (sign * (|c|*d + d//2)) and dropping band_div must
    # give a bit-identical decode_at_level result (ADVICE r4 high).
    widened = dataclasses.replace(
        small,
        details=tuple(
            tuple(
                (
                    np.sign(p.astype(np.int32))
                    * np.minimum(
                        np.abs(p.astype(np.int32)) * d + d // 2,
                        np.iinfo(p.dtype).max,
                    )
                ).astype(p.dtype)
                if d != 1
                else p
                for p, d in zip(bands, small.band_div[lvl * 3 : lvl * 3 + 3])
            )
            for lvl, bands in enumerate(small.details)
        ),
        band_div=(),
    )
    for tl in (1, 2):
        got = np.asarray(decode_at_level(small, tl, emit_u8=True))
        want = np.asarray(decode_at_level(widened, tl, emit_u8=True))
        np.testing.assert_array_equal(got, want)


def test_truncate_ll_codec_quant_low_bpp():
    """ll_codec='quant' (WCT10) inside the PCRD budget: below ~0.6 bpp the
    raw float32 LL floor eats up to a third of the budget; coding it must
    (a) keep the container within budget, (b) decode, and (c) beat the
    raw-LL allocation at the same target (the r5 low-rate lever)."""
    x = photo(h=512, w=512, seed=20)
    fine = _host(encode(x, levels=5, spec=QuantSpec(base_step=0.25)))
    t = 0.4
    raw = rd.truncate(fine, target_bpp=t)
    quant = rd.truncate(fine, target_bpp=t, ll_codec="quant")
    blob_raw = C.serialize(raw)
    blob_q = C.serialize(quant, ll_codec="quant")
    n = 512 * 512
    assert len(blob_q) * 8 / n <= t + 1e-9
    rec_raw = np.asarray(decode(C.deserialize(blob_raw), emit_u8=True)).astype(np.float32)
    rec_q = np.asarray(decode(C.deserialize(blob_q), emit_u8=True)).astype(np.float32)
    xf = x.astype(np.float32)
    assert float(psnr(rec_q, xf)) > float(psnr(rec_raw, xf)) + 0.3


def test_allocate_fillback_fills_budget():
    """The fill-back pass must spend slack the greedy pass leaves (never
    exceeding the budget, never increasing distortion vs no fill-back)."""
    tables = [
        rd.PlaneRD((1, 2, 4), (1000, 400, 100), (0.0, 50.0, 200.0)),
        rd.PlaneRD((1, 2, 4), (900, 500, 50), (0.0, 30.0, 300.0)),
    ]
    divs, rate, dist = rd.allocate(tables, 1500)
    assert rate <= 1500
    # greedy alone would stop at (400+900)=1300 or coarser; fill-back should
    # find the (400, 900) -> 1300 or better combination up to 1500
    assert rate >= 1300


def test_truncate_rejects_roi_and_double_truncation():
    x = photo(seed=8)
    s = _host(encode(x, levels=2, spec=QuantSpec(base_step=0.5)))
    small = rd.truncate(s, target_bpp=2.0)
    if small.band_div:
        with pytest.raises(ValueError, match="already"):
            rd.truncate(small, target_bpp=1.0)
    with pytest.raises(ValueError, match="exactly one"):
        rd.truncate(s)


def test_transcode_drop_levels_slices_band_div(tmp_path):
    x = photo(seed=9)
    small = rd.truncate(
        _host(encode(x, levels=3, spec=QuantSpec(base_step=0.5))), target_bpp=1.0
    )
    if not small.band_div:
        pytest.skip("allocation chose no truncation")
    src, dst = tmp_path / "a.wct", tmp_path / "b.wct"
    C.save(small, str(src))
    from wicca_tpu.codec.transcode import transcode

    transcode(src, dst, drop_levels=1)
    back = C.load(str(dst))
    assert back.levels == 2
    assert back.band_div in ((), small.band_div[3:])


def test_cli_encode_pcrd_target_bpp(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from wicca_tpu.cli import main

    src = tmp_path / "im.png"
    cv2.imwrite(str(src), np.moveaxis(photo(seed=10), 0, -1)[..., ::-1])
    wct = tmp_path / "im.wct"
    # levels=5 so the raw float32 LL (the rate floor PCRD cannot cut)
    # stays well under the budget
    assert main(["encode", str(src), str(wct), "--levels", "5",
                 "--target-bpp", "1.0"]) == 0
    out = capsys.readouterr().out
    assert "pcrd" in out
    h, w = 256, 320
    assert 8.0 * wct.stat().st_size / (h * w) <= 1.02
    assert main(["decode", str(wct), str(tmp_path / "rec.png")]) == 0
    assert main(["info", str(wct)]) == 0


def test_measure_ict_chroma_weighting_batched():
    """The chroma_gain^2 image-domain weighting must handle leading batch
    dims: per-channel SSE is summed over every axis, not coerced through a
    scalar float() (which raised on (N, 3, h, w) planes)."""
    x1 = photo(64, 96, seed=60)
    xb = np.stack([x1, photo(64, 96, seed=61)])  # (2, 3, H, W)
    sb = _host(encode(xb, levels=2, spec=QuantSpec(base_step=0.5),
                      color="ict", chroma_gain=2.0))
    tables = rd.measure(sb)
    assert len(tables) == 2 * 3  # levels * bands
    assert all(d >= 0 for t in tables for d in t.dists)
    # batched distortion == sum of the per-image distortions (the weighting
    # is per-channel, so batching must just add images up)
    per_img = [
        rd.measure(_host(encode(xi, levels=2, spec=QuantSpec(base_step=0.5),
                                color="ict", chroma_gain=2.0)))
        for xi in xb
    ]
    for i, tb in enumerate(tables):
        want = per_img[0][i].dists[0] + per_img[1][i].dists[0]
        assert tb.dists[0] == pytest.approx(want, rel=1e-6)
    # truncation rides the batched tables end-to-end
    small = rd.truncate(sb, target_bpp=1.0)
    assert small.band_div and np.asarray(decode(small, emit_u8=True)).shape == xb.shape
