"""Advanced codec features tour: ROI, quality layers, error resilience,
spatial random access, and 16-bit sources — everything JPEG2000-shaped that
the reference (icons only, SURVEY.md §0) never had.

Run:  python examples/advanced_codec.py [output_dir]

CPU-safe (forces the CPU backend off-TPU is NOT needed — runs wherever JAX
lands; on the real chip the first run compiles for a few minutes).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(out_dir: str = "/tmp/wicca_advanced") -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    from wicca_tpu.codec import (
        apply_roi, decode, decode_at_level, decode_region, deserialize,
        encode, serialize,
    )
    from wicca_tpu.core.metrics import ms_ssim, psnr
    from wicca_tpu.core.quant import QuantSpec

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    img = np.clip(
        128 + 70 * np.sin(xx / 19) + 55 * np.cos(yy / 23) + rng.normal(0, 12, yy.shape),
        0, 255,
    ).astype(np.uint8)
    img = np.stack([img, np.roll(img, 7, 1), np.roll(img, 13, 0)], 0)  # (3, H, W)

    # --- ROI: the center stays pristine, the background pays the bits -----
    stream = encode(img, levels=4, spec=QuantSpec(base_step=1.0))
    mask = np.zeros((512, 512), bool)
    mask[160:352, 160:352] = True
    roi = apply_roi(stream, mask, bg_shift=3)
    base, rec = np.asarray(decode(stream)), np.asarray(decode(roi))
    print("ROI exact:", np.array_equal(rec[..., 160:352, 160:352], base[..., 160:352, 160:352]))
    print(f"plain {len(serialize(stream)):,} B vs ROI'd {len(serialize(roi)):,} B")

    # --- SNR quality layers: one file, many qualities ---------------------
    blob = serialize(stream, quality_layers=4)
    (out / "layered.wct").write_bytes(blob)
    for k in (1, 2, 4):
        r = np.asarray(decode(deserialize(blob, max_layers=k), emit_u8=True))
        m = float(ms_ssim(r, img))
        print(f"{k} layer(s): PSNR {float(psnr(r, img)):6.2f} dB  MS-SSIM {m:.4f}")

    # --- error resilience: flip a byte, decode around it ------------------
    bad = bytearray(serialize(stream))
    bad[len(bad) // 3] ^= 0xFF
    try:
        deserialize(bytes(bad))
    except ValueError as e:
        print("corruption detected:", e)
    rec = np.asarray(decode(deserialize(bytes(bad), on_error="zero")))
    print(f"decoded around it: PSNR {float(psnr(rec, img.astype(np.float32))):.2f} dB")

    # --- spatial random access: decode just a window ----------------------
    win = np.asarray(decode_region(stream, 100, 200, 300, 400, emit_u8=True))
    print("window:", win.shape, "== full-decode crop:",
          np.array_equal(win, np.asarray(decode(stream, emit_u8=True))[..., 100:200, 300:400]))

    # --- resolution scalability -------------------------------------------
    for lvl in (2, 1, 0):
        r = decode_at_level(stream, lvl, emit_u8=True)
        print(f"1/{1 << lvl} scale: {tuple(r.shape)}")

    # --- 16-bit lossless ---------------------------------------------------
    x16 = rng.integers(0, 65536, (1, 256, 256), dtype=np.uint16)
    s16 = encode(x16, levels=3, wavelet="legall5.3")
    r16 = np.asarray(decode(s16, emit_u8=True))
    print("uint16 lossless bit-exact:", np.array_equal(r16, x16),
          "| container:", serialize(s16)[:4])

    # --- stream inspection + host-side transcoding -------------------------
    from wicca_tpu.codec import inspect, transcode

    info = inspect(str(out / "layered.wct"))
    print(f"inspect: WCT{info['version']} {info['quality_layers']} layers, "
          f"{info['bpp']:.2f} bpp, integrity {info['integrity']}")
    m = transcode(out / "layered.wct", out / "half.wct", max_layers=2, drop_levels=1)
    half = inspect(str(out / "half.wct"))
    print(f"transcode (2 layers, half-res): {m['bytes_in']:,} -> {m['bytes_out']:,} B, "
          f"now {half['orig_shape']} levels={half['levels']}")

    # --- visual frequency weighting (hh_gain, WCT7) -------------------------
    flat = encode(img, levels=4, spec=QuantSpec(base_step=1.0))
    weighted = encode(img, levels=4, spec=QuantSpec(base_step=1.0, hh_gain=2.0))
    bf, bw = len(serialize(flat)), len(serialize(weighted))
    mf = float(ms_ssim(np.asarray(decode(flat)), img.astype(np.float32)))
    mw = float(ms_ssim(np.asarray(decode(weighted)), img.astype(np.float32)))
    print(f"hh_gain=2: {bf:,} -> {bw:,} B ({100 * (1 - bw / bf):.1f}% fewer bits), "
          f"MS-SSIM {mf:.4f} -> {mw:.4f} | container {serialize(weighted)[:4]}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
