"""Headline benchmark: depth-5 Haar DWT encode (+quantize) + decode of a
52.7 MP image on one TPU chip, in megapixels/second.

BASELINE.json metric: "DWT encode+decode megapixels/s/chip at depth 5". The
only reference number is the CPU end-to-end 7.6 MP/s implied throughput
(BASELINE.md; /root/reference/README.md:144-158) — used as vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wicca_tpu.ops.dwt_pallas import dwt_level_quant_pallas, idwt_level_dequant_pallas

    on_tpu = jax.default_backend() == "tpu"
    # mean reference image is 8284x6393 (52.7 MP); use the aligned equivalent
    h, w = (8192, 6400) if on_tpu else (1024, 1024)
    depth = 5
    step = 1.0
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(3, h, w), dtype=np.uint8)

    @jax.jit
    def encode_decode(x_u8):
        x = x_u8.astype(jnp.float32)
        ll = x
        packs = []
        for _ in range(depth):
            ll, lh, hl, hh = dwt_level_quant_pallas(ll, step=step, quantize=True)
            packs.append((lh, hl, hh))
        rec = ll
        for lh, hl, hh in reversed(packs):
            rec = idwt_level_dequant_pallas(rec, lh, hl, hh, step=step, quantize=True)
        return rec

    x = jax.device_put(img)
    rec = encode_decode(x)
    rec.block_until_ready()  # warmup / compile

    err = float(jnp.max(jnp.abs(rec - x.astype(jnp.float32))))
    if not err < 64.0:
        print(f"SANITY FAIL: reconstruction error {err}", file=sys.stderr)
        sys.exit(1)

    iters = 30 if on_tpu else 3
    t0 = time.time()
    for _ in range(iters):
        rec = encode_decode(x)
    rec.block_until_ready()
    dt = (time.time() - t0) / iters

    mp = h * w / 1e6  # megapixels per image (pixel = spatial site, 3 channels)
    value = mp / dt
    baseline = 7.6  # reference CPU end-to-end MP/s (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "dwt_encode_quant_decode_MPs_depth5_1chip",
                "value": round(value, 2),
                "unit": "MP/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
