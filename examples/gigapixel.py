"""Gigapixel-scale demonstration (BASELINE config 5).

Builds a ~1-gigapixel grayscale image (32768 x 32768) on the device and runs
the depth-6 fused icon extraction plus a depth-5 encode on it. On a single
v5e chip this exercises the same tile/stripe machinery the multi-host path
shards over `(ty, tx)`; on a pod slice, `wicca_tpu.parallel.tiled` runs the
identical transform with ppermute halo exchange (see tests/test_tiled.py
for the 8-device virtual-mesh equivalence proof).

Run: python examples/gigapixel.py [--side 32768]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=32768)
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wicca_tpu.codec.pipeline import encode
    from wicca_tpu.core.quant import QuantSpec
    from wicca_tpu.ops.dwt_pallas import icon_pallas

    n = args.side
    mp = n * n / 1e6

    @jax.jit
    def synth():
        # procedural gigapixel texture, generated on-device (no host transfer)
        r = jnp.arange(n, dtype=jnp.float32)
        yy = r[:, None] / 97.0
        xx = r[None, :] / 53.0
        return jnp.clip(128 + 80 * jnp.sin(xx) + 40 * jnp.cos(yy + xx * 0.1), 0, 255).astype(jnp.uint8)[None]

    t0 = time.time()
    img = synth()
    icon = icon_pallas(img, args.depth)
    checksum = jnp.sum(icon.astype(jnp.int32))
    v = int(checksum)  # forces completion through the tunnel
    t_icon = time.time() - t0
    print(f"{mp:.0f} MP icon depth-{args.depth}: {icon.shape[-2:]} in {t_icon:.1f}s (incl. synth+compile), checksum {v}")

    t0 = time.time()
    stream = encode(img, levels=5, spec=QuantSpec(base_step=2.0))
    s = int(jnp.sum(stream.details[0][0].astype(jnp.int32)))
    t_enc = time.time() - t0
    print(f"{mp:.0f} MP depth-5 encode: LL {stream.ll.shape[-2:]} in {t_enc:.1f}s, detail checksum {s}")

    # steady-state icon throughput (compile excluded)
    @jax.jit
    def icon_loop(x, iters):
        def body(i, acc):
            xv = jnp.bitwise_xor(x, (i & 1).astype(jnp.uint8))
            return acc + icon_pallas(xv, args.depth).astype(jnp.float32).ravel()[0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(icon_loop(img, 1))
    t1 = time.time(); float(icon_loop(img, 1)); t1 = time.time() - t1
    tk = time.time(); float(icon_loop(img, 4)); tk = time.time() - tk
    per = max(tk - t1, 1e-9) / 3
    print(f"steady-state gigapixel icon: {per*1e3:.1f} ms = {mp/per:.0f} MP/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
