"""Scaling-efficiency measurement for tiled transforms (BASELINE north star:
">= 85% 2-host scaling efficiency", "megapixels/s scaling at 1 chip, 1 host,
N hosts").

Runs the tiled codec step over increasing mesh sizes and reports MP/s and
efficiency vs the single-device run. On a real pod slice this measures ICI
halo-exchange overhead; on virtual CPU devices it validates the measurement
plumbing only (CPU 'devices' share cores, so efficiency numbers are not
meaningful there — the harness says so in its output).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from wicca_tpu.parallel.mesh import make_mesh
from wicca_tpu.parallel.tiled import tiled_dwt2, tiled_idwt2


def _mesh_shapes(n: int):
    """(ty, tx) factorizations to test for n devices."""
    shapes = []
    ty = 1
    while ty <= n:
        if n % ty == 0:
            shapes.append((ty, n // ty))
        ty *= 2
    return shapes


def measure_scaling(
    image_hw: tuple[int, int] = (4096, 4096),
    levels: int = 3,
    wavelet: str = "bior4.4",
    iters: int = 3,
    device_counts=None,
) -> list[dict]:
    """Time the tiled DWT+IDWT roundtrip at several device counts.

    Returns a list of {devices, mesh, mp_s, efficiency} dicts (efficiency
    relative to the smallest device count, ideal = devices ratio).
    """
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = sorted({1, 2, len(all_devices)})
    h, w = image_hw
    img = np.random.default_rng(0).integers(0, 256, (1, h, w), np.uint8)
    results = []
    base_mp_s = None
    for n in device_counts:
        if n > len(all_devices):
            continue
        shapes = _mesh_shapes(n)
        ty, tx = shapes[len(shapes) // 2]  # squarest factorization
        mesh = make_mesh(ty=ty, tx=tx, devices=all_devices[:n])

        def step(x):
            pyr = tiled_dwt2(x, levels, wavelet, mesh=mesh)
            return tiled_idwt2(pyr, mesh=mesh)

        run = jax.jit(step)
        out = run(jnp.asarray(img))
        float(out.ravel()[0])  # force completion (tunnel-safe)
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = run(jnp.asarray(img))
            float(out.ravel()[0])
            times.append(time.time() - t0)
        dt = min(times)
        mp_s = h * w / 1e6 / dt
        if base_mp_s is None:
            base_mp_s = mp_s
            base_n = n
        eff = (mp_s / base_mp_s) / (n / base_n)
        results.append({"devices": n, "mesh": f"{ty}x{tx}", "mp_s": round(mp_s, 1), "efficiency": round(eff, 3)})
    return results


if __name__ == "__main__":
    import json

    backend = jax.default_backend()
    rows = measure_scaling()
    note = "" if backend == "tpu" else f" (backend={backend}: virtual devices share cores; efficiency not meaningful)"
    print(json.dumps({"scaling": rows, "backend": backend}) + note)
