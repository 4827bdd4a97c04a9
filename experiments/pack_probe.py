"""Probe TPU primitive costs for the PACK1 transfer-packing scheme
(device-side coefficient packing before D2H — VERDICT r3 next-step #1).

Measures, on the real chip at bench-like sizes (40M samples):
  - per-call round-trip latency (tiny fetch)
  - cumsum(int32) over N
  - escape compaction: scatter (.at[idx].set) vs two-operand sort
  - marker-replacement gather (exc[cumsum] of N from small buffer)
  - k-bit field pack + unpack static loops (u8, k=5)

Timing through the axon tunnel: block_until_ready does not wait, so each
measurement forces a scalar fetch; numbers include one round-trip latency
(reported separately so compute can be separated).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 40 * 1024 * 1024
CAP = N // 32
K = 5
M = (1 << K) - 1

rng = np.random.default_rng(0)
# Laplacian-ish zigzag codes, ~7% above the k=5 marker (bench L1-like)
z_host = np.minimum(rng.geometric(0.18, N).astype(np.uint8) - 1, 255)


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), out)  # compile+complete
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    z = jax.device_put(z_host, dev)

    lat = timed(jax.jit(lambda x: x[:8].astype(jnp.int32).sum()), z)
    print(f"latency (tiny kernel + scalar fetch): {lat*1e3:.1f} ms", flush=True)

    t = timed(jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))), z)
    print(f"cumsum i32 40M: {(t-lat)*1e3:.1f} ms", flush=True)

    @jax.jit
    def compact_scatter(x):
        esc = x >= M
        idx = jnp.cumsum(esc.astype(jnp.int32)) - 1
        idx = jnp.where(esc, jnp.minimum(idx, CAP - 1), CAP - 1)
        return jnp.zeros((CAP,), jnp.uint8).at[idx].set(jnp.where(esc, x, 0), mode="drop")

    t = timed(compact_scatter, z)
    print(f"compact via scatter 40M->{CAP}: {(t-lat)*1e3:.1f} ms", flush=True)

    @jax.jit
    def compact_sort(x):
        esc = x >= M
        key = jnp.where(esc, jnp.arange(N, dtype=jnp.int32), jnp.int32(2**31 - 1))
        _, v = jax.lax.sort((key, x), num_keys=1)
        return v[:CAP]

    t = timed(compact_sort, z)
    print(f"compact via sort 40M: {(t-lat)*1e3:.1f} ms", flush=True)

    exc_host = rng.integers(M, 256, CAP, dtype=np.uint8)
    exc = jax.device_put(exc_host, dev)

    @jax.jit
    def marker_gather(x, e):
        is_m = x == M
        idx = jnp.minimum(jnp.cumsum(is_m.astype(jnp.int32)) - 1, CAP - 1)
        return jnp.where(is_m, e[jnp.maximum(idx, 0)], x)

    t = timed(marker_gather, z, exc)
    print(f"marker-replacement gather 40M: {(t-lat)*1e3:.1f} ms", flush=True)

    @jax.jit
    def pack_k5(x):
        g = jnp.minimum(x, M).astype(jnp.uint32).reshape(-1, 8)
        lo = jnp.zeros((N // 8,), jnp.uint32)
        hi = jnp.zeros((N // 8,), jnp.uint32)
        for s in range(8):
            off = s * K
            v = g[:, s]
            if off < 32:
                lo = lo | (v << off)
                if off + K > 32:
                    hi = hi | (v >> (32 - off))
            else:
                hi = hi | (v << (off - 32))
        words = jnp.stack([lo, hi], axis=1)  # (N/8, 2) u32 = 8 bytes
        b = jnp.stack([(words >> (8 * i)).astype(jnp.uint8) for i in range(4)], axis=2)
        return b.reshape(N // 8, 8)[:, :K].reshape(-1)

    t = timed(pack_k5, z)
    print(f"pack k=5 fields 40M -> {N*K//8/1e6:.0f}MB: {(t-lat)*1e3:.1f} ms", flush=True)

    fields = pack_k5(z)

    @jax.jit
    def unpack_k5(fb):
        b = fb.reshape(N // 8, K).astype(jnp.uint32)
        full = jnp.concatenate([b, jnp.zeros((N // 8, 8 - K), jnp.uint32)], axis=1)
        lo = sum(full[:, i] << (8 * i) for i in range(4))
        hi = sum(full[:, 4 + i] << (8 * i) for i in range(4))
        outs = []
        for s in range(8):
            off = s * K
            if off < 32:
                v = lo >> off
                if off + K > 32:
                    v = v | (hi << (32 - off))
            else:
                v = hi >> (off - 32)
            outs.append((v & M).astype(jnp.uint8))
        return jnp.stack(outs, axis=1).reshape(-1)

    t = timed(unpack_k5, fields)
    print(f"unpack k=5 fields 40M: {(t-lat)*1e3:.1f} ms", flush=True)

    got = np.asarray(unpack_k5(fields))
    want = np.minimum(z_host, M)
    print(f"pack/unpack exact: {np.array_equal(got, want)}", flush=True)

    # histogram stats: counts of z >= 2^k - 1 for k=1..8
    @jax.jit
    def stats(x):
        xi = x.astype(jnp.int32)
        return jnp.stack([(xi >= (1 << k) - 1).sum() for k in range(1, 9)])

    t = timed(stats, z)
    print(f"stats 40M: {(t-lat)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
