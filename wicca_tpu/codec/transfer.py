"""Packed host<->device stream transfer (the tunnel-bandwidth fast path).

Why this exists: on this environment the TPU sits behind a tunnel moving
~30-55 MB/s, while a depth-5 encode of a 53 MP frame ships ~160 MB of raw
uint8 up and ~160 MB of int8/int16 detail codes down — the end-to-end folder
pipeline is transfer-bound (docs/PERFORMANCE.md "End-to-end folder
pipeline"; VERDICT r3 next-step #1). Detail codes are deadzone-quantized and
low-entropy (~4-5 bits/sample on photographic content), so packing them at
the device boundary roughly halves the dominant transfer while leaving the
.wct bytes on disk UNCHANGED: the host reconstructs every plane bit-exactly
and the entropy coder (native/rice) consumes the same ints as before.

Measured tunnel facts this design is built on (experiments/pack_probe.py):
  - the link is half-duplex (concurrent up+down gives no overlap)
  - one D2H stream moves ~30-36 MB/s but 3 concurrent fetches reach ~49 MB/s
    -> every large fetch here is chunk-parallel (fetch_array_parallel)
  - per-call round-trip latency is ~23 ms -> one fused buffer per frame
    instead of 16 per-plane fetches
  - elementwise k-bit pack/unpack of 40M samples costs ~15 ms on device;
    segmented lax.top_k escape compaction ~51 ms; cap-sized scatter ~9 ms;
    global sort/gather/scatter over 40M are 150-460 ms and are avoided

Wire format (internal, version-free — both ends derive it from the stream
geometry + the chosen per-plane parameters; it is never persisted):

  device -> host (PACK1, :func:`fetch_stream`):
    per detail plane, flattened and zero-padded to a SEG multiple:
      fields: zigzag codes saturated at m = 2**k - 1, packed k bits/sample
              (m is the in-band escape marker; k == sample width -> raw
              codes, no markers, no escape section)
      escapes: per SEG-sample segment, the first C true values of samples
              with z >= m, position-ordered via lax.top_k (padded to C)
    then the LL plane as raw little-endian bytes.
    The host recovers escape positions from the markers themselves, so no
    positions are transferred downstream.

  host -> device (:func:`put_stream`):
    per detail plane: the same k-bit saturated fields, then an explicit
    correction list (int32 positions + values, host-computed, padded to a
    power-of-two bucket) applied on device with one cap-sized scatter.
    Positions ride upstream because a scatter of ~3% corrections costs
    ~9 ms on device, while marker-rank gathers cost ~350 ms.

Parameter choice: k is the smallest width whose escape tail fits the
compaction capacity (per-segment max <= C for PACK1, picked from the
device-computed tail histogram; pure byte-count argmin for uploads). The
(k, C) tuples are static jit keys, so folders of similar content reuse one
compiled pack/unpack per shape; a pathological folder where every frame
picks different widths would recompile — set WICCA_TPU_PACKED_TRANSFER=off
to fall back to plain np.asarray transfers.

Packing applies to int8/int16 detail planes (the 8-bit Pallas paths);
int32 (hi-depth) planes and CPU backends take the plain path — on-host
"transfers" are memcpys, packing would only burn cycles.
"""

from __future__ import annotations

import concurrent.futures
import ctypes
import dataclasses
import functools
import os

import numpy as np

from wicca_tpu.native.rice import _load as _native_lib

SEG = 4096  # escape-compaction segment (samples)
_CAPS = (16, 64, 256, 512)  # per-segment escape capacity buckets
_NSTREAMS = 3  # parallel chunk fetches per large transfer


def enabled() -> bool:
    """Packed transfer policy: on for remote/accelerator backends, off for
    CPU (where device "transfers" are memcpys). WICCA_TPU_PACKED_TRANSFER
    overrides: on | off | auto."""
    mode = os.environ.get("WICCA_TPU_PACKED_TRANSFER", "auto").lower()
    if mode == "on":
        return True
    if mode == "off":
        return False
    import jax

    return jax.default_backend() != "cpu"


# ---------------------------------------------------------------------------
# k-bit field packing: groups of 8 samples -> exactly k bytes, assembled in
# ceil(8k/32) little-endian u32 words. The same word layout is implemented
# in jnp (device) and numpy (host) so the bytes match bit-for-bit.
# ---------------------------------------------------------------------------


def _nwords(k: int) -> int:
    return (8 * k + 31) // 32


def _pack_fields_np(z: np.ndarray, k: int) -> np.ndarray:
    """(n,) uint z (values < 2**k) -> (n*k//8,) uint8; n % 8 == 0."""
    g = z.reshape(-1, 8).astype(np.uint32)
    nw = _nwords(k)
    words = [np.zeros(g.shape[0], np.uint32) for _ in range(nw)]
    for s in range(8):
        off = s * k
        w0, sh = off >> 5, off & 31
        words[w0] |= g[:, s] << sh
        if sh + k > 32:
            words[w0 + 1] |= g[:, s] >> (32 - sh)
    by = np.stack(
        [(words[i >> 2] >> (8 * (i & 3))).astype(np.uint8) for i in range(4 * nw)],
        axis=1,
    )
    return by[:, :k].reshape(-1)


def _unpack_fields_np(b: np.ndarray, k: int, n: int, width: int) -> np.ndarray:
    """(n*k//8,) uint8 -> (n,) uint8/uint16 field values."""
    nw = _nwords(k)
    g = b.reshape(-1, k).astype(np.uint32)
    pad = np.zeros((g.shape[0], 4 * nw - k), np.uint32)
    by = np.concatenate([g, pad], axis=1)
    words = [sum(by[:, 4 * w + i] << (8 * i) for i in range(4)) for w in range(nw)]
    mask = np.uint32((1 << k) - 1)
    cols = []
    for s in range(8):
        off = s * k
        w0, sh = off >> 5, off & 31
        v = words[w0] >> sh
        if sh + k > 32:
            v = v | (words[w0 + 1] << (32 - sh))
        cols.append(v & mask)
    out = np.stack(cols, axis=1).reshape(-1)
    return out.astype(np.uint8 if width == 8 else np.uint16)


def _pack_fields_jnp(z, k: int):
    import jax.numpy as jnp

    g = z.reshape(-1, 8).astype(jnp.uint32)
    nw = _nwords(k)
    words = [jnp.zeros(g.shape[0], jnp.uint32) for _ in range(nw)]
    for s in range(8):
        off = s * k
        w0, sh = off >> 5, off & 31
        words[w0] = words[w0] | (g[:, s] << sh)
        if sh + k > 32:
            words[w0 + 1] = words[w0 + 1] | (g[:, s] >> (32 - sh))
    by = jnp.stack(
        [(words[i >> 2] >> (8 * (i & 3))).astype(jnp.uint8) for i in range(4 * nw)],
        axis=1,
    )
    return by[:, :k].reshape(-1)


def _unpack_fields_jnp(b, k: int, width: int):
    import jax.numpy as jnp

    nw = _nwords(k)
    g = b.reshape(-1, k).astype(jnp.uint32)
    if 4 * nw > k:
        g = jnp.concatenate([g, jnp.zeros((g.shape[0], 4 * nw - k), jnp.uint32)], axis=1)
    words = [sum(g[:, 4 * w + i] << (8 * i) for i in range(1, 4)) + g[:, 4 * w] for w in range(nw)]
    mask = jnp.uint32((1 << k) - 1)
    cols = []
    for s in range(8):
        off = s * k
        w0, sh = off >> 5, off & 31
        v = words[w0] >> sh
        if sh + k > 32:
            v = v | (words[w0 + 1] << (32 - sh))
        cols.append(v & mask)
    out = jnp.stack(cols, axis=1).reshape(-1)
    return out.astype(jnp.uint8 if width == 8 else jnp.uint16)


# ---------------------------------------------------------------------------
# zigzag (sign interleave): int codes -> unsigned, small |c| -> small z
# ---------------------------------------------------------------------------


def _zigzag_np(c: np.ndarray, width: int) -> np.ndarray:
    ci = c.astype(np.int32)
    z = (ci << 1) ^ (ci >> 31)
    return z.astype(np.uint8 if width == 8 else np.uint16)


def _unzigzag_np(z: np.ndarray, width: int) -> np.ndarray:
    zi = z.astype(np.int32)
    c = (zi >> 1) ^ -(zi & 1)
    return c.astype(np.int8 if width == 8 else np.int16)


def _zigzag_jnp(c, width: int):
    import jax.numpy as jnp

    ci = c.astype(jnp.int32)
    z = (ci << 1) ^ (ci >> 31)
    return z.astype(jnp.uint8 if width == 8 else jnp.uint16)


def _unzigzag_jnp(z, width: int):
    import jax.numpy as jnp

    zi = z.astype(jnp.int32)
    c = (zi >> 1) ^ -(zi & 1)
    return c.astype(jnp.int8 if width == 8 else jnp.int16)


# ---------------------------------------------------------------------------
# plane geometry helpers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Plane:
    shape: tuple  # stored plane shape
    width: int  # 8 or 16 (sample bits)
    n: int  # true sample count
    npad: int  # padded to SEG multiple


def _plane_meta(shapes_dtypes) -> tuple[_Plane, ...]:
    out = []
    for shape, dt in shapes_dtypes:
        width = 8 if np.dtype(dt) == np.int8 else 16
        n = int(np.prod(shape))
        npad = -(-n // SEG) * SEG
        out.append(_Plane(tuple(shape), width, n, npad))
    return tuple(out)


def _stream_planes(stream):
    return [b for bands in stream.details for b in bands]


def _packable(stream) -> bool:
    for p in _stream_planes(stream):
        if np.dtype(p.dtype) not in (np.dtype(np.int8), np.dtype(np.int16)):
            return False
    return np.dtype(stream.ll.dtype) in (np.dtype(np.float32), np.dtype(np.int32))


# ---------------------------------------------------------------------------
# parallel chunk fetch (device -> host) of one big array
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _row_fetcher(nrows: int, rowlen: int):
    import jax

    @jax.jit
    def row(b, i):
        return jax.lax.dynamic_index_in_dim(b, i, 0, keepdims=False)

    return row


# measured D2H link bandwidth (bytes/s), EMA over actual large fetches —
# the input to decode_folder's host-vs-device cost model. No prior: None
# means "unmeasured" and link_bandwidth(probe=True) seeds it. Sub-4MB
# fetches are ignored (they measure latency, not bandwidth).
from wicca_tpu.utils.ema import RateEMA

_link_bw = RateEMA(None, min_units=float(1 << 22))


def _record_bw(nbytes: int, seconds: float) -> None:
    _link_bw.record(nbytes, seconds)


def link_bandwidth(probe: bool = False) -> float | None:
    """Measured D2H bandwidth in bytes/s (EMA over real fetches).

    Returns ``math.inf`` on CPU backends (device "transfers" are memcpys),
    ``None`` when nothing has been measured yet — unless ``probe``, which
    then times one ~8 MB round trip to seed the estimate."""
    import math

    import jax

    if jax.default_backend() == "cpu":
        return math.inf
    if _link_bw.rate() is None and probe:
        import time

        import jax.numpy as jnp

        x = jnp.zeros((1 << 23,), jnp.uint8) + jnp.uint8(1)  # 8 MB on device
        np.asarray(x[:8])  # force materialization before timing
        t0 = time.perf_counter()
        np.asarray(x)
        _record_bw(1 << 23, time.perf_counter() - t0)
    return _link_bw.rate()


def fetch_array_parallel(x, nstreams: int = _NSTREAMS, force: bool = False) -> np.ndarray:
    """Fetch a device array via ``nstreams`` concurrent chunk transfers
    (~1.5x a single np.asarray through the tunnel). Returns numpy with the
    original shape/dtype. On CPU backends (no tunnel) it degrades to a plain
    ``np.asarray`` unless ``force`` (tests). Observed throughput feeds
    :func:`link_bandwidth`."""
    import time

    import jax.numpy as jnp

    shape, dtype = x.shape, x.dtype
    flat = x.reshape(-1)
    n = flat.shape[0]
    if n < (1 << 22) or nstreams <= 1 or (not force and not enabled()):
        return np.asarray(x)
    rowlen = -(-n // nstreams)
    padded = jnp.pad(flat, (0, nstreams * rowlen - n)).reshape(nstreams, rowlen)
    row = _row_fetcher(nstreams, rowlen)
    rows = [row(padded, i) for i in range(nstreams)]  # dispatch all slices

    t0 = time.perf_counter()
    out = np.empty(nstreams * rowlen, dtype)
    def _get(i):
        out[i * rowlen : (i + 1) * rowlen] = np.asarray(rows[i])

    with concurrent.futures.ThreadPoolExecutor(max_workers=nstreams) as pool:
        list(pool.map(_get, range(nstreams)))
    _record_bw(out.nbytes, time.perf_counter() - t0)
    return out[:n].reshape(shape)


# ---------------------------------------------------------------------------
# device -> host (PACK1)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _stats_fn(meta: tuple):
    """Jitted per-plane escape-tail histogram: for k = 1..width-1, the max
    over SEG-segments of count(z >= 2**k - 1). One tiny fetch drives the
    (k, C) choice."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stats(planes):
        outs = []
        for p, m in zip(planes, meta):
            z = _zigzag_jnp(p.reshape(-1), m.width)
            z = jnp.pad(z, (0, m.npad - m.n))
            seg = z.reshape(-1, SEG).astype(jnp.int32)
            tails = [
                (seg >= (1 << k) - 1).sum(axis=1).max() for k in range(1, m.width)
            ]
            outs.append(jnp.stack(tails))
        return jnp.concatenate(outs)

    return stats


def _choose_kc(maxseg_tails: np.ndarray, m: _Plane) -> tuple[int, int]:
    """Smallest k whose worst-segment escape count fits a capacity bucket;
    (width, 0) = raw passthrough when nothing fits or packing wouldn't pay."""
    raw_bytes = m.n * (m.width // 8)
    best = (m.width, 0, raw_bytes)
    for k in range(1, m.width):
        tail = int(maxseg_tails[k - 1])
        if tail > _CAPS[-1]:
            continue
        cap = next(c for c in _CAPS if c >= tail)
        nbytes = m.npad * k // 8 + (m.npad // SEG) * cap * (m.width // 8)
        if nbytes < best[2]:
            best = (k, cap, nbytes)
        break  # larger k only adds field bits (cap cost is ~flat)
    return best[0], best[1]


# sticky (k, C) tuples per plane geometry: every distinct tuple is a fresh
# pack-jit compile (minutes through a remote tunnel), and frames of one
# folder differ slightly in content — so once a tuple compiles, keep
# reusing it for later frames whenever it is still VALID (each plane's
# worst-segment tail fits its cap at that k), even if a marginally smaller
# tuple exists. Typically one compile per (folder, shape).
_STICKY_KCS: dict[tuple, tuple] = {}


def _choose_kcs_sticky(stats: np.ndarray, meta: tuple) -> tuple:
    key = meta  # plane geometry tuple (hashable dataclasses)
    prev = _STICKY_KCS.get(key)
    offs = np.cumsum([0] + [m.width - 1 for m in meta])
    if prev is not None:
        ok = True
        for (k, cap), m, off in zip(prev, meta, offs):
            if k == m.width:
                continue  # raw passthrough is always valid
            if int(stats[off + k - 1]) > cap:
                ok = False
                break
        if ok:
            return prev
    kcs = tuple(
        _choose_kc(stats[off : off + m.width - 1], m)
        for m, off in zip(meta, offs)
    )
    _STICKY_KCS[key] = kcs
    return kcs


def _ll_nbytes(ll_shape, ll_dtype) -> int:
    return int(np.prod(ll_shape)) * np.dtype(ll_dtype).itemsize


@functools.lru_cache(maxsize=32)
def _pack_fn(meta: tuple, kcs: tuple, ll_shape: tuple, ll_dtype: str):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack(planes, ll):
        parts = []
        for p, m, (k, cap) in zip(planes, meta, kcs):
            z = _zigzag_jnp(p.reshape(-1), m.width)
            z = jnp.pad(z, (0, m.npad - m.n))
            if k == m.width:
                fields = z if m.width == 8 else None
                if fields is None:
                    fields = jax.lax.bitcast_convert_type(z, jnp.uint8).reshape(-1)
                parts.append(fields)
                continue
            marker = (1 << k) - 1
            parts.append(_pack_fields_jnp(jnp.minimum(z, marker), k))
            seg = z.reshape(-1, SEG)
            esc = seg >= marker
            key = jnp.where(esc, SEG - jax.lax.broadcasted_iota(jnp.int32, seg.shape, 1), 0)
            _, idx = jax.lax.top_k(key, cap)
            vals = jnp.take_along_axis(seg, idx, axis=1)
            if m.width == 8:
                parts.append(vals.reshape(-1))
            else:
                parts.append(jax.lax.bitcast_convert_type(vals.reshape(-1), jnp.uint8).reshape(-1))
        parts.append(jax.lax.bitcast_convert_type(ll.reshape(-1), jnp.uint8).reshape(-1))
        return jnp.concatenate(parts)

    return pack


def packed_nbytes(meta: tuple, kcs: tuple, ll_bytes: int) -> int:
    total = ll_bytes
    for m, (k, cap) in zip(meta, kcs):
        if k == m.width:
            total += m.npad * (m.width // 8)
        else:
            total += m.npad * k // 8 + (m.npad // SEG) * cap * (m.width // 8)
    return total


def _fetch_plain(stream):
    planes = [np.asarray(b) for b in _stream_planes(stream)]
    ll = np.asarray(stream.ll)
    return _rebuild(stream, ll, planes)


def _rebuild(stream, ll, planes):
    details = tuple(
        tuple(planes[i * 3 + j] for j in range(3)) for i in range(len(stream.details))
    )
    return dataclasses.replace(stream, ll=ll, details=details)


def fetch_stream(stream, force: bool | None = None):
    """Device CodeStream -> host (numpy-backed) CodeStream, bit-exact.

    Uses the PACK1 path (module docstring) when the backend benefits and
    every plane is int8/int16; otherwise plain np.asarray per plane. The
    result feeds :func:`wicca_tpu.codec.container.serialize` unchanged —
    bytes on disk are identical either way."""
    use = enabled() if force is None else force
    if not use or not _packable(stream):
        return _fetch_plain(stream)
    planes = _stream_planes(stream)
    meta = _plane_meta([(p.shape, np.dtype(p.dtype).name) for p in planes])
    stats = np.asarray(_stats_fn(meta)(planes))
    kcs = _choose_kcs_sticky(stats, meta)
    ll_bytes = _ll_nbytes(stream.ll.shape, stream.ll.dtype)
    raw_bytes = sum(m.n * (m.width // 8) for m in meta) + ll_bytes
    if packed_nbytes(meta, kcs, ll_bytes) >= raw_bytes:
        return _fetch_plain(stream)
    buf_dev = _pack_fn(meta, kcs, tuple(stream.ll.shape), np.dtype(stream.ll.dtype).name)(
        planes, stream.ll
    )
    buf = fetch_array_parallel(buf_dev)
    # ---- host-side reconstruction (exact; native C++ when available,
    # plane-parallel since ctypes releases the GIL) ----
    offs, off = [], 0
    for m, (k, cap) in zip(meta, kcs):
        offs.append(off)
        if k == m.width:
            off += m.npad * (m.width // 8)
        else:
            off += m.npad * k // 8 + (m.npad // SEG) * cap * (m.width // 8)
    ll = buf[off:].view(np.dtype(stream.ll.dtype)).reshape(stream.ll.shape)
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        out = list(pool.map(
            lambda a: _reconstruct_plane(buf, *a), zip(offs, meta, kcs)
        ))
    return _rebuild(stream, ll, out)


def _reconstruct_plane(buf: np.ndarray, off: int, m: _Plane, kc: tuple) -> np.ndarray:
    k, cap = kc
    if k == m.width:
        nb = m.npad * (m.width // 8)
        z = buf[off : off + nb]
        if m.width == 16:
            z = z.view(np.uint16)
        return _unzigzag_np(z[: m.n], m.width).reshape(m.shape)
    nf = m.npad * k // 8
    nseg = m.npad // SEG
    lib = _native_lib()
    if lib is not None:
        fields = buf[off : off + nf]
        exc = buf[off + nf : off + nf + nseg * cap * (m.width // 8)]
        out = np.empty(m.n, dtype=np.int8 if m.width == 8 else np.int16)
        fn = lib.wicca_pack1_reconstruct_i8 if m.width == 8 else lib.wicca_pack1_reconstruct_i16
        fn(
            fields.ctypes.data_as(ctypes.c_char_p),
            exc.ctypes.data_as(ctypes.c_char_p),
            k, m.n, m.npad, cap, SEG,
            out.ctypes.data_as(ctypes.c_char_p),
        )
        return out.reshape(m.shape)
    z = _unpack_fields_np(buf[off : off + nf], k, m.npad, m.width)
    exc = buf[off + nf : off + nf + nseg * cap * (m.width // 8)]
    if m.width == 16:
        exc = exc.view(np.uint16)
    exc = exc.reshape(nseg, cap)
    marker = (1 << k) - 1
    mask = z == marker
    if mask.any():
        segm = mask.reshape(nseg, SEG)
        rank = (np.cumsum(segm, axis=1) - 1)[segm]
        rows = np.nonzero(segm)[0]
        z = z.copy()
        z[mask] = exc[rows, rank]
    return _unzigzag_np(z[: m.n], m.width).reshape(m.shape)


# ---------------------------------------------------------------------------
# host -> device
# ---------------------------------------------------------------------------


def _choose_k_up(tails: np.ndarray, npad: int, width: int) -> tuple[int, int]:
    """(k, n_corrections) minimizing upload bytes: k-bit fields + explicit
    (int32 pos + value) corrections for z >= 2**k - 1. ``tails[k-1]`` =
    count of samples with z >= 2**k - 1."""
    vbytes = width // 8
    best = (width, 0, npad * vbytes)
    for k in range(1, width):
        ncorr = int(tails[k - 1])
        nbytes = npad * k // 8 + ncorr * (4 + vbytes)
        if nbytes < best[2]:
            best = (k, ncorr, nbytes)
    return best[0], best[1]


def _tail_counts_np(z: np.ndarray, width: int) -> np.ndarray:
    hist = np.bincount(z.astype(np.int64), minlength=1 << width)
    suffix = np.cumsum(hist[::-1])[::-1]
    return np.array([suffix[(1 << k) - 1] for k in range(1, width)], np.int64)


def _bucket(n: int) -> int:
    if n == 0:
        return 0
    b = 16
    while b < n:
        b <<= 1
    return b


@functools.lru_cache(maxsize=256)
def _unpack_plane_fn(shape: tuple, width: int, n: int, npad: int, k: int, bucket: int):
    """Per-plane upload unpack: small independent jits per (geometry, k,
    bucket) — one fused elementwise graph + at most one cap-sized scatter
    (the big-graph all-planes variant overwhelmed the remote compiler)."""
    import jax

    if k == width:

        @jax.jit
        def raw(z):
            return _unzigzag_jnp(z[:n], width).reshape(shape)

        return raw

    if bucket == 0:

        @jax.jit
        def no_corr(fields):
            z = _unpack_fields_jnp(fields, k, width)
            return _unzigzag_jnp(z[:n], width).reshape(shape)

        return no_corr

    @jax.jit
    def with_corr(fields, pos, vals):
        z = _unpack_fields_jnp(fields, k, width)
        z = z.at[pos].set(vals, mode="drop")
        return _unzigzag_jnp(z[:n], width).reshape(shape)

    return with_corr


def put_stream(stream, force: bool | None = None):
    """Host (numpy-backed) CodeStream -> device CodeStream via packed
    per-plane uploads + on-device unpack. Inverse-direction twin of
    :func:`fetch_stream`; planes land on device bit-exactly."""
    use = enabled() if force is None else force
    if not use or not _packable(stream):
        return stream  # jit will upload plain arrays on first use
    planes = [np.asarray(p) for p in _stream_planes(stream)]
    meta = _plane_meta([(p.shape, p.dtype.name) for p in planes])
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        packed_planes = list(pool.map(_pack_plane_host, planes, meta))
    raw_bytes = sum(m.n * (m.width // 8) for m in meta)
    packed = sum(len(part) for _, plist in packed_planes for part in plist)
    if packed >= raw_bytes:
        return stream
    dev_planes = []
    for m, ((k, bucket), parts) in zip(meta, packed_planes):
        fn = _unpack_plane_fn(m.shape, m.width, m.n, m.npad, k, bucket)
        if k == m.width:
            z = parts[0] if m.width == 8 else parts[0].view(np.uint16)
            dev_planes.append(fn(z))
        elif bucket == 0:
            dev_planes.append(fn(parts[0]))
        else:
            pos = parts[1].view(np.int32)
            vals = parts[2] if m.width == 8 else parts[2].view(np.uint16)
            dev_planes.append(fn(parts[0], pos, vals))
    # the LL plane stays numpy: it is small and jit uploads it on first use
    return _rebuild(stream, np.asarray(stream.ll), dev_planes)


def _pack_plane_host(p: np.ndarray, m: _Plane) -> tuple[tuple, list[np.ndarray]]:
    """One plane -> ((k, bucket), buffer parts) for the upload direction.
    Native single-pass pack when available; numpy fallback is bit-identical."""
    lib = _native_lib()
    flat = np.ascontiguousarray(p.reshape(-1))
    if lib is not None:
        counts = np.empty(m.width - 1, np.int64)
        sfn = lib.wicca_pack1_stats_i8 if m.width == 8 else lib.wicca_pack1_stats_i16
        sfn(flat.ctypes.data_as(ctypes.c_char_p), m.n,
            counts.ctypes.data_as(ctypes.c_char_p))
        k, ncorr = _choose_k_up(counts, m.npad, m.width)
        if k == m.width:
            z = _zigzag_np(flat, m.width)
            z = np.pad(z, (0, m.npad - m.n))
            return (k, 0), [z if m.width == 8 else z.view(np.uint8)]
        fields = np.zeros(m.npad * k // 8 + 4, np.uint8)  # +4: write_bits slack
        pos = np.empty(max(ncorr, 1), np.int32)
        vals = np.empty(max(ncorr, 1), np.uint8 if m.width == 8 else np.uint16)
        pfn = lib.wicca_pack1_pack_i8 if m.width == 8 else lib.wicca_pack1_pack_i16
        got = pfn(
            flat.ctypes.data_as(ctypes.c_char_p), m.n, m.npad, k,
            fields.ctypes.data_as(ctypes.c_char_p),
            pos.ctypes.data_as(ctypes.c_char_p),
            vals.ctypes.data_as(ctypes.c_char_p), ncorr,
        )
        assert got == ncorr, f"pack correction count drift: {got} != {ncorr}"
        bucket = _bucket(ncorr)
        parts = [fields[: m.npad * k // 8]]
        if bucket:
            if ncorr < bucket:  # pad with idempotent repeats
                pad = bucket - ncorr
                pos = np.concatenate([pos[:ncorr], np.full(pad, pos[ncorr - 1], np.int32)])
                vals = np.concatenate([vals[:ncorr], np.full(pad, vals[ncorr - 1], vals.dtype)])
            parts.append(pos.view(np.uint8))
            parts.append(vals if m.width == 8 else vals.view(np.uint8))
        return (k, bucket), parts
    z = _zigzag_np(flat, m.width)
    z = np.pad(z, (0, m.npad - m.n))
    k, ncorr = _choose_k_up(_tail_counts_np(z[: m.n], m.width), m.npad, m.width)
    if k == m.width:
        return (k, 0), [z if m.width == 8 else z.view(np.uint8)]
    marker = (1 << k) - 1
    bucket = _bucket(ncorr)
    parts = [_pack_fields_np(np.minimum(z, marker), k)]
    if bucket:
        pos = np.flatnonzero(z >= marker).astype(np.int32)
        vals = z[pos]
        if len(pos) < bucket:
            pad = bucket - len(pos)
            pos = np.concatenate([pos, np.full(pad, pos[-1], np.int32)])
            vals = np.concatenate([vals, np.full(pad, vals[-1], vals.dtype)])
        parts.append(pos.view(np.uint8))
        parts.append(vals if m.width == 8 else vals.view(np.uint8))
    return (k, bucket), parts
