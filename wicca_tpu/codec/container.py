"""On-disk container for encoded images (.wct — "wicca-tpu codestream").

Layout (little-endian):
  magic b'WCT4' | u8 wavelet | u8 levels | u8 lead(channels) | u32 orig_h | u32 orig_w |
  f32 base_step | f32 level_gain | u32 ll_h | u32 ll_w |
  u8 color (0 none / 1 rct / 2 ict) | f32 chroma_gain |
  u8 layout (0 global / 1 tiled) |
  raw LL plane (float32; int32 for integer/lossless wavelets — same stride,
  dtype implied by the wavelet id) |
  per level (fine->coarse), per band (lh,hl,hh):
    u8 codec (0=rice, 1=rc) | u8 dtype_code (0=int8,1=int16) |
    u32 sub_h | u32 sub_w | u32 nbytes | entropy bitstream

Quality-layered variant (``quality_layers`` > 1; SNR scalability):
  magic b'WCT5' | <same header through the layout byte> | u8 n_layers |
  raw LL plane |
  plane directory, per plane (fine->coarse): u8 dtype_code | u32 sub_h | u32 sub_w |
  per layer q = 0..n_layers-1 (coarse->fine), per plane:
    u8 codec | u32 nbytes | entropy bitstream

  Layer 0 carries the deadzone codes right-shifted (sign-magnitude) by
  n_layers-1 bits — EXACTLY the codes of the same encode at step
  ``base_step * 2**(n_layers-1)`` (floor(floor(x/q)/2^m) == floor(x/(q 2^m))).
  Each refinement layer is the ternary plane r_k = c_k - 2*c_{k-1} in
  {-1,0,1} (int8), entropy-coded like any other plane. A k-layer prefix
  therefore decodes bit-identically to a stream encoded at the coarser step;
  all layers reproduce the original codes exactly (lossless streams stay
  lossless). Layers are strictly append-only in the byte stream, so a
  truncated file/prefix decodes at reduced quality (``allow_truncated``).

Extended-header variants:
  WCT6 — written when bit_depth != 8 or the stream is ROI-coded: after the
  layout byte the header gains u8 bit_depth | u8 n_layers | u8 roi_shift |
  u8 bg_shift (n_layers == 1 -> flat sections, > 1 -> layered sections);
  detail planes may be int32 (dtype code 2).
  WCT7 — written when the spec carries visual frequency weighting
  (QuantSpec.hh_gain != 1): the WCT6 extended block + f32 hh_gain.
  WCT8 — written when the stream carries application metadata
  (``CodeStream.metadata``, attached via ``codec.with_metadata`` — the
  JPEG2000 XML/UUID-box analog for EXIF/ICC/notes): always the full
  extended block + f32 hh_gain, then u16 n_items | per item
  (u16 keylen | key utf-8 | u32 vallen | value), before the LL plane.
  Metadata is part of unit 0 so the CRC trailer protects it; decode
  ignores it; transcode preserves it.

Detail-plane codecs (both in wicca_tpu/native/entropy.cpp, formats FROZEN):
  0 rice — adaptive Rice/Golomb with zero-run blocks; fastest.
  1 rc   — context-modeled binary range coder; 10-25% smaller on clustered
           deadzone planes but ~5-6x slower to decode. ``codec='auto'``
           (default) keeps rc only when it is >=5% smaller
           (decode-cost-aware, probing big planes on contiguous row
           bands first); ``codec='rc'`` forces the range coder for every
           plane (on dense/noisy planes its stream can exceed rice's).

Older magics stay readable:
  WCT3 — no per-plane codec byte (all planes Rice).
  WCT2 — additionally no layout byte. Wide-wavelet streams decode tile-local
         (the fused Pallas kernels were the encoder for every shipped WCT2
         stream).
  WCT1 — additionally no color fields. db2/bior4.4/cdf97 WCT1 streams were
         encoded by the *global* XLA lifting transform (the tile-local
         kernels postdate the format), so they map to layout='global' —
         routing them through the tiled inverse would mis-decode images
         larger than one (512,1024) tile at every tile seam.

``layout='tiled'`` PINS the (512, 1024) per-pass tile grid as part of the
format, exactly like the pass partition (fine-side groups of <= 3 levels):
every shipped tiled stream was encoded on that grid, and both
``decode_at_level``'s ``orig_k`` clamps and ``decode_region``'s
hierarchical pass windows (codec/pipeline.region_plan) reconstruct it from
these constants. Changing ``ops.dwt_pallas._TILE_H/_TILE_W`` therefore
requires a new layout code, not just recompilation — old streams would
silently mis-decode at the old seams.

Integrity trailer (``checksums=True``, the default): after the last plane
section the writer appends
  b'WCTS' | u8 ver(1) | u32 n_units | per unit (u64 end_offset, u32 crc32) |
  u32 self_crc
Unit 0 is the structural prefix (header + LL plane + WCT5 plane directory);
units 1..N are the per-plane sections (meta + entropy blob), in byte order.
Old readers stop after the last plane and never see the trailer; files
without one simply skip verification. Because unit *offsets* are recorded,
corruption anywhere inside a plane section — including its length fields —
is contained to that plane: ``deserialize(..., on_error='zero')`` drops the
corrupt band (wavelet-codes-zero → graceful quality loss) and decodes the
rest. Corruption in unit 0 or in the trailer itself always raises.

The entropy stage runs plane-parallel on host threads (ctypes releases the
GIL). Decoding reproduces the CodeStream bit-exactly, so container roundtrip
+ TPU decode equals direct decode.
"""

from __future__ import annotations

import concurrent.futures
import logging
import struct
import zlib

import numpy as np

from wicca_tpu.codec.pipeline import CodeStream
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.native.rice import native_available, rc_decode, rc_encode, rice_decode, rice_encode

_MAGIC = b"WCT4"
_MAGIC_V5 = b"WCT5"  # quality-layered variant (written when quality_layers > 1)
# extended-header variant (written when bit_depth != 8 or the stream is
# ROI-coded): after the layout byte the header gains
# u8 bit_depth | u8 n_layers | u8 roi_shift | u8 bg_shift
# (n_layers == 1 -> flat WCT4-style sections, > 1 -> WCT5-style layered
# sections); detail planes may be int32 (dtype code 2)
_MAGIC_V6 = b"WCT6"
# WCT7 — written when the spec carries visual frequency weighting
# (QuantSpec.hh_gain != 1): WCT6 layout + f32 hh_gain after the BBBB block
_MAGIC_V7 = b"WCT7"
# WCT8 — written when the stream carries application metadata (the JPEG2000
# XML/UUID-box analog): always the full extended block (BBBB + f32 hh_gain),
# then u16 n_items | per item (u16 keylen | key utf-8 | u32 vallen | value),
# then the LL plane. Metadata lives inside unit 0, so the CRC trailer
# protects it; decode never reads it.
_MAGIC_V8 = b"WCT8"
# WCT9 — written when the stream carries an R-D truncation divisor table
# (CodeStream.band_div from codec.rd.truncate): always the full extended
# block (BBBB + f32 hh_gain), then u8 per detail plane (levels*3 bytes,
# fine->coarse) giving the integer divisor its codes were floor-divided by
# (decode dequantizes at step * div), then the WCT8-style metadata block
# (n_items may be 0), then the LL plane.
_MAGIC_V9 = b"WCT9"
# WCT10 — written when the LL plane is stored coded instead of raw
# (serialize(..., ll_codec=...)): always the full extended block + divisor
# table + metadata block, then the LL section
#   u8 ll_mode (1 = lossless Rice of the int32 LL, 2 = midtread-quantized
#   at f32 ll_step then Rice) | f32 ll_step | u32 nbytes | blob
# instead of the raw LL bytes. The raw-LL default (<= WCT9) is unchanged —
# LL coding is JPEG2000 parity for shallow-depth streams, where raw
# float32 LL is a rate floor (levels=3: 1.5 bpp of LL alone).
_MAGIC_V10 = b"WC10"
_ALL_MAGICS = (b"WCT1", b"WCT2", b"WCT3", b"WCT4", b"WCT5", b"WCT6", b"WCT7", b"WCT8", b"WCT9", b"WC10")
_VERSIONS = {m: i + 1 for i, m in enumerate(_ALL_MAGICS)}
_MAGIC_V3 = b"WCT3"  # still readable: no per-plane codec byte (all Rice)
_MAGIC_V2 = b"WCT2"  # still readable: no layout byte (all wide streams tiled)
_MAGIC_V1 = b"WCT1"  # still readable: no color fields; wide streams GLOBAL
_COLORS = {"none": 0, "rct": 1, "ict": 2}
_COLORS_INV = {v: k for k, v in _COLORS.items()}
_LAYOUTS = {"global": 0, "tiled": 1}
_LAYOUTS_INV = {v: k for k, v in _LAYOUTS.items()}
# WCT1-era wide float wavelets were encoded with the whole-image lifting
# transform (wicca_tpu.core.lifting), not the tile-local Pallas kernels
_V1_GLOBAL_WAVELET_IDS = {1, 2, 3}  # db2, bior4.4, cdf97
_DTYPES = {np.dtype(np.int8): 0, np.dtype(np.int16): 1, np.dtype(np.int32): 2}
_DTYPES_INV = {0: np.int8, 1: np.int16, 2: np.int32}
_WAVELETS = {"haar": 0, "db2": 1, "bior4.4": 2, "cdf97": 3, "haar_int": 4, "legall5.3": 5, "cdf53": 5}
_WAVELETS_INV = {0: "haar", 1: "db2", 2: "bior4.4", 3: "cdf97", 4: "haar_int", 5: "legall5.3"}
# integer (lossless) streams carry an int32 LL plane; same 4-byte stride as
# float32, dtype implied by the wavelet id
_INT_WAVELET_IDS = {4, 5}
_CODEC_RICE, _CODEC_RC = 0, 1
_TRAILER_MAGIC = b"WCTS"
_TRAILER_VER = 1


def peek_layers(data: bytes | str) -> int:
    """Quality-layer count recorded in a container header (1 for flat
    streams). Accepts raw bytes or a file path; reads only the header."""
    if isinstance(data, (str, bytes)) and not isinstance(data, bytes):
        with open(data, "rb") as f:
            data = f.read(64)
    if data[:4] not in _ALL_MAGICS:
        raise ValueError("not a WCT container")
    version = _VERSIONS[data[:4]]
    if version < 5:
        return 1
    off = 4 + struct.calcsize("<BBBIIffII") + struct.calcsize("<Bf") + 1
    if version == 5:
        return struct.unpack_from("<B", data, off)[0]
    return struct.unpack_from("<BBBB", data, off)[1]  # WCT6+: bit_depth, n_layers, ...


def _trailer_bytes(unit_ends: list[int]) -> bytes:
    """Integrity trailer: per-unit (end_offset, crc) + self-CRC (module doc)."""
    t = bytearray(_TRAILER_MAGIC)
    t += struct.pack("<BI", _TRAILER_VER, len(unit_ends))
    for end, crc in unit_ends:
        t += struct.pack("<QI", end, crc)
    t += struct.pack("<I", zlib.crc32(bytes(t)))
    return bytes(t)


def _read_trailer(data: bytes, n_units: int) -> list[tuple[int, int]] | None:
    """Locate + validate the trailer from EOF; None when absent/unreadable.
    (A damaged trailer is indistinguishable from 'no trailer written', so it
    degrades to unverified decode rather than raising.)"""
    size = 4 + 5 + 12 * n_units + 4
    if len(data) < size:
        return None
    t = data[len(data) - size :]
    if t[:4] != _TRAILER_MAGIC:
        return None
    if struct.unpack_from("<I", t, size - 4)[0] != zlib.crc32(t[: size - 4]):
        return None
    ver, n = struct.unpack_from("<BI", t, 4)
    if ver != _TRAILER_VER or n != n_units:
        return None
    return [struct.unpack_from("<QI", t, 9 + 12 * i) for i in range(n)]


def _scan_trailer_units(data: bytes) -> int | None:
    """Unit count of a valid trailer at EOF, found WITHOUT trusting the
    header (detects a corrupted levels/n_layers byte: the header-implied
    count then disagrees with the self-validated trailer)."""
    for n in range(4096):
        size = 13 + 12 * n
        if size > len(data):
            return None
        pos = len(data) - size
        if data[pos : pos + 4] == _TRAILER_MAGIC and _read_trailer(data, n) is not None:
            return n
    return None


# auto policy: the rc stream must be at least this much smaller than rice to
# be picked. rc decodes ~5-6x slower than rice (adaptive bit-by-bit range
# decoding vs ctz-driven Rice runs); on dense/noisy planes its win is only
# 1-4%, so paying the decode cost there made entropy decode the dominant
# folder-decode stage (measured: a noisy 53 MP frame's level-1 planes decode
# at 29 vs 176 MS/s for a 1.0% size win). Clustered photo detail planes win
# 10-37% and still ride rc.
_RC_MIN_WIN = 0.05


# auto probes big planes before paying the full rc encode: rc_encode runs at
# ~50-100 MB/s on dense content (vs rice's 300-600), and coding every 8th
# row predicts the full-plane rc-vs-rice size ratio to ~0.1% (measured on
# dense and clustered planes) — so planes whose probed win falls clearly
# under _RC_MIN_WIN skip the full rc pass entirely (~3-4 CPU-s per dense
# 53 MP frame). The 2% margin sends borderline planes through the exact
# comparison.
_PROBE_MIN_BYTES = 1 << 21
_PROBE_MARGIN = 0.02


def _encode_plane(plane: np.ndarray, codec: str) -> tuple[int, bytes]:
    """Entropy-code one detail plane -> (codec_id, blob) per the policy."""
    if codec == "rice" or not native_available():
        return _CODEC_RICE, rice_encode(plane)
    if codec == "rc":
        return _CODEC_RC, rc_encode(plane)
    # auto: rc only when its size win clears _RC_MIN_WIN (decode-cost-aware;
    # see above). codec='rc' above forces the range coder unconditionally.
    rice_blob = rice_encode(plane)
    if plane.nbytes >= _PROBE_MIN_BYTES:
        # CONTIGUOUS row bands (not strided rows: ::8 sampling aliases
        # against vertically-correlated content — it destroys the
        # up-neighbor context rc exploits and under-probes its win by >10x
        # on 8-row-banded planes). Two bands at 1/4 and 3/4 height cover
        # spatially-localized content a single central band could miss.
        h = plane.shape[-2]
        band = max(1, h // 16)
        rows = [
            plane[..., max(0, h // 4 - band // 2) : h // 4 + (band + 1) // 2, :],
            plane[..., max(0, 3 * h // 4 - band // 2) : 3 * h // 4 + (band + 1) // 2, :],
        ]
        probe = np.ascontiguousarray(np.concatenate(rows, axis=-2))
        win = 1.0 - len(rc_encode(probe)) / max(len(rice_encode(probe)), 1)
        if win < _RC_MIN_WIN - _PROBE_MARGIN:
            return _CODEC_RICE, rice_blob
    rc_blob = rc_encode(plane)
    if len(rc_blob) < (1.0 - _RC_MIN_WIN) * len(rice_blob):
        return _CODEC_RC, rc_blob
    return _CODEC_RICE, rice_blob


def _split_layers(plane: np.ndarray, n_layers: int) -> list[np.ndarray]:
    """Deadzone codes -> [c0 (plane dtype), r_1..r_{L-1} ternary int8].

    Sign-magnitude bit-plane split: c_k = sign(c) * (|c| >> (L-1-k)), so c_k
    equals the deadzone code of the same data at step*2**(L-1-k) and each
    refinement r_k = c_k - 2*c_{k-1} is in {-1, 0, 1}."""
    mag = np.abs(plane.astype(np.int32))
    sg = np.sign(plane).astype(np.int32)
    prev = sg * (mag >> (n_layers - 1))
    subs = [prev.astype(plane.dtype)]
    for k in range(1, n_layers):
        cur = sg * (mag >> (n_layers - 1 - k))
        subs.append((cur - 2 * prev).astype(np.int8))
        prev = cur
    return subs


def _join_layers(subs: list[np.ndarray], dtype) -> np.ndarray:
    """Inverse of :func:`_split_layers` over any layer prefix."""
    c = subs[0].astype(np.int32)
    for r in subs[1:]:
        c = 2 * c + r
    return c.astype(dtype)


def _widen_codes(plane: np.ndarray, missing: int, dtype) -> np.ndarray:
    """Integer-wavelet (lossless) streams truncated ``missing`` layers early:
    reconstruct midpoint detail ints — |c| lies in [|c_k| 2^m, (|c_k|+1) 2^m),
    so sign(c_k) * ((|c_k| << m) + 2^(m-1)) (0 stays 0, deadzone-style)."""
    if missing == 0:
        return plane.astype(dtype)
    mag = np.abs(plane.astype(np.int32))
    sg = np.sign(plane).astype(np.int32)
    return (sg * ((mag << missing) + (1 << (missing - 1)))).astype(dtype)


def serialize(
    stream: CodeStream,
    threads: int = 8,
    codec: str = "auto",
    quality_layers: int = 1,
    checksums: bool = True,
    ll_codec: str = "raw",
    ll_step: float = 0.125,
) -> bytes:
    """CodeStream -> container bytes (detail planes entropy-coded in parallel).

    ``codec``: 'auto' (default — per-plane decode-cost-aware pick), 'rice'
    (fastest), or 'rc' (context-modeled range coder). Falls back to rice when
    the native library is unavailable.

    ``quality_layers`` > 1 writes the SNR-scalable WCT5 variant: the stream
    splits into that many quality layers; any layer prefix decodes at a
    coarser effective step (see module docstring), the full set reproduces
    the codes exactly.

    ``checksums`` (default) appends the integrity trailer (module docstring):
    ~12 bytes/plane; old readers ignore it, new readers verify and can
    contain corruption to single detail planes.

    ``ll_codec`` stores the LL plane coded instead of raw (WCT10):
    'rice' = lossless Rice of an integer LL (integer wavelets / hi-depth —
    pure size win, bit-exact); 'quant' = midtread quantization of a float
    LL at ``ll_step`` then Rice (sub-visible at the default 1/8 step; the
    raw float32 LL is otherwise a rate floor of ``4 * channels / 4**levels``
    bytes/pixel). Default 'raw' keeps the <= WCT9 layout byte-for-byte."""
    if codec not in ("auto", "rice", "rc"):
        raise ValueError(f"codec must be auto|rice|rc, got {codec!r}")
    if not 1 <= quality_layers <= 15:
        raise ValueError("quality_layers must be in [1, 15]")
    if ll_codec not in ("raw", "rice", "quant"):
        raise ValueError(f"ll_codec must be raw|rice|quant, got {ll_codec!r}")
    ll_dtype = np.int32 if _WAVELETS[stream.wavelet] in _INT_WAVELET_IDS else np.float32
    ll = np.asarray(stream.ll, dtype=ll_dtype)
    if ll_codec == "rice" and ll_dtype != np.int32:
        raise ValueError("ll_codec='rice' is lossless for INTEGER LL planes; use 'quant' for float LL")
    if ll_codec == "quant" and ll_dtype != np.float32:
        raise ValueError("ll_codec='quant' quantizes FLOAT LL planes; integer LL is lossless with 'rice'")
    if ll_codec == "quant" and not ll_step > 0:
        raise ValueError("ll_step must be positive")
    lead = ll.shape[0] if ll.ndim == 3 else 1
    planes = [np.asarray(b) for bands in stream.details for b in bands]
    out = bytearray()
    bit_depth = getattr(stream, "bit_depth", 8)
    roi_shift = getattr(stream, "roi_shift", 0)
    bg_shift = getattr(stream, "bg_shift", 0)
    hh_gain = getattr(stream.spec, "hh_gain", 1.0)
    meta = tuple(getattr(stream, "metadata", ()) or ())
    band_div = tuple(getattr(stream, "band_div", ()) or ())
    v10 = ll_codec != "raw"
    v9 = any(d != 1 for d in band_div) and not v10
    v8 = bool(meta) and not v9 and not v10
    v7 = hh_gain != 1.0 and not v8 and not v9 and not v10
    v6 = (bit_depth != 8 or roi_shift > 0) and not v7 and not v8 and not v9 and not v10
    if v10:
        out += _MAGIC_V10
    elif v9:
        out += _MAGIC_V9
    elif v8:
        out += _MAGIC_V8
    elif v7:
        out += _MAGIC_V7
    elif v6:
        out += _MAGIC_V6
    else:
        out += _MAGIC_V5 if quality_layers > 1 else _MAGIC
    out += struct.pack(
        "<BBBIIffII",
        _WAVELETS[stream.wavelet],
        stream.levels,
        lead,
        stream.orig_shape[0],
        stream.orig_shape[1],
        stream.spec.base_step,
        stream.spec.level_gain,
        ll.shape[-2],
        ll.shape[-1],
    )
    out += struct.pack("<Bf", _COLORS[stream.color], stream.chroma_gain)
    out += struct.pack("<B", _LAYOUTS[stream.layout])
    if v6 or v7 or v8 or v9 or v10:
        out += struct.pack("<BBBB", bit_depth, quality_layers, roi_shift, bg_shift)
    if v7 or v8 or v9 or v10:
        out += struct.pack("<f", hh_gain)
    if v9 or v10:
        divs = band_div + (1,) * (stream.levels * 3 - len(band_div))
        if len(divs) != stream.levels * 3 or any(not 1 <= d <= 255 for d in divs):
            raise ValueError(f"band_div must hold levels*3 divisors in [1, 255], got {band_div}")
        out += bytes(divs)
    if v8 or v9 or v10:
        if len(meta) > 0xFFFF:
            raise ValueError("too many metadata items (max 65535)")
        out += struct.pack("<H", len(meta))
        for key, val in meta:
            kb = key.encode("utf-8")
            if len(kb) > 0xFFFF:
                raise ValueError(f"metadata key too long: {key[:40]!r}...")
            if len(val) > 0xFFFFFFFF:
                raise ValueError(f"metadata value for {key!r} exceeds 4 GiB")
            out += struct.pack("<H", len(kb)) + kb
            out += struct.pack("<I", len(val)) + val
    units: list[tuple[int, int]] = []  # (end_offset, crc32) per unit

    def _close_unit(start: int) -> None:
        units.append((len(out), zlib.crc32(bytes(out[start:]))))

    def _ll_section() -> bytes:
        if not v10:
            return ll.tobytes()
        if ll_codec == "rice":
            blob = rice_encode(ll.astype(np.int32))
            mode, step = 1, 0.0
        else:
            codes = np.round(ll / ll_step).astype(np.int32)
            blob = rice_encode(codes)
            mode, step = 2, ll_step
        return struct.pack("<BfI", mode, step, len(blob)) + blob

    if quality_layers == 1:
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
            encoded = list(pool.map(lambda p: _encode_plane(p, codec), planes))
        out += _ll_section()
        _close_unit(0)
        for plane, (codec_id, data) in zip(planes, encoded):
            start = len(out)
            out += struct.pack(
                "<BBIII", codec_id, _DTYPES[plane.dtype], plane.shape[-2], plane.shape[-1], len(data)
            )
            out += data
            _close_unit(start)
        if checksums:
            out += _trailer_bytes(units)
        return bytes(out)
    # WCT5..9 quality-layered: layer-major sections so any byte prefix
    # covering complete layers decodes at reduced quality (the v6+ extended
    # block already carries n_layers)
    if not (v6 or v7 or v8 or v9 or v10):
        out += struct.pack("<B", quality_layers)
    out += _ll_section()
    subs = [_split_layers(p, quality_layers) for p in planes]
    flat = [subs[i][q] for q in range(quality_layers) for i in range(len(planes))]
    with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
        encoded = list(pool.map(lambda p: _encode_plane(p, codec), flat))
    for plane in planes:
        out += struct.pack("<BII", _DTYPES[plane.dtype], plane.shape[-2], plane.shape[-1])
    _close_unit(0)
    for codec_id, data in encoded:
        start = len(out)
        out += struct.pack("<BI", codec_id, len(data))
        out += data
        _close_unit(start)
    if checksums:
        out += _trailer_bytes(units)
    return bytes(out)


def _read_metadata(data: bytes, off: int, version: int) -> tuple[tuple, int]:
    """WCT8 metadata block at ``off`` -> ((key, value), ...), new offset.
    Malformed blocks raise ValueError (the container's error contract),
    never raw struct/unicode errors."""
    if version < 8:
        return (), off
    try:
        (n_items,) = struct.unpack_from("<H", data, off)
        off += 2
        items = []
        for _ in range(n_items):
            (klen,) = struct.unpack_from("<H", data, off)
            off += 2
            key = data[off : off + klen].decode("utf-8")
            off += klen
            (vlen,) = struct.unpack_from("<I", data, off)
            off += 4
            if off + vlen > len(data):
                raise ValueError("metadata value overruns the container")
            items.append((key, bytes(data[off : off + vlen])))
            off += vlen
    except (struct.error, UnicodeDecodeError) as e:
        raise ValueError(f"container metadata block corrupt: {e}") from None
    return tuple(items), off


def deserialize(
    data: bytes,
    threads: int = 8,
    max_layers: int | None = None,
    allow_truncated: bool = False,
    on_error: str = "raise",
) -> CodeStream:
    """Container bytes -> CodeStream (planes decoded in parallel).

    For quality-layered (WCT5) containers, ``max_layers`` decodes only that
    many layers — bit-identical to a stream encoded at step*2**missing.
    ``allow_truncated`` accepts a byte PREFIX of a layered container and
    decodes the complete layers it holds (progressive transmission).

    When the container carries an integrity trailer (written by default),
    every section is CRC-verified before entropy decode. ``on_error='raise'``
    (default) raises :class:`ValueError` naming the corrupt sections;
    ``on_error='zero'`` zeroes the affected detail planes (for layered
    streams, keeps each plane's intact layer prefix) and decodes the rest —
    corruption of the header/LL section always raises."""
    if on_error not in ("raise", "zero"):
        raise ValueError(f"on_error must be raise|zero, got {on_error!r}")
    if data[:4] not in _ALL_MAGICS:
        raise ValueError("not a WCT container")
    version = _VERSIONS[data[:4]]
    off = 4
    wv, levels, lead, oh, ow, base_step, level_gain, llh, llw = struct.unpack_from("<BBBIIffII", data, off)
    off += struct.calcsize("<BBBIIffII")
    if version == 1:
        color, chroma_gain = 0, 1.0
    else:
        color, chroma_gain = struct.unpack_from("<Bf", data, off)
        off += struct.calcsize("<Bf")
    if version >= 3:
        (layout_code,) = struct.unpack_from("<B", data, off)
        off += 1
        layout = _LAYOUTS_INV[layout_code]
    elif version == 1 and wv in _V1_GLOBAL_WAVELET_IDS:
        layout = "global"
    else:
        layout = "tiled"
    n_layers = 1
    bit_depth = 8
    roi_shift = bg_shift = 0
    hh_gain = 1.0
    if version == 5:
        (n_layers,) = struct.unpack_from("<B", data, off)
        off += 1
    elif version >= 6:
        bit_depth, n_layers, roi_shift, bg_shift = struct.unpack_from("<BBBB", data, off)
        off += 4
    if version >= 7:
        (hh_gain,) = struct.unpack_from("<f", data, off)
        off += 4
    band_div: tuple[int, ...] = ()
    if version >= 9:
        divs = tuple(data[off : off + levels * 3])
        off += levels * 3
        if len(divs) != levels * 3 or any(d < 1 for d in divs):
            raise ValueError("container divisor table corrupt")
        band_div = divs if any(d != 1 for d in divs) else ()
    metadata, off = _read_metadata(data, off, version)
    layered = version == 5 or (version >= 6 and n_layers > 1)
    ll_dtype = np.int32 if wv in _INT_WAVELET_IDS else np.float32
    if version >= 10:
        ll_mode, ll_step, ll_nbytes = struct.unpack_from("<BfI", data, off)
        off += struct.calcsize("<BfI")
        if ll_mode not in (1, 2):
            raise ValueError(f"unknown LL coding mode {ll_mode}")
        codes = rice_decode(data[off : off + ll_nbytes], lead * llh * llw, np.int32)
        codes = codes.reshape(lead, llh, llw)
        ll = codes if ll_mode == 1 else (codes.astype(np.float32) * ll_step)
        ll = ll.astype(ll_dtype)
        off += ll_nbytes
    else:
        ll = np.frombuffer(data, dtype=ll_dtype, count=lead * llh * llw, offset=off).reshape(lead, llh, llw)
        off += ll.nbytes
    n_planes = levels * 3
    n_units = 1 + n_planes * (n_layers if layered else 1)
    trailer = _read_trailer(data, n_units)
    if trailer is None:
        scanned = _scan_trailer_units(data)
        if scanned is not None and scanned != n_units:
            raise ValueError(
                f"container header corrupt: trailer records {scanned} sections,"
                f" header implies {n_units}"
            )
    corrupt: list[str] = []

    def _dec(args):
        meta, blob = args
        if meta is None or blob is None:
            return None  # corrupt section — zeroed by the caller
        codec_id, dt_code, sh, sw = meta
        dtype = _DTYPES_INV[dt_code]
        if codec_id == _CODEC_RC:
            return rc_decode(blob, (lead, sh, sw), dtype)
        return rice_decode(blob, lead * sh * sw, dtype).reshape(lead, sh, sw)

    if layered:
        dirs = []
        for _ in range(n_planes):
            dt_code, sh, sw = struct.unpack_from("<BII", data, off)
            off += struct.calcsize("<BII")
            dirs.append((dt_code, sh, sw))
        want = n_layers if max_layers is None else max(1, min(max_layers, n_layers))
        metas, blobs, have = [], [], 0
        if trailer is not None:
            if trailer[0][0] != off or zlib.crc32(data[:off]) != trailer[0][1]:
                raise ValueError("container header/LL section corrupt (checksum mismatch)")
            msz = struct.calcsize("<BI")
            have = want
            for q in range(want):
                for i in range(n_planes):
                    j = q * n_planes + i
                    start, end = trailer[j][0], trailer[j + 1][0]
                    sec = data[start:end]
                    dt_code, sh, sw = dirs[i]
                    if zlib.crc32(sec) != trailer[j + 1][1] or len(sec) < msz:
                        corrupt.append(f"layer {q} plane {i}")
                        metas.append(None)
                        blobs.append(None)
                        continue
                    codec_id, nbytes = struct.unpack_from("<BI", sec, 0)
                    metas.append((codec_id, dt_code if q == 0 else 0, sh, sw))
                    blobs.append(sec[msz : msz + nbytes])
            if corrupt:
                if on_error == "raise":
                    raise ValueError(
                        f"container corrupt in {len(corrupt)} section(s):"
                        f" {', '.join(corrupt)} (pass on_error='zero' to decode around them)"
                    )
                logging.warning(
                    f"decoding around {len(corrupt)} corrupt section(s): {', '.join(corrupt)}"
                )
        else:
            for q in range(want):
                layer_metas, layer_blobs = [], []
                try:
                    for i in range(n_planes):
                        codec_id, nbytes = struct.unpack_from("<BI", data, off)
                        off += struct.calcsize("<BI")
                        # a truncated checksummed file may leave trailer
                        # fragments after the last whole layer — reject them
                        if codec_id > _CODEC_RC or off + nbytes > len(data):
                            raise struct.error("truncated blob")
                        dt_code, sh, sw = dirs[i]
                        layer_metas.append((codec_id, dt_code if q == 0 else 0, sh, sw))
                        layer_blobs.append(data[off : off + nbytes])
                        off += nbytes
                except struct.error:
                    if allow_truncated and have >= 1:
                        break
                    raise ValueError(
                        f"truncated layered container: {have}/{want} complete layers"
                        " (pass allow_truncated=True to decode the prefix)"
                    ) from None
                metas.extend(layer_metas)
                blobs.extend(layer_blobs)
                have += 1
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
            subs = list(pool.map(_dec, zip(metas, blobs)))
        missing = n_layers - have
        if roi_shift and missing >= roi_shift:
            raise ValueError(
                f"ROI stream truncated beyond its {roi_shift} guard bits"
                f" ({missing} layers missing) — ROI/background codes are no"
                " longer separable by magnitude"
            )
        planes = []
        for i, (dt_code, sh, sw) in enumerate(dirs):
            dtype = _DTYPES_INV[dt_code]
            # a corrupt layer invalidates that plane's later refinements too:
            # keep the intact prefix (refinements are deltas on earlier layers)
            plane_subs = []
            for q in range(have):
                s = subs[q * n_planes + i]
                if s is None:
                    break
                plane_subs.append(s)
            miss_i = n_layers - len(plane_subs)
            if not plane_subs or (roi_shift and miss_i > missing):
                # fully corrupt — or, for an ROI stream, partially corrupt:
                # a per-plane deeper prefix is incoherent in the shifted
                # domain (the maxshift threshold is global), so drop the band
                planes.append(np.zeros((lead, sh, sw), dtype=dtype))
                continue
            c = _join_layers(plane_subs, dtype)
            if roi_shift:
                pass  # truncation folds into roi/bg shifts below, not codes
            elif wv in _INT_WAVELET_IDS:
                # lossless stream: approximate the missing low bits (midpoint)
                c = _widen_codes(c, miss_i, dtype if miss_i == 0 else np.int32)
            elif miss_i > missing:
                # this plane lost MORE layers than the global truncation level:
                # midpoint-widen its codes up to the global scale, saturating
                # into the stored dtype
                info = np.iinfo(dtype)
                wide = _widen_codes(c, miss_i - missing, np.int64)
                c = np.clip(wide, info.min, info.max).astype(dtype)
            planes.append(c)
        if missing:
            if roi_shift:
                # shifted-domain truncation: ROI codes spent `missing` of
                # their guard bits (still exact after >> (roi_shift-missing));
                # background lost `missing` real bits (midpoint-widened by the
                # decoder's bg_shift). base_step stays UNSCALED — the shifts
                # carry the whole adjustment.
                roi_shift -= missing
                bg_shift += missing
            elif wv not in _INT_WAVELET_IDS:
                # a layer prefix IS the coarser-step encode: scale the spec
                base_step = base_step * float(1 << missing)
    else:
        metas = []
        blobs = []
        if trailer is not None:
            if trailer[0][0] != off or zlib.crc32(data[:off]) != trailer[0][1]:
                raise ValueError("container header/LL section corrupt (checksum mismatch)")
            msz = struct.calcsize("<BBIII")  # the trailer postdates WCT4
            for i in range(n_planes):
                start, end = trailer[i][0], trailer[i + 1][0]
                sec = data[start:end]
                if zlib.crc32(sec) != trailer[i + 1][1] or len(sec) < msz:
                    corrupt.append(f"plane {i}")
                    metas.append(None)
                    blobs.append(None)
                    continue
                codec_id, dt_code, sh, sw, nbytes = struct.unpack_from("<BBIII", sec, 0)
                metas.append((codec_id, dt_code, sh, sw))
                blobs.append(sec[msz : msz + nbytes])
            if corrupt:
                if on_error == "raise":
                    raise ValueError(
                        f"container corrupt in {len(corrupt)} section(s):"
                        f" {', '.join(corrupt)} (pass on_error='zero' to decode around them)"
                    )
                logging.warning(
                    f"decoding around {len(corrupt)} corrupt section(s): {', '.join(corrupt)}"
                )
                # a corrupt section loses its own geometry record; the 3 bands
                # of a level share shape/dtype, so recover from a sibling
                for i, m in enumerate(metas):
                    if m is not None:
                        continue
                    lvl0 = i - i % 3
                    sib = next((metas[j] for j in range(lvl0, lvl0 + 3) if metas[j] is not None), None)
                    if sib is None:
                        raise ValueError(
                            f"all three subbands of level {i // 3 + 1} are corrupt —"
                            " plane geometry unrecoverable"
                        )
                    metas[i] = (_CODEC_RICE, sib[1], sib[2], sib[3])
                    blobs[i] = None
        else:
            for _ in range(n_planes):
                if version >= 4:
                    codec_id, dt_code, sh, sw, nbytes = struct.unpack_from("<BBIII", data, off)
                    off += struct.calcsize("<BBIII")
                else:
                    dt_code, sh, sw, nbytes = struct.unpack_from("<BIII", data, off)
                    off += struct.calcsize("<BIII")
                    codec_id = _CODEC_RICE
                metas.append((codec_id, dt_code, sh, sw))
                blobs.append(data[off : off + nbytes])
                off += nbytes
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
            planes = list(pool.map(_dec, zip(metas, blobs)))
        for i, p in enumerate(planes):
            if p is None:  # corrupt section -> zero band (graceful quality loss)
                _, dt_code, sh, sw = metas[i]
                planes[i] = np.zeros((lead, sh, sw), dtype=_DTYPES_INV[dt_code])
    details = tuple(tuple(planes[i * 3 : i * 3 + 3]) for i in range(levels))
    spec = QuantSpec(base_step=base_step, level_gain=level_gain, hh_gain=hh_gain)
    return CodeStream(
        ll=ll, details=details, spec=spec, levels=levels, orig_shape=(oh, ow),
        wavelet=_WAVELETS_INV[wv], color=_COLORS_INV[color], chroma_gain=float(chroma_gain),
        layout=layout, bit_depth=int(bit_depth), roi_shift=int(roi_shift), bg_shift=int(bg_shift),
        metadata=metadata, band_div=band_div,
    )


_BAND_NAMES = ("lh", "hl", "hh")
_CODEC_NAMES = {_CODEC_RICE: "rice", _CODEC_RC: "rc"}


def inspect(data: bytes | str, verify: bool = True) -> dict:
    """Structural dump of a ``.wct`` container WITHOUT entropy-decoding it
    (the ``opj_dump`` analog: format triage, scripted stream audits).

    Accepts raw bytes or a file path. Returns a dict:

    - header fields: ``version wavelet levels channels orig_shape bit_depth
      base_step level_gain hh_gain color chroma_gain layout ll_shape
      quality_layers roi_shift bg_shift``
    - ``planes``: one entry per detail-plane section in byte order —
      ``{level, band, layer, codec, dtype, shape, nbytes}`` (``layer`` only
      for layered streams). Truncated layered files list the complete-layer
      prefix; ``complete_layers`` records how many survived.
    - ``total_bytes``, ``ll_bytes``, ``entropy_bytes``, ``bpp`` (coded bits
      per source pixel), ``compression_ratio`` (raw source bytes / coded)
    - ``metadata``: key -> value size of the WCT8 metadata box ({} when
      absent); ``metadata_error`` is a damage note when the box is
      unparseable (the dump degrades instead of raising)
    - ``checksummed`` (trailer present) and, with ``verify`` (default),
      ``integrity`` = 'ok' | 'corrupt' | 'unverified' plus
      ``corrupt_sections`` naming any failing units — exactly the sections
      :func:`deserialize` would reject or (``on_error='zero'``) drop.
    """
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    if data[:4] not in _ALL_MAGICS:
        raise ValueError("not a WCT container")
    version = _VERSIONS[data[:4]]
    off = 4
    wv, levels, lead, oh, ow, base_step, level_gain, llh, llw = struct.unpack_from("<BBBIIffII", data, off)
    off += struct.calcsize("<BBBIIffII")
    if version == 1:
        color, chroma_gain = 0, 1.0
    else:
        color, chroma_gain = struct.unpack_from("<Bf", data, off)
        off += struct.calcsize("<Bf")
    if version >= 3:
        layout = _LAYOUTS_INV[struct.unpack_from("<B", data, off)[0]]
        off += 1
    elif version == 1 and wv in _V1_GLOBAL_WAVELET_IDS:
        layout = "global"
    else:
        layout = "tiled"
    n_layers, bit_depth, roi_shift, bg_shift, hh_gain = 1, 8, 0, 0, 1.0
    if version == 5:
        (n_layers,) = struct.unpack_from("<B", data, off)
        off += 1
    elif version >= 6:
        bit_depth, n_layers, roi_shift, bg_shift = struct.unpack_from("<BBBB", data, off)
        off += 4
    if version >= 7:
        (hh_gain,) = struct.unpack_from("<f", data, off)
        off += 4
    band_div = ()
    if version >= 9:
        band_div = tuple(data[off : off + levels * 3])
        off += levels * 3
    try:
        meta_items, off = _read_metadata(data, off, version)
        meta_note = None
    except ValueError as e:
        # report the damage instead of refusing the whole dump; the CRC
        # audit below independently flags unit 0 as corrupt
        meta_items, meta_note = (), str(e)
        off = len(data)  # geometry unrecoverable past this point
    layered = version == 5 or (version >= 6 and n_layers > 1)
    ll_dtype = np.int32 if wv in _INT_WAVELET_IDS else np.float32
    ll_mode, ll_step = 0, 0.0  # 0 = raw
    if version >= 10:
        ll_mode, ll_step, ll_bytes = struct.unpack_from("<BfI", data, off)
        off += struct.calcsize("<BfI") + ll_bytes
    else:
        ll_bytes = lead * llh * llw * np.dtype(ll_dtype).itemsize
        off += ll_bytes
    n_planes = levels * 3
    n_units = 1 + n_planes * (n_layers if layered else 1)

    planes: list[dict] = []
    # start at 0 and count up as layers parse — if the metadata block or
    # plane directory is unreadable the dump must NOT report
    # n_layers/n_layers complete (ADVICE r3); flat streams flip to 1 only
    # once their whole plane section parses
    complete_layers = 0
    entropy_bytes = 0
    try:
        if layered:
            dirs = []
            for _ in range(n_planes):
                dt_code, sh, sw = struct.unpack_from("<BII", data, off)
                off += struct.calcsize("<BII")
                dirs.append((dt_code, sh, sw))
            for q in range(n_layers):
                layer_planes = []
                for i in range(n_planes):
                    codec_id, nbytes = struct.unpack_from("<BI", data, off)
                    off += struct.calcsize("<BI")
                    if codec_id > _CODEC_RC or off + nbytes > len(data):
                        raise struct.error("truncated")
                    dt_code, sh, sw = dirs[i]
                    dt = np.int8 if q > 0 else _DTYPES_INV[dt_code]
                    layer_planes.append(
                        dict(level=i // 3 + 1, band=_BAND_NAMES[i % 3], layer=q,
                             codec=_CODEC_NAMES[codec_id], dtype=np.dtype(dt).name,
                             shape=(lead, sh, sw), nbytes=nbytes))
                    off += nbytes
                planes.extend(layer_planes)
                entropy_bytes += sum(p["nbytes"] for p in layer_planes)
                complete_layers += 1
        else:
            for i in range(n_planes):
                if version >= 4:
                    codec_id, dt_code, sh, sw, nbytes = struct.unpack_from("<BBIII", data, off)
                    off += struct.calcsize("<BBIII")
                else:
                    dt_code, sh, sw, nbytes = struct.unpack_from("<BIII", data, off)
                    off += struct.calcsize("<BIII")
                    codec_id = _CODEC_RICE
                if codec_id > _CODEC_RC or off + nbytes > len(data):
                    raise struct.error("truncated")
                planes.append(
                    dict(level=i // 3 + 1, band=_BAND_NAMES[i % 3],
                         codec=_CODEC_NAMES[codec_id], dtype=np.dtype(_DTYPES_INV[dt_code]).name,
                         shape=(lead, sh, sw), nbytes=nbytes))
                entropy_bytes += nbytes
                off += nbytes
            complete_layers = 1
    except struct.error:
        pass  # truncated stream: report the intact prefix

    trailer = _read_trailer(data, n_units)
    integrity, corrupt = "unverified", []
    if trailer is not None and verify:
        prev = 0
        for i, (end, crc) in enumerate(trailer):
            sec = data[prev:end]
            if zlib.crc32(sec) != crc:
                corrupt.append("header/LL" if i == 0 else f"section {i}")
            prev = end
        integrity = "corrupt" if corrupt else "ok"
    src_bytes = oh * ow * lead * max(1, (bit_depth + 7) // 8)
    return dict(
        version=version, wavelet=_WAVELETS_INV[wv], levels=levels, channels=lead,
        orig_shape=(oh, ow), bit_depth=bit_depth, base_step=base_step,
        level_gain=level_gain, hh_gain=hh_gain, color=_COLORS_INV[color],
        chroma_gain=float(chroma_gain), layout=layout, ll_shape=(lead, llh, llw),
        quality_layers=n_layers, complete_layers=complete_layers,
        roi_shift=roi_shift, bg_shift=bg_shift, band_div=list(band_div),
        ll_mode={0: "raw", 1: "rice", 2: "quant"}.get(ll_mode, ll_mode), ll_step=ll_step,
        metadata={k: len(v) for k, v in meta_items},
        metadata_error=meta_note,
        planes=planes, total_bytes=len(data), ll_bytes=ll_bytes,
        entropy_bytes=entropy_bytes, bpp=8.0 * len(data) / (oh * ow),
        compression_ratio=src_bytes / len(data),
        checksummed=trailer is not None, integrity=integrity,
        corrupt_sections=corrupt,
    )


def save(
    stream: CodeStream,
    path: str,
    threads: int = 8,
    codec: str = "auto",
    quality_layers: int = 1,
    checksums: bool = True,
    ll_codec: str = "raw",
    ll_step: float = 0.125,
) -> int:
    data = serialize(stream, threads, codec, quality_layers, checksums=checksums,
                     ll_codec=ll_codec, ll_step=ll_step)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load(
    path: str,
    threads: int = 8,
    max_layers: int | None = None,
    allow_truncated: bool = False,
    on_error: str = "raise",
) -> CodeStream:
    with open(path, "rb") as f:
        return deserialize(
            f.read(), threads, max_layers=max_layers, allow_truncated=allow_truncated, on_error=on_error
        )
