"""Folder-level batch codec: host IO overlapped with device transforms.

The reference's hot loop was serial per-image host work (SURVEY.md §3.2 —
imread + full-res numpy Haar per classifier per depth); its roadmap item
"Optimize for large-scale datasets" was never built. This is that layer for
the TPU codec: image decode (CPU threads) runs ahead of the device encode,
and entropy coding + file writes trail behind it (ctypes releases the GIL),
so the chip never waits on the host for same-shape datasets. Lookahead is
bounded, so gigapixel folders stream at O(prefetch) host memory.

``encode_folder`` / ``decode_folder`` return a structured metrics dict
(SURVEY.md §5 observability row); the CLI exposes them as
``encode-batch`` / ``decode-batch``.
"""

from __future__ import annotations

import concurrent.futures
import functools
import logging
import time
from pathlib import Path

import numpy as np

from wicca_tpu.codec.container import load as load_wct
from wicca_tpu.codec.container import save as save_wct
from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.codec.transfer import fetch_array_parallel, fetch_stream, put_stream
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.data.loader import from_planar, list_images, load_image, load_image_raw, to_planar


def _encode_route(img: np.ndarray, wavelet: str, color: str, bit_depth: int | None,
                  keep_alpha: bool, path: str) -> str:
    """Host-vs-device routing for one encode, by measured bandwidths (the
    forward twin of :func:`_decode_route`): device cost = full-resolution
    H2D + packed code fetch over the measured link; host cost = megapixels
    / measured host forward-cascade rate (bit-identical streams either way,
    tests/test_host_encode.py). WICCA_TPU_ENCODE_PATH overrides."""
    import os

    from wicca_tpu.codec import host_encode, transfer

    path = os.environ.get("WICCA_TPU_ENCODE_PATH", path).lower()
    if path not in ("host", "device", "auto"):
        raise ValueError(f"encode path must be host|device|auto, got {path!r}")
    if not host_encode.supported_encode(img, wavelet, color, bit_depth, keep_alpha):
        return "device"
    if path != "auto":
        return path
    link = transfer.link_bandwidth(probe=True)
    if link is None or link != link or link == float("inf"):
        return "device"
    mp = img.shape[0] * img.shape[1] / 1e6
    # up = raw planes; down = packed detail codes (~0.65x the plane bytes)
    device_s = img.nbytes * (1.0 + (0.65 if transfer.enabled() else 1.0)) / link + 0.002
    host_s = mp / host_encode.measured_mp_per_s()
    return "host" if host_s < device_s else "device"


def encode_folder(
    in_dir: str | Path,
    out_dir: str | Path,
    levels: int = 5,
    spec: QuantSpec = QuantSpec(),
    wavelet: str = "haar",
    color: str = "none",
    chroma_gain: float = 1.0,
    bit_depth: int | None = None,
    codec: str = "auto",
    quality_layers: int = 1,
    threads: int = 8,
    prefetch: int | None = None,
    keep_alpha: bool = False,
    resume: bool = False,
    metadata: dict[str, bytes | str] | None = None,
    ll_codec: str = "raw",
    ll_step: float = 0.125,
    path: str = "auto",
) -> dict:
    """Encode every image in ``in_dir`` to ``<out_dir>/<stem>.wct``.

    Pipeline: ``prefetch`` loader threads run ahead of the device encode;
    serialize+write futures trail behind. Same-shape images reuse one
    compiled encode (jit shape cache). ``keep_alpha`` codes RGBA sources as
    4-component streams (mirrors the single-image encode path; RGB sources
    are unaffected). ``resume`` skips sources whose ``.wct`` already exists
    (same semantics as the harness's resume: restartable long folder runs).
    ``metadata`` attaches the same key/value items (capture session, rig id)
    to every produced stream (container metadata box, WCT8).
    Returns throughput metrics."""
    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = list_images(in_dir)
    if not paths:
        raise ValueError(f"no images in {in_dir}")
    n_resumed = 0
    if resume:
        kept = [p for p in paths if not (out_dir / (p.stem + ".wct")).is_file()]
        n_resumed = len(paths) - len(kept)
        paths = kept
    lookahead = prefetch if prefetch is not None else max(2, threads // 2)
    if (bit_depth or 8) > 8 or keep_alpha:
        loader = functools.partial(load_image_raw, keep_alpha=keep_alpha)
    else:
        loader = load_image

    t0 = time.perf_counter()
    n_ok, n_host, mp_total, bytes_in, bytes_out = 0, 0, 0.0, 0, 0
    from wicca_tpu.codec import host_encode

    with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
        loads: list = []
        writes: list = []
        it = iter(paths)

        def _fill():
            for p in it:
                loads.append((p, pool.submit(loader, p)))
                if len(loads) >= lookahead:
                    return

        _fill()
        while loads:
            src, fut = loads.pop(0)
            _fill()
            img = fut.result()
            if img is None:
                logging.warning(f"skipping unreadable image {src}")
                continue
            route = _encode_route(img, wavelet, color, bit_depth, keep_alpha, path)
            dst = out_dir / (src.stem + ".wct")
            if route == "host":
                # forward cascade on the host (native/idwt.cpp): the frame
                # never crosses the link; .wct bytes are identical
                stream = host_encode.host_encode(to_planar(img), levels=levels, spec=spec)
                n_host += 1
            else:
                stream = encode(
                    to_planar(img), levels=levels, spec=spec, wavelet=wavelet,
                    color=color, chroma_gain=chroma_gain, bit_depth=bit_depth,
                )
            if metadata:
                from wicca_tpu.codec.pipeline import with_metadata

                stream = with_metadata(stream, metadata)
            # device streams: the pool task pulls the planes through the
            # packed-transfer fast path (codec/transfer.py: one fused
            # chunk-parallel fetch, ~2x fewer tunnel bytes, bit-exact) and
            # then entropy-codes + writes; disk bytes are identical to a
            # plain fetch. Host streams skip the fetch (already numpy).
            writes.append(pool.submit(
                lambda s, d, dev: save_wct(fetch_stream(s) if dev else s, d, threads, codec,
                                           quality_layers, ll_codec=ll_codec, ll_step=ll_step),
                stream, str(dst), route == "device",
            ))
            n_ok += 1
            mp_total += img.shape[0] * img.shape[1] / 1e6
            bytes_in += img.nbytes
        bytes_out = sum(w.result() for w in writes)
    seconds = time.perf_counter() - t0
    return {
        "images": n_ok,
        "skipped": len(paths) - n_ok,
        "resumed": n_resumed,
        "megapixels": round(mp_total, 4),
        "seconds": round(seconds, 3),
        "mp_per_s": round(mp_total / max(seconds, 1e-9), 2),
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "ratio": round(bytes_in / max(bytes_out, 1), 3),
        "host_encoded": n_host,
        "device_encoded": n_ok - n_host,
    }


def _decode_route(stream, at_level: int, path: str) -> str:
    """Host-vs-device routing for one stream, by measured bandwidths.

    Device cost = (coefficient upload + reconstruction D2H) / measured link
    bandwidth (:func:`wicca_tpu.codec.transfer.link_bandwidth`, probed once
    per process); host cost = megapixels / measured host IDWT throughput
    (:func:`wicca_tpu.codec.host_decode.measured_mp_per_s`). On a tunnel at
    tens of MB/s the host wins by ~30x for full-resolution decodes; on a
    PCIe-attached chip (GB/s) or CPU backend the device path wins. ``path``
    forces: 'host' | 'device' | 'auto' (WICCA_TPU_DECODE_PATH overrides)."""
    import os

    from wicca_tpu.codec import host_decode, transfer

    path = os.environ.get("WICCA_TPU_DECODE_PATH", path).lower()
    if path not in ("host", "device", "auto"):
        raise ValueError(f"decode path must be host|device|auto, got {path!r}")
    if not host_decode.supported(stream):
        return "device"
    if path != "auto":
        return path
    if stream.color == "ict":
        # the float 3x3 inverse rotation may round differently host-side
        # (XLA fusion/FMA) — a +-1 gray-level variance JPEG2000 permits,
        # but 'auto' must never make output depend on the route; opt in
        # with path='host' (tests pin the <=1 tolerance)
        return "device"
    link = transfer.link_bandwidth(probe=True)
    if link is None or link != link or link == float("inf"):
        return "device"
    h, w = stream.orig_shape
    nchan = int(np.prod(stream.ll.shape[:-2])) or 1
    # the device route uploads EVERY coefficient even for a coarse preview;
    # only the reconstruction D2H shrinks with at_level
    up = stream.num_bytes() * (0.65 if transfer.enabled() else 1.0)
    down = (h * w * nchan * (1 if stream.bit_depth <= 8 else 2)) >> (2 * at_level)
    device_s = (up + down) / link + 0.002  # + per-dispatch overhead
    host_s = (h * w / (1e6 * (1 << (2 * at_level)))) / host_decode.measured_mp_per_s(host_decode._rate_kind(stream))
    return "host" if host_s < device_s else "device"


def decode_folder(
    in_dir: str | Path,
    out_dir: str | Path,
    threads: int = 8,
    on_error: str = "raise",
    suffix: str = ".png",
    prefetch: int | None = None,
    at_level: int = 0,
    resume: bool = False,
    path: str = "auto",
) -> dict:
    """Decode every ``.wct`` in ``in_dir`` to ``<out_dir>/<stem><suffix>``
    (native dtype: uint8, or uint16 for hi-depth streams).

    ``at_level=r`` reconstructs at 1/2**r resolution from the coarse
    subbands only (resolution scalability) — the fast path for bulk
    thumbnail/preview extraction from an archive of streams. ``resume``
    skips streams whose output image already exists. ``path`` picks the
    reconstruction backend per stream (:func:`_decode_route`): 'auto'
    compares the measured link bandwidth against the measured host IDWT
    rate, so tunnel-attached chips decode on the host (bit-identical,
    tests/test_host_decode.py) while PCIe-attached chips keep the device
    path."""
    import cv2

    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(in_dir.glob("*.wct"))
    if not paths:
        raise ValueError(f"no .wct files in {in_dir}")
    n_resumed = 0
    if resume:
        kept = [p for p in paths if not (out_dir / (p.stem + suffix)).is_file()]
        n_resumed = len(paths) - len(kept)
        paths = kept
    lookahead = prefetch if prefetch is not None else max(2, threads // 2)

    import os

    # per-write deflate threads: writes already run `threads`-wide in the
    # pool, so each gets its share of the cores rather than all of them
    # (threads x cpu_count zlib threads would oversubscribe a big host)
    ncpu = os.cpu_count() or 1
    write_threads = max(1, ncpu // max(1, min(threads, ncpu)))

    def _write(rec: np.ndarray, dst: Path) -> int:
        if suffix == ".png" and rec.dtype == np.uint8:
            # strip-parallel native writer straight from the planar array
            # (no HWC interleave / BGR conversion; cv2 fallback inside)
            from wicca_tpu.data.pngw import write_png

            write_png(str(dst), rec, threads=write_threads)
            return rec.nbytes
        hwc = from_planar(rec)
        if hwc.ndim == 3:
            code = cv2.COLOR_RGBA2BGRA if hwc.shape[2] == 4 else cv2.COLOR_RGB2BGR
            cv2.imwrite(str(dst), cv2.cvtColor(hwc, code))
        else:
            cv2.imwrite(str(dst), hwc)
        return hwc.nbytes

    t0 = time.perf_counter()
    mp_total, bytes_in, n = 0.0, 0, 0
    with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
        loads: list = []
        writes: list = []
        it = iter(paths)

        from wicca_tpu.codec import host_decode

        n_host = 0

        def _load_and_stage(p):
            # entropy decode runs plane-parallel inside load_wct; the routed
            # device frames then ride the packed upload
            # (codec/transfer.put_stream) from this pool thread, overlapping
            # host pack work with the main thread's decode dispatch/fetch of
            # earlier frames. Host-routed frames stay on the host — the
            # whole point is never to cross the link.
            s = load_wct(str(p), threads, None, False, on_error)
            route = _decode_route(s, at_level, path)
            # load_wct returns host (numpy) planes: host-routed frames are
            # already where they need to be
            return (route, s if route == "host" else put_stream(s))

        def _fill():
            for p in it:
                loads.append((p, pool.submit(_load_and_stage, p)))
                if len(loads) >= lookahead:
                    return

        _fill()
        while loads:
            src, fut = loads.pop(0)
            _fill()
            route, stream = fut.result()
            if route == "host":
                rec = host_decode.host_decode(
                    stream, target_level=min(at_level, stream.levels) if at_level else 0
                )
                n_host += 1
            elif at_level:
                from wicca_tpu.codec.pipeline import decode_at_level

                rec = fetch_array_parallel(decode_at_level(stream, min(at_level, stream.levels), emit_u8=True))
            else:
                rec = fetch_array_parallel(decode(stream, emit_u8=True))
            writes.append(pool.submit(_write, rec, out_dir / (src.stem + suffix)))
            n += 1
            mp_total += stream.orig_shape[0] * stream.orig_shape[1] / 1e6
            bytes_in += src.stat().st_size
        bytes_out = sum(w.result() for w in writes)
    seconds = time.perf_counter() - t0
    return {
        "images": n,
        "resumed": n_resumed,
        "megapixels": round(mp_total, 4),
        "seconds": round(seconds, 3),
        "mp_per_s": round(mp_total / max(seconds, 1e-9), 2),
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "host_decoded": n_host,
        "device_decoded": n - n_host,
    }
