"""ClassifierProcessor — the comparison engine (reference L4 parity,
/root/reference/wicca/classifying_tools.py:105-562; SURVEY.md C3, C4, C14).

TPU-first redesign of the reference pipeline:

* **Icons are computed once per (image, depth) and reused across every
  classifier** — the reference recomputes the full-resolution DWT per
  classifier per depth (SURVEY.md §3.2 "major optimization target").
* The DWT runs on the TPU (:func:`wicca_tpu.ops.dwt_pallas.icon_pallas`,
  jnp fallback off-TPU); host JPEG decode overlaps device compute via the
  threaded prefetch iterator (:func:`wicca_tpu.data.loader.iter_decoded`).
* Images are bucket-padded (replicate) to limit XLA recompiles across
  varying shapes; Haar tile-locality keeps icons bit-exact after cropping.
* Classification resizes stay on host cv2 with the caller's interpolation,
  exactly like the reference (classifying_tools.py:315-318), so quality
  results are directly comparable.

Constructor signature and the results CSV layout match the reference
(SURVEY.md §2.5); `validate_output_folder` is non-interactive here
(``overwrite`` flag) — see wicca_tpu.data.validation.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any

import numpy as np

from wicca_tpu.analysis import results as rsltmgr
from wicca_tpu.config.aliases import Depth
from wicca_tpu.config.constants import ICON, MODEL, PRE_INP, DEC_PRED, SHAPE, SOURCE, RESULTS_FOLDER
from wicca_tpu.data.loader import iter_decoded, list_images, to_planar, from_planar
from wicca_tpu.data.normalization import normalize_depth
from wicca_tpu.data.validation import validate_input_folder, validate_output_folder

_BUCKET = 512  # pad H/W up to multiples of this to bound recompiles


def _icon_route(nbytes: int, megapixels: float) -> str:
    """Host-vs-device routing for icon computation, by measured bandwidths
    (the decode_folder cost model, codec.batch._decode_route, applied to
    the harness's other big upload): device cost = full-resolution H2D /
    measured link bandwidth; host cost = megapixels / measured numpy icon
    rate. The host icon (core/icon_host.py) is bit-exact by construction,
    so routing never changes results — only where the blocks get summed.
    WICCA_TPU_ICON_PATH forces host|device."""
    import os

    forced = os.environ.get("WICCA_TPU_ICON_PATH", "auto").lower()
    if forced in ("host", "device"):
        return forced
    from wicca_tpu.codec import transfer

    link = transfer.link_bandwidth(probe=True)
    if link is None or link != link or link == float("inf"):
        return "device"
    from wicca_tpu.core import icon_host

    device_s = nbytes / link + 0.002
    host_s = megapixels / icon_host.measured_mp_per_s()
    return "host" if host_s < device_s else "device"


def _roundtrip_route(nbytes: int, megapixels: float) -> str:
    """Routing for the full encode+decode roundtrip (compare='reconstruction').

    Unlike :func:`_icon_route` (one H2D, tiny icon back), the roundtrip pays
    BOTH link directions (raw planes up, full-resolution u8 reconstruction
    down via a plain fetch) and two host cascades, so it is priced with the
    host_encode/host_decode measured rates (same cost-model family as
    codec.batch._encode_route/_decode_route). Bit-identical either way;
    WICCA_TPU_ICON_PATH forces host|device for the whole harness."""
    import os

    forced = os.environ.get("WICCA_TPU_ICON_PATH", "auto").lower()
    if forced in ("host", "device"):
        return forced
    from wicca_tpu.codec import host_decode, host_encode, transfer

    link = transfer.link_bandwidth(probe=True)
    if link is None or link != link or link == float("inf"):
        return "device"
    device_s = 2.0 * nbytes / link + 0.004
    host_s = megapixels / host_encode.measured_mp_per_s() + megapixels / host_decode.measured_mp_per_s("haar")
    return "host" if host_s < device_s else "device"


def _compute_icon(image_hwc: np.ndarray, depth: int) -> np.ndarray:
    """Depth-d icon of one HWC uint8 image, bit-exact vs the reference
    HaarCoder (SURVEY.md §2.3) on every route: the device kernel
    (icon_pallas on TPU, haar_icon otherwise) or the host integer cascade
    (core/icon_host.py) when the measured link bandwidth loses to host
    compute (_icon_route).

    Bucket padding (replicate) only adds rows/cols below/right of the
    alignment padding; every kept icon pixel's 2^d x 2^d support is identical,
    so cropping restores the exact reference icon.
    """
    import jax

    from wicca_tpu.core.haar import haar_icon
    from wicca_tpu.core.pad import pad_to_multiple
    from wicca_tpu.ops.dwt_pallas import icon_pallas

    h, w = image_hwc.shape[:2]
    unit = 1 << depth
    out_h, out_w = -(-h // unit), -(-w // unit)
    planar = to_planar(image_hwc)
    if planar.dtype == np.uint8 and _icon_route(planar.nbytes, h * w / 1e6) == "host":
        from wicca_tpu.core.icon_host import icon_host

        return from_planar(icon_host(np.asarray(planar), depth))
    bucket = max(_BUCKET, unit)
    padded = pad_to_multiple(planar, bucket, mode="replicate")
    fn = icon_pallas if jax.default_backend() == "tpu" else haar_icon
    icon = np.asarray(fn(padded, depth))[..., :out_h, :out_w]
    return from_planar(icon)


def _compute_icons_batched(images_hwc: list[np.ndarray], depth: int) -> list[np.ndarray]:
    """Icons for a batch, grouping same-bucket images into single device
    calls (datasets of uniform resolution — the common production case —
    collapse to one kernel dispatch per batch instead of one per image)."""
    import jax

    from wicca_tpu.core.haar import haar_icon
    from wicca_tpu.core.pad import pad_to_multiple
    from wicca_tpu.ops.dwt_pallas import icon_pallas

    unit = 1 << depth
    bucket = max(_BUCKET, unit)
    total_bytes = sum(im.nbytes for im in images_hwc)
    total_mp = sum(im.shape[0] * im.shape[1] for im in images_hwc) / 1e6
    if all(im.dtype == np.uint8 for im in images_hwc) and _icon_route(total_bytes, total_mp) == "host":
        from wicca_tpu.core.icon_host import icon_host

        return [from_planar(icon_host(np.asarray(to_planar(im)), depth)) for im in images_hwc]
    fn = icon_pallas if jax.default_backend() == "tpu" else haar_icon
    icons: list[np.ndarray | None] = [None] * len(images_hwc)
    groups: dict[tuple[int, int, int], list[int]] = {}
    padded: list[np.ndarray] = []
    for idx, img in enumerate(images_hwc):
        p = np.asarray(pad_to_multiple(to_planar(img), bucket, mode="replicate"))
        padded.append(p)
        groups.setdefault(p.shape, []).append(idx)
    _MAX_STACK_BYTES = 512 * 1024 * 1024  # cap the device-resident stack
    for shape, idxs in groups.items():
        per = int(np.prod(shape))
        chunk = max(1, _MAX_STACK_BYTES // per)
        for start in range(0, len(idxs), chunk):
            part = idxs[start : start + chunk]
            stack = np.stack([padded[i] for i in part])
            out = np.asarray(fn(stack, depth))
            for j, idx in enumerate(part):
                h, w = images_hwc[idx].shape[:2]
                icons[idx] = from_planar(out[j][..., : -(-h // unit), : -(-w // unit)])
    return icons  # type: ignore[return-value]


def _resize(image_hwc: np.ndarray, shape: tuple[int, int], interpolation) -> np.ndarray:
    import cv2

    return cv2.resize(image_hwc, shape, interpolation=interpolation)


class ClassifierProcessor:
    """Drop-in equivalent of the reference ClassifierProcessor
    (classifying_tools.py:114-157): same ctor args, same result CSVs."""

    def __init__(
        self,
        data_folder: str | Path,
        wavelet_coder: Any = None,
        transform_depth: Depth = 3,
        interpolation: int = 3,  # cv2.INTER_AREA
        top_classes: int = 5,
        results_folder: str | Path = RESULTS_FOLDER,
        log_info: bool = True,
        parallel: int | None = None,
        batch_size: int = 25,
        overwrite: bool = True,
        resume: bool = False,
        compare: str = "icon",
        codec_spec=None,
        codec_wavelet: str = "haar",
        codec_color: str = "none",
    ):
        self.path = validate_input_folder(data_folder)
        self.coder = wavelet_coder  # optional custom coder: get_small_copy(img, depth)
        self.depth: Any = normalize_depth(transform_depth)
        if not (isinstance(top_classes, int) and top_classes > 0):
            msg = f"top_classes wants an int >= 1, got {top_classes!r}"
            logging.error(msg)
            raise ValueError(msg)
        self.top = top_classes
        self.interpolation = interpolation
        self.results_folder = validate_output_folder(results_folder, overwrite=overwrite)
        # `parallel` keeps the REFERENCE semantics (classifying_tools.py:
        # 389-438: thread fan-out across classifiers) on CPU/GPU backends,
        # where framework inference releases the GIL and concurrent
        # classifiers genuinely overlap. On a single TPU the device
        # serializes inference anyway, so classifier-level threads would only
        # add contention: there the knob sizes the host decode pool instead
        # and classifiers run serially (see _classifier_workers; documented
        # in docs/PARITY.md).
        self.parallel = parallel
        self.batch_size = batch_size
        # resume: skip (classifier, depth) pairs whose summary CSV already
        # exists (idempotent re-runs, SURVEY.md §5 'Failure detection')
        self.resume = resume
        # compare="icon": reference semantics (source vs LL icon).
        # compare="reconstruction": source vs the full quantized codec
        # roundtrip at the given depth — measures what quantization (not
        # resolution loss) costs the classifier. codec_spec defaults to
        # QuantSpec() when needed.
        if compare not in ("icon", "reconstruction"):
            raise ValueError("compare must be 'icon' or 'reconstruction'")
        self.compare = compare
        self.codec_spec = codec_spec
        # reconstruction-mode codec knobs: any built-in wavelet (all Pallas-
        # fused) and optional color decorrelation (core.color)
        if compare == "reconstruction":
            from wicca_tpu.core.lifting import is_integer_wavelet

            if codec_color == "rct" and not is_integer_wavelet(codec_wavelet):
                raise ValueError("codec_color='rct' needs an integer wavelet (legall5.3)")
            if codec_color == "ict" and is_integer_wavelet(codec_wavelet):
                raise ValueError("codec_color='ict' needs a float wavelet")
        self.codec_wavelet = codec_wavelet
        self.codec_color = codec_color
        if log_info:
            self._log_init_info()

    # -- info -------------------------------------------------------------

    def _log_init_info(self) -> None:
        """Dataset summary on init (reference classifying_tools.py:159-242:
        samples <= MAX_INFO_SAMPLE_SIZE images for mean dims / megapixels;
        rendered as Markdown inside Jupyter like the reference :213-228)."""
        from wicca_tpu.config.constants import MAX_INFO_SAMPLE_SIZE
        from wicca_tpu.utils.env import is_jupyter

        files = list_images(self.path)
        lines = [f"Dataset folder: {self.path}", f"Images found: {len(files)}"]
        sample = files[:MAX_INFO_SAMPLE_SIZE]
        dims = []
        for f in sample:
            try:
                import cv2

                img = cv2.imread(str(f))
                if img is not None:
                    dims.append(img.shape[:2])
            except ImportError:
                break
        if dims:
            mh = sum(d[0] for d in dims) / len(dims)
            mw = sum(d[1] for d in dims) / len(dims)
            lines.append(f"Mean image dimensions (n={len(dims)}): {mw:.0f}x{mh:.0f}")
            lines.append(f"Mean image resolution: {mh * mw / 1e6:.1f} MP")
        lines.append(f"Transform depths: {self.depth}")
        lines.append(f"Writing results to: {self.results_folder}")
        if is_jupyter():
            try:
                from IPython.display import Markdown, display  # type: ignore

                display(Markdown("**Dataset info**  \n" + "  \n".join(lines)))
                return
            except ImportError:
                pass
        print("\n".join(lines))

    # -- core -------------------------------------------------------------

    def _reconstruction(self, image_hwc: np.ndarray, depth: int) -> np.ndarray:
        """Full-resolution quantized codec roundtrip (compare='reconstruction')."""
        from wicca_tpu.codec.pipeline import decode, encode
        from wicca_tpu.core.quant import QuantSpec

        spec = self.codec_spec or QuantSpec()
        planar = to_planar(image_hwc)
        color = self.codec_color if planar.ndim == 3 and planar.shape[0] == 3 else "none"
        # same measured-bandwidth routing as decode_folder/encode_folder:
        # on a tunnel-bound chip the whole roundtrip stays on the host
        # (bit-identical streams and reconstructions)
        from wicca_tpu.codec import host_decode, host_encode

        if (
            host_encode.supported_encode(planar, self.codec_wavelet, color, 8)
            and _roundtrip_route(planar.nbytes, planar.shape[-2] * planar.shape[-1] / 1e6) == "host"
        ):
            stream = host_encode.host_encode(planar, levels=depth, spec=spec)
            return from_planar(host_decode.host_decode(stream))
        rec = np.asarray(
            decode(
                encode(planar, levels=depth, spec=spec, wavelet=self.codec_wavelet, color=color),
                emit_u8=True,
            )
        )
        return from_planar(rec)

    def _icon(self, image_hwc: np.ndarray, depth: int) -> np.ndarray:
        if self.coder is not None and hasattr(self.coder, "get_small_copy"):
            return self.coder.get_small_copy(image_hwc, depth)
        return _compute_icon(image_hwc, depth)

    def _classifier_workers(self, n_classifiers: int) -> int:
        """Classifier-level thread fan-out width (reference `parallel`
        semantics). 1 on TPU (one device serializes inference; threads only
        contend), else min(parallel or n, n) like the reference's
        ThreadPoolExecutor(max_workers=parallel)."""
        import jax

        if jax.default_backend() == "tpu":
            return 1
        return max(1, min(self.parallel or n_classifiers, n_classifiers))

    def _classify_depth(
        self, classifiers: dict[str, dict], depth: int, deadline: float | None
    ) -> dict[str, tuple[str, Any]]:
        """One depth: stream images, icon once each, run every classifier on
        the shared batch.

        Fault isolation + timeout parity (reference classifying_tools.py:
        424-436): each classifier's resize/preprocess/infer runs in a worker
        thread; an exception disables that classifier (log & continue with
        the rest), and ``deadline`` bounds even a hung model call via
        ``future.result(timeout=...)`` — like the reference's
        ``as_completed(timeout=...)``, a hung call is abandoned (the thread
        is left to finish in the background) and partial results persist.
        """
        from concurrent.futures import ThreadPoolExecutor
        from concurrent.futures import TimeoutError as FutureTimeout

        files = list_images(self.path)
        shapes = {name: clf[SHAPE] for name, clf in classifiers.items()}
        # accumulated decoded predictions per classifier per file
        preds: dict[str, dict[str, dict]] = {name: {} for name in classifiers}
        failed: set[str] = set()
        timed_out = False

        batch_files: list[str] = []
        batch_images: list[np.ndarray] = []

        from wicca_tpu.utils.timing import StageTimer

        timer = StageTimer()
        clf_workers = self._classifier_workers(len(classifiers))
        pool = ThreadPoolExecutor(max_workers=clf_workers, thread_name_prefix="wicca-classify")

        def run_classifier(clf: dict, shape, batch: list[np.ndarray], icons: list[np.ndarray]):
            """Resize + preprocess + infer + decode for one classifier over one
            batch (worker thread; returns {kind: decoded_rows})."""
            model, pre, dec = clf[MODEL], clf[PRE_INP], clf[DEC_PRED]
            rows: dict[str, list] = {}
            for kind, sources in ((SOURCE, batch), (ICON, icons)):
                with timer.stage("resize"):
                    stack = np.stack([_resize(im, shape, self.interpolation) for im in sources])
                with timer.stage("inference"):
                    logits = model(np.asarray(pre(stack), dtype=np.float32))
                rows[kind] = dec(logits, top=self.top)
            return rows

        def flush() -> None:
            nonlocal timed_out
            if not batch_files:
                return
            with timer.stage("icon_dwt"):
                if self.compare == "reconstruction":
                    icons = [self._reconstruction(img, depth) for img in batch_images]
                elif self.coder is not None and hasattr(self.coder, "get_small_copy"):
                    icons = [self.coder.get_small_copy(img, depth) for img in batch_images]
                else:
                    # same-bucket images share one device dispatch
                    icons = _compute_icons_batched(batch_images, depth)
            # reference `parallel` semantics: one future per classifier,
            # fanned over clf_workers threads (classifying_tools.py:414-419)
            futures: dict[str, Any] = {}
            for name, clf in classifiers.items():
                if name in failed or timed_out:
                    continue
                futures[name] = pool.submit(run_classifier, clf, shapes[name], batch_images, icons)
            for name, future in futures.items():
                remaining = None if deadline is None else deadline - time.time()
                if remaining is not None and remaining <= 0:
                    timed_out = True
                try:
                    if timed_out:
                        raise FutureTimeout()
                    rows = future.result(timeout=remaining)
                except FutureTimeout:
                    if not future.cancel():  # running/done: abandon like the reference
                        logging.warning(
                            f"Classifier '{name}' exceeded the timeout at depth {depth}; "
                            "abandoning the call and returning partial results"
                        )
                    timed_out = True
                    continue
                except Exception as exc:  # noqa: BLE001 — isolate one bad classifier
                    logging.warning(
                        f"Classifier '{name}' raised at depth {depth} ({exc!r}); "
                        "continuing with the remaining classifiers"
                    )
                    failed.add(name)
                    continue
                for kind, decoded_rows in rows.items():
                    for fname, row in zip(batch_files, decoded_rows):
                        preds[name].setdefault(fname, {})[kind] = [row]
            batch_files.clear()
            batch_images.clear()

        n_threads = self.parallel or 8
        n_pixels = 0
        t_start = time.time()
        decoded = iter_decoded(files, num_threads=n_threads)
        while not timed_out:
            with timer.stage("decode"):
                try:
                    path, image = next(decoded)
                except StopIteration:
                    break
            if deadline is not None and time.time() > deadline:
                logging.warning("Processing timed out; returning partial results")
                break
            if image is None:
                logging.warning(f"Skipping unreadable file {path.name}")
                continue
            n_pixels += image.shape[0] * image.shape[1]
            batch_files.append(path.name)
            batch_images.append(image)
            if len(batch_files) >= self.batch_size:
                flush()
        flush()
        # a timed-out worker may still be running a hung model call; don't wait
        pool.shutdown(wait=False)

        out: dict[str, tuple[str, Any]] = {}
        for name in classifiers:
            if name in failed or not preds[name]:
                continue
            res_df = rsltmgr.get_short_comparison(preds[name], self.top)
            res_df.index.name = "index"
            sum_df = rsltmgr.summarize(res_df)
            rsltmgr.save_results(self.results_folder, depth, name, res_df, sum_df)
            out[name] = (name, sum_df)
        self._write_run_metrics(depth, timer, n_pixels, time.time() - t_start, list(classifiers))
        return out

    def _write_run_metrics(self, depth: int, timer, n_pixels: int, wall_s: float, names: list[str]) -> None:
        """Structured per-run metrics (SURVEY.md §5 'Metrics/observability':
        the reference only prints coarse wall-clock)."""
        metrics = {
            "depth": depth,
            "classifiers": names,
            "images_pixels": n_pixels,
            "wall_s": round(wall_s, 3),
            "megapixels_per_s": round(n_pixels / 1e6 / max(wall_s, 1e-9), 3),
            "stage_seconds": {k: round(v, 3) for k, v in timer.totals().items()},
        }
        path = Path(self.results_folder) / f"depth-{depth}" / "run-metrics.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(metrics, indent=2))

    # -- public API (reference parity, SURVEY.md §2.5) ---------------------

    def process_classifiers(self, classifiers: dict[str, Any], timeout: int | None = None):
        """Depth sweep over all classifiers (reference classifying_tools.py:
        513-562). Returns {name: (name, summary_df)} for the last depth, like
        the reference (later depths overwrite earlier — per-depth results
        persist as CSVs; SURVEY.md §2.4)."""
        if not isinstance(classifiers, dict) or not classifiers:
            raise ValueError("classifiers must be a non-empty dict of name -> classifier dict")
        first = next(iter(classifiers.values()))
        if not (isinstance(first, dict) and MODEL in first):
            # reference refuses a bare classifier dict too (classifying_tools.py:536-538)
            raise ValueError(
                "Expected a dict of classifiers (name -> {model,...}); did you pass a bare classifier dict?"
            )
        deadline = time.time() + timeout if timeout else None
        depths = self.depth if isinstance(self.depth, tuple) else (self.depth,)
        results: dict[str, tuple[str, Any]] = {}
        for depth in depths:
            todo = dict(classifiers)
            if self.resume:
                for name in list(todo):
                    paths = rsltmgr.result_paths(self.results_folder, depth, name)
                    if paths.summary.is_file():
                        logging.info(f"resume: skipping {name} depth {depth} (summary exists)")
                        import pandas as pd

                        results[name] = (name, pd.read_csv(paths.summary, index_col=0))
                        del todo[name]
            if not todo:
                continue
            t0 = time.time()
            results.update(self._classify_depth(todo, depth, deadline))
            logging.info(f"Depth {depth} done in {time.time() - t0:.1f}s")
        return results

    def _single_classifier(self, name: str, classifier_dict: dict[str, Any], timeout: int | None = None):
        if not name:
            raise ValueError("single-classifier runs need a non-empty name")
        if not isinstance(classifier_dict, dict) or MODEL not in classifier_dict:
            raise ValueError(f"the classifier spec for {name!r} has to be a dict with a {MODEL!r} entry")
        return self.process_classifiers({name: classifier_dict}, timeout)

    def process_single_classifier(self, *args, **kwargs):
        """Helpful-error wrapper (behavioral contract of reference
        classifying_tools.py:479-498: a missing-argument TypeError is turned
        into a logged usage hint and a None return)."""
        try:
            return self._single_classifier(*args, **kwargs)
        except TypeError as e:
            if "missing 1 required positional argument" not in str(e):
                raise
            logging.error(
                "process_single_classifier takes the classifier name AND its spec dict, "
                "e.g. proc.process_single_classifier('ResNet50', zoo['ResNet50'])"
            )
            return None
