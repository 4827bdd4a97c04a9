"""Config-4 pipeline (BASELINE.json): full dataset -> encode -> icon ->
CNN inference -> top-1/top-5 comparison, with throughput metrics.

The reference's headline run is 130 images at 52.7 MP (README.md:144-158,
1h30m on CPU for depths 2-6). Zero-egress environments can't fetch that
dataset, so this synthesizes a scaled equivalent; ``--images/--size`` scale
it up to the real thing on capable hosts.

Run: python examples/dataset_pipeline.py [--images 12] [--size 2048]
     [--depths 2 3 4 5 6] [--models MobileNetV2] [--out /tmp/wicca_ds]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo checkout use

import numpy as np


def synthesize(folder: Path, n: int, h: int, w: int, fmt: str = "png") -> None:
    import cv2

    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        img = np.clip(
            120
            + 70 * np.sin(xx / (11 + 7 * i) + i)
            + 60 * np.cos(yy / (13 + 5 * i))
            + rng.normal(0, 9, yy.shape),
            0,
            255,
        ).astype(np.uint8)
        rgb = np.stack([img, np.roll(img, 17, 0), np.roll(img, 29, 1)], -1)
        opts = [cv2.IMWRITE_JPEG_QUALITY, 92] if fmt == "jpg" else []
        cv2.imwrite(str(folder / f"img_{i:03d}.{fmt}"), rgb, opts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--size", type=int, nargs="+", default=[2048],
                    help="frame size: one int (square) or H W (the reference mean is 6393 8284)")
    ap.add_argument("--format", default="png", choices=["png", "jpg"],
                    help="source format (jpg for spec-scale datasets: 10x smaller, faster IO)")
    ap.add_argument("--depths", nargs="+", type=int, default=[2, 3, 4, 5, 6])
    ap.add_argument("--models", nargs="+", default=["MobileNetV2"])
    ap.add_argument("--out", default="/tmp/wicca_dataset_run")
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--compare", nargs="+", default=["icon"],
                    choices=["icon", "reconstruction"],
                    help="harness comparison modes to sweep (the config-3/4 study runs both)")
    ap.add_argument("--report", default=None,
                    help="write RESULTS.md + copy summary CSVs + run metrics into this "
                         "directory (the checked-in round artifact)")
    args = ap.parse_args()

    h = args.size[0]
    w = args.size[1] if len(args.size) > 1 else args.size[0]
    out = Path(args.out)
    data = out / "images"
    if not data.exists() or len(list(data.glob(f"*.{args.format}"))) != args.images:
        synthesize(data, args.images, h, w, args.format)
    print(f"dataset: {args.images} images at {h}x{w} ({h * w / 1e6:.1f} MP, .{args.format})")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # --- stage 1: batch codec over the dataset (packed-transfer pipeline) --
    from wicca_tpu.codec import decode_folder, encode_folder
    from wicca_tpu.core.metrics import psnr
    from wicca_tpu.core.quant import QuantSpec
    from wicca_tpu.data.loader import list_images, load_image

    spec = QuantSpec(base_step=args.step)
    em = encode_folder(data, out / "wct", levels=5, spec=spec, threads=4)
    dm = decode_folder(out / "wct", out / "decoded", threads=4)
    files = list_images(data)
    psnrs = []
    for f in files[: min(6, len(files))]:  # PSNR spot-check (host decode cost)
        a = load_image(f)
        b = load_image(out / "decoded" / (f.stem + ".png"))
        psnrs.append(float(psnr(b.astype(np.float32), a.astype(np.float32))))
    total_px = int(em["megapixels"] * 1e6)
    print(
        f"codec: encode {em['mp_per_s']} MP/s, decode {dm['mp_per_s']} MP/s "
        f"({em['images']} images, {em['megapixels']:.0f} MP); "
        f"mean PSNR {np.mean(psnrs):.2f} dB; "
        f"{em['bytes_in']} -> {em['bytes_out']} B ({em['ratio']}x)"
    )

    # --- stage 2: classification comparison sweep (both compare modes) -----
    from wicca_tpu.analysis import compare_summaries
    from wicca_tpu.config.constants import SIM_BEST_CLASS, SIM_CLASSES_PERC
    from wicca_tpu.harness import ClassifierProcessor
    from wicca_tpu.models import load_models

    classifiers = load_models({m: (m, {"shape": (224, 224)}) for m in args.models})
    comps = {}
    sweep_s = {}
    for mode in args.compare:
        res_folder = out / f"results-{mode}"
        proc = ClassifierProcessor(
            data,
            transform_depth=tuple(args.depths),
            interpolation=3,
            top_classes=5,
            results_folder=res_folder,
            log_info=(mode == args.compare[0]),
            batch_size=min(args.images, 16),
            resume=True,
            compare=mode,
            codec_spec=spec,
        )
        t0 = time.time()
        proc.process_classifiers(classifiers)
        sweep_s[mode] = round(time.time() - t0, 1)
        comps[mode] = compare_summaries(res_folder, list(classifiers), tuple(args.depths))
        print(f"--- compare='{mode}' ({sweep_s[mode]}s) ---")
        print(comps[mode].to_string(index=False))

    summary = {
        "images": args.images,
        "size": [h, w],
        "encode_MPs": em["mp_per_s"],
        "decode_MPs": dm["mp_per_s"],
        "mean_psnr_db": round(float(np.mean(psnrs)), 2),
        "compression_x": em["ratio"],
        "sweep_s": sweep_s,
        "depths": args.depths,
        "models": args.models,
        "compare_modes": args.compare,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))

    if args.report:
        _write_report(Path(args.report), out, summary, comps, args)
    return 0


def _write_report(report_dir: Path, out: Path, summary: dict, comps: dict, args) -> None:
    """Materialize the checked-in round artifact: RESULTS.md + summary CSVs
    + per-depth run metrics (BASELINE.json configs 3-4 evidence)."""
    import shutil

    report_dir.mkdir(parents=True, exist_ok=True)
    lines = [
        "# Dataset study (BASELINE configs 3-4)",
        "",
        f"{summary['images']} synthetic photo-like images at "
        f"{summary['size'][0]}x{summary['size'][1]} "
        f"({summary['size'][0] * summary['size'][1] / 1e6:.1f} MP, 3 channels), depths "
        f"{summary['depths']}, models {summary['models']}, run on the "
        "session's real TPU chip in one command:",
        "",
        "```",
        f"python examples/dataset_pipeline.py --images {args.images} --size {' '.join(map(str, args.size))} "
        f"--depths {' '.join(map(str, args.depths))} --compare {' '.join(args.compare)} "
        f"--report {report_dir}",
        "```",
        "",
        "## Codec stage (encode_folder / decode_folder)",
        "",
        f"- encode: **{summary['encode_MPs']} MP/s**, decode: **{summary['decode_MPs']} MP/s**"
        f" (packed tunnel transfer: {__import__('wicca_tpu.codec.transfer', fromlist=['enabled']).enabled()})",
        f"- mean roundtrip PSNR {summary['mean_psnr_db']} dB at base_step {args.step}",
        f"- compression {summary['compression_x']}x (raw -> .wct)",
        "",
        "Caveat: models are deterministic-random unless WICCA_TPU_WEIGHTS",
        "points at converted ImageNet checkpoints — similarity numbers with",
        "random weights measure pipeline correctness and the depth trend,",
        "not the reference's pretrained-quality table.",
        "",
    ]
    for mode, comp in comps.items():
        lines += [
            f"## Harness sweep — compare='{mode}' ({summary['sweep_s'][mode]} s "
            f"for depths {summary['depths']})",
            "",
            comp.to_markdown(index=False),
            "",
        ]
    lines += [
        "## Files",
        "",
        "- `summary.json` — the structured run record",
        "- `results-<mode>/depth-<d>/` — reference-layout summary CSVs + run-metrics.json",
        "",
    ]
    (report_dir / "RESULTS.md").write_text("\n".join(lines))
    shutil.copy(out / "summary.json", report_dir / "summary.json")
    for mode in comps:
        for d in args.depths:
            src = out / f"results-{mode}" / f"depth-{d}"
            dst = report_dir / f"results-{mode}" / f"depth-{d}"
            dst.mkdir(parents=True, exist_ok=True)
            for f in src.glob("*summary*.csv"):
                shutil.copy(f, dst / f.name)
            if (src / "run-metrics.json").exists():
                shutil.copy(src / "run-metrics.json", dst / "run-metrics.json")
    print(f"report written to {report_dir}")


if __name__ == "__main__":
    raise SystemExit(main())
