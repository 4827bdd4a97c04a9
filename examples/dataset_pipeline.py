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


def synthesize(folder: Path, n: int, size: int) -> None:
    import cv2

    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
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
        cv2.imwrite(str(folder / f"img_{i:03d}.png"), rgb)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--depths", nargs="+", type=int, default=[2, 3, 4, 5, 6])
    ap.add_argument("--models", nargs="+", default=["MobileNetV2"])
    ap.add_argument("--out", default="/tmp/wicca_dataset_run")
    ap.add_argument("--step", type=float, default=1.0)
    args = ap.parse_args()

    out = Path(args.out)
    data = out / "images"
    if not data.exists() or len(list(data.glob("*.png"))) != args.images:
        synthesize(data, args.images, args.size)
    print(f"dataset: {args.images} images at {args.size}x{args.size}")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # --- stage 1: codec sweep over the dataset -----------------------------
    from wicca_tpu.codec import encode, decode, save
    from wicca_tpu.core.metrics import psnr
    from wicca_tpu.core.quant import QuantSpec
    from wicca_tpu.data.loader import iter_decoded, list_images, to_planar

    files = list_images(data)
    spec = QuantSpec(base_step=args.step)
    t0 = time.time()
    total_px = 0
    psnrs = []
    wct_bytes = 0
    (out / "wct").mkdir(exist_ok=True)
    for path, img in iter_decoded(files):
        if img is None:
            continue
        x = to_planar(img)
        stream = encode(x, levels=5, spec=spec)
        wct_bytes += save(stream, str(out / "wct" / (path.stem + ".wct")))
        rec = decode(stream)
        psnrs.append(float(psnr(rec, x.astype(np.float32))))
        total_px += img.shape[0] * img.shape[1]
    codec_s = time.time() - t0
    raw_bytes = total_px * 3
    print(
        f"codec: {total_px/1e6:.0f} MP in {codec_s:.1f}s = {total_px/1e6/codec_s:.1f} MP/s "
        f"(incl. host IO+entropy); mean PSNR {np.mean(psnrs):.2f} dB; "
        f"{raw_bytes} -> {wct_bytes} B ({raw_bytes/wct_bytes:.2f}x)"
    )

    # --- stage 2: classification comparison sweep --------------------------
    from wicca_tpu.analysis import compare_summaries
    from wicca_tpu.harness import ClassifierProcessor
    from wicca_tpu.models import load_models

    classifiers = load_models({m: (m, {"shape": (224, 224)}) for m in args.models})
    proc = ClassifierProcessor(
        data,
        transform_depth=tuple(args.depths),
        interpolation=3,
        top_classes=5,
        results_folder=out / "results",
        log_info=True,
        batch_size=args.images,
        resume=True,
    )
    t0 = time.time()
    proc.process_classifiers(classifiers)
    sweep_s = time.time() - t0
    comp = compare_summaries(out / "results", list(classifiers), tuple(args.depths))
    print(comp.to_string(index=False))
    summary = {
        "images": args.images,
        "size": args.size,
        "codec_MPs": round(total_px / 1e6 / codec_s, 2),
        "mean_psnr_db": round(float(np.mean(psnrs)), 2),
        "compression_x": round(raw_bytes / wct_bytes, 2),
        "sweep_s": round(sweep_s, 1),
        "depths": args.depths,
        "models": args.models,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
