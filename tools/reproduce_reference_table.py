"""One-command reproduction of the reference's pretrained-quality table
(/root/reference/README.md:160-194; VERDICT r4 next-step #8).

The reference's headline artifact — "EfficientNetB0 @ depth 5: 4.24/5
similar classes (84.92%), 83.84% best-class match" — comes from Keras
``weights='imagenet'`` checkpoints (reference data_loader.py:120-147). This
environment has no network egress, so the checkpoints must be provided as
files; given them, this script runs the whole comparison and emits the
README-style table for a line-by-line check against the reference.

Usage::

    # weights_dir holds Keras .h5 checkpoints (mobilenet_v2.h5, ...) and/or
    # pre-converted <Arch>.msgpack files (tools/convert_weights.py)
    python tools/reproduce_reference_table.py DATA_FOLDER \
        --weights-dir /path/to/weights --depths 2 3 4 5 6 \
        --classifiers EfficientNetB0 MobileNetV2 --out results_repro

    # smoke test without checkpoints (deterministic random init; similarity
    # numbers are then about the CODEC, not the reference's science):
    python tools/reproduce_reference_table.py DATA_FOLDER --depths 5

Steps: (1) convert any .h5 checkpoints in --weights-dir to msgpack via the
name-schema converter (activation parity for all 7 architectures is proven
in-process by tests/test_keras_parity.py); (2) point WICCA_TPU_WEIGHTS at
the directory so the registry loads real parameters; (3) run
ClassifierProcessor over the dataset at the requested depths; (4) print the
per-classifier summary tables (mean/min/max of similar classes count / % /
best class) and write radar + scatter plots next to the CSVs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_H5_NAMES = {
    # Keras hosted-checkpoint file names -> registry architecture names
    "mobilenet_v2": "MobileNetV2",
    "resnet50": "ResNet50",
    "efficientnetb0": "EfficientNetB0",
    "vgg16": "VGG16",
    "vgg19": "VGG19",
    "densenet121": "DenseNet121",
    "nasnet_mobile": "NASNetMobile",
    "nasnet": "NASNetMobile",
}


def _convert_h5(weights_dir: Path) -> None:
    """Convert every recognizable .h5 in ``weights_dir`` to msgpack (skips
    ones already converted)."""
    from wicca_tpu.models.convert import convert_h5

    for h5 in sorted(weights_dir.glob("*.h5")):
        stem = h5.stem.lower()
        arch = next((a for k, a in _H5_NAMES.items() if k in stem), None)
        if arch is None:
            print(f"  ? unrecognized checkpoint {h5.name} (expected one of {sorted(set(_H5_NAMES.values()))})")
            continue
        dst = weights_dir / f"{arch}.msgpack"
        if dst.is_file() and dst.stat().st_mtime >= h5.stat().st_mtime:
            continue
        print(f"  converting {h5.name} -> {dst.name}")
        convert_h5(arch, str(h5), str(weights_dir))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data_folder", help="folder of source images (the reference used 130 photos, mean 52.7 MP)")
    ap.add_argument("--weights-dir", default=os.environ.get("WICCA_TPU_WEIGHTS"),
                    help=".h5 / .msgpack checkpoint dir; omitted = deterministic random init (smoke test)")
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 3, 4, 5, 6],
                    help="transform depths to sweep (reference README: 2-6)")
    ap.add_argument("--classifiers", nargs="+", default=["MobileNetV2", "EfficientNetB0"],
                    help="registry architecture names (reference demo used up to 7)")
    ap.add_argument("--out", default="results_repro", help="results folder")
    ap.add_argument("--top", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=None, help="whole-run deadline, seconds")
    args = ap.parse_args(argv)

    if args.weights_dir:
        wd = Path(args.weights_dir)
        if not wd.is_dir():
            print(f"error: --weights-dir {wd} does not exist", file=sys.stderr)
            return 1
        _convert_h5(wd)
        os.environ["WICCA_TPU_WEIGHTS"] = str(wd)
        print(f"WICCA_TPU_WEIGHTS={wd}")
    else:
        print("NOTE: no --weights-dir; running with deterministic random init.")
        print("      Similarity columns then measure codec impact on an arbitrary")
        print("      network, NOT the reference's pretrained-quality table.")

    from wicca_tpu.analysis.results import load_summary_results
    from wicca_tpu.harness.processor import ClassifierProcessor
    from wicca_tpu.models.registry import load_models

    classifiers = load_models({name: name for name in args.classifiers})
    if len(classifiers) != len(args.classifiers):
        missing = set(args.classifiers) - set(classifiers)
        print(f"error: could not load {sorted(missing)}", file=sys.stderr)
        return 1

    t0 = time.perf_counter()
    proc = ClassifierProcessor(
        args.data_folder, transform_depth=args.depths, top_classes=args.top,
        results_folder=args.out,
    )
    proc.process_classifiers(classifiers, timeout=args.timeout)
    wall = time.perf_counter() - t0
    print(f"\nprocessed depths {args.depths} in {wall/60:.1f} min "
          f"(reference README.md:152-158: 15-25 min/depth, 1h30m total for 2-6)")

    # README-style tables (reference README.md:172-176)
    for name in args.classifiers:
        for depth in args.depths:
            df = load_summary_results(Path(args.out), name, depth)
            if df is None:
                continue
            sub = df[df["stat"].isin(["mean", "min", "max"])] if "stat" in df.columns else df
            print(f"\n## {name} @ depth {depth}")
            print(sub.to_string(index=False))

    # plots (radar of similar-classes %, scatter of the two % metrics)
    try:
        from wicca_tpu.analysis.results import compare_summaries, extract_from_comparison
        from wicca_tpu.config.constants import SIM_BEST_CLASS, SIM_CLASSES_PERC
        from wicca_tpu.viz.plots import plot_compare_metrics, plot_metric_radar

        depth = args.depths[-1]
        comparison = compare_summaries(Path(args.out), list(args.classifiers), depth, "mean")
        if comparison is not None and len(comparison):
            names, pct = extract_from_comparison(comparison, SIM_CLASSES_PERC)
            fig = plot_metric_radar(names, pct, title=f"Best {args.top} Classes Similarity (depth {depth})")
            _save(fig, Path(args.out) / f"radar-depth-{depth}.png")
            _, best = extract_from_comparison(comparison, SIM_BEST_CLASS)
            fig = plot_compare_metrics(names, pct, best)
            _save(fig, Path(args.out) / f"compare-depth-{depth}.png")
            print(f"\nplots written to {args.out}/")
    except Exception as e:  # noqa: BLE001  plots are best-effort decoration
        print(f"(plotting skipped: {e})")
    return 0


def _save(fig, path: Path) -> None:
    if hasattr(fig, "savefig"):
        fig.savefig(path, dpi=110, bbox_inches="tight")
    else:  # plotly
        try:
            fig.write_image(str(path))
        except Exception:
            fig.write_html(str(path.with_suffix(".html")))


if __name__ == "__main__":
    sys.exit(main())
