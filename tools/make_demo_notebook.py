#!/usr/bin/env python
"""Generate examples/demo.ipynb — the full-surface tour (VERDICT r3 #3).

The reference's 46-cell demo.ipynb is its de-facto API spec and integration
test (SURVEY.md §0, §4): models -> ClassifierProcessor -> process_classifiers
-> load_summary_results -> compare_summaries -> radar/scatter/heatmap ->
show_image_vs_icon / show_icon_on_image. This notebook walks that entire
flow on wicca_tpu's API, then tours everything the reference does not have:
the codec (encode/decode, container, progressive + region decode, quality
layers, PCRD rate control, ROI, metadata, lossless + hi-depth paths,
transcode, folder batches), the rate-distortion tooling, multi-device tiled
transforms, and icon fine-tuning.

Hermetic by construction: data is synthesized into a temp folder, models are
random-init (drop pretrained .msgpack weights into WICCA_TPU_WEIGHTS for the
reference's quality numbers), everything runs headless on CPU in ~2-4 min —
tests/test_demo_notebook.py executes it with nbclient.

Regenerate after API changes:  python tools/make_demo_notebook.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat as nbf

ROOT = Path(__file__).resolve().parent.parent


def md(s: str):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s: str):
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    md("""
# wicca_tpu — the full tour

TPU-native wavelet image codec + classification-analysis engine: everything
the WICCA reference workflow does (icons → classifiers → comparison CSVs →
plots), rebuilt TPU-first (JAX/XLA/Pallas compute, C++ entropy/runtime), plus
a complete JPEG2000-class codec the reference never had.

This notebook is hermetic: it synthesizes its own data, uses random-init
models, and runs headless on CPU (the same code runs unchanged on a TPU
backend, where the fused Pallas kernels take over). Pretrained ImageNet
weights: convert once with `tools/convert_weights.py` and set
`WICCA_TPU_WEIGHTS` — the registry picks them up automatically.
"""),
    code("""
import os, sys, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path.cwd().parent))  # repo checkout use
import matplotlib
matplotlib.use("Agg")  # headless-safe; drop for interactive use
import jax
if os.environ.get("WICCA_TPU_DEMO_CPU"):
    # CI / headless smoke: force the CPU backend (some environments pin a
    # remote accelerator via sitecustomize, so the env var alone is not
    # enough — jax.config wins)
    jax.config.update("jax_platforms", "cpu")
try:  # 8 virtual devices so the multi-device cells run anywhere
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
import numpy as np
print("backend:", jax.default_backend(), "devices:", len(jax.devices()))
"""),
    md("## Data\n\nA folder of photo-like synthetic images (stand-in for the"
       " reference's ≥2K photo dataset — point `data_folder` at yours)."),
    code("""
import cv2

def photo_like(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for octave, amp in ((4, 18.0), (16, 30.0), (64, 42.0)):
        n = rng.normal(0, 1, (h // octave + 2, w // octave + 2, 3)).astype(np.float32)
        img += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
    img += 128 + 30 * np.sign(np.sin(np.arange(w, dtype=np.float32) / 37))[None, :, None]
    return np.clip(img, 0, 255).astype(np.uint8)

workdir = pathlib.Path(tempfile.mkdtemp(prefix="wicca_demo_"))
data_folder = workdir / "originals"
data_folder.mkdir()
for i in range(6):
    cv2.imwrite(str(data_folder / f"img_{i}.png"),
                cv2.cvtColor(photo_like(192 + 32 * (i % 3), 256, i), cv2.COLOR_RGB2BGR))
sorted(p.name for p in data_folder.iterdir())
"""),
    code("""
from wicca_tpu.data.loader import load_image

sample = load_image(data_folder / "img_0.png")  # uint8 RGB, None on failure
sample.shape, sample.dtype
"""),
    md("## Models\n\nThe registry mirrors the reference's `load_models` contract"
       " — a dict of `name -> architecture` (or `(architecture, {'shape': ...})`)"
       " becomes `{name: {model, preprocess, decode_predictions, shape}}`."
       " Ten Flax architectures ship in the zoo; `SimpleCNN` keeps this demo fast."),
    code("""
from wicca_tpu.models import load_models

# Two fast CNNs keep this demo snappy on CPU. The zoo has ten ImageNet
# architectures — swap in e.g.
#   "MobileNetV2": ("MobileNetV2", {"shape": (224, 224)}),
#   "EfficientNetB0": ("EfficientNetB0", {"shape": (224, 224)}),
# (random-init unless WICCA_TPU_WEIGHTS points at converted checkpoints;
# their 224x224 CPU compile takes a few minutes — instant on TPU).
models_dict = {
    "SimpleCNN": ("SimpleCNN", {"shape": (64, 64)}),
    "SimpleCNN-96": ("SimpleCNN", {"shape": (96, 96)}),
    "SimpleCNN-48": ("SimpleCNN", {"shape": (48, 48)}),
}
classifiers = load_models(models_dict)
sorted(classifiers)
"""),
    md("## The processor\n\nSame constructor surface as the reference"
       " `ClassifierProcessor`. Depth accepts an int, tuple, list, or range:"),
    code("""
from wicca_tpu.data.normalization import normalize_depth

[normalize_depth(d) for d in (3, (2, 4), [1, 5], range(1, 4))]
"""),
    code("""
from wicca_tpu.harness import ClassifierProcessor

results_folder = workdir / "results"
processor = ClassifierProcessor(
    data_folder=data_folder,
    transform_depth=(1, 2),     # depth sweep
    top_classes=5,
    results_folder=results_folder,
    batch_size=8,
    overwrite=True,             # replaces the reference's interactive input()
)
"""),
    md("### Run every classifier across the depth sweep\n\nIcons are computed"
       " once per (image, depth) on the device and shared across classifiers —"
       " the reference recomputed the full-resolution DWT per classifier."),
    code("""
results = processor.process_classifiers(classifiers, timeout=600)
sorted(results)
"""),
    code("""
# single-classifier convenience (same helpful-error wrapper as the reference)
single = processor.process_single_classifier("SimpleCNN", classifiers["SimpleCNN"])
type(single)
"""),
    md("### Results on disk\n\nReference CSV layout:"
       " `results/depth-{d}/{name}[-summary]-depth-{d}.csv` plus structured"
       " per-run metrics JSON."),
    code("""
sorted(str(p.relative_to(results_folder)) for p in results_folder.rglob("*.*"))[:8]
"""),
    code("""
from wicca_tpu.analysis import load_summary_results

load_summary_results(results_folder, "SimpleCNN", 2)
"""),
    code("""
load_summary_results(results_folder, "SimpleCNN-96", 1)
"""),
    md("### Cross-run comparison\n\n`compare_summaries` builds the"
       " classifier × depth table (it accepts the classifiers dict itself,"
       " like the reference demo); `extract_from_comparison` pulls plot series."),
    code("""
from wicca_tpu.analysis import compare_summaries, extract_from_comparison
from wicca_tpu.config.constants import SIM_BEST_CLASS, SIM_CLASSES_PERC

comparison = compare_summaries(results_folder, classifiers, 2, "mean")
comparison
"""),
    code("""
names, similar_classes_pct = extract_from_comparison(comparison, SIM_CLASSES_PERC)
_, similar_best_class = extract_from_comparison(comparison, SIM_BEST_CLASS)
list(zip(names, similar_classes_pct))
"""),
    md("### Visualization — all five reference entry points"),
    code("""
from wicca_tpu import viz

viz.plot_metric_radar(names, similar_classes_pct, "Best 5 Classes Similarity")
"""),
    code("""
viz.plot_metric_radar(names, similar_best_class, "Best Class Similarity")
"""),
    code("""
viz.plot_compare_metrics(comparison, SIM_CLASSES_PERC, SIM_BEST_CLASS)
"""),
    code("""
from wicca_tpu.coder import HaarCoder

viz.show_image_vs_icon(sample, range(1, 5), HaarCoder())
"""),
    code("""
viz.show_icon_on_image(sample, depth=3, coder=HaarCoder())
"""),
    code("""
sweep = compare_summaries(results_folder, classifiers, range(1, 3), "mean")
viz.visualize_comparison(sweep, SIM_CLASSES_PERC)
"""),
    code("""
viz.visualize_comparison(sweep, SIM_BEST_CLASS)
"""),
    md("""
---
# Beyond the reference: the codec

The reference stops at icons (LL-only, no inverse). wicca_tpu carries full
multi-level DWT + quantization + entropy coding + a versioned container —
encode/decode run as fused Pallas kernels on TPU.
"""),
    code("""
from wicca_tpu.codec import encode, decode, save, load, entropy_ratio
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.core.metrics import psnr
from wicca_tpu.data.loader import to_planar, from_planar

x = to_planar(sample)                     # planar (C, H, W)
stream = encode(x, levels=5, spec=QuantSpec(base_step=2.0), wavelet="bior4.4", color="ict")
rec = np.asarray(decode(stream, emit_u8=True))
float(psnr(rec.astype(np.float32), x.astype(np.float32))), round(entropy_ratio(stream), 1)
"""),
    code("""
wct_path = workdir / "sample.wct"
nbytes = save(stream, str(wct_path), quality_layers=3)   # SNR-scalable container
print(f"{x.nbytes} raw -> {nbytes} bytes ({x.nbytes / nbytes:.1f}x), CRC-protected")
"""),
    code("""
# structural dump without entropy decode (CLI: python -m wicca_tpu info)
from wicca_tpu.codec import inspect as wct_inspect

info = wct_inspect(str(wct_path))
{k: info[k] for k in ("version", "wavelet", "levels", "quality_layers", "bpp", "integrity")}
"""),
    md("### Progressive + random access\n\nResolution scalability"
       " (`decode_at_level`), SNR scalability (layer prefixes), and exact"
       " spatial random access (`decode_region`) — JPEG2000 semantics."),
    code("""
from wicca_tpu.codec import decode_at_level, decode_region

half = np.asarray(decode_at_level(stream, 1, emit_u8=True))     # 1/2 resolution
quarter = np.asarray(decode_at_level(stream, 2, emit_u8=True))  # 1/4 resolution
window = np.asarray(decode_region(stream, 32, 96, 64, 192, emit_u8=True))
half.shape, quarter.shape, window.shape
"""),
    code("""
layered = load(str(wct_path), max_layers=1)   # coarsest SNR layer only
rec1 = np.asarray(decode(layered, emit_u8=True))
print(f"1/3 layers: step {layered.spec.base_step:g}, "
      f"PSNR {float(psnr(rec1.astype(np.float32), x.astype(np.float32))):.1f} dB")
"""),
    md("### Rate control (PCRD)\n\nOne fine encode + R-D-optimal per-plane"
       " truncation (the post-compression-R-D half of EBCOT): measured rates"
       " from the real entropy coder, image-domain distortion via synthesis"
       " gains, Lagrangian allocation. −0.2 dB vs OpenJPEG at 1.0 bpp,"
       " +2.1 dB at 2.0 bpp (docs/PERFORMANCE.md)."),
    code("""
from wicca_tpu.codec import rd_truncate, fetch_stream

fine = fetch_stream(encode(x, levels=5, spec=QuantSpec(base_step=0.5),
                           wavelet="bior4.4", color="ict"))
for bpp in (2.0, 1.0, 0.5):
    small = rd_truncate(fine, target_bpp=bpp)
    blob_rec = np.asarray(decode(small, emit_u8=True))
    h, w = x.shape[-2:]
    from wicca_tpu.codec import serialize
    got = 8.0 * len(serialize(small)) / (h * w)
    print(f"target {bpp:4.1f} bpp -> {got:5.2f} bpp, "
          f"{float(psnr(blob_rec.astype(np.float32), x.astype(np.float32))):5.1f} dB, "
          f"divisors {small.band_div[:6]}...")
"""),
    md("### Lossless paths\n\nInteger lifting (Haar S-transform and the"
       " JPEG2000 5/3) with the reversible color transform; 16-bit sources"
       " keep full precision."),
    code("""
lossless = encode(x, levels=5, wavelet="legall5.3", color="rct")
assert np.array_equal(np.asarray(decode(lossless, emit_u8=True)), x)
print("5/3 + RCT roundtrip: bit-exact; entropy ratio",
      round(entropy_ratio(lossless), 2))
"""),
    code("""
x16 = (x.astype(np.uint16) << 4) | 7      # 12-bit-ish source
s16 = encode(x16, levels=3, wavelet="legall5.3", bit_depth=12)
assert np.array_equal(np.asarray(decode(s16, emit_u8=True)), x16)
print("12-bit lossless roundtrip: bit-exact")
"""),
    md("### Metadata + region-of-interest coding"),
    code("""
from wicca_tpu.codec import with_metadata, apply_roi

tagged = with_metadata(stream, {"session": "demo-1", "exif": b"\\x49\\x49*\\x00"})
save(tagged, str(workdir / "tagged.wct"))
roi_mask = np.zeros(stream.orig_shape, bool)
roi_mask[64:128, 64:160] = True
roi_stream = apply_roi(fetch_stream(stream), roi_mask, bg_shift=2)
print("metadata:", wct_inspect(str(workdir / "tagged.wct"))["metadata"],
      "| roi guard bits:", roi_stream.roi_shift)
"""),
    md("### Transcode + folder batches\n\nReshape `.wct` streams without"
       " re-running the DWT; encode/decode whole folders with host IO"
       " overlapped against device work (and the packed tunnel transfer on"
       " remote backends)."),
    code("""
from wicca_tpu.codec import transcode

# level drops re-root the stream geometry, so they need a geometry-free
# transform (haar family or global-layout lifting; tile-local wide streams
# use decode_at_level instead)
haar_path = workdir / "sample_haar.wct"
save(encode(x, levels=5, spec=QuantSpec(base_step=2.0)), str(haar_path), quality_layers=2)
m = transcode(haar_path, workdir / "half.wct", drop_levels=1, codec="rc")
m
"""),
    code("""
from wicca_tpu.codec import encode_folder, decode_folder

em = encode_folder(data_folder, workdir / "wct", levels=4,
                   spec=QuantSpec(base_step=2.0))
dm = decode_folder(workdir / "wct", workdir / "decoded")
{k: em[k] for k in ("images", "mp_per_s", "ratio")}, dm["images"]
"""),
    md("### Host-vs-device routing\n\nBoth folder directions (and the"
       " harness's icon stage) pick their backend per frame from MEASURED"
       " bandwidths: on a tunnel-attached chip the transform runs on the"
       " host (bit-identical kernels in native C++, `native/idwt.cpp`);"
       " on a PCIe-attached chip the device wins. Force a route with"
       " `path='host'|'device'` to see both produce the same bytes."),
    code("""
import hashlib
eh = encode_folder(data_folder, workdir / "wct_h", levels=4,
                   spec=QuantSpec(base_step=2.0), path="host")
hd = hashlib.sha256((workdir / "wct_h" / (sorted(p.stem for p in (workdir / "wct_h").glob("*.wct"))[0] + ".wct")).read_bytes()).hexdigest()
dd = hashlib.sha256((workdir / "wct" / (sorted(p.stem for p in (workdir / "wct").glob("*.wct"))[0] + ".wct")).read_bytes()).hexdigest()
{"routes": (eh["host_encoded"], em["device_encoded"] + em["host_encoded"]), "bytes_identical": hd == dd}
"""),
    md("The host stages are themselves tuned: entropy `auto` picks the"
       " range coder only when its size win clears a threshold (it decodes"
       " ~5-6x slower than Rice — big planes are probed on every 8th row"
       " before paying the full encode), and decoded frames are written by"
       " a strip-parallel native PNG encoder (`wicca_tpu.data.pngw`)"
       " straight from planar arrays — no interleave or BGR pass."),
    code("""
from wicca_tpu.data import pngw

png_bytes = pngw.encode_png(x) if pngw.available() else b""
{"native_png_writer": pngw.available(), "png_bytes": len(png_bytes)}
"""),
    md("### Rate–distortion tooling"),
    code("""
from wicca_tpu.codec import rd_curve

points = rd_curve(x, steps=(1.0, 2.0, 4.0, 8.0), levels=4)
[(p["step"], p["bpp_entropy"], p["psnr_db"]) for p in points]
"""),
    md("""
---
# Scale-out: mesh-sharded transforms

Spatial tiles over a `(data, ty, tx)` device mesh with per-lifting-step
`ppermute` halo exchange — bit-exact vs single device. Runs here on 8
virtual CPU devices; on a TPU pod the same code shards over ICI.
"""),
    code("""
from wicca_tpu.parallel import make_mesh
from wicca_tpu.parallel.codec import tiled_encode, tiled_decode
from jax.sharding import NamedSharding, PartitionSpec as P

if len(jax.devices()) >= 4:
    mesh = make_mesh(data=1, ty=2, tx=2)
    img = jax.device_put(to_planar(sample)[:, :160, :256],
                         NamedSharding(mesh, P(None, "ty", "tx")))
    ts = tiled_encode(img, 3, QuantSpec(base_step=2.0), "haar", mesh=mesh)
    trec = tiled_decode(ts, mesh=mesh, emit_u8=True)
    print("mesh", dict(mesh.shape), "roundtrip PSNR",
          float(psnr(np.asarray(trec).astype(np.float32),
                     np.asarray(img).astype(np.float32))))
else:
    print("single device — see tests/test_tiled_codec.py for the mesh lane")
"""),
    md("### Fine-tuning on icons\n\nA training loop the reference never had:"
       " adapt a classifier to icon inputs (streaming loader, optax, orbax"
       " checkpoints, batch sharded over the mesh `data` axis)."),
    code("""
from wicca_tpu.harness.train import TrainConfig, finetune_on_icons

train_root = workdir / "train"
for cname in ("bright", "dark"):
    (train_root / cname).mkdir(parents=True, exist_ok=True)
    for i in range(8):
        base = 180 if cname == "bright" else 60
        im = np.clip(np.random.default_rng(i).normal(base, 30, (64, 64, 3)), 0, 255)
        cv2.imwrite(str(train_root / cname / f"{i}.png"), im.astype(np.uint8))
params, report = finetune_on_icons(
    train_root, TrainConfig(architecture="SimpleCNN", input_size=32,
                            depth=2, batch_size=8, epochs=2))
report["classes"], [round(h["loss"], 3) for h in report["history"]]
"""),
    md("""
---
## Where to next

- `python -m wicca_tpu --help` — the CLI mirrors everything above
  (`analyze`, `encode`, `decode`, `encode-batch`, `decode-batch`, `icon`,
  `info`, `transcode`, `compare`).
- `docs/API.md` — full surface; `docs/PARITY.md` — reference-quirk
  decisions; `docs/PERFORMANCE.md` — kernel rooflines, tunnel-transfer
  design, and the JPEG2000 comparison.
- `examples/gigapixel.py` — O(tile)-memory gigapixel streaming;
  `examples/dataset_pipeline.py` — the config-3/4 dataset study.
"""),
]


def main() -> int:
    nb = nbf.v4.new_notebook()
    nb.metadata.update({
        "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
        "language_info": {"name": "python"},
    })
    nb.cells = CELLS
    out = ROOT / "examples" / "demo.ipynb"
    nbf.write(nb, str(out))
    n_code = sum(1 for c in nb.cells if c.cell_type == "code")
    print(f"wrote {out}: {len(nb.cells)} cells ({n_code} code)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
