"""SURVEY.md §2.5 public-API conformance: every name a reference user relies
on is importable from the documented location (both native and compat
namespaces)."""

import importlib

import pytest

SURFACE = {
    # native namespace
    "wicca_tpu.data": ["load_image", "load_models"],
    "wicca_tpu.coder": ["WaveletCoder", "HaarCoder"],
    "wicca_tpu.harness": ["ClassifierProcessor"],
    "wicca_tpu.analysis": [
        "load_summary_results",
        "compare_summaries",
        "extract_from_comparison",
        "get_short_comparison",
    ],
    "wicca_tpu.viz": [
        "show_image_vs_icon",
        "show_icon_on_image",
        "visualize_comparison",
        "plot_metric_radar",
        "plot_compare_metrics",
    ],
    "wicca_tpu.config.constants": ["SIM_CLASSES", "SIM_CLASSES_PERC", "SIM_BEST_CLASS", "RESULTS_FOLDER"],
    # reference-shaped namespace (drop-in)
    "wicca_tpu.compat.data_loader": ["load_image", "load_models", "get_padded_copy", "load_single_model"],
    "wicca_tpu.compat.wavelet_coder": ["HaarCoder", "WaveletCoder"],
    "wicca_tpu.compat.classifying_tools": ["ClassifierProcessor"],
    "wicca_tpu.compat.result_manager": [
        "load_summary_results",
        "compare_summaries",
        "extract_from_comparison",
        "get_short_comparison",
        "extract_item_from_preds",
        "ResultPaths",
    ],
    "wicca_tpu.compat.visualization": [
        "show_image_vs_icon",
        "show_icon_on_image",
        "visualize_comparison",
        "plot_metric_radar",
        "plot_compare_metrics",
    ],
    "wicca_tpu.compat.config.constants": ["MODEL", "PRE_INP", "DEC_PRED", "SHAPE", "ICON", "SOURCE", "FILE"],
    "wicca_tpu.compat.config.aliases": ["ModelsDict", "Depth"],
    # framework extensions documented in README
    "wicca_tpu": ["dwt2", "idwt2", "haar_icon", "dwt2_lifting", "idwt2_lifting", "psnr", "QuantSpec", "Pyramid"],
    "wicca_tpu.codec": ["encode", "decode", "decode_at_level", "save", "load", "CodeStream", "entropy_ratio"],
    "wicca_tpu.parallel": ["make_mesh", "tiled_dwt2", "tiled_idwt2", "tiled_icon"],
    "wicca_tpu.ops": ["icon_pallas", "dwt_level_quant_pallas", "idwt_level_dequant_pallas"],
}


@pytest.mark.parametrize("module_name", sorted(SURFACE))
def test_surface(module_name):
    mod = importlib.import_module(module_name)
    missing = [n for n in SURFACE[module_name] if not hasattr(mod, n)]
    assert not missing, f"{module_name} missing {missing}"
