"""Result metrics, CSV persistence, and cross-run comparison — exact parity
with the reference result contract (SURVEY.md C5-C7).

CSV layout (reference classifying_tools.py:244-263 + result_manager.py:
114-130): ``results/depth-{d}/{name}-depth-{d}.csv`` and
``{name}-summary-depth-{d}.csv``; summary = describe() sliced to
mean/min/max. Column names from :mod:`wicca_tpu.config.constants` are the
cross-framework contract.
"""

from __future__ import annotations

import dataclasses
import logging
from itertools import product
from pathlib import Path

import pandas as pd

from wicca_tpu.config.aliases import Depth
from wicca_tpu.config.constants import (
    FILE,
    ICON,
    SIM_BEST_CLASS,
    SIM_CLASSES,
    SIM_CLASSES_PERC,
    SOURCE,
)
from wicca_tpu.data.normalization import normalize_depth
from wicca_tpu.data.validation import validate_input_folder


@dataclasses.dataclass
class ResultPaths:
    regular: Path
    summary: Path


def extract_item_from_preds(preds: list, idx: int) -> list | None:
    """Column ``idx`` of a list of (wnid, name, score) tuples (reference
    result_manager.py:36-55; idx>2 -> None)."""
    if idx > 2:
        return None
    return [pred[idx] for pred in preds]


def get_short_comparison(results: dict, top: int) -> pd.DataFrame:
    """Per-image similarity metrics between source and icon predictions.

    ``results``: {file: {SOURCE: [decoded_preds], ICON: [decoded_preds]}}
    where decoded_preds is the decode_predictions output for one image
    (list wrapping one list of top-k tuples — reference result_manager.py:89-90
    indexes ``[0]``).

    Metrics (reference result_manager.py:100-105):
      similar classes (count) = |top-k(src) ∩ top-k(icon)| by class *name*
      similar classes (%)     = count / top * 100
      similar best class      = 100.0 if argmax class matches else 0.0
    """
    file_names, similar, similar_pct, best_eq = [], [], [], []
    for file, preds in results.items():
        file_names.append(file)
        src_preds = preds[SOURCE][0]
        icn_preds = preds[ICON][0]
        src_classes = extract_item_from_preds(src_preds, 1)
        icn_classes = extract_item_from_preds(icn_preds, 1)
        count = len(set(src_classes) & set(icn_classes))
        similar.append(count)
        similar_pct.append(float(count / top) * 100)
        best_eq.append(float(src_classes[0] == icn_classes[0]) * 100)
    return pd.DataFrame(
        {FILE: file_names, SIM_CLASSES: similar, SIM_CLASSES_PERC: similar_pct, SIM_BEST_CLASS: best_eq}
    )


def summarize(res_df: pd.DataFrame) -> pd.DataFrame:
    """describe() sliced to mean/min/max with 'stat' index name (reference
    classifying_tools.py:380-382)."""
    sum_df = res_df.describe().loc[["mean", "min", "max"]]
    sum_df.index.name = "stat"
    return sum_df


def result_paths(results_folder: Path, depth, classifier_name: str) -> ResultPaths:
    """CSV path layout (reference result_manager.py:114-130)."""
    base = Path(results_folder) / f"depth-{depth}"
    return ResultPaths(
        regular=base / f"{classifier_name}-depth-{depth}.csv",
        summary=base / f"{classifier_name}-summary-depth-{depth}.csv",
    )


def save_results(results_folder: Path, depth, name: str, result: pd.DataFrame, summary: pd.DataFrame) -> ResultPaths:
    """Write the per-image and summary CSVs (reference classifying_tools.py:244-263)."""
    paths = result_paths(results_folder, depth, name)
    paths.regular.parent.mkdir(parents=True, exist_ok=True)
    result.to_csv(paths.regular)
    summary.to_csv(paths.summary)
    return paths


def load_summary_results(
    results_folder: Path, classifier_name: str, depth: int, describe: bool = False
) -> pd.DataFrame | None:
    """Load one summary CSV; None when missing (reference result_manager.py:
    133-178, including the depth-coercion quirk kept deliberately)."""
    validate_input_folder(results_folder, ftype="result")
    if not isinstance(describe, bool):
        logging.warning("Describe parameter is not a boolean. Defaulting to False")
        describe = False
    if not isinstance(depth, int):
        logging.warning("Depth parameter is not an integer; trying depth 3.")
        depth = 3
    if not isinstance(classifier_name, str):
        logging.error("Classifier name is not a string; expected a key of the classifiers dict.")
    try:
        paths = result_paths(results_folder, depth, classifier_name)
        summary_df = pd.read_csv(paths.summary)
        if describe:
            print(f"\nSummary for {classifier_name} at depth {depth}:")
            print("Shape:", summary_df.shape)
            print("Columns:", summary_df.columns.tolist())
        return summary_df
    except FileNotFoundError:
        logging.warning(f"No summary results found for {classifier_name} at depth {depth}")
        return None


def compare_summaries(
    results_folder: Path,
    classifier_names: list[str],
    depths: Depth,
    target_stat: str = "mean",
) -> pd.DataFrame:
    """Cartesian classifier x depth comparison table (reference
    result_manager.py:180-220). Accepts a classifiers dict too (iterating
    yields keys — the demo relies on this, SURVEY.md §2.4)."""
    depths = normalize_depth(depths)
    if not isinstance(target_stat, str):
        logging.warning("Target value is not a string. Defaulting to 'mean'")
        target_stat = "mean"
    data_list = []
    for classifier, depth in product(classifier_names, depths):
        summary_df = load_summary_results(results_folder, classifier, depth)
        if summary_df is None:
            continue
        try:
            target = summary_df.set_index(summary_df.columns[0]).loc[target_stat]
            data_list.append(
                {
                    "Classifier": classifier,
                    "Depth": depth,
                    SIM_CLASSES: target[SIM_CLASSES],
                    SIM_CLASSES_PERC: target[SIM_CLASSES_PERC],
                    SIM_BEST_CLASS: target[SIM_BEST_CLASS],
                }
            )
        except KeyError:
            logging.warning(f"Skipping {classifier} at depth {depth}: {target_stat} row not found.")
    return pd.DataFrame(data_list)


def extract_from_comparison(comparison_data: pd.DataFrame, metric: str) -> tuple[list[str], list]:
    """(classifier names, metric values) from a comparison table (reference
    result_manager.py:223-250)."""
    if metric not in comparison_data.columns:
        raise ValueError(f"Metric '{metric}' not found in comparison data.")
    return comparison_data["Classifier"].tolist(), comparison_data[metric].tolist()
