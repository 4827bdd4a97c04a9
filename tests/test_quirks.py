"""Pin the reference behavioral quirks that docs/PARITY.md claims are kept
(SURVEY.md §2.4). Each test fails if the quirk-parity regresses."""

import logging

import numpy as np
import pandas as pd
import pytest

from wicca_tpu.analysis.results import (
    compare_summaries,
    load_summary_results,
    save_results,
    summarize,
)
from wicca_tpu.config.constants import SIM_BEST_CLASS, SIM_CLASSES, SIM_CLASSES_PERC


def _write_summary(folder, name, depth, base=1.0):
    res = pd.DataFrame(
        {
            "file": ["a.png", "b.png"],
            SIM_CLASSES: [base, base + 1],
            SIM_CLASSES_PERC: [base * 10, base * 20],
            SIM_BEST_CLASS: [100.0, 0.0],
        }
    )
    save_results(folder, depth, name, res, summarize(res))


@pytest.fixture()
def results_folder(tmp_path):
    folder = tmp_path / "results"
    folder.mkdir()
    _write_summary(folder, "m", 3, base=3.0)
    _write_summary(folder, "m", 1, base=1.0)
    return folder


def test_bad_depth_coerced_to_3(results_folder, caplog):
    """Non-int depth falls back to depth 3 with a warning (reference
    result_manager.py:154-156 quirk, kept)."""
    with caplog.at_level(logging.WARNING):
        df = load_summary_results(results_folder, "m", depth="five")
    assert df is not None
    # depth-3 summary has mean SIM_CLASSES == 3.5; depth-1 has 1.5
    assert float(df.set_index(df.columns[0]).loc["mean", SIM_CLASSES]) == 3.5
    assert any("depth" in r.message.lower() for r in caplog.records)
    # bool is not accepted as a depth either
    assert load_summary_results(results_folder, "m", depth=True) is not None


def test_non_str_classifier_name_logged_but_continues(results_folder, caplog):
    """Non-str classifier name logs an error and still attempts the lookup
    (reference result_manager.py:157-159 quirk, kept)."""
    with caplog.at_level(logging.ERROR):
        out = load_summary_results(results_folder, 123, 3)
    assert out is None  # file '123-summary-depth-3.csv' doesn't exist
    assert any(r.levelno >= logging.ERROR for r in caplog.records)


def test_non_bool_describe_treated_as_false(results_folder, capsys):
    """Non-bool describe is ignored (reference quirk, kept)."""
    df = load_summary_results(results_folder, "m", 3, describe="yes")
    assert df is not None
    assert "columns:" not in capsys.readouterr().out


def test_compare_summaries_accepts_classifiers_dict(results_folder):
    """Iterating a classifiers *dict* yields keys — the reference demo relies
    on this (SURVEY.md §2.4), so a dict works where list[str] is declared."""
    classifiers = {"m": {"model": object()}}
    comp = compare_summaries(results_folder, classifiers, (1, 3))
    assert comp["Classifier"].tolist() == ["m", "m"]
    assert comp["Depth"].tolist() == [1, 3]


def test_compare_summaries_non_str_stat_defaults_to_mean(results_folder, caplog):
    with caplog.at_level(logging.WARNING):
        comp = compare_summaries(results_folder, ["m"], 3, target_stat=42)
    assert len(comp) == 1
    assert float(comp[SIM_CLASSES].iloc[0]) == 3.5  # the mean row


def test_compare_summaries_unknown_stat_skips(results_folder):
    comp = compare_summaries(results_folder, ["m"], 3, target_stat="median")
    assert comp.empty


def test_missing_summary_returns_none(results_folder, caplog):
    with caplog.at_level(logging.WARNING):
        assert load_summary_results(results_folder, "ghost", 3) is None


def test_normalize_depth_contract():
    from wicca_tpu.data.normalization import normalize_depth

    assert normalize_depth(4) == (4,)
    assert normalize_depth([1, 2]) == (1, 2)
    assert normalize_depth((5,)) == (5,)
    assert normalize_depth(range(1, 4)) == (1, 2, 3)
    for bad in (0, -1, 1.5, "3", True, False, None, [1, 0], (1, "2"), [True]):
        with pytest.raises(ValueError):
            normalize_depth(bad)


def test_normalize_folder_contract(tmp_path):
    from pathlib import Path

    from wicca_tpu.data.normalization import normalize_folder

    assert normalize_folder(str(tmp_path)) == Path(str(tmp_path))
    assert normalize_folder(tmp_path) == tmp_path
    with pytest.raises(TypeError):
        normalize_folder(123)


def test_later_depths_overwrite_results_dict(tmp_path):
    """process_classifiers returns the LAST depth's summary per classifier
    (reference classifying_tools.py:552 quirk, kept) — per-depth results
    survive only as CSVs."""
    import cv2

    from wicca_tpu.harness.processor import ClassifierProcessor
    from wicca_tpu.models.registry import load_models

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        cv2.imwrite(str(folder / f"i{i}.png"), rng.integers(0, 256, (64, 96, 3), np.uint8))
    proc = ClassifierProcessor(
        folder,
        transform_depth=(1, 3),
        interpolation=3,
        top_classes=5,
        results_folder=tmp_path / "res",
        log_info=False,
    )
    out = proc.process_classifiers(load_models({"tiny": ("SimpleCNN", {"shape": (32, 32)})}))
    _, sum_df = out["tiny"]
    on_disk = pd.read_csv(tmp_path / "res" / "depth-3" / "tiny-summary-depth-3.csv", index_col=0)
    pd.testing.assert_frame_equal(sum_df, on_disk, check_names=False)
