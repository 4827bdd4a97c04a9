"""Coverage for the small utility surfaces: timing, env, imagenet decode,
loader edge cases, scaling harness plumbing."""

import numpy as np
import pytest

from wicca_tpu.models.imagenet import class_index, decode_predictions
from wicca_tpu.utils import StageTimer, format_proc_time, is_jupyter, preserve_depth


def test_format_proc_time():
    assert format_proc_time(5) == "5 sec"
    assert format_proc_time(65) == "1 min 5 sec"
    assert format_proc_time(3600) == "1 h"
    assert format_proc_time(3725) == "1 h 2 min 5 sec"
    assert format_proc_time(0) == "0 sec"


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    totals = t.totals()
    assert set(totals) == {"a", "b"} and all(v >= 0 for v in totals.values())
    assert "a" in t.report()


def test_is_jupyter_false_in_pytest():
    assert is_jupyter() is False


def test_preserve_depth():
    class Obj:
        depth = (1, 2)

        @preserve_depth
        def sweep(self):
            self.depth = 99
            return "done"

    o = Obj()
    assert o.sweep() == "done"
    assert o.depth == (1, 2)


def test_imagenet_decode():
    idx = class_index()
    assert len(idx) == 1000
    logits = np.zeros((2, 1000), np.float32)
    logits[0, 7] = 5.0
    logits[1, 3] = 2.0
    out = decode_predictions(logits, top=2)
    assert out[0][0][0] == idx["7"][0] and out[0][0][2] == 5.0
    with pytest.raises(ValueError):
        decode_predictions(np.zeros(1000, np.float32))


def test_loader_edges(tmp_path):
    from wicca_tpu.data.loader import from_planar, iter_decoded, list_images, load_image, to_planar

    with pytest.raises(ValueError):
        load_image("")
    assert load_image(tmp_path / "missing.png") is None
    (tmp_path / "junk.png").write_bytes(b"not a png")
    assert load_image(tmp_path / "junk.png") is None
    assert list_images(tmp_path) == [tmp_path / "junk.png"]
    out = list(iter_decoded([tmp_path / "junk.png"]))
    assert out[0][1] is None
    assert list(iter_decoded([])) == []
    hwc = np.zeros((4, 6, 3), np.uint8)
    assert to_planar(hwc).shape == (3, 4, 6)
    assert from_planar(to_planar(hwc)).shape == (4, 6, 3)
    gray = np.zeros((4, 6), np.uint8)
    assert to_planar(gray).shape == (1, 4, 6)
    assert from_planar(to_planar(gray)).shape == (4, 6)


def test_scaling_harness_plumbing():
    from wicca_tpu.parallel.scaling import measure_scaling

    rows = measure_scaling(image_hw=(128, 128), levels=1, wavelet="haar", iters=1, device_counts=[1, 2])
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert all(r["mp_s"] > 0 for r in rows)


def test_validation_edges(tmp_path):
    from wicca_tpu.data.validation import validate_image, validate_input_folder, validate_output_folder

    with pytest.raises(ValueError):
        validate_image(None)
    with pytest.raises(ValueError):
        validate_image(np.zeros((0, 3), np.uint8))
    with pytest.raises(ValueError):
        validate_image(np.zeros((4, 4), np.float32))
    with pytest.raises(FileNotFoundError):
        validate_input_folder(tmp_path / "nope")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        validate_input_folder(empty)
    full = tmp_path / "full"
    full.mkdir()
    (full / "x.txt").write_text("x")
    with pytest.raises(FileExistsError):
        validate_output_folder(full, overwrite=False)
    assert validate_output_folder(full, overwrite=True) == full


def test_compat_namespace():
    """Reference import statements work against wicca_tpu.compat."""
    from wicca_tpu.compat.wavelet_coder import HaarCoder, WaveletCoder
    from wicca_tpu.compat.data_loader import load_image, load_models, get_padded_copy
    from wicca_tpu.compat.classifying_tools import ClassifierProcessor
    from wicca_tpu.compat.result_manager import get_short_comparison, compare_summaries
    from wicca_tpu.compat.visualization import show_image_vs_icon
    from wicca_tpu.compat.config.constants import SIM_CLASSES, RESULTS_FOLDER
    from wicca_tpu.compat.config.aliases import Depth

    assert issubclass(HaarCoder, WaveletCoder)
    img = np.random.default_rng(0).integers(0, 256, (9, 13, 3), np.uint8)
    padded = get_padded_copy(img, 8)
    assert padded.shape == (16, 16, 3)
    np.testing.assert_array_equal(padded[:9, :13], img)


def test_ms_ssim_basic():
    """MS-SSIM: 1.0 for identical images, ordered with distortion severity,
    graceful scale reduction for small images."""
    import numpy as np
    from wicca_tpu.core.metrics import ms_ssim, ssim

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    x = np.clip(128 + 70 * np.sin(xx / 13) + 60 * np.cos(yy / 17), 0, 255)
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-5
    mild = np.clip(x + rng.normal(0, 4, x.shape), 0, 255)
    harsh = np.clip(x + rng.normal(0, 40, x.shape), 0, 255)
    m_mild, m_harsh = float(ms_ssim(x, mild)), float(ms_ssim(x, harsh))
    assert 0 < m_harsh < m_mild < 1.0
    # tiny image: fewer scales, still defined and near single-scale ssim order
    t = x[:16, :16]
    tn = np.clip(t + rng.normal(0, 10, t.shape), 0, 255)
    v = float(ms_ssim(t, tn))
    assert 0 < v <= 1.0
    # batch/channel leading axes work like ssim's
    xb = np.stack([x, mild])
    assert np.isfinite(float(ms_ssim(xb, xb + 1.0)))
    del ssim
