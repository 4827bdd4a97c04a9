"""End-to-end harness test: synthetic images -> icons -> SimpleCNN ->
metrics -> reference-layout CSVs (SURVEY.md §4 'Inference-harness tests')."""

import numpy as np
import pandas as pd
import pytest

from wicca_tpu.config.constants import (
    DEC_PRED,
    ICON,
    MODEL,
    PRE_INP,
    SHAPE,
    SIM_BEST_CLASS,
    SIM_CLASSES,
    SIM_CLASSES_PERC,
    SOURCE,
)
from wicca_tpu.analysis.results import (
    compare_summaries,
    extract_from_comparison,
    get_short_comparison,
    load_summary_results,
)
from wicca_tpu.harness.processor import ClassifierProcessor
from wicca_tpu.models.registry import load_models, load_single_model


@pytest.fixture(scope="module")
def data_folder(tmp_path_factory):
    import cv2

    folder = tmp_path_factory.mktemp("images")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 256, size=(96 + 16 * i, 128, 3), dtype=np.uint8)
        cv2.imwrite(str(folder / f"img_{i}.png"), img)
    (folder / "notes.txt").write_text("not an image")  # must be ignored
    return folder


@pytest.fixture(scope="module")
def classifiers():
    clfs = load_models({"tiny": ("SimpleCNN", {"shape": (64, 64)})})
    assert clfs["tiny"] is not None
    for key in (MODEL, PRE_INP, DEC_PRED, SHAPE):
        assert key in clfs["tiny"]
    return clfs


def test_metrics_hand_computed():
    mk = lambda names: [[("n0", n, 0.5) for n in names]]
    results = {
        "a.png": {SOURCE: mk(["cat", "dog", "fox"]), ICON: mk(["cat", "dog", "elk"])},
        "b.png": {SOURCE: mk(["cat", "dog", "fox"]), ICON: mk(["owl", "cat", "elk"])},
    }
    df = get_short_comparison(results, top=3)
    assert df[SIM_CLASSES].tolist() == [2, 1]
    assert df[SIM_CLASSES_PERC].tolist() == pytest.approx([66.666, 33.333], abs=0.01)
    assert df[SIM_BEST_CLASS].tolist() == [100.0, 0.0]


def test_processor_end_to_end(data_folder, classifiers, tmp_path):
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=(1, 2),
        interpolation=3,
        top_classes=5,
        results_folder=tmp_path / "results",
        log_info=False,
        batch_size=4,
    )
    out = proc.process_classifiers(classifiers)
    assert set(out) == {"tiny"}
    name, sum_df = out["tiny"]
    assert name == "tiny"
    assert list(sum_df.index) == ["mean", "min", "max"]

    for depth in (1, 2):
        base = tmp_path / "results" / f"depth-{depth}"
        assert (base / f"tiny-depth-{depth}.csv").is_file()
        assert (base / f"tiny-summary-depth-{depth}.csv").is_file()
        df = pd.read_csv(base / f"tiny-depth-{depth}.csv")
        assert {SIM_CLASSES, SIM_CLASSES_PERC, SIM_BEST_CLASS} <= set(df.columns)
        assert len(df) == 6  # txt file skipped

    # identical model on source vs icon of depth-1 should agree often; at
    # minimum metrics are within [0, 100]
    loaded = load_summary_results(tmp_path / "results", "tiny", 1)
    assert loaded is not None

    comp = compare_summaries(tmp_path / "results", ["tiny"], (1, 2))
    assert len(comp) == 2
    names, vals = extract_from_comparison(comp, SIM_CLASSES_PERC)
    assert names == ["tiny", "tiny"]
    assert all(0.0 <= v <= 100.0 for v in vals)


def test_process_single_classifier(data_folder, classifiers, tmp_path):
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "results2",
        log_info=False,
    )
    out = proc.process_single_classifier("tiny", classifiers["tiny"])
    assert "tiny" in out
    # helpful-error path: missing classifier_dict
    assert proc.process_single_classifier("tiny") is None


def test_processor_rejects_bare_classifier(data_folder, classifiers, tmp_path):
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "results3",
        log_info=False,
    )
    with pytest.raises(ValueError):
        proc.process_classifiers(classifiers["tiny"])  # bare dict, not dict-of-dicts


def test_load_single_model_bad_name():
    assert load_single_model("NoSuchNet") is None


def test_registry_accepts_external_callable_model():
    class FakeKerasModel:
        def __call__(self, batch):
            import numpy as _np

            return _np.tile(_np.arange(1000, dtype=_np.float32), (len(batch), 1))

    clf = load_single_model(FakeKerasModel, shape=(32, 32))
    assert clf is not None
    logits = clf[MODEL](np.zeros((2, 32, 32, 3), np.float32))
    assert logits.shape == (2, 1000)
    decoded = clf[DEC_PRED](logits, top=3)
    assert len(decoded) == 2 and len(decoded[0]) == 3


def test_timeout_partial_results(data_folder, classifiers, tmp_path):
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_t",
        log_info=False,
    )
    # timeout=0 is falsy -> no deadline (reference semantics: None-ish)
    out = proc.process_classifiers(classifiers, timeout=0)
    assert "tiny" in out
    # an expired deadline degrades gracefully to (possibly empty) partials
    proc2 = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_t2",
        log_info=False,
    )
    out2 = proc2.process_classifiers(classifiers, timeout=1e-9)
    assert isinstance(out2, dict)


def test_classifier_fault_isolation(data_folder, classifiers, tmp_path):
    """One raising classifier must not kill the others (reference
    classifying_tools.py:431-432: log & continue)."""

    class ExplodingModel:
        def __call__(self, batch):
            raise RuntimeError("boom")

    bad = load_single_model(ExplodingModel, shape=(32, 32))
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_fault",
        log_info=False,
    )
    out = proc.process_classifiers({"bad": bad, "tiny": classifiers["tiny"]})
    assert "tiny" in out and "bad" not in out
    base = tmp_path / "res_fault" / "depth-1"
    assert (base / "tiny-summary-depth-1.csv").is_file()
    assert not (base / "bad-summary-depth-1.csv").exists()


def test_hung_classifier_times_out(data_folder, classifiers, tmp_path):
    """timeout bounds even a hung model call (reference as_completed
    timeout semantics, classifying_tools.py:426,435-436): the run returns
    partial results instead of blocking forever."""
    import time as _time

    class HungModel:
        def __call__(self, batch):
            _time.sleep(4.0)
            return np.zeros((len(batch), 1000), np.float32)

    slow = load_single_model(HungModel, shape=(32, 32))
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=1,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_hang",
        log_info=False,
        batch_size=25,
    )
    t0 = _time.time()
    out = proc.process_classifiers({"tiny": classifiers["tiny"], "slow": slow}, timeout=2)
    elapsed = _time.time() - t0
    assert elapsed < 10.0  # returned well before the hang would finish on its own
    assert "tiny" in out and "slow" not in out


def test_reconstruction_compare_mode(data_folder, classifiers, tmp_path):
    from wicca_tpu.core.quant import QuantSpec

    proc = ClassifierProcessor(
        data_folder,
        transform_depth=2,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_rec",
        log_info=False,
        compare="reconstruction",
        codec_spec=QuantSpec(base_step=1.0),
    )
    out = proc.process_classifiers(classifiers)
    assert "tiny" in out
    # near-lossless reconstruction at the model input size: predictions agree
    _, sum_df = out["tiny"]
    assert sum_df.loc["mean", SIM_BEST_CLASS] >= 50.0
    with pytest.raises(ValueError):
        ClassifierProcessor(
            data_folder, transform_depth=1, interpolation=3, top_classes=3,
            results_folder=tmp_path / "res_bad", log_info=False, compare="nope",
        )


def test_reconstruction_compare_lossless_rct(data_folder, classifiers, tmp_path):
    """reconstruction mode with the lossless 5/3 + RCT codec: the roundtrip
    is bit-exact, so source and 'icon' predictions must agree perfectly."""
    proc = ClassifierProcessor(
        data_folder,
        transform_depth=2,
        interpolation=3,
        top_classes=3,
        results_folder=tmp_path / "res_ll",
        log_info=False,
        compare="reconstruction",
        codec_wavelet="legall5.3",
        codec_color="rct",
    )
    out = proc.process_classifiers(classifiers)
    _, sum_df = out["tiny"]
    assert sum_df.loc["mean", SIM_BEST_CLASS] == 100.0

    with pytest.raises(ValueError):
        ClassifierProcessor(
            data_folder, transform_depth=1, interpolation=3, top_classes=3,
            results_folder=tmp_path / "res_bad2", log_info=False,
            compare="reconstruction", codec_wavelet="haar", codec_color="rct",
        )


# ---- classifier-level concurrency (reference `parallel` semantics) ----


def _barrier_classifier(barrier, shape=(32, 32)):
    """A fake classifier whose model() blocks on a shared barrier: only
    genuinely CONCURRENT classifier execution lets it proceed."""
    def model(x):
        barrier.wait(timeout=20)
        return np.tile(np.arange(10, dtype=np.float32), (len(x), 1))

    def dec(logits, top=5):
        order = np.argsort(-np.asarray(logits), axis=1)[:, :top]
        return [[(f"n{j}", f"class_{j}", 1.0) for j in row] for row in order]

    return {MODEL: model, PRE_INP: lambda x: x / 255.0, DEC_PRED: dec, SHAPE: shape}


def test_classifier_workers_policy():
    import jax

    proc = ClassifierProcessor.__new__(ClassifierProcessor)
    proc.parallel = None
    if jax.default_backend() == "tpu":
        assert proc._classifier_workers(4) == 1
    else:
        assert proc._classifier_workers(4) == 4  # reference default: one thread each
        proc.parallel = 2
        assert proc._classifier_workers(4) == 2
        assert proc._classifier_workers(1) == 1


def test_classifiers_fan_out_concurrently(data_folder, tmp_path):
    """Reference semantics (classifying_tools.py:389-438): classifiers run
    in parallel threads on non-TPU backends. Two barrier classifiers
    deadlock unless both batches run at once."""
    import threading
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("TPU serializes classifiers by design (docs/PARITY.md)")
    barrier = threading.Barrier(2)
    clfs = {"a": _barrier_classifier(barrier), "b": _barrier_classifier(barrier)}
    proc = ClassifierProcessor(
        data_folder, transform_depth=1, results_folder=tmp_path / "r",
        log_info=False, batch_size=100, top_classes=3,
    )
    res = proc.process_classifiers(clfs, timeout=60)
    assert set(res) == {"a", "b"}  # both completed -> they truly overlapped


def test_classifiers_serialize_with_parallel_1(data_folder, tmp_path):
    """parallel=1 pins the classifier pool to one thread: the barrier never
    releases, the classifiers fail in isolation, partial results persist."""
    import threading
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("TPU path is always serial")
    barrier = threading.Barrier(2)  # can never be satisfied serially
    good = load_models({"ok": ("SimpleCNN", {"shape": (32, 32)})})["ok"]
    clfs = {"a": _barrier_classifier(barrier), "ok": good}
    proc = ClassifierProcessor(
        data_folder, transform_depth=1, results_folder=tmp_path / "r1",
        log_info=False, batch_size=100, parallel=1, top_classes=3,
    )
    barrier_timeout = threading.Barrier(2)

    def fast_fail_wait(timeout=None):
        raise threading.BrokenBarrierError()

    barrier.wait = fast_fail_wait  # serial path -> immediate isolated failure
    res = proc.process_classifiers(clfs, timeout=60)
    assert "ok" in res and "a" not in res
