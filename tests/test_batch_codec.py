"""Folder-level batch codec (codec/batch.py): overlapped-IO encode/decode of
whole directories, lossless roundtrips, metrics dict, CLI subcommands."""

import json

import numpy as np
import pytest

from wicca_tpu.codec.batch import decode_folder, encode_folder
from wicca_tpu.core.quant import QuantSpec


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("batch")
    src = root / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    imgs = {}
    for i in range(4):
        img = np.clip(
            128 + 60 * np.sin(xx / (7 + i)) + 50 * np.cos(yy / (9 + i)) + rng.normal(0, 6, yy.shape),
            0, 255,
        ).astype(np.uint8)
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], -1)
        cv2.imwrite(str(src / f"im{i}.png"), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        imgs[f"im{i}"] = rgb
    (src / "notes.txt").write_text("not an image")  # must be filtered out
    return root, src, imgs


def test_batch_lossless_roundtrip(dataset):
    cv2 = pytest.importorskip("cv2")
    root, src, imgs = dataset
    enc_dir, dec_dir = root / "wct", root / "rec"
    m = encode_folder(src, enc_dir, levels=3, wavelet="legall5.3", threads=4)
    assert m["images"] == 4 and m["skipped"] == 0
    assert m["mp_per_s"] > 0 and m["bytes_out"] > 0
    assert sorted(p.name for p in enc_dir.glob("*.wct")) == [f"im{i}.wct" for i in range(4)]
    d = decode_folder(enc_dir, dec_dir, threads=4)
    assert d["images"] == 4
    for name, rgb in imgs.items():
        back = cv2.cvtColor(cv2.imread(str(dec_dir / f"{name}.png")), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(back, rgb)


def test_batch_lossy_metrics(dataset):
    root, src, _ = dataset
    m = encode_folder(src, root / "wct_lossy", levels=2, spec=QuantSpec(base_step=2.0), threads=2)
    assert m["images"] == 4 and m["ratio"] > 1.0
    assert m["megapixels"] == pytest.approx(4 * 64 * 96 / 1e6, rel=1e-2)


def test_batch_decode_at_level_previews(dataset):
    """decode_folder(at_level=r) bulk-extracts 1/2**r previews, matching the
    single-stream decode_at_level path exactly."""
    import cv2

    from wicca_tpu.codec.container import load
    from wicca_tpu.codec.pipeline import decode_at_level
    from wicca_tpu.data.loader import from_planar

    root, src, imgs = dataset
    enc_dir, prev_dir = root / "wct_prev", root / "previews"
    encode_folder(src, enc_dir, levels=3, wavelet="legall5.3", threads=2)
    d = decode_folder(enc_dir, prev_dir, threads=2, at_level=1)
    assert d["images"] == 4
    back = cv2.cvtColor(cv2.imread(str(prev_dir / "im0.png")), cv2.COLOR_BGR2RGB)
    assert back.shape[:2] == (32, 48)  # 64x96 at 1/2
    want = from_planar(np.asarray(decode_at_level(load(str(enc_dir / "im0.wct")), 1, emit_u8=True)))
    np.testing.assert_array_equal(back, want)


def test_batch_resume_skips_existing(dataset):
    """resume=True skips sources/streams whose output already exists —
    restartable long folder runs (harness resume semantics)."""
    root, src, _ = dataset
    enc_dir = root / "wct_resume"
    m1 = encode_folder(src, enc_dir, levels=2, threads=2)
    assert m1["images"] == 4 and m1["resumed"] == 0
    # drop one output; resume re-encodes only that one
    (enc_dir / "im2.wct").unlink()
    m2 = encode_folder(src, enc_dir, levels=2, threads=2, resume=True)
    assert m2["images"] == 1 and m2["resumed"] == 3
    assert (enc_dir / "im2.wct").is_file()

    dec_dir = root / "rec_resume"
    d1 = decode_folder(enc_dir, dec_dir, threads=2)
    assert d1["images"] == 4
    (dec_dir / "im1.png").unlink()
    d2 = decode_folder(enc_dir, dec_dir, threads=2, resume=True)
    assert d2["images"] == 1 and d2["resumed"] == 3


def test_batch_rgba_keep_alpha_roundtrip(tmp_path):
    """encode_folder(keep_alpha=True) codes RGBA sources as 4-component
    streams and decode_folder restores the RGBA PNG losslessly (ADVICE r2:
    the batch encoder previously had no alpha path)."""
    cv2 = pytest.importorskip("cv2")
    src, enc_dir, dec_dir = tmp_path / "src", tmp_path / "wct", tmp_path / "rec"
    src.mkdir()
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (48, 64, 4), np.uint8)
    cv2.imwrite(str(src / "a.png"), cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))

    m = encode_folder(src, enc_dir, levels=2, wavelet="haar_int", threads=2, keep_alpha=True)
    assert m["images"] == 1
    from wicca_tpu.codec.container import load

    assert load(str(enc_dir / "a.wct")).ll.shape[0] == 4
    decode_folder(enc_dir, dec_dir, threads=2)
    back = cv2.cvtColor(cv2.imread(str(dec_dir / "a.png"), cv2.IMREAD_UNCHANGED), cv2.COLOR_BGRA2RGBA)
    np.testing.assert_array_equal(back, rgba)

    # default stays RGB: alpha dropped as before
    m2 = encode_folder(src, tmp_path / "wct_rgb", levels=2, wavelet="haar_int", threads=2)
    assert m2["images"] == 1
    assert load(str(tmp_path / "wct_rgb" / "a.wct")).ll.shape[0] == 3


def test_batch_empty_folder_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no images"):
        encode_folder(tmp_path / "empty", tmp_path / "out")
    with pytest.raises(ValueError, match="no .wct"):
        decode_folder(tmp_path / "empty", tmp_path / "out")


def test_batch_cli(dataset, capsys):
    from wicca_tpu.cli import main

    root, src, _ = dataset
    rc = main(["encode-batch", str(src), str(root / "cli_wct"), "--levels", "2", "--threads", "2"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["images"] == 4
    rc = main(["decode-batch", str(root / "cli_wct"), str(root / "cli_rec"), "--threads", "2"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["images"] == 4 and (root / "cli_rec" / "im0.png").is_file()
