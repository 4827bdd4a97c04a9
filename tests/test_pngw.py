"""Strip-parallel native PNG writer (native/pngw.cpp + data/pngw.py): the
output must be standard lossless PNG — every reader decodes it back
pixel-identical — across shapes, channel counts, strip boundaries, zlib
levels/strategies, and thread counts."""

import numpy as np
import pytest

from wicca_tpu.data import pngw


def _readback_planar(blob: bytes) -> np.ndarray:
    import cv2

    dec = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_UNCHANGED)
    assert dec is not None, "reader rejected the PNG"
    if dec.ndim == 2:
        return dec[None]
    code = cv2.COLOR_BGRA2RGBA if dec.shape[2] == 4 else cv2.COLOR_BGR2RGB
    return np.ascontiguousarray(np.moveaxis(cv2.cvtColor(dec, code), -1, 0))


needs_native = pytest.mark.skipif(not pngw.available(), reason="native lib unavailable")


@needs_native
@pytest.mark.parametrize("shape", [(3, 64, 80), (1, 33, 47), (4, 50, 50),
                                   (3, 1, 1), (3, 7, 5), (1, 64, 1), (3, 1, 64)])
def test_roundtrip_shapes(shape):
    x = np.random.default_rng(hash(shape) % 2**31).integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(_readback_planar(pngw.encode_png(x)), x)


@needs_native
@pytest.mark.parametrize("level,strategy", [(0, 0), (1, 0), (1, 1), (4, 1), (6, 2)])
def test_roundtrip_levels_strategies(level, strategy):
    x = np.random.default_rng(3).integers(0, 256, (3, 200, 160), dtype=np.uint8)
    np.testing.assert_array_equal(
        _readback_planar(pngw.encode_png(x, level=level, strategy=strategy)), x)


@needs_native
@pytest.mark.parametrize("threads", [1, 2, 5, 16])
def test_strip_boundaries(threads):
    """Multi-strip streams (the pigz Z_FULL_FLUSH construction) must inflate
    as one zlib stream regardless of how rows split across strips."""
    rng = np.random.default_rng(9)
    # smooth + noise: realistic compressibility, h chosen to leave a ragged
    # final strip
    h, w = 517, 256
    base = np.linspace(0, 255, w, dtype=np.float32)[None, None, :]
    x = np.clip(base + rng.normal(0, 14, (3, h, w)), 0, 255).astype(np.uint8)
    blob = pngw.encode_png(x, threads=threads)
    np.testing.assert_array_equal(_readback_planar(blob), x)


@needs_native
def test_pil_reads_it():
    PIL = pytest.importorskip("PIL.Image")
    import io

    x = np.random.default_rng(5).integers(0, 256, (3, 90, 120), dtype=np.uint8)
    img = np.asarray(PIL.open(io.BytesIO(pngw.encode_png(x))))
    np.testing.assert_array_equal(np.moveaxis(img, -1, 0), x)


@needs_native
def test_noncontiguous_and_2d(tmp_path):
    x = np.random.default_rng(6).integers(0, 256, (3, 64, 128), dtype=np.uint8)
    view = x[:, ::2, ::2]  # strided view -> writer must copy or honor strides
    np.testing.assert_array_equal(_readback_planar(pngw.encode_png(view)),
                                  np.ascontiguousarray(view))
    g = x[0]
    np.testing.assert_array_equal(_readback_planar(pngw.encode_png(g)), g[None])
    n = pngw.write_png(str(tmp_path / "g.png"), g)
    assert n > 0 and (tmp_path / "g.png").stat().st_size == n


def test_write_png_cv2_fallback(tmp_path, monkeypatch):
    import cv2

    monkeypatch.setenv("WICCA_TPU_NO_NATIVE_PNG", "1")
    x = np.random.default_rng(7).integers(0, 256, (3, 40, 56), dtype=np.uint8)
    pngw.write_png(str(tmp_path / "f.png"), x)
    back = cv2.cvtColor(cv2.imread(str(tmp_path / "f.png")), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(np.moveaxis(back, -1, 0), x)


@needs_native
def test_size_competitive_with_cv2():
    """On photo-like content the Sub+RLE stream should land within ~15% of
    cv2's default PNG size (it must not silently degenerate to stored)."""
    import cv2

    rng = np.random.default_rng(11)
    h, w = 512, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.clip(128 + 60 * np.sin(xx / 31) + 50 * np.cos(yy / 43)
                  + rng.normal(0, 12, yy.shape), 0, 255).astype(np.uint8)
    x = np.stack([img, np.roll(img, 5, 0), np.roll(img, 9, 1)])
    ours = len(pngw.encode_png(x))
    hwc = cv2.cvtColor(np.ascontiguousarray(np.moveaxis(x, 0, -1)), cv2.COLOR_RGB2BGR)
    theirs = len(cv2.imencode(".png", hwc)[1])
    assert ours <= theirs * 1.15
