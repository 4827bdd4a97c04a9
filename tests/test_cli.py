"""CLI smoke tests through the argparse surface (L7)."""

import numpy as np
import pytest

from wicca_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("cli")
    (root / "imgs").mkdir()
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    for i in range(3):
        img = np.clip(128 + 60 * np.sin(xx / (11 + i)) + rng.normal(0, 6, (96, 128)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(root / "imgs" / f"im{i}.png"), np.stack([img] * 3, -1))
    return root


def test_encode_decode_icon(workdir, capsys):
    assert main(["encode", str(workdir / "imgs" / "im0.png"), str(workdir / "im0.wct"), "--levels", "3"]) == 0
    assert main(["decode", str(workdir / "im0.wct"), str(workdir / "rec0.png"),
                 "--original", str(workdir / "imgs" / "im0.png")]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out
    assert main(["icon", str(workdir / "imgs" / "im0.png"), str(workdir / "icon.png"), "--depth", "2"]) == 0
    assert (workdir / "icon.png").is_file()


def test_transcode_cli(workdir, capsys):
    src = str(workdir / "imgs" / "im2.png")
    wct = str(workdir / "im2_layered.wct")
    assert main(["encode", src, wct, "--levels", "3", "--quality-layers", "3"]) == 0
    out1 = str(workdir / "im2_l1.wct")
    assert main(["transcode", wct, out1, "--max-layers", "1", "--drop-levels", "1",
                 "--codec", "rice"]) == 0
    assert "->" in capsys.readouterr().out
    from wicca_tpu.codec.container import inspect

    info = inspect(out1)
    assert info["levels"] == 2
    assert info["quality_layers"] == 1
    assert info["orig_shape"] == (48, 64)
    assert all(p["codec"] == "rice" for p in info["planes"])
    # decodes as a valid half-resolution stream
    assert main(["decode", out1, str(workdir / "im2_half.png")]) == 0
    import cv2

    half = cv2.imread(str(workdir / "im2_half.png"))
    assert half.shape[:2] == (48, 64)
    # invalid request exits 2 with a message, not a traceback
    assert main(["transcode", wct, out1, "--drop-levels", "9"]) == 2


def test_icon_from_wct_stream(workdir, capsys):
    cv2 = pytest.importorskip("cv2")
    src = str(workdir / "imgs" / "im1.png")
    wct = str(workdir / "im1_icon_src.wct")
    assert main(["encode", src, wct, "--levels", "3"]) == 0
    assert main(["icon", wct, str(workdir / "icon_ll.png")]) == 0
    out = capsys.readouterr().out
    assert "stream LL" in out
    ll = cv2.imread(str(workdir / "icon_ll.png"))
    assert ll is not None and ll.shape[:2] == (96 // 8, 128 // 8)
    # the stream's LL is the transform's coarse band — same geometry as the
    # direct icon path, content equal for haar at step<=1 up to quantization
    assert main(["icon", src, str(workdir / "icon_img.png"), "--depth", "3"]) == 0
    direct = cv2.imread(str(workdir / "icon_img.png"))
    assert direct.shape == ll.shape
    assert np.abs(ll.astype(int) - direct.astype(int)).max() <= 2


def test_analyze_and_compare(workdir, capsys):
    res = str(workdir / "res")
    rc = main(["analyze", str(workdir / "imgs"), "--models", "SimpleCNN", "--depths", "1",
               "--input-size", "64", "--results-folder", res, "--quiet"])
    assert rc == 0
    assert (workdir / "res" / "depth-1" / "SimpleCNN-depth-1.csv").is_file()
    assert (workdir / "res" / "depth-1" / "run-metrics.json").is_file()
    rc = main(["compare", res, "--models", "SimpleCNN", "--depths", "1"])
    assert rc == 0
    assert "similar classes" in capsys.readouterr().out


def test_bad_inputs(workdir, capsys):
    assert main(["encode", str(workdir / "nope.png"), str(workdir / "x.wct")]) == 2
    assert main(["analyze", str(workdir / "imgs"), "--models", "NopeNet",
                 "--results-folder", str(workdir / "res2"), "--quiet"]) == 2


def test_encode_decode_wide_wavelet_cli(workdir, capsys):
    assert main(["encode", str(workdir / "imgs" / "im1.png"), str(workdir / "im1b.wct"),
                 "--levels", "3", "--wavelet", "bior4.4", "--step", "1.0"]) == 0
    assert main(["decode", str(workdir / "im1b.wct"), str(workdir / "rec1b.png"),
                 "--original", str(workdir / "imgs" / "im1.png")]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out
    db = float(out.rsplit("PSNR", 1)[1].split("dB")[0])
    assert db > 30.0


def test_icon_lifting_wavelet_cli(workdir):
    assert main(["icon", str(workdir / "imgs" / "im2.png"), str(workdir / "icon_b.png"),
                 "--depth", "2", "--wavelet", "bior4.4"]) == 0
    assert (workdir / "icon_b.png").is_file()


def test_analyze_reconstruction_mode(workdir):
    res = str(workdir / "res_rec")
    rc = main(["analyze", str(workdir / "imgs"), "--models", "SimpleCNN", "--depths", "1",
               "--input-size", "64", "--results-folder", res, "--quiet",
               "--compare", "reconstruction", "--step", "2.0"])
    assert rc == 0
    assert (workdir / "res_rec" / "depth-1" / "SimpleCNN-depth-1.csv").is_file()


def test_encode_rate_control_cli(workdir, capsys):
    assert main(["encode", str(workdir / "imgs" / "im2.png"), str(workdir / "im2rc.wct"),
                 "--levels", "3", "--target-bpp", "1.5", "--codec", "rc",
                 "--rate-control", "step"]) == 0
    out = capsys.readouterr().out
    assert "rate control" in out
    assert main(["decode", str(workdir / "im2rc.wct"), str(workdir / "rec2rc.png"),
                 "--original", str(workdir / "imgs" / "im2.png")]) == 0
    # mutually exclusive targets
    assert main(["encode", str(workdir / "imgs" / "im2.png"), str(workdir / "x.wct"),
                 "--target-bpp", "1.0", "--target-psnr", "40.0"]) == 2


def test_encode_quality_layers_and_region_cli(workdir, capsys):
    assert main(["encode", str(workdir / "imgs" / "im1.png"), str(workdir / "im1q.wct"),
                 "--levels", "3", "--quality-layers", "3"]) == 0
    assert main(["decode", str(workdir / "im1q.wct"), str(workdir / "rec1q.png"),
                 "--max-layers", "2", "--original", str(workdir / "imgs" / "im1.png")]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out
    assert main(["decode", str(workdir / "im1q.wct"), str(workdir / "roi1q.png"),
                 "--region", "8", "40", "16", "48"]) == 0
    import cv2

    roi = cv2.imread(str(workdir / "roi1q.png"))
    assert roi.shape[:2] == (32, 32)


def test_decode_at_level_cli(workdir, capsys):
    assert main(["encode", str(workdir / "imgs" / "im2.png"), str(workdir / "im2.wct"),
                 "--levels", "3"]) == 0
    assert main(["decode", str(workdir / "im2.wct"), str(workdir / "half2.png"),
                 "--at-level", "1"]) == 0
    import cv2

    half = cv2.imread(str(workdir / "half2.png"))
    assert half.shape[:2] == (48, 64)  # 96x128 source at 1/2 resolution
    # mutually exclusive with --region
    assert main(["decode", str(workdir / "im2.wct"), str(workdir / "x.png"),
                 "--at-level", "1", "--region", "0", "8", "0", "8"]) == 2


def test_encode_decode_u16_roundtrip(workdir, capsys):
    """16-bit PNG auto-detects the hi-depth path; lossless wavelet roundtrips
    bit-exactly through the CLI."""
    cv2 = pytest.importorskip("cv2")
    x = np.random.default_rng(5).integers(0, 65536, (64, 96, 3), dtype=np.uint16)
    src = workdir / "hi.png"
    cv2.imwrite(str(src), cv2.cvtColor(x, cv2.COLOR_RGB2BGR))
    wct = workdir / "hi.wct"
    rec = workdir / "hi_rec.png"
    assert main(["encode", str(src), str(wct), "--levels", "3", "--wavelet", "legall5.3"]) == 0
    assert main(["decode", str(wct), str(rec), "--original", str(src)]) == 0
    out = capsys.readouterr().out
    assert "PSNR inf" in out or "PSNR" in out
    back = cv2.cvtColor(cv2.imread(str(rec), cv2.IMREAD_UNCHANGED), cv2.COLOR_BGR2RGB)
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, x)


def test_encode_roi_flag(workdir, capsys):
    src = workdir / "imgs" / "im1.png"
    wct = workdir / "roi.wct"
    assert main(["encode", str(src), str(wct), "--levels", "3",
                 "--roi", "16", "48", "16", "64", "--roi-bg-shift", "2"]) == 0
    out = capsys.readouterr().out
    assert "ROI" in out
    assert main(["decode", str(wct), str(workdir / "roi_rec.png")]) == 0
