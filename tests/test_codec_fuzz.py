"""Codec fuzz sweep: random shapes x levels x steps x wavelets roundtrip
with bounded error and exact container reproduction."""

import numpy as np
import pytest

from wicca_tpu.codec import decode, deserialize, encode, serialize
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    c = int(rng.choice([1, 3]))
    h = int(rng.integers(33, 200))
    w = int(rng.integers(33, 200))
    levels = int(rng.integers(1, 6))
    step = float(rng.choice([0.25, 0.7, 1.0, 3.0]))
    hh_gain = float(rng.choice([1.0, 1.0, 1.5, 2.0]))  # WCT7 when != 1
    wavelet = str(rng.choice(["haar", "haar", "db2", "bior4.4", "legall5.3"]))
    color = "none"
    if c == 3 and rng.random() < 0.5:
        color = "rct" if wavelet == "legall5.3" else ("ict" if wavelet != "haar_int" else "none")
    x = rng.integers(0, 256, (c, h, w), np.uint8)

    stream = encode(x, levels=levels, spec=QuantSpec(base_step=step, hh_gain=hh_gain),
                    wavelet=wavelet, color=color)
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape, (c, h, w, levels, step, wavelet, color)
    if wavelet == "legall5.3":
        np.testing.assert_array_equal(
            np.asarray(decode(stream, emit_u8=True)), x, err_msg=str((c, h, w, levels, color))
        )
    else:
        p = float(psnr(rec, x.astype(np.float32)))
        # ICT chroma subsampling-by-quantization legitimately costs a couple
        # of dB on random noise; keep the strict floor for pure-luma runs
        floor = 28.0 if color == "none" else 26.0
        if hh_gain > 1.0:
            floor -= 2.0  # diagonal band deliberately coarser
        assert p > floor, (c, h, w, levels, step, wavelet, color, hh_gain, p)

    blob = serialize(stream)
    loaded = deserialize(blob)
    rec2 = np.asarray(decode(loaded))
    np.testing.assert_array_equal(rec2, rec, err_msg=str((c, h, w, levels, step, wavelet, color)))
