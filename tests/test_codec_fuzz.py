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
    wavelet = str(rng.choice(["haar", "haar", "db2", "bior4.4"]))
    x = rng.integers(0, 256, (c, h, w), np.uint8)

    stream = encode(x, levels=levels, spec=QuantSpec(base_step=step), wavelet=wavelet)
    rec = np.asarray(decode(stream))
    assert rec.shape == x.shape, (c, h, w, levels, step, wavelet)
    p = float(psnr(rec, x.astype(np.float32)))
    assert p > 28.0, (c, h, w, levels, step, wavelet, p)

    blob = serialize(stream)
    loaded = deserialize(blob)
    rec2 = np.asarray(decode(loaded))
    np.testing.assert_array_equal(rec2, rec, err_msg=str((c, h, w, levels, step, wavelet)))
