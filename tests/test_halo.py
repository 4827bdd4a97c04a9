"""Direct unit tests of the ppermute halo shift (wicca_tpu.parallel.halo):
the distributed shift must equal the single-device clamped shift on the
concatenated global array."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from wicca_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(ty=1, tx=8)


@pytest.mark.parametrize("k", [-2, -1, 1, 2])
def test_shift_halo_matches_global_clamped_shift(mesh8, k):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from wicca_tpu.core.lifting import _shift
    from wicca_tpu.parallel.halo import shift_halo

    x = np.arange(2 * 64, dtype=np.float32).reshape(2, 64) * 3.1

    def fn(xl):
        return shift_halo(xl, k, "tx")

    shifted = jax.shard_map(
        fn, mesh=mesh8, in_specs=P(None, "tx"), out_specs=P(None, "tx")
    )(jnp.asarray(x))
    want = np.asarray(_shift(jnp.asarray(x), k))
    np.testing.assert_array_equal(np.asarray(shifted), want)


def test_shift_halo_zero_is_identity(mesh8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from wicca_tpu.parallel.halo import shift_halo

    x = np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32)
    out = jax.shard_map(
        lambda xl: shift_halo(xl, 0, "tx"), mesh=mesh8, in_specs=P(None, "tx"), out_specs=P(None, "tx")
    )(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out), x)


def test_shift_halo_wider_than_block_raises(mesh8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from wicca_tpu.parallel.halo import shift_halo

    x = jnp.zeros((2, 16), jnp.float32)  # local blocks of 2 columns
    with pytest.raises(ValueError):
        jax.shard_map(
            lambda xl: shift_halo(xl, 5, "tx"), mesh=mesh8, in_specs=P(None, "tx"), out_specs=P(None, "tx")
        )(x)
