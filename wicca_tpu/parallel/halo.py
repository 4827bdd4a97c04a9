"""Halo exchange for tiled wavelet transforms (SURVEY.md §5 'spatial tiling').

Wide wavelets (db2 support 4, bior4.4 support 9/7) need neighbor samples at
tile boundaries. Each lifting step touches at most one sample of the *other*
polyphase channel across the boundary, so a single-element ppermute per step
per axis suffices — the per-level halo exchange of BASELINE.json config 5.
Devices at the true image boundary fall back to edge replication, matching
the single-device clamped extension in :mod:`wicca_tpu.core.lifting` exactly,
so tiled results equal single-device results to float roundoff (and exactly,
for Haar).

All functions run *inside* ``jax.shard_map`` over a mesh axis; collectives
ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shift_halo(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """Distributed version of :func:`wicca_tpu.core.lifting._shift`.

    ``x`` is the local block of a last-axis-sharded global array. Returns the
    local block of global ``x[n+k]`` with edge replication at the *global*
    boundary: interior boundaries pull the needed |k| columns from the
    neighbor via ppermute.
    """
    if k == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        from wicca_tpu.core.lifting import _shift

        return _shift(x, k)
    idx = jax.lax.axis_index(axis_name)
    m = abs(k)
    if m > x.shape[-1]:
        raise ValueError("halo wider than local block")
    if k > 0:
        # need the first k columns of the right neighbor
        send = x[..., :m]
        recv = jax.lax.ppermute(send, axis_name, [(i, i - 1) for i in range(1, n)])
        edge = jnp.repeat(x[..., -1:], m, axis=-1)
        tail = jnp.where(idx == n - 1, edge, recv)
        return jnp.concatenate([x[..., m:], tail], axis=-1)
    # k < 0: need the last |k| columns of the left neighbor
    send = x[..., -m:]
    recv = jax.lax.ppermute(send, axis_name, [(i, i + 1) for i in range(n - 1)])
    edge = jnp.repeat(x[..., :1], m, axis=-1)
    head = jnp.where(idx == 0, edge, recv)
    return jnp.concatenate([head, x[..., :-m]], axis=-1)


def make_shift(axis_name: str | None):
    """Shift closure for the lifting kernels: local clamp or halo exchange."""
    if axis_name is None:
        from wicca_tpu.core.lifting import _shift

        return _shift
    return lambda a, k: shift_halo(a, k, axis_name)
