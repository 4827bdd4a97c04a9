"""Device-mesh construction for data- and spatial-tile-parallel transforms.

The reference's only parallelism is a host thread pool over classifiers
(/root/reference/wicca/classifying_tools.py:414; SURVEY.md §2.2). The
TPU-native equivalents (SURVEY.md §5 'Distributed communication backend'):

* ``data`` axis  — batch of images sharded across chips (DP)
* ``ty``/``tx``  — spatial tiles of one huge image across chips, the 2-D
  analog of sequence/context parallelism; halos ride ICI via ppermute
  (:mod:`wicca_tpu.parallel.halo`)

Works identically on real TPU slices and on CPU with
``--xla_force_host_platform_device_count=N`` (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_ROW_AXIS = "ty"
TILE_COL_AXIS = "tx"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Multi-controller init for multi-host slices (SURVEY.md §5: the
    reference is single-process; this wraps jax.distributed.initialize).

    With no arguments, relies on the TPU environment's auto-detection (GKE /
    Cloud TPU metadata). No-op when already initialized or single-process.
    """
    import logging

    try:
        if coordinator is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError) as e:
        logging.info(f"jax.distributed not (re)initialized: {e}")


def make_mesh(data: int = 1, ty: int = 1, tx: int = 1, devices=None) -> Mesh:
    """Mesh over (data, ty, tx). Total must divide the device count; by
    default the data axis absorbs the remaining devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    want = data * ty * tx
    if want > n:
        raise ValueError(f"mesh {data}x{ty}x{tx} needs {want} devices, have {n}")
    devices = devices[:want]
    arr = np.array(devices).reshape(data, ty, tx)
    return Mesh(arr, (DATA_AXIS, TILE_ROW_AXIS, TILE_COL_AXIS))


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices for batch (DP) sharding."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (DATA_AXIS,))


def tile_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for planar images ``(..., H, W)``: H over ty, W over tx."""
    spec = [None] * (ndim - 2) + [TILE_ROW_AXIS, TILE_COL_AXIS]
    return NamedSharding(mesh, P(*spec))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for batched data ``(N, ...)``: N over data axis."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
