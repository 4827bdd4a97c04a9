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

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_ROW_AXIS = "ty"
TILE_COL_AXIS = "tx"


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    retries: int = 3,
    backoff_s: float = 5.0,
    init_timeout_s: float | None = None,
) -> bool:
    """Multi-controller init for multi-host slices (SURVEY.md §5: the
    reference is single-process; this wraps jax.distributed.initialize).

    With no arguments, relies on the TPU environment's auto-detection (GKE /
    Cloud TPU metadata). No-op when already initialized or single-process.

    Fault handling: multi-host bring-up races are the norm (workers start at
    different times; the coordinator may not be listening yet), so failed
    attempts retry with linear backoff. Returns True when the distributed
    runtime is up (or already was), False when every attempt failed and the
    process should treat itself as single-host.
    """
    import logging
    import time

    kw = {}
    if init_timeout_s is not None:
        # bound each attempt so a dead coordinator surfaces as a retry (the
        # default initialization_timeout is 300 s — fine for production
        # bring-up, too slow to detect a flaky start)
        kw["initialization_timeout"] = max(1, int(init_timeout_s))
    last: Exception | None = None
    for attempt in range(max(1, retries)):
        try:
            if coordinator is None and num_processes is None:
                jax.distributed.initialize(**kw)
            else:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=num_processes,
                    process_id=process_id,
                    **kw,
                )
            return True
        except RuntimeError as e:
            if "already initialized" in str(e).lower():
                return True
            last = e
        except ValueError as e:
            # config error (bad address / no backend): retrying won't help
            logging.info(f"jax.distributed not initialized: {e}")
            return False
        if attempt + 1 < retries:
            logging.warning(
                f"jax.distributed.initialize failed (attempt {attempt + 1}/{retries}): "
                f"{last}; retrying in {backoff_s * (attempt + 1):.0f}s"
            )
            time.sleep(backoff_s * (attempt + 1))
    logging.warning(f"jax.distributed unavailable after {retries} attempts: {last}")
    return False


def mesh_health_check(mesh: Mesh, timeout_s: float = 60.0) -> bool:
    """Pre-flight collective check: one tiny psum across every mesh axis must
    return the device count. Catches a dead/hung ICI link or a wedged worker
    BEFORE a long run commits to the mesh (SURVEY.md §5 failure-detection
    row; the reference has no distributed runtime to check).

    Runs the collective on a worker thread so a hang surfaces as a timely
    False instead of blocking the job forever.
    """
    import concurrent.futures

    import jax.numpy as jnp
    from jax import shard_map

    axes = tuple(mesh.axis_names)
    n = int(np.prod([mesh.shape[a] for a in axes]))

    def _probe() -> int:
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(*axes),), out_specs=P(),
        )
        def count(x):
            total = x
            for a in axes:
                total = jax.lax.psum(total, a)
            return total

        ones = jnp.ones((n,) + (1,) * (len(axes) - 1), jnp.int32).reshape(
            tuple(mesh.shape[a] for a in axes)
        )
        return int(np.asarray(count(ones))[(0,) * len(axes)])

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(_probe)
    try:
        return fut.result(timeout=timeout_s) == n
    except Exception:  # noqa: BLE001 - timeout or compile/runtime failure
        return False
    finally:
        # do NOT join a wedged worker — that would turn the timeout back
        # into a hang; the thread is abandoned and the process stays live
        pool.shutdown(wait=False)


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
