"""Subprocess worker for tests/test_distributed_2proc.py — one controller of
a real 2-process jax.distributed CPU cluster (localhost coordinator).

Not a test module (no test_ prefix). Each worker owns 2 virtual CPU devices,
so the cluster has a genuine 4-device global mesh with cross-process
collectives over the coordinator service.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    delay_s = float(sys.argv[3])
    init_timeout_s = float(sys.argv[4])

    import logging

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s", stream=sys.stdout)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if delay_s:
        time.sleep(delay_s)  # flaky-start: this controller comes up late

    import numpy as np

    from wicca_tpu.parallel.mesh import init_distributed

    ok = init_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
        retries=6, backoff_s=1.0, init_timeout_s=init_timeout_s,
    )
    if not ok:
        print(f"FAIL pid={pid}: init_distributed returned False", flush=True)
        return 1
    if jax.process_count() != 2:
        print(f"FAIL pid={pid}: process_count={jax.process_count()}", flush=True)
        return 1
    devices = jax.devices()
    if len(devices) != 4:
        print(f"FAIL pid={pid}: {len(devices)} global devices", flush=True)
        return 1

    # cross-process gather through the coordinator service
    from jax.experimental import multihost_utils

    g = np.asarray(multihost_utils.process_allgather(np.array([float(pid + 1)])))
    if float(g.sum()) != 3.0:
        print(f"FAIL pid={pid}: allgather sum {g.sum()}", flush=True)
        return 1

    # a real psum across the 4-device global mesh (2 devices per process)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    mesh = Mesh(np.array(devices), ("d",))
    arr = jax.make_array_from_callback(
        (4,), NamedSharding(mesh, P("d")), lambda idx: np.ones(1, np.float32)
    )
    out = jax.jit(
        shard_map(lambda x: jax.lax.psum(x, "d"), mesh=mesh, in_specs=P("d"), out_specs=P())
    )(arr)
    total = float(np.asarray(out)[0])
    if total != 4.0:
        print(f"FAIL pid={pid}: global psum {total}", flush=True)
        return 1
    multihost_utils.sync_global_devices("done")
    print(f"OK pid={pid} procs=2 devices=4 psum={total}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
