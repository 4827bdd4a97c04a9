"""Distributed bring-up fault handling (parallel/mesh.py; SURVEY.md §5
failure-detection row — the reference has no distributed runtime at all)."""

import numpy as np
import pytest

from wicca_tpu.parallel.mesh import init_distributed, make_mesh, mesh_health_check


def test_health_check_passes_on_live_mesh():
    assert mesh_health_check(make_mesh(data=2, ty=2, tx=2)) is True
    assert mesh_health_check(make_mesh(data=8)) is True


def test_health_check_times_out_instead_of_hanging(monkeypatch):
    """A wedged collective must surface as False within the timeout, not
    block the job forever."""
    import time

    import wicca_tpu.parallel.mesh as mesh_mod

    mesh = make_mesh(data=2)
    orig_asarray = np.asarray

    def hang(*a, **k):
        time.sleep(30)
        return orig_asarray(*a, **k)

    monkeypatch.setattr(mesh_mod.np, "asarray", hang)
    t0 = time.monotonic()
    assert mesh_health_check(mesh, timeout_s=1.0) is False
    assert time.monotonic() - t0 < 10


def test_init_distributed_bad_config_returns_false():
    """A config error (unreachable coordinator with 2 claimed processes on a
    1-process run) fails fast and reports single-host, not a crash."""
    ok = init_distributed(
        coordinator="127.0.0.1:1", num_processes=2, process_id=0,
        retries=1, backoff_s=0.0,
    )
    assert ok is False


def test_init_distributed_retries_transient(monkeypatch):
    """RuntimeErrors (coordinator not up yet) retry with backoff, then
    succeed without re-raising."""
    import jax

    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("coordinator unavailable")

    monkeypatch.setattr(jax.distributed, "initialize", flaky)
    assert init_distributed(retries=3, backoff_s=0.0) is True
    assert calls["n"] == 2

    def already(*a, **k):
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    assert init_distributed(retries=2, backoff_s=0.0) is True
