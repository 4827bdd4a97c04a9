"""Model-parallel building blocks: tensor / pipeline / expert parallelism.

The reference has no model parallelism at all (SURVEY.md §2.2 — its only
parallelism is a host thread pool over classifiers,
/root/reference/wicca/classifying_tools.py:414). SURVEY.md's checklist maps
the missing axes to TPU-native equivalents; this module supplies them as
idiomatic `shard_map` programs over a 1-D ``model`` mesh axis so the full
dp/sp/tp/pp/ep inventory is exercised end-to-end (see
``__graft_entry__.dryrun_multichip``):

* **tp** — Megatron-style column/row-parallel MLP: the first matmul's output
  features and the second's input features are sharded on the same axis, so
  one ``psum`` at the end reconstitutes the activations. Collectives ride
  ICI; weights never move.
* **pp** — GPipe schedule: identical stages stacked on the leading axis and
  sharded one-per-device; microbatch activations flow stage-to-stage via
  ``lax.ppermute`` inside a ``lax.scan`` over the (static) ``M + S - 1``
  schedule steps.
* **ep** — top-1 routed mixture-of-experts: experts sharded over the axis,
  every device evaluates its local experts on the (replicated) token batch,
  masks by the router's choice, and a ``psum`` combines — the dense-mask
  formulation that XLA handles well at these sizes (no ragged all-to-all).

All three are validated against single-device references on the 8-virtual-
device CPU mesh (tests/test_model_parallel.py) and dry-run compiled by the
driver's multichip entry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

MODEL_AXIS = "model"


def model_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices for model-parallel (tp/pp/ep) demos."""
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (MODEL_AXIS,))


# --------------------------------------------------------------------------
# Tensor parallelism (Megatron column/row-parallel MLP)
# --------------------------------------------------------------------------

def tp_mlp_init(rng, d_in: int, d_hidden: int, d_out: int, dtype=jnp.float32) -> dict:
    """Two-layer MLP params; hidden dim is the sharded (tp) dimension."""
    k1, k2 = jax.random.split(rng)
    s1 = (2.0 / d_in) ** 0.5
    s2 = (2.0 / d_hidden) ** 0.5
    return {
        "w1": (jax.random.normal(k1, (d_in, d_hidden)) * s1).astype(dtype),
        "b1": jnp.zeros((d_hidden,), dtype),
        "w2": (jax.random.normal(k2, (d_hidden, d_out)) * s2).astype(dtype),
        "b2": jnp.zeros((d_out,), dtype),
    }


def tp_mlp_shardings(mesh: Mesh) -> dict:
    """NamedShardings to device_put ``tp_mlp_init`` params onto the mesh:
    w1 column-parallel, w2 row-parallel, b2 replicated."""
    return {
        "w1": NamedSharding(mesh, P(None, MODEL_AXIS)),
        "b1": NamedSharding(mesh, P(MODEL_AXIS)),
        "w2": NamedSharding(mesh, P(MODEL_AXIS, None)),
        "b2": NamedSharding(mesh, P()),
    }


def tp_mlp_apply(params: dict, x: jax.Array, mesh: Mesh) -> jax.Array:
    """Tensor-parallel MLP forward: relu(x @ w1 + b1) @ w2 + b2 with the
    hidden dimension sharded over ``model``; ONE psum total."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS, None), P(), P()),
        out_specs=P(),
    )
    def run(w1, b1, w2, b2, xs):
        h = jax.nn.relu(xs @ w1 + b1)  # local hidden shard
        y = h @ w2                     # partial sum over hidden shards
        return lax.psum(y, MODEL_AXIS) + b2

    return run(params["w1"], params["b1"], params["w2"], params["b2"], x)


def tp_mlp_reference(params: dict, x: jax.Array) -> jax.Array:
    """Single-device oracle for the tp kernel."""
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


# --------------------------------------------------------------------------
# Pipeline parallelism (GPipe schedule over ppermute)
# --------------------------------------------------------------------------

def pp_stages_init(rng, n_stages: int, d: int, dtype=jnp.float32) -> dict:
    """``n_stages`` identical residual-MLP stages stacked on axis 0 (the
    sharded pp dimension)."""
    ks = jax.random.split(rng, n_stages)
    s = (1.0 / d) ** 0.5
    w = jnp.stack([jax.random.normal(k, (d, d)) * s for k in ks]).astype(dtype)
    b = jnp.zeros((n_stages, d), dtype)
    return {"w": w, "b": b}


def pp_stage_shardings(mesh: Mesh) -> dict:
    return {
        "w": NamedSharding(mesh, P(MODEL_AXIS)),
        "b": NamedSharding(mesh, P(MODEL_AXIS)),
    }


def _pp_stage(w, b, x):
    return x + jax.nn.relu(x @ w + b)


def pp_apply(params: dict, microbatches: jax.Array, mesh: Mesh) -> jax.Array:
    """GPipe forward: ``microbatches`` is (M, mb, d), replicated; stage
    params are sharded one stage per device over ``model``. Activations
    ppermute from stage i to i+1 each schedule step; the last stage's
    outputs are psum-broadcast back (they are zero elsewhere)."""
    n_stages = mesh.shape[MODEL_AXIS]
    n_micro = microbatches.shape[0]
    if params["w"].shape[0] != n_stages:
        # the schedule below holds exactly one stage per device (w[0]); a
        # mismatch would shard cleanly and silently drop/duplicate stages
        raise ValueError(
            f"pp_apply needs one stage per device: got {params['w'].shape[0]} "
            f"stages on a {n_stages}-device '{MODEL_AXIS}' axis"
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P()),
        out_specs=P(),
    )
    def run(w, b, xs):
        w, b = w[0], b[0]  # this device's stage
        idx = lax.axis_index(MODEL_AXIS)
        perm = [(i, i + 1) for i in range(n_stages - 1)]
        zero = lax.pcast(jnp.zeros_like(xs[0]), MODEL_AXIS, to="varying")

        def step(recv, t):
            # stage 0 takes microbatch t from the feed; others take the wire
            feed = xs[jnp.minimum(t, n_micro - 1)]
            state = jnp.where((idx == 0) & (t < n_micro), feed, recv)
            y = _pp_stage(w, b, state)
            return lax.ppermute(y, MODEL_AXIS, perm), y

        _, ys = lax.scan(step, zero, jnp.arange(n_micro + n_stages - 1))
        # the last stage emitted microbatch m at step m + n_stages - 1
        outs = ys[n_stages - 1:]
        outs = jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, MODEL_AXIS)

    return run(params["w"], params["b"], microbatches)


def pp_reference(params: dict, microbatches: jax.Array) -> jax.Array:
    """Single-device oracle: run every microbatch through all stages."""
    def one(mb):
        y, _ = lax.scan(lambda x, wb: (_pp_stage(wb[0], wb[1], x), None), mb, (params["w"], params["b"]))
        return y

    return jax.vmap(one)(microbatches)


# --------------------------------------------------------------------------
# Expert parallelism (top-1 routed MoE)
# --------------------------------------------------------------------------

def moe_init(rng, n_experts: int, d: int, d_hidden: int, dtype=jnp.float32) -> dict:
    kg, kw1, kw2 = jax.random.split(rng, 3)
    s1 = (2.0 / d) ** 0.5
    s2 = (2.0 / d_hidden) ** 0.5
    return {
        "gate": (jax.random.normal(kg, (d, n_experts)) * s1).astype(dtype),
        "w1": (jax.random.normal(kw1, (n_experts, d, d_hidden)) * s1).astype(dtype),
        "w2": (jax.random.normal(kw2, (n_experts, d_hidden, d)) * s2).astype(dtype),
    }


def moe_shardings(mesh: Mesh) -> dict:
    return {
        "gate": NamedSharding(mesh, P()),
        "w1": NamedSharding(mesh, P(MODEL_AXIS)),
        "w2": NamedSharding(mesh, P(MODEL_AXIS)),
    }


def _expert_ffn(w1, w2, x):
    return jax.nn.relu(x @ w1) @ w2


def moe_apply(params: dict, x: jax.Array, mesh: Mesh) -> jax.Array:
    """Top-1 MoE forward: tokens (T, d) replicated, experts sharded over
    ``model``. Each device runs its local experts on all tokens, masks by
    the router, scales by the gate probability, and psum-combines."""
    n_experts = params["w1"].shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS), P(MODEL_AXIS), P()),
        out_specs=P(),
    )
    def run(gate, w1, w2, xs):
        logits = xs @ gate                                  # (T, E)
        choice = jnp.argmax(logits, axis=-1)                # (T,)
        prob = jnp.max(jax.nn.softmax(logits, axis=-1), -1)  # (T,)
        idx = lax.axis_index(MODEL_AXIS)
        e_local = w1.shape[0]
        base = idx * e_local

        def one_expert(e, acc):
            y = _expert_ffn(w1[e], w2[e], xs)
            m = (choice == base + e).astype(xs.dtype)[:, None]
            return acc + y * m

        out = lax.fori_loop(
            0, e_local, one_expert, lax.pcast(jnp.zeros_like(xs), MODEL_AXIS, to="varying")
        )
        return lax.psum(out, MODEL_AXIS) * prob[:, None]

    return run(params["gate"], params["w1"], params["w2"], x)


def moe_reference(params: dict, x: jax.Array) -> jax.Array:
    logits = x @ params["gate"]
    choice = jnp.argmax(logits, axis=-1)
    prob = jnp.max(jax.nn.softmax(logits, axis=-1), -1)
    ys = jax.vmap(lambda w1, w2: _expert_ffn(w1, w2, x))(params["w1"], params["w2"])  # (E, T, d)
    picked = jnp.take_along_axis(ys, choice[None, :, None], axis=0)[0]
    return picked * prob[:, None]
