"""tp/pp/ep shard_map programs match their single-device oracles on the
8-virtual-device CPU mesh (SURVEY.md §2.2 parallelism checklist)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wicca_tpu.parallel import model_parallel as mp


@pytest.fixture(scope="module")
def mesh():
    return mp.model_mesh()


def _put(params, shardings):
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}


def test_tensor_parallel_mlp(mesh):
    rng = jax.random.PRNGKey(0)
    params = mp.tp_mlp_init(rng, d_in=24, d_hidden=64, d_out=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 24))
    want = mp.tp_mlp_reference(params, x)
    got = jax.jit(lambda p, x: mp.tp_mlp_apply(p, x, mesh))(_put(params, mp.tp_mlp_shardings(mesh)), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_parallel_gpipe(mesh):
    n_stages = mesh.shape[mp.MODEL_AXIS]
    rng = jax.random.PRNGKey(2)
    params = mp.pp_stages_init(rng, n_stages, d=16)
    mb = jax.random.normal(jax.random.PRNGKey(3), (5, 4, 16))  # (M, mb, d)
    want = mp.pp_reference(params, mb)
    got = jax.jit(lambda p, x: mp.pp_apply(p, x, mesh))(_put(params, mp.pp_stage_shardings(mesh)), mb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_stage_count_mismatch_raises(mesh):
    """2x stages per device shards cleanly but would silently drop stages;
    pp_apply must fail loudly instead (ADVICE r2)."""
    n_stages = mesh.shape[mp.MODEL_AXIS]
    params = mp.pp_stages_init(jax.random.PRNGKey(8), 2 * n_stages, d=16)
    mb = jax.random.normal(jax.random.PRNGKey(9), (3, 4, 16))
    with pytest.raises(ValueError, match="one stage per device"):
        mp.pp_apply(params, mb, mesh)


def test_expert_parallel_moe(mesh):
    n_dev = mesh.shape[mp.MODEL_AXIS]
    rng = jax.random.PRNGKey(4)
    params = mp.moe_init(rng, n_experts=2 * n_dev, d=12, d_hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(5), (33, 12))
    want = mp.moe_reference(params, x)
    got = jax.jit(lambda p, x: mp.moe_apply(p, x, mesh))(_put(params, mp.moe_shardings(mesh)), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_moe_routing_actually_spreads(mesh):
    # sanity: the router sends tokens to >1 expert so the psum-combine is
    # genuinely exercised (not a degenerate single-expert pick)
    params = mp.moe_init(jax.random.PRNGKey(6), n_experts=mesh.shape[mp.MODEL_AXIS], d=12, d_hidden=8)
    x = jax.random.normal(jax.random.PRNGKey(7), (64, 12))
    choice = np.asarray(jnp.argmax(x @ params["gate"], axis=-1))
    assert len(set(choice.tolist())) > 1
