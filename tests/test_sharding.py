"""Distributed-without-hardware tests (SURVEY.md §4 item 4): 8 virtual CPU
devices; sharded and unsharded samplers must produce identical chains —
same RNG streams via partitionable threefry, numerics equal up to
float-ulp compiler reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import mcmc, parallel, targets
from l2hmc_tpu.train import (
    ScgConfig,
    build_dynamics,
    init_state,
    make_optimizer,
    make_train_step,
    sample_chain,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return parallel.chain_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape == {"chains": 8}


def test_shard_chains_placement(mesh):
    x = jnp.ones((64, 2))
    xs = parallel.shard_chains(mesh, x)
    assert xs.sharding.is_equivalent_to(parallel.chain_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_propose_bitwise_equal(mesh, key):
    """The core reproducibility contract: same keys, same chains, sharded or
    not (SURVEY.md §7 stage 6)."""
    cfg = ScgConfig(n_chains=64, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(key, eps=0.1)
    x = jax.random.normal(jax.random.key(1), (64, 2))

    def step(params, x, k):
        out = mcmc.propose(k, dyn, params, x, do_mh_step=True)
        return out.x_next, out.p_accept

    k = jax.random.key(2)
    x_plain, p_plain = jax.jit(step)(params, x, k)

    sharded = parallel.sharded_jit(
        step, mesh, ("replicated", "chains", "replicated")
    )
    x_shard, p_shard = sharded(params, parallel.shard_chains(mesh, x), k)

    # RNG streams are identical under partitionable threefry; numerics may
    # differ at float-ulp level because XLA fuses the two programs
    # differently. Accept decisions (which depend on identical uniforms)
    # must agree exactly.
    np.testing.assert_allclose(
        np.asarray(x_plain), np.asarray(x_shard), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_plain), np.asarray(p_shard), rtol=1e-5, atol=1e-7
    )


def test_sharded_train_step_matches_unsharded(mesh):
    """One full train step (loss, grads, Adam, chain update) sharded over 8
    devices == single-device, bit-for-bit on the chain state and params."""
    cfg = ScgConfig(n_chains=64, T=3)
    dyn, _ = build_dynamics(cfg)
    optimizer, _ = make_optimizer(cfg)
    state = init_state(cfg, dyn, optimizer)
    step_fn = make_train_step(cfg, dyn, optimizer)

    plain_state, plain_metrics = jax.jit(step_fn)(state, None)

    sharded_state0 = parallel.shard_train_state(mesh, state)
    shard_state, shard_metrics = jax.jit(step_fn)(sharded_state0, None)

    np.testing.assert_allclose(
        np.asarray(plain_state.x), np.asarray(shard_state.x), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(plain_state.params),
        jax.tree_util.tree_leaves(shard_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(plain_metrics["loss"]), float(shard_metrics["loss"]), rtol=1e-5
    )
    # chain state stays sharded across the step (no implicit gather)
    assert shard_state.x.sharding.is_equivalent_to(
        parallel.chain_sharding(mesh), 2
    )


def test_sharded_sample_chain(mesh, key):
    """Device-resident eval chain under sharding: trace equals unsharded."""
    cfg = ScgConfig(n_chains=32, T=3)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(key, eps=0.1)
    x0 = target.sample(jax.random.key(4), 32)

    _, trace_plain = sample_chain(dyn, params, x0, 20, jax.random.key(5))
    _, trace_shard = sample_chain(
        dyn, params, parallel.shard_chains(mesh, x0), 20, jax.random.key(5)
    )
    np.testing.assert_allclose(
        np.asarray(trace_plain), np.asarray(trace_shard), rtol=1e-6, atol=1e-7
    )


def test_fold_in_chain_keys(key):
    ks = parallel.fold_in_chain_keys(key, 16)
    assert ks.shape == (16,)
    # distinct streams per chain
    draws = jax.vmap(lambda k: jax.random.normal(k, ()))(ks)
    assert len(np.unique(np.asarray(draws))) == 16
