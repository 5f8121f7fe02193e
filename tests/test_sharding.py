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


@pytest.mark.slow
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


# -- fused Pallas kernels under the mesh (VERDICT r2 missing #1) --------------


@pytest.fixture(scope="module")
def fused_setup():
    cfg = ScgConfig(n_chains=128, T=3)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    x = jax.random.normal(jax.random.key(1), (128, 2), jnp.float32)
    return dyn, target, params, x


def test_sharded_fused_trajectory_matches_unsharded(mesh, fused_setup):
    """Each device launches the fused trajectory kernel on its chain shard;
    result equals the single-device fused launch (deterministic kernel,
    same per-tile shapes -> bitwise)."""
    from l2hmc_tpu.ops import fused_for_target, sharded_trajectory

    dyn, target, params, x = fused_setup
    v = jax.random.normal(jax.random.key(2), x.shape, jnp.float32)
    fused = fused_for_target(dyn, target, tile=16, interpret=True)

    Xp, Vp, ldp = fused.forward(params, x, v)
    Xs, Vs, lds = sharded_trajectory(
        fused, mesh, params, parallel.shard_chains(mesh, x),
        parallel.shard_chains(mesh, v),
    )
    assert Xs.sharding.is_equivalent_to(parallel.chain_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(Xs), np.asarray(Xp))
    np.testing.assert_array_equal(np.asarray(Vs), np.asarray(Vp))
    np.testing.assert_array_equal(np.asarray(lds), np.asarray(ldp))


def test_sharded_fused_chain_matches_unsharded(mesh, fused_setup):
    """Whole-chain sampler kernel under shard_map: per-device seed offset
    reproduces the unsharded per-tile seed layout, so sharded == unsharded
    including the emitted trace."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler, sharded_chain_run

    dyn, target, params, x = fused_setup
    sampler = fused_chain_sampler(dyn, target, tile=16)
    with pltpu.force_tpu_interpret_mode():
        xp, accp, trp = sampler.run(
            params, x, seed=7, n_mh_steps=4, collect_trace=True
        )
        xs, accs, trs = sharded_chain_run(
            sampler, mesh, params, parallel.shard_chains(mesh, x), seed=7,
            n_mh_steps=4, collect_trace=True,
        )
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(accs), np.asarray(accp))
    np.testing.assert_array_equal(np.asarray(trs), np.asarray(trp))


def test_sharded_fused_rejects_indivisible(mesh, fused_setup):
    from l2hmc_tpu.ops import fused_chain_sampler, sharded_chain_run

    dyn, target, params, _ = fused_setup
    sampler = fused_chain_sampler(dyn, target, tile=16)
    x_bad = jnp.zeros((12, 2))  # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible by mesh"):
        sharded_chain_run(sampler, mesh, params, x_bad, seed=0, n_mh_steps=1)


def test_sharded_fused_vae_matches_unsharded(mesh):
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import FusedVaeSampler, sharded_vae_run

    cfg = vae.VaeConfig(
        latent_dim=4, leapfrogs=2, enc_hidden=16, sampler_size1=8,
        sampler_size2=8,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n = 16
    x_raw = jnp.asarray(
        np.random.default_rng(0).random((n, 784)) < 0.2, jnp.float32
    )
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x_raw)
    z0 = jax.random.normal(jax.random.key(1), (n, cfg.latent_dim), jnp.float32)
    sampler = FusedVaeSampler(model.dynamics, tile=2)

    with pltpu.force_tpu_interpret_mode():
        zp, accp = sampler.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=3, n_mh_steps=2
        )
        zs, accs = sharded_vae_run(
            sampler, mesh, params["smp"], params["dec"],
            parallel.shard_chains(mesh, x_raw),
            parallel.shard_chains(mesh, emb),
            parallel.shard_chains(mesh, z0), seed=3, n_mh_steps=2,
        )
    np.testing.assert_array_equal(np.asarray(zs), np.asarray(zp))
    np.testing.assert_array_equal(np.asarray(accs), np.asarray(accp))

    # trace + op compositions (eval_sampler protocol) compose with the
    # mesh: the host-keyed nb sequence replicates, the per-device seed
    # offset reproduces the unsharded tile layout -> bitwise parity
    comp_key = jax.random.key(7)
    with pltpu.force_tpu_interpret_mode():
        zp, accp, trp = sampler.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=3,
            n_mh_steps=2, collect_trace=True, max_composition=3,
            comp_key=comp_key,
        )
        zs, accs, trs = sharded_vae_run(
            sampler, mesh, params["smp"], params["dec"],
            parallel.shard_chains(mesh, x_raw),
            parallel.shard_chains(mesh, emb),
            parallel.shard_chains(mesh, z0), seed=3, n_mh_steps=2,
            collect_trace=True, max_composition=3, comp_key=comp_key,
        )
    np.testing.assert_array_equal(np.asarray(zs), np.asarray(zp))
    np.testing.assert_array_equal(np.asarray(trs), np.asarray(trp))
    np.testing.assert_array_equal(np.asarray(accs), np.asarray(accp))


# -- sharded AIS / parallel tempering (VERDICT r2 item 8) ---------------------


def test_sharded_ais_matches_unsharded(mesh, key):
    """ais_estimate under chain sharding: identical RNG streams
    (partitionable threefry) -> the sharded logmeanexp reduction (a mesh
    collective) matches the unsharded estimate. Backs the docstring claim
    at evals/ais.py:8-9."""
    from l2hmc_tpu.evals.ais import ais_estimate, standard_normal_energy
    from l2hmc_tpu.targets import scg_gaussian

    target = scg_gaussian()
    x0 = jax.random.normal(jax.random.key(3), (64, 2), jnp.float32)

    def run(x):
        return ais_estimate(
            key, standard_normal_energy, target.energy, 20, x,
            step_size=0.15, leapfrogs=3, num_splits=4,
        )

    est_p, acc_p = jax.jit(run)(x0)
    est_s, acc_s = jax.jit(run)(parallel.shard_chains(mesh, x0))
    np.testing.assert_allclose(float(est_s), float(est_p), rtol=1e-5)
    np.testing.assert_allclose(float(acc_s), float(acc_p), rtol=1e-5)


def test_sharded_pt_matches_unsharded(mesh, key):
    """pt_sample_chain with the chain axis (axis 1 of the (K, n, d) replica
    state) sharded over the mesh == unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from l2hmc_tpu.mcmc.tempering import geometric_temps, pt_hmc_sample_chain
    from l2hmc_tpu.targets import mog2

    target = mog2(distance=2.0, var=0.5)
    temps = geometric_temps(8.0, 4)
    x0 = jax.random.normal(jax.random.key(5), (4, 32, 2), jnp.float32)

    _, trace_p = pt_hmc_sample_chain(target, 0.2, 3, x0, temps, 10, key)
    x0_sharded = jax.device_put(
        x0, NamedSharding(mesh, P(None, parallel.CHAIN_AXIS))
    )
    _, trace_s = pt_hmc_sample_chain(
        target, 0.2, 3, x0_sharded, temps, 10, key
    )
    np.testing.assert_allclose(
        np.asarray(trace_p), np.asarray(trace_s), rtol=1e-6, atol=1e-6
    )


def test_sharded_eps_mat_propose_matches_unsharded(mesh, key):
    """The round-4 headline recipe's dynamics (dense eps_mat drift
    preconditioner) under the chain mesh: the (n, d) @ (d, d) drift
    matmuls shard over chains with W replicated — same contract as the
    scalar-eps propose (bitwise keys, ulp-level numerics)."""
    cfg = ScgConfig(n_chains=64, T=4, eps_mat=True)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(key, eps=0.1)
    chol = np.linalg.cholesky(np.asarray(target.sigma)).astype(np.float32)
    params["w"] = jnp.asarray((np.pi / (2 * cfg.T)) * chol)
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
    # rtol 1e-5 (not the scalar test's 1e-6): the W drift matmul
    # reassociates differently under the sharded compile
    np.testing.assert_allclose(
        np.asarray(x_plain), np.asarray(x_shard), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_plain), np.asarray(p_shard), rtol=1e-5, atol=1e-7
    )
