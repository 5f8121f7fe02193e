"""Fused Pallas trajectory kernel vs the XLA path (interpret mode on CPU;
the compiled kernel is exercised by bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import targets
from l2hmc_tpu.ops.fused_dynamics import fused_for_target
from l2hmc_tpu.train import ScgConfig, build_dynamics


@pytest.fixture(scope="module")
def setup():
    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    # non-trivial nets
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    fused = fused_for_target(dyn, target, tile=128, interpret=True)
    x = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (256, 2), jnp.float32)
    return dyn, fused, params, x, v


@pytest.mark.parametrize("direction", ["forward", "backward"])
def test_fused_matches_xla(setup, direction):
    dyn, fused, params, x, v = setup
    ref_fn = getattr(dyn, direction)
    fus_fn = getattr(fused, direction)
    Xr, Vr, ldr = ref_fn(params, x, v)
    Xf, Vf, ldf = fus_fn(params, x, v)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Vf), np.asarray(Vr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), rtol=2e-4, atol=2e-4)


def test_fused_invertibility(setup):
    dyn, fused, params, x, v = setup
    X, V, ld = fused.forward(params, x, v)
    x2, v2, ld_b = fused.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld + ld_b), 0.0, atol=1e-3)


def test_fused_rejects_bad_tile(setup):
    dyn, fused, params, x, v = setup
    import dataclasses

    bad = dataclasses.replace(fused, tile=100)
    with pytest.raises(ValueError, match="divisible"):
        bad.forward(params, x, v)


def test_fused_rejects_unsupported_target():
    """A target with no recognizable structure falls back to XLA."""

    class Opaque:
        dim = 2

        def energy(self, x, **kw):
            return (x**4).sum(1)

    cfg = ScgConfig(n_chains=64, T=2)
    dyn, _ = build_dynamics(cfg)
    with pytest.raises(ValueError, match="no fused energy spec"):
        fused_for_target(dyn, Opaque())


def _build_for(target, T=3, seed=0):
    dyn = build_dynamics(ScgConfig(dim=target.dim, n_chains=128, T=T),
                         target)[0]
    params = dyn.init_params(jax.random.key(seed), eps=0.1)
    return dyn, params


@pytest.mark.parametrize(
    "target",
    [
        targets.RoughWell(dim=10, eps=0.1, easy=True),
        targets.gen_ring(r=2.0, var=0.1, nb_mixtures=4),
        targets.mog2(distance=4.0, var=0.1),
        targets.GaussianFunnel(dim=6),
        targets.Phi4Lattice(L=4, m2=-4.0, lam=1.0),
    ],
    ids=["rough_well_easy", "ring", "mog2", "funnel", "phi4"],
)
def test_fused_specs_match_xla(target):
    """Non-Gaussian energy specs: fused trajectory == XLA trajectory.

    Uses the EASY rough well (freq = eps): the hard mode's sin(x/eps^2) at
    O(100)-radian arguments is float32-chaotic — a 1e-6 input perturbation
    amplifies ~1e3x over T=3 steps (measured), so exact parity is only
    meaningful at moderate frequencies; the hard mode is covered by the
    statistical suite cross-check (apps/suite.py fused eval)."""
    dyn, params = _build_for(target)
    fused = fused_for_target(dyn, target, tile=64, interpret=True)
    x = target.sample(jax.random.key(1), 128)
    v = jax.random.normal(jax.random.key(2), x.shape, jnp.float32)
    for direction in ("forward", "backward"):
        Xr, Vr, ldr = getattr(dyn, direction)(params, x, v)
        Xf, Vf, ldf = getattr(fused, direction)(params, x, v)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Vf), np.asarray(Vr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "target",
    [
        targets.RoughWell(dim=10, eps=0.1, easy=True),
        targets.gen_ring(r=2.0, var=0.1, nb_mixtures=4),
    ],
    ids=["rough_well_easy", "ring"],
)
def test_fused_chain_sampler_specs(target):
    """Zero-bits deterministic whole-chain parity for the new specs (same
    schedule as test_fused_chain_sampler_exact_parity)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler

    dyn, params = _build_for(target)
    sampler = fused_chain_sampler(dyn, target, tile=64)
    x0 = target.sample(jax.random.key(1), 128)
    n_steps = 3
    with pltpu.force_tpu_interpret_mode():
        x1, acc = sampler.run(params, x0, seed=7, n_mh_steps=n_steps)
    np.testing.assert_array_equal(np.asarray(acc), 1.0)
    v_const = jnp.full_like(x0, float(np.sqrt(-2.0 * np.log(1e-7))))
    x = x0
    for _ in range(n_steps):
        x, _, _ = dyn.forward(params, x, v_const)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x), rtol=2e-4, atol=2e-4
    )


def test_fused_chain_sampler_exact_parity(setup):
    """Whole-chain kernel vs XLA, deterministically: the Pallas interpreter's
    zero random bits make momentum a known constant, direction always
    forward, accept always true — so K kernel MH steps must equal K XLA
    forward trajectories exactly (see test_fused_vae_sampler_exact_parity
    for the derivation)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.train import ScgConfig, build_dynamics

    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    sampler = fused_chain_sampler(dyn, target, tile=128)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    n_steps = 5
    with pltpu.force_tpu_interpret_mode():
        x1, acc = sampler.run(params, x0, seed=7, n_mh_steps=n_steps)
    assert np.isfinite(np.asarray(x1)).all()
    np.testing.assert_array_equal(np.asarray(acc), 1.0)  # zero-bits accept

    v_const = jnp.full_like(x0, float(np.sqrt(-2.0 * np.log(1e-7))))
    x = x0
    for _ in range(n_steps):
        x, _, _ = dyn.forward(params, x, v_const)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_fused_chain_sampler_trace():
    """Trace-emitting kernel: the chunked VMEM->HBM trace matches the
    non-traced run bit-for-bit (same seed) and its last row is the final
    state. 150 steps with a 128-cap ring -> chunk 75, two flushes."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.ops.fused_dynamics import _trace_chunk

    assert _trace_chunk(2000) == 125
    assert _trace_chunk(150) == 75
    assert _trace_chunk(7) == 7

    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    sampler = fused_chain_sampler(dyn, target, tile=128)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x1, acc, trace = sampler.run(
            params, x0, seed=7, n_mh_steps=150, collect_trace=True
        )
        x1b, _ = sampler.run(params, x0, seed=7, n_mh_steps=150)
    assert trace.shape == (150, 256, 2)
    np.testing.assert_allclose(np.asarray(trace[-1]), np.asarray(x1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x1b), np.asarray(x1), rtol=1e-6)
    assert np.isfinite(np.asarray(trace)).all()
    # chains keep moving between chunk boundaries
    assert np.abs(np.asarray(trace[10]) - np.asarray(trace[-1])).max() > 0


@pytest.mark.slow
def test_differentiable_fused_grad_parity(setup):
    """custom_vjp fused trajectory: gradients wrt every parameter (both
    nets, alpha) and wrt (x, v) match jax.grad of the XLA path. The backward
    kernel re-derives nothing by hand — it traces jax.vjp of the shared
    _trajectory inside the kernel — so this is the end-to-end oracle."""
    from l2hmc_tpu.ops.fused_dynamics import DifferentiableFusedDynamics

    dyn, fused, params, x, v = setup
    fd = DifferentiableFusedDynamics(fused)

    def loss(d, p, x, v):
        X, V, ld = d.forward(p, x, v)
        Xb, Vb, ldb = d.backward(p, x, v)
        return (
            jnp.mean(X * Xb)
            + jnp.mean(V + Vb)
            + jnp.mean(ld - 2.0 * ldb)
            + jnp.mean(d.p_accept(p, x, v, X, V, ld))
        )

    l_r, g_r = jax.value_and_grad(loss, argnums=(1, 2, 3))(dyn, params, x, v)
    l_f, g_f = jax.value_and_grad(loss, argnums=(1, 2, 3))(fd, params, x, v)
    assert abs(float(l_r) - float(l_f)) < 1e-4
    for a, b in zip(
        jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_f)
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-3 * scale
        )


@pytest.mark.slow
def test_fused_train_matches_xla_training():
    """End-to-end: 60 training steps with fused_train=True reproduce the
    XLA path's loss/acceptance/eps trajectory (same seeds, same RNG)."""
    from l2hmc_tpu.train import ScgConfig, train

    hists = {}
    for fused in (False, True):
        cfg = ScgConfig(
            n_chains=64, T=4, n_steps=60, seed=3,
            fused_train=fused, fused_tile=64,
        )
        _, hists[fused] = train(cfg)
    np.testing.assert_allclose(
        hists[True]["loss"], hists[False]["loss"], rtol=2e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        float(hists[True]["eps"][-1]), float(hists[False]["eps"][-1]),
        rtol=1e-3,
    )


def test_fused_eps_dim_parity():
    """Per-dimension eps (Dynamics.eps_dim): the fused kernel's (D, 1) eps
    column must reproduce the XLA path's (dim,) broadcast — trajectories,
    logdet, and custom_vjp gradients (including d/d alpha, now a vector)."""
    from l2hmc_tpu.ops.fused_dynamics import (
        DifferentiableFusedDynamics, fused_for_target,
    )

    cfg = ScgConfig(n_chains=128, T=3, eps_dim=True)
    dyn, target = build_dynamics(cfg)
    assert dyn.eps_dim
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    # distinct per-dim step sizes so a scalar-eps bug cannot pass
    params["alpha"] = jnp.log(jnp.asarray([0.05, 0.2], jnp.float32))
    x = jax.random.normal(jax.random.key(1), (128, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (128, 2), jnp.float32)

    fused = fused_for_target(dyn, target, tile=64, interpret=True)
    for direction in ("forward", "backward"):
        Xr, Vr, ldr = getattr(dyn, direction)(params, x, v)
        Xf, Vf, ldf = getattr(fused, direction)(params, x, v)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Vf), np.asarray(Vr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), rtol=2e-4, atol=2e-4)

    fd = DifferentiableFusedDynamics(fused)

    def loss(d, p, x, v):
        X, V, ld = d.forward(p, x, v)
        return jnp.mean(X * X) + jnp.mean(V) + jnp.mean(ld)

    g_r = jax.grad(loss, argnums=1)(dyn, params, x, v)
    g_f = jax.grad(loss, argnums=1)(fd, params, x, v)
    assert g_f["alpha"].shape == (2,)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_f)
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-3 * scale
        )


def test_fused_input_whiten_parity():
    """Dynamics.input_scale (net-input whitening): the fused kernel's
    embed-weight fold must reproduce the XLA path's explicit input scaling,
    and whitening must actually change the trajectories."""
    from l2hmc_tpu.ops.fused_dynamics import fused_for_target

    target = targets.ill_conditioned_gaussian(8, 2.0)
    cfg = ScgConfig(dim=8, n_chains=128, T=3, net_input_whiten=True)
    dyn, _ = build_dynamics(cfg, target)
    assert dyn.input_scale is not None and len(dyn.input_scale) == 8
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    x = target.sample(jax.random.key(1), 128)
    v = jax.random.normal(jax.random.key(2), x.shape, jnp.float32)

    fused = fused_for_target(dyn, target, tile=64, interpret=True)
    for direction in ("forward", "backward"):
        Xr, Vr, ldr = getattr(dyn, direction)(params, x, v)
        Xf, Vf, ldf = getattr(fused, direction)(params, x, v)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Vf), np.asarray(Vr), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), rtol=2e-4, atol=2e-4)

    # whitening is not a no-op: the unwhitened dynamics differs
    plain = build_dynamics(
        ScgConfig(dim=8, n_chains=128, T=3), target
    )[0]
    Xp, _, _ = plain.forward(params, x, v)
    Xw, _, _ = dyn.forward(params, x, v)
    assert not np.allclose(np.asarray(Xp), np.asarray(Xw))


def test_fused_chain_sampler_eps_dim():
    """Whole-chain kernel with vector eps: zero-bits deterministic parity
    against the XLA forward schedule (see test_fused_chain_sampler_exact_parity)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler

    cfg = ScgConfig(n_chains=128, T=3, eps_dim=True)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    params["alpha"] = jnp.log(jnp.asarray([0.05, 0.2], jnp.float32))
    sampler = fused_chain_sampler(dyn, target, tile=64)
    x0 = jax.random.normal(jax.random.key(1), (128, 2), jnp.float32)
    n_steps = 4
    with pltpu.force_tpu_interpret_mode():
        x1, acc = sampler.run(params, x0, seed=7, n_mh_steps=n_steps)
    np.testing.assert_array_equal(np.asarray(acc), 1.0)
    v_const = jnp.full_like(x0, float(np.sqrt(-2.0 * np.log(1e-7))))
    x = x0
    for _ in range(n_steps):
        x, _, _ = dyn.forward(params, x, v_const)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x), rtol=2e-4, atol=2e-4
    )


def test_fused_vae_sampler_exact_parity():
    """VAE posterior kernel vs the XLA path, DETERMINISTICALLY.

    The Pallas interpreter's prng_random_bits returns all-zero bits, which
    makes the kernel a pure function: momentum = Box-Muller(1e-7, 0) =
    sqrt(-2 ln 1e-7) per element, direction = forward, accept = always
    (u = 0 <= px). Replicating that schedule on the XLA path turns the
    statistical smoke test into an exact end-to-end parity check of the
    in-kernel decoder energy gradient, S/T/Q applies, and aux-embedding
    plumbing. (Compiled-TPU statistics are covered by bench.py.)"""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import FusedVaeSampler

    cfg = vae.VaeConfig(
        latent_dim=8, leapfrogs=3, enc_hidden=32,
        sampler_size1=16, sampler_size2=16, seed=0,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n = 128
    x_raw = (jax.random.uniform(jax.random.key(1), (n, 784)) < 0.3).astype(
        jnp.float32
    )
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x_raw)
    z0 = jax.random.normal(jax.random.key(2), (n, cfg.latent_dim), jnp.float32)

    sampler = FusedVaeSampler(model.dynamics, tile=64)
    n_steps = 3
    with pltpu.force_tpu_interpret_mode():
        z1, acc = sampler.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=5,
            n_mh_steps=n_steps,
        )
        # embedding must matter: a different emb changes the trajectories
        z1_alt, _ = sampler.run(
            params["smp"], params["dec"], x_raw, emb + 1.0, z0, seed=5,
            n_mh_steps=n_steps,
        )
    assert np.isfinite(np.asarray(z1)).all()
    assert not np.allclose(np.asarray(z1), np.asarray(z1_alt))
    # zero random bits => accept mask (px - 0 >= 0) is always true
    np.testing.assert_array_equal(np.asarray(acc), 1.0)

    # XLA replication of the zero-bits schedule
    v_const = jnp.full_like(z0, float(np.sqrt(-2.0 * np.log(1e-7))))
    aux = {"raw": x_raw, "emb": emb, "dec": params["dec"]}
    z = z0
    for _ in range(n_steps):
        z, _, _ = model.dynamics.forward(
            params["smp"], z, v_const, aux=aux
        )
    np.testing.assert_allclose(
        np.asarray(z1), np.asarray(z), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_differentiable_fused_vae_grad_parity():
    """Fused VAE training path (DifferentiableFusedVae): forward/backward
    trajectories AND gradients wrt sampler params (both nets, alpha) and the
    aux embedding match jax.grad of the XLA path — including second-order
    terms through the in-kernel decoder energy gradient. Decoder cotangent
    is zero by design (stop-gradient, mnist_vae.py:254-265)."""
    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import DifferentiableFusedVae

    cfg = vae.VaeConfig(
        latent_dim=8, leapfrogs=3, enc_hidden=32,
        sampler_size1=16, sampler_size2=16, seed=0,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n = 64
    x_raw = (jax.random.uniform(jax.random.key(1), (n, 784)) < 0.3).astype(
        jnp.float32
    )
    z0 = jax.random.normal(jax.random.key(2), (n, cfg.latent_dim), jnp.float32)
    v0 = jax.random.normal(jax.random.key(3), (n, cfg.latent_dim), jnp.float32)

    fd = DifferentiableFusedVae(model.dynamics, tile=32, interpret=True)

    def loss(d, smp, dec):
        emb = model.aux_encoder.apply(smp["aux_enc"], x_raw)
        aux = {"raw": x_raw, "emb": emb, "dec": dec}
        Z, V, ld = d.forward(smp, z0, v0, aux=aux)
        Zb, Vb, ldb = d.backward(smp, z0, v0, aux=aux)
        return (
            jnp.mean(Z * Zb) + jnp.mean(V + Vb) + jnp.mean(ld - 2.0 * ldb)
            + jnp.mean(d.p_accept(smp, z0, v0, Z, V, ld, aux=aux))
        )

    # primal parity
    l_r = float(loss(model.dynamics, params["smp"], params["dec"]))
    l_f = float(loss(fd, params["smp"], params["dec"]))
    assert abs(l_r - l_f) < 1e-4

    g_r = jax.grad(loss, argnums=1)(model.dynamics, params["smp"], params["dec"])
    g_f = jax.grad(loss, argnums=1)(fd, params["smp"], params["dec"])
    flat_r, flat_f = (
        jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_f)
    )
    assert len(flat_r) == len(flat_f)
    nonzero = 0
    for a, b in zip(flat_r, flat_f):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=3e-3 * scale
        )
        nonzero += int(float(jnp.max(jnp.abs(a))) > 0)
    assert nonzero > 10  # aux_enc + nets + alpha all receive gradient


def test_col_at_traced_matches_static():
    """_col_at with a traced step (fori_loop trajectory) must equal the
    static slice. The traced form is a one-hot select+reduce because Mosaic
    has no TC lowering for dynamic_slice on values — a measured TPU failure
    at phi^4 64x64 ("Unimplemented primitive ... dynamic_slice")."""
    from l2hmc_tpu.ops.fused_dynamics import _col_at

    arr = jax.random.normal(jax.random.key(0), (7, 5), jnp.float32)

    @jax.jit
    def traced(step):
        return _col_at(arr, step)

    for s in range(5):
        np.testing.assert_array_equal(
            np.asarray(traced(jnp.int32(s))), np.asarray(_col_at(arr, s))
        )


def test_fused_chain_sampler_loop_traj_parity(setup):
    """fori_loop trajectory form (wide-state path, auto at dim>=2048) vs the
    unrolled form: identical results under the zero-bits deterministic
    schedule. Guards the exact kernel variant phi^4 64x64 runs."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.train import ScgConfig, build_dynamics

    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    unrolled = fused_chain_sampler(dyn, target, tile=128, loop_traj=False)
    looped = fused_chain_sampler(dyn, target, tile=128, loop_traj=True)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        xu, au = unrolled.run(params, x0, seed=7, n_mh_steps=4)
        xl, al = looped.run(params, x0, seed=7, n_mh_steps=4)
    np.testing.assert_allclose(np.asarray(xl), np.asarray(xu), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(al), np.asarray(au))


def test_fused_vae_trace_and_composition():
    """VAE kernel trace emission + random op compositions, exactly.

    Zero-bit interpreter schedule (see test_fused_vae_sampler_exact_parity):
    momentum constant, direction forward, accept always. The per-step op
    counts nb come from the HOST key, so the compose kernel must equal
    applying nb[t] XLA forward trajectories per recorded step — an exact
    oracle for the live-masking logic — and trace[t] must be the state
    after steps 0..t (eval_sampler.py:161-162 protocol)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import FusedVaeSampler

    cfg = vae.VaeConfig(
        latent_dim=10, leapfrogs=2, enc_hidden=32,
        sampler_size1=16, sampler_size2=16, seed=0,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n, K, max_comp = 128, 4, 3
    x_raw = (jax.random.uniform(jax.random.key(1), (n, 784)) < 0.3).astype(
        jnp.float32
    )
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x_raw)
    z0 = jax.random.normal(jax.random.key(2), (n, cfg.latent_dim), jnp.float32)
    comp_key = jax.random.key(3)

    sampler = FusedVaeSampler(model.dynamics, tile=64)
    with pltpu.force_tpu_interpret_mode():
        # plain trace (no composition): trace[t] = state after t+1 MH steps
        z_p, acc_p, tr_p = sampler.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=5,
            n_mh_steps=K, collect_trace=True,
        )
        # composed + traced
        z_c, acc_c, tr_c = sampler.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=5,
            n_mh_steps=K, collect_trace=True, max_composition=max_comp,
            comp_key=comp_key,
        )
    assert tr_p.shape == (K, n, cfg.latent_dim)
    assert tr_c.shape == (K, n, cfg.latent_dim)
    np.testing.assert_array_equal(np.asarray(acc_p), 1.0)
    np.testing.assert_array_equal(np.asarray(acc_c), 1.0)
    # the final state IS the last trace row (post-step convention)
    np.testing.assert_array_equal(np.asarray(tr_p[-1]), np.asarray(z_p))
    np.testing.assert_array_equal(np.asarray(tr_c[-1]), np.asarray(z_c))

    # XLA replication of the zero-bits schedule
    v_const = jnp.full_like(z0, float(np.sqrt(-2.0 * np.log(1e-7))))
    aux = {"raw": x_raw, "emb": emb, "dec": params["dec"]}

    def fwd(z):
        z, _, _ = model.dynamics.forward(params["smp"], z, v_const, aux=aux)
        return z

    z = z0
    for t in range(K):
        z = fwd(z)
        np.testing.assert_allclose(
            np.asarray(tr_p[t]), np.asarray(z), rtol=2e-4, atol=2e-4
        )

    nb = np.asarray(jax.random.randint(comp_key, (K,), 1, max_comp))
    assert set(np.unique(nb)) <= {1, 2} and len(set(nb)) > 1  # both counts hit
    z = z0
    for t in range(K):
        for _ in range(int(nb[t])):
            z = fwd(z)
        np.testing.assert_allclose(
            np.asarray(tr_c[t]), np.asarray(z), rtol=2e-4, atol=2e-4
        )


def test_fused_hmc_chain_exact_parity():
    """HMC-mode dynamics in the whole-chain fused kernel: the zero-weight
    S/T/Q stand-ins (_hmc_zero_net) must reduce the in-kernel trajectory
    EXACTLY to plain leapfrog — checked against Dynamics(hmc=True).forward
    under the zero-bits deterministic schedule, plus a trace run."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.dynamics import Dynamics
    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.targets import scg_gaussian

    target = scg_gaussian()
    dyn = Dynamics(dim=2, energy=target.energy, T=4, hmc=True)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    sampler = fused_chain_sampler(dyn, target, tile=128)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    n_steps = 5
    with pltpu.force_tpu_interpret_mode():
        x1, acc, tr = sampler.run(
            params, x0, seed=7, n_mh_steps=n_steps, collect_trace=True
        )
    np.testing.assert_array_equal(np.asarray(acc), 1.0)
    np.testing.assert_array_equal(np.asarray(tr[-1]), np.asarray(x1))

    v_const = jnp.full_like(x0, float(np.sqrt(-2.0 * np.log(1e-7))))
    x = x0
    for t in range(n_steps):
        x, _, _ = dyn.forward(params, x, v_const)
        np.testing.assert_allclose(
            np.asarray(tr[t]), np.asarray(x), rtol=2e-4, atol=2e-4
        )


def test_fused_vae_ais_exact_schedule():
    """Fused AIS kernel vs a hand-replicated zero-bits schedule.

    Zero random bits make the kernel pure: momentum = const c per element,
    accept always. The XLA replication runs the SAME anneal loop (weight
    update before the transition, plain leapfrog at the interpolated
    energy) with that schedule — exact parity of the in-kernel decoder
    energy, the beta interpolation, and the reference weight update
    (utils/ais.py:30-82)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import FusedVaeAis

    cfg = vae.VaeConfig(
        latent_dim=6, leapfrogs=2, enc_hidden=16,
        sampler_size1=8, sampler_size2=8, seed=0,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n, K, T_lf, eps = 64, 5, 3, 0.07
    x_raw = (jax.random.uniform(jax.random.key(1), (n, 784)) < 0.3).astype(
        jnp.float32
    )
    z0 = jax.random.normal(jax.random.key(2), (n, cfg.latent_dim), jnp.float32)

    ais = FusedVaeAis(latent_dim=cfg.latent_dim, tile=32)
    with pltpu.force_tpu_interpret_mode():
        w, acc = ais.run(
            params["dec"], x_raw, z0, seed=5, anneal_steps=K,
            step_size=eps, leapfrogs=T_lf,
        )
    assert w.shape == (n,)
    # acc accumulates the acceptance PROBABILITY (ais.py px_trace), not
    # the indicator — with zero bits the move always applies (u = 0) but
    # px < 1 wherever the leapfrog has energy error
    assert np.all((np.asarray(acc) > 0.0) & (np.asarray(acc) <= 1.0))

    # XLA replication
    e1 = vae.posterior_energy(model.decoder)
    aux = {"raw": x_raw, "dec": params["dec"]}

    def e0(z):
        return 0.5 * jnp.sum(jnp.square(z), axis=1)

    beta = np.linspace(0.0, 1.0, K + 1, dtype=np.float32)[1:]
    bdiff = beta[1] - beta[0]
    c = float(np.sqrt(-2.0 * np.log(1e-7)))
    z = z0
    w_ref = jnp.zeros((n,))
    for b in beta:
        w_ref = w_ref + bdiff * (e0(z) - e1(z, aux=aux))
        grad = jax.grad(
            lambda y: float(1 - b) * jnp.sum(e0(y))
            + float(b) * jnp.sum(e1(y, aux=aux))
        )
        v = jnp.full_like(z, c)
        for _ in range(T_lf):
            v = v - 0.5 * eps * grad(z)
            z = z + eps * v
            v = v - 0.5 * eps * grad(z)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), rtol=2e-4, atol=2e-4
    )
