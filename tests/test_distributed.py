"""Multi-host-without-hardware test: two local CPU processes x 4 virtual
devices form one 8-device 'chains' mesh over the distributed runtime; the
globally-sharded sampler must match the single-process result."""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
import jax.numpy as jnp
import numpy as np
from l2hmc_tpu import mcmc
from l2hmc_tpu.parallel import distributed as dist
from l2hmc_tpu.train import ScgConfig, build_dynamics

assert jax.process_count() == nproc
assert len(jax.devices()) == 8  # global devices

cfg = ScgConfig(n_chains=32, T=3)
dyn, target = build_dynamics(cfg)
params = dyn.init_params(jax.random.key(0), eps=0.1)

# deterministic global chain state; each process owns its slice
x_global = np.asarray(
    jax.random.normal(jax.random.key(1), (cfg.n_chains, cfg.dim))
)
mesh = dist.global_chain_mesh()
sl = dist.local_chain_slice(cfg.n_chains)
x = dist.shard_global_chains(mesh, x_global[sl])

def step(params, x, k):
    out = mcmc.propose(k, dyn, params, x, do_mh_step=True)
    return out.x_next, jnp.mean(out.p_accept)

x_next, mean_acc = jax.jit(step)(params, x, jax.random.key(2))
# gather this process's local rows and the global mean acceptance
local = np.concatenate(
    [np.asarray(s.data) for s in x_next.addressable_shards], axis=0
)
np.save(f"{sys.argv[4]}/local_{pid}.npy", local)
np.save(f"{sys.argv[4]}/acc_{pid}.npy", np.asarray(mean_acc))
print("WORKER_OK", pid)
"""


@pytest.mark.slow
@pytest.mark.parametrize("nproc", [2, 4])
def test_process_mesh_matches_single(tmp_path, nproc):
    """Decomposition invariance: the globally-sharded sampler step gives
    the same chains whether the 8-device mesh is cut into 2 processes x 4
    devices or 4 processes x 2 devices — and matches the single-process
    run. (Single-core CI box: this is a correctness check of the DCN code
    path, not a performance claim.)"""
    # pick a free port so parallel test runs don't collide
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = {
        **os.environ,
        "PYTHONPATH": "",  # drop any TPU sitecustomize shim
    }
    devs_per_proc = 8 // nproc
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.replace("device_count=4", f"device_count={devs_per_proc}"),
             str(pid), str(nproc), port, str(tmp_path)],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out

    locals_ = [np.load(tmp_path / f"local_{pid}.npy") for pid in range(nproc)]
    accs = [np.load(tmp_path / f"acc_{pid}.npy") for pid in range(nproc)]
    x_multi = np.concatenate(locals_, axis=0)
    # every process agrees on the global mean acceptance (DCN reduction)
    for a in accs[1:]:
        np.testing.assert_allclose(accs[0], a, rtol=1e-6)

    # single-process reference on this test's own 8 virtual devices
    import jax
    import jax.numpy as jnp
    from l2hmc_tpu import mcmc
    from l2hmc_tpu.train import ScgConfig, build_dynamics

    cfg = ScgConfig(n_chains=32, T=3)
    dyn, _ = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    # f32 exactly as in the workers (this process has x64 enabled via
    # conftest; a f64 state would draw different momentum streams)
    x_global = jax.random.normal(
        jax.random.key(1), (cfg.n_chains, cfg.dim), jnp.float32
    )

    def step(params, x, k):
        out = mcmc.propose(k, dyn, params, x, do_mh_step=True)
        return out.x_next, jnp.mean(out.p_accept)

    x_ref, acc_ref = jax.jit(step)(
        params, jnp.asarray(np.asarray(x_global)), jax.random.key(2)
    )
    np.testing.assert_allclose(
        x_multi, np.asarray(x_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(accs[0]), float(acc_ref), rtol=1e-5)
