"""Network-augmented leapfrog dynamics — the L2HMC core.

TPU-native redesign of the reference ``Dynamics`` object
(reference: utils/dynamics.py:34-309). Differences from the reference, by
design (SURVEY.md §7):

- **Pure functions + pytree params.** No god-object: static configuration
  lives in a frozen ``Dynamics`` dataclass (trace-time constant), learnable
  state is an explicit params pytree ``{"alpha", "xnet", "vnet"}``.
- **Masks from a seed.** The reference drew per-step binary masks with
  *unseeded numpy at graph-build time* (utils/dynamics.py:84-93), forcing
  eval code to scrape them back out of checkpoints by tensor name
  (eval_sampler.py:52-59). Here masks are derived from ``mask_seed`` — a
  checkpointable integer.
- **``lax.scan`` over the T leapfrog steps** instead of ``tf.while_loop``
  (utils/dynamics.py:263-267): one compiled XLA program, reverse-mode
  differentiable, with optional ``jax.checkpoint`` rematerialisation of the
  step body to keep grad-through-scan memory flat at 8192 chains.
- **One batched energy gradient per call** via grad-of-sum (rows are
  independent), replacing ``tf.gradients`` (utils/dynamics.py:217-218).

The update equations are the paper's (arXiv 1711.09268, eqs. 8-13) exactly as
implemented at utils/dynamics.py:115-201, including the exact inverse and the
log-det-Jacobian accumulation ``sum(sv1 + sv2 + mb*sx1 + m*sx2)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.nets.core import Module
from l2hmc_tpu.targets.base import batched_grad

Array = jax.Array
Params = Any
EnergyFn = Callable[..., Array]  # (x[, aux]) -> (n,)


def make_masks(mask_seed: int, T: int, dim: int) -> np.ndarray:
    """Per-step random binary half-masks, derived from a seed.

    Exactly ``dim // 2`` ones per step (reference utils/dynamics.py:84-93,
    which used unseeded ``np.random.permutation``). Returned as a numpy
    (T, dim) float32 array — a trace-time constant baked into the jitted
    program.
    """
    rng = np.random.default_rng(mask_seed)
    masks = np.zeros((T, dim), np.float32)
    for t in range(T):
        idx = rng.permutation(dim)[: dim // 2]
        masks[t, idx] = 1.0
    return masks


def clip_with_grad(u: Array, min_u: float = -32.0, max_u: float = 32.0) -> Array:
    """Straight-through clip: clamps the value, passes gradients unchanged
    (reference Dynamics.clip_with_grad, utils/dynamics.py:110-113 — defined
    but unused there; kept as public API parity)."""
    u = u - jax.lax.stop_gradient(jax.nn.relu(u - max_u))
    u = u + jax.lax.stop_gradient(jax.nn.relu(min_u - u))
    return u


def make_alternating_masks(T: int, dim: int) -> np.ndarray:
    """Deterministic even/odd masks (reference Dynamics._gen_mask,
    utils/dynamics.py:220-229 — the non-random alternative the reference kept
    commented out)."""
    m = np.zeros((dim,), np.float32)
    m[::2] = 1.0
    return np.tile(m, (T, 1))


def time_encoding(T: int) -> np.ndarray:
    """(T, 2) [cos, sin](2*pi*t/T) features (reference utils/dynamics.py:99-105)."""
    t = np.arange(T, dtype=np.float32)
    return np.stack(
        [np.cos(2.0 * np.pi * t / T), np.sin(2.0 * np.pi * t / T)], axis=1
    )


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class Dynamics:
    """Static configuration of the augmented-leapfrog integrator.

    Equivalent of reference ``Dynamics.__init__`` (utils/dynamics.py:34-81)
    minus the learnable state, which lives in the params pytree from
    :meth:`init_params`.

    Attributes:
      dim: state dimensionality.
      energy: batched energy fn ``(x[, aux]) -> (n,)``.
      T: number of leapfrog steps per trajectory.
      xnet / vnet: S/T/Q modules (ignored when ``hmc=True``).
      hmc: plain-HMC mode — zero networks, exact leapfrog, fixed eps
        (utils/dynamics.py:73-76).
      eps_trainable: whether alpha = log(eps) receives gradients
        (utils/dynamics.py:49-58). Implemented with stop_gradient so the
        param pytree shape is mode-independent.
      eps_dim: per-DIMENSION trainable step size — alpha has shape (dim,)
        and eps = exp(alpha) broadcasts elementwise through every update,
        acting as a learned diagonal preconditioner (step-size analog of an
        HMC mass matrix). Rebuild-only extension: the reference's eps is a
        scalar (utils/dynamics.py:49-58). Invertibility and the diagonal
        log-det-Jacobian hold per-dimension unchanged (the eps factors sit
        in the shift terms and the exp(eps*s) diagonal scalings exactly as
        before). Fused Pallas kernels carry eps as a (dim, 1) VMEM column,
        so scalar and per-dim eps share one kernel code path.
      eps_step: per-LEAPFROG-STEP trainable step size — alpha has shape
        (T,); substep t integrates with the scalar eps[t], a learned
        step-size schedule over the trajectory (warm-up/cool-down patterns
        the single scalar cannot express). Rebuild-only extension targeting
        the shrink-to-accept plateau on stiff targets (a timid scalar eps
        pins acceptance near 1). Invertibility is per-substep, so a
        per-substep scalar changes nothing structurally. Mutually exclusive
        with eps_dim; XLA path only (no fused-kernel support).
      eps_mat: DENSE trainable step-size matrix — params carry a (dim, dim)
        matrix W (init eps * I) that replaces the scalar eps on the
        TRANSLATION terms only: the v-update drift becomes
        ``(-exp(fv)*grad + t) @ W`` and the x-update drift
        ``(exp(fx)*v + t) @ W.T``; the exp-gate arguments keep the scalar
        eps. The Jacobians w.r.t. x and v stay the diagonal exp-gates
        (drift terms are constant in the updated variable), so the exact
        log-det formula is UNCHANGED and each substep inverts in closed
        form exactly as before. In HMC mode (zero nets) this reduces to
        preconditioned leapfrog with x += v @ W.T, v -= grad @ W — i.e.
        leapfrog in the coordinates y = W^{-1} x — so a learned W is a
        dense step-size preconditioner (full-matrix generalization of
        ``eps_dim``'s diagonal: it can whiten ROTATED anisotropy, which no
        diagonal can). Rebuild-only extension; XLA path only (no
        fused-kernel support); mutually exclusive with eps_dim/eps_step.
      use_temperature: divide energy by a runtime temperature
        (utils/dynamics.py:203-212); off in all reference drivers but kept —
        the paper anneals temperature.
      mask_seed: seed for the per-step binary masks.
      input_scale: optional per-dimension sigma for NET-INPUT whitening —
        x-like net inputs are scaled by 1/sigma and gradient inputs by
        sigma before the S/T/Q nets see them (momentum is already O(1)).
        Rebuild-only extension for ill-conditioned targets: at condition
        1e4 the raw inputs span four decades, so the shared first linear
        layer is dominated by the widest dimensions. A fixed elementwise
        rescaling of net INPUTS changes nothing about the integrator's
        invertibility or log-det (the scaling is a fixed function of the
        same arguments); it only reconditions the function class. The
        fused kernels fold the scaling into the embed weights at
        _extract_net time (exact, zero kernel cost).
      net_input_fn: optional STATE-DEPENDENT net-input feature map,
        ``(net, inputs) -> inputs`` where ``net`` is "vnet"/"xnet" and
        ``inputs`` is the list the S/T/Q module would have seen. The
        generalization of ``input_scale`` to nonlinear, state-conditioned
        whitening — e.g. the funnel's neck-width feature
        ``x[1:] * exp(-x[0]/2)`` (reference utils/distributions.py:182-190
        is this map), which a constant preconditioner cannot express
        (PARITY round-4 funnel diagnosis). Correctness is unaffected for
        the same reason as ``input_scale``: the transform is a fixed
        function of arguments the update already conditions on, so each
        substep stays invertible with the same diagonal log-det — the
        S/T/Q outputs simply become different (better-conditioned)
        functions of the state. XLA path only (no fused-kernel folding —
        the map is nonlinear). Applied AFTER ``input_scale``.
    """

    dim: int
    energy: EnergyFn
    T: int = 25
    xnet: Optional[Module] = None
    vnet: Optional[Module] = None
    hmc: bool = False
    eps_trainable: bool = True
    eps_dim: bool = False
    eps_step: bool = False
    eps_mat: bool = False
    use_temperature: bool = False
    mask_seed: int = 0
    input_scale: Optional[tuple] = None  # per-dim sigma (length dim)
    net_input_fn: Optional[Callable] = None  # (net, inputs) -> inputs

    def __post_init__(self):
        if not self.hmc and (self.xnet is None or self.vnet is None):
            raise ValueError("non-HMC dynamics requires xnet and vnet modules")
        if sum((self.eps_dim, self.eps_step, self.eps_mat)) > 1:
            raise ValueError(
                "eps_dim, eps_step and eps_mat are mutually exclusive"
            )
        if self.input_scale is not None and self.net_input_fn is not None:
            # net_input_fn would see already-rescaled inputs, silently
            # computing features of the wrong coordinates (e.g. the
            # funnel map reading v / sigma_0 instead of v)
            raise ValueError(
                "input_scale and net_input_fn are mutually exclusive — "
                "fold the linear whitening into the feature map instead"
            )
        object.__setattr__(self, "masks", make_masks(self.mask_seed, self.T, self.dim))
        object.__setattr__(self, "times", time_encoding(self.T))

    # -- params ------------------------------------------------------------

    def init_params(self, key: Array, eps=0.1) -> Params:
        """{"alpha": log eps, "xnet": ..., "vnet": ...} pytree.

        ``eps`` may be a scalar or, with ``eps_dim``/``eps_step``, a
        (dim,)/(T,) vector — a per-dimension init is how a known scale
        structure (e.g. the target's sigma_i) seeds the learned diagonal
        preconditioner instead of every dimension starting equal. With
        ``eps_mat``, ``eps`` may be a scalar (W init = eps * I) or a full
        (dim, dim) matrix (e.g. eps0 * chol(Sigma), the dense analog of
        the sigma-scaled diagonal init); the pytree gains a "w" leaf and
        "alpha" keeps the scalar log step size for the exp gates."""
        eps_arr = jnp.asarray(eps, jnp.float32)
        w = None
        if self.eps_mat:
            if eps_arr.ndim == 0:
                w = eps_arr * jnp.eye(self.dim, dtype=jnp.float32)
                alpha = jnp.log(eps_arr)
            elif eps_arr.shape == (self.dim, self.dim):
                w = eps_arr
                # gate scale: geometric mean of |diag W| keeps the exp-gate
                # eps on the same scale as the drift preconditioner; a zero
                # diagonal entry would make it -inf (dead gate), so reject
                # concrete inits that aren't valid Cholesky-like factors
                if not isinstance(eps_arr, jax.core.Tracer):
                    d = np.abs(np.asarray(jax.device_get(jnp.diag(eps_arr))))
                    if not np.all(d > 0):
                        raise ValueError(
                            "eps_mat init requires a nonzero diagonal (a "
                            "Cholesky factor has a positive diagonal); got "
                            f"zeros at indices {np.nonzero(d == 0)[0].tolist()}"
                        )
                alpha = jnp.mean(jnp.log(jnp.abs(jnp.diag(eps_arr))))
            else:
                raise ValueError(
                    "eps_mat init requires a scalar or (dim, dim) eps"
                )
        else:
            alpha = jnp.log(eps_arr)
            if self.eps_dim:
                alpha = jnp.broadcast_to(
                    alpha, (self.dim,)).astype(jnp.float32)
            elif self.eps_step:
                alpha = jnp.broadcast_to(alpha, (self.T,)).astype(jnp.float32)
            elif alpha.ndim != 0:
                raise ValueError(
                    "vector eps init requires eps_dim or eps_step"
                )
        if self.hmc:
            params = {"alpha": alpha, "xnet": (), "vnet": ()}
        else:
            kx, kv = jax.random.split(key)
            params = {
                "alpha": alpha,
                "xnet": self.xnet.init(kx),
                "vnet": self.vnet.init(kv),
            }
        if w is not None:
            params["w"] = w
        return params

    def eps(self, params: Params) -> Array:
        """eps = exp(alpha) (utils/dynamics.py:49-58).

        Intentional difference: the reference hard-freezes eps in HMC mode
        (utils/dynamics.py:58); here ``eps_trainable`` is the sole gate, so
        an HMC-mode integrator with ``eps_dim`` can train alpha alone — a
        learned diagonal preconditioner with no networks (the ICG oracle's
        basin, tools/icg_oracle.py, made learnable). Plain-HMC baselines
        are unaffected: they never differentiate through the sampler."""
        alpha = params["alpha"]
        if not self.eps_trainable:
            alpha = jax.lax.stop_gradient(alpha)
        return jnp.exp(alpha)

    def w(self, params: Params) -> Array:
        """Dense drift preconditioner W (eps_mat mode), same trainability
        gate as alpha."""
        if "w" not in params:
            raise ValueError(
                'params missing "w": were they initialized with '
                "eps_mat=True? (checkpoints saved with eps_mat=False "
                "cannot drive an eps_mat Dynamics)"
            )
        w = params["w"]
        if not self.eps_trainable:
            w = jax.lax.stop_gradient(w)
        return w

    # -- energies ----------------------------------------------------------

    def _energy(self, x: Array, aux=None, temperature: Array | float = 1.0) -> Array:
        e = self.energy(x, aux=aux) if aux is not None else self.energy(x)
        if self.use_temperature:
            e = e / temperature
        return e

    def kinetic(self, v: Array) -> Array:
        return 0.5 * jnp.sum(jnp.square(v), axis=1)

    def hamiltonian(self, x, v, aux=None, temperature=1.0) -> Array:
        return self._energy(x, aux, temperature) + self.kinetic(v)

    def grad_energy(self, x, aux=None, temperature=1.0) -> Array:
        return batched_grad(lambda y: self._energy(y, aux, temperature))(x)

    def _apply_nets(self, params: Params, net: str, inputs) -> tuple:
        """VNet/XNet apply; zeros in HMC mode (utils/dynamics.py:73-76).

        With ``input_scale`` the x-like input is whitened by 1/sigma and
        the gradient input by sigma (vnet sees [x, grad, ...]; xnet sees
        [v, masked_x, ...] with v already O(1))."""
        if self.hmc:
            z = jnp.zeros_like(inputs[0])
            return z, z, z
        if self.input_scale is not None:
            sig = jnp.asarray(self.input_scale, inputs[0].dtype)
            if net == "vnet":
                inputs = [inputs[0] / sig, inputs[1] * sig, *inputs[2:]]
            else:
                inputs = [inputs[0], inputs[1] / sig, *inputs[2:]]
        if self.net_input_fn is not None:
            inputs = self.net_input_fn(net, inputs)
        mod = self.vnet if net == "vnet" else self.xnet
        s, t, q = mod.apply(params[net], inputs)
        return s, t, q

    # -- single leapfrog substeps -----------------------------------------

    def _drifts(self, params, eps):
        """(drift_v, drift_x) closures: how a translation term enters the
        update. Scalar/vector eps multiplies elementwise; eps_mat applies
        the dense W to v-drifts and W.T to x-drifts (preconditioned
        leapfrog's transpose pairing, so W = eps * chol(Sigma) whitens an
        arbitrary Gaussian)."""
        if self.eps_mat:
            w = self.w(params)
            return (lambda a: a @ w), (lambda a: a @ w.T)
        return (lambda a: eps * a), (lambda a: eps * a)

    def forward_step(
        self, params, x, v, step_idx, *, aux=None, temperature=1.0
    ):
        """One augmented leapfrog step (utils/dynamics.py:115-157).

        Returns (x_out, v_out, logdet_contribution).
        """
        eps = self.eps(params)
        if self.eps_step:
            eps = eps[step_idx]  # per-substep scalar schedule
        drift_v, drift_x = self._drifts(params, eps)
        n = x.shape[0]
        t = jnp.broadcast_to(
            jnp.asarray(self.times, x.dtype)[step_idx], (n, 2)
        )
        m = jnp.asarray(self.masks, x.dtype)[step_idx]
        mb = 1.0 - m

        # half-step momentum update
        grad1 = self.grad_energy(x, aux, temperature)
        s, tt, q = self._apply_nets(params, "vnet", [x, grad1, t, aux])
        sv1 = 0.5 * eps * s
        fv1 = eps * q
        v_h = v * jnp.exp(sv1) + 0.5 * drift_v(-jnp.exp(fv1) * grad1 + tt)

        # first half of x update (masked)
        s, tt, q = self._apply_nets(params, "xnet", [v_h, m * x, t, aux])
        sx1 = eps * s
        fx1 = eps * q
        y = m * x + mb * (x * jnp.exp(sx1) + drift_x(jnp.exp(fx1) * v_h + tt))

        # second half of x update (complementary mask)
        s, tt, q = self._apply_nets(params, "xnet", [v_h, mb * y, t, aux])
        sx2 = eps * s
        fx2 = eps * q
        x_o = mb * y + m * (y * jnp.exp(sx2) + drift_x(jnp.exp(fx2) * v_h + tt))

        # final half-step momentum update
        grad2 = self.grad_energy(x_o, aux, temperature)
        s, tt, q = self._apply_nets(params, "vnet", [x_o, grad2, t, aux])
        sv2 = 0.5 * eps * s
        fv2 = eps * q
        v_o = v_h * jnp.exp(sv2) + 0.5 * drift_v(-jnp.exp(fv2) * grad2 + tt)

        logdet = jnp.sum(sv1 + sv2 + mb * sx1 + m * sx2, axis=1)
        return x_o, v_o, logdet

    def backward_step(
        self, params, x_o, v_o, step_idx, *, aux=None, temperature=1.0
    ):
        """Exact inverse of :meth:`forward_step` (utils/dynamics.py:159-201)."""
        eps = self.eps(params)
        if self.eps_step:
            eps = eps[step_idx]
        drift_v, drift_x = self._drifts(params, eps)
        n = x_o.shape[0]
        t = jnp.broadcast_to(
            jnp.asarray(self.times, x_o.dtype)[step_idx], (n, 2)
        )
        m = jnp.asarray(self.masks, x_o.dtype)[step_idx]
        mb = 1.0 - m

        grad1 = self.grad_energy(x_o, aux, temperature)
        s, tt, q = self._apply_nets(params, "vnet", [x_o, grad1, t, aux])
        sv2 = -0.5 * eps * s
        fv2 = eps * q
        v_h = (v_o - 0.5 * drift_v(-jnp.exp(fv2) * grad1 + tt)) * jnp.exp(sv2)

        s, tt, q = self._apply_nets(params, "xnet", [v_h, mb * x_o, t, aux])
        sx2 = -eps * s
        fx2 = eps * q
        y = mb * x_o + m * jnp.exp(sx2) * (
            x_o - drift_x(jnp.exp(fx2) * v_h + tt)
        )

        s, tt, q = self._apply_nets(params, "xnet", [v_h, m * y, t, aux])
        sx1 = -eps * s
        fx1 = eps * q
        x = m * y + mb * jnp.exp(sx1) * (y - drift_x(jnp.exp(fx1) * v_h + tt))

        grad2 = self.grad_energy(x, aux, temperature)
        s, tt, q = self._apply_nets(params, "vnet", [x, grad2, t, aux])
        sv1 = -0.5 * eps * s
        fv1 = eps * q
        v = jnp.exp(sv1) * (v_h - 0.5 * drift_v(-jnp.exp(fv1) * grad2 + tt))

        logdet = jnp.sum(sv1 + sv2 + mb * sx1 + m * sx2, axis=1)
        return x, v, logdet

    # -- full trajectories -------------------------------------------------

    def _trajectory(
        self, params, x, v, *, reverse: bool, aux, temperature, remat
    ):
        steps = np.arange(self.T, dtype=np.int32)
        if reverse:
            steps = steps[::-1].copy()
        substep = self.backward_step if reverse else self.forward_step

        def body(carry, step_idx):
            cx, cv, logdet = carry
            nx, nv, ld = substep(
                params, cx, cv, step_idx, aux=aux, temperature=temperature
            )
            return (nx, nv, logdet + ld), None

        if remat:
            body = jax.checkpoint(body)
        init = (x, v, jnp.zeros((x.shape[0],), x.dtype))
        (X, V, logdet), _ = jax.lax.scan(body, init, jnp.asarray(steps))
        return X, V, logdet

    def forward(
        self, params, x, v, *, aux=None, temperature=1.0, remat: bool = False
    ):
        """T forward steps; returns (X, V, logdet) (utils/dynamics.py:246-272).

        Unlike the reference, momentum is an explicit argument — sampling it
        is the caller's job (explicit PRNG keys; see mcmc.sampler.propose).
        """
        return self._trajectory(
            params, x, v, reverse=False, aux=aux, temperature=temperature,
            remat=remat,
        )

    def backward(
        self, params, x, v, *, aux=None, temperature=1.0, remat: bool = False
    ):
        """T inverse steps applied in reverse order (utils/dynamics.py:274-300)."""
        return self._trajectory(
            params, x, v, reverse=True, aux=aux, temperature=temperature,
            remat=remat,
        )

    def p_accept(
        self, params, x0, v0, x1, v1, log_jac, *, aux=None, temperature=1.0
    ) -> Array:
        """MH acceptance prob exp(min(H0 - H1 + logJ, 0)), NaN-guarded to 0
        (utils/dynamics.py:302-309)."""
        e_old = self.hamiltonian(x0, v0, aux=aux, temperature=temperature)
        e_new = self.hamiltonian(x1, v1, aux=aux, temperature=temperature)
        p = jnp.exp(jnp.minimum(e_old - e_new + log_jac, 0.0))
        return jnp.where(jnp.isfinite(p), p, jnp.zeros_like(p))
