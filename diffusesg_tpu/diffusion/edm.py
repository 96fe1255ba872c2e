"""EDM (Karras et al. 2022) continuous-time diffusion math: noise-level
schedules (vp/ve/edm), network preconditioning coefficients, training sigma
distributions, and the node+adj training objective.

Functional JAX counterpart of the reference objective layer
(reference: DiffuseSG/runner/objectives/edm.py).  Everything here is a pure
function of arrays — no state, no modules — so the trainer jits a single
step covering sigma sampling -> noising -> forward -> loss.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masking import add_sym_normal_noise, mask_nodes


class VPParams(NamedTuple):
    """Variance-preserving schedule parameters (reference: edm.py:7-18,41-52)."""
    beta_d: float
    beta_min: float
    epsilon_t: float
    M: int
    epsilon_s: float
    sigma_min_training: float
    sigma_max_training: float
    sigma_min_sampling: float
    sigma_max_sampling: float


class VEParams(NamedTuple):
    sigma_min_training: float
    sigma_max_training: float
    sigma_min_sampling: float
    sigma_max_sampling: float


class EDMParams(NamedTuple):
    sigma_min_training: float
    sigma_max_training: float
    sigma_min_sampling: float
    sigma_max_sampling: float
    sigma_data: float
    P_mean: float
    P_std: float
    rho: float


def vp_sigma_from_t(t, beta_d=19.9, beta_min=0.1):
    t = jnp.asarray(t)
    # expm1 instead of the reference's exp(x)-1 (edm.py:66-68): avoids fp32
    # catastrophic cancellation at small t.
    return jnp.sqrt(jnp.expm1(0.5 * beta_d * t ** 2 + beta_min * t))


def vp_sigma_deriv_t(t, beta_d=19.9, beta_min=0.1):
    t = jnp.asarray(t)
    s = vp_sigma_from_t(t, beta_d, beta_min)
    return 0.5 * (beta_min + beta_d * t) * (s + 1.0 / s)


def vp_t_from_sigma(sigma, beta_d=19.9, beta_min=0.1):
    sigma = jnp.asarray(sigma)
    return (jnp.sqrt(beta_min ** 2 + 2 * beta_d * jnp.log1p(sigma ** 2)) - beta_min) / beta_d


def ve_sigma_from_t(t):
    return jnp.sqrt(jnp.asarray(t))


def ve_sigma_deriv_t(t):
    return 0.5 / jnp.sqrt(jnp.asarray(t))


def ve_t_from_sigma(sigma):
    return jnp.asarray(sigma) ** 2


def edm_sigma_from_t(t):
    return jnp.asarray(t)


def edm_sigma_deriv_t(t):
    return jnp.ones_like(jnp.asarray(t))


def edm_t_from_sigma(sigma):
    return jnp.asarray(sigma)


def get_vp_params() -> VPParams:
    epsilon_t, epsilon_s = 1e-5, 1e-3
    return VPParams(
        beta_d=19.9, beta_min=0.1, epsilon_t=epsilon_t, M=1000, epsilon_s=epsilon_s,
        sigma_min_training=float(vp_sigma_from_t(epsilon_t)),
        sigma_max_training=float(vp_sigma_from_t(1.0)),
        sigma_min_sampling=float(vp_sigma_from_t(epsilon_s)),
        sigma_max_sampling=float(vp_sigma_from_t(1.0)))


def get_ve_params() -> VEParams:
    return VEParams(0.02, 100.0, 0.02, 100.0)


def get_edm_params() -> EDMParams:
    return EDMParams(sigma_min_training=0.0, sigma_max_training=float("inf"),
                     sigma_min_sampling=0.002, sigma_max_sampling=80.0,
                     sigma_data=0.5, P_mean=-1.2, P_std=1.2, rho=7.0)


_SCHEDULES = {
    "vp": (vp_sigma_from_t, vp_sigma_deriv_t, vp_t_from_sigma),
    "ve": (ve_sigma_from_t, ve_sigma_deriv_t, ve_t_from_sigma),
    "edm": (edm_sigma_from_t, edm_sigma_deriv_t, edm_t_from_sigma),
    "linear": (edm_sigma_from_t, edm_sigma_deriv_t, edm_t_from_sigma),
}


def sigma_from_t(schedule: str):
    return _SCHEDULES[schedule][0]


def sigma_deriv_t(schedule: str):
    return _SCHEDULES[schedule][1]


def t_from_sigma(schedule: str):
    return _SCHEDULES[schedule][2]


def get_preconditioning_params(precond: str, sigmas,
                               vp_params: VPParams | None = None,
                               edm_params: EDMParams | None = None):
    """c_skip, c_out, c_in, c_noise as functions of sigma.

    Reference formulas: edm.py:111-129.  All outputs broadcast like ``sigmas``.
    """
    if precond == "vp":
        vp = vp_params or get_vp_params()
        c_skip = jnp.ones_like(sigmas)
        c_out = -sigmas
        c_in = 1.0 / jnp.sqrt(sigmas ** 2 + 1.0)
        c_noise = (vp.M - 1) * vp_t_from_sigma(sigmas)
    elif precond == "ve":
        c_skip = jnp.ones_like(sigmas)
        c_out = sigmas
        c_in = jnp.ones_like(sigmas)
        c_noise = jnp.log(0.5 * sigmas)
    elif precond == "edm":
        sd = (edm_params or get_edm_params()).sigma_data
        c_skip = sd ** 2 / (sigmas ** 2 + sd ** 2)
        c_out = sigmas * sd / jnp.sqrt(sigmas ** 2 + sd ** 2)
        c_in = 1.0 / jnp.sqrt(sd ** 2 + sigmas ** 2)
        c_noise = jnp.log(sigmas) / 4.0
    else:
        raise NotImplementedError(f"unknown precond {precond}")
    return c_skip, c_out, c_in, c_noise


def sample_training_sigmas_weights(rng: jax.Array, num_samples: int, sigma_dist: str,
                                   vp_params: VPParams | None = None,
                                   ve_params: VEParams | None = None,
                                   edm_params: EDMParams | None = None):
    """Draw per-sample training noise levels and loss weights.

    Reference: edm.py:160-179.  edm draws sigma = exp(N(P_mean, P_std)) with
    weight (sigma^2 + sigma_d^2) / (sigma * sigma_d)^2.
    """
    if sigma_dist == "vp":
        vp = vp_params or get_vp_params()
        u = jax.random.uniform(rng, (num_samples,))
        sigmas = vp_sigma_from_t(1.0 + u * (vp.epsilon_t - 1.0))
        weights = 1.0 / sigmas ** 2
    elif sigma_dist == "ve":
        ve = ve_params or get_ve_params()
        u = jax.random.uniform(rng, (num_samples,))
        sigmas = ve.sigma_min_training * (ve.sigma_max_training / ve.sigma_min_training) ** u
        weights = 1.0 / sigmas ** 2
    elif sigma_dist == "edm":
        p = edm_params or get_edm_params()
        n = jax.random.normal(rng, (num_samples,))
        sigmas = jnp.exp(n * p.P_std + p.P_mean)
        weights = (sigmas ** 2 + p.sigma_data ** 2) / (sigmas * p.sigma_data) ** 2
    else:
        raise NotImplementedError(f"unknown sigma_dist {sigma_dist}")
    return sigmas, weights


class ObjectiveBatch(NamedTuple):
    """Training-time network inputs/targets for the joint node+adj objective."""
    net_input_a: jax.Array   # noisy adjs            [B, N, N(, C)]
    net_input_x: jax.Array   # noisy nodes           [B, N(, C)]
    net_cond: jax.Array      # sigmas                [B]
    net_target_a: jax.Array  # clean adjs (x0 target)
    net_target_x: jax.Array  # clean nodes
    c_skip: jax.Array        # [B]
    c_out: jax.Array         # [B]
    c_in: jax.Array          # [B]
    c_noise: jax.Array       # [B]
    sigmas: jax.Array        # [B]
    weights: jax.Array       # [B]


@dataclasses.dataclass(frozen=True)
class NodeAdjEDMObjective:
    """Training objective generator for joint node+adj diffusion.

    Reference: NodeAdjEDMObjectiveGenerator (edm.py:215-281).  The shipped
    configs use symmetric_noise=False for scene graphs
    (reference: utils/learning_utils.py:25-30).
    """
    precond: str = "edm"
    sigma_dist: str = "edm"
    symmetric_noise: bool = False

    def get_network_input(self, rng, clean_adjs, clean_x, node_flags, sigmas):
        """Noise both modalities with per-sample sigma; mask. (edm.py:233-254)"""
        rng_a, rng_x = jax.random.split(rng)
        unit_scales = jnp.ones_like(sigmas)
        noisy_adjs, noise_a = add_sym_normal_noise(
            rng_a, clean_adjs, unit_scales, sigmas, node_flags,
            non_symmetric=not self.symmetric_noise)

        flag_node_only = node_flags.ndim == 3
        sshape = (sigmas.shape[0],) + (1,) * (clean_x.ndim - 1)
        noise_x = jax.random.normal(rng_x, clean_x.shape, clean_x.dtype) * sigmas.reshape(sshape)
        if flag_node_only:
            noise_x = jnp.zeros_like(noise_x)
        else:
            noise_x = mask_nodes(noise_x, node_flags)
        noisy_x = clean_x + noise_x
        return noisy_adjs, noise_a, noisy_x, noise_x

    def get_input_output(self, rng, clean_adjs, clean_x, node_flags) -> ObjectiveBatch:
        """Full training-time objective (edm.py:256-281)."""
        rng_sigma, rng_noise = jax.random.split(rng)
        batch = clean_adjs.shape[0]
        sigmas, weights = sample_training_sigmas_weights(rng_sigma, batch, self.sigma_dist)
        c_skip, c_out, c_in, c_noise = get_preconditioning_params(self.precond, sigmas)
        noisy_adjs, _, noisy_x, _ = self.get_network_input(
            rng_noise, clean_adjs, clean_x, node_flags, sigmas)
        return ObjectiveBatch(noisy_adjs, noisy_x, sigmas, clean_adjs, clean_x,
                              c_skip, c_out, c_in, c_noise, sigmas, weights)


def edm_sigma_grid(num_steps: int, sigma_min: float, sigma_max: float, rho: float) -> np.ndarray:
    """The rho-spaced EDM sigma grid, computed host-side in float64.

    Reference: runner/mcmc_sampler/edm.py:85-88 (float64 grid at edm.py:70).
    Delegates to the sampler's grid builder so the formula lives in exactly
    one place (a fix to round_sigma/grid parity reaches both callers)."""
    from ..sampling.edm_sampler import _np_sigma_grid
    return _np_sigma_grid("edm", num_steps, sigma_min, sigma_max, rho)
