"""Diffusion noise schedules as precomputed jnp arrays.

Parity targets: reference models/diffusion.py:312-326 (linear + cosine);
`sigmoid` is additionally implemented since the reference config
documents it (config.yaml:46) without implementing it.
All derived coefficient arrays (alphas_cumprod etc., reference
diffusion.py:304-310) are computed once in float32 and closed over by
the jitted train/sample functions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(num_steps: int) -> jnp.ndarray:
    return jnp.linspace(1e-4, 0.02, num_steps, dtype=jnp.float32)


def cosine_beta_schedule(num_steps: int) -> jnp.ndarray:
    steps = jnp.arange(num_steps + 1, dtype=jnp.float32) / num_steps
    alphas_cumprod = jnp.cos((steps + 0.008) / 1.008 * jnp.pi / 2) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 0.0001, 0.9999)


def sigmoid_beta_schedule(num_steps: int) -> jnp.ndarray:
    x = jnp.linspace(-6.0, 6.0, num_steps, dtype=jnp.float32)
    betas = jnp.asarray(1.0 / (1.0 + jnp.exp(-x))) * (0.02 - 1e-4) + 1e-4
    return betas.astype(jnp.float32)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


def get_beta_schedule(schedule_type: str, num_steps: int) -> jnp.ndarray:
    try:
        return _SCHEDULES[schedule_type](num_steps)
    except KeyError:
        raise ValueError(f"Unknown schedule: {schedule_type}") from None


@dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep coefficients needed by training and sampling.

    Stored as numpy-backed jnp arrays of shape (T,); the scan-based
    sampler slices per-step rows so nothing is gathered dynamically.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    # Ancestral posterior coefficients (reference diffusion.py:401-425):
    #   x_{t-1} = c0 * x0_pred + c1 * x_t + sqrt(var) * z
    posterior_coef_x0: jnp.ndarray
    posterior_coef_xt: jnp.ndarray
    posterior_variance: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(cls, schedule_type: str, num_steps: int) -> "DiffusionSchedule":
        betas = get_beta_schedule(schedule_type, num_steps)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas)
        alphas_cumprod_prev = jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.float32), alphas_cumprod[:-1]]
        )
        one_minus = 1.0 - alphas_cumprod
        posterior_coef_x0 = jnp.sqrt(alphas_cumprod_prev) * betas / one_minus
        posterior_coef_xt = jnp.sqrt(alphas) * (1.0 - alphas_cumprod_prev) / one_minus
        posterior_variance = (1.0 - alphas_cumprod_prev) / one_minus * betas
        return cls(
            betas=betas,
            alphas=alphas,
            alphas_cumprod=alphas_cumprod,
            alphas_cumprod_prev=alphas_cumprod_prev,
            sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=jnp.sqrt(one_minus),
            posterior_coef_x0=posterior_coef_x0,
            posterior_coef_xt=posterior_coef_xt,
            posterior_variance=posterior_variance,
        )


def ddim_timesteps(num_train_steps: int, num_sampling_steps: int) -> np.ndarray:
    """Strided timestep subsequence for DDIM sampling (Song et al. 2020).

    Honors `generation.sampling_steps`, which the reference declares but
    never consumes (reference config.yaml:121, SURVEY §3.2 note).
    """
    num_sampling_steps = min(num_sampling_steps, num_train_steps)
    stride = num_train_steps / num_sampling_steps
    ts = (np.arange(num_sampling_steps) * stride).round().astype(np.int64)
    return np.unique(ts)
