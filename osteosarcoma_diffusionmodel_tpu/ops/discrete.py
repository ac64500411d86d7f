"""Binary D3PM algebra for the discrete mutation head.

The reference treats the 62 binary mutation dims as continuous
Gaussian-diffusion features and thresholds the samples at 0.5
(reference utils/generate.py:135).  That loses the joint mutation
structure: measured co-occurrence pattern correlation of the raw
continuous samples is ~0.1 (ROADMAP §2).  This module implements the
proper discrete alternative — a D3PM (Austin et al., 2021,
"Structured Denoising Diffusion Models in Discrete State-Spaces")
with uniform 2-state transition matrices — specialized to binary
variables so every quantity reduces to closed-form scalar algebra on
``(batch, n_mutations)`` arrays.  No ``(K, K)`` matrix products, no
gathers: everything is elementwise, fuses into the surrounding scan
body, and is effectively free next to the denoiser matmuls.

Forward chain (per dim, states {0, 1}):

    q(x_t | x_{t-1}) = (1 - beta_t) * delta(x_t, x_{t-1}) + beta_t / 2

so the cumulative marginal is

    q(x_t | x_0) = acp_t * delta(x_t, x_0) + (1 - acp_t) / 2

with ``acp_t = prod_s (1 - beta_s)`` — the same alphas-cumprod the
continuous chain uses, so both blocks share one noise schedule and
one timestep embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_prob(alphas_cumprod: jnp.ndarray) -> jnp.ndarray:
    """P(x_t == x_0) under the uniform binary chain: (1 + acp_t) / 2."""
    return 0.5 * (1.0 + alphas_cumprod)


def q_sample_bits(
    bits: jnp.ndarray, alphas_cumprod_t: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0) by flipping bits.

    ``bits``: (B, M) in {0, 1}; ``alphas_cumprod_t``: (B,) gathered at
    each sample's timestep.  Returns (B, M) bits.
    """
    flip = 0.5 * (1.0 - alphas_cumprod_t)[:, None]
    u = jax.random.uniform(key, bits.shape)
    return jnp.abs(bits - (u < flip).astype(bits.dtype))


def posterior_prob_one(
    x_t: jnp.ndarray,
    p1: jnp.ndarray,
    beta_t: jnp.ndarray,
    acp_prev: jnp.ndarray,
) -> jnp.ndarray:
    """p_theta(x_{t-1} = 1 | x_t) for the binary uniform D3PM.

    Marginalizes the exact posterior q(x_{t-1} | x_t, x_0 = i) over the
    model's prediction ``p1 = p_theta(x_0 = 1 | x_t)``:

        p(x_{t-1}=1 | x_t) = sum_i p_theta(x_0=i) *
            f(x_t, 1) g(1, i) / [f(x_t, 0) g(0, i) + f(x_t, 1) g(1, i)]

    with one-step kernel f(j, k) = (1-beta_t) delta_jk + beta_t/2 and
    cumulative prior g(k, i) = acp_{t-1} delta_ki + (1-acp_{t-1})/2.

    All inputs broadcast against ``x_t`` of shape (B, M): ``p1`` is
    (B, M); ``beta_t``/``acp_prev`` are scalars (inside a scan) or
    (B, 1) columns.  Returns (B, M) probabilities.
    """
    half_beta = 0.5 * beta_t
    f1 = (1.0 - beta_t) * x_t + half_beta  # f(x_t, k=1)
    f0 = (1.0 - beta_t) * (1.0 - x_t) + half_beta  # f(x_t, k=0)

    half_om = 0.5 * (1.0 - acp_prev)
    g1_1 = acp_prev + half_om  # g(k=1, i=1)
    g1_0 = half_om  # g(k=1, i=0)
    g0_1 = half_om  # g(k=0, i=1)
    g0_0 = acp_prev + half_om  # g(k=0, i=0)

    a1_i1 = f1 * g1_1
    a0_i1 = f0 * g0_1
    a1_i0 = f1 * g1_0
    a0_i0 = f0 * g0_0

    post1_i1 = a1_i1 / (a1_i1 + a0_i1)
    post1_i0 = a1_i0 / (a1_i0 + a0_i0)
    return p1 * post1_i1 + (1.0 - p1) * post1_i0


def bernoulli_cross_entropy(
    logits: jnp.ndarray, bits: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise stable BCE between x0 logits and true bits (B, M)."""
    return jnp.maximum(logits, 0.0) - logits * bits + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
