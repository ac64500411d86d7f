"""Conditional normalizing flow (RealNVP-style affine coupling).

The reference's config documents three architectures —
``"diffusion", "cvae", "flow"`` (reference config/config.yaml:21-22) —
but implements only the first two; `main.py:173-174` raises on "flow".
This module completes the family: a conditional RealNVP with alternating
half-feature affine couplings, exact log-likelihood training, and
single-pass sampling (the fastest of the three generators).

TPU-first: every coupling is two dense matmuls over the full batch
(MXU-friendly), masks are static 0/1 vectors baked at module
construction (no dynamic partitioning), and both directions are simple
jit-compatible compositions — no scan needed since K is small.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config, FrozenDims
from .constraints import ConstraintSpec, constraint_losses

Dtype = Any

_LOG2PI = float(np.log(2.0 * np.pi))


class CouplingNet(nn.Module):
    """MLP producing (log-scale, shift) for the transformed half."""

    out_dim: int
    hidden_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h)
        h = nn.silu(h)
        raw = nn.Dense(
            2 * self.out_dim, dtype=self.dtype, name="out",
            kernel_init=nn.initializers.zeros,  # identity-init flow
        )(h)
        raw = raw.astype(jnp.float32)
        log_s, t = jnp.split(raw, 2, axis=-1)
        # Bounded log-scale keeps the chain numerically stable.
        return 2.0 * jnp.tanh(log_s / 2.0), t


class ConditionalRealNVP(nn.Module):
    """K alternating affine couplings conditioned on the clinical vector."""

    data_dim: int
    condition_dim: int
    num_couplings: int = 6
    hidden_dim: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        half = self.data_dim // 2
        masks = []
        for k in range(self.num_couplings):
            mask = np.zeros(self.data_dim, np.float32)
            if k % 2 == 0:
                mask[:half] = 1.0
            else:
                mask[half:] = 1.0
            masks.append(mask)
        self._masks = [jnp.asarray(m) for m in masks]
        self.nets = [
            CouplingNet(
                out_dim=self.data_dim,
                hidden_dim=self.hidden_dim,
                dtype=self.dtype,
                name=f"coupling_{k}",
            )
            for k in range(self.num_couplings)
        ]

    def forward(self, x: jnp.ndarray, conditions: jnp.ndarray):
        """x -> z with log |det dz/dx| accumulated."""
        z = x
        log_det = jnp.zeros(x.shape[0], jnp.float32)
        for mask, net in zip(self._masks, self.nets):
            keep = z * mask
            log_s, t = net(jnp.concatenate([keep, conditions], axis=-1))
            log_s = log_s * (1.0 - mask)
            t = t * (1.0 - mask)
            z = keep + (1.0 - mask) * (z * jnp.exp(log_s) + t)
            log_det = log_det + jnp.sum(log_s, axis=-1)
        return z, log_det

    def inverse(self, z: jnp.ndarray, conditions: jnp.ndarray) -> jnp.ndarray:
        """z -> x (exact inverse of `forward`)."""
        x = z
        for mask, net in zip(reversed(self._masks), reversed(self.nets)):
            keep = x * mask
            log_s, t = net(jnp.concatenate([keep, conditions], axis=-1))
            log_s = log_s * (1.0 - mask)
            t = t * (1.0 - mask)
            x = keep + (1.0 - mask) * ((x - t) * jnp.exp(-log_s))
        return x

    def __call__(self, x: jnp.ndarray, conditions: jnp.ndarray):
        return self.forward(x, conditions)

    def log_prob(self, x: jnp.ndarray, conditions: jnp.ndarray) -> jnp.ndarray:
        z, log_det = self.forward(x, conditions)
        log_base = -0.5 * jnp.sum(z * z + _LOG2PI, axis=-1)
        return log_base + log_det


@dataclass(frozen=True)
class ConditionalFlow:
    """Stateless wrapper with the Trainer-compatible loss/sample API."""

    module: ConditionalRealNVP
    constraint_spec: Optional[ConstraintSpec] = None
    pathway_coherence_weight: float = 0.0
    mutation_expression_weight: float = 0.0
    mutual_exclusivity_weight: float = 0.0
    cooccurrence_weight: float = 0.0

    @staticmethod
    def from_config(
        config: Config,
        dims: FrozenDims,
        constraint_spec: Optional[ConstraintSpec] = None,
    ) -> "ConditionalFlow":
        mc = config.model
        module = ConditionalRealNVP(
            data_dim=dims.data_dim,
            condition_dim=dims.condition_dim,
            num_couplings=max(4, len(mc.hidden_dims) * 2),
            hidden_dim=max(mc.hidden_dims),
            dtype=jnp.dtype(mc.compute_dtype),
        )
        use_constraints = mc.constraints.enabled and constraint_spec is not None
        return ConditionalFlow(
            module=module,
            constraint_spec=constraint_spec if use_constraints else None,
            pathway_coherence_weight=(
                mc.constraints.pathway_coherence_weight if use_constraints else 0.0
            ),
            mutation_expression_weight=(
                mc.constraints.mutation_expression_weight if use_constraints else 0.0
            ),
            mutual_exclusivity_weight=(
                mc.constraints.gene_network_weight if use_constraints else 0.0
            ),
            cooccurrence_weight=(
                mc.constraints.cooccurrence_weight if use_constraints else 0.0
            ),
        )

    def init_params(self, rng: jax.Array, condition_dim: int):
        x = jnp.zeros((2, self.module.data_dim), jnp.float32)
        c = jnp.zeros((2, condition_dim), jnp.float32)
        return self.module.init({"params": rng}, x, c)["params"]

    def loss(
        self,
        params,
        x0: jnp.ndarray,
        conditions: jnp.ndarray,
        rng: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Negative log-likelihood in nats/dim (+ optional constraints)."""
        del deterministic  # flow has no dropout
        log_prob = self.module.apply(
            {"params": params}, x0, conditions,
            method=ConditionalRealNVP.log_prob,
        )
        nll = -jnp.mean(log_prob) / self.module.data_dim
        metrics = {"nll_per_dim": nll}
        total = nll

        if self.constraint_spec is not None:
            # Constraints act on model *samples* (differentiable through
            # the inverse pass), pushing generated patients toward the
            # configured biology.
            z = jax.random.normal(rng, x0.shape, jnp.float32)
            x_sample = self.module.apply(
                {"params": params}, z, conditions,
                method=ConditionalRealNVP.inverse,
            )
            terms = constraint_losses(x_sample, self.constraint_spec)
            metrics.update(terms)
            total = (
                total
                + self.pathway_coherence_weight * terms["pathway_coherence"]
                + self.mutation_expression_weight * terms["mutation_expression"]
                + self.mutual_exclusivity_weight * terms["mutual_exclusivity"]
                + self.cooccurrence_weight * terms["cooccurrence"]
            )
        metrics["loss"] = total
        return total, metrics

    def sample(
        self,
        params,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
    ) -> jnp.ndarray:
        if num_samples is None:
            num_samples = conditions.shape[0]
        z = jax.random.normal(
            rng, (num_samples, self.module.data_dim), jnp.float32
        )
        return self.module.apply(
            {"params": params}, z, conditions,
            method=ConditionalRealNVP.inverse,
        )
