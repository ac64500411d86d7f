"""Conditional VAE with biological constraints, TPU-native.

Functional re-design of the reference cVAE family
(reference models/cvae.py:12-346):

- Encoder: concat(x, cond) -> [Dense -> BatchNorm -> ReLU -> Dropout]*
  -> (mu, logvar) heads (cvae.py:28-41)
- Decoder mirrors hidden dims reversed (cvae.py:79-89)
- loss = sum-MSE reconstruction + analytic KL, both per-sample
  normalized (cvae.py:178-181)
- auxiliary survival head on mu (cvae.py:250-255, 327-329)
- REAL constraint losses (pathway coherence, mutation-expression
  rules, mutual exclusivity) where the reference returns 0.0 stubs
  (cvae.py:281-283, 300-302); see models/constraints.py

BatchNorm runs with mutable `batch_stats` during training and running
averages at eval/sampling — the tiny-cohort pitfall called out in
SURVEY §7 "Hard parts".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config, FrozenDims
from .constraints import ConstraintSpec, constraint_losses
from .networks import SurvivalHead

Dtype = Any


class VAEEncoder(nn.Module):
    hidden_dims: Sequence[int]
    latent_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        conditions: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.concatenate([x, conditions], axis=-1).astype(self.dtype)
        for i, h_dim in enumerate(self.hidden_dims):
            h = nn.Dense(h_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = nn.BatchNorm(
                use_running_average=use_running_average,
                dtype=jnp.float32,
                name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_logvar")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class VAEDecoder(nn.Module):
    hidden_dims: Sequence[int]  # already reversed relative to encoder
    output_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        conditions: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        h = jnp.concatenate([z, conditions], axis=-1).astype(self.dtype)
        for i, h_dim in enumerate(self.hidden_dims):
            h = nn.Dense(h_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = nn.BatchNorm(
                use_running_average=use_running_average,
                dtype=jnp.float32,
                name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="output")(h)
        return out.astype(jnp.float32)


class ConditionalVAEModule(nn.Module):
    """Encoder + decoder + survival head as one Flax module."""

    data_dim: int
    latent_dim: int
    hidden_dims: Sequence[int]
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(
            hidden_dims=tuple(self.hidden_dims),
            latent_dim=self.latent_dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.decoder = VAEDecoder(
            hidden_dims=tuple(reversed(self.hidden_dims)),
            output_dim=self.data_dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.survival_head = SurvivalHead(dtype=self.dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        conditions: jnp.ndarray,
        z_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        mu, logvar = self.encoder(
            x, conditions, deterministic, use_running_average
        )
        if z_rng is not None:
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(z_rng, mu.shape, jnp.float32)
            z = mu + eps * std  # reparameterization (cvae.py:150-154)
        else:
            z = mu
        x_recon = self.decoder(
            z, conditions, deterministic, use_running_average
        )
        survival_pred = self.survival_head(mu, deterministic)
        return x_recon, mu, logvar, survival_pred

    def decode(
        self,
        z: jnp.ndarray,
        conditions: jnp.ndarray,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        return self.decoder(z, conditions, True, use_running_average)

    def encode(
        self,
        x: jnp.ndarray,
        conditions: jnp.ndarray,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        mu, _ = self.encoder(x, conditions, True, use_running_average)
        return mu


@dataclass(frozen=True)
class BiologyConstrainedVAE:
    """Stateless wrapper bundling module + loss weights."""

    module: ConditionalVAEModule
    constraint_spec: Optional[ConstraintSpec] = None
    pathway_coherence_weight: float = 1.0
    mutation_expression_weight: float = 0.5
    survival_weight: float = 0.3
    mutual_exclusivity_weight: float = 0.2
    cooccurrence_weight: float = 1.0

    @staticmethod
    def from_config(
        config: Config,
        dims: FrozenDims,
        constraint_spec: Optional[ConstraintSpec] = None,
    ) -> "BiologyConstrainedVAE":
        mc = config.model
        module = ConditionalVAEModule(
            data_dim=dims.data_dim,
            latent_dim=mc.latent_dim,
            hidden_dims=tuple(mc.hidden_dims),
            dropout=mc.gnn.dropout,
            dtype=jnp.dtype(mc.compute_dtype),
        )
        use_constraints = mc.constraints.enabled and constraint_spec is not None
        return BiologyConstrainedVAE(
            module=module,
            constraint_spec=constraint_spec if use_constraints else None,
            pathway_coherence_weight=mc.constraints.pathway_coherence_weight,
            mutation_expression_weight=mc.constraints.mutation_expression_weight,
            survival_weight=mc.constraints.survival_prediction_weight,
            mutual_exclusivity_weight=mc.constraints.gene_network_weight,
            cooccurrence_weight=mc.constraints.cooccurrence_weight,
        )

    @property
    def latent_dim(self) -> int:
        return self.module.latent_dim

    def init_variables(self, rng: jax.Array, condition_dim: int):
        x = jnp.zeros((2, self.module.data_dim), jnp.float32)
        c = jnp.zeros((2, condition_dim), jnp.float32)
        return self.module.init(
            {"params": rng}, x, c, z_rng=None, deterministic=True,
            use_running_average=False,
        )

    # ------------------------------------------------------------------
    # Training loss
    # ------------------------------------------------------------------
    def loss(
        self,
        params,
        batch_stats,
        x: jnp.ndarray,
        conditions: jnp.ndarray,
        survival: jnp.ndarray,
        rng: jax.Array,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Any]:
        """ELBO + survival aux + biological constraints.

        Reconstruction/KL normalization matches reference cvae.py:178-181
        (sum over features and batch, divided by batch size).
        """
        z_rng, drop_rng = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = self.module.apply(
            variables,
            x,
            conditions,
            z_rng=z_rng,
            deterministic=not train,
            use_running_average=not train,
            rngs={"dropout": drop_rng} if train else None,
            mutable=["batch_stats"] if train else [],
        )
        x_recon, mu, logvar, survival_pred = outputs
        batch = x.shape[0]

        recon_loss = jnp.sum((x_recon - x) ** 2) / batch
        kl_loss = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar)) / batch
        survival_loss = jnp.mean((survival_pred - survival) ** 2)

        total = recon_loss + kl_loss + self.survival_weight * survival_loss
        metrics = {
            "recon_loss": recon_loss,
            "kl_loss": kl_loss,
            "survival_loss": survival_loss,
        }

        if self.constraint_spec is not None:
            terms = constraint_losses(x_recon, self.constraint_spec)
            metrics.update(terms)
            total = (
                total
                + self.pathway_coherence_weight * terms["pathway_coherence"]
                + self.mutation_expression_weight * terms["mutation_expression"]
                + self.mutual_exclusivity_weight * terms["mutual_exclusivity"]
                + self.cooccurrence_weight * terms["cooccurrence"]
            )

        metrics["loss"] = total
        new_batch_stats = mutated.get("batch_stats", batch_stats) if train else batch_stats
        return total, metrics, new_batch_stats

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------
    def sample(
        self,
        params,
        batch_stats,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
    ) -> jnp.ndarray:
        """Prior sampling: z ~ N(0, I) -> decoder (cvae.py:188-208)."""
        if num_samples is None:
            num_samples = conditions.shape[0]
        z = jax.random.normal(rng, (num_samples, self.module.latent_dim), jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats}
        return self.module.apply(
            variables, z, conditions, method=ConditionalVAEModule.decode
        )
