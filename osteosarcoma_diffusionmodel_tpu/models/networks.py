"""Flax network modules for the diffusion denoiser.

Architecture parity with the reference PyTorch modules:
- sinusoidal time embedding over normalized t in [0,1]
  (reference models/diffusion.py:117-139)
- 2-layer SiLU MLP condition embedding (diffusion.py:91-114)
- skip-connected MLP "U-Net" denoiser with
  Linear->GroupNorm(8)->SiLU->Dropout->Linear->GroupNorm(8)->SiLU
  blocks and additive time/condition injection (diffusion.py:142-256)

TPU-first details: params live in float32 while matmuls run in a
configurable ``compute_dtype`` (bfloat16 by default) so they map onto
the MXU; GroupNorm statistics are always computed in float32. The
condition pathway is factored out (`embed_conditions`) so the
scan-based sampler can hoist the loop-invariant condition projection
out of the 1000-step reverse loop instead of recomputing it per step
the way the reference does (diffusion.py:395).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding of normalized timestep t in [0, 1]."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half_dim, dtype=jnp.float32)
            * (-np.log(10000.0) / (half_dim - 1))
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ConditionEmbedding(nn.Module):
    """Linear -> SiLU -> Linear over continuous clinical conditions."""

    embedding_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, conditions: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.embedding_dim, dtype=self.dtype, name="fc1")(conditions)
        h = nn.silu(h)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="fc2")(h)


class DenoiserBlock(nn.Module):
    """Linear->GroupNorm(8)->SiLU->Dropout->Linear->GroupNorm(8)->SiLU."""

    features: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.features, dtype=self.dtype, name="fc1")(x)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="norm1")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.features, dtype=self.dtype, name="fc2")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="norm2")(h)
        return nn.silu(h)


class DiffusionDenoiser(nn.Module):
    """Skip-connected MLP denoiser, conditioned on time + clinical vector.

    Encoder blocks over ``hidden_dims[1:]`` push activations onto a skip
    stack; decoder blocks pop LIFO and concatenate, exactly mirroring the
    reference forward pass (diffusion.py:234-251).
    """

    data_dim: int
    time_dim: int = 128
    condition_embed_dim: int = 64
    hidden_dims: Sequence[int] = (256, 512, 256)
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    # Learned time-dependent scalar-gain skip from the input to the
    # output: out += gain(t) * x. The hidden bottleneck (data_dim >>
    # hidden width) cannot pass per-feature detail through; the optimal
    # x0 estimator contains a time-dependent linear term in x_t, and
    # this zero-initialized gain lets the model recover it, fixing the
    # sample under-dispersion the pure-MLP reference suffers. Disable
    # for exact reference-architecture parity.
    input_skip: bool = True
    # Learned per-feature residual log-variance of x0 given (x_t, t, c)
    # ("DDPM with learned sigma"): a second output head, trained by
    # Gaussian NLL with a stop-gradient mean, sampled as white residual
    # noise at the final reverse step. Restores the marginal dispersion
    # an MSE-trained conditional-mean predictor shrinks away.
    learn_sigma: bool = False
    # Latent-factor conditioning (round-3 model-owned joint-structure
    # candidate, ROADMAP §2): a small encoder maps the clean patient
    # vector to `latent_factor_dim` factors appended to the clinical
    # conditions. The 62-gene joint is then carried by k(k+1)/2 prior
    # parameters instead of 62^2/2 pairwise ones — the quantity the
    # D3PM/finetune experiments measured as unidentifiable at n<=400.
    # At generation the factors are drawn from a Gaussian prior fitted
    # on the training cohort's encoded latents.
    latent_factor_dim: int = 0
    # Low-rank correlated residual sigma (config.py DiffusionConfig
    # low_rank_sigma_dim): k > 0 creates Sigma_x0(t) = s(t)^2
    # (diag(d) + U U^T) parameters — loadings U (D, k), log-diag d (D,)
    # and a per-timestep log-scale s (T,). Fitted by Woodbury NLL in
    # ConditionalDiffusion.loss; consumed by the reverse loop's
    # x0-uncertainty marginalization.
    low_rank_sigma_dim: int = 0
    low_rank_sigma_steps: int = 0
    # Rows of U that carry loadings (0 = data_dim): the "mutations"
    # scope restricts the factors to the leading binary block.
    low_rank_sigma_rows: int = 0
    # Autoregressive (FVSBN) mutation head (config.py DiffusionConfig
    # ar_mutation_head): M > 0 creates a strictly-lower-triangular
    # coupling matrix W (M, M), a bias (M,), and a small context MLP.
    # Teacher-forced logit_i = b_i + sum_{j<i} W_ij m_j + f(ctx)_i —
    # DIRECT cross-entropy gradients on the pairwise couplings, the
    # channel the diffusion-MSE joint-structure candidates (D3PM /
    # finetune / latent-factor / low-rank sigma) measurably lack at
    # n <= 400. Consumed by ConditionalDiffusion.loss (CE term) and
    # ar_sample (sequential Bernoulli draw).
    ar_head_dim: int = 0
    ar_context_hidden: int = 64

    def setup(self):
        if self.low_rank_sigma_dim > 0:
            rows = self.low_rank_sigma_rows or self.data_dim
            self.lowrank_U = self.param(
                "lowrank_U", nn.initializers.normal(0.01),
                (rows, self.low_rank_sigma_dim), jnp.float32,
            )
            self.lowrank_logdiag = self.param(
                "lowrank_logdiag", nn.initializers.zeros,
                (self.data_dim,), jnp.float32,
            )
            self.lowrank_logs = self.param(
                "lowrank_logs", nn.initializers.zeros,
                (self.low_rank_sigma_steps,), jnp.float32,
            )
        if self.ar_head_dim > 0:
            # Zero-ish coupling init: the head starts as independent
            # per-gene logistic marginals and learns couplings from CE.
            self.ar_coupling = self.param(
                "ar_coupling", nn.initializers.normal(0.01),
                (self.ar_head_dim, self.ar_head_dim), jnp.float32,
            )
            self.ar_bias = self.param(
                "ar_bias", nn.initializers.zeros,
                (self.ar_head_dim,), jnp.float32,
            )
            # Context MLP runs in float32: its inputs are tiny
            # (pathways + clinicals by default) and its output sits on
            # the logit scale where bf16 rounding is visible.
            self.ar_ctx_fc1 = nn.Dense(
                self.ar_context_hidden, dtype=jnp.float32,
                name="ar_ctx_fc1",
            )
            # Zero-init output layer: context contributes nothing at
            # init, so early training is pure marginal fitting.
            self.ar_ctx_fc2 = nn.Dense(
                self.ar_head_dim, dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, name="ar_ctx_fc2",
            )
        if self.latent_factor_dim > 0:
            self.latent_encoder_fc1 = nn.Dense(
                128, dtype=self.dtype, name="latent_enc_fc1"
            )
            self.latent_encoder_fc2 = nn.Dense(
                self.latent_factor_dim, dtype=jnp.float32,
                name="latent_enc_fc2",
            )
        hidden = list(self.hidden_dims)
        self.time_embed = TimeEmbedding(self.time_dim)
        self.time_proj = nn.Dense(hidden[0], dtype=self.dtype)
        if self.input_skip:
            self.skip_gain = nn.Dense(
                1,
                dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                name="skip_gain",
            )
        self.condition_embed = ConditionEmbedding(
            self.condition_embed_dim, dtype=self.dtype
        )
        self.cond_proj = nn.Dense(hidden[0], dtype=self.dtype)
        self.input_proj = nn.Dense(hidden[0], dtype=self.dtype)
        self.encoder = [
            DenoiserBlock(h_dim, self.dropout, dtype=self.dtype, name=f"enc_{i}")
            for i, h_dim in enumerate(hidden[1:])
        ]
        self.bottleneck = DenoiserBlock(hidden[-1], self.dropout, dtype=self.dtype)
        self.decoder = [
            DenoiserBlock(hidden[i], self.dropout, dtype=self.dtype, name=f"dec_{j}")
            for j, i in enumerate(range(len(hidden) - 2, -1, -1))
        ]
        self.output_proj = nn.Dense(self.data_dim, dtype=self.dtype)
        if self.learn_sigma:
            # Zero kernel + strongly negative bias: starts as "almost no
            # residual noise" (sigma ~ e^-3) and learns upward.
            self.sigma_proj = nn.Dense(
                self.data_dim,
                dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.constant(-6.0),
                name="sigma_proj",
            )

    def embed_conditions(self, conditions: jnp.ndarray) -> jnp.ndarray:
        """Project clinical conditions to the model width.

        Loop-invariant during sampling: call once, reuse every scan
        step. With latent_factor_dim > 0 the input is the AUGMENTED
        condition vector [clinical | latent factors].
        """
        return self.cond_proj(self.condition_embed(conditions))

    def encode_latent(self, x0: jnp.ndarray) -> jnp.ndarray:
        """Clean patient vector -> latent factors (training: appended
        to conditions; generation: replaced by prior draws)."""
        h = nn.silu(self.latent_encoder_fc1(x0.astype(self.dtype)))
        return self.latent_encoder_fc2(h).astype(jnp.float32)

    def lowrank_sigma(self):
        """(U, log_diag, log_s) of the low-rank residual covariance."""
        return self.lowrank_U, self.lowrank_logdiag, self.lowrank_logs

    def ar_context_logits(self, context: jnp.ndarray) -> jnp.ndarray:
        """Per-gene logit contribution of the conditioning context
        (pathway scores / continuous block + clinical scenario)."""
        h = nn.silu(self.ar_ctx_fc1(context.astype(jnp.float32)))
        return self.ar_ctx_fc2(h)

    def ar_logits(self, bits: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """Teacher-forced FVSBN logits: gene i sees bits j < i only
        (strict lower-triangular mask) plus the context term."""
        M = self.ar_head_dim
        mask = jnp.tril(jnp.ones((M, M), jnp.float32), -1)
        w = self.ar_coupling * mask
        return (
            bits.astype(jnp.float32) @ w.T
            + self.ar_bias
            + self.ar_context_logits(context)
        )

    def init_all(self, x, t, conditions, enc_x=None, ar_ctx=None):
        """Initialization entry touching every submodule (flax creates
        params lazily; plain __call__ would skip the latent encoder).
        ``enc_x``: the encoder's input view when it differs from x
        (mutations-only encoding); ``ar_ctx``: a context-shaped dummy
        for the AR head's MLP."""
        if self.latent_factor_dim > 0:
            self.encode_latent(x if enc_x is None else enc_x)
        if self.ar_head_dim > 0 and ar_ctx is not None:
            self.ar_context_logits(ar_ctx)
        return self(x, t, conditions=conditions)

    def hidden_forward(
        self, h: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Encoder/bottleneck/decoder stack from the post-input-
        projection activation (``input_proj(x) + t_emb + c_proj``) to
        the pre-output-projection hidden state.

        Factored out of ``__call__`` so the latent-tail sampler
        (ops/latent_sampler.py) can run the reverse loop entirely in
        hidden space: every data-space op around this stack is affine,
        so the wide projections can be applied once per cohort instead
        of once per step."""
        skips = []
        for block in self.encoder:
            h = block(h, deterministic)
            skips.append(h)

        h = self.bottleneck(h, deterministic)

        for block in self.decoder:
            if not skips:
                break
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(h, deterministic)
        return h

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        conditions: Optional[jnp.ndarray] = None,
        c_proj: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if c_proj is None:
            if conditions is None:
                raise ValueError("provide `conditions` or precomputed `c_proj`")
            c_proj = self.embed_conditions(conditions)

        t_sinusoid = self.time_embed(t)
        t_emb = self.time_proj(t_sinusoid)

        h = self.input_proj(x.astype(self.dtype))
        h = self.hidden_forward(h + t_emb + c_proj, deterministic)

        out = self.output_proj(h).astype(jnp.float32)
        if self.input_skip:
            gain = self.skip_gain(t_sinusoid)  # (B, 1), zero-init
            out = out + gain * x.astype(jnp.float32)
        if self.learn_sigma:
            logvar = jnp.clip(
                self.sigma_proj(h.astype(jnp.float32)), -12.0, 4.0
            )
            return jnp.concatenate([out, logvar], axis=-1)
        return out


class SurvivalHead(nn.Module):
    """Auxiliary survival-time regressor over a latent vector.

    Parity: reference cvae.py:250-255 (Linear(128)->ReLU->Dropout->Linear(1)).
    """

    hidden_dim: int = 128
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(z)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(1, dtype=self.dtype, name="fc2")(h)
        return out.astype(jnp.float32).squeeze(-1)
