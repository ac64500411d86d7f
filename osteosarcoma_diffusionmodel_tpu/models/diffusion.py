"""Conditional DDPM, TPU-native.

Functional re-design of the reference `BiologyAwareDiffusionModel`
(reference models/diffusion.py:259-449):

- schedules precomputed once (:class:`DiffusionSchedule`)
- training loss is a pure jittable function with explicit PRNG keys
  (the reference relies on global torch RNG, diffusion.py:361)
- the 1000-step ancestral reverse loop is a single `jax.lax.scan`
  inside jit — one compiled program instead of 1000 host->device
  launches (reference diffusion.py:446-447), the main patients/sec
  lever identified in SURVEY §2
- the condition embedding is hoisted out of the reverse loop (the
  reference re-embeds conditions every step, diffusion.py:395)
- a DDIM sampler honors `generation.sampling_steps`, which the
  reference declares but never consumes (config.yaml:121)
- optional real biological constraint losses on the predicted x0
  (the reference stubs them to 0.0; see models/constraints.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, FrozenDims
from ..ops.discrete import (
    bernoulli_cross_entropy,
    posterior_prob_one,
    q_sample_bits,
)
from ..ops.schedules import DiffusionSchedule, ddim_timesteps
from .constraints import ConstraintSpec, constraint_losses
from .networks import DiffusionDenoiser


def derive_step_keys(rng: jax.Array, num_keys: int, impl: str) -> jax.Array:
    """Per-step PRNG keys for the reverse loop.

    The default threefry PRNG serializes catastrophically against the
    denoiser matmuls inside `lax.scan` on TPU (measured 19x slowdown of
    the whole sampler); the hardware `rbg` generator runs the same loop
    at full speed. The incoming key seeds the chosen implementation, so
    callers keep ordinary threefry key discipline.
    """
    if impl in ("rbg", "unsafe_rbg"):
        data = jax.random.bits(rng, (4,), jnp.uint32)
        rng = jax.random.wrap_key_data(data, impl=impl)
    return jax.random.split(rng, num_keys)


def _elementwise_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str):
    """l1 | l2 | huber — honoring config `loss_type` (config.yaml:47)."""
    if loss_type == "l1":
        return jnp.abs(pred - target)
    if loss_type == "l2":
        return (pred - target) ** 2
    if loss_type == "huber":
        delta = 1.0
        err = jnp.abs(pred - target)
        return jnp.where(err <= delta, 0.5 * err**2, delta * (err - 0.5 * delta))
    raise ValueError(f"Unknown loss_type: {loss_type}")


@dataclass(frozen=True)
class ConditionalDiffusion:
    """Bundles the denoiser module with schedule + loss configuration.

    Stateless: parameters are passed explicitly to every method, so the
    methods close cleanly under jit / grad / vmap / shard_map.
    """

    denoiser: DiffusionDenoiser
    schedule: DiffusionSchedule
    loss_type: str = "l2"
    constraint_spec: Optional[ConstraintSpec] = None
    pathway_coherence_weight: float = 0.0
    mutation_expression_weight: float = 0.0
    mutual_exclusivity_weight: float = 0.0
    cooccurrence_weight: float = 0.0
    # PRNG used inside the reverse-loop scan; "rbg" rides the TPU
    # hardware generator (see derive_step_keys), "threefry" is the
    # standard JAX PRNG for bit-exact reproducibility needs.
    sampler_rng_impl: str = "rbg"
    # Classifier-free guidance training: per-sample condition dropout
    # probability. 0 disables CFG (reference-equivalent behavior).
    cfg_dropout_prob: float = 0.0
    # "x0" predicts the clean vector (epsilon derived analytically);
    # "epsilon" is the reference's parameterization; "v" predicts
    # v = sqrt(acp)*eps - sqrt(1-acp)*x0 (Salimans & Ho progressive
    # distillation) — x0 is then recovered with an explicit x_t term
    # at every t, which preserves per-sample variation a pure
    # conditional-mean x0 head regresses away. See config.py
    # DiffusionConfig.
    parameterization: str = "x0"
    # Learned per-feature residual sigma of x0 (second denoiser head,
    # Gaussian NLL with stop-gradient mean); sampled as residual noise
    # at the final reverse step so raw (uncalibrated) marginal
    # dispersion matches the data.
    learn_sigma: bool = False
    sigma_loss_weight: float = 1.0
    # Low-rank correlated residual sigma: Sigma_x0(t) = s(t)^2
    # (diag(d) + U U^T) fitted on x0 residuals by Woodbury NLL
    # (stop-gradient mean); sampling marginalizes the x0 uncertainty
    # into every reverse step's posterior (see sample()). Mutually
    # exclusive with learn_sigma. config.py DiffusionConfig.
    low_rank_sigma_dim: int = 0
    low_rank_sigma_weight: float = 1.0
    # Optional (D,) per-feature loss weights (sum-preserving); None =
    # unweighted mean, matching the reference. Built from the block
    # dims by from_config when block_loss_weighting == "balanced".
    feature_loss_weights: Optional[np.ndarray] = None
    # Latent-factor conditioning (see DiffusionDenoiser
    # latent_factor_dim): k > 0 appends an encoder latent to the
    # conditions during training; generation draws it from a Gaussian
    # prior fitted on the training cohort's encoded latents.
    latent_factor_dim: int = 0
    # Encoder input: "full" patient vector or the "mutations" block
    # only (config.py DiffusionConfig.latent_encoder_input).
    latent_encoder_input: str = "full"
    # Clamp predicted x0 during sampling (prevents the reverse chain
    # from exploding through the clipped-beta schedule tail).
    clip_denoised: bool = True
    denoised_clip_value: float = 30.0
    # Dtype of the reverse-loop carry (x_t) and per-step noise. The
    # 1000-step sampler is HBM-bandwidth-bound: each step re-reads and
    # re-writes the (B, D) state several times around a small MLP, so
    # halving the state bytes with bfloat16 buys real throughput.
    # float32 reproduces round-1 numerics exactly.
    sample_dtype: str = "float32"
    # Per-step transition noise. "uniform" draws from U(-sqrt3, sqrt3)
    # (zero mean, unit variance): measured 2.4x cheaper than the
    # Gaussian's erfinv transform, which costs as much as the whole
    # denoiser at these dims. Through hundreds of composed reverse
    # steps the sampled distribution is CLT-indistinguishable; only the
    # final step's noise shape survives, and that variance is ~0 (and
    # the learned-sigma residual draw stays Gaussian regardless).
    noise_type: str = "normal"  # normal | uniform
    # Discrete (binary D3PM) head over the first `mutation_dim`
    # features: the mutation block diffuses through a uniform 2-state
    # chain sharing the continuous schedule's alphas-cumprod, the
    # denoiser's mutation outputs are x0 logits (BCE-trained), and the
    # reverse step draws exact D3PM posterior bits (ops/discrete.py).
    # The continuous Gaussian chain + 0.5 threshold the reference uses
    # (generate.py:135) loses the joint mutation structure; this head
    # makes the mutation block model-owned and natively binary.
    discrete_head: bool = False
    mutation_dim: int = 0
    discrete_ce_weight: float = 1.0
    # Autoregressive (FVSBN) mutation head: teacher-forced logistic
    # chain over the mutation bits with direct CE gradients on the
    # pairwise couplings (see DiffusionDenoiser.ar_logits). At
    # generation the bits are drawn sequentially conditioned on the
    # patient's continuous block + clinical scenario (ar_sample), so
    # the mutation block is model-owned and natively binary — the
    # joint-structure channel the diffusion-MSE candidates lack.
    # config.py DiffusionConfig.ar_mutation_head.
    ar_head: bool = False
    ar_context: str = "pathways"  # pathways | continuous | none
    ar_ce_weight: float = 1.0
    # Explicit L2 on the coupling matrix — the AR params' ONLY
    # shrinkage (their optimizer branch is plain Adam, no weight
    # decay): 62*61/2 pairwise params against n=100-400 real cohorts
    # want tunable shrinkage. Scale note: the CE term is a per-element
    # mean, so this absolute l2 is ~M times stronger relative to the
    # CE signal than the per-patient-NLL convention (config.py).
    ar_l2: float = 1e-5
    # L2 on the context-MLP kernels — ar_l2 covers only the couplings,
    # and the unregularized MLP memorizes n<=400 train rows (measured:
    # val CE 20+, ~0.2 chi2 pattern corr lost — scripts/replay_ar.py).
    ar_ctx_l2: float = 1e-2
    # Constant LR of the AR params' dedicated Adam branch
    # (trainer.py: no AdamW decay, plateau-immune — both measured to
    # freeze |W| ~10x below convergence when shared, DEMO_AR_RAW).
    ar_lr: float = 1e-2
    pathway_dim: int = 0

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_config(
        config: Config,
        dims: FrozenDims,
        constraint_spec: Optional[ConstraintSpec] = None,
    ) -> "ConditionalDiffusion":
        mc = config.model
        if mc.diffusion.parameterization not in ("x0", "epsilon", "v"):
            raise ValueError(
                f"Unknown diffusion.parameterization "
                f"{mc.diffusion.parameterization!r}; expected x0|epsilon|v"
            )
        if mc.diffusion.low_rank_sigma_dim > 0 and mc.diffusion.learn_sigma:
            raise ValueError(
                "low_rank_sigma_dim and learn_sigma are mutually "
                "exclusive residual-sigma channels"
            )
        if (
            mc.diffusion.low_rank_sigma_dim > 0
            and mc.diffusion.low_rank_sigma_scope == "mutations"
            and mc.diffusion.discrete_mutation_head
            and dims.mutation_dim > 0
        ):
            # The discrete head owns the mutation dims: loss and sampler
            # both slice the continuous block (U[M:]), which would drop
            # every row a mutations-scoped U carries — a silent no-op.
            raise ValueError(
                "low_rank_sigma_scope='mutations' is incompatible with "
                "discrete_mutation_head: the discrete head removes the "
                "mutation rows from the Gaussian residual channel"
            )
        if mc.diffusion.ar_mutation_head and mc.diffusion.discrete_mutation_head:
            raise ValueError(
                "ar_mutation_head and discrete_mutation_head are mutually "
                "exclusive owners of the mutation block"
            )
        if (
            mc.diffusion.low_rank_sigma_dim > 0
            and mc.diffusion.low_rank_sigma_scope == "mutations"
            and mc.diffusion.ar_mutation_head
            and dims.mutation_dim > 0
        ):
            # Same silent-no-op class as the discrete-head conflict
            # above: the AR draw replaces the sampled mutation scores at
            # generation, so a mutations-scoped correlated-noise channel
            # can never reach the output bits.
            raise ValueError(
                "low_rank_sigma_scope='mutations' is incompatible with "
                "ar_mutation_head: the AR head replaces the sampled "
                "mutation scores, voiding the correlated-noise channel"
            )
        if mc.diffusion.ar_context not in ("pathways", "continuous", "none"):
            raise ValueError(
                f"Unknown diffusion.ar_context {mc.diffusion.ar_context!r};"
                " expected pathways|continuous|none"
            )
        ar_on = mc.diffusion.ar_mutation_head and dims.mutation_dim > 0
        denoiser = DiffusionDenoiser(
            data_dim=dims.data_dim,
            time_dim=mc.latent_dim,
            condition_embed_dim=mc.latent_dim // 2,
            hidden_dims=tuple(mc.hidden_dims),
            dropout=mc.gnn.dropout,
            dtype=jnp.dtype(mc.compute_dtype),
            input_skip=mc.denoiser_input_skip,
            learn_sigma=mc.diffusion.learn_sigma,
            latent_factor_dim=mc.diffusion.latent_factor_dim,
            low_rank_sigma_dim=mc.diffusion.low_rank_sigma_dim,
            low_rank_sigma_steps=mc.diffusion.num_steps,
            low_rank_sigma_rows=(
                dims.mutation_dim
                if mc.diffusion.low_rank_sigma_scope == "mutations"
                else 0
            ),
            ar_head_dim=dims.mutation_dim if ar_on else 0,
            ar_context_hidden=mc.diffusion.ar_context_hidden,
        )
        schedule = DiffusionSchedule.create(
            mc.diffusion.beta_schedule, mc.diffusion.num_steps
        )
        feature_weights = None
        if mc.diffusion.block_loss_weighting == "balanced":
            blocks = [dims.mutation_dim, dims.expression_dim, dims.pathway_dim]
            weights = []
            for b in blocks:
                if b > 0:
                    weights.append(
                        np.full(b, dims.data_dim / (len(blocks) * b), np.float32)
                    )
            feature_weights = np.concatenate(weights)

        use_constraints = mc.constraints.enabled and constraint_spec is not None
        return ConditionalDiffusion(
            denoiser=denoiser,
            learn_sigma=mc.diffusion.learn_sigma,
            sigma_loss_weight=mc.diffusion.sigma_loss_weight,
            schedule=schedule,
            loss_type=mc.diffusion.loss_type,
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
            low_rank_sigma_dim=mc.diffusion.low_rank_sigma_dim,
            low_rank_sigma_weight=mc.diffusion.low_rank_sigma_weight,
            sampler_rng_impl=config.generation.rng_impl,
            sample_dtype=config.generation.sample_dtype,
            noise_type=config.generation.noise_type,
            cfg_dropout_prob=mc.cfg_dropout_prob,
            parameterization=mc.diffusion.parameterization,
            latent_factor_dim=mc.diffusion.latent_factor_dim,
            latent_encoder_input=mc.diffusion.latent_encoder_input,
            feature_loss_weights=feature_weights,
            clip_denoised=mc.diffusion.clip_denoised,
            denoised_clip_value=mc.diffusion.denoised_clip_value,
            discrete_head=(
                mc.diffusion.discrete_mutation_head and dims.mutation_dim > 0
            ),
            mutation_dim=dims.mutation_dim,
            discrete_ce_weight=mc.diffusion.discrete_ce_weight,
            ar_head=ar_on,
            ar_context=mc.diffusion.ar_context,
            ar_ce_weight=mc.diffusion.ar_ce_weight,
            ar_l2=mc.diffusion.ar_l2,
            ar_ctx_l2=mc.diffusion.ar_ctx_l2,
            ar_lr=mc.diffusion.ar_lr,
            pathway_dim=dims.pathway_dim,
        )

    def init_params(self, rng: jax.Array, condition_dim: int):
        x = jnp.zeros((2, self.denoiser.data_dim), jnp.float32)
        t = jnp.zeros((2,), jnp.float32)
        # Condition input is [clinical | latent factors] when the
        # latent-factor encoder is on.
        c = jnp.zeros(
            (2, condition_dim + self.latent_factor_dim), jnp.float32
        )
        if self.latent_factor_dim > 0 or self.ar_head:
            ar_ctx = None
            if self.ar_head:
                ar_ctx = jnp.zeros(
                    (2, self._ar_context_width(condition_dim)), jnp.float32
                )
            return self.denoiser.init(
                {"params": rng}, x, t, c,
                enc_x=self._latent_encoder_view(x),
                ar_ctx=ar_ctx,
                method=DiffusionDenoiser.init_all,
            )["params"]
        return self.denoiser.init({"params": rng}, x, t, conditions=c)["params"]

    # ------------------------------------------------------------------
    # Autoregressive mutation head
    # ------------------------------------------------------------------
    def _ar_context_width(self, condition_dim: int) -> int:
        if self.ar_context == "pathways":
            return self.pathway_dim + condition_dim
        if self.ar_context == "continuous":
            return self.denoiser.data_dim - self.mutation_dim + condition_dim
        return condition_dim

    def _ar_context_view(
        self, continuous: jnp.ndarray, conditions: jnp.ndarray
    ) -> jnp.ndarray:
        """Context the AR head conditions on. ``continuous`` is the
        (B, D - M) [expression | pathways] block — REAL features during
        training, the sampled (and, when calibration is on, calibrated)
        block at generation. Pathway scores are the default: low-dim
        (robust at n=100-400) and they summarize the expression state
        the mutation<->pathway coupling rides on."""
        if self.ar_context == "pathways" and self.pathway_dim > 0:
            view = continuous[:, -self.pathway_dim:]
        elif self.ar_context == "continuous":
            view = continuous
        else:
            return conditions.astype(jnp.float32)
        return jnp.concatenate(
            [view.astype(jnp.float32), conditions.astype(jnp.float32)], axis=1
        )

    def ar_sample(
        self,
        params,
        rng: jax.Array,
        continuous: jnp.ndarray,
        conditions: jnp.ndarray,
    ) -> jnp.ndarray:
        """Sequential FVSBN draw of the mutation bits.

        62 scan steps of one (B, M) x (M,) matvec each — microseconds
        next to the reverse diffusion loop. The context term is
        loop-invariant and hoisted out of the scan.
        """
        M = self.mutation_dim
        ctx = self._ar_context_view(continuous, conditions)
        ctx_logits = self.denoiser.apply(
            {"params": params}, ctx,
            method=DiffusionDenoiser.ar_context_logits,
        )
        mask = jnp.tril(jnp.ones((M, M), jnp.float32), -1)
        w = params["ar_coupling"] * mask
        bias = params["ar_bias"]
        batch = continuous.shape[0]

        def body(bits, inp):
            i, key = inp
            logit = bits @ w[i] + bias[i] + ctx_logits[:, i]
            bit = jax.random.bernoulli(
                key, jax.nn.sigmoid(logit)
            ).astype(jnp.float32)
            return bits.at[:, i].set(bit), None

        bits0 = jnp.zeros((batch, M), jnp.float32)
        keys = derive_step_keys(rng, M, self.sampler_rng_impl)
        bits, _ = jax.lax.scan(body, bits0, (jnp.arange(M), keys))
        return bits

    def _latent_encoder_view(self, x0: jnp.ndarray) -> jnp.ndarray:
        if self.latent_encoder_input == "mutations" and self.mutation_dim:
            return x0[:, : self.mutation_dim]
        return x0

    def encode_latents(self, params, x0: jnp.ndarray) -> jnp.ndarray:
        """Encode clean patient vectors to latent factors (generation
        fits its Gaussian prior on the real cohort through this).
        ``x0`` is the full patient vector; the configured encoder view
        (full / mutations-only) is applied here."""
        return self.denoiser.apply(
            {"params": params}, self._latent_encoder_view(x0),
            method=DiffusionDenoiser.encode_latent,
        )

    def _lowrank_params(self, params):
        """(U, log_diag, log_s) of the low-rank residual covariance.
        U is zero-padded to the full feature width when the loadings
        are scoped to the mutation block, so the NLL/sampling algebra
        is scope-agnostic (zero rows get zero gradients and zero
        correlated noise)."""
        U, logdiag, logs = self.denoiser.apply(
            {"params": params}, method=DiffusionDenoiser.lowrank_sigma
        )
        D = self.denoiser.data_dim
        if U.shape[0] < D:
            U = jnp.concatenate(
                [U, jnp.zeros((D - U.shape[0], U.shape[1]), U.dtype)],
                axis=0,
            )
        return U, logdiag, logs

    # ------------------------------------------------------------------
    # Parameterization helpers
    # ------------------------------------------------------------------
    def _split_sigma(self, pred: jnp.ndarray):
        """Split the denoiser output into (prediction, logvar|None)."""
        if not self.learn_sigma:
            return pred, None
        return jnp.split(pred, 2, axis=-1)

    def _step_noise(self, key, shape, dtype):
        """Per-step transition noise (see `noise_type`)."""
        if self.noise_type == "uniform":
            s = 3.0 ** 0.5
            return jax.random.uniform(key, shape, dtype, -s, s)
        return jax.random.normal(key, shape, dtype)

    def _predict_x0(self, pred, x_t, sqrt_acp, sqrt_om):
        """Recover x0 from the network prediction under any
        parameterization. sqrt_acp/sqrt_om broadcast against x_t."""
        if self.parameterization == "x0":
            return pred
        if self.parameterization == "v":
            return sqrt_acp * x_t - sqrt_om * pred
        return (x_t - sqrt_om * pred) / sqrt_acp

    # ------------------------------------------------------------------
    # Forward process
    # ------------------------------------------------------------------
    def q_sample(
        self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) closed form (reference diffusion.py:328-342)."""
        sqrt_acp = self.schedule.sqrt_alphas_cumprod[t][:, None]
        sqrt_om = self.schedule.sqrt_one_minus_alphas_cumprod[t][:, None]
        return sqrt_acp * x0 + sqrt_om * noise

    # ------------------------------------------------------------------
    # Training loss
    # ------------------------------------------------------------------
    def loss(
        self,
        params,
        x0: jnp.ndarray,
        conditions: jnp.ndarray,
        rng: jax.Array,
        deterministic: bool = False,
        ar_x0: jnp.ndarray | None = None,
        ar_conditions: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Noise-prediction loss, optionally + biological constraints.

        Mirrors the reference training forward (diffusion.py:344-380):
        t ~ U[0, T), q_sample, predict noise, elementwise loss. With
        `discrete_head`, the mutation block instead goes through the
        binary D3PM forward chain and contributes an x0 BCE term.

        ``ar_x0`` / ``ar_conditions``: the UNAUGMENTED batch for the AR
        head's teacher-forced CE (defaults to ``x0``/``conditions``).
        The trainer passes the pre-mixup rows — mixup's convex patient
        combinations are a useful denoiser regularizer but destroy the
        pairwise bit structure the FVSBN couplings must estimate
        (measured ~0.1 chi2 pattern corr on the n=400 fixture,
        scripts/replay_ar.py joint_condition_ablation).
        """
        batch = x0.shape[0]
        M = self.mutation_dim if self.discrete_head else 0
        # The AR head sees the raw clinical conditions (not the
        # latent-factor-augmented / CFG-dropped vector built below).
        clin_conditions = conditions
        # bit_rng appended last: the continuous path's key indices (and
        # therefore its numerics for a fixed seed) are unchanged.
        t_rng, noise_rng, drop_rng, cfg_rng, bit_rng = jax.random.split(rng, 5)
        t = jax.random.randint(t_rng, (batch,), 0, self.schedule.num_steps)
        mut0 = x0[:, :M]
        cont0 = x0[:, M:]
        noise = jax.random.normal(noise_rng, cont0.shape, jnp.float32)
        cont_t = self.q_sample(cont0, t, noise)
        if M:
            mut_t = q_sample_bits(mut0, self.schedule.alphas_cumprod[t], bit_rng)
            # Bits enter the denoiser as +-1 so the input block is
            # unit-scale like the Gaussian features.
            x_t = jnp.concatenate([2.0 * mut_t - 1.0, cont_t], axis=1)
        else:
            x_t = cont_t
        t_norm = t.astype(jnp.float32) / self.schedule.num_steps

        if self.latent_factor_dim > 0:
            # Factors from the CLEAN vector condition the denoiser:
            # the reverse chain then reconstructs joint structure the
            # prior encodes in k dims. Appended before CFG dropout so
            # the unconditional score drops them with the clinicals.
            h = self.denoiser.apply(
                {"params": params}, self._latent_encoder_view(x0),
                method=DiffusionDenoiser.encode_latent,
            )
            metrics_h = jnp.mean(h * h)
            conditions = jnp.concatenate([conditions, h], axis=1)

        if self.cfg_dropout_prob > 0:
            # Classifier-free guidance training: zero the condition
            # vector for a random subset so the model also learns the
            # unconditional score.
            keep = (
                jax.random.uniform(cfg_rng, (batch, 1)) >= self.cfg_dropout_prob
            ).astype(conditions.dtype)
            conditions = conditions * keep

        pred = self.denoiser.apply(
            {"params": params},
            x_t,
            t_norm,
            conditions=conditions,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_rng},
        )
        pred, logvar = self._split_sigma(pred)
        mut_logits = pred[:, :M]
        cont_pred = pred[:, M:] if M else pred

        sqrt_acp = self.schedule.sqrt_alphas_cumprod[t][:, None]
        sqrt_om = self.schedule.sqrt_one_minus_alphas_cumprod[t][:, None]
        if self.parameterization == "x0":
            target = cont0
        elif self.parameterization == "v":
            target = sqrt_acp * noise - sqrt_om * cont0
        else:
            target = noise
        err = _elementwise_loss(cont_pred, target, self.loss_type)
        if self.feature_loss_weights is not None:
            err = err * jnp.asarray(self.feature_loss_weights)[None, M:]
        mse = jnp.mean(err)
        metrics = {"diffusion_loss": mse}
        total = mse
        if self.latent_factor_dim > 0:
            # Soft prior pull: keeps encoded factors in a range the
            # generation-time Gaussian prior fit can cover.
            metrics["latent_sq"] = metrics_h
            total = total + 1e-3 * metrics_h
        if M:
            ce = jnp.mean(bernoulli_cross_entropy(mut_logits, mut0))
            metrics["mutation_ce"] = ce
            total = total + self.discrete_ce_weight * ce
        ar_term = jnp.float32(0.0)
        if self.ar_head and self.mutation_dim > 0:
            # Teacher-forced FVSBN cross-entropy on the CLEAN bits —
            # the direct pairwise-coupling gradient channel. Gradients
            # touch only the AR parameters (bits/context are data), so
            # joint training with the diffusion loss is interference-
            # free.
            Ma = self.mutation_dim
            ar_src = x0 if ar_x0 is None else ar_x0
            ar_cond = clin_conditions if ar_conditions is None else ar_conditions
            ar_logits = self.denoiser.apply(
                {"params": params},
                ar_src[:, :Ma],
                self._ar_context_view(ar_src[:, Ma:], ar_cond),
                method=DiffusionDenoiser.ar_logits,
            )
            ar_ce = jnp.mean(bernoulli_cross_entropy(ar_logits, ar_src[:, :Ma]))
            metrics["ar_ce"] = ar_ce
            ar_term = self.ar_ce_weight * ar_ce
            if self.ar_l2 > 0:
                # Penalize only the live (strictly-lower-triangular)
                # couplings — the masked half never reaches a logit and
                # would otherwise just inflate the regularizer and |W|
                # diagnostics with decaying init noise.
                tri = jnp.tril(jnp.ones((Ma, Ma), jnp.float32), -1)
                ar_term = ar_term + self.ar_l2 * jnp.sum(
                    (params["ar_coupling"] * tri) ** 2
                )
            if self.ar_ctx_l2 > 0:
                ar_term = ar_term + self.ar_ctx_l2 * (
                    jnp.sum(params["ar_ctx_fc1"]["kernel"] ** 2)
                    + jnp.sum(params["ar_ctx_fc2"]["kernel"] ** 2)
                )
            total = total + ar_term

        x0_pred = None
        cont_x0_pred = None
        if (
            self.constraint_spec is not None
            or logvar is not None
            or self.low_rank_sigma_dim > 0
        ):
            cont_x0_pred = self._predict_x0(cont_pred, cont_t, sqrt_acp, sqrt_om)
            x0_pred = (
                jnp.concatenate([jax.nn.sigmoid(mut_logits), cont_x0_pred], axis=1)
                if M
                else cont_x0_pred
            )

        if logvar is not None:
            # Residual-variance head: Gaussian NLL against the true x0
            # with a stop-gradient mean — trains sigma without biasing
            # the mean predictor. Continuous block only: the discrete
            # head owns the mutation dims (no Gaussian residual there).
            logvar_c = logvar[:, M:]
            resid = cont0 - jax.lax.stop_gradient(cont_x0_pred)
            nll = 0.5 * jnp.mean(logvar_c + resid**2 * jnp.exp(-logvar_c))
            metrics["sigma_nll"] = nll
            total = total + self.sigma_loss_weight * nll

        if self.low_rank_sigma_dim > 0:
            # Woodbury Gaussian NLL of the x0 residual under
            # Sigma_t = s(t)^2 (diag(d) + U U^T). The mean predictor is
            # stop-gradiented (as with learn_sigma): only the
            # covariance parameters (U, d, s) receive gradients, so the
            # MSE-trained mean is untouched and the experiment isolates
            # the noise channel.
            U, logdiag, logs = self._lowrank_params(params)
            k = self.low_rank_sigma_dim
            Uc = U[M:] if M else U
            d = jnp.exp(logdiag[M:] if M else logdiag)
            resid = cont0 - jax.lax.stop_gradient(cont_x0_pred)
            s = jnp.exp(logs[t])[:, None]  # (B, 1) per-sample t scale
            r = resid / s
            w = r / d
            p = w @ Uc  # (B, k)
            cap = jnp.eye(k) + (Uc / d[:, None]).T @ Uc  # capacitance
            chol = jnp.linalg.cholesky(cap)
            sol = jax.scipy.linalg.cho_solve((chol, True), p.T).T
            quad = jnp.sum(r * w, axis=1) - jnp.sum(p * sol, axis=1)
            Dc = r.shape[1]
            logdet = (
                jnp.sum(jnp.log(d))
                + 2.0 * jnp.sum(jnp.log(jnp.diag(chol)))
                + 2.0 * Dc * logs[t]
            )
            # Logged per-feature for readability, but the loss term
            # enters at the natural joint-NLL scale: dividing by Dc
            # dilutes the covariance params' only gradient source by
            # 5000x at production dims, which (measured, round 3) left
            # U at its init against AdamW's weight decay.
            nll = 0.5 * jnp.mean(logdet + quad)
            metrics["lowrank_sigma_nll"] = nll / Dc
            total = total + self.low_rank_sigma_weight * nll

        if self.constraint_spec is not None:
            terms = constraint_losses(x0_pred, self.constraint_spec)
            metrics.update(terms)
            total = (
                total
                + self.pathway_coherence_weight * terms["pathway_coherence"]
                + self.mutation_expression_weight * terms["mutation_expression"]
                + self.mutual_exclusivity_weight * terms["mutual_exclusivity"]
                + self.cooccurrence_weight * terms["cooccurrence"]
            )

        metrics["loss"] = total
        # Selection loss: what plateau-LR / early-stopping / best-
        # checkpoint tracking watch (trainer.py). Excludes the AR
        # head's CE+L2: those params train under a dedicated constant-
        # LR Adam branch and (1891 pairwise couplings on ~320 rows)
        # their val CE is EXPECTED to rise from overfit long before
        # the denoiser peaks — selecting on the sum snapshots an
        # undertrained diffusion model (measured: DEMO_AR_RAW rerun,
        # near-mean samples, freq corr 0.99 -> 0.53). The AR chi2
        # pattern itself is overfit-robust (0.877 at 6000 standalone
        # steps), so best-at-diffusion-optimum carries converged
        # couplings.
        metrics["sel_loss"] = total - ar_term
        return total, metrics

    # ------------------------------------------------------------------
    # Sampling (ancestral DDPM, scan-compiled)
    # ------------------------------------------------------------------
    def _denoise_fn(self, params, conditions: jnp.ndarray, guidance_scale: float):
        """Build the per-step noise predictor, with the loop-invariant
        condition projection hoisted out of the scan; classifier-free
        guidance batches the conditional and unconditional passes into
        one doubled-batch denoiser call."""
        c_proj = self.denoiser.apply(
            {"params": params}, conditions, method=DiffusionDenoiser.embed_conditions
        )
        if guidance_scale == 1.0:
            def denoise(x, t_vec):
                return self.denoiser.apply(
                    {"params": params}, x, t_vec, c_proj=c_proj,
                    deterministic=True,
                )
            return denoise

        null_proj = self.denoiser.apply(
            {"params": params},
            jnp.zeros_like(conditions),
            method=DiffusionDenoiser.embed_conditions,
        )
        both_proj = jnp.concatenate([c_proj, null_proj], axis=0)

        def denoise_cfg(x, t_vec):
            eps2 = self.denoiser.apply(
                {"params": params},
                jnp.concatenate([x, x], axis=0),
                jnp.concatenate([t_vec, t_vec], axis=0),
                c_proj=both_proj,
                deterministic=True,
            )
            eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
            if self.learn_sigma:
                # Guide the prediction only; keep the conditional
                # branch's logvar (extrapolating variances is
                # meaningless).
                mean_c, logvar_c = jnp.split(eps_cond, 2, axis=-1)
                mean_u, _ = jnp.split(eps_uncond, 2, axis=-1)
                guided = mean_u + guidance_scale * (mean_c - mean_u)
                return jnp.concatenate([guided, logvar_c], axis=-1)
            return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

        return denoise_cfg

    def sample(
        self,
        params,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
        guidance_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Full T-step ancestral reverse loop as one `lax.scan`.

        Per-step algebra matches reference p_sample (diffusion.py:383-425):
        x0_pred from predicted noise, posterior mean/variance, and the
        t == 0 branch (return x0_pred, no noise) handled by masking.
        `guidance_scale` != 1 applies classifier-free guidance (train
        with `cfg_dropout_prob` > 0 for it to be meaningful).
        """
        if num_samples is None:
            num_samples = conditions.shape[0]
        sched = self.schedule
        T = sched.num_steps
        M = self.mutation_dim if self.discrete_head else 0

        carry_dtype = jnp.dtype(self.sample_dtype)
        # bit_rng appended last: continuous-path key indices unchanged.
        init_rng, scan_rng, final_rng, bit_rng = jax.random.split(rng, 4)
        x_t = jax.random.normal(
            init_rng, (num_samples, self.denoiser.data_dim - M), carry_dtype
        )
        if M:
            # Binary chain prior at t = T is uniform Bernoulli(1/2).
            bits = jax.random.bernoulli(bit_rng, 0.5, (num_samples, M))
            x_t = jnp.concatenate([bits.astype(carry_dtype), x_t], axis=1)
        denoise = self._denoise_fn(params, conditions, guidance_scale)

        def predict_x0(x, coeffs, pred):
            pred = pred.astype(carry_dtype)
            if self.parameterization == "x0":
                x0_pred = pred
            elif self.parameterization == "v":
                x0_pred = (
                    coeffs["sqrt_acp"].astype(carry_dtype) * x
                    - coeffs["sqrt_om_acp"].astype(carry_dtype) * pred
                )
            else:
                x0_pred = (
                    x - coeffs["sqrt_om_acp"].astype(carry_dtype) * pred
                ) * coeffs["inv_sqrt_acp"].astype(carry_dtype)
            if self.clip_denoised:
                x0_pred = jnp.clip(
                    x0_pred, -self.denoised_clip_value, self.denoised_clip_value
                )
            return x0_pred

        # Steps T-1 .. 1 in one scan (every iteration adds transition
        # noise — no per-step branch); coefficients are stacked in
        # reverse-time order so the scan consumes rows instead of
        # gathering dynamically. The t == 0 step runs once outside the
        # scan: it adds no transition noise, and the learned-sigma
        # residual draw stays Gaussian even under cheap in-scan noise.
        ts = jnp.arange(T - 1, 0, -1)
        step_coeffs = {
            "t_norm": ts.astype(jnp.float32) / T,
            "sqrt_acp": sched.sqrt_alphas_cumprod[ts],
            "inv_sqrt_acp": 1.0 / sched.sqrt_alphas_cumprod[ts],
            "sqrt_om_acp": sched.sqrt_one_minus_alphas_cumprod[ts],
            "coef_x0": sched.posterior_coef_x0[ts],
            "coef_xt": sched.posterior_coef_xt[ts],
            "sqrt_var": jnp.sqrt(sched.posterior_variance[ts]),
            "step_key": derive_step_keys(
                scan_rng, max(T - 1, 1), self.sampler_rng_impl
            ),
        }
        if M:
            step_coeffs["beta"] = sched.betas[ts]
            step_coeffs["acp_prev"] = sched.alphas_cumprod[ts - 1]
        LR = self.low_rank_sigma_dim
        if LR:
            # x0-uncertainty marginalization: the posterior of the
            # reverse step integrates p(x0 | x_t) = N(x0_hat, Sigma_t),
            # so x_{t-1} ~ N(c0 x0_hat + c1 x_t, c0^2 Sigma_t + var_t I)
            # with Sigma_t = s(t)^2 (diag(d) + U U^T) fitted by the
            # training NLL. Drawn as c0 s(t) (sqrt(d) eps + U eps_k).
            lr_U, lr_logdiag, lr_logs = self._lowrank_params(params)
            lr_Uc = lr_U[M:] if M else lr_U
            lr_dsqrt = jnp.exp(0.5 * (lr_logdiag[M:] if M else lr_logdiag))
            step_coeffs["lr_s"] = jnp.exp(lr_logs)[ts]

        def body(x, coeffs):
            t_vec = jnp.full((num_samples,), coeffs["t_norm"], jnp.float32)
            if M:
                xm = x[:, :M]
                xc = x[:, M:]
                x_in = jnp.concatenate([2.0 * xm - 1.0, xc], axis=1)
                noise_key, bit_key = jax.random.split(coeffs["step_key"])
            else:
                xm = None
                xc = x
                x_in = x
                noise_key = coeffs["step_key"]
            if LR:
                # Extra keys derived only when the channel is on: key
                # indices (and fixed-seed numerics) are unchanged for
                # existing checkpoints otherwise.
                noise_key, lr_e_key, lr_f_key = jax.random.split(
                    noise_key, 3
                )
            pred, _ = self._split_sigma(denoise(x_in, t_vec))
            mut_logits = pred[:, :M]
            cont_pred = pred[:, M:] if M else pred
            x0_pred = predict_x0(xc, coeffs, cont_pred)
            mean = (
                coeffs["coef_x0"].astype(carry_dtype) * x0_pred
                + coeffs["coef_xt"].astype(carry_dtype) * xc
            )
            z = self._step_noise(noise_key, xc.shape, carry_dtype)
            xc_next = mean + coeffs["sqrt_var"].astype(carry_dtype) * z
            if LR:
                eps = jax.random.normal(lr_e_key, xc.shape, jnp.float32)
                epsk = jax.random.normal(
                    lr_f_key, (xc.shape[0], LR), jnp.float32
                )
                corr = lr_dsqrt * eps + epsk @ lr_Uc.T
                xc_next = xc_next + (
                    coeffs["coef_x0"] * coeffs["lr_s"]
                ).astype(carry_dtype) * corr.astype(carry_dtype)
            if not M:
                return xc_next, None
            # Exact binary D3PM posterior step for the mutation block.
            p_prev = posterior_prob_one(
                xm.astype(jnp.float32),
                jax.nn.sigmoid(mut_logits.astype(jnp.float32)),
                coeffs["beta"],
                coeffs["acp_prev"],
            )
            u = jax.random.uniform(bit_key, p_prev.shape)
            xm_next = (u < p_prev).astype(carry_dtype)
            return jnp.concatenate([xm_next, xc_next], axis=1), None

        x_1, _ = jax.lax.scan(body, x_t, step_coeffs)

        # Final step (t = 0): return the denoised prediction, plus the
        # learned per-feature residual noise when the sigma head is on.
        # Mutation bits draw from the predicted x0 Bernoulli — sampling
        # (not argmax) preserves per-gene frequencies.
        t_vec = jnp.zeros((num_samples,), jnp.float32)
        xm_1 = x_1[:, :M]
        xc_1 = x_1[:, M:] if M else x_1
        x_in = (
            jnp.concatenate([2.0 * xm_1 - 1.0, xc_1], axis=1) if M else x_1
        )
        pred, logvar = self._split_sigma(denoise(x_in, t_vec))
        mut_logits = pred[:, :M]
        cont_pred = pred[:, M:] if M else pred
        final_coeffs = {
            "sqrt_acp": sched.sqrt_alphas_cumprod[0],
            "inv_sqrt_acp": 1.0 / sched.sqrt_alphas_cumprod[0],
            "sqrt_om_acp": sched.sqrt_one_minus_alphas_cumprod[0],
        }
        # Split only when the discrete head needs its own bit key: with
        # M == 0 the residual draw keeps final_rng itself, so fixed-seed
        # continuous-path sampling is unchanged from pre-discrete-head
        # checkpoints (the continuous key indices stay as they were).
        if M:
            resid_rng, final_bit_rng = jax.random.split(final_rng)
        else:
            resid_rng = final_rng
        x0 = predict_x0(xc_1, final_coeffs, cont_pred).astype(jnp.float32)
        if logvar is not None:
            logvar_c = logvar[:, M:] if M else logvar
            z = jax.random.normal(resid_rng, x0.shape, jnp.float32)
            x0 = x0 + jnp.exp(0.5 * logvar_c) * z
        if LR:
            # t = 0 residual draw from the fitted Sigma_0 (the low-rank
            # analogue of the learned-sigma final residual).
            lr_e_key, lr_f_key = jax.random.split(resid_rng)
            eps = jax.random.normal(lr_e_key, x0.shape, jnp.float32)
            epsk = jax.random.normal(
                lr_f_key, (x0.shape[0], LR), jnp.float32
            )
            s0 = jnp.exp(lr_logs[0])
            x0 = x0 + s0 * (lr_dsqrt * eps + epsk @ lr_Uc.T)
        if M:
            p1 = jax.nn.sigmoid(mut_logits.astype(jnp.float32))
            bits = jax.random.bernoulli(final_bit_rng, p1).astype(jnp.float32)
            x0 = jnp.concatenate([bits, x0], axis=1)
        return x0

    # ------------------------------------------------------------------
    # DDIM sampling (deterministic, strided timesteps)
    # ------------------------------------------------------------------
    def sample_ddim(
        self,
        params,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_sampling_steps: int = 50,
        eta: float = 0.0,
        num_samples: Optional[int] = None,
        guidance_scale: float = 1.0,
    ) -> jnp.ndarray:
        """DDIM reverse process over `num_sampling_steps` strided steps.

        With `discrete_head`, the mutation block runs the binary D3PM
        posterior over the same strided timesteps — the uniform chain
        composes exactly, so the t -> t_prev jump is a single step with
        effective flip rate ``beta_eff = 1 - acp_t / acp_prev``.
        """
        if num_samples is None:
            num_samples = conditions.shape[0]
        sched = self.schedule
        T = sched.num_steps
        M = self.mutation_dim if self.discrete_head else 0

        ts_np = ddim_timesteps(T, num_sampling_steps)[::-1].copy()  # descending
        prev_np = np.concatenate([ts_np[1:], np.array([-1])])
        acp = np.asarray(sched.alphas_cumprod)
        acp_t = acp[ts_np]
        acp_prev = np.where(prev_np >= 0, acp[np.maximum(prev_np, 0)], 1.0)
        sigma = eta * np.sqrt(
            (1 - acp_prev) / (1 - acp_t) * (1 - acp_t / acp_prev)
        )

        init_rng, scan_rng, bit_rng = jax.random.split(rng, 3)
        x_t = jax.random.normal(
            init_rng, (num_samples, self.denoiser.data_dim - M), jnp.float32
        )
        if M:
            bits = jax.random.bernoulli(bit_rng, 0.5, (num_samples, M))
            x_t = jnp.concatenate([bits.astype(jnp.float32), x_t], axis=1)
        denoise = self._denoise_fn(params, conditions, guidance_scale)

        n_steps = len(ts_np)
        step_coeffs = {
            "t_norm": jnp.asarray(ts_np, jnp.float32) / T,
            "sqrt_acp_t": jnp.sqrt(jnp.asarray(acp_t, jnp.float32)),
            "sqrt_om_acp_t": jnp.sqrt(1.0 - jnp.asarray(acp_t, jnp.float32)),
            "sqrt_acp_prev": jnp.sqrt(jnp.asarray(acp_prev, jnp.float32)),
            "dir_coef": jnp.sqrt(
                jnp.maximum(
                    1.0 - jnp.asarray(acp_prev, jnp.float32) - jnp.asarray(sigma, jnp.float32) ** 2,
                    0.0,
                )
            ),
            "sigma": jnp.asarray(sigma, jnp.float32),
            "is_last": jnp.asarray(prev_np < 0, jnp.float32),
            "step_key": derive_step_keys(scan_rng, n_steps, self.sampler_rng_impl),
        }
        if M:
            step_coeffs["beta_eff"] = jnp.asarray(
                1.0 - acp_t / acp_prev, jnp.float32
            )
            step_coeffs["acp_prev"] = jnp.asarray(acp_prev, jnp.float32)

        def body(x, coeffs):
            t_vec = jnp.full((num_samples,), coeffs["t_norm"], jnp.float32)
            if M:
                xm = x[:, :M]
                xc = x[:, M:]
                x_in = jnp.concatenate([2.0 * xm - 1.0, xc], axis=1)
                step_key, bit_key = jax.random.split(coeffs["step_key"])
            else:
                xm = None
                xc = x
                x_in = x
                step_key = coeffs["step_key"]
            pred, logvar = self._split_sigma(denoise(x_in, t_vec))
            mut_logits = pred[:, :M]
            pred = pred[:, M:] if M else pred
            if self.parameterization == "x0":
                x0_pred = pred
            elif self.parameterization == "v":
                x0_pred = (
                    coeffs["sqrt_acp_t"] * xc - coeffs["sqrt_om_acp_t"] * pred
                )
            else:
                x0_pred = (xc - coeffs["sqrt_om_acp_t"] * pred) / coeffs["sqrt_acp_t"]
            if self.clip_denoised:
                x0_pred = jnp.clip(
                    x0_pred, -self.denoised_clip_value, self.denoised_clip_value
                )
            # Epsilon consistent with the (possibly clipped) x0 prediction.
            eps = (xc - coeffs["sqrt_acp_t"] * x0_pred) / jnp.maximum(
                coeffs["sqrt_om_acp_t"], 1e-8
            )
            z = jax.random.normal(step_key, xc.shape, jnp.float32)
            x_prev = (
                coeffs["sqrt_acp_prev"] * x0_pred
                + coeffs["dir_coef"] * eps
                + coeffs["sigma"] * z
            )
            if logvar is not None:
                # Learned residual noise on the final step only
                # (continuous block; the discrete head owns mutations).
                x_prev = x_prev + (
                    coeffs["is_last"] * jnp.exp(0.5 * (logvar[:, M:] if M else logvar)) * z
                )
            if not M:
                return x_prev, None
            # At the last step acp_prev == 1, so the posterior collapses
            # to the predicted x0 Bernoulli — bits exit binary.
            p_prev = posterior_prob_one(
                xm,
                jax.nn.sigmoid(mut_logits.astype(jnp.float32)),
                coeffs["beta_eff"],
                coeffs["acp_prev"],
            )
            u = jax.random.uniform(bit_key, p_prev.shape)
            xm_prev = (u < p_prev).astype(jnp.float32)
            return jnp.concatenate([xm_prev, x_prev], axis=1), None

        x0, _ = jax.lax.scan(body, x_t, step_coeffs)
        return x0
