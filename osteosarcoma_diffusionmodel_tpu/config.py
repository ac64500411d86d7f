"""Typed configuration system.

Loads the same YAML schema as the reference (`config/config.yaml`,
reference main.py:372-373) into a tree of dataclasses, resolving the
reference's known config inconsistencies deliberately:

- ``condition_on`` is authoritative (reference declares 3 names at
  config.yaml:51-54 but utils/train.py:395 hard-codes 4); we map the
  config names onto clinical columns and drop unavailable ones.
- ``generation.sampling_steps`` / ``loss_type`` are honored (unused in
  the reference, see reference config.yaml:47,120-121).
- Dims discovered from data are frozen into :class:`FrozenDims` before
  jit compilation ("discover dims -> freeze -> compile once"), then
  persisted to ``config_updated.yaml`` exactly like reference
  main.py:183-184.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

# Mapping from config `condition_on` names to clinical CSV columns.
# The reference uses `survival_days_norm`/`age_years` internally
# (utils/train.py:390-398) while the config speaks `survival_time`/`age`.
CONDITION_COLUMN_MAP = {
    "survival_time": "survival_days_norm",
    "event_occurred": "event_occurred",
    "age": "age_years",
    "metastasis_at_diagnosis": "metastasis_at_diagnosis",
}


@dataclass
class DownloadConfig:
    mutations: bool = True
    rna_seq: bool = True
    clinical: bool = True
    copy_number: bool = False


@dataclass
class DataConfig:
    gdc_project: str = "TARGET-OS"
    data_dir: str = "./data"
    raw_dir: str = "./data/raw"
    processed_dir: str = "./data/processed"
    download: DownloadConfig = field(default_factory=DownloadConfig)
    min_samples_per_gene: int = 3
    min_var_expression: float = 0.1
    pathway_database: str = "msigdb_hallmark"


@dataclass
class GNNConfig:
    # Kept for config-schema parity with the reference (config.yaml:37-41).
    # Only `dropout` feeds the denoiser, matching reference diffusion.py:294.
    type: str = "GAT"
    num_layers: int = 3
    heads: int = 4
    dropout: float = 0.2


@dataclass
class DiffusionConfig:
    num_steps: int = 1000
    beta_schedule: str = "cosine"  # linear | cosine | sigmoid
    loss_type: str = "l2"  # l1 | l2 | huber (honored, unlike the reference)
    # What the denoiser predicts. "x0" (default) predicts the clean
    # patient vector and derives epsilon analytically — the reference's
    # "epsilon" parameterization cannot beat the noise floor through the
    # 5142->256 MLP bottleneck (no input passthrough) and its reverse
    # chain explodes through the cosine schedule's clipped-beta tail;
    # "epsilon" reproduces the reference's behavior exactly.
    # "v" predicts v = sqrt(acp)*eps - sqrt(1-acp)*x0: x0 is recovered
    # with an explicit x_t term at every t, preserving per-sample
    # variation a conditional-mean x0 head shrinks away.
    parameterization: str = "x0"  # x0 | epsilon | v
    # Learned per-feature residual sigma of x0 (second denoiser head,
    # Gaussian NLL with stop-gradient mean), sampled as residual noise
    # at the final reverse step — raw (uncalibrated) marginal
    # dispersion then matches the data without post-hoc calibration.
    learn_sigma: bool = False
    sigma_loss_weight: float = 1.0
    # Latent-factor conditioning (round-3 model-owned joint-structure
    # candidate): k > 0 trains a small x0->k encoder whose output is
    # appended to the clinical conditions; generation draws the k
    # factors from a Gaussian prior fitted on the training cohort's
    # encoded latents. The 62-gene mutation joint is then carried by
    # k(k+1)/2 prior parameters instead of 62^2/2 pairwise estimates.
    latent_factor_dim: int = 0
    # What the latent encoder sees: "full" (whole patient vector) or
    # "mutations" (binary block only). Measured at n=400: the full
    # input channels the dominant expression variance (synthetic
    # coherence 0.97 vs real 0.38) while mutation co-occurrence stays
    # ~0; the mutation-only input targets the structure the copula
    # otherwise has to own.
    latent_encoder_input: str = "full"  # full | mutations
    # Low-rank correlated residual sigma (the round-2 VERDICT's other
    # shortlisted model-owned joint-structure candidate): k > 0 learns
    # Sigma_x0(t) = s(t)^2 (diag(d) + U U^T) over the model's own
    # x0-prediction residuals by Woodbury Gaussian NLL (stop-gradient
    # mean). Every reverse step then marginalizes the x0 uncertainty
    # into the posterior: x_{t-1} gains coef_x0 * s(t) *
    # (sqrt(d) * eps + U eps_k). The joint is carried through the
    # NOISE channel by D*k + D + T parameters — per-sample full-vector
    # residual gradients instead of the pair-count signal the D3PM /
    # finetune / latent-factor experiments measured as unidentifiable
    # at n <= 400. Mutually exclusive with learn_sigma.
    low_rank_sigma_dim: int = 0
    low_rank_sigma_weight: float = 1.0
    # Which features carry factor loadings: "full" (whole vector) or
    # "mutations" (binary block only; the diagonal still spans every
    # feature). Measured at n=400: the full-vector loadings chase the
    # dominant expression variance — synthetic coherence 0.96 vs real
    # 0.38 while mutation co-occurrence stays ~0 (DEMO_LOWRANK_RAW) —
    # the same failure mode as full-input latent-factor conditioning;
    # "mutations" points the whole k-factor budget at the block the
    # copula otherwise has to own.
    low_rank_sigma_scope: str = "full"  # full | mutations
    # Clamp the predicted x0 during sampling (standard DDPM
    # clip_denoised); disable for strict reference parity.
    clip_denoised: bool = True
    denoised_clip_value: float = 30.0
    # Per-block loss weighting: "balanced" weights the [mutations |
    # expression | pathways] blocks equally (sum-preserving); "none"
    # (default) is the reference's unweighted mean — measured to give
    # equal-or-better co-occurrence fidelity at these dims.
    block_loss_weighting: str = "none"  # balanced | none
    # Discrete (binary D3PM, uniform 2-state chain) head over the
    # mutation block: the denoiser's mutation outputs become x0 logits
    # trained with BCE, and sampling draws exact D3PM posterior bits —
    # mutations exit the model natively binary instead of being
    # thresholded continuous scores (reference generate.py:135). Shares
    # the continuous schedule's alphas-cumprod. See ops/discrete.py.
    discrete_mutation_head: bool = False
    # Weight of the mutation-block BCE term relative to the continuous
    # elementwise loss.
    discrete_ce_weight: float = 1.0
    # Autoregressive (FVSBN) mutation head (round-3 model-owned
    # joint-structure candidate #6): a strictly-lower-triangular
    # logistic chain logit_i = b_i + sum_{j<i} W_ij m_j + f(context)_i
    # trained teacher-forced with cross-entropy — DIRECT gradients on
    # the 62*61/2 pairwise couplings, unlike the diffusion-MSE
    # channels (D3PM head, sample-path finetune, latent factors,
    # low-rank sigma) where the optimal x0 prediction degenerates to
    # the per-gene frequency at n <= 400. Generation draws the bits
    # sequentially conditioned on the sampled continuous block, so
    # the mutation joint is model-owned and natively binary.
    # Mutually exclusive with discrete_mutation_head.
    ar_mutation_head: bool = False
    ar_ce_weight: float = 1.0
    # What f(context) sees besides the clinical scenario: "pathways"
    # (default — low-dim, robust at n=100-400, carries the
    # mutation<->pathway coupling), "continuous" (full expression +
    # pathway block through the context MLP), "none" (scenario only).
    ar_context: str = "pathways"
    ar_context_hidden: int = 64
    # Explicit L2 shrinkage on the coupling matrix W. NOTE the scale:
    # the AR CE term is a per-ELEMENT mean (divided by M genes), so an
    # absolute l2 here bites ~M times harder relative to the CE signal
    # than under the per-patient-NLL convention. Measured on the n=400
    # fixture (per-patient scale): <= 1e-3 is free, 1e-2 costs ~0.08
    # chi2 pattern corr — 1e-5 here ~= 6e-4 per-patient at M=62.
    ar_l2: float = 1e-5
    # Learning rate of the AR head's dedicated optimizer branch. The AR
    # params (coupling/bias/context MLP) are a per-pair logistic
    # regression, disjoint from the denoiser: they train under a plain
    # Adam at this constant rate — no AdamW weight decay (which shrinks
    # W toward 0 regardless of the CE signal) and no plateau-LR
    # coupling (the plateau tracks the diffusion-dominated val loss and
    # measured-collapsed the shared LR to 1e-15 by epoch ~300 at n=400,
    # freezing |W| at ~0.025 vs the ~0.25 a converged fit reaches).
    ar_lr: float = 1e-2
    # L2 on the context-MLP weights (fc1/fc2 kernels). The couplings'
    # ar_l2 does NOT cover these, and unregularized they memorize the
    # train rows through the 32->64->62 MLP: measured on the n=400
    # fixture replay (scripts/replay_ar.py), ctx_l2=0 drives train CE
    # to 0.03 / val CE to 20+ and costs ~0.2 chi2 pattern corr
    # (0.885 -> 0.69); 1e-2 restores the couplings-only optimum while
    # leaving the context term free to carry whatever cross-block
    # signal the cohort actually supports.
    ar_ctx_l2: float = 1e-2


@dataclass
class ConstraintConfig:
    pathway_coherence_weight: float = 1.0
    mutation_expression_weight: float = 0.5
    survival_prediction_weight: float = 0.3
    gene_network_weight: float = 0.2
    # Weight of the mutation co-occurrence matching loss (batch
    # correlation matrix vs training cohort). Off by default: measured
    # to not propagate through the diffusion sampling chain at these
    # dims (it acts on x0 predictions over mixed-t batches); it applies
    # to actual model samples for the flow family.
    cooccurrence_weight: float = 0.0
    # Real constraint losses are implemented (the reference stubs them to
    # 0.0 at cvae.py:281-283,300-302). Set False to reproduce the
    # reference's effective behavior exactly.
    enabled: bool = True


@dataclass
class ModelConfig:
    architecture: str = "diffusion"  # diffusion | cvae | flow
    n_genes: Optional[int] = None
    n_genes_mutation: Optional[int] = None
    n_genes_expression: Optional[int] = None
    n_pathways: Optional[int] = None
    n_conditions: Optional[int] = None
    latent_dim: int = 128
    hidden_dims: List[int] = field(default_factory=lambda: [256, 512, 256])
    gnn: GNNConfig = field(default_factory=GNNConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    conditional: bool = True
    condition_on: List[str] = field(
        default_factory=lambda: [
            "survival_time",
            "event_occurred",
            "metastasis_at_diagnosis",
        ]
    )
    constraints: ConstraintConfig = field(default_factory=ConstraintConfig)
    # TPU-specific: computation dtype for the denoiser matmuls. Params
    # stay float32; bfloat16 compute maps onto the MXU natively.
    compute_dtype: str = "bfloat16"
    # Classifier-free guidance: probability of dropping (zeroing) the
    # condition vector per training sample. When > 0 the sampler honors
    # `generation.guidance_scale` (the reference declares guidance_scale
    # but never consumes it, reference config.yaml:120 / generate.py:101).
    cfg_dropout_prob: float = 0.0
    # Learned time-dependent input->output gain skip in the denoiser
    # (see networks.DiffusionDenoiser.input_skip); false = exact
    # reference architecture.
    denoiser_input_skip: bool = True


@dataclass
class AugmentationConfig:
    mixup_alpha: float = 0.2
    pathway_noise: float = 0.05
    cross_cancer_pretrain: bool = False
    pretrain_datasets: List[str] = field(default_factory=list)


@dataclass
class SamplePathFinetuneConfig:
    """Post-training sample-path fine-tuning (training/finetune.py).

    Differentiates through a short DDIM chain and descends the
    co-occurrence matching loss on generated cohorts, anchored by the
    base diffusion loss. Off by default: at n≈100 the copula
    calibration is the statistically efficient joint estimator
    (docs/ROADMAP.md §2); enable when generated mutation structure must
    be model-owned (serving without data_stats, transfer settings).
    Diffusion architecture only; incompatible with the discrete
    (D3PM) mutation head, whose bit draws have no pathwise gradient.
    """

    enabled: bool = False
    steps: int = 300
    ddim_steps: int = 8
    sample_batch: int = 256
    learning_rate: float = 1e-5
    soft_tau: float = 0.1
    cooccurrence_weight: float = 5.0
    anchor_weight: float = 1.0


@dataclass
class TrainingConfig:
    batch_size: int = 16
    num_epochs: int = 2000
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    patience: int = 100
    min_delta: float = 1e-4
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    val_split: float = 0.2
    test_split: float = 0.1
    random_seed: int = 42
    save_dir: str = "./results/checkpoints"
    save_frequency: int = 10
    # Epochs for the cross-cancer pretraining phase (only used when
    # augmentation.cross_cancer_pretrain is on and pretrain_datasets
    # resolve to processed cohorts; the reference declares those keys
    # but never reads them).
    pretrain_epochs: int = 200
    # LR plateau scheduler (reference train.py:176-181).
    lr_plateau_factor: float = 0.5
    lr_plateau_patience: int = 10
    grad_clip_norm: float = 1.0
    # TPU data parallelism: number of mesh devices; None = all available.
    num_devices: Optional[int] = None
    # Epochs fused into one jitted dispatch (training/trainer.py block
    # mode). Per-epoch numerics (batch order, mixup, plateau LR,
    # best-val tracking) are preserved inside the compiled scan; host
    # work (logging, checkpoint writes, early-stop breaks) happens at
    # block boundaries, so early stopping can overshoot by at most
    # k-1 epochs (the best checkpoint is still exact). 1 = reference
    # per-epoch dispatch. On a tunneled TPU the per-epoch host sync is
    # ~0.4-1.2 s, so k=25 cuts 600-epoch training severalfold.
    epochs_per_dispatch: int = 1
    sample_path_finetune: SamplePathFinetuneConfig = field(
        default_factory=SamplePathFinetuneConfig
    )


@dataclass
class CorrelationRule:
    mutation: str
    pathway: str
    direction: str  # positive | negative


@dataclass
class EvaluationConfig:
    mmd_kernel: str = "rbf"
    ks_test_pathways: bool = True
    # KS p-value method: "auto" (exact lattice-path DP when
    # max(n, m) <= 10000, scipy method='exact' switch rule; asymptotic
    # otherwise) | "exact" | "asymp".
    ks_mode: str = "auto"
    check_mutation_cooccurrence: bool = True
    check_pathway_coherence: bool = True
    check_driver_mutations: bool = True
    # Novelty / memorization audit: nearest-neighbor distance ratio and
    # near-duplicate rate of the synthetic cohort vs the real one
    # (closes the reference validator's blind spot — a generator that
    # re-renders training patients scores perfectly on every
    # distributional metric; reference utils/validation.py:300-387
    # never checks it).
    check_novelty: bool = True
    # Size-matched KS: also report the significant fraction on
    # real-size subsamples of the synthetic cohort, where the test has
    # the power the n_real-vs-10k comparison lacks calibration for
    # (the raw fraction reads ~0.6 on healthy cohorts at n=100 vs 10k).
    ks_size_matched_resamples: int = 5
    driver_genes: List[str] = field(
        default_factory=lambda: ["TP53", "RB1", "ATRX", "DLG2", "PTEN"]
    )
    mutually_exclusive_pairs: List[List[str]] = field(
        default_factory=lambda: [["TP53", "MDM2"]]
    )
    required_correlations: List[CorrelationRule] = field(
        default_factory=lambda: [
            CorrelationRule("TP53", "HALLMARK_P53_PATHWAY", "negative"),
            CorrelationRule("MYC", "HALLMARK_MYC_TARGETS_V1", "positive"),
        ]
    )


@dataclass
class Scenario:
    name: str
    conditions: Dict[str, float]


@dataclass
class GenerationConfig:
    num_synthetic_samples: int = 1000
    guidance_scale: float = 7.5
    sampling_steps: int = 50
    # "ddpm" runs the full num_steps ancestral loop (reference default
    # behavior, diffusion.py:446-447); "ddim" honors sampling_steps.
    sampler: str = "ddpm"
    # "fixed" reproduces reference generate.py:66 ((x-800)/500);
    # "train_stats" uses the checkpointed train-time normalization.
    condition_normalization: str = "train_stats"
    # Sample all scenarios in ONE device program (conditions are
    # per-row anyway): bigger batches engage the fused whole-loop
    # kernels and cut dispatch/readback count. Calibration then runs
    # on the combined cohort (matching how validate concatenates
    # scenarios) instead of per scenario. False = reference behavior
    # (one generate call per scenario, generate.py:146-175).
    batch_scenarios: bool = False
    # PRNG inside the reverse-loop scan: "rbg" (TPU hardware generator,
    # ~19x faster in-scan) | "unsafe_rbg" | "threefry" (bit-exact JAX).
    rng_impl: str = "rbg"
    # Reverse-loop state dtype: "bfloat16" (default) halves the HBM
    # traffic of the bandwidth-bound 1000-step sampler; "float32" for
    # exact numerics (cohort statistics agree either way — tested).
    sample_dtype: str = "bfloat16"
    # Per-step transition noise in the DDPM scan: "uniform" (zero-mean
    # unit-variance U(-sqrt3, sqrt3), default) skips the Gaussian
    # erfinv, which costs as much as the denoiser itself at these dims;
    # the final step and the learned-sigma residual stay Gaussian, and
    # through hundreds of composed steps the sampled distribution is
    # CLT-indistinguishable (validated end to end: overall biological
    # score unchanged). "normal" for textbook DDPM noise.
    noise_type: str = "uniform"
    # Fully-fused Pallas DDPM sampler (ops/fused_sampler.py): the whole
    # reverse loop in one kernel, x + weights VMEM-resident. Engages
    # automatically for supported configs on >=4096-sample single-chip
    # cohorts (measured crossover vs the scan path); false forces the
    # lax.scan sampler everywhere.
    fused_sampler: bool = True
    # int8 MXU weights/activations inside the fused kernel: "none"
    # (default), "out" (the N-wide output projection), "io", "all".
    # Measured on v5e: a wash-to-slight-loss for the DDPM kernel (the
    # VPU quantize work serializes against the same critical path the
    # int8 dot shortens) and ~+2% for the deterministic DDIM variant;
    # kept selectable so the measurement is reproducible. Output
    # deviation vs bf16 is ~1-2% RMS (elementwise corr 0.999).
    fused_quantize: str = "none"
    # GroupNorm-statistics mode inside the fused kernel: "bf16"
    # (default, +4.7% whole-kernel throughput; var clamped >= 0
    # against bf16 cancellation) or "f32" (round-2 layout, exact flax
    # GroupNorm parity — select for bit-stable fixed-seed outputs
    # against pre-round-3 goldens/checkpoint artifacts). "merged3"/
    # "merged" are measured-no-better experimental layouts
    # (ops/fused_sampler.py FusedSampler.gn_mode).
    fused_gn_mode: str = "bf16"
    # Loop-interleave mode inside the fused kernel: "none" (default,
    # sequential tile), "staggered" (two half-tiles offset by half a
    # residual block so one half's GN-stats tail overlaps the other
    # half's MXU dots — the round-4 GN-overlap experiment), "pingpong"
    # (two half-tiles alternating whole steps). Selectable so the
    # hardware measurement (scripts/bench_kernel_variants.py,
    # BENCH_VARIANTS.json) is reproducible and a winning variant can be
    # flipped on without code changes.
    fused_interleave: str = "none"
    # Calibration of generated cohorts against the training cohort:
    #   "copula_joint" — one latent-Gaussian factor over the FULL
    #                [mutations | continuous] patient vector (Gram of
    #                per-column scores, exact eigen-whitening, second-
    #                stage tetrachoric re-sharpening of the bits). The
    #                default — fixes the round-2 n=400 cross-block and
    #                coherence regressions: overall 0.839 -> 0.996,
    #                coherence pattern corr 0.48 -> 0.99 (ops/copula.py,
    #                DEMO_N400.json).
    #   "copula_full" — round-2 per-block transplants: mutations via a
    #                tetrachoric latent-Gaussian copula; continuous via
    #                the real rank correlation before quantile mapping.
    #                Kept for comparability (coherence corr 0.36 -> 0.91,
    #                MMD 0.24 -> 0.07 on the 10k full-scale demo).
    #   "copula"   — copula mutations + marginal-only (quantile-mapped)
    #                continuous features
    #   "quantile" — marginals only for both blocks
    #   "moment"   — per-feature mean/std matching only
    #   false      — raw model output (the reference's fixed 0.5 cut,
    #                reference generate.py:135)
    # true is accepted as an alias for the default ("copula_joint",
    # generator.py _CAL_ALIAS).
    calibrate_marginals: Any = "copula_joint"
    # Where the copula calibration pipeline runs:
    #   "auto"   — on the accelerator when one is attached (the whole
    #              whiten/recolor/quantile pass is matmuls+sorts; the
    #              numpy pass costs 4-5 s single-core at the serving
    #              b1024 bucket vs ~2 ms warm on a v5e — see
    #              ops/copula_device.py), numpy on CPU-only backends
    #              and for cohorts beyond the device-path row bound.
    #   "numpy"  — always the host float64 path (ops/copula.py).
    #   "device" — force the XLA path even on CPU (parity tests).
    # Marginals are identical either way (same exact per-gene counts,
    # same real quantile grid); the patient permutation can differ
    # within tie-randomization noise (tests/test_copula_device.py).
    calibration_backend: str = "auto"
    scenarios: List[Scenario] = field(
        default_factory=lambda: [
            Scenario(
                "early_stage_good_prognosis",
                {"survival_time": 2000, "event_occurred": 0, "metastasis_at_diagnosis": 0},
            ),
            Scenario(
                "metastatic_poor_prognosis",
                {"survival_time": 300, "event_occurred": 1, "metastasis_at_diagnosis": 1},
            ),
            Scenario(
                "typical_patient",
                {"survival_time": 800, "event_occurred": 0, "metastasis_at_diagnosis": 0},
            ),
        ]
    )


@dataclass
class OutputConfig:
    results_dir: str = "./results"
    figures_dir: str = "./results/figures"
    models_dir: str = "./results/models"
    synthetic_data_dir: str = "./results/synthetic"
    export_formats: List[str] = field(default_factory=lambda: ["csv"])


@dataclass
class FrozenDims:
    """Static dims frozen from data before jit compilation.

    Mirrors the reference's mutable-config dance (train.py:439-442,
    main.py:126-150) but as an immutable record: jit requires static
    shapes, so dims are discovered once and frozen.
    """

    mutation_dim: int
    expression_dim: int
    pathway_dim: int
    condition_dim: int
    condition_names: List[str] = field(default_factory=list)
    # Train-time normalization stats, persisted so generation can encode
    # scenario conditions consistently (see GenerationConfig).
    survival_mean: float = 800.0
    survival_std: float = 500.0

    @property
    def data_dim(self) -> int:
        return self.mutation_dim + self.expression_dim + self.pathway_dim


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    output: OutputConfig = field(default_factory=OutputConfig)

    # ------------------------------------------------------------------
    # YAML round-trip
    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        return cls(
            data=_build(DataConfig, raw.get("data", {}), {"download": DownloadConfig}),
            model=_build(
                ModelConfig,
                raw.get("model", {}),
                {
                    "gnn": GNNConfig,
                    "diffusion": DiffusionConfig,
                    "constraints": ConstraintConfig,
                },
            ),
            training=_build(
                TrainingConfig,
                raw.get("training", {}),
                {
                    "augmentation": AugmentationConfig,
                    "sample_path_finetune": SamplePathFinetuneConfig,
                },
            ),
            evaluation=_build_evaluation(raw.get("evaluation", {})),
            generation=_build_generation(raw.get("generation", {})),
            output=_build(OutputConfig, raw.get("output", {}), {}),
        )

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    # ------------------------------------------------------------------
    # Dim freezing
    # ------------------------------------------------------------------
    def freeze_dims(
        self,
        mutation_dim: int,
        expression_dim: int,
        pathway_dim: int,
        condition_names: List[str],
        survival_mean: float = 800.0,
        survival_std: float = 500.0,
    ) -> FrozenDims:
        dims = FrozenDims(
            mutation_dim=mutation_dim,
            expression_dim=expression_dim,
            pathway_dim=pathway_dim,
            condition_dim=len(condition_names),
            condition_names=list(condition_names),
            survival_mean=float(survival_mean),
            survival_std=float(survival_std),
        )
        # Mirror back into the config (reference train.py:439-442) so the
        # persisted config_updated.yaml self-describes the checkpoint.
        self.model.n_genes_mutation = mutation_dim
        self.model.n_genes_expression = expression_dim
        self.model.n_pathways = pathway_dim
        self.model.n_conditions = dims.condition_dim
        return dims

    def resolve_condition_columns(self, available_columns: List[str]) -> List[str]:
        """Map ``condition_on`` names onto available clinical columns."""
        resolved = []
        for name in self.model.condition_on:
            col = CONDITION_COLUMN_MAP.get(name, name)
            if col in available_columns:
                resolved.append(col)
        return resolved


def _build(cls, raw: Dict[str, Any], nested: Dict[str, type]):
    """Construct dataclass `cls` from dict, ignoring unknown keys."""
    if not isinstance(raw, dict):
        raw = {}
    known = {f.name for f in dataclasses.fields(cls)}
    kwargs: Dict[str, Any] = {}
    for key, value in raw.items():
        if key not in known:
            continue
        if key in nested and isinstance(value, dict):
            kwargs[key] = _build(nested[key], value, {})
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _build_evaluation(raw: Dict[str, Any]) -> EvaluationConfig:
    cfg = _build(EvaluationConfig, raw, {})
    rules = raw.get("required_correlations")
    if rules is not None:
        cfg.required_correlations = [
            CorrelationRule(r["mutation"], r["pathway"], r["direction"]) for r in rules
        ]
    return cfg


def _build_generation(raw: Dict[str, Any]) -> GenerationConfig:
    cfg = _build(GenerationConfig, raw, {})
    scenarios = raw.get("scenarios")
    if scenarios is not None:
        cfg.scenarios = [
            Scenario(s["name"], dict(s["conditions"])) for s in scenarios
        ]
    return cfg
