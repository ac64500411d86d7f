"""Synthetic patient generation: scenarios -> conditions -> cohorts.

Capability parity with reference utils/generate.py:19-298:
- scenario dict -> condition tensor with per-feature encoding
  (generate.py:39-94), including the pad/truncate dimension guard
- model sampling, split back into mutations/expression/pathways,
  binarize mutations at 0.5 (generate.py:124-135)
- per-scenario generation loop + CSV writers (generate.py:146-235)
- checkpoint loading that self-configures from metadata
  (vs the reference's weight-shape introspection, generate.py:238-298)

TPU-first: sampling for large cohorts is sharded over the mesh's
`data` axis — each chip runs the scan-compiled reverse loop on its
batch shard, which is the "10k+ synthetic patients across TPU chips"
config in BASELINE.json. Condition normalization defaults to the
checkpointed train stats; set
`generation.condition_normalization: fixed` for the reference's
hard-coded (x-800)/500 (generate.py:66).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import CONDITION_COLUMN_MAP, Config, FrozenDims, Scenario
from ..models.cvae import BiologyConstrainedVAE
from ..models.diffusion import ConditionalDiffusion
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from ..training.checkpoint import CheckpointManager, load_metadata, metadata_to_dims
from ..training.trainer import build_model

logger = logging.getLogger(__name__)


class SyntheticPatientGenerator:
    """Generate synthetic patient cohorts from a trained model."""

    def __init__(
        self,
        model,  # ConditionalDiffusion | BiologyConstrainedVAE
        params,
        config: Config,
        dims: FrozenDims,
        batch_stats=None,
        mesh=None,
        data_stats=None,
    ):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats or {}
        self.config = config
        self.dims = dims
        self.mesh = mesh
        # Training-cohort per-feature stats for marginal calibration
        # (loaded from the checkpoint's data_stats.npz when available).
        self.data_stats = data_stats
        self.is_vae = isinstance(model, BiologyConstrainedVAE)
        # jit cache keyed by (sampler kind, guidance, steps): scenarios
        # share one compiled program instead of re-tracing per call.
        self._sample_fns = {}
        # Fitted mutation copula (freq, corr), continuous-block
        # Cholesky, and joint factor, cached across scenarios.
        self._copula = None
        self._cont_chol = None
        self._joint = None
        self._device_joint_cal = None
        self._device_cont_cal = None
        self._latent_prior = None
        # Fused Pallas samplers (ops/fused_sampler.py), probed lazily
        # per variant; key None = DDPM, int = that many DDIM steps;
        # False = probed and unsupported.
        self._fused_cache = {}
        # OSDM_DUMP_RAW calls this generation (per-scenario dumps get
        # a _s{i} suffix so they don't clobber each other).
        self._dump_count = 0
        # Jitted AR-mutation-head sampler + per-call counter (each
        # _postprocess call folds the counter into its key so the
        # per-scenario loop draws fresh bits).
        self._ar_fn = None
        self._ar_calls = 0

    # ------------------------------------------------------------------
    def create_conditions(
        self, num_samples: int, scenario: Optional[Dict] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Encode a scenario dict into a (num_samples, C) condition batch.

        Feature encoding mirrors reference generate.py:56-94, with
        survival normalization selected by config (train stats vs the
        reference's fixed (x-800)/500).
        """
        cdim = self.dims.condition_dim
        if scenario is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            return jax.random.normal(rng, (num_samples, cdim), jnp.float32)

        if self.config.generation.condition_normalization == "fixed":
            s_mean, s_std = 800.0, 500.0
        else:
            s_mean, s_std = self.dims.survival_mean, self.dims.survival_std

        values: List[float] = []
        for cond_name in self.config.model.condition_on:
            if cond_name == "survival_time":
                values.append(
                    (scenario.get("survival_time", 800) - s_mean) / s_std
                )
            elif cond_name == "event_occurred":
                values.append(float(scenario.get("event_occurred", 0)))
            elif cond_name == "age":
                values.append(float(scenario.get("age", 15.0)))
            elif cond_name == "metastasis_at_diagnosis":
                values.append(float(scenario.get("metastasis_at_diagnosis", 0)))
            else:
                values.append(float(scenario.get(cond_name, 0.0)))

        if len(values) != cdim:
            logger.warning(
                "Condition mismatch: expected %d, got %d — padding/truncating",
                cdim, len(values),
            )
            values = (values + [0.0] * cdim)[:cdim]

        row = np.asarray(values, np.float32)
        return jnp.asarray(np.tile(row, (num_samples, 1)))

    # ------------------------------------------------------------------
    def _get_fused(self, params, ddim_steps=None):
        """Probe + cache the fused whole-loop sampler for a variant
        (None = DDPM, int = strided DDIM); False when the config or
        backend doesn't support it."""
        if ddim_steps not in self._fused_cache:
            from ..ops.fused_sampler import maybe_fused_sampler

            quant = getattr(self.config.generation, "fused_quantize", "none")
            il = getattr(self.config.generation, "fused_interleave", "none")
            self._fused_cache[ddim_steps] = (
                maybe_fused_sampler(
                    self.model, params, ddim_steps=ddim_steps,
                    quantize=None if quant in ("none", None) else quant,
                    gn_mode=getattr(
                        self.config.generation, "fused_gn_mode", "bf16"
                    ),
                    interleave=False if il in ("none", None) else il,
                )
                or False
            )
            logger.info(
                "Fused Pallas %s sampler: %s",
                f"DDIM-{ddim_steps}" if ddim_steps else "DDPM",
                "engaged" if self._fused_cache[ddim_steps] else
                "unsupported config, using scan sampler",
            )
        return self._fused_cache[ddim_steps]

    def _latent_prior_draw(
        self, num_samples: int, rng: jax.Array
    ) -> jnp.ndarray:
        """Draw latent factors from the Gaussian prior fitted on the
        training cohort's encoded latents (models/diffusion.py
        latent_factor_dim)."""
        if self._latent_prior is None:
            real = jnp.asarray(np.asarray(self.data_stats["data_matrix"]))
            h = np.asarray(self.model.encode_latents(self.params, real))
            mu = h.mean(axis=0)
            cov = np.cov(h, rowvar=False, bias=True)
            cov = np.atleast_2d(cov) + 1e-6 * np.eye(h.shape[1])
            self._latent_prior = (
                jnp.asarray(mu, jnp.float32),
                jnp.asarray(np.linalg.cholesky(cov), jnp.float32),
            )
            logger.info(
                "Latent-factor prior fitted on %d cohort latents (k=%d)",
                h.shape[0], h.shape[1],
            )
        mu, chol = self._latent_prior
        z = jax.random.normal(rng, (num_samples, mu.shape[0]), jnp.float32)
        return mu[None, :] + z @ chol.T

    def _sample_raw(
        self, conditions: jnp.ndarray, rng: jax.Array
    ) -> jnp.ndarray:
        gen = self.config.generation
        if getattr(self.model, "latent_factor_dim", 0) > 0:
            if self.data_stats is None or "data_matrix" not in self.data_stats:
                # Without the cohort matrix the latent prior cannot be
                # fitted; silently skipping used to surface later as an
                # opaque condition-width mismatch inside the denoiser
                # (round-3 ADVICE).
                raise ValueError(
                    "This checkpoint was trained with latent_factor_dim="
                    f"{self.model.latent_factor_dim} but the generator has "
                    "no data_stats['data_matrix'] to fit the latent prior "
                    "on. Pass the training cohort stats (saved next to the "
                    "checkpoint as data_stats.npz) to the generator."
                )
            rng, h_rng = jax.random.split(rng)
            h = self._latent_prior_draw(conditions.shape[0], h_rng)
            conditions = jnp.concatenate(
                [conditions, h.astype(conditions.dtype)], axis=1
            )
        if self.mesh is not None:
            conditions = jax.device_put(conditions, batch_sharding(self.mesh))
            params = jax.device_put(self.params, replicated(self.mesh))
        else:
            params = self.params

        if self.is_vae:
            key = ("cvae",)
            if key not in self._sample_fns:
                self._sample_fns[key] = jax.jit(
                    lambda p, bs, c, k: self.model.sample(p, bs, c, k)
                )
            return self._sample_fns[key](params, self.batch_stats,
                                         conditions, rng)

        if not isinstance(self.model, ConditionalDiffusion):
            # Flow (or any model exposing sample(params, cond, rng)).
            key = ("plain",)
            if key not in self._sample_fns:
                self._sample_fns[key] = jax.jit(
                    lambda p, c, k: self.model.sample(p, c, k)
                )
            return self._sample_fns[key](params, conditions, rng)

        # Honor guidance_scale only when the model was trained with
        # condition dropout (otherwise CFG is meaningless; the reference
        # declares the knob but never consumes it).
        guidance = (
            gen.guidance_scale if self.model.cfg_dropout_prob > 0 else 1.0
        )
        n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        if gen.sampler == "ddim":
            # Deterministic (eta=0) DDIM also has a fused whole-loop
            # kernel variant — same VMEM-resident design, no per-step
            # noise. Measured crossover vs the scan path ~8k/device
            # (scan wins below: more grid cells per step let XLA use
            # the whole chip; fused peaks 206k patients/sec at 131k).
            if (
                gen.fused_sampler
                and guidance == 1.0
                and conditions.shape[0] >= 8192 * n_data
            ):
                fused = self._get_fused(params, ddim_steps=gen.sampling_steps)
                if fused is not False:
                    if self.mesh is not None:
                        return fused.sample_sharded(self.mesh, conditions, rng)
                    return fused.sample(conditions, rng)
            key = ("ddim", guidance, gen.sampling_steps)
            if key not in self._sample_fns:
                steps, g = gen.sampling_steps, guidance
                self._sample_fns[key] = jax.jit(
                    lambda p, c, k: self.model.sample_ddim(
                        p, c, k, num_sampling_steps=steps, guidance_scale=g
                    )
                )
        else:
            # Fused whole-loop Pallas kernel for large cohorts
            # (measured crossover vs the scan path ~4k/device; the
            # kernel keeps x + all weights VMEM-resident across the
            # full reverse loop). Under a mesh it runs shard_map'd over
            # the `data` axis. CFG cohorts use the scan path.
            if (
                gen.fused_sampler
                and guidance == 1.0
                and conditions.shape[0] >= 4096 * n_data
            ):
                fused = self._get_fused(params)
                if fused is not False:
                    # Calibration rewrites values from ranks, and the
                    # kernel carry is bf16-precision anyway — halve the
                    # device->host readback (the measured warm-generate
                    # bottleneck on the tunneled backend).
                    bf16_out = bool(
                        self.config.generation.calibrate_marginals
                        and self.data_stats is not None
                    )
                    if self.mesh is not None:
                        return fused.sample_sharded(
                            self.mesh, conditions, rng, keep_bf16=bf16_out
                        )
                    return fused.sample(conditions, rng, keep_bf16=bf16_out)
            key = ("ddpm", guidance)
            if key not in self._sample_fns:
                g = guidance
                self._sample_fns[key] = jax.jit(
                    lambda p, c, k: self.model.sample(p, c, k, guidance_scale=g)
                )
        return self._sample_fns[key](params, conditions, rng)

    def generate(
        self,
        num_samples: int,
        scenario: Optional[Dict] = None,
        rng: Optional[jax.Array] = None,
        guidance_scale: float = 1.0,
    ) -> Dict[str, np.ndarray]:
        """Generate one cohort and split into modality blocks."""
        del guidance_scale  # accepted for API parity (generate.py:101)
        if rng is None:
            rng = jax.random.PRNGKey(self.config.training.random_seed)
        logger.info("Generating %d synthetic patients...", num_samples)

        cond_rng, sample_rng = jax.random.split(rng)
        conditions = self.create_conditions(num_samples, scenario, cond_rng)
        samples = jax.block_until_ready(
            self._sample_raw(conditions, sample_rng)
        )
        if not self._device_calibration_enabled(samples.shape[0]):
            # Host path (incl. sharded output — the predicate is False
            # under a mesh): materialize once here, as before. The
            # device-calibration path keeps the cohort on the
            # accelerator end to end — raw samples never cross
            # device->host (measured ~5 MB/s on the tunneled backend;
            # 21 MB at b1024).
            samples = np.asarray(samples)
        # fold_in (not a further split) so cond/sample key streams are
        # unchanged for existing checkpoints/seeds; the post key makes
        # the AR mutation draw a pure function of the caller's rng.
        return self._postprocess(
            samples, conditions, rng=jax.random.fold_in(rng, 424_243)
        )

    def _postprocess(
        self, samples: np.ndarray, conditions, rng=None
    ) -> Dict[str, np.ndarray]:
        """Calibrate (per config) and split a raw sample matrix into
        modality blocks (reference generate.py:130-144)."""
        import os

        if samples.dtype != np.float32:
            # bf16 readback (fused path with calibration on) — widen
            # once on host; values are identical (the kernel carry is
            # bf16-precision regardless of the transfer dtype).
            samples = samples.astype(np.float32)
        if os.environ.get("OSDM_DUMP_RAW"):
            # Debug hook: persist the pre-calibration model outputs so
            # calibration variants can be replayed host-side without
            # re-running the sampler (doctor-style diagnostics). With
            # batch_scenarios off, _postprocess runs once per scenario —
            # suffix repeat calls so the per-scenario loop cannot
            # clobber earlier dumps (replay scripts read the base path,
            # i.e. the first/batched cohort).
            dump = Path(os.environ["OSDM_DUMP_RAW"])
            n_prev = self._dump_count
            self._dump_count += 1
            if n_prev:
                dump = dump.with_name(
                    f"{dump.name[:-4] if dump.name.endswith('.npz') else dump.name}"
                    f"_s{n_prev}.npz"
                )
            dump.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                dump, samples=samples, conditions=np.asarray(conditions)
            )
            logger.info("Raw samples dumped to %s", dump)
        m, e = self.dims.mutation_dim, self.dims.expression_dim
        mode = self.config.generation.calibrate_marginals
        if mode is True:
            mode = "copula_joint"
        calibrate = (
            bool(mode) and self.data_stats is not None and samples.shape[0] > 1
        )
        if calibrate:
            mutations, continuous = self._calibrate(samples, m, str(mode))
        else:
            mutations = (samples[:, :m] > 0.5).astype(np.float32)  # generate.py:135
            continuous = samples[:, m:]
        if (
            getattr(self.model, "ar_head", False)
            and m > 0
            and samples.shape[0] > 0
        ):
            # The AR head owns the mutation block: sequential FVSBN
            # draw conditioned on the (calibrated, when calibration is
            # on) continuous block + clinical scenario — model-owned
            # joint structure instead of the 0.5 threshold / copula
            # transplant above.
            mutations = self._ar_bits(continuous, np.asarray(conditions), rng)
        return {
            "mutations": mutations,
            "expression": continuous[:, :e],
            "pathways": continuous[:, e:],
            "conditions": np.asarray(conditions),
        }

    def _ar_bits(
        self, continuous: np.ndarray, conditions: np.ndarray, rng=None
    ):
        """Draw the mutation bits from the AR head (jit-cached).

        With an explicit ``rng`` the draw is a pure function of it
        (same rng -> same cohort, generate()'s reproducibility
        contract); the counter-folded fallback keeps direct callers'
        per-call freshness when no key is threaded.

        Only the context columns the head actually reads are shipped to
        the device: at ar_context='pathways' that is ~26 of ~5080
        continuous columns — the full block would be a ~2.7 GB
        host->single-device transfer at the 131k fused-sampler cohort.
        """
        if rng is None:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.config.training.random_seed + 977),
                self._ar_calls,
            )
            self._ar_calls += 1
        if self.model.ar_context == "pathways" and self.model.pathway_dim > 0:
            # ar_sample's context view slices the LAST pathway_dim
            # columns of whatever continuous block it receives, so
            # passing just the pathway block is view-equivalent.
            ctx_cont = continuous[:, -self.model.pathway_dim:]
        elif self.model.ar_context == "none":
            ctx_cont = continuous[:, :0]  # batch dim only
        else:
            ctx_cont = continuous
        if self._ar_fn is None:
            self._ar_fn = jax.jit(
                lambda p, k, cont, cond: self.model.ar_sample(
                    p, k, cont, cond
                )
            )
        bits = self._ar_fn(
            self.params, rng,
            jnp.asarray(ctx_cont, jnp.float32),
            jnp.asarray(conditions, jnp.float32),
        )
        return np.asarray(bits, np.float32)

    def _calibrate(self, samples: np.ndarray, m: int, mode: str):
        """Marginal calibration against the training cohort.

        Mutations: by mode —
        - "copula_joint" (default): ONE latent-Gaussian factor over the
          full [mutations | expression | pathways] vector — a Gram
          target (PSD by construction at n << D) whose cross block is
          the attenuated polyserial structure (preserves
          mutation<->pathway coupling that separate transplants
          garble), transplanted with exact eigen-whitening (ridge
          whitening measurably leaks the denoiser's own within-pathway
          coherence into the recolor), then a second-stage 62-dim
          exact-tetrachoric transplant sharpens the mutation bits.
          See ops/copula.py fit_joint_copula/joint_transplant. With
          the discrete mutation head, the model owns the bits and the
          continuous block falls back to "copula_full" behavior.
        - "copula": latent-Gaussian copula fitted on the real cohort's
          binary mutation block (tetrachoric correlation) and
          transplanted onto the raw scores, so pairwise co-occurrence /
          mutual-exclusivity structure matches the data along with the
          per-gene frequencies (ops/copula.py)
        - otherwise: per-gene quantile threshold so the synthetic
          mutation frequency matches the real frequency (a monotone
          transform of the raw scores, replacing the fixed 0.5 cut)
        Continuous features:
        - "copula_full": the real cohort's latent-Gaussian (rank)
          correlation is transplanted onto the continuous block before
          quantile mapping, so within-pathway co-expression and
          cross-feature structure match the data (ops/copula.py
          fit_continuous_copula_chol / gaussian_transplant)
        - "copula"/"quantile": full empirical quantile mapping — each
          synthetic value is replaced by the real quantile at its
          within-cohort rank (marginals match exactly, rank-based
          dependence preserved)
        - "moment": per-feature mean/std matching — corrects the
          variance shrinkage a mean-seeking denoiser induces
        All are per-feature monotone maps except the copula blocks,
        which deliberately reshape the joint.
        """
        stats = self.data_stats
        use_device = self._device_calibration_enabled(samples.shape[0])
        raw_mut = samples[:, :m]
        if (
            mode == "copula_joint"
            and not getattr(self.model, "discrete_head", False)
            and not getattr(self.model, "ar_head", False)
            and "mutation_matrix" in stats
            and "data_matrix" in stats
            and samples.shape[0] > 2
            and m > 1
        ):
            # One latent-Gaussian factor over the FULL patient vector:
            # the Gram of per-column scores (standardized bits + normal
            # scores) transplanted by exact eigen-whitening, then a
            # second-stage exact-tetrachoric re-sharpening of the bits;
            # the continuous marginals are empirically quantile-mapped
            # afterwards (ops/copula.py; the elementwise Hermite/
            # polyserial latent machinery there is a small-D diagnostic
            # tool — measured non-PSD at n << D, see ROADMAP).
            # Fixes the two n=400 regressions of separate transplants:
            # garbled mutation<->pathway coupling and Pearson coherence
            # inflation after quantile mapping (round-2 DEMO_N400).
            from ..ops.copula import fit_joint_copula, joint_transplant

            if self._joint is None:
                real = np.asarray(stats["data_matrix"])
                self._joint = fit_joint_copula(real[:, :m], real[:, m:])
                logger.info(
                    "Joint copula fitted (shrink=%.3g)", self._joint[3]
                )
            freq, chol, tetra, _ = self._joint
            if use_device:
                # Same estimator, on the accelerator: the whole
                # whiten/recolor/tetra/quantile pass is one XLA program
                # and the raw cohort never crosses device->host
                # (ops/copula_device.py; ~2 ms warm vs 4-5 s numpy at
                # the serving b1024 bucket).
                cal = self._get_device_joint_cal(freq, chol, tetra, m)
                return cal.joint(samples, self._tie_seed())
            mutations, cont = joint_transplant(
                np.asarray(samples), chol, freq, m, tetra=tetra,
                tie_rng=np.random.default_rng(self._tie_seed()),
            )
            return mutations, self._quantile_map_continuous(cont, m)
        if getattr(self.model, "discrete_head", False) or getattr(
            self.model, "ar_head", False
        ):
            # The binary D3PM / AR head owns the mutation block:
            # calibration must not overwrite the model's joint mutation
            # structure. (With the AR head these thresholded scores are
            # a placeholder — _postprocess replaces them with the
            # sequential AR draw conditioned on the calibrated
            # continuous block.)
            mutations = (raw_mut > 0.5).astype(np.float32)
        elif (
            mode in ("copula", "copula_full", "copula_joint")
            and "mutation_matrix" in stats
            and raw_mut.shape[0] > 2
            and m > 1
        ):
            from ..ops.copula import correlation_transplant, fit_binary_copula

            if self._copula is None:
                self._copula = fit_binary_copula(
                    np.asarray(stats["mutation_matrix"])
                )
            freq, corr = self._copula
            mutations = correlation_transplant(
                raw_mut, corr, freq,
                rng=np.random.default_rng(self._tie_seed()),
            )
        else:
            freq = np.clip(
                np.asarray(stats["mutation_freq"], np.float64), 0.0, 1.0
            )
            thresholds = np.quantile(raw_mut, 1.0 - freq, axis=0).diagonal()
            mutations = (raw_mut > thresholds[None, :]).astype(np.float32)

        cont = samples[:, m:]
        if (
            mode in ("copula_full", "copula_joint")
            and "data_matrix" in stats
            and cont.shape[0] > 2
            and cont.shape[1] > 1
        ):
            # Rank source becomes the recolored Gaussian: the quantile
            # map below then imprints the real joint, not just marginals.
            from ..ops.copula import (
                fit_continuous_copula_chol,
                gaussian_transplant,
            )

            if self._cont_chol is None:
                self._cont_chol = fit_continuous_copula_chol(
                    np.asarray(stats["data_matrix"])[:, m:]
                )
            if use_device:
                cal = self._get_device_cont_cal(m)
                return np.asarray(mutations), cal.continuous(
                    cont, self._tie_seed()
                )
            cont = gaussian_transplant(
                np.asarray(cont), self._cont_chol,
                tie_rng=np.random.default_rng(self._tie_seed()),
            )
        return np.asarray(mutations), self._quantile_map_continuous(
            np.asarray(cont), m, mode
        )

    def _tie_seed(self) -> int:
        """Deterministic seed for rank tie-breaking: bf16 kernel
        readback leaves ~95% exact-tie values per column at 10k
        cohorts; ties must break randomly (not by row order) but
        reproducibly for a fixed generation seed."""
        return int(self.config.training.random_seed) + 104729

    def _device_calibration_enabled(self, n: int) -> bool:
        """True when _calibrate will take the device-resident XLA path
        (ops/copula_device.py) for an n-row cohort.

        generation.calibration_backend: "auto" engages it off-CPU for
        cohorts big enough that the host pass dominates (and within
        the dual-whitening N x N Gram bound); "device" forces it (CPU
        parity tests); "numpy" disables it. Requires the quantile grid
        + real cohort in data_stats (same condition as the numpy
        copula paths)."""
        if self.mesh is not None:
            # Sharded outputs are materialized host-side in generate();
            # taking the device path here would re-upload the cohort it
            # just read back (host->device->host round trip on the slow
            # link) — the numpy path is strictly cheaper.
            return False
        mode = self.config.generation.calibrate_marginals
        if mode is True:
            mode = "copula_joint"
        stats = self.data_stats
        if not mode or stats is None or n <= 2:
            return False
        if str(mode) not in ("copula_joint", "copula_full"):
            return False
        if "feature_sorted" not in stats or "data_matrix" not in stats:
            return False
        backend = getattr(
            self.config.generation, "calibration_backend", "auto"
        )
        if backend == "numpy":
            return False
        from ..ops.copula_device import DeviceCalibrator

        if not DeviceCalibrator.accepts(n):
            return False
        if backend == "device":
            return True
        return jax.default_backend() != "cpu" and n >= 256

    def _get_device_joint_cal(self, freq, chol, tetra, m: int):
        if self._device_joint_cal is None:
            from ..ops.copula_device import DeviceCalibrator

            sorted_real = np.asarray(
                self.data_stats["feature_sorted"], np.float32
            )[:, m:]
            self._device_joint_cal = DeviceCalibrator(
                m, sorted_real, freq=freq, joint_chol=chol, tetra=tetra
            )
            logger.info(
                "Device-resident joint calibration engaged "
                "(backend=%s)", jax.default_backend()
            )
        return self._device_joint_cal

    def _get_device_cont_cal(self, m: int):
        if self._device_cont_cal is None:
            from ..ops.copula_device import DeviceCalibrator

            sorted_real = np.asarray(
                self.data_stats["feature_sorted"], np.float32
            )[:, m:]
            self._device_cont_cal = DeviceCalibrator(
                m, sorted_real, cont_chol=self._cont_chol
            )
            logger.info(
                "Device-resident continuous calibration engaged "
                "(backend=%s)", jax.default_backend()
            )
        return self._device_cont_cal

    def _quantile_map_continuous(
        self, cont: np.ndarray, m: int, mode: str = "copula_joint"
    ) -> np.ndarray:
        """Map the continuous block's within-cohort ranks onto the real
        per-feature quantile grid (or moment-match when the sorted
        grid is unavailable)."""
        stats = self.data_stats
        if (
            mode in ("quantile", "copula", "copula_full", "copula_joint")
            and "feature_sorted" in stats
        ):
            sorted_real = np.asarray(
                stats["feature_sorted"], np.float32
            )[:, m:]  # (n_real, D_cont), per-feature quantile function
            n_real = sorted_real.shape[0]
            # Within-cohort ranks -> positions on the real quantile grid.
            order = np.argsort(cont, axis=0)
            ranks = np.empty_like(order)
            rows = np.arange(cont.shape[0])[:, None]
            np.put_along_axis(ranks, order, rows, axis=0)
            p = (ranks + 0.5) / cont.shape[0]
            pos = p * (n_real - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, n_real - 1)
            frac = (pos - lo).astype(np.float32)
            low_vals = np.take_along_axis(sorted_real, lo, axis=0)
            high_vals = np.take_along_axis(sorted_real, hi, axis=0)
            continuous = low_vals * (1.0 - frac) + high_vals * frac
        else:
            real_mean = np.asarray(stats["feature_mean"], np.float32)[m:]
            real_std = np.asarray(stats["feature_std"], np.float32)[m:]
            synth_mean = cont.mean(axis=0)
            synth_std = cont.std(axis=0)
            scale = np.where(
                synth_std > 1e-6, real_std / np.maximum(synth_std, 1e-6), 1.0
            )
            continuous = (cont - synth_mean) * scale + real_mean
        return continuous.astype(np.float32)

    def generate_scenarios(
        self,
        scenarios: List[Scenario],
        samples_per_scenario: int,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        if rng is None:
            rng = jax.random.PRNGKey(self.config.training.random_seed)
        if self.config.generation.batch_scenarios and len(scenarios) > 1:
            return self._generate_scenarios_batched(
                scenarios, samples_per_scenario, rng
            )
        results = {}
        for i, scenario in enumerate(scenarios):
            logger.info("Scenario: %s", scenario.name)
            results[scenario.name] = self.generate(
                samples_per_scenario,
                scenario.conditions,
                jax.random.fold_in(rng, i),
            )
        return results

    def _generate_scenarios_batched(
        self,
        scenarios: List[Scenario],
        samples_per_scenario: int,
        rng: jax.Array,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """All scenarios in ONE device program (generation.batch_scenarios).

        Conditions are per-row, so scenario cohorts concatenate into a
        single sampler call — big enough to engage the fused whole-loop
        kernels and paying one dispatch/readback instead of one per
        scenario. Condition streams match the unbatched path exactly
        (same per-scenario fold/split); the sample stream is one draw.
        Calibration runs on the combined cohort, matching how the
        validate step concatenates scenarios (reference main.py:315-317).
        """
        conds = []
        for i, scenario in enumerate(scenarios):
            cond_rng, _ = jax.random.split(jax.random.fold_in(rng, i))
            conds.append(
                self.create_conditions(
                    samples_per_scenario, scenario.conditions, cond_rng
                )
            )
        all_cond = jnp.concatenate(conds, axis=0)
        logger.info(
            "Generating %d synthetic patients (%d scenarios in one batch)...",
            all_cond.shape[0], len(scenarios),
        )
        samples = jax.block_until_ready(
            self._sample_raw(all_cond, jax.random.fold_in(rng, 10_000))
        )
        if not self._device_calibration_enabled(samples.shape[0]):
            samples = np.asarray(samples)
        combined = self._postprocess(
            samples, all_cond, rng=jax.random.fold_in(rng, 10_001)
        )
        results = {}
        for i, scenario in enumerate(scenarios):
            sl = slice(i * samples_per_scenario, (i + 1) * samples_per_scenario)
            results[scenario.name] = {k: v[sl] for k, v in combined.items()}
        return results

    # ------------------------------------------------------------------
    def save_synthetic_data(
        self,
        synthetic_data: Dict[str, np.ndarray],
        output_dir: str | Path,
        gene_names: Dict[str, List[str]],
        prefix: str = "synthetic",
    ) -> None:
        """Write per-modality tables in the configured export formats
        (csv always; h5/pickle honored when configured, unlike the
        reference which lists them in config but only writes CSV)."""
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        formats = [f.lower() for f in self.config.output.export_formats] or ["csv"]

        tables = {}
        if "mutation_genes" in gene_names:
            tables["mutations"] = pd.DataFrame(
                synthetic_data["mutations"], columns=gene_names["mutation_genes"]
            )
        if "expression_genes" in gene_names:
            tables["expression"] = pd.DataFrame(
                synthetic_data["expression"], columns=gene_names["expression_genes"]
            )
        if "pathway_names" in gene_names:
            tables["pathways"] = pd.DataFrame(
                synthetic_data["pathways"], columns=gene_names["pathway_names"]
            )
        cond_cols = self.dims.condition_names or self.config.model.condition_on
        tables["conditions"] = pd.DataFrame(
            synthetic_data["conditions"], columns=cond_cols
        )

        for name, df in tables.items():
            base = output_dir / f"{prefix}_{name}"
            if "csv" in formats:
                from ..utils.io import write_matrix_csv

                write_matrix_csv(df, base.with_suffix(".csv"), index=False)
            if "pickle" in formats:
                df.to_pickle(base.with_suffix(".pkl"))
            if "h5" in formats:
                try:
                    df.to_hdf(base.with_suffix(".h5"), key=name, mode="w")
                except ImportError:
                    # pytables unavailable: fall back to compressed npz.
                    np.savez_compressed(
                        base.with_suffix(".npz"), values=df.values,
                        columns=np.asarray(df.columns, dtype=object),
                    )
            logger.info("Saved %s (%s)", base.name, ", ".join(formats))


def load_trained_model(
    checkpoint_dir: str | Path,
    config: Optional[Config] = None,
    checkpoint_name: str = "best_model",
):
    """Rebuild model + restore params from an Orbax checkpoint directory.

    The checkpoint's metadata.json provides dims/condition names and the
    training-time config, so no weight-shape introspection is needed
    (cf. reference generate.py:247-260 re-reading CSVs for dims).

    Returns (model, params, batch_stats, config, dims).
    """
    checkpoint_dir = Path(checkpoint_dir)
    meta = load_metadata(checkpoint_dir)
    if meta is None:
        raise FileNotFoundError(
            f"No metadata.json in {checkpoint_dir}; cannot self-configure"
        )
    dims = metadata_to_dims(meta)
    meta_config = Config.from_dict(meta["config"])
    if config is None:
        config = meta_config
    else:
        # The architecture is authoritative from the checkpoint: the
        # restored weights were trained with it, and any drifted yaml
        # (e.g. a stale config_updated.yaml from a later experiment)
        # would rebuild a mismatched model. Generation/output/eval
        # sections stay with the invoking config.
        config.model = meta_config.model

    model = build_model(config, dims)
    manager = CheckpointManager(checkpoint_dir)

    rng = jax.random.PRNGKey(0)
    if isinstance(model, BiologyConstrainedVAE):
        variables = model.init_variables(rng, dims.condition_dim)
        abstract = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }
    else:
        abstract = {
            "params": model.init_params(rng, dims.condition_dim),
            "batch_stats": {},
        }

    restored = manager.restore(checkpoint_name)
    params = _match_tree(abstract["params"], restored["params"])
    batch_stats = restored.get("batch_stats", {})
    logger.info("Loaded checkpoint %s", checkpoint_dir / checkpoint_name)
    return model, params, batch_stats, config, dims


def _match_tree(abstract, restored):
    """Cast a restored pytree's leaves onto the abstract tree's dtypes."""
    return jax.tree_util.tree_map(
        lambda a, r: jnp.asarray(r, dtype=a.dtype), abstract, restored
    )
