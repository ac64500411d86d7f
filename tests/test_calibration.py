"""Marginal calibration of generated cohorts."""

import jax
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.generation.generator import (
    SyntheticPatientGenerator,
)
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion


@pytest.fixture()
def generator_with_stats(rng):
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(
        5, 12, 3,
        ["survival_days_norm", "event_occurred", "metastasis_at_diagnosis"],
    )
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    stats = {
        "feature_mean": np.concatenate(
            [np.full(5, 0.3), np.full(12, 5.0), np.full(3, -1.0)]
        ).astype(np.float32),
        "feature_std": np.concatenate(
            [np.full(5, 0.46), np.full(12, 2.0), np.full(3, 0.5)]
        ).astype(np.float32),
        "mutation_freq": np.array([0.1, 0.3, 0.5, 0.7, 0.9], np.float32),
    }
    return SyntheticPatientGenerator(
        model, params, cfg, dims, data_stats=stats
    )


def test_calibrated_mutation_frequencies(generator_with_stats):
    gen = generator_with_stats
    out = gen.generate(400, {"survival_time": 800}, rng=jax.random.PRNGKey(1))
    freqs = out["mutations"].mean(axis=0)
    np.testing.assert_allclose(
        freqs, gen.data_stats["mutation_freq"], atol=0.05
    )


def test_calibrated_continuous_moments(generator_with_stats):
    gen = generator_with_stats
    out = gen.generate(400, {"survival_time": 800}, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(out["expression"].mean(axis=0), 5.0, atol=0.05)
    np.testing.assert_allclose(out["expression"].std(axis=0), 2.0, atol=0.05)
    np.testing.assert_allclose(out["pathways"].mean(axis=0), -1.0, atol=0.05)


def test_calibration_disabled(generator_with_stats):
    gen = generator_with_stats
    gen.config.generation.calibrate_marginals = False
    out = gen.generate(100, {"survival_time": 800}, rng=jax.random.PRNGKey(1))
    # Raw model output: untrained model samples are ~N-ish around 0, so
    # expression mean is nowhere near the calibrated 5.0.
    assert abs(out["expression"].mean() - 5.0) > 1.0


def test_calibration_preserves_correlations(generator_with_stats):
    gen = generator_with_stats
    out_raw_cfg = gen.config.generation
    out = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    out_raw_cfg.calibrate_marginals = False
    raw = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    out_raw_cfg.calibrate_marginals = True
    # Affine per-feature maps preserve Pearson correlations.
    ce = np.corrcoef(out["expression"].T)
    cr = np.corrcoef(raw["expression"].T)
    np.testing.assert_allclose(ce, cr, atol=1e-3)
