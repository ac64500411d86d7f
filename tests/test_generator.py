"""Generator: scenario condition encoding, splitting, binarization.

Parity targets: reference utils/generate.py:39-144.
"""

import jax
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.generation.generator import (
    SyntheticPatientGenerator,
)
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion


@pytest.fixture(scope="module")
def generator():
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.generation.condition_normalization = "fixed"
    dims = cfg.freeze_dims(5, 12, 3, ["survival_days_norm", "event_occurred",
                                      "metastasis_at_diagnosis"],
                           survival_mean=900.0, survival_std=400.0)
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return SyntheticPatientGenerator(model, params, cfg, dims)


def test_fixed_condition_encoding(generator):
    # Reference hard-codes (x - 800) / 500 (generate.py:66).
    cond = generator.create_conditions(
        4, {"survival_time": 1300, "event_occurred": 1,
            "metastasis_at_diagnosis": 0},
    )
    assert cond.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(cond[0]), [1.0, 1.0, 0.0], atol=1e-6)
    # All rows identical.
    assert np.all(np.asarray(cond) == np.asarray(cond[0]))


def test_train_stats_condition_encoding(generator):
    generator.config.generation.condition_normalization = "train_stats"
    try:
        cond = generator.create_conditions(2, {"survival_time": 1300})
        np.testing.assert_allclose(float(cond[0, 0]), (1300 - 900) / 400,
                                   atol=1e-6)
    finally:
        generator.config.generation.condition_normalization = "fixed"


def test_condition_defaults(generator):
    cond = np.asarray(generator.create_conditions(1, {}))
    # Defaults: survival 800 -> 0 under fixed norm; event 0; metastasis 0.
    np.testing.assert_allclose(cond[0], [0.0, 0.0, 0.0], atol=1e-6)


def test_random_conditions_without_scenario(generator):
    cond = generator.create_conditions(16, None, rng=jax.random.PRNGKey(1))
    assert cond.shape == (16, 3)
    assert float(np.std(np.asarray(cond))) > 0.1


def test_generate_splits_and_binarizes(generator):
    out = generator.generate(6, {"survival_time": 800},
                             rng=jax.random.PRNGKey(0))
    assert out["mutations"].shape == (6, 5)
    assert out["expression"].shape == (6, 12)
    assert out["pathways"].shape == (6, 3)
    assert set(np.unique(out["mutations"])) <= {0.0, 1.0}
    assert out["conditions"].shape == (6, 3)


def test_ddim_path(generator):
    generator.config.generation.sampler = "ddim"
    generator.config.generation.sampling_steps = 3
    try:
        out = generator.generate(4, {"survival_time": 800},
                                 rng=jax.random.PRNGKey(0))
        assert out["expression"].shape == (4, 12)
        assert np.all(np.isfinite(out["expression"]))
    finally:
        generator.config.generation.sampler = "ddpm"


def test_batched_scenarios_matches_unbatched_conditions(generator):
    """generation.batch_scenarios: one device program for all
    scenarios. Per-scenario condition encodings must be identical to
    the unbatched path; outputs keep per-scenario shapes."""
    from osteosarcoma_diffusionmodel_tpu.config import Scenario

    scenarios = [
        Scenario("a", {"survival_time": 300, "event_occurred": 1,
                       "metastasis_at_diagnosis": 1}),
        Scenario("b", {"survival_time": 1500, "event_occurred": 0,
                       "metastasis_at_diagnosis": 0}),
        Scenario("c", {"survival_time": 800}),
    ]
    rng = jax.random.PRNGKey(3)
    generator.config.generation.batch_scenarios = False
    try:
        plain = generator.generate_scenarios(scenarios, 6, rng)
        generator.config.generation.batch_scenarios = True
        batched = generator.generate_scenarios(scenarios, 6, rng)
    finally:
        generator.config.generation.batch_scenarios = False

    assert set(batched) == {"a", "b", "c"}
    for name in batched:
        for k in ("mutations", "expression", "pathways", "conditions"):
            assert batched[name][k].shape == plain[name][k].shape
        # Condition streams are derived identically in both paths.
        np.testing.assert_allclose(
            batched[name]["conditions"], plain[name]["conditions"],
            atol=1e-6,
        )
        assert set(np.unique(batched[name]["mutations"])) <= {0.0, 1.0}


def test_dump_raw_per_scenario_suffix(generator, tmp_path, monkeypatch):
    """OSDM_DUMP_RAW must not clobber earlier dumps when _postprocess
    runs once per scenario (batch_scenarios: false): repeat calls get
    an _s{i} suffix while the first/batched cohort keeps the base path
    the replay scripts read."""
    base = tmp_path / "raw.npz"
    monkeypatch.setenv("OSDM_DUMP_RAW", str(base))
    generator._dump_count = 0
    d = generator.dims.data_dim
    s1 = np.random.default_rng(0).normal(size=(4, d)).astype(np.float32)
    s2 = np.random.default_rng(1).normal(size=(4, d)).astype(np.float32)
    cond = np.zeros((4, generator.dims.condition_dim), np.float32)
    generator._postprocess(s1, cond)
    generator._postprocess(s2, cond)
    assert base.exists()
    assert (tmp_path / "raw_s1.npz").exists()
    np.testing.assert_array_equal(np.load(base)["samples"], s1)
    np.testing.assert_array_equal(
        np.load(tmp_path / "raw_s1.npz")["samples"], s2
    )


def test_fused_gn_mode_plumbs_from_config(monkeypatch):
    """generation.fused_gn_mode reaches maybe_fused_sampler (round-3
    ADVICE: production had no config path back to the exact-parity f32
    GroupNorm stats after the bf16 default change)."""
    from osteosarcoma_diffusionmodel_tpu.ops import fused_sampler as fs

    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.generation.fused_gn_mode = "f32"
    cfg.generation.fused_quantize = "out"
    cfg.generation.fused_interleave = "staggered"
    dims = cfg.freeze_dims(5, 12, 3, ["survival_days_norm",
                                      "event_occurred",
                                      "metastasis_at_diagnosis"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    gen = SyntheticPatientGenerator(model, params, cfg, dims)

    seen = {}

    def fake_maybe(model, params, **kw):
        seen.update(kw)
        return None

    monkeypatch.setattr(fs, "maybe_fused_sampler", fake_maybe)
    assert gen._get_fused(params) is False  # None -> cached as False
    assert seen["gn_mode"] == "f32"
    assert seen["quantize"] == "out"
    assert seen["interleave"] == "staggered"
