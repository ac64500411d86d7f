"""Latent-factor conditioning (diffusion.latent_factor_dim — round-3
model-owned joint-structure candidate, ROADMAP §2).

The k-dim encoder latent carries the patient-level joint during
training; generation draws it from a Gaussian prior fitted on the
training cohort's encoded latents (generation/generator.py
_latent_prior_draw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.generation.generator import (
    SyntheticPatientGenerator,
)
from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
    ConditionalDiffusion,
)


def _cfg(k=4):
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.diffusion.latent_factor_dim = k
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    return cfg


def test_latent_encoder_params_and_loss():
    cfg = _cfg(4)
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    assert "latent_enc_fc1" in params and "latent_enc_fc2" in params
    # Condition path is widened by k.
    cond_kernel = params["condition_embed"]["fc1"]["kernel"]
    assert cond_kernel.shape[0] == dims.condition_dim + 4

    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, dims.condition_dim))
    loss, metrics = model.loss(
        params, x0, cond, jax.random.PRNGKey(3), deterministic=True
    )
    assert jnp.isfinite(loss)
    assert "latent_sq" in metrics

    h = model.encode_latents(params, x0)
    assert h.shape == (8, 4)


def test_generator_draws_latent_prior_and_samples(rng):
    cfg = _cfg(4)
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)

    real = rng.normal(size=(50, dims.data_dim)).astype(np.float32)
    real[:, :5] = (real[:, :5] > 0).astype(np.float32)
    stats = {
        "data_matrix": real,
        "mutation_matrix": real[:, :5],
        "mutation_freq": real[:, :5].mean(axis=0),
        "feature_mean": real.mean(axis=0),
        "feature_std": real.std(axis=0),
        "feature_sorted": np.sort(real, axis=0),
    }
    gen = SyntheticPatientGenerator(model, params, cfg, dims, data_stats=stats)
    out = gen.generate(20, {"survival_time": 800}, rng=jax.random.PRNGKey(7))
    assert out["mutations"].shape == (20, 5)
    assert out["expression"].shape == (20, 12)
    assert np.isfinite(out["expression"]).all()
    # Prior was fitted once and cached.
    assert gen._latent_prior is not None
    mu, chol = gen._latent_prior
    assert mu.shape == (4,) and chol.shape == (4, 4)


def test_latent_config_roundtrip(tmp_path):
    cfg = _cfg(8)
    cfg.to_yaml(tmp_path / "c.yaml")
    back = Config.from_yaml(tmp_path / "c.yaml")
    assert back.model.diffusion.latent_factor_dim == 8


def test_latent_factor_recovers_block_cooccurrence(rng):
    """The point of the feature: a latent-factor-conditioned model
    trained on a factor-structured cohort reproduces mutation
    co-occurrence RAW (no calibration), where the plain model's
    thresholded continuous scores cannot."""
    import optax

    from osteosarcoma_diffusionmodel_tpu.training.finetune import (
        mutation_corr_target,
    )

    n, m = 300, 12
    # Two blocks of co-occurring genes driven by 2 latent causes.
    f = rng.random((n, 2)) < 0.5
    probs = np.where(f[:, [0]], 0.75, 0.15)
    probs2 = np.where(f[:, [1]], 0.7, 0.1)
    mut = np.concatenate(
        [
            rng.random((n, m // 2)) < probs,
            rng.random((n, m // 2)) < probs2,
        ],
        axis=1,
    ).astype(np.float32)
    cont = rng.normal(size=(n, 6)).astype(np.float32)
    x0 = np.concatenate([mut, cont], axis=1)
    cond = np.zeros((n, 2), np.float32)

    cfg = _cfg(4)
    cfg.model.hidden_dims = [64, 128, 64]
    cfg.model.diffusion.num_steps = 32
    dims = cfg.freeze_dims(m, 6, 0, ["a", "b"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), 2)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        def lf(pp):
            loss, _ = model.loss(
                pp, jnp.asarray(x0), jnp.asarray(cond), k,
                deterministic=True,
            )
            return loss

        loss, g = jax.value_and_grad(lf)(p)
        up, s2 = opt.update(g, s)
        return optax.apply_updates(p, up), s2, loss

    key = jax.random.PRNGKey(1)
    for i in range(400):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)

    stats = {
        "data_matrix": x0,
        "mutation_matrix": mut,
        "mutation_freq": mut.mean(axis=0),
        "feature_mean": x0.mean(axis=0),
        "feature_std": x0.std(axis=0),
        "feature_sorted": np.sort(x0, axis=0),
    }
    cfg.generation.calibrate_marginals = False  # RAW model output
    gen = SyntheticPatientGenerator(model, params, cfg, dims, data_stats=stats)
    out = gen.generate(2000, {}, rng=jax.random.PRNGKey(9))
    synth_corr = mutation_corr_target(out["mutations"])
    real_corr = mutation_corr_target(mut)
    iu = np.triu_indices(m, k=1)
    cc = np.corrcoef(np.asarray(real_corr)[iu], np.asarray(synth_corr)[iu])[0, 1]
    assert cc > 0.5, f"raw co-occurrence correlation {cc:.3f}"


def test_mutation_only_encoder(rng):
    """latent_encoder_input='mutations': the latent carries mutation
    structure specifically (the full-input variant measurably channels
    expression variance instead — DEMO_LATENT_RAW)."""
    cfg = _cfg(4)
    cfg.model.diffusion.latent_encoder_input = "mutations"
    dims = cfg.freeze_dims(6, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    # Encoder input width = mutation block, not the full vector.
    assert params["latent_enc_fc1"]["kernel"].shape[0] == 6

    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, dims.condition_dim))
    loss, _ = model.loss(
        params, x0, cond, jax.random.PRNGKey(3), deterministic=True
    )
    assert jnp.isfinite(loss)
    h = model.encode_latents(params, x0)
    assert h.shape == (8, 4)
    # The latent must ignore non-mutation columns entirely.
    x0_alt = x0.at[:, 6:].set(0.0)
    np.testing.assert_allclose(
        np.asarray(model.encode_latents(params, x0_alt)), np.asarray(h),
        rtol=1e-5,
    )
