"""Classifier-free guidance: condition dropout + guided sampling.

The reference declares `guidance_scale: 7.5` / accepts a guidance
argument but never consumes either (reference config.yaml:120,
generate.py:101); here CFG is real and honored.
"""

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion


def make_model(cfg_dropout=0.2, num_steps=8):
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.model.cfg_dropout_prob = cfg_dropout
    dims = cfg.freeze_dims(6, 10, 4, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return cfg, dims, model, params


def test_cfg_dropout_changes_loss_with_different_keys():
    cfg, dims, model, params = make_model(cfg_dropout=0.5)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (32, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(1), (32, dims.condition_dim))
    l1, _ = model.loss(params, x0, cond, jax.random.PRNGKey(2),
                       deterministic=True)
    l2, _ = model.loss(params, x0, cond, jax.random.PRNGKey(2),
                       deterministic=True)
    np.testing.assert_allclose(float(l1), float(l2))  # same key -> same mask
    assert np.isfinite(float(l1))


def test_guidance_one_matches_plain_sampler():
    cfg, dims, model, params = make_model(cfg_dropout=0.0)
    cond = jax.random.normal(jax.random.PRNGKey(3), (5, dims.condition_dim))
    rng = jax.random.PRNGKey(4)
    a = model.sample(params, cond, rng)
    b = model.sample(params, cond, rng, guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_guidance_changes_output_and_is_finite():
    cfg, dims, model, params = make_model()
    cond = jax.random.normal(jax.random.PRNGKey(3), (5, dims.condition_dim))
    rng = jax.random.PRNGKey(4)
    plain = model.sample(params, cond, rng)
    guided = model.sample(params, cond, rng, guidance_scale=3.0)
    assert np.all(np.isfinite(np.asarray(guided)))
    assert not np.allclose(np.asarray(plain), np.asarray(guided))


def test_guided_ddim():
    cfg, dims, model, params = make_model(num_steps=20)
    cond = jnp.zeros((4, dims.condition_dim))
    out = model.sample_ddim(params, cond, jax.random.PRNGKey(0),
                            num_sampling_steps=5, guidance_scale=2.0)
    assert out.shape == (4, dims.data_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_generator_honors_guidance_only_when_trained_for_it():
    from osteosarcoma_diffusionmodel_tpu.generation.generator import (
        SyntheticPatientGenerator,
    )

    # Untrained-for-CFG model: guidance_scale config is ignored.
    cfg, dims, model, params = make_model(cfg_dropout=0.0)
    cfg.generation.guidance_scale = 7.5
    dims.condition_names.clear()
    dims.condition_names.extend(["survival_days_norm", "event_occurred",
                                 "metastasis_at_diagnosis"])
    gen = SyntheticPatientGenerator(model, params, cfg, dims)
    out_plain = gen.generate(3, {"survival_time": 800},
                             rng=jax.random.PRNGKey(1))
    direct = model.sample(
        params,
        gen.create_conditions(3, {"survival_time": 800}),
        jax.random.split(jax.random.PRNGKey(1))[1],
    )
    np.testing.assert_allclose(
        out_plain["expression"],
        np.asarray(direct)[:, 6:16], rtol=1e-4, atol=1e-4,
    )

    # CFG-trained model: guided path runs and differs.
    cfg2, dims2, model2, params2 = make_model(cfg_dropout=0.2)
    cfg2.generation.guidance_scale = 3.0
    dims2.condition_names.clear()
    dims2.condition_names.extend(["survival_days_norm", "event_occurred",
                                  "metastasis_at_diagnosis"])
    gen2 = SyntheticPatientGenerator(model2, params2, cfg2, dims2)
    out_guided = gen2.generate(3, {"survival_time": 800},
                               rng=jax.random.PRNGKey(1))
    assert np.all(np.isfinite(out_guided["expression"]))
