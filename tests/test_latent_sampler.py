"""Latent-tail sampler vs the data-space reverse loop
(ops/latent_sampler.py).

Exactness strategy: every data-space op the latent path removes is
affine, so with the SAME per-step transition noise injected into both
paths the outputs must agree to f32 association error — no statistical
tolerance needed. The probe (`calibrate_head_steps`) and the
distribution-mode noise construction get their own checks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
    ConditionalDiffusion,
)
from osteosarcoma_diffusionmodel_tpu.ops.latent_sampler import (
    LatentTailSampler,
    calibrate_head_steps,
    supports_latent,
)


def make_model(num_steps=8, hidden=(128, 256, 128), data_dims=(10, 40, 14)):
    cfg = Config()
    cfg.model.hidden_dims = list(hidden)
    cfg.model.latent_dim = 32
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.constraints.enabled = False
    # f32 network: the exactness tests compare against the full-width
    # loop to association error, which bf16 casts would swamp.
    cfg.model.compute_dtype = "float32"
    cfg.generation.sample_dtype = "float32"
    cfg.generation.noise_type = "uniform"
    dims = cfg.freeze_dims(*data_dims, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return model, params, dims


def dataspace_loop(model, params, conditions, x_init, noise):
    """Full-width f32 reverse loop with injected noise — the ground
    truth the latent path must reproduce bit-near-exactly."""
    sched = model.schedule
    T = sched.num_steps
    B = conditions.shape[0]
    x = x_init
    coef_x0 = np.asarray(sched.posterior_coef_x0)
    coef_xt = np.asarray(sched.posterior_coef_xt)
    sqrt_var = np.sqrt(np.asarray(sched.posterior_variance))
    for s, t in enumerate(range(T - 1, -1, -1)):
        t_vec = jnp.full((B,), t / T, jnp.float32)
        pred = model.denoiser.apply(
            {"params": params}, x, t_vec,
            conditions=conditions, deterministic=True,
        )
        x0 = jnp.clip(
            pred, -model.denoised_clip_value, model.denoised_clip_value
        )
        if t > 0:
            x = coef_x0[t] * x0 + coef_xt[t] * x + sqrt_var[t] * noise[s]
        else:
            x = x0
    return x


def test_supports_latent_gates():
    model, params, dims = make_model()
    assert supports_latent(model)
    assert not supports_latent(
        dataclasses.replace(model, parameterization="epsilon")
    )
    assert not supports_latent(dataclasses.replace(model, learn_sigma=True))
    assert not supports_latent(
        dataclasses.replace(model, clip_denoised=False)
    )
    assert not supports_latent(
        dataclasses.replace(model, discrete_head=True)
    )


def _matched_noise_pair(model, params, dims, head_steps, B=24):
    T, D = model.schedule.num_steps, dims.data_dim
    cond = jax.random.normal(
        jax.random.PRNGKey(1), (B, dims.condition_dim)
    )
    rng = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (T, B, D), jnp.float32)

    sampler = LatentTailSampler(model, params, head_steps=head_steps)
    latent = sampler.sample(cond, rng, noise=noise)

    # Same x_T the sampler draws internally (first of its 4-way split).
    init_rng = jax.random.split(rng, 4)[0]
    x_init = jax.random.normal(init_rng, (B, D), jnp.float32)
    ref = dataspace_loop(model, params, cond, x_init, noise)
    return np.asarray(latent), np.asarray(ref)


def test_latent_matches_dataspace_exactly():
    model, params, dims = make_model()
    for head in (1, 3, model.schedule.num_steps - 1):
        latent, ref = _matched_noise_pair(model, params, dims, head)
        np.testing.assert_allclose(latent, ref, atol=2e-4, rtol=2e-4)
        assert float(np.std(ref)) > 0.05  # non-degenerate comparison


def test_latent_clip_binding_head_stays_exact():
    """A clip that binds ONLY inside the data-space head leaves the
    hybrid exact: the head applies it full-width, the tail never
    needs it (this model's probe profile is tail-quiet)."""
    model, params, dims = make_model()
    # Probe where the clip would bind for this init.
    head, profile = calibrate_head_steps(
        model, params,
        jnp.zeros((16, dims.condition_dim)), jax.random.PRNGKey(5),
        margin=0.5,
    )
    assert profile.shape == (model.schedule.num_steps,)
    latent, ref = _matched_noise_pair(model, params, dims, head)
    np.testing.assert_allclose(latent, ref, atol=2e-4, rtol=2e-4)


def test_calibrate_head_margin_monotone():
    model, params, dims = make_model()
    cond = jnp.zeros((16, dims.condition_dim))
    rng = jax.random.PRNGKey(5)
    head_loose, profile = calibrate_head_steps(
        model, params, cond, rng, margin=0.9
    )
    # An absurdly strict margin must force a longer (or equal) head.
    tiny = float(profile[: model.schedule.num_steps - 1].max()) / (
        2.0 * model.denoised_clip_value
    )
    head_strict, _ = calibrate_head_steps(
        model, params, cond, rng, margin=tiny
    )
    assert 1 <= head_loose <= head_strict <= model.schedule.num_steps - 1


def test_distribution_mode_moments_match_scan():
    """Production mode (own zeta/eta draws) must reproduce the scan
    sampler's output distribution: per-feature means/stds and the
    cross-feature covariance structure agree within Monte-Carlo error."""
    model, params, dims = make_model(num_steps=10)
    B = 512
    cond = jnp.zeros((B, dims.condition_dim))
    sampler = LatentTailSampler(model, params, head_steps=2)
    lat = np.asarray(sampler.sample(cond, jax.random.PRNGKey(7)))
    ref = np.asarray(
        model.sample(params, cond, jax.random.PRNGKey(11))
    )
    assert lat.shape == ref.shape
    # Mean/std per feature: MC error ~ std/sqrt(B) per cohort.
    np.testing.assert_allclose(
        lat.mean(axis=0), ref.mean(axis=0), atol=0.2
    )
    np.testing.assert_allclose(
        lat.std(axis=0), ref.std(axis=0), atol=0.2, rtol=0.25
    )
    # Covariance structure: compare the two cohorts' feature-feature
    # covariance matrices on a slice.
    cl = np.cov(lat[:, :16], rowvar=False)
    cr = np.cov(ref[:, :16], rowvar=False)
    assert np.abs(cl - cr).max() < 0.25


def test_pallas_latent_matches_dataspace_interpret():
    """Interpret-mode kernel hybrid vs the full-width f32 loop with
    matched noise: the head consumes the wide buffer directly, the
    latent segment its zeta_t = L^-1 K^T z_t projections, and the
    reconstruction residual eta = sum v_t z_t / sqrt(v2) — together
    these reproduce the data-space trajectory exactly, so the only
    differences left are the kernel's bf16 matmul/GN casts."""
    from osteosarcoma_diffusionmodel_tpu.ops.latent_sampler import (
        LatentFusedSampler,
    )

    model, params, dims = make_model()
    T, D = model.schedule.num_steps, dims.data_dim
    B = 32  # two 16-row tiles
    cond = jax.random.normal(
        jax.random.PRNGKey(1), (B, dims.condition_dim)
    )
    rng = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (T, B, D), jnp.float32)

    for head in (1, 3):
        sampler = LatentFusedSampler(
            model, params, head_steps=head, tile_b=16, interpret=True
        )
        t = sampler.tables
        # Derive the latent-segment randomness from the wide stream.
        seg = noise[head : T - 1]  # (n_lat, B, D)
        L_inv_T = np.linalg.inv(np.asarray(t.L_T))
        zeta = (seg @ t.K_in) @ jnp.asarray(L_inv_T)
        v = np.asarray(t.v)
        eta = jnp.einsum("k,kbd->bd", jnp.asarray(v), seg) / np.sqrt(
            t.v2
        )
        out = sampler.sample(cond, rng, noise=noise, zeta=zeta, eta=eta)

        # The fused head draws x_T internally from its rng split.
        head_rng = jax.random.split(rng, 3)[0]
        init_rng = jax.random.split(head_rng)[0]
        x_init = jax.random.normal(init_rng, (B, D), jnp.bfloat16).astype(
            jnp.float32
        )
        ref = dataspace_loop(model, params, cond, x_init, noise)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.15, rtol=0.05
        )
        assert float(np.std(np.asarray(ref))) > 0.05


def test_conditions_have_effect():
    model, params, dims = make_model()
    sampler = LatentTailSampler(model, params, head_steps=1)
    rng = jax.random.PRNGKey(4)
    c0 = jnp.zeros((8, dims.condition_dim))
    c1 = jnp.ones((8, dims.condition_dim))
    a = sampler.sample(c0, rng)
    b = sampler.sample(c1, rng)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-3
