"""Fused Pallas sampler vs the scan sampler's algebra
(ops/fused_sampler.py; SURVEY §2 "on-device DDPM loop").

Parity strategy: inject the per-step transition noise as an input (the
kernel's on-chip PRNG stream necessarily differs from jax.random) and
compare against a step-by-step reference loop that calls the REAL Flax
denoiser with the same bf16 carry discipline. The PRNG path is
TPU-only (statistical test, gated like the other TPU tests).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion
from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
    FusedSampler,
    supports_fused,
)

TILE_B = 16  # bf16 sublane minimum


def make_model(num_steps=6, hidden=(128, 256, 128), data_dims=(10, 40, 14)):
    cfg = Config()
    cfg.model.hidden_dims = list(hidden)
    cfg.model.latent_dim = 32
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.constraints.enabled = False
    cfg.generation.noise_type = "uniform"
    cfg.generation.sample_dtype = "bfloat16"
    dims = cfg.freeze_dims(*data_dims, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return model, params, dims


def reference_loop(model, params, conditions, rng, noise):
    """bf16-carry reverse loop using the real Flax denoiser."""
    sched = model.schedule
    T = sched.num_steps
    B = conditions.shape[0]
    D = model.denoiser.data_dim
    init_rng, _ = jax.random.split(rng)
    x = jax.random.normal(init_rng, (B, D), jnp.bfloat16)

    coef_x0 = np.asarray(sched.posterior_coef_x0)
    coef_xt = np.asarray(sched.posterior_coef_xt)
    sqrt_var = np.sqrt(np.asarray(sched.posterior_variance))
    for s, t in enumerate(range(T - 1, -1, -1)):
        t_vec = jnp.full((B,), t / T, jnp.float32)
        pred = model.denoiser.apply(
            {"params": params}, x.astype(jnp.float32), t_vec,
            conditions=conditions, deterministic=True,
        )
        x0 = jnp.clip(pred, -model.denoised_clip_value,
                      model.denoised_clip_value)
        if t > 0:
            x_new = (
                coef_x0[t] * x0
                + coef_xt[t] * x.astype(jnp.float32)
                + sqrt_var[t] * noise[s]
            )
            x = x_new.astype(jnp.bfloat16)
        else:
            x = x0.astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def test_supports_fused_gates_correctly():
    model, params, dims = make_model()
    assert supports_fused(model)
    assert not supports_fused(
        dataclasses.replace(model, parameterization="epsilon")
    )
    assert not supports_fused(dataclasses.replace(model, learn_sigma=True))
    assert not supports_fused(dataclasses.replace(model, noise_type="normal"))
    assert not supports_fused(
        dataclasses.replace(model, clip_denoised=False)
    )
    # Narrow hidden dims (lane misalignment) are rejected.
    small, sp, _ = make_model(hidden=(64, 128, 64))
    assert not supports_fused(small)


def test_fused_matches_reference_loop_interpret():
    model, params, dims = make_model()
    B, T, D = 2 * TILE_B, model.schedule.num_steps, dims.data_dim
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (T, B, D), jnp.float32)

    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    fused = sampler.sample(cond, rng, noise=noise)
    ref = reference_loop(model, params, cond, rng, noise)

    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=0.15, rtol=0.05
    )
    # Values must be meaningfully nonzero for the comparison to count.
    assert float(jnp.std(ref)) > 0.05


def test_fused_pads_ragged_batches():
    model, params, dims = make_model()
    B = TILE_B + 3  # not a tile multiple
    T, D = model.schedule.num_steps, dims.data_dim
    cond = jnp.zeros((B, dims.condition_dim))
    noise = jnp.zeros((T, B, D), jnp.float32)
    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    out = sampler.sample(cond, jax.random.PRNGKey(0), noise=noise)
    assert out.shape == (B, D)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_conditions_have_effect():
    model, params, dims = make_model()
    B, T, D = TILE_B, model.schedule.num_steps, dims.data_dim
    noise = jnp.zeros((T, B, D), jnp.float32)
    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    a = sampler.sample(jnp.zeros((B, dims.condition_dim)),
                       jax.random.PRNGKey(0), noise=noise)
    b = sampler.sample(5.0 * jnp.ones((B, dims.condition_dim)),
                       jax.random.PRNGKey(0), noise=noise)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-3


@pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="on-chip PRNG path requires TPU",
)
def test_fused_prng_statistics_match_scan_sampler():
    model, params, dims = make_model(num_steps=50)
    B = 512
    cond = jnp.zeros((B, dims.condition_dim))
    sampler = FusedSampler(model, params, tile_b=128)
    fused = sampler.sample(cond, jax.random.PRNGKey(0))
    scan = model.sample(params, cond, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(fused).mean(0), np.asarray(scan).mean(0), atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(fused).std(0), np.asarray(scan).std(0), atol=0.1
    )


def test_fused_sharded_matches_single_device():
    """shard_map'd fused kernel over the virtual 8-device data mesh:
    injected noise makes it bit-comparable to the single-device kernel."""
    from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh

    model, params, dims = make_model()
    mesh = make_mesh(8)
    B = 8 * TILE_B
    T, D = model.schedule.num_steps, dims.data_dim
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (T, B, D), jnp.float32)

    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    single = sampler.sample(cond, rng, noise=noise)
    sharded = sampler.sample_sharded(mesh, cond, rng, noise=noise)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=1e-2, rtol=1e-2
    )


def test_fused_sharded_pads_ragged_cohort():
    from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh

    model, params, dims = make_model()
    mesh = make_mesh(8)
    B = 8 * TILE_B + 5
    T, D = model.schedule.num_steps, dims.data_dim
    cond = jnp.zeros((B, dims.condition_dim))
    noise = jnp.zeros((T, B, D), jnp.float32)
    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    out = sampler.sample_sharded(mesh, cond, jax.random.PRNGKey(0),
                                 noise=noise)
    assert out.shape == (B, D)
    assert np.isfinite(np.asarray(out)).all()


def reference_ddim_loop(model, params, conditions, rng, ddim_steps):
    """bf16-carry eta=0 DDIM loop with the real Flax denoiser,
    mirroring the fused kernel's init-key derivation and the
    sample_ddim algebra (clipped-x0 eps recomputation)."""
    from osteosarcoma_diffusionmodel_tpu.ops.schedules import ddim_timesteps

    sched = model.schedule
    T = sched.num_steps
    B = conditions.shape[0]
    D = model.denoiser.data_dim
    init_rng, _ = jax.random.split(rng)
    x = jax.random.normal(init_rng, (B, D), jnp.bfloat16)

    ts = ddim_timesteps(T, ddim_steps)[::-1].copy()
    prev = np.concatenate([ts[1:], np.array([-1])])
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    for t, tp in zip(ts, prev):
        t_vec = jnp.full((B,), t / T, jnp.float32)
        pred = model.denoiser.apply(
            {"params": params}, x.astype(jnp.float32), t_vec,
            conditions=conditions, deterministic=True,
        )
        x0 = jnp.clip(pred, -model.denoised_clip_value,
                      model.denoised_clip_value)
        if tp < 0:
            x = x0.astype(jnp.bfloat16)
            break
        acp_t, acp_prev = acp[t], acp[tp]
        eps = (x.astype(jnp.float32) - np.sqrt(acp_t) * x0) / np.sqrt(
            1.0 - acp_t
        )
        x_new = np.sqrt(acp_prev) * x0 + np.sqrt(1.0 - acp_prev) * eps
        x = x_new.astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def test_fused_ddim_matches_reference_loop_interpret():
    model, params, dims = make_model(num_steps=20)
    B = 2 * TILE_B
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)

    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                           ddim_steps=5)
    assert sampler.deterministic and sampler.n_loop == 5
    fused = sampler.sample(cond, rng)
    ref = reference_ddim_loop(model, params, cond, rng, ddim_steps=5)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=0.15, rtol=0.05
    )
    assert float(jnp.std(ref)) > 0.05


def test_fused_ddim_rejects_noise_and_is_deterministic():
    model, params, dims = make_model(num_steps=20)
    B = TILE_B
    cond = jnp.zeros((B, dims.condition_dim))
    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                           ddim_steps=4)
    T, D = 4, dims.data_dim
    with pytest.raises(AssertionError, match="eta=0"):
        sampler.sample(cond, jax.random.PRNGKey(0),
                       noise=jnp.zeros((T, B, D)))
    # Same rng -> identical output (no transition noise anywhere).
    a = sampler.sample(cond, jax.random.PRNGKey(5))
    b = sampler.sample(cond, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_ddim_sharded_matches_single_device():
    from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh

    model, params, dims = make_model(num_steps=20)
    mesh = make_mesh(8)
    B = 8 * TILE_B
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)
    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                           ddim_steps=5)
    single = sampler.sample(cond, rng)
    sharded = sampler.sample_sharded(mesh, cond, rng)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=1e-2, rtol=1e-2
    )


def make_discrete_model(num_steps=20, hidden=(128, 256, 128),
                        data_dims=(10, 40, 14)):
    cfg = Config()
    cfg.model.hidden_dims = list(hidden)
    cfg.model.latent_dim = 32
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.diffusion.discrete_mutation_head = True
    cfg.model.constraints.enabled = False
    cfg.generation.noise_type = "uniform"
    cfg.generation.sample_dtype = "bfloat16"
    dims = cfg.freeze_dims(*data_dims, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return model, params, dims


def reference_discrete_loop(model, params, conditions, rng, noise):
    """bf16-carry DDPM loop with the binary D3PM mutation block,
    mirroring the fused kernel's algebra: denoiser input 2b-1 on the
    mutation columns, continuous-only clip, posterior bit draws from
    the SAME uniforms the continuous columns turn into noise."""
    from osteosarcoma_diffusionmodel_tpu.ops.discrete import posterior_prob_one
    from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
        _UNIFORM_SCALE,
    )

    sched = model.schedule
    T = sched.num_steps
    B = conditions.shape[0]
    D = model.denoiser.data_dim
    M = model.mutation_dim
    init_rng, _ = jax.random.split(rng)
    cont_rng, bit_rng = jax.random.split(init_rng)
    bits = jax.random.bernoulli(bit_rng, 0.5, (B, M)).astype(jnp.bfloat16)
    cont = jax.random.normal(cont_rng, (B, D - M), jnp.bfloat16)
    x = jnp.concatenate([bits, cont], axis=1)

    acp = np.asarray(sched.alphas_cumprod)
    betas = np.asarray(sched.betas)
    coef_x0 = np.asarray(sched.posterior_coef_x0)
    coef_xt = np.asarray(sched.posterior_coef_xt)
    sqrt_var = np.sqrt(np.asarray(sched.posterior_variance))
    for s, t in enumerate(range(T - 1, -1, -1)):
        xf = x.astype(jnp.float32)
        x_in = xf.at[:, :M].set(2.0 * xf[:, :M] - 1.0)
        t_vec = jnp.full((B,), t / T, jnp.float32)
        out = model.denoiser.apply(
            {"params": params}, x_in, t_vec,
            conditions=conditions, deterministic=True,
        )
        x0 = jnp.clip(out, -model.denoised_clip_value,
                      model.denoised_clip_value)
        z = noise[s]
        u = z * (1.0 / _UNIFORM_SCALE) + 0.5
        if t > 0:
            cont_new = (coef_x0[t] * x0 + coef_xt[t] * xf
                        + sqrt_var[t] * z)
            beta_t, acp_prev = betas[t], acp[t - 1]
        else:
            cont_new = x0
            beta_t, acp_prev = betas[0], 1.0
        p_prev = posterior_prob_one(
            xf[:, :M], jax.nn.sigmoid(out[:, :M]), beta_t, acp_prev
        )
        mut_new = (u[:, :M] < p_prev).astype(jnp.float32)
        x = jnp.concatenate(
            [mut_new, cont_new[:, M:]], axis=1
        ).astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def test_fused_discrete_matches_reference_loop_interpret():
    model, params, dims = make_discrete_model()
    assert supports_fused(model)
    B, T, D = 2 * TILE_B, model.schedule.num_steps, dims.data_dim
    M = dims.mutation_dim
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)
    # Uniform-derived noise so the kernel's u-recovery is exact.
    from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
        _UNIFORM_SCALE,
    )
    u = jax.random.uniform(jax.random.PRNGKey(3), (T, B, D))
    noise = (u - 0.5) * _UNIFORM_SCALE

    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    assert sampler.mut_dim == M
    fused = np.asarray(sampler.sample(cond, rng, noise=noise))
    ref = np.asarray(reference_discrete_loop(model, params, cond, rng, noise))

    # Continuous block: same tolerance as the continuous-only test.
    np.testing.assert_allclose(fused[:, M:], ref[:, M:], atol=0.15, rtol=0.05)
    # Mutation block: exact bits except where kernel-vs-Flax numerics
    # move p_prev across a uniform draw (rare).
    assert set(np.unique(fused[:, :M])) <= {0.0, 1.0}
    mismatch = np.mean(fused[:, :M] != ref[:, :M])
    assert mismatch < 0.05, mismatch
    np.testing.assert_allclose(
        fused[:, :M].mean(0), ref[:, :M].mean(0), atol=0.1
    )


@pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="on-chip PRNG path requires TPU",
)
def test_fused_discrete_prng_statistics_match_scan():
    model, params, dims = make_discrete_model(num_steps=50)
    B, M = 512, dims.mutation_dim
    cond = jnp.zeros((B, dims.condition_dim))
    sampler = FusedSampler(model, params, tile_b=128)
    fused = np.asarray(sampler.sample(cond, jax.random.PRNGKey(0)))
    scan = np.asarray(model.sample(params, cond, jax.random.PRNGKey(0)))
    assert set(np.unique(fused[:, :M])) <= {0.0, 1.0}
    np.testing.assert_allclose(
        fused[:, :M].mean(0), scan[:, :M].mean(0), atol=0.12
    )
    np.testing.assert_allclose(
        fused[:, M:].mean(0), scan[:, M:].mean(0), atol=0.1
    )


@pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="on-chip PRNG path requires TPU",
)
def test_fused_discrete_ddim_statistics_match_scan():
    model, params, dims = make_discrete_model(num_steps=50)
    B, M = 512, dims.mutation_dim
    cond = jnp.zeros((B, dims.condition_dim))
    sampler = FusedSampler(model, params, tile_b=128, ddim_steps=10)
    fused = np.asarray(sampler.sample(cond, jax.random.PRNGKey(0)))
    scan = np.asarray(jax.jit(
        lambda p, c, k: model.sample_ddim(p, c, k, num_sampling_steps=10)
    )(params, cond, jax.random.PRNGKey(0)))
    assert set(np.unique(fused[:, :M])) <= {0.0, 1.0}
    np.testing.assert_allclose(
        fused[:, :M].mean(0), scan[:, :M].mean(0), atol=0.12
    )


def test_vmem_estimate_scales_and_flagship_fits():
    """The VMEM-fit probe: the flagship config fits the budget; a much
    wider denoiser exceeds it (maybe_fused_sampler then falls back to
    the scan path instead of a Mosaic OOM at compile time)."""
    budget = 128 * 1024 * 1024
    model, params, dims = make_model(
        num_steps=4, hidden=(256, 512, 256), data_dims=(62, 5054, 26)
    )
    flagship = FusedSampler(model, params, tile_b=512, interpret=True)
    assert flagship.estimated_vmem_bytes() < budget
    # tile 1024 ran on hardware (BASELINE tile sweep) — must be accepted.
    ok_tile = FusedSampler(model, params, tile_b=1024, interpret=True)
    assert ok_tile.estimated_vmem_bytes() < budget
    # tile 2048 measured 147.8 MB on hardware — must be rejected.
    big_tile = FusedSampler(model, params, tile_b=2048, interpret=True)
    assert big_tile.estimated_vmem_bytes() > budget

    big, big_params, _ = make_model(
        num_steps=4, hidden=(2048, 4096, 2048), data_dims=(62, 5054, 26)
    )
    wide = FusedSampler(big, big_params, tile_b=512, interpret=True)
    assert wide.estimated_vmem_bytes() > budget


@pytest.mark.parametrize("mode", ["pingpong", "staggered"])
def test_interleave_modes_match_sequential_ddim(mode):
    """The half-tile interleave variants must be bit-identical to the
    sequential kernel on the deterministic (eta=0) DDIM path — the
    stage pipeline reorders EMISSION, never math (round-4 staggered
    MXU/VPU overlap experiment)."""
    model, params, dims = make_model(num_steps=20)
    B = 2 * TILE_B
    cond = jnp.zeros((B, dims.condition_dim))
    rng = jax.random.PRNGKey(3)
    base = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                        ddim_steps=5)
    inter = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                         ddim_steps=5, interleave=mode)
    assert inter.interleave == mode
    a = np.asarray(base.sample(cond, rng))
    b = np.asarray(inter.sample(cond, rng))
    np.testing.assert_array_equal(a, b)


def test_interleave_mode_validation():
    model, params, dims = make_model(num_steps=6)
    with pytest.raises(ValueError, match="interleave"):
        FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                     interleave="bogus")
    # True normalizes to the round-3 ping-pong mode.
    s = FusedSampler(model, params, tile_b=TILE_B, interpret=True,
                     interleave=True)
    assert s.interleave == "pingpong"


def test_fused_engages_and_matches_with_ar_head():
    """The AR mutation head must not disengage or perturb the fused
    kernel (round-3 VERDICT weak #3 suspected exactly that): the AR
    params ride the same tree, supports_fused stays True, and the
    kernel's reverse loop is bit-for-bit the same algebra — the head
    only redraws the mutation block AFTER sampling (generator._ar_bits).
    """
    cfg = Config()
    cfg.model.hidden_dims = [128, 256, 128]
    cfg.model.latent_dim = 32
    cfg.model.diffusion.num_steps = 6
    cfg.model.diffusion.ar_mutation_head = True
    cfg.model.constraints.enabled = False
    cfg.generation.noise_type = "uniform"
    cfg.generation.sample_dtype = "bfloat16"
    dims = cfg.freeze_dims(10, 40, 14, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    assert model.ar_head and "ar_coupling" in params
    assert supports_fused(model)

    B, T, D = 2 * TILE_B, model.schedule.num_steps, dims.data_dim
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, dims.condition_dim))
    rng = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (T, B, D), jnp.float32)

    sampler = FusedSampler(model, params, tile_b=TILE_B, interpret=True)
    fused = sampler.sample(cond, rng, noise=noise)
    ref = reference_loop(model, params, cond, rng, noise)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=0.15, rtol=0.05
    )
    assert float(jnp.std(ref)) > 0.05
