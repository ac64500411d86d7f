"""Binary D3PM mutation head: posterior algebra, chain marginals,
training, and end-to-end sampling (ops/discrete.py + the
discrete_mutation_head paths in models/diffusion.py).

The posterior formula is verified against a brute-force 2-state
transition-matrix computation, and the full reverse chain against the
analytic property that an x0-exact predictor reproduces the data
distribution's bits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion
from osteosarcoma_diffusionmodel_tpu.ops.discrete import (
    bernoulli_cross_entropy,
    keep_prob,
    posterior_prob_one,
    q_sample_bits,
)


def _brute_posterior_prob_one(j, p1, beta, acp_prev):
    """Explicit 2x2 matrix D3PM posterior, mixed over p(x0)."""
    Q = np.array(
        [
            [1 - beta + beta / 2, beta / 2],
            [beta / 2, 1 - beta + beta / 2],
        ]
    )  # Q[k, j'] = q(x_t = j' | x_{t-1} = k)
    Qbar_prev = np.array(
        [
            [acp_prev + (1 - acp_prev) / 2, (1 - acp_prev) / 2],
            [(1 - acp_prev) / 2, acp_prev + (1 - acp_prev) / 2],
        ]
    )  # Qbar_prev[i, k] = q(x_{t-1} = k | x_0 = i)
    total = 0.0
    for i, pi in ((0, 1 - p1), (1, p1)):
        unnorm = np.array([Q[k, j] * Qbar_prev[i, k] for k in (0, 1)])
        total += pi * unnorm[1] / unnorm.sum()
    return total


def test_posterior_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(50):
        j = float(rng.integers(0, 2))
        p1 = float(rng.random())
        beta = float(rng.uniform(1e-4, 0.5))
        acp_prev = float(rng.uniform(1e-3, 1.0))
        got = float(
            posterior_prob_one(
                jnp.array([[j]]), jnp.array([[p1]]), beta, acp_prev
            )[0, 0]
        )
        want = _brute_posterior_prob_one(int(j), p1, beta, acp_prev)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_posterior_collapses_to_x0_at_acp_prev_one():
    """acp_prev == 1 => p(x_{t-1}=1) == p(x0=1), any x_t / beta."""
    p1 = jnp.array([[0.123, 0.9, 0.5]])
    for j in (0.0, 1.0):
        x_t = jnp.full((1, 3), j)
        out = posterior_prob_one(x_t, p1, 0.3, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(p1), atol=1e-6)


def test_q_sample_bits_flip_rate():
    key = jax.random.PRNGKey(0)
    bits = jnp.zeros((4000, 8))
    acp = jnp.full((4000,), 0.4)  # flip prob = 0.3
    flipped = q_sample_bits(bits, acp, key)
    assert set(np.unique(np.asarray(flipped))) <= {0.0, 1.0}
    np.testing.assert_allclose(float(flipped.mean()), 0.3, atol=0.02)
    # keep_prob is the complement on the same schedule
    np.testing.assert_allclose(float(keep_prob(jnp.array(0.4))), 0.7)


def test_bce_matches_naive():
    rng = np.random.default_rng(1)
    logits64 = rng.normal(0, 5, (10, 7))
    bits64 = rng.integers(0, 2, (10, 7)).astype(np.float64)
    # Float64 naive reference (the float32 naive form loses precision
    # at |logit| > ~8, which is exactly what the stable form avoids).
    p = 1.0 / (1.0 + np.exp(-logits64))
    naive = -(bits64 * np.log(p) + (1 - bits64) * np.log(1 - p))
    got = bernoulli_cross_entropy(
        jnp.asarray(logits64, jnp.float32), jnp.asarray(bits64, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(got), naive, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# Model integration
# ----------------------------------------------------------------------
def make_discrete_model(num_steps=12, parameterization="x0"):
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.diffusion.parameterization = parameterization
    cfg.model.diffusion.discrete_mutation_head = True
    cfg.generation.noise_type = "normal"
    cfg.generation.sample_dtype = "float32"
    dims = cfg.freeze_dims(6, 10, 4, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return model, params, dims, cfg


def test_discrete_flag_plumbs_from_config():
    model, _, dims, _ = make_discrete_model()
    assert model.discrete_head and model.mutation_dim == dims.mutation_dim


def test_loss_finite_and_has_ce_metric():
    model, params, dims, _ = make_discrete_model()
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (8, 6)), jnp.float32)
    cont = jnp.asarray(rng.normal(0, 1, (8, 14)), jnp.float32)
    x0 = jnp.concatenate([bits, cont], axis=1)
    cond = jnp.zeros((8, dims.condition_dim))
    val, metrics = model.loss(params, x0, cond, jax.random.PRNGKey(0))
    assert np.isfinite(float(val))
    assert "mutation_ce" in metrics and np.isfinite(float(metrics["mutation_ce"]))
    grads = jax.grad(lambda p: model.loss(p, x0, cond, jax.random.PRNGKey(0))[0])(
        params
    )
    norms = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    assert sum(jax.tree_util.tree_leaves(norms)) > 0


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_samples_are_exact_bits(sampler):
    model, params, dims, _ = make_discrete_model()
    cond = jnp.zeros((16, dims.condition_dim))
    if sampler == "ddpm":
        out = jax.jit(model.sample)(params, cond, jax.random.PRNGKey(1))
    else:
        out = jax.jit(
            lambda p, c, k: model.sample_ddim(p, c, k, num_sampling_steps=6)
        )(params, cond, jax.random.PRNGKey(1))
    out = np.asarray(out)
    assert out.shape == (16, dims.data_dim)
    m = dims.mutation_dim
    assert set(np.unique(out[:, :m])) <= {0.0, 1.0}
    assert np.all(np.isfinite(out))
    # Continuous block should NOT be binary.
    assert len(np.unique(out[:, m:])) > 10


def test_learn_sigma_composes_with_discrete_head():
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.model.diffusion.num_steps = 8
    cfg.model.diffusion.discrete_mutation_head = True
    cfg.model.diffusion.learn_sigma = True
    dims = cfg.freeze_dims(5, 9, 3, ["a", "b"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    rng = np.random.default_rng(3)
    x0 = jnp.concatenate(
        [
            jnp.asarray(rng.integers(0, 2, (8, 5)), jnp.float32),
            jnp.asarray(rng.normal(0, 1, (8, 12)), jnp.float32),
        ],
        axis=1,
    )
    cond = jnp.zeros((8, dims.condition_dim))
    val, metrics = model.loss(params, x0, cond, jax.random.PRNGKey(0))
    assert np.isfinite(float(val)) and "sigma_nll" in metrics
    out = np.asarray(model.sample(params, cond, jax.random.PRNGKey(1)))
    assert set(np.unique(out[:, :5])) <= {0.0, 1.0}
    assert np.all(np.isfinite(out))


def test_reverse_chain_reproduces_frequencies_with_oracle():
    """With an oracle x0-predictor (constant logits), the full reverse
    chain must land on the Bernoulli(p) marginal those logits encode —
    validates every step of the chain algebra end to end."""
    from osteosarcoma_diffusionmodel_tpu.ops.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create("cosine", 50)
    freqs = np.array([0.05, 0.3, 0.5, 0.8])
    logits = jnp.asarray(np.log(freqs / (1 - freqs)), jnp.float32)
    n = 6000
    key = jax.random.PRNGKey(0)
    k_init, k_scan = jax.random.split(key)
    x = jax.random.bernoulli(k_init, 0.5, (n, 4)).astype(jnp.float32)

    ts = np.arange(49, 0, -1)
    betas = jnp.asarray(np.asarray(sched.betas)[ts])
    acp_prev = jnp.asarray(np.asarray(sched.alphas_cumprod)[ts - 1])
    keys = jax.random.split(k_scan, len(ts))

    def body(x, sc):
        beta, ap, k = sc
        p1 = jnp.broadcast_to(jax.nn.sigmoid(logits), x.shape)
        p_prev = posterior_prob_one(x, p1, beta, ap)
        return (jax.random.uniform(k, x.shape) < p_prev).astype(jnp.float32), None

    x, _ = jax.lax.scan(body, x, (betas, acp_prev, keys))
    # Final t=0 draw from the oracle posterior (acp_prev -> 1 already
    # pushed the chain onto p1; one more exact draw for parity with
    # the sampler's final step).
    p1 = jnp.broadcast_to(jax.nn.sigmoid(logits), x.shape)
    x = (jax.random.uniform(jax.random.PRNGKey(9), x.shape) < p1).astype(
        jnp.float32
    )
    np.testing.assert_allclose(np.asarray(x.mean(axis=0)), freqs, atol=0.03)


def test_trained_discrete_head_beats_thresholding_on_cooccurrence():
    """Train tiny discrete-head and continuous models on a cohort with
    strong pairwise mutation structure; the discrete head's raw samples
    must capture co-occurrence at least as well."""
    import optax

    from osteosarcoma_diffusionmodel_tpu.ops.stats import (
        chi2_binary_pairs,
        pearson_corr,
    )

    rng = np.random.default_rng(7)
    n, m = 400, 8
    # Two blocks of perfectly co-occurring genes + 2 independent.
    z = rng.random((n, 2)) < 0.4
    bits = np.concatenate(
        [
            np.repeat(z[:, :1], 3, axis=1),
            np.repeat(z[:, 1:], 3, axis=1),
            rng.random((n, 2)) < 0.3,
        ],
        axis=1,
    ).astype(np.float32)
    # Light label noise so the task is learnable but not trivial.
    flip = rng.random(bits.shape) < 0.02
    bits = np.abs(bits - flip.astype(np.float32))
    cont = rng.normal(0, 1, (n, 6)).astype(np.float32)
    x0 = jnp.asarray(np.concatenate([bits, cont], axis=1))
    cond = jnp.zeros((n, 2))

    def train(discrete):
        cfg = Config()
        cfg.model.hidden_dims = [64, 128, 64]
        cfg.model.latent_dim = 32
        cfg.model.compute_dtype = "float32"
        cfg.model.constraints.enabled = False
        cfg.model.diffusion.num_steps = 60
        cfg.model.diffusion.discrete_mutation_head = discrete
        dims = cfg.freeze_dims(m, 4, 2, ["a", "b"])
        model = ConditionalDiffusion.from_config(cfg, dims)
        params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key):
            (l, _), g = jax.value_and_grad(model.loss, has_aux=True)(
                params, x0, cond, key, False
            )
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, l

        key = jax.random.PRNGKey(1)
        for i in range(300):
            params, opt, _ = step(params, opt, jax.random.fold_in(key, i))
        samples = np.asarray(
            jax.jit(model.sample)(params, jnp.zeros((1500, 2)),
                                  jax.random.PRNGKey(2))
        )
        return (samples[:, :m] > 0.5).astype(np.float32)

    pair_i, pair_j = np.triu_indices(m, k=1)

    def cooc_corr(synth_bits):
        real_chi = chi2_binary_pairs(
            jnp.asarray(bits), jnp.asarray(pair_i), jnp.asarray(pair_j)
        )
        synth_chi = chi2_binary_pairs(
            jnp.asarray(synth_bits), jnp.asarray(pair_i), jnp.asarray(pair_j)
        )
        return float(pearson_corr(real_chi, synth_chi))

    score_discrete = cooc_corr(train(True))
    score_continuous = cooc_corr(train(False))
    # The discrete head must capture the block structure strongly and
    # not lose to thresholded continuous diffusion.
    assert score_discrete > 0.6, (score_discrete, score_continuous)
    assert score_discrete >= score_continuous - 0.05, (
        score_discrete,
        score_continuous,
    )


def test_config_roundtrip_preserves_discrete_flag(tmp_path):
    cfg = Config()
    cfg.model.diffusion.discrete_mutation_head = True
    cfg.model.diffusion.discrete_ce_weight = 2.5
    cfg.to_yaml(tmp_path / "c.yaml")
    back = Config.from_yaml(tmp_path / "c.yaml")
    assert back.model.diffusion.discrete_mutation_head is True
    assert back.model.diffusion.discrete_ce_weight == 2.5
    # Checkpoint metadata path: from_dict over to_dict (what
    # load_trained_model does with metadata["config"]).
    again = Config.from_dict(cfg.to_dict())
    assert again.model.diffusion.discrete_mutation_head is True
