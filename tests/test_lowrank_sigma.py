"""Low-rank correlated residual sigma (diffusion.low_rank_sigma_dim —
the round-2 VERDICT's other shortlisted model-owned joint-structure
candidate, after latent-factor conditioning).

The model learns Sigma_x0(t) = s(t)^2 (diag(d) + U U^T) over its own
x0-prediction residuals by Woodbury Gaussian NLL (stop-gradient mean:
the mean predictor is untouched), then every reverse step marginalizes
the x0 uncertainty into the posterior — x_{t-1} gains a
coef_x0 * s(t) * (sqrt(d) ⊙ eps + U eps_k) term. The joint is carried
by D*k + D + T parameters instead of D^2/2 pairwise estimates: the same
estimation-problem change latent-factor conditioning makes, but through
the NOISE channel, which gets per-sample full-vector residual gradients
rather than pair-count signal.

Reference counterpart: none (the reference's sampler is isotropic,
reference models/diffusion.py:383-425); this closes its joint-structure
blind spot in-model.
"""

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
    cfg.model.diffusion.low_rank_sigma_dim = k
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    return cfg


def test_lowrank_params_and_nll_loss():
    cfg = _cfg(4)
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    assert params["lowrank_U"].shape == (dims.data_dim, 4)
    assert params["lowrank_logdiag"].shape == (dims.data_dim,)
    assert params["lowrank_logs"].shape == (6,)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, dims.condition_dim))
    loss, metrics = model.loss(
        params, x0, cond, jax.random.PRNGKey(3), deterministic=True
    )
    assert jnp.isfinite(loss)
    assert "lowrank_sigma_nll" in metrics
    # The NLL gradient reaches the covariance params but NOT the mean
    # predictor (stop-gradient discipline).
    g = jax.grad(
        lambda p: model.loss(
            p, x0, cond, jax.random.PRNGKey(3), deterministic=True
        )[1]["lowrank_sigma_nll"]
    )(params)
    assert float(jnp.abs(g["lowrank_U"]).max()) > 0
    assert float(jnp.abs(g["output_proj"]["kernel"]).max()) == 0.0


def test_lowrank_sampling_runs_and_uses_covariance():
    cfg = _cfg(4)
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    cond = jnp.zeros((16, dims.condition_dim))
    out = model.sample(params, cond, jax.random.PRNGKey(4))
    assert out.shape == (16, dims.data_dim)
    assert np.isfinite(np.asarray(out)).all()

    # Cranking the factor loadings must change the sampled cohort:
    # proves the correlated term is live in the reverse loop.
    params2 = dict(params)
    params2["lowrank_U"] = params["lowrank_U"] + 1.0
    out2 = model.sample(params2, cond, jax.random.PRNGKey(4))
    assert float(jnp.abs(out2 - out).max()) > 0.1


def test_lowrank_excludes_learn_sigma():
    cfg = _cfg(4)
    cfg.model.diffusion.learn_sigma = True
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    with pytest.raises(ValueError):
        ConditionalDiffusion.from_config(cfg, dims)


def test_lowrank_not_fused():
    from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
        supports_fused,
    )

    cfg = _cfg(4)
    cfg.model.hidden_dims = [128, 256, 128]
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    assert not supports_fused(model)


def test_lowrank_config_roundtrip(tmp_path):
    cfg = _cfg(8)
    cfg.to_yaml(tmp_path / "c.yaml")
    back = Config.from_yaml(tmp_path / "c.yaml")
    assert back.model.diffusion.low_rank_sigma_dim == 8


def test_lowrank_nll_fits_known_factor_covariance():
    """Optimizing ONLY the NLL on residuals drawn from a known
    one-factor covariance recovers that structure: the fitted U's
    top factor aligns with the true loading vector."""
    import optax

    rng = np.random.default_rng(0)
    D, k_true = 24, 1
    u_true = np.zeros((D,), np.float32)
    u_true[:8] = 1.5  # one co-varying block
    cfg = _cfg(2)
    dims = cfg.freeze_dims(6, 15, 3, ["a", "b", "c"])
    assert dims.data_dim == D
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)

    # Residual-like cohort: x0 has factor structure, the mean predictor
    # is untrained (≈0 output), so the NLL fits the x0 covariance.
    n = 4000
    x0 = (
        rng.standard_normal((n, 1)).astype(np.float32) * u_true[None, :]
        + 0.3 * rng.standard_normal((n, D)).astype(np.float32)
    )
    cond = np.zeros((n, dims.condition_dim), np.float32)

    opt = optax.adam(5e-2)
    mask_labels = {p: "cov" if p.startswith("lowrank") else "frozen"
                   for p in params}
    opt = optax.multi_transform(
        {"cov": optax.adam(5e-2), "frozen": optax.set_to_zero()},
        mask_labels,
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        def lf(pp):
            _, m = model.loss(
                pp, jnp.asarray(x0), jnp.asarray(cond), key,
                deterministic=True,
            )
            return m["lowrank_sigma_nll"]

        loss, g = jax.value_and_grad(lf)(p)
        up, s2 = opt.update(g, s)
        return optax.apply_updates(p, up), s2, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(300):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1  # NLL actually descends

    U = np.asarray(params["lowrank_U"])  # (D, 2)
    # Fitted low-rank covariance (up to per-t scale) vs true u u^T.
    fit = U @ U.T
    true = np.outer(u_true, u_true)
    iu = np.triu_indices(D, k=1)
    cc = np.corrcoef(fit[iu], true[iu])[0, 1]
    assert cc > 0.7, f"off-diagonal covariance correlation {cc:.3f}"


def test_lowrank_sigma_recovers_block_cooccurrence(rng):
    """The point of the feature: with the correlated-noise channel a
    model trained on a factor-structured cohort reproduces mutation
    co-occurrence RAW (no calibration) — the same protocol the
    latent-factor test uses (tests/test_latent_factor.py)."""
    import optax

    from osteosarcoma_diffusionmodel_tpu.training.finetune import (
        mutation_corr_target,
    )

    n, m = 300, 12
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

    import optax as _optax

    opt = _optax.adam(1e-3)
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
        return _optax.apply_updates(p, up), s2, loss

    key = jax.random.PRNGKey(1)
    for _ in range(400):
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


def test_lowrank_mutations_scope():
    """scope='mutations': loadings live on the binary block only; the
    zero-padded rows get no correlated noise and no NLL gradient."""
    cfg = _cfg(4)
    cfg.model.diffusion.low_rank_sigma_scope = "mutations"
    dims = cfg.freeze_dims(6, 12, 3, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    assert params["lowrank_U"].shape == (6, 4)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, dims.condition_dim))
    loss, metrics = model.loss(
        params, x0, cond, jax.random.PRNGKey(3), deterministic=True
    )
    assert jnp.isfinite(loss) and "lowrank_sigma_nll" in metrics
    out = model.sample(params, jnp.zeros((4, dims.condition_dim)),
                       jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(out)).all()


def test_lowrank_mutations_scope_excludes_discrete_head():
    """With the discrete mutation head on, loss and sampler slice the
    continuous block (U[M:]) — a mutations-scoped U would silently
    train and sample as a no-op, so from_config must reject the combo
    (same discipline as the learn_sigma conflict)."""
    cfg = _cfg(4)
    cfg.model.diffusion.low_rank_sigma_scope = "mutations"
    cfg.model.diffusion.discrete_mutation_head = True
    dims = cfg.freeze_dims(5, 12, 3, ["a", "b", "c"])
    with pytest.raises(ValueError, match="discrete_mutation_head"):
        ConditionalDiffusion.from_config(cfg, dims)
