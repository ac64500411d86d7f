"""Tests for the latent-Gaussian mutation copula (ops/copula.py).

The copula closes the round-1 co-occurrence gap: the validator's
chi-square pattern correlation (reference utils/validation.py:89-121)
on the calibrated mutation block must track the real cohort's pairwise
structure, not just its marginals.
"""

import numpy as np
import pytest
from scipy import stats as sstats

from osteosarcoma_diffusionmodel_tpu.ops.copula import (
    _norm_ppf,
    correlation_transplant,
    fit_binary_copula,
    nearest_corr_psd,
    tetrachoric_pairs,
)


def test_norm_ppf_matches_scipy():
    p = np.linspace(1e-9, 1 - 1e-9, 2001)
    np.testing.assert_allclose(_norm_ppf(p), sstats.norm.ppf(p), atol=1e-7)


@pytest.mark.parametrize("rho_true", [-0.6, -0.2, 0.0, 0.3, 0.7])
def test_tetrachoric_recovers_latent_correlation(rho_true):
    rng = np.random.default_rng(42)
    L = np.linalg.cholesky(np.array([[1.0, rho_true], [rho_true, 1.0]]))
    z = rng.standard_normal((400_000, 2)) @ L.T
    f1, f2 = 0.35, 0.15
    b1 = z[:, 0] > sstats.norm.ppf(1 - f1)
    b2 = z[:, 1] > sstats.norm.ppf(1 - f2)
    p11 = float(np.mean(b1 & b2))
    rho_est = tetrachoric_pairs(
        np.array([b1.mean()]), np.array([b2.mean()]), np.array([p11])
    )[0]
    assert abs(rho_est - rho_true) < 0.03


def test_tetrachoric_degenerate_marginals_are_zero():
    rho = tetrachoric_pairs(
        np.array([0.0, 1.0, 0.3]),
        np.array([0.5, 0.5, 0.0]),
        np.array([0.0, 0.5, 0.0]),
    )
    assert rho[0] == 0.0 and rho[1] == 0.0 and rho[2] == 0.0


def test_nearest_corr_psd():
    bad = np.array([[1.0, 0.9, -0.9], [0.9, 1.0, 0.9], [-0.9, 0.9, 1.0]])
    fixed = nearest_corr_psd(bad)
    w = np.linalg.eigvalsh(fixed)
    assert w.min() >= 0
    np.testing.assert_allclose(np.diag(fixed), 1.0, atol=1e-9)
    # Cholesky must succeed on the output.
    np.linalg.cholesky(fixed + 1e-9 * np.eye(3))


def _structured_binary(rng, n, d):
    n_fac = max(2, d // 8)
    load = rng.random((d, n_fac)) < 0.25
    fac = rng.random((n, n_fac)) < 0.5
    bump = (fac @ load.T).astype(bool)
    freqs = rng.beta(1.2, 3.0, d).clip(0.05, 0.9)
    return (
        (rng.random((n, d)) < freqs) | (bump & (rng.random((n, d)) < 0.5))
    ).astype(np.float32)


def test_transplant_matches_marginals_exactly():
    rng = np.random.default_rng(1)
    real = _structured_binary(rng, 100, 40)
    freq, corr = fit_binary_copula(real)
    raw = rng.standard_normal((5000, 40))
    synth = correlation_transplant(raw, corr, freq)
    assert set(np.unique(synth)) <= {0.0, 1.0}
    np.testing.assert_allclose(
        synth.mean(axis=0), np.round(freq * 5000) / 5000, atol=1e-9
    )


def test_transplant_reproduces_cooccurrence_structure():
    """The headline guarantee: chi-square pattern correlation >= 0.8
    (VERDICT item 2 'done' criterion) even from structureless scores."""
    import jax.numpy as jnp

    from osteosarcoma_diffusionmodel_tpu.ops.stats import (
        chi2_binary_pairs,
        pearson_corr,
    )

    rng = np.random.default_rng(2)
    real = _structured_binary(rng, 100, 50)
    freq, corr = fit_binary_copula(real)
    raw = rng.standard_normal((10_000, 50))  # no structure at all
    synth = correlation_transplant(raw, corr, freq)

    iu, ju = np.triu_indices(50, 1)
    c_real = chi2_binary_pairs(jnp.asarray(real), jnp.asarray(iu), jnp.asarray(ju))
    c_synth = chi2_binary_pairs(jnp.asarray(synth), jnp.asarray(iu), jnp.asarray(ju))
    r = float(pearson_corr(c_real, c_synth))
    assert r >= 0.8, f"cooccurrence chi2 correlation {r} < 0.8"


def test_transplant_preserves_score_signal():
    """With an identity target correlation, high scores should still map
    to mutations — the transplant is driven by the model output, not
    fresh noise."""
    rng = np.random.default_rng(3)
    raw = rng.standard_normal((2000, 10))
    freq = np.full(10, 0.3)
    synth = correlation_transplant(raw, np.eye(10), freq)
    # Per column, the mutated set should be exactly the top-30% scores.
    for g in range(10):
        top = raw[:, g] >= np.quantile(raw[:, g], 0.7)
        agree = (synth[:, g] == top).mean()
        # Empirical whitening mixes columns slightly; near-perfect
        # agreement (not exact) is the contract.
        assert agree > 0.95


def test_transplant_small_cohort_fallback():
    rng = np.random.default_rng(4)
    real = _structured_binary(rng, 100, 30)
    freq, corr = fit_binary_copula(real)
    raw = rng.standard_normal((10, 30))  # n < d: whitening must not blow up
    synth = correlation_transplant(raw, corr, freq)
    assert synth.shape == (10, 30)
    assert np.isfinite(synth).all()


def test_continuous_copula_reproduces_group_structure():
    """copula_full machinery: within-group correlations of the real
    cohort survive transplant + are imprinted on structureless scores."""
    from osteosarcoma_diffusionmodel_tpu.ops.copula import (
        fit_continuous_copula_chol,
        gaussian_transplant,
    )

    rng = np.random.default_rng(5)
    n, d, k = 100, 120, 4
    load = rng.normal(size=(d, k)) * (rng.random((d, k)) < 0.3)
    real = (rng.normal(size=(n, k)) @ load.T + rng.normal(size=(n, d))).astype(
        np.float32
    )
    chol = fit_continuous_copula_chol(real)
    synth = rng.normal(size=(2000, d)).astype(np.float32)
    z = gaussian_transplant(synth, chol)
    assert z.shape == (2000, d) and np.isfinite(z).all()

    def group_corrs(x):
        out = []
        for j in range(k):
            idx = np.where(np.abs(load[:, j]) > 0)[0][:12]
            c = np.corrcoef(x[:, idx], rowvar=False)
            out.append(c[np.triu_indices(len(idx), 1)].mean())
        return np.asarray(out)

    r = np.corrcoef(group_corrs(real), group_corrs(z))[0, 1]
    assert r > 0.9, f"group-structure correlation {r}"


def test_continuous_copula_small_cohort_does_not_crash():
    from osteosarcoma_diffusionmodel_tpu.ops.copula import (
        fit_continuous_copula_chol,
        gaussian_transplant,
    )

    rng = np.random.default_rng(6)
    real = rng.normal(size=(50, 80)).astype(np.float32)  # n < d
    chol = fit_continuous_copula_chol(real)
    z = gaussian_transplant(rng.normal(size=(10, 80)).astype(np.float32), chol)
    assert z.shape == (10, 80) and np.isfinite(z).all()


def test_generator_copula_full_mode(tmp_path):
    """End-to-end: copula_full through the generator on a tiny model."""
    import jax

    from osteosarcoma_diffusionmodel_tpu.config import Config
    from osteosarcoma_diffusionmodel_tpu.generation.generator import (
        SyntheticPatientGenerator,
    )
    from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
        ConditionalDiffusion,
    )

    rng = np.random.default_rng(7)
    m_dim, e_dim, p_dim = 6, 20, 4
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.generation.calibrate_marginals = "copula_full"
    dims = cfg.freeze_dims(m_dim, e_dim, p_dim, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)

    data = np.concatenate(
        [
            (rng.random((60, m_dim)) < 0.4).astype(np.float32),
            rng.normal(size=(60, e_dim + p_dim)).astype(np.float32),
        ],
        axis=1,
    )
    stats = {
        "mutation_freq": data[:, :m_dim].mean(0),
        "feature_mean": data.mean(0),
        "feature_std": data.std(0),
        "feature_sorted": np.sort(data, 0),
        "mutation_matrix": data[:, :m_dim],
        "data_matrix": data,
    }
    gen = SyntheticPatientGenerator(model, params, cfg, dims, data_stats=stats)
    out = gen.generate(40, {"survival_time": 500})
    assert out["mutations"].shape == (40, m_dim)
    assert set(np.unique(out["mutations"])) <= {0.0, 1.0}
    # Marginal counts match real frequencies exactly (copula threshold).
    np.testing.assert_allclose(
        out["mutations"].mean(0),
        np.round(stats["mutation_freq"] * 40) / 40,
        atol=1e-6,
    )
    # Continuous values live on the real quantile grid.
    assert np.isfinite(out["expression"]).all()
    assert out["expression"].min() >= data[:, m_dim:m_dim + e_dim].min() - 1e-5
    assert out["expression"].max() <= data[:, m_dim:m_dim + e_dim].max() + 1e-5
