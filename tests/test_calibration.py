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
    real = np.concatenate(
        [
            (rng.random((100, 5)) < [0.1, 0.3, 0.5, 0.7, 0.9]).astype(np.float32),
            rng.normal(5.0, 2.0, (100, 12)).astype(np.float32),
            rng.normal(-1.0, 0.5, (100, 3)).astype(np.float32),
        ],
        axis=1,
    )
    stats = {
        "feature_mean": real.mean(axis=0),
        "feature_std": real.std(axis=0),
        "mutation_freq": np.array([0.1, 0.3, 0.5, 0.7, 0.9], np.float32),
        "feature_sorted": np.sort(real, axis=0),
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


def test_quantile_mode_matches_real_marginals(generator_with_stats):
    from scipy import stats as sps

    gen = generator_with_stats
    out = gen.generate(400, {"survival_time": 800}, rng=jax.random.PRNGKey(1))
    real_expr = gen.data_stats["feature_sorted"][:, 5:17]
    # Exact-marginal mapping: per-feature KS vs the real sample is tiny.
    for j in range(0, 12, 4):
        stat, _ = sps.ks_2samp(out["expression"][:, j], real_expr[:, j])
        assert stat < 0.1
    np.testing.assert_allclose(out["expression"].mean(axis=0),
                               real_expr.mean(axis=0), atol=0.25)


def test_moment_mode_matches_moments(generator_with_stats):
    gen = generator_with_stats
    gen.config.generation.calibrate_marginals = "moment"
    try:
        out = gen.generate(400, {"survival_time": 800},
                           rng=jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            out["expression"].mean(axis=0),
            gen.data_stats["feature_mean"][5:17], atol=0.1,
        )
        np.testing.assert_allclose(
            out["expression"].std(axis=0),
            gen.data_stats["feature_std"][5:17], atol=0.1,
        )
    finally:
        gen.config.generation.calibrate_marginals = "quantile"


def test_calibration_disabled(generator_with_stats):
    gen = generator_with_stats
    gen.config.generation.calibrate_marginals = False
    try:
        out = gen.generate(100, {"survival_time": 800},
                           rng=jax.random.PRNGKey(1))
        # Raw model output: untrained model samples are ~N-ish around 0,
        # so expression mean is nowhere near the calibrated ~5.0.
        assert abs(out["expression"].mean() - 5.0) > 1.0
    finally:
        gen.config.generation.calibrate_marginals = "quantile"


def test_moment_calibration_preserves_correlations(generator_with_stats):
    gen = generator_with_stats
    cfg = gen.config.generation
    cfg.calibrate_marginals = "moment"
    out = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    cfg.calibrate_marginals = False
    raw = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    cfg.calibrate_marginals = "quantile"
    # Affine per-feature maps preserve Pearson correlations.
    ce = np.corrcoef(out["expression"].T)
    cr = np.corrcoef(raw["expression"].T)
    np.testing.assert_allclose(ce, cr, atol=1e-3)


def test_quantile_calibration_preserves_rank_correlations(generator_with_stats):
    from scipy import stats as sps

    gen = generator_with_stats
    cfg = gen.config.generation
    cfg.calibrate_marginals = "quantile"
    out = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    cfg.calibrate_marginals = False
    raw = gen.generate(300, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    cfg.calibrate_marginals = "quantile"
    # Monotone maps preserve Spearman (rank) correlation.
    for i, j in [(0, 1), (2, 5), (7, 11)]:
        rho_cal = sps.spearmanr(out["expression"][:, i],
                                out["expression"][:, j]).statistic
        rho_raw = sps.spearmanr(raw["expression"][:, i],
                                raw["expression"][:, j]).statistic
        np.testing.assert_allclose(rho_cal, rho_raw, atol=0.05)


def test_copula_joint_mode_end_to_end(generator_with_stats, rng):
    """copula_joint: exact marginal counts, cross-block coupling
    preserved, real Pearson covariance approached on the continuous
    block (ops/copula.py joint transplant through the generator)."""
    gen = generator_with_stats
    # Real cohort with planted cross-block structure: mutation 0
    # suppresses continuous feature 0.
    mut = (rng.random((200, 5)) < [0.1, 0.3, 0.5, 0.7, 0.9]).astype(
        np.float32
    )
    cont = rng.normal(5.0, 2.0, (200, 15)).astype(np.float32)
    cont[:, 0] -= 3.0 * mut[:, 1]
    real = np.concatenate([mut, cont], axis=1)
    gen.data_stats = {
        "feature_mean": real.mean(axis=0),
        "feature_std": real.std(axis=0),
        "mutation_freq": mut.mean(axis=0),
        "feature_sorted": np.sort(real, axis=0),
        "mutation_matrix": mut,
        "data_matrix": real,
    }
    gen.config.generation.calibrate_marginals = "copula_joint"
    out = gen.generate(500, {"survival_time": 800}, rng=jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        out["mutations"].mean(axis=0), mut.mean(axis=0), atol=0.01
    )
    # Cross-block sign survives the transplant.
    c = np.corrcoef(out["mutations"][:, 1], out["expression"][:, 0])[0, 1]
    assert c < -0.15
    # Continuous marginals ride the real quantile grid.
    assert out["expression"].min() >= real[:, 5:17].min() - 1e-4
    assert out["expression"].max() <= real[:, 5:17].max() + 1e-4


def test_replay_calibration_script_smoke(tmp_path, monkeypatch, capsys):
    """scripts/replay_calibration.py runs against a dumped raw matrix +
    a demo-style workdir (the round-3 diagnostic workflow)."""
    import sys
    from pathlib import Path

    import pandas as pd

    repo = Path(__file__).resolve().parent.parent
    rng = np.random.default_rng(0)
    from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data
    from osteosarcoma_diffusionmodel_tpu.data.pathways import PathwayFeatures

    make_dummy_data(tmp_path / "processed", n_samples=40,
                    n_mutation_genes=10, n_expression_genes=60, n_pathways=5)
    eng = PathwayFeatures()
    expr = pd.read_csv(tmp_path / "processed" /
                       "expression_matrix_aligned.csv", index_col=0)
    scores = eng.compute_pathway_scores_from_expression(expr)
    scores.to_csv(tmp_path / "processed" / "pathway_scores.csv")
    mut = pd.read_csv(tmp_path / "processed" /
                      "mutation_matrix_aligned.csv", index_col=0)
    pathz = (scores - scores.mean()) / scores.std().replace(0, 1.0)
    data = np.concatenate(
        [mut.values, expr.values, pathz.values], axis=1
    ).astype(np.float32)
    (tmp_path / "ckpt").mkdir()
    np.savez_compressed(
        tmp_path / "ckpt" / "data_stats.npz",
        data_matrix=data,
        mutation_matrix=mut.values.astype(np.float32),
        mutation_freq=mut.values.mean(axis=0),
        feature_mean=data.mean(axis=0),
        feature_std=data.std(axis=0),
        feature_sorted=np.sort(data, axis=0),
    )
    raw = rng.normal(size=(300, data.shape[1])).astype(np.float32)
    np.savez_compressed(tmp_path / "raw.npz", samples=raw)

    sys.path.insert(0, str(repo / "scripts"))
    import replay_calibration

    monkeypatch.setattr(
        sys, "argv",
        ["replay_calibration.py", str(tmp_path / "raw.npz"),
         str(tmp_path), "copula_joint", "quantile"],
    )
    replay_calibration.main()
    out = capsys.readouterr().out
    assert "[copula_joint]" in out and "[quantile]" in out
    assert "cooc=" in out
