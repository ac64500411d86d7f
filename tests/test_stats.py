"""On-device statistics vs scipy/sklearn references.

SURVEY §4 test plan item (a): MMD against brute force, KS/Wasserstein/
chi-square against scipy, PCA projection against sklearn.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps
from scipy.spatial import distance as spd

from osteosarcoma_diffusionmodel_tpu.ops.stats import (
    chi2_binary_pairs,
    columnwise_corr,
    ks_test_features,
    mean_pairwise_corr_within_groups,
    mmd_rbf,
    pca_project,
    pearson_corr,
    wasserstein_1d,
)


def brute_mmd(x, y, gamma):
    def k(a, b):
        return np.exp(-gamma * spd.cdist(a, b, "sqeuclidean"))

    return np.sqrt(max(k(x, x).mean() + k(y, y).mean() - 2 * k(x, y).mean(), 0))


def test_mmd_matches_bruteforce(rng):
    x = rng.normal(size=(40, 12)).astype(np.float32)
    y = rng.normal(loc=0.3, size=(60, 12)).astype(np.float32)
    gamma = 1.0 / 12
    ours = float(mmd_rbf(jnp.asarray(x), jnp.asarray(y)))
    expected = brute_mmd(x, y, gamma)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_mmd_identical_distributions_near_zero(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    val = float(mmd_rbf(jnp.asarray(x), jnp.asarray(x)))
    assert val < 1e-3


def test_ks_statistic_matches_scipy(rng):
    x = rng.normal(size=(80, 5)).astype(np.float32)
    y = rng.normal(loc=0.5, size=(120, 5)).astype(np.float32)
    stats, pvals = ks_test_features(jnp.asarray(x), jnp.asarray(y))
    for i in range(5):
        ref_stat, ref_p = sps.ks_2samp(x[:, i], y[:, i], method="asymp")
        np.testing.assert_allclose(float(stats[i]), ref_stat, rtol=1e-5)
        np.testing.assert_allclose(float(pvals[i]), ref_p, rtol=0.05, atol=0.01)


def test_wasserstein_matches_scipy(rng):
    u = rng.normal(size=100).astype(np.float32)
    v = rng.normal(loc=1.0, scale=2.0, size=150).astype(np.float32)
    ours = float(wasserstein_1d(jnp.asarray(u), jnp.asarray(v)))
    ref = sps.wasserstein_distance(u, v)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_pca_projection_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    x = rng.normal(size=(60, 20)).astype(np.float64)
    y = rng.normal(size=(30, 20)).astype(np.float64)
    ours_fit, ours_proj = pca_project(jnp.asarray(x), jnp.asarray(y), 5)
    pca = PCA(n_components=5)
    ref_fit = pca.fit_transform(x)
    ref_proj = pca.transform(y)
    # Component signs are arbitrary; compare absolute values.
    np.testing.assert_allclose(
        np.abs(np.asarray(ours_fit)), np.abs(ref_fit), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(ours_proj)), np.abs(ref_proj), rtol=1e-3, atol=1e-4
    )


def test_chi2_matches_scipy(rng):
    a = rng.integers(0, 2, size=(100, 6)).astype(np.float32)
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pair_i = np.array([p[0] for p in pairs])
    pair_j = np.array([p[1] for p in pairs])
    ours = np.asarray(
        chi2_binary_pairs(jnp.asarray(a), jnp.asarray(pair_i), jnp.asarray(pair_j))
    )
    import pandas as pd

    for k, (i, j) in enumerate(pairs):
        table = pd.crosstab(a[:, i], a[:, j])
        ref = sps.chi2_contingency(table)[0]
        np.testing.assert_allclose(ours[k], ref, rtol=1e-4, atol=1e-5)


def test_chi2_degenerate_column_zero(rng):
    a = rng.integers(0, 2, size=(50, 2)).astype(np.float32)
    a[:, 0] = 1.0  # constant column
    out = np.asarray(chi2_binary_pairs(jnp.asarray(a), jnp.asarray([0]), jnp.asarray([1])))
    assert out[0] == 0.0


def test_pearson_and_columnwise(rng):
    x = rng.normal(size=200).astype(np.float32)
    y = 0.7 * x + 0.3 * rng.normal(size=200).astype(np.float32)
    ours = float(pearson_corr(jnp.asarray(x), jnp.asarray(y)))
    ref = np.corrcoef(x, y)[0, 1]
    np.testing.assert_allclose(ours, ref, rtol=1e-4)

    a = rng.normal(size=(50, 4)).astype(np.float32)
    b = rng.normal(size=(50, 4)).astype(np.float32)
    cc = np.asarray(columnwise_corr(jnp.asarray(a), jnp.asarray(b)))
    for k in range(4):
        np.testing.assert_allclose(cc[k], np.corrcoef(a[:, k], b[:, k])[0, 1],
                                   rtol=1e-3, atol=1e-5)


def test_group_pairwise_corr_matches_bruteforce(rng):
    x = rng.normal(size=(40, 10)).astype(np.float32)
    mask = np.zeros((10, 2), np.float32)
    mask[:4, 0] = 1
    mask[4:10, 1] = 1
    ours = np.asarray(mean_pairwise_corr_within_groups(jnp.asarray(x), jnp.asarray(mask)))
    for p in range(2):
        genes = np.where(mask[:, p] > 0)[0]
        corr = np.corrcoef(x[:, genes].T)
        iu = np.triu_indices(len(genes), k=1)
        np.testing.assert_allclose(ours[p], corr[iu].mean(), rtol=1e-3, atol=1e-4)


def test_ks_exact_matches_scipy():
    """Exact two-sample KS p-values (scipy method='exact' parity) —
    round-1 VERDICT weak #7."""
    from scipy import stats as sstats

    from osteosarcoma_diffusionmodel_tpu.ops.stats import ks_pvalue_exact

    rng = np.random.default_rng(1)
    for n, m, shift in [(20, 35, 0.0), (50, 80, 0.5), (100, 999, 0.2),
                        (17, 300, 1.0)]:
        x = rng.normal(size=n)
        y = rng.normal(shift, 1.0, size=m)
        ref = sstats.ks_2samp(x, y, method="exact")
        mine = ks_pvalue_exact(np.array([ref.statistic]), n, m)[0]
        np.testing.assert_allclose(mine, ref.pvalue, rtol=1e-8, atol=1e-12)


def test_ks_exact_batched_over_features():
    from scipy import stats as sstats

    from osteosarcoma_diffusionmodel_tpu.ops.stats import (
        ks_pvalue_exact,
        ks_test_features,
    )

    rng = np.random.default_rng(2)
    n, m, F = 40, 120, 6
    x = rng.normal(size=(n, F)).astype(np.float32)
    y = rng.normal(0.3, 1.0, size=(m, F)).astype(np.float32)
    stats_b, pvals = ks_test_features(
        jnp.asarray(x), jnp.asarray(y), mode="exact"
    )
    for f in range(F):
        ref = sstats.ks_2samp(x[:, f], y[:, f], method="exact")
        np.testing.assert_allclose(float(stats_b[f]), ref.statistic,
                                   atol=1e-6)
        np.testing.assert_allclose(float(pvals[f]), ref.pvalue, rtol=1e-5)


def test_ks_auto_mode_switches():
    from osteosarcoma_diffusionmodel_tpu.ops.stats import ks_test_features

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(0.4, 1, size=(200, 3)).astype(np.float32))
    _, p_auto = ks_test_features(x, y, mode="auto")
    _, p_exact = ks_test_features(x, y, mode="exact")
    _, p_asymp = ks_test_features(x, y, mode="asymp")
    np.testing.assert_allclose(np.asarray(p_auto), np.asarray(p_exact))
    # The two methods genuinely differ at these sizes.
    assert np.abs(np.asarray(p_exact) - np.asarray(p_asymp)).max() > 1e-4


def test_wasserstein_columns_matches_per_column():
    import jax.numpy as jnp
    import numpy as np

    from osteosarcoma_diffusionmodel_tpu.ops.stats import (
        wasserstein_1d,
        wasserstein_columns,
    )

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(0, 1, (50, 5)), jnp.float32)
    v = jnp.asarray(rng.normal(0.3, 1.2, (80, 5)), jnp.float32)
    batched = np.asarray(wasserstein_columns(u, v))
    single = np.array(
        [float(wasserstein_1d(u[:, i], v[:, i])) for i in range(5)]
    )
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-6)
