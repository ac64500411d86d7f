"""On-device statistical tests for cohort validation.

TPU-native re-implementations of the scipy/sklearn statistics used by
reference utils/validation.py, all jnp and jit-friendly:

- RBF-kernel MMD (reference validation.py:273-298) — the Gram terms
  are plain matmuls (||x||^2 + ||y||^2 - 2 x.y), so the O(n^2 d) work
  rides the MXU instead of scipy.cdist on host; a fused Pallas kernel
  for very large cohorts lives in ops/pallas_kernels.py
- two-sample Kolmogorov-Smirnov statistic + asymptotic p-value
  (validation.py:241-246) via sort/searchsorted
- 1-D Wasserstein distance (validation.py:263-266) via the CDF-integral
  formulation
- PCA by SVD for the Wasserstein-on-PCs test (validation.py:257-261)
- vectorized 2x2 chi-square with Yates continuity correction, matching
  scipy.chi2_contingency on binary mutation pairs (validation.py:94-115)
- Pearson correlation helpers
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


# ----------------------------------------------------------------------
# MMD
# ----------------------------------------------------------------------
def _mean_rbf(x: jnp.ndarray, y: jnp.ndarray, gamma: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=1)[:, None]
    y_sq = jnp.sum(y * y, axis=1)[None, :]
    cross = jnp.dot(
        x, y.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sq_dists = jnp.maximum(x_sq + y_sq - 2.0 * cross, 0.0)
    return jnp.mean(jnp.exp(-gamma * sq_dists))


@partial(jax.jit, static_argnames=("gamma",))
def mmd_rbf(x: jnp.ndarray, y: jnp.ndarray, gamma: float | None = None) -> jnp.ndarray:
    """sqrt(max(E[k(x,x)] + E[k(y,y)] - 2 E[k(x,y)], 0)), gamma = 1/d default."""
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    xx = _mean_rbf(x, x, gamma)
    yy = _mean_rbf(y, y, gamma)
    xy = _mean_rbf(x, y, gamma)
    return jnp.sqrt(jnp.maximum(xx + yy - 2.0 * xy, 0.0))


# ----------------------------------------------------------------------
# Kolmogorov-Smirnov
# ----------------------------------------------------------------------
def ks_statistic(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Two-sample KS statistic D = sup |F_x - F_y| (one feature)."""
    x = jnp.sort(x)
    y = jnp.sort(y)
    all_vals = jnp.concatenate([x, y])
    cdf_x = jnp.searchsorted(x, all_vals, side="right") / x.shape[0]
    cdf_y = jnp.searchsorted(y, all_vals, side="right") / y.shape[0]
    return jnp.max(jnp.abs(cdf_x - cdf_y))


def ks_pvalue_asymptotic(d: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Two-sided asymptotic Kolmogorov p-value Q_KS(sqrt(en)*d)."""
    en = n * m / (n + m)
    lam = (jnp.sqrt(en) + 0.12 + 0.11 / jnp.sqrt(en)) * d
    j = jnp.arange(1, 101, dtype=jnp.float32)
    terms = 2.0 * ((-1.0) ** (j - 1)) * jnp.exp(-2.0 * (j * lam) ** 2)
    return jnp.clip(jnp.sum(terms), 0.0, 1.0)


def ks_pvalue_exact(d_values: np.ndarray, n: int, m: int) -> np.ndarray:
    """Exact two-sample two-sided KS p-values (scipy method='exact'
    parity), vectorized over a batch of observed statistics.

    P(D >= d) = 1 - (#paths from (0,0) to (n,m) with
    |i*m - j*n| < h at every vertex) / C(n+m, n), h = round(d*n*m).
    The lattice-path DP runs the short axis as the outer loop; the long
    axis advances by a reset-cumulative-sum (per-feature band masks),
    with per-row rescaling + log accumulation against overflow.
    Host-side numpy: one validate call on <=100 features at
    n=100/m=10^4 takes ~1 s.
    """
    from scipy.special import gammaln

    d_values = np.atleast_1d(np.asarray(d_values, np.float64))
    if n > m:
        n, m = m, n  # symmetric; keep the short axis outer
    h = np.round(d_values * n * m).astype(np.int64)  # band in grid units
    F = len(d_values)

    # B[j, f]: #paths to (i, j) strictly inside the band, for current i.
    j_idx = np.arange(m + 1, dtype=np.int64)[:, None]  # (m+1, 1)
    B = np.zeros((m + 1, F), np.float64)
    B[0] = 1.0
    log_scale = np.zeros(F, np.float64)
    for i in range(n + 1):
        inside = np.abs(i * m - j_idx * n) < h[None, :]  # (m+1, F)
        # Advance along j: B_new[j] = B_prev[j] + B_new[j-1] inside the
        # band, 0 outside — a cumulative sum that resets at blocked
        # cells. totals are nondecreasing, so the cumulative total at
        # the most recent blocked cell is a running maximum.
        total = np.cumsum(np.where(inside, B, 0.0), axis=0)
        start_total = np.maximum.accumulate(
            np.where(inside, -np.inf, total), axis=0
        )
        start_total = np.where(np.isneginf(start_total), 0.0, start_total)
        B = np.where(inside, total - start_total, 0.0)
        # Rescale to avoid overflow; track the log.
        mx = B.max(axis=0)
        mx = np.where(mx > 0, mx, 1.0)
        B /= mx
        log_scale += np.log(mx)

    log_paths = np.where(B[m] > 0, np.log(np.maximum(B[m], 1e-300)), -np.inf)
    log_paths = log_paths + log_scale
    log_total = gammaln(n + m + 1) - gammaln(n + 1) - gammaln(m + 1)
    p_inside = np.exp(np.clip(log_paths - log_total, -745.0, 0.0))
    p_inside = np.where(np.isneginf(log_paths), 0.0, p_inside)
    return np.clip(1.0 - p_inside, 0.0, 1.0)


# scipy's mode='auto' switch point for the exact method.
KS_EXACT_MAX_N = 10_000


def ks_test_features(
    x: jnp.ndarray, y: jnp.ndarray, mode: str = "asymp"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-feature two-sample KS over column-matched matrices.

    mode: "asymp" (on-device asymptotic p-values) | "exact" (host-side
    lattice-path DP, scipy method='exact' parity) | "auto" (exact when
    max(n, m) <= 10000, scipy's switch rule).
    """
    n, m = x.shape[0], y.shape[0]
    stats, pvals = _ks_features_asymp(x, y)
    if mode == "exact" or (mode == "auto" and max(n, m) <= KS_EXACT_MAX_N):
        pvals = jnp.asarray(
            ks_pvalue_exact(np.asarray(stats), n, m), jnp.float32
        )
    return stats, pvals


@jax.jit
def _ks_features_asymp(x, y):
    n, m = x.shape[0], y.shape[0]
    stats = jax.vmap(ks_statistic, in_axes=(1, 1))(x, y)
    pvals = jax.vmap(lambda d: ks_pvalue_asymptotic(d, n, m))(stats)
    return stats, pvals


# ----------------------------------------------------------------------
# Wasserstein
# ----------------------------------------------------------------------
@jax.jit
def wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """W1(u, v) via the CDF-integral formulation (scipy-equivalent)."""
    u = jnp.sort(u)
    v = jnp.sort(v)
    all_vals = jnp.sort(jnp.concatenate([u, v]))
    deltas = jnp.diff(all_vals)
    cdf_u = jnp.searchsorted(u, all_vals[:-1], side="right") / u.shape[0]
    cdf_v = jnp.searchsorted(v, all_vals[:-1], side="right") / v.shape[0]
    return jnp.sum(jnp.abs(cdf_u - cdf_v) * deltas)


@jax.jit
def wasserstein_columns(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Per-column W1 for (n, k) vs (m, k) — one compiled program and
    one device round-trip instead of k (the tunneled-TPU backend pays
    ~0.1 s latency per dispatch, so batching matters more than FLOPs
    here)."""
    return jax.vmap(wasserstein_1d, in_axes=(1, 1))(u, v)


@partial(jax.jit, static_argnames=("n_components",))
def pca_project(
    x_fit: jnp.ndarray, x_other: jnp.ndarray, n_components: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit PCA on x_fit (SVD of the centered matrix), project both.

    Matches sklearn PCA().fit_transform / .transform up to component
    sign (reference validation.py:257-261); sign is irrelevant for the
    per-component Wasserstein distances consumed downstream.
    """
    mean = jnp.mean(x_fit, axis=0, keepdims=True)
    xc = x_fit - mean
    _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
    comps = vt[:n_components]
    hi = jax.lax.Precision.HIGHEST
    return (
        jnp.dot(xc, comps.T, precision=hi),
        jnp.dot(x_other - mean, comps.T, precision=hi),
    )


# ----------------------------------------------------------------------
# Chi-square on binary pairs
# ----------------------------------------------------------------------
@jax.jit
def chi2_binary_pairs(
    a: jnp.ndarray, pair_i: jnp.ndarray, pair_j: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized 2x2 chi-square with Yates continuity correction.

    For each (i, j) gene pair in a binary matrix `a` (samples x genes),
    builds the 2x2 contingency table and computes scipy-compatible
    chi2_contingency (correction=True) — the reference's pandas
    crosstab loop (validation.py:98-115) collapsed into one fused
    computation over all pairs.

    Degenerate tables (a constant column) return 0, matching scipy's
    behavior of raising; callers pre-filter constant columns.
    """
    a = a.astype(jnp.float32)
    n = a.shape[0]
    # All-pairs contingency counts via one (G, G) Gram matmul — O(N G^2)
    # on the MXU instead of gathering (N, n_pairs) slices, and a far
    # smaller program to compile.
    counts11 = jnp.dot(
        a.T, a,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    col_sums = jnp.sum(a, axis=0)
    n11 = counts11[pair_i, pair_j]
    n10 = col_sums[pair_i] - n11
    n01 = col_sums[pair_j] - n11
    n00 = n - n11 - n10 - n01

    row1 = n11 + n10
    row0 = n01 + n00
    col1 = n11 + n01
    col0 = n10 + n00

    def cell(obs, exp):
        diff = jnp.maximum(jnp.abs(obs - exp) - 0.5, 0.0)  # Yates
        return jnp.where(exp > 0, diff * diff / jnp.maximum(exp, _EPS), 0.0)

    e11 = row1 * col1 / n
    e10 = row1 * col0 / n
    e01 = row0 * col1 / n
    e00 = row0 * col0 / n
    chi2 = cell(n11, e11) + cell(n10, e10) + cell(n01, e01) + cell(n00, e00)

    degenerate = (row1 == 0) | (row0 == 0) | (col1 == 0) | (col0 == 0)
    return jnp.where(degenerate, 0.0, chi2)


# ----------------------------------------------------------------------
# Correlation
# ----------------------------------------------------------------------
@jax.jit
def pearson_corr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation of two 1-D vectors."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xc = x - jnp.mean(x)
    yc = y - jnp.mean(y)
    denom = jnp.sqrt(jnp.sum(xc * xc) * jnp.sum(yc * yc))
    return jnp.sum(xc * yc) / jnp.maximum(denom, _EPS)


@jax.jit
def columnwise_corr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """corr(a[:, k], b[:, k]) for all columns k at once."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    ac = a - jnp.mean(a, axis=0, keepdims=True)
    bc = b - jnp.mean(b, axis=0, keepdims=True)
    denom = jnp.sqrt(jnp.sum(ac * ac, axis=0) * jnp.sum(bc * bc, axis=0))
    return jnp.sum(ac * bc, axis=0) / jnp.maximum(denom, _EPS)


@jax.jit
def mean_pairwise_corr_within_groups(
    x: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean pairwise correlation among each mask column's member features.

    Same masked-matmul trick as the pathway-coherence loss: for group p,
    sum_{i,j in p} corr(i,j) = ||Z m_p||^2 / N with Z batch-standardized.
    Returns one value per group; groups with <2 members give NaN-free 0.
    """
    n = x.shape[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    std = jnp.std(x, axis=0, keepdims=True)
    z = (x - mean) / (std + 1e-8)
    y = jnp.dot(
        z, mask,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    corr_sum = jnp.sum(y * y, axis=0) / n
    k = jnp.sum(mask, axis=0)
    return jnp.where(
        k >= 2, (corr_sum - k) / jnp.maximum(k * (k - 1.0), 1.0), 0.0
    )
