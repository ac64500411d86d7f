"""Device-resident (XLA/TPU) joint-copula calibration.

``ops/copula.py`` is the reference implementation of the round-3
``copula_joint`` estimator — numpy/float64, one pass per generated
cohort. Measured at the serving b1024 bucket (N=1024, D=5145) that
pass costs 4-5 s on a single host core (normal-scores lexsort 1.7 s,
exact eigen-whitening 1.1 s, the D x D recolor 0.4 s, quantile
gathers ~1 s) — all of it matmuls, sorts and gathers, i.e. exactly
the work the TPU's MXU/VPU do in microseconds-to-milliseconds
(measured warm: the whole whiten pipeline at those shapes runs in
~2 ms on a v5e). This module runs the SAME pipeline as jitted XLA
programs over arrays that never leave the device between the sampler
and the final cohort readback.

Parity contract (tests/test_copula_device.py): per-column MARGINALS
are identical to the numpy path by construction — mutation bits
respect the same exact per-gene counts, and the continuous block
gathers from the same real quantile grid, so the sorted columns of
both paths match. The patient-assignment permutation can differ
(float32 eigh vs float64 eigh, independent tie randomization) — the
same class of difference as a new tie seed; statistical parity of the
imposed joint (correlation structure of the outputs) is asserted in
tests.

All matmuls use ``Precision.HIGHEST`` — on TPU the f32-via-bf16
default truncation would corrupt the Gram/whitening algebra whose
eigenvalue floor is 1e-6.

Reference counterpart: none — the reference (/root/reference) has no
calibration or serving at all; this accelerates this repo's own
estimator (ops/copula.py fit_joint_copula / joint_transplant).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

from .copula import nearest_corr_psd

logger = logging.getLogger(__name__)

_HI = jax.lax.Precision.HIGHEST
_FLOOR = 1e-6  # eigenvalue floor, matches copula._whiten_exact


def _normal_scores(x: jax.Array, key: jax.Array) -> jax.Array:
    """Per-column rank -> standard-normal scores with randomized tie
    order (mirrors copula._normal_scores(tie_rng=...): a uniform
    secondary sort key decides order among exact-value ties only)."""
    n = x.shape[0]
    sec = jax.random.uniform(key, x.shape)
    order = jnp.lexsort((sec, x), axis=0)
    # order is a permutation per column; its argsort is the inverse
    # permutation, i.e. the rank of each row.
    ranks = jnp.argsort(order, axis=0)
    return ndtri((ranks.astype(jnp.float32) + 0.5) / n)


def _unit_std(u: jax.Array) -> jax.Array:
    return u / jnp.maximum(u.std(axis=0, keepdims=True), 1e-9)


def _whiten_exact(u: jax.Array, floor: float = _FLOOR) -> jax.Array:
    """Exact eigen-whitening; dual (kernel-trick) path when N < D.

    Mirrors copula._whiten_exact including the discard-below-floor
    semantics on both branches (sub-floor directions carry no signal;
    clamping would amplify their float noise ~1000x)."""
    n, d = u.shape
    if n < d:
        k_mat = jnp.matmul(u, u.T, precision=_HI) / n
        eigval, q_vec = jnp.linalg.eigh(k_mat)
        inv_sqrt = jnp.where(
            eigval > floor, 1.0 / jnp.sqrt(jnp.maximum(eigval, floor)), 0.0
        )
        w = jnp.matmul(
            q_vec * inv_sqrt,
            jnp.matmul(q_vec.T, u, precision=_HI),
            precision=_HI,
        )
    else:
        gram = jnp.matmul(u.T, u, precision=_HI) / n
        eigval, eigvec = jnp.linalg.eigh(gram)
        inv_sqrt = jnp.where(
            eigval > floor, 1.0 / jnp.sqrt(jnp.maximum(eigval, floor)), 0.0
        )
        w = jnp.matmul(
            jnp.matmul(u, eigvec * inv_sqrt, precision=_HI),
            eigvec.T,
            precision=_HI,
        )
    return _unit_std(w)


def _nearest_corr_psd(corr: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Device mirror of copula.nearest_corr_psd (eigenvalue clamp +
    diagonal renormalization)."""
    w, v = jnp.linalg.eigh(corr)
    w = jnp.maximum(w, eps)
    fixed = jnp.matmul(v * w, v.T, precision=_HI)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(fixed), eps, None))
    fixed = fixed / jnp.outer(d, d)
    eye = jnp.eye(corr.shape[0], dtype=fixed.dtype)
    return fixed * (1.0 - eye) + eye


def _count_threshold_bits(z: jax.Array, k: jax.Array) -> jax.Array:
    """Per-column exact-count thresholding: exactly k[g] ones per gene
    (modulo exact float ties, measure-zero on continuous z) — the same
    partition-at-(n-k) rule as the numpy path."""
    n = z.shape[0]
    z_sorted = jnp.sort(z, axis=0)
    idx = jnp.clip(n - k, 0, n - 1)
    thresh = jnp.take_along_axis(z_sorted, idx[None, :], axis=0)
    bits = (z >= thresh).astype(jnp.float32)
    return jnp.where(k[None, :] <= 0, 0.0, bits)


def _tetra_resharpen(
    zm: jax.Array,
    tetra_chol: jax.Array,
    k: jax.Array,
    key: jax.Array,
    ridge: float = 1e-3,
) -> jax.Array:
    """Second-stage exact-tetrachoric transplant of the mutation block
    (mirrors copula.correlation_transplant driven by the joint z): the
    joint Gram target's mutation block carries phi-attenuated
    correlations; this re-sharpens the bits while the joint z keeps
    the cross-block couplings."""
    n, d = zm.shape
    u = _normal_scores(zm, key)
    if n > d + 1:
        uc = u - u.mean(axis=0, keepdims=True)
        rms = jnp.sqrt(jnp.maximum((uc * uc).mean(axis=0), 1e-18))
        emp = (
            jnp.matmul(uc.T, uc, precision=_HI) / n / jnp.outer(rms, rms)
        )
        eye = jnp.eye(d, dtype=emp.dtype)
        emp = _nearest_corr_psd(emp * (1.0 - ridge) + eye * ridge)
        l_emp = jnp.linalg.cholesky(emp)
        w = jax.scipy.linalg.solve_triangular(l_emp, u.T, lower=True).T
    else:
        w = u
    w = _unit_std(w)
    z = jnp.matmul(w, tetra_chol.T, precision=_HI)
    return _count_threshold_bits(z, k)


def _quantile_map(cont: jax.Array, sorted_real: jax.Array) -> jax.Array:
    """Within-cohort ranks -> linear interpolation on the real
    per-feature quantile grid (mirrors the generator's
    _quantile_map_continuous).

    Scatter formulation: the value at rank i is a per-ROW constant
    lerp of two real-grid rows (p=(i+0.5)/n is rank-determined), so
    instead of rank = argsort(argsort) + two full take_along_axis
    gathers, build the (n, d) table of rank-ordered values directly
    and scatter it back through the sort order — measured 143 ms ->
    66 ms at the serving (1024, 5083) shape (the second argsort and
    both big gathers disappear; outputs bit-identical)."""
    n = cont.shape[0]
    n_real = sorted_real.shape[0]
    order = jnp.argsort(cont, axis=0)
    pos = ((jnp.arange(n, dtype=jnp.float32) + 0.5) / n) * (n_real - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_real - 1)
    frac = (pos - lo.astype(jnp.float32))[:, None]
    vals_by_rank = sorted_real[lo] * (1.0 - frac) + sorted_real[hi] * frac
    return jnp.put_along_axis(
        jnp.zeros(cont.shape, vals_by_rank.dtype), order, vals_by_rank,
        axis=0, inplace=False,
    )


class DeviceCalibrator:
    """Per-checkpoint calibration constants resident on device, with
    shape-specialized jitted pipelines.

    The target Cholesky factors are fitted ON HOST in float64 (once
    per checkpoint, on the small real cohort — ops/copula.py
    fit_joint_copula / fit_continuous_copula_chol) and shipped to the
    device once; per-cohort work (scores, whitening, recolor,
    thresholds, quantile gathers) runs on device.

    ``MAX_ROWS``: above this bound callers should use the numpy path
    (the generator gates on ``accepts``). The bound caps the device
    memory footprint of the pipeline's N x D f32 intermediates
    (scores/whitened/recolored each ~N*5145*4 B: ~674 MB apiece at the
    bound) plus, for N < D cohorts, the dual-whitening N x N Gram; at
    N > D the primal branch runs a fixed D x D eigh instead, so memory
    — not the Gram — is what grows with N.
    """

    MAX_ROWS = 32768

    def __init__(
        self,
        m: int,
        sorted_real_cont: np.ndarray,
        freq: Optional[np.ndarray] = None,
        joint_chol: Optional[np.ndarray] = None,
        tetra: Optional[np.ndarray] = None,
        cont_chol: Optional[np.ndarray] = None,
    ):
        self.m = int(m)
        self._sorted_real = jax.device_put(
            np.asarray(sorted_real_cont, np.float32)
        )
        self._freq = None if freq is None else np.asarray(freq, np.float64)
        self._joint_chol = (
            None
            if joint_chol is None
            else jax.device_put(np.asarray(joint_chol, np.float32))
        )
        if tetra is not None:
            # Host f64 PSD repair + Cholesky of the (62,62) tetrachoric
            # target: identical constants to the numpy path's
            # correlation_transplant.
            tetra_l = np.linalg.cholesky(nearest_corr_psd(tetra))
            self._tetra_chol = jax.device_put(tetra_l.astype(np.float32))
        else:
            self._tetra_chol = None
        self._cont_chol = (
            None
            if cont_chol is None
            else jax.device_put(np.asarray(cont_chol, np.float32))
        )
        self._fns: Dict = {}

    @classmethod
    def accepts(cls, n: int) -> bool:
        return n <= cls.MAX_ROWS

    # -- jit specializations ------------------------------------------
    def _joint_fn(self, n: int, d: int):
        key = ("joint", n, d)
        if key not in self._fns:
            m = self.m
            k_counts = jnp.asarray(
                np.clip(np.round(self._freq * n).astype(np.int64), 0, n),
                jnp.int32,
            )
            use_tetra = self._tetra_chol is not None and n > m + 1

            def pipeline(raw, chol, tetra_chol, sorted_real, rng_key):
                k1, k2 = jax.random.split(rng_key)
                u = _unit_std(_normal_scores(raw.astype(jnp.float32), k1))
                w = _whiten_exact(u)
                z = jnp.matmul(w, chol.T, precision=_HI)
                zm, zc = z[:, :m], z[:, m:]
                if use_tetra:
                    bits = _tetra_resharpen(zm, tetra_chol, k_counts, k2)
                else:
                    bits = _count_threshold_bits(zm, k_counts)
                return bits, _quantile_map(zc, sorted_real)

            self._fns[key] = jax.jit(pipeline)
        return self._fns[key]

    def _cont_fn(self, n: int, d: int):
        key = ("cont", n, d)
        if key not in self._fns:

            def pipeline(cont_raw, chol, sorted_real, rng_key):
                u = _unit_std(
                    _normal_scores(cont_raw.astype(jnp.float32), rng_key)
                )
                w = _whiten_exact(u)
                z = jnp.matmul(w, chol.T, precision=_HI)
                return _quantile_map(z, sorted_real)

            self._fns[key] = jax.jit(pipeline)
        return self._fns[key]

    # -- public entry points ------------------------------------------
    def joint(
        self, raw, seed: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """copula_joint: one whiten/recolor over the full vector +
        tetrachoric re-sharpening + quantile mapping, all on device.
        ``raw``: (N, D) jax.Array (stays on device) or numpy array.
        Returns host (bits (N, m), continuous (N, D-m))."""
        if self._joint_chol is None or self._freq is None:
            raise ValueError("DeviceCalibrator built without joint target")
        n, d = raw.shape
        fn = self._joint_fn(n, d)
        bits, cont = fn(
            jnp.asarray(raw),
            self._joint_chol,
            self._tetra_chol
            if self._tetra_chol is not None
            else jnp.zeros((self.m, self.m), jnp.float32),
            self._sorted_real,
            jax.random.PRNGKey(seed),
        )
        bits, cont = jax.block_until_ready((bits, cont))
        return np.asarray(bits), np.asarray(cont)

    def continuous(self, cont_raw, seed: int) -> np.ndarray:
        """copula_full continuous block: whiten/recolor with the
        continuous-only target + quantile mapping on device."""
        if self._cont_chol is None:
            raise ValueError("DeviceCalibrator built without cont target")
        n, d = cont_raw.shape
        fn = self._cont_fn(n, d)
        out = jax.block_until_ready(
            fn(
                jnp.asarray(cont_raw),
                self._cont_chol,
                self._sorted_real,
                jax.random.PRNGKey(seed),
            )
        )
        return np.asarray(out)
