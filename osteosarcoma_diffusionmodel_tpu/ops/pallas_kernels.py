"""Pallas TPU kernels for the validation hot spots.

The single numeric hot spot of the validate step is the RBF-kernel MMD
(reference utils/validation.py:273-298): O(n^2 d) pairwise work that
the reference runs through scipy.cdist on host. At 10k-cohort scale the
naive approach materializes an n x m kernel matrix (10k x 10k f32 =
400 MB) in HBM. The Pallas kernel tiles the Gram computation through
VMEM — each (TM, TN) block computes distances via an MXU matmul, fuses
the exp, masks padding, and reduces to a per-block partial sum, so
nothing bigger than a tile ever leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_sum_block(x_ref, y_ref, out_ref, *, gamma, n, m, tile_m, tile_n):
    """Partial sum of exp(-gamma * ||x_i - y_j||^2) over one tile."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[:]
    y = y_ref[:]
    cross = jax.lax.dot_general(
        x, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)
    y_sq = jnp.sum(y * y, axis=1, keepdims=True)
    sq = jnp.maximum(x_sq + y_sq.T - 2.0 * cross, 0.0)
    k = jnp.exp(-gamma * sq)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 0) + i * tile_m
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
    mask = (row_ids < n) & (col_ids < m)
    out_ref[0, 0] = jnp.sum(jnp.where(mask, k, 0.0))


@functools.partial(
    jax.jit, static_argnames=("gamma", "tile_m", "tile_n", "interpret")
)
def rbf_kernel_sum(
    x: jnp.ndarray,
    y: jnp.ndarray,
    gamma: float,
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_ij exp(-gamma ||x_i - y_j||^2) via a tiled Pallas kernel."""
    n, d = x.shape
    m = y.shape[0]
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, tile_m)
    m_pad = _round_up(m, tile_n)
    # Zero-padding features is exact (adds 0 to every distance); padded
    # rows are masked out inside the kernel.
    x = jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, d_pad - d)))
    y = jnp.pad(y.astype(jnp.float32), ((0, m_pad - m), (0, d_pad - d)))

    grid = (n_pad // tile_m, m_pad // tile_n)
    partials = pl.pallas_call(
        functools.partial(
            _kernel_sum_block,
            gamma=gamma, n=n, m=m, tile_m=tile_m, tile_n=tile_n,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(grid, jnp.float32),
        interpret=interpret,
    )(x, y)
    return jnp.sum(partials)


def mmd_rbf_pallas(
    x: jnp.ndarray,
    y: jnp.ndarray,
    gamma: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """MMD via the fused Pallas kernel-sum (HBM-light at 10k+ cohorts)."""
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    n, m = x.shape[0], y.shape[0]
    xx = rbf_kernel_sum(x, x, gamma, interpret=interpret) / (n * n)
    yy = rbf_kernel_sum(y, y, gamma, interpret=interpret) / (m * m)
    xy = rbf_kernel_sum(x, y, gamma, interpret=interpret) / (n * m)
    return jnp.sqrt(jnp.maximum(xx + yy - 2.0 * xy, 0.0))


def mmd_rbf_auto(x: jnp.ndarray, y: jnp.ndarray, gamma: float | None = None):
    """Pick the Pallas kernel on TPU, plain-XLA jnp elsewhere."""
    from .stats import mmd_rbf

    platform = jax.devices()[0].platform
    if platform == "tpu":
        return mmd_rbf_pallas(x, y, gamma)
    return mmd_rbf(x, y, gamma=gamma)
