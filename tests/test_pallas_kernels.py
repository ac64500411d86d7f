"""Pallas MMD kernel vs the plain-XLA implementation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.ops.pallas_kernels import (
    mmd_rbf_pallas,
    rbf_kernel_sum,
)
from osteosarcoma_diffusionmodel_tpu.ops.stats import mmd_rbf


def test_kernel_sum_matches_dense(rng):
    x = rng.normal(size=(70, 33)).astype(np.float32)
    y = rng.normal(size=(50, 33)).astype(np.float32)
    gamma = 1.0 / 33
    ours = float(rbf_kernel_sum(jnp.asarray(x), jnp.asarray(y), gamma,
                                tile_m=32, tile_n=128, tile_k=128,
                                interpret=True))
    sq = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    expected = np.exp(-gamma * sq).sum()
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_mmd_pallas_matches_jnp(rng):
    x = rng.normal(size=(60, 20)).astype(np.float32)
    y = rng.normal(loc=0.4, size=(45, 20)).astype(np.float32)
    pallas_val = float(mmd_rbf_pallas(jnp.asarray(x), jnp.asarray(y),
                                      interpret=True))
    jnp_val = float(mmd_rbf(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(pallas_val, jnp_val, rtol=1e-3, atol=1e-5)
