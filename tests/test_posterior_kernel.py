"""Fused Pallas posterior-update kernel.

TPU-only: the on-chip PRNG primitives (pltpu.prng_seed /
prng_random_bits) have no CPU interpret-mode lowering in this JAX
build. The same checks run against the real chip via
scripts/verify_posterior_kernel.py; results recorded in its docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.ops.pallas_kernels import posterior_update

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="pltpu PRNG primitives need a TPU (no CPU interpret lowering)",
)


def test_posterior_mean_matches_reference(rng):
    x = rng.normal(size=(40, 70)).astype(np.float32)
    pred = rng.normal(size=(40, 70)).astype(np.float32) * 40  # exercises clip
    c0, c1, sv, clip = 0.3, 0.6, 0.0, 30.0  # sqrt_var=0: deterministic
    out = np.asarray(posterior_update(
        jnp.asarray(x), jnp.asarray(pred), 7, c0, c1, sv, add_noise=1.0,
        clip_value=clip, tile_m=16, interpret=False,
    ))
    expected = c0 * np.clip(pred, -clip, clip) + c1 * x
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_final_step_returns_clipped_pred(rng):
    x = rng.normal(size=(8, 20)).astype(np.float32)
    pred = rng.normal(size=(8, 20)).astype(np.float32) * 100
    out = np.asarray(posterior_update(
        jnp.asarray(x), jnp.asarray(pred), 0, 0.5, 0.5, 1.0, add_noise=0.0,
        clip_value=30.0, tile_m=8, interpret=False,
    ))
    np.testing.assert_allclose(out, np.clip(pred, -30, 30), rtol=1e-6)


def test_noise_statistics(rng):
    x = np.zeros((64, 256), np.float32)
    pred = np.zeros((64, 256), np.float32)
    out = np.asarray(posterior_update(
        jnp.asarray(x), jnp.asarray(pred), 123, 0.0, 0.0, 1.0, add_noise=1.0,
        tile_m=32, interpret=False,
    ))
    # Pure noise: standard normal statistics.
    assert abs(out.mean()) < 0.05
    assert abs(out.std() - 1.0) < 0.05
    # Different seeds give different noise.
    out2 = np.asarray(posterior_update(
        jnp.asarray(x), jnp.asarray(pred), 124, 0.0, 0.0, 1.0, add_noise=1.0,
        tile_m=32, interpret=False,
    ))
    assert not np.allclose(out, out2)


def test_traced_variant_matches_static(rng):
    from osteosarcoma_diffusionmodel_tpu.ops.pallas_kernels import (
        posterior_update_traced,
    )

    x = rng.normal(size=(32, 300)).astype(np.float32)
    pred = (rng.normal(size=(32, 300)) * 50).astype(np.float32)
    coefs = jnp.asarray([0.4, 0.5, 0.0, 1.0, 30.0], jnp.float32)
    out = np.asarray(posterior_update_traced(
        jnp.asarray(x), jnp.asarray(pred), coefs, jnp.int32(5),
        tile_m=16, tile_d=128,
    ))
    expected = 0.4 * np.clip(pred, -30, 30) + 0.5 * x
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
