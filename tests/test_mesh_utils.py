"""Mesh utility coverage: padding, distributed init no-op, shardings."""

import jax
import jax.numpy as jnp

from osteosarcoma_diffusionmodel_tpu.parallel.mesh import (
    denoiser_param_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicated,
)


def test_pad_to_multiple():
    assert pad_to_multiple(5142, 128) == 5248
    assert pad_to_multiple(128, 128) == 128
    assert pad_to_multiple(1, 8) == 8


def test_initialize_distributed_noop(monkeypatch):
    # No coordinator configured: must be a silent no-op.
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_distributed()


def test_replicated_sharding():
    mesh = make_mesh(8)
    sharding = replicated(mesh)
    x = jax.device_put(jnp.ones((4, 4)), sharding)
    # Every device holds the full array.
    assert all(s.data.shape == (4, 4) for s in x.addressable_shards)


def test_param_sharding_replicates_small_kernels():
    mesh = make_mesh(8, model_parallel=2)
    params = {"small": jnp.ones((16, 32)), "scalar": jnp.float32(1.0)}
    shardings = denoiser_param_sharding(mesh, params)
    # 32 < 128: replicated, not TP-split.
    assert all(
        all(s is None for s in sh.spec)
        or len(sh.spec) == 0
        for sh in jax.tree_util.tree_leaves(shardings)
    )
