"""Multi-device sharding on the virtual 8-device CPU mesh
(SURVEY §4 plan item c).

Covers: mesh construction, DP-sharded training step (gradients
all-reduced by XLA), TP param sharding of the denoiser, sharded
large-cohort sampling, and numerical equivalence of sharded vs
single-device losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion
from osteosarcoma_diffusionmodel_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    denoiser_param_sharding,
    make_mesh,
    replicated,
    shard_batch,
)


def small_model(hidden=(32, 64, 32), data_dims=(6, 10, 4), num_steps=8):
    cfg = Config()
    cfg.model.hidden_dims = list(hidden)
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = num_steps
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(*data_dims, ["a", "b", "c"])
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return model, params, dims


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape[MODEL_AXIS] == 1
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape[DATA_AXIS] == 4
    assert mesh2.shape[MODEL_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_dp_training_step_matches_single_device():
    model, params, dims = small_model()
    mesh = make_mesh(8)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (16, dims.data_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (16, dims.condition_dim))
    rng = jax.random.PRNGKey(3)

    def train_step(params, opt_state, x0, cond, rng):
        (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, x0, cond, rng, True
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Single device.
    p1, _, loss1 = jax.jit(train_step)(params, opt_state, x0, cond, rng)

    # DP-sharded over 8 devices.
    x0_s, cond_s = shard_batch(mesh, x0, cond)
    params_r = jax.device_put(params, replicated(mesh))
    opt_r = jax.device_put(opt_state, replicated(mesh))
    with mesh:
        p2, _, loss2 = jax.jit(train_step)(params_r, opt_r, x0_s, cond_s, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # Reduction order differs under the sharded all-reduce; allow
    # float32 noise.
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_tp_param_sharding_splits_wide_kernels():
    model, params, dims = small_model(hidden=(128, 256, 128),
                                      data_dims=(8, 40, 6))
    mesh = make_mesh(8, model_parallel=2)
    shardings = denoiser_param_sharding(mesh, params)

    sharded, total = 0, 0
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    params_flat = dict(jax.tree_util.tree_leaves_with_path(params))
    for path, sharding in flat:
        total += 1
        spec = sharding.spec
        if any(s == MODEL_AXIS for s in spec):
            sharded += 1
            leaf = params_flat[path]
            assert leaf.shape[-1] % 2 == 0
    assert sharded > 0, "no kernel got TP-sharded"

    # Loss under TP sharding matches the replicated value.
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, dims.data_dim))
    cond = jnp.zeros((8, dims.condition_dim))
    rng = jax.random.PRNGKey(5)
    loss_ref, _ = jax.jit(
        lambda p: model.loss(p, x0, cond, rng, deterministic=True)
    )(params)
    params_tp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    with mesh:
        loss_tp, _ = jax.jit(
            lambda p: model.loss(p, x0, cond, rng, deterministic=True)
        )(params_tp)
    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-4)


def test_sharded_sampling_matches_replicated():
    model, params, dims = small_model(num_steps=6)
    mesh = make_mesh(8)
    cond = jax.random.normal(jax.random.PRNGKey(0), (24, dims.condition_dim))
    rng = jax.random.PRNGKey(1)

    out_single = model.sample(params, cond, rng)

    cond_s = shard_batch(mesh, cond)
    params_r = jax.device_put(params, replicated(mesh))
    with mesh:
        out_sharded = jax.jit(lambda p, c, k: model.sample(p, c, k))(
            params_r, cond_s, rng
        )
    # Same PRNG keys + same algebra => identical cohorts.
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sharded), rtol=1e-4, atol=1e-4
    )


def test_batch_sharding_placement():
    mesh = make_mesh(8)
    x = jnp.ones((32, 16))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == batch_sharding(mesh).spec
    # Each device holds a (4, 16) shard.
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(4, 16)}


def test_graft_dryrun():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_graft_dryrun_driver_path():
    """Run dryrun_multichip(8) the way the DRIVER does: a fresh
    subprocess with NO pre-set JAX env (no conftest help), so the
    in-process device count is whatever the default backend gives
    (1 on this machine) and the subprocess re-exec fallback must work.

    Round-1 regression: the driver run failed (MULTICHIP_r01.json rc=1)
    while this suite was green, because conftest.py set the virtual-mesh
    env before JAX import — a path the driver never takes.
    """
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # No backend-reachability probe needed: dryrun_multichip skips the
    # parent-process jax.devices() call when no backend is initialized
    # yet, so a fresh driver-style process never touches the (possibly
    # down) TPU tunnel — it goes straight to the CPU-pinned subprocess.
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (proc.stderr or proc.stdout)[-4000:]
