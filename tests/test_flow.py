"""Conditional RealNVP flow: invertibility, log-likelihood, training,
pipeline integration (the reference names "flow" in its config but
never implements it — here it's a full third model family).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.flow import (
    ConditionalFlow,
    ConditionalRealNVP,
)


def make_flow(data_dims=(4, 8, 4), couplings=4):
    cfg = Config()
    cfg.model.architecture = "flow"
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(*data_dims, ["a", "b", "c"])
    flow = ConditionalFlow.from_config(cfg, dims)
    params = flow.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return cfg, dims, flow, params


def test_forward_inverse_roundtrip(rng):
    _, dims, flow, params = make_flow()
    x = jnp.asarray(rng.normal(size=(8, dims.data_dim)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(8, dims.condition_dim)).astype(np.float32))
    z, log_det = flow.module.apply({"params": params}, x, cond)
    x_back = flow.module.apply(
        {"params": params}, z, cond, method=ConditionalRealNVP.inverse
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_identity_at_init(rng):
    # Zero-initialized coupling outputs => flow starts as identity.
    _, dims, flow, params = make_flow()
    x = jnp.asarray(rng.normal(size=(4, dims.data_dim)).astype(np.float32))
    cond = jnp.zeros((4, dims.condition_dim))
    z, log_det = flow.module.apply({"params": params}, x, cond)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(log_det), 0.0, atol=1e-6)


def test_log_prob_is_standard_normal_at_init(rng):
    _, dims, flow, params = make_flow()
    x = jnp.asarray(rng.normal(size=(16, dims.data_dim)).astype(np.float32))
    cond = jnp.zeros((16, dims.condition_dim))
    lp = flow.module.apply({"params": params}, x, cond,
                           method=ConditionalRealNVP.log_prob)
    expected = -0.5 * np.sum(
        np.asarray(x) ** 2 + np.log(2 * np.pi), axis=-1
    )
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)


def test_training_reduces_nll(rng):
    import optax

    _, dims, flow, params = make_flow()
    # Data with a strong offset: the flow should learn it quickly.
    x = jnp.asarray(
        (rng.normal(size=(64, dims.data_dim)) * 0.3 + 2.0).astype(np.float32)
    )
    cond = jnp.zeros((64, dims.condition_dim))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        (loss, _), grads = jax.value_and_grad(flow.loss, has_aux=True)(
            params, x, cond, rng
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 - 0.5


def test_sampling_shapes(rng):
    _, dims, flow, params = make_flow()
    cond = jnp.zeros((10, dims.condition_dim))
    out = flow.sample(params, cond, jax.random.PRNGKey(0))
    assert out.shape == (10, dims.data_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_build_model_dispatch():
    from osteosarcoma_diffusionmodel_tpu.training.trainer import build_model

    cfg = Config()
    cfg.model.architecture = "flow"
    cfg.model.compute_dtype = "float32"
    dims = cfg.freeze_dims(4, 8, 4, ["a", "b", "c"])
    model = build_model(cfg, dims)
    assert isinstance(model, ConditionalFlow)


def test_flow_pipeline_e2e(tmp_path, monkeypatch):
    from osteosarcoma_diffusionmodel_tpu.cli import (
        generate_synthetic_patients,
        train_model,
        validate_synthetic_patients,
    )
    from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data

    monkeypatch.chdir(tmp_path)
    make_dummy_data(tmp_path / "processed", n_samples=40,
                    n_mutation_genes=10, n_expression_genes=40, n_pathways=5)
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path / "processed")
    cfg.model.architecture = "flow"
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 3
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.generation.num_synthetic_samples = 30
    cfg.output.results_dir = str(tmp_path / "results")
    cfg.output.synthetic_data_dir = str(tmp_path / "results" / "synthetic")

    history = train_model(cfg)
    assert all(np.isfinite(v) for v in history.train_loss)
    synthetic = generate_synthetic_patients(cfg)
    assert len(synthetic) == 3
    results = validate_synthetic_patients(cfg)
    assert "overall_biological_score" in results
