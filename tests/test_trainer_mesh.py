"""Multi-chip training fast path + plateau-LR state surgery.

Round-1 VERDICT weak #4/#5: with a mesh set, training used to revert to
per-step host dispatch; and _set_learning_rate blindly indexed
opt_state[1]. Both are covered here on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import OsteosarcomaArrays
from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh
from osteosarcoma_diffusionmodel_tpu.training.trainer import (
    Trainer,
    _set_learning_rate,
    build_model,
)


def small_setup(tmp_path, seed=0, n=48, batch=16):
    rng = np.random.default_rng(seed)
    m_dim, e_dim, p_dim = 6, 20, 4
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 8
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.training.batch_size = batch
    cfg.training.num_epochs = 2
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.training.val_split = 0.25
    dims = cfg.freeze_dims(m_dim, e_dim, p_dim, ["a", "b", "c"])
    arrays = OsteosarcomaArrays(
        data=rng.normal(size=(n, m_dim + e_dim + p_dim)).astype(np.float32),
        conditions=rng.normal(size=(n, 3)).astype(np.float32),
        survival=rng.uniform(100, 2000, size=n).astype(np.float32),
        sample_ids=[f"P{i}" for i in range(n)],
        mutation_genes=[f"M{i}" for i in range(m_dim)],
        expression_genes=[f"E{i}" for i in range(e_dim)],
        pathway_names=[f"PW{i}" for i in range(p_dim)],
        condition_names=["a", "b", "c"],
    )
    model = build_model(cfg, dims)
    return model, arrays, dims, cfg


def test_mesh_training_uses_scan_and_matches_single_device(tmp_path):
    model, arrays, dims, cfg = small_setup(tmp_path / "s")

    t_single = Trainer(model, arrays, dims, cfg)
    rng = jax.random.PRNGKey(0)
    loss_single = [t_single.train_epoch(e, jax.random.fold_in(rng, e))
                   for e in range(2)]

    model2, arrays2, dims2, cfg2 = small_setup(tmp_path / "m")
    mesh = make_mesh(8)
    t_mesh = Trainer(model2, arrays2, dims2, cfg2, mesh=mesh)
    # batch 16 % 8 devices == 0 -> the scan fast path must engage.
    assert cfg2.training.batch_size % mesh.shape["data"] == 0
    loss_mesh = [t_mesh.train_epoch(e, jax.random.fold_in(rng, e))
                 for e in range(2)]

    np.testing.assert_allclose(loss_single, loss_mesh, rtol=1e-4, atol=1e-5)
    # Params after 2 epochs agree too (all-reduce order -> fp noise).
    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_mesh.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_mesh_training_uneven_batch_falls_back(tmp_path):
    model, arrays, dims, cfg = small_setup(tmp_path, batch=12)  # 12 % 8 != 0
    mesh = make_mesh(8)
    trainer = Trainer(model, arrays, dims, cfg, mesh=mesh)
    loss = trainer.train_epoch(0, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_set_learning_rate_finds_injected_state_anywhere():
    params = {"w": jnp.ones((3, 3))}
    # Reordered chain: inject FIRST, clip second (round-1 code assumed
    # the opposite order and would silently no-op).
    tx = optax.chain(
        optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3),
        optax.clip_by_global_norm(1.0),
    )
    state = tx.init(params)
    new_state = _set_learning_rate(state, 5e-4)
    lr = new_state[0].hyperparams["learning_rate"]
    assert float(lr) == pytest.approx(5e-4)


def test_set_learning_rate_raises_without_injection():
    params = {"w": jnp.ones((2,))}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    state = tx.init(params)
    with pytest.raises(ValueError, match="inject_hyperparams"):
        _set_learning_rate(state, 1e-4)


def test_set_learning_rate_raises_on_ambiguity():
    params = {"w": jnp.ones((2,))}
    tx = optax.chain(
        optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
        optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3),
    )
    state = tx.init(params)
    with pytest.raises(ValueError, match="found 2"):
        _set_learning_rate(state, 1e-4)


def test_trainer_plateau_updates_still_work(tmp_path):
    """End-to-end: the Trainer's own chain passes the structure check."""
    model, arrays, dims, cfg = small_setup(tmp_path)
    trainer = Trainer(model, arrays, dims, cfg)
    trainer.opt_state = _set_learning_rate(trainer.opt_state, 1e-5)
    # One more step must run fine with the mutated state.
    loss = trainer.train_epoch(0, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_mesh_training_with_ar_head_matches_single_device(tmp_path):
    """The AR (FVSBN) head under the 8-device data-parallel mesh: the
    multi_transform optimizer (main AdamW + dedicated AR Adam), the
    raw-batch AR CE routing, and the sel metrics must all survive the
    sharded epoch scan and reproduce the single-device run."""
    def setup(path):
        model, arrays, dims, cfg = small_setup(path)
        cfg.model.diffusion.ar_mutation_head = True
        # Rebuild with the AR head on; binarize the mutation block so
        # the teacher-forced CE sees real bits.
        arrays.data[:, : dims.mutation_dim] = (
            arrays.data[:, : dims.mutation_dim] > 0
        ).astype(np.float32)
        model = build_model(cfg, dims)
        return model, arrays, dims, cfg

    model, arrays, dims, cfg = setup(tmp_path / "s")
    t_single = Trainer(model, arrays, dims, cfg)
    rng = jax.random.PRNGKey(0)
    loss_single = [t_single.train_epoch(e, jax.random.fold_in(rng, e))
                   for e in range(2)]
    sel_single = t_single._last_train_sel

    model2, arrays2, dims2, cfg2 = setup(tmp_path / "m")
    mesh = make_mesh(8)
    t_mesh = Trainer(model2, arrays2, dims2, cfg2, mesh=mesh)
    assert cfg2.training.batch_size % mesh.shape["data"] == 0
    loss_mesh = [t_mesh.train_epoch(e, jax.random.fold_in(rng, e))
                 for e in range(2)]

    np.testing.assert_allclose(loss_single, loss_mesh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        sel_single, t_mesh._last_train_sel, rtol=1e-4, atol=1e-5
    )
    # sel < loss: the AR CE+L2 term is excluded from selection.
    assert sel_single < loss_single[-1]
    # AR couplings trained identically across the mesh boundary.
    np.testing.assert_allclose(
        np.asarray(t_single.params["ar_coupling"]),
        np.asarray(t_mesh.params["ar_coupling"]),
        rtol=1e-3, atol=1e-4,
    )
