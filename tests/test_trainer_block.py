"""Epoch-block dispatch (training.epochs_per_dispatch > 1).

The block path must reproduce the per-epoch loop's numerics: same
per-epoch train/val losses, same plateau-LR trajectory, same best
checkpoint — with host syncs reduced to one per block.
"""

import copy

import jax
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import OsteosarcomaArrays
from osteosarcoma_diffusionmodel_tpu.training.trainer import Trainer, build_model


def small_setup(tmp_path, n=40, batch=8, epochs=12, plateau_patience=2):
    rng = np.random.default_rng(0)
    m_dim, e_dim, p_dim = 6, 20, 4
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 8
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    cfg.training.batch_size = batch
    cfg.training.num_epochs = epochs
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.training.val_split = 0.25
    cfg.training.lr_plateau_patience = plateau_patience
    cfg.training.save_frequency = 5
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


def test_block_matches_per_epoch_loop(tmp_path):
    model, arrays, dims, cfg = small_setup(tmp_path / "a")
    t_epoch = Trainer(model, arrays, dims, cfg)
    hist_epoch = t_epoch.train()

    cfg_b = copy.deepcopy(cfg)
    cfg_b.training.save_dir = str(tmp_path / "b" / "ckpt")
    cfg_b.training.epochs_per_dispatch = 5  # 12 epochs -> blocks of 5,5,2
    model_b, arrays_b, dims_b, _ = small_setup(tmp_path / "b")
    t_block = Trainer(model_b, arrays_b, dims_b, cfg_b)
    hist_block = t_block.train()

    np.testing.assert_allclose(
        hist_block.train_loss, hist_epoch.train_loss, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        hist_block.val_loss, hist_epoch.val_loss, rtol=2e-4, atol=2e-5
    )
    # Final params match (same update sequence including plateau LR;
    # identical construction -> identical tree structure/leaf order).
    for a, b in zip(
        jax.tree_util.tree_leaves(t_epoch.params),
        jax.tree_util.tree_leaves(t_block.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
        )
    # Plateau LR trajectory ended at the same value.
    assert t_block.plateau.lr == pytest.approx(t_epoch.plateau.lr, rel=1e-6)


def test_block_best_checkpoint_matches(tmp_path):
    from osteosarcoma_diffusionmodel_tpu.training.checkpoint import BEST_NAME

    model, arrays, dims, cfg = small_setup(tmp_path / "a", epochs=8)
    t_epoch = Trainer(model, arrays, dims, cfg)
    t_epoch.train()
    best_epoch_state = t_epoch.checkpoints.restore(
        BEST_NAME, t_epoch.state_dict(0, 0.0)
    )

    cfg_b = copy.deepcopy(cfg)
    cfg_b.training.save_dir = str(tmp_path / "b" / "ckpt")
    cfg_b.training.epochs_per_dispatch = 3
    model_b, arrays_b, dims_b, _ = small_setup(tmp_path / "b", epochs=8)
    t_block = Trainer(model_b, arrays_b, dims_b, cfg_b)
    t_block.train()
    best_block_state = t_block.checkpoints.restore(
        BEST_NAME, t_block.state_dict(0, 0.0)
    )

    assert best_block_state["epoch"] == best_epoch_state["epoch"]
    assert best_block_state["val_loss"] == pytest.approx(
        best_epoch_state["val_loss"], rel=2e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(best_epoch_state["params"]),
        jax.tree_util.tree_leaves(best_block_state["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
        )


def test_block_early_stopping_overshoots_at_most_block(tmp_path):
    model, arrays, dims, cfg = small_setup(tmp_path, epochs=40)
    cfg.training.patience = 3
    cfg.training.min_delta = 10.0  # every epoch counts as no-improvement
    cfg.training.epochs_per_dispatch = 4
    t = Trainer(model, arrays, dims, cfg)
    hist = t.train()
    # Stop requested at epoch 4 (patience 3 after the first); block
    # granularity means we trained at most one extra block.
    assert len(hist.train_loss) <= 8
    assert t.early_stopping.early_stop


def test_block_resume_continues(tmp_path):
    model, arrays, dims, cfg = small_setup(tmp_path, epochs=10)
    cfg.training.epochs_per_dispatch = 5
    t = Trainer(model, arrays, dims, cfg)
    t.train()

    model2, arrays2, dims2, _ = small_setup(tmp_path, epochs=10)
    cfg2 = copy.deepcopy(cfg)
    cfg2.training.num_epochs = 15
    t2 = Trainer(model2, arrays2, dims2, cfg2)
    t2.train(resume=True)
    # Resumed from the epoch-9 periodic checkpoint -> only 5 more epochs.
    assert len(t2.history.train_loss) == 5


def test_block_on_mesh_with_odd_val_group(tmp_path):
    """Block dispatch under the virtual 8-device mesh: the trailing
    validation group (n_val=10, batch 8 -> groups of 8 and 2) must stay
    replicated instead of hitting an uneven sharding constraint
    (code-review finding), and losses must match single-device block
    training."""
    from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh

    model, arrays, dims, cfg = small_setup(tmp_path / "s", epochs=4)
    cfg.training.epochs_per_dispatch = 2
    t_single = Trainer(model, arrays, dims, cfg)
    hist_single = t_single.train()

    model_m, arrays_m, dims_m, cfg_m = small_setup(tmp_path / "m", epochs=4)
    cfg_m.training.epochs_per_dispatch = 2
    t_mesh = Trainer(model_m, arrays_m, dims_m, cfg_m, mesh=make_mesh(8))
    hist_mesh = t_mesh.train()

    np.testing.assert_allclose(
        hist_mesh.train_loss, hist_single.train_loss, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        hist_mesh.val_loss, hist_single.val_loss, rtol=1e-3, atol=1e-4
    )


def test_block_gate_uses_effective_batch(tmp_path):
    """batch_size larger than the cohort must gate on the effective
    batch (min with cohort), not the configured one."""
    from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh

    # n=20 -> train 15 with val_split .25; batch 256 -> effective 15,
    # not divisible by 8 -> must fall back to per-epoch dispatch, not
    # crash in the block path.
    model, arrays, dims, cfg = small_setup(
        tmp_path, n=20, batch=256, epochs=2
    )
    cfg.training.epochs_per_dispatch = 2
    t = Trainer(model, arrays, dims, cfg, mesh=make_mesh(8))
    hist = t.train()
    assert len(hist.train_loss) == 2
    assert np.isfinite(hist.train_loss).all()


def test_block_resume_preserves_reduced_lr(tmp_path):
    """A plateau-reduced LR restored from checkpoint must survive the
    first block (code-review finding: it used to reset to base LR)."""
    from osteosarcoma_diffusionmodel_tpu.training.trainer import (
        _get_learning_rate,
        _set_learning_rate,
    )

    model, arrays, dims, cfg = small_setup(tmp_path, epochs=10)
    cfg.training.epochs_per_dispatch = 5
    cfg.training.save_frequency = 5
    t = Trainer(model, arrays, dims, cfg)
    # Simulate a plateau reduction having happened before checkpointing.
    t.opt_state = _set_learning_rate(t.opt_state, 2.5e-5)
    t.train()

    model2, arrays2, dims2, _ = small_setup(tmp_path, epochs=10)
    cfg2 = copy.deepcopy(cfg)
    cfg2.training.num_epochs = 15
    t2 = Trainer(model2, arrays2, dims2, cfg2)
    t2.train(resume=True)
    # min_delta/patience defaults never *raise* the LR; it must still be
    # at (or below) the reduced value, not back at the 1e-4 base.
    assert _get_learning_rate(t2.opt_state) <= 2.5e-5 + 1e-12
    assert t2.plateau.lr <= 2.5e-5 + 1e-12


def test_block_matches_per_epoch_loop_with_ar_head(tmp_path):
    """The production preset (epochs_per_dispatch: 25) combined with
    diffusion.ar_mutation_head: the block scan must carry the
    multi-transform (main AdamW + dedicated AR Adam) state, the
    side-head-free sel losses, AND the raw-batch AR CE routing
    (diffusion.loss ar_x0) identically to the per-epoch loop."""
    def setup(path):
        model, arrays, dims, cfg = None, None, None, None
        rng = np.random.default_rng(0)
        m_dim, e_dim, p_dim = 6, 20, 4
        cfg = Config()
        cfg.model.hidden_dims = [32, 64, 32]
        cfg.model.latent_dim = 16
        cfg.model.diffusion.num_steps = 8
        cfg.model.diffusion.ar_mutation_head = True
        cfg.model.compute_dtype = "float32"
        cfg.model.constraints.enabled = False
        cfg.training.batch_size = 8
        cfg.training.num_epochs = 12
        cfg.training.save_dir = str(path / "ckpt")
        cfg.training.val_split = 0.25
        cfg.training.lr_plateau_patience = 2
        cfg.training.save_frequency = 5
        dims = cfg.freeze_dims(m_dim, e_dim, p_dim, ["a", "b", "c"])
        data = rng.normal(size=(40, dims.data_dim)).astype(np.float32)
        data[:, :m_dim] = (data[:, :m_dim] > 0).astype(np.float32)
        arrays = OsteosarcomaArrays(
            data=data,
            conditions=rng.normal(size=(40, 3)).astype(np.float32),
            survival=rng.uniform(100, 2000, size=40).astype(np.float32),
            sample_ids=[f"P{i}" for i in range(40)],
            mutation_genes=[f"M{i}" for i in range(m_dim)],
            expression_genes=[f"E{i}" for i in range(e_dim)],
            pathway_names=[f"PW{i}" for i in range(p_dim)],
            condition_names=["a", "b", "c"],
        )
        model = build_model(cfg, dims)
        return model, arrays, dims, cfg

    model, arrays, dims, cfg = setup(tmp_path / "a")
    t_epoch = Trainer(model, arrays, dims, cfg)
    hist_epoch = t_epoch.train()

    model_b, arrays_b, dims_b, cfg_b = setup(tmp_path / "b")
    cfg_b.training.epochs_per_dispatch = 5
    t_block = Trainer(model_b, arrays_b, dims_b, cfg_b)
    hist_block = t_block.train()

    np.testing.assert_allclose(
        hist_block.train_loss, hist_epoch.train_loss, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        hist_block.val_loss, hist_epoch.val_loss, rtol=2e-4, atol=2e-5
    )
    # AR couplings trained identically and actually moved from init.
    w_e = np.asarray(t_epoch.params["ar_coupling"])
    w_b = np.asarray(t_block.params["ar_coupling"])
    np.testing.assert_allclose(w_b, w_e, rtol=1e-3, atol=1e-4)
    assert np.abs(w_e).max() > 0.05, "AR couplings did not train"
