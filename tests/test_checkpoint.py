"""Checkpoint manager: async save/restore, metadata round-trip."""

import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.training.checkpoint import (
    CheckpointManager,
    load_metadata,
    metadata_to_dims,
    save_metadata,
)


def make_state(scale=1.0):
    return {
        "params": {"w": jnp.full((4, 4), scale), "b": jnp.zeros((4,))},
        "epoch": 3,
        "val_loss": 0.5,
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path)
    state = make_state()
    mgr.save("best_model", state, wait=True)
    restored = mgr.restore("best_model", state)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["epoch"]) == 3


def test_async_save_then_wait(tmp_path):
    mgr = CheckpointManager(tmp_path)
    mgr.save("ckpt_a", make_state(1.0))  # async
    mgr.save("ckpt_b", make_state(2.0))  # waits for a, starts b
    mgr.wait()
    ra = mgr.restore("ckpt_a", make_state())
    rb = mgr.restore("ckpt_b", make_state())
    assert float(np.asarray(ra["params"]["w"])[0, 0]) == 1.0
    assert float(np.asarray(rb["params"]["w"])[0, 0]) == 2.0


def test_overwrite_best(tmp_path):
    mgr = CheckpointManager(tmp_path)
    mgr.save_epoch(1, make_state(1.0), is_best=True)
    mgr.save_epoch(2, make_state(9.0), is_best=True)
    mgr.wait()
    best = mgr.restore("best_model", make_state())
    assert float(np.asarray(best["params"]["w"])[0, 0]) == 9.0
    assert mgr.has_best()


def test_latest_epoch(tmp_path):
    mgr = CheckpointManager(tmp_path)
    assert mgr.latest_epoch() is None
    mgr.save_epoch(4, make_state())
    mgr.save_epoch(19, make_state())
    mgr.wait()
    assert mgr.latest_epoch() == 19


def test_metadata_roundtrip(tmp_path):
    cfg = Config()
    dims = cfg.freeze_dims(10, 20, 5, ["a", "b"], survival_mean=700.0,
                           survival_std=300.0)
    save_metadata(tmp_path, cfg, dims)
    meta = load_metadata(tmp_path)
    assert meta is not None
    dims2 = metadata_to_dims(meta)
    assert dims2.mutation_dim == 10
    assert dims2.data_dim == 35
    assert dims2.condition_names == ["a", "b"]
    assert dims2.condition_dim == 2
    assert dims2.survival_mean == 700.0
    # Config round-trips through metadata too.
    cfg2 = Config.from_dict(meta["config"])
    assert cfg2.model.architecture == cfg.model.architecture


def test_load_metadata_missing(tmp_path):
    assert load_metadata(tmp_path / "nope") is None
