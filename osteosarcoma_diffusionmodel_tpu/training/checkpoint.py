"""Orbax checkpointing with self-describing metadata.

TPU-native equivalent of the reference's torch.save checkpoints
(reference utils/train.py:275-294): periodic `checkpoint_epoch_N` +
`best_model`, each carrying {params, opt_state, batch_stats, epoch,
val_loss}. A `metadata.json` records dims/condition names/config so the
loader can rebuild the exact architecture without weight-shape
introspection (the reference reverse-engineers the condition dim from
a weight shape at generate.py:247-248; here it's recorded explicitly).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..config import Config, FrozenDims

logger = logging.getLogger(__name__)

METADATA_FILE = "metadata.json"
DATA_STATS_FILE = "data_stats.npz"
BEST_NAME = "best_model"
EPOCH_RE = re.compile(r"checkpoint_epoch_(\d+)$")


def save_data_stats(save_dir: Path, arrays) -> None:
    """Persist per-feature training-cohort statistics alongside the
    checkpoint, used by generation-time marginal calibration."""
    import numpy as np

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    m = len(arrays.mutation_genes)
    np.savez_compressed(
        save_dir / DATA_STATS_FILE,
        feature_mean=arrays.data.mean(axis=0),
        feature_std=arrays.data.std(axis=0),
        mutation_freq=arrays.data[:, :m].mean(axis=0),
        # Sorted per-feature values: the empirical quantile function for
        # full quantile-mapping calibration.
        feature_sorted=np.sort(arrays.data, axis=0),
        # Real binary mutation block (n x m, tiny): the copula
        # calibration fits its tetrachoric correlation at generation
        # time (ops/copula.py).
        mutation_matrix=arrays.data[:, :m],
        # Full real cohort (n x D, ~2 MB at production dims): the
        # "copula_full" calibration fits the continuous block's
        # latent-Gaussian correlation from it.
        data_matrix=arrays.data,
        # Training condition distribution (model input space): serving
        # drift monitoring compares requested conditions against it
        # (serving/monitoring.py DriftMonitor).
        condition_mean=arrays.conditions.mean(axis=0),
        condition_std=arrays.conditions.std(axis=0),
    )


def load_data_stats(save_dir: Path):
    import numpy as np

    path = Path(save_dir) / DATA_STATS_FILE
    if not path.exists():
        return None
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def save_metadata(save_dir: Path, config: Config, dims: FrozenDims) -> None:
    save_dir.mkdir(parents=True, exist_ok=True)
    meta = {
        "dims": dataclasses.asdict(dims),
        "config": config.to_dict(),
    }
    with open(save_dir / METADATA_FILE, "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_metadata(save_dir: Path) -> Optional[Dict[str, Any]]:
    path = Path(save_dir) / METADATA_FILE
    if not path.exists():
        return None
    with open(path) as f:
        return json.load(f)


def metadata_to_dims(meta: Dict[str, Any]) -> FrozenDims:
    d = dict(meta["dims"])
    d.pop("condition_dim", None)
    names = d.pop("condition_names", [])
    return FrozenDims(condition_dim=len(names), condition_names=names, **d)


class CheckpointManager:
    """Thin wrapper over orbax for the reference's best/periodic policy."""

    def __init__(self, save_dir: str | Path):
        self.save_dir = Path(save_dir).resolve()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self._checkpointer = ocp.StandardCheckpointer()

    def save(
        self, name: str, state: Dict[str, Any], overwrite: bool = True,
        wait: bool = False,
    ):
        """Start an (async) checkpoint write.

        Orbax's StandardCheckpointer writes asynchronously; we wait for
        the *previous* save before starting a new one, so checkpoint I/O
        overlaps the following training epochs instead of stalling each
        epoch (the reference blocks on every torch.save).
        """
        self._checkpointer.wait_until_finished()
        # Snapshot to host before the async write: the training loop
        # donates its state buffers, so the writer must not read device
        # memory that the next step will invalidate.
        state = jax.device_get(state)
        path = self.save_dir / name
        self._checkpointer.save(path, state, force=overwrite)
        if wait:
            self._checkpointer.wait_until_finished()

    def wait(self) -> None:
        self._checkpointer.wait_until_finished()

    def save_epoch(
        self, epoch: int, state: Dict[str, Any], is_best: bool = False
    ) -> None:
        self.save(f"checkpoint_epoch_{epoch}", state)
        if is_best:
            self.save(BEST_NAME, state)
            logger.info("Saved best model at epoch %d", epoch)

    def restore(self, name: str, abstract_state: Optional[Dict[str, Any]] = None):
        self._checkpointer.wait_until_finished()
        path = self.save_dir / name
        if abstract_state is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, abstract_state
            )
            return self._checkpointer.restore(path, abstract)
        return self._checkpointer.restore(path)

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for child in self.save_dir.iterdir():
            m = EPOCH_RE.search(child.name)
            if m:
                epochs.append(int(m.group(1)))
        return max(epochs) if epochs else None

    def has_best(self) -> bool:
        return (self.save_dir / BEST_NAME).exists()
