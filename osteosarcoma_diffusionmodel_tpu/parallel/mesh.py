"""Device mesh and sharding utilities.

The reference has no distributed execution at all (SURVEY §2: no
torch.distributed/NCCL/DDP anywhere; single device string at reference
train.py:160). The TPU-native equivalent is JAX SPMD: a `Mesh` over
the slice's chips with `NamedSharding` annotations; XLA inserts the
ICI collectives.

Axes:
- ``data``: batch/cohort axis — the scaling axis for both training and
  large-cohort sampling (10k+ synthetic patients sharded over chips).
- ``model``: optional tensor-parallel axis sharding the denoiser's
  hidden features; only worth it on multi-chip meshes (the model is
  <10M params, so this exists to keep the design mesh-general, per
  SURVEY §2 "keep the mesh abstract").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization hook (optional future-proofing;
    single-slice ICI needs nothing — SURVEY §2 notes multi-host is not
    required for parity but the mesh abstraction should allow it).

    No-ops when no coordinator is configured (env or args).
    """
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", 1))
    if process_id is None:
        # NOTE: `process_id or ...` would misroute an explicit 0 when
        # the env carries a different id — 0 is a valid process id.
        process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are visible"
            )
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/cohort) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device_put arrays with the batch axis sharded over `data`."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def denoiser_param_sharding(mesh: Mesh, params) -> dict:
    """Tensor-parallel NamedShardings for the denoiser param tree.

    Strategy: shard every Dense kernel's *output* features over the
    `model` axis when that axis has >1 device; biases and norm scales
    follow the same feature axis. XLA then runs the MLP as a
    column-parallel matmul with an all-gather at block boundaries —
    the standard Megatron-style split, expressed purely via shardings.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        if model_size == 1 or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        last = leaf.shape[-1]
        if last % model_size == 0 and last >= 128:
            if leaf.ndim == 2:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
