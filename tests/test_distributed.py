"""Real multi-process `jax.distributed` exercise (round-2 VERDICT weak
#7): two CPU processes form one 4-device global mesh, run one sharded
diffusion train step (loss + grad through the actual model), and must
agree on the replicated result.

This covers the code path the single-process virtual mesh cannot —
`parallel.mesh.initialize_distributed` actually calling
`jax.distributed.initialize`, cross-process global Arrays, and the
collectives XLA inserts between processes."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["OSDM_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from osteosarcoma_diffusionmodel_tpu.parallel.mesh import (
    batch_sharding, initialize_distributed, make_mesh, replicated,
)

initialize_distributed(
    coordinator_address=os.environ["OSDM_COORD"],
    num_processes=int(os.environ["OSDM_NPROC"]),
    process_id=int(os.environ["OSDM_PID"]),
)
assert jax.process_count() == int(os.environ["OSDM_NPROC"])
assert jax.device_count() == 4  # 2 procs x 2 local CPU devices

import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
    ConditionalDiffusion,
)

cfg = Config()
cfg.model.hidden_dims = [16, 32, 16]
cfg.model.diffusion.num_steps = 4
cfg.model.compute_dtype = "float32"
cfg.model.constraints.enabled = False
dims = cfg.freeze_dims(4, 8, 2, ["a", "b", "c"])
model = ConditionalDiffusion.from_config(cfg, dims)
params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)

mesh = make_mesh()  # all 4 global devices on the data axis
data_shard = batch_sharding(mesh)
rep = replicated(mesh)

B, D, C = 8, dims.data_dim, dims.condition_dim
full_x = (np.arange(B * D, dtype=np.float32).reshape(B, D) % 7) / 7.0
full_c = (np.arange(B * C, dtype=np.float32).reshape(B, C) % 3) / 3.0
x0 = jax.make_array_from_callback(
    (B, D), data_shard, lambda idx: full_x[idx]
)
cond = jax.make_array_from_callback(
    (B, C), data_shard, lambda idx: full_c[idx]
)
params = jax.device_put(params, rep)


@jax.jit
def step(p, x, c):
    def loss_fn(pp):
        loss, _ = model.loss(pp, x, c, jax.random.PRNGKey(1),
                             deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(p)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.sum(g * g), grads, 0.0
    )
    return loss, jnp.sqrt(gnorm)

loss, gnorm = step(params, x0, cond)
print(f"RESULT {float(loss):.10f} {float(gnorm):.10f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env_base.update(
        {
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
            "OSDM_REPO": str(REPO),
            "OSDM_COORD": f"127.0.0.1:{port}",
            "OSDM_NPROC": "2",
        }
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, OSDM_PID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        _, loss, gnorm = line.split()
        results.append((float(loss), float(gnorm)))

    # Both processes computed the same replicated loss/grad-norm on the
    # same global batch, and the numbers are real (finite, nonzero).
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert np.isfinite(results[0]).all()
    assert results[0][1] > 0.0
