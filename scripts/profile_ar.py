#!/usr/bin/env python3
"""AR-mutation-head performance anatomy (round-3 VERDICT weak #3).

The committed round-3 demos showed the AR preset training at 9.77
steps/sec vs 331 for the default preset (34x) and generating 10k in
1403 s vs 342 s (4x) — but those runs differed in more than the AR
flag (dispatch mode, compile-cache state, tunnel load). This script
measures both presets back-to-back in ONE session under identical
conditions and separates compile from steady state, so the real
AR-intrinsic cost is isolated:

  train:    per-epoch vs block dispatch, first-block (compile) vs
            steady-state epoch seconds, steps/sec
  generate: fused-kernel engagement (the round-3 open question:
            supports_fused does not exclude the AR head — does the
            fused path actually run?), raw-sampling compile + steady
            wall-clock at 10002, AR bit-draw compile + steady

Writes PROFILE_AR.json. Run on the TPU:
  PROFILE_EPOCHS=75 python scripts/profile_ar.py
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if os.environ.get("OSDM_FORCE_CPU"):
    # The axon sitecustomize force-appends its platform regardless of
    # JAX_PLATFORMS; config-update after import is the only reliable
    # CPU pin for standalone scripts (tests/conftest.py does the same).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.data.dataset import (  # noqa: E402
    make_dummy_data,
    prepare_arrays,
)
from osteosarcoma_diffusionmodel_tpu.generation.generator import (  # noqa: E402
    SyntheticPatientGenerator,
)
from osteosarcoma_diffusionmodel_tpu.models.diffusion import (  # noqa: E402
    ConditionalDiffusion,
)
from osteosarcoma_diffusionmodel_tpu.training.trainer import Trainer  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.utils.profiling import (  # noqa: E402
    enable_compilation_cache,
)

N_COHORT = int(os.environ.get("PROFILE_N", 400))
N_GEN = int(os.environ.get("PROFILE_GEN", 10002))
EPOCHS = int(os.environ.get("PROFILE_EPOCHS", 75))
BLOCK = int(os.environ.get("PROFILE_BLOCK", 25))
N_EXPR = int(os.environ.get("PROFILE_EXPR", 5054))  # CPU smoke: shrink


def build(workdir: Path, ar: bool, epochs_per_dispatch: int,
          num_epochs: int):
    cfg = Config()
    cfg.data.processed_dir = str(workdir / "processed")
    cfg.training.num_epochs = num_epochs
    cfg.training.patience = num_epochs
    cfg.training.epochs_per_dispatch = epochs_per_dispatch
    cfg.training.save_dir = str(workdir / ("ckpt_ar" if ar else "ckpt"))
    cfg.model.diffusion.ar_mutation_head = ar
    cfg.generation.calibrate_marginals = False
    cfg.generation.batch_scenarios = True
    arrays, dims = prepare_arrays(cfg)
    model = ConditionalDiffusion.from_config(cfg, dims)
    trainer = Trainer(model, arrays, dims, cfg)
    return cfg, arrays, dims, model, trainer


def profile_training(trainer, label: str, out: dict):
    t0 = time.perf_counter()
    history = trainer.train()
    wall = time.perf_counter() - t0
    es = history.epoch_seconds
    k = trainer.config.training.epochs_per_dispatch
    # Block mode stores dt/E repeated per epoch; the first block is
    # compile-inclusive, later blocks are steady. With no post-first-
    # block epochs there IS no steady-state sample — emit None rather
    # than silently passing the compile-inclusive mean off as steady
    # (round-4 ADVICE).
    steady = float(np.mean(es[k:])) if len(es) > k else None
    n_batches = max(
        len(trainer.train_idx)
        // min(trainer.config.training.batch_size, len(trainer.train_idx)),
        1,
    )
    out[label] = {
        "wall_sec": wall,
        "first_block_sec_per_epoch": float(np.mean(es[:k])),
        "steady_sec_per_epoch": steady,
        "steady_steps_per_sec": n_batches / steady if steady else None,
        "reported_steps_per_sec": history.steps_per_sec,
        "epochs": len(es),
    }
    print(label, json.dumps(out[label]), flush=True)
    return history


def profile_generation(gen, dims, label: str, out: dict):
    rng = jax.random.PRNGKey(7)
    cond = gen.create_conditions(N_GEN, None, rng)

    t0 = time.perf_counter()
    fused = gen._get_fused(gen.params)
    probe_sec = time.perf_counter() - t0
    res = {"fused_engaged": fused is not False, "fused_probe_sec": probe_sec}

    t0 = time.perf_counter()
    s = gen._sample_raw(cond, jax.random.fold_in(rng, 1))
    float(jnp.asarray(s)[0, 0])
    res["raw_sample_first_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    s = gen._sample_raw(cond, jax.random.fold_in(rng, 2))
    float(jnp.asarray(s)[0, 0])
    res["raw_sample_steady_sec"] = time.perf_counter() - t0
    res["raw_patients_per_sec_steady"] = N_GEN / res["raw_sample_steady_sec"]

    t0 = time.perf_counter()
    s_host = np.asarray(s, np.float32)
    res["readback_sec"] = time.perf_counter() - t0

    if getattr(gen.model, "ar_head", False):
        m = dims.mutation_dim
        continuous = s_host[:, m:]
        cond_np = np.asarray(cond)
        t0 = time.perf_counter()
        bits = gen._ar_bits(continuous, cond_np)
        res["ar_bits_first_sec"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        bits = gen._ar_bits(continuous, cond_np)
        res["ar_bits_steady_sec"] = time.perf_counter() - t0
        res["ar_bits_mean"] = float(bits.mean())

        t0 = time.perf_counter()
        post = gen._postprocess(s_host, cond_np)
        res["postprocess_sec"] = time.perf_counter() - t0
        del post

    out[label] = res
    print(label, json.dumps(res), flush=True)


def main():
    enable_compilation_cache()
    workdir = Path(tempfile.mkdtemp(prefix="osdm_profile_ar_"))
    make_dummy_data(
        workdir / "processed", n_samples=N_COHORT,
        n_mutation_genes=62, n_expression_genes=N_EXPR, n_pathways=26,
        seed=0,
    )
    out = {"n_cohort": N_COHORT, "epochs": EPOCHS, "block": BLOCK,
           "n_gen": N_GEN, "n_expression": N_EXPR,
           # Stamp the backend so CPU smoke artifacts can't be read as
           # TPU measurements.
           "platform": jax.devices()[0].platform}

    for ar in (False, True):
        tag = "ar" if ar else "default"
        # Block dispatch (the production mode for full demos).
        cfg, arrays, dims, model, trainer = build(workdir, ar, BLOCK, EPOCHS)
        profile_training(trainer, f"train_{tag}_block{BLOCK}", out)
        params = trainer.params

        # Short per-epoch-dispatch run for the dispatch-mode delta.
        _, _, _, _, t1 = build(workdir, ar, 1, 10)
        profile_training(t1, f"train_{tag}_per_epoch", out)

        gen = SyntheticPatientGenerator(model, params, cfg, dims)
        profile_generation(gen, dims, f"gen_{tag}", out)

    with open(REPO / "PROFILE_AR.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
