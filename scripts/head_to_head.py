#!/usr/bin/env python3
"""Head-to-head quality measurement: reference (torch, CPU) vs this
framework, trained and validated on the SAME structured dummy cohort.

Round-1 VERDICT item 3: BASELINE demands "MMD/KS parity within 1%" but
the reference's published numbers are doc examples, never measured. This
script produces the measured comparison:

1. builds one fixture cohort (100 x 5142, seed 0 — the same generator
   tests and the full-scale demo use),
2. runs the REFERENCE pipeline (train -> generate -> validate) from
   /root/reference in-process on torch CPU (its dead torch_geometric
   import stubbed, its main-module torch import bug patched — SURVEY §7
   "known reference bugs"),
3. runs THIS framework's pipeline on the identical CSVs,
4. measures the MMD noise floor at n=100 (real-vs-real split halves and
   real vs bootstrap-resampled cohort),
5. writes HEAD_TO_HEAD.json with everything side by side.

Both sides see the same epochs/batch/cohort; each uses its own default
generation settings (the reference: 0.5-threshold mutations; ours:
copula calibration — that IS the framework difference being measured).
"""

import json
import os
import sys
import time
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))

EPOCHS = int(os.environ.get("H2H_EPOCHS", 600))
N_SYNTH = int(os.environ.get("H2H_SYNTH", 999))  # 3 scenarios x 333


def stub_torch_geometric():
    """The reference imports GATConv at module scope for a class it
    never instantiates (reference models/diffusion.py:9,14-88 — dead
    code per SURVEY §2); torch_geometric is not installed here."""
    fake = types.ModuleType("torch_geometric")
    fake_nn = types.ModuleType("torch_geometric.nn")
    fake_nn.GATConv = object
    fake_nn.global_mean_pool = lambda *a, **k: None
    fake.nn = fake_nn
    sys.modules["torch_geometric"] = fake
    sys.modules["torch_geometric.nn"] = fake_nn


def make_fixture(processed_dir: Path):
    from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data

    make_dummy_data(
        processed_dir, n_samples=100,
        n_mutation_genes=62, n_expression_genes=5054, n_pathways=26,
    )


def run_reference(workdir: Path, processed_dir: Path) -> dict:
    import yaml

    stub_torch_geometric()
    sys.path.insert(0, str(REFERENCE))

    with open(REFERENCE / "config" / "config.yaml") as f:
        config = yaml.safe_load(f)
    config["data"]["processed_dir"] = str(processed_dir)
    config["data"]["raw_dir"] = str(workdir / "raw")
    config["training"]["num_epochs"] = EPOCHS
    config["training"]["patience"] = EPOCHS  # same no-early-stop as ours
    config["training"]["save_dir"] = str(workdir / "checkpoints")
    config["generation"]["num_synthetic_samples"] = N_SYNTH
    config["output"]["results_dir"] = str(workdir / "results")
    config["output"]["figures_dir"] = str(workdir / "results/figures")
    config["output"]["models_dir"] = str(workdir / "results/models")
    config["output"]["synthetic_data_dir"] = str(workdir / "results/synthetic")

    # The reference writes config/config_updated.yaml relative to cwd
    # (reference main.py:183-184) — run from the workdir so nothing
    # touches the read-only reference checkout.
    prev_cwd = os.getcwd()
    os.chdir(workdir)
    (workdir / "config").mkdir(exist_ok=True)
    try:
        import main as ref_main

        # Reference bug (SURVEY §7): generate_synthetic_patients uses
        # torch but main.py only imports it under __main__.
        import torch

        ref_main.torch = torch
        torch.manual_seed(0)

        out = {}
        t0 = time.perf_counter()
        ref_main.train_model(config)
        out["train_sec"] = time.perf_counter() - t0

        # train_model persisted config_updated.yaml; the generate step
        # prefers it (reference main.py:199-202).
        t0 = time.perf_counter()
        ref_main.generate_synthetic_patients(config)
        out["generate_sec"] = time.perf_counter() - t0
        out["patients_per_sec"] = N_SYNTH / out["generate_sec"]

        t0 = time.perf_counter()
        results = ref_main.validate_synthetic_patients(config)
        out["validate_sec"] = time.perf_counter() - t0
        out["validation"] = {k: float(v) for k, v in results.items()}
        return out
    finally:
        os.chdir(prev_cwd)
        sys.path.remove(str(REFERENCE))


def run_ours(workdir: Path, processed_dir: Path) -> dict:
    from osteosarcoma_diffusionmodel_tpu.cli import (
        generate_synthetic_patients,
        train_model,
        validate_synthetic_patients,
    )
    from osteosarcoma_diffusionmodel_tpu.config import Config

    cfg = Config()
    cfg.data.processed_dir = str(processed_dir)
    cfg.training.num_epochs = EPOCHS
    cfg.training.patience = EPOCHS
    # Block dispatch: per-epoch semantics on device, one host sync per
    # 25 epochs (the per-epoch sync dominated at n=100 on the tunneled
    # backend and made "train 600 epochs" look dispatch-bound).
    cfg.training.epochs_per_dispatch = 25
    cfg.training.save_dir = str(workdir / "ckpt")
    cfg.generation.num_synthetic_samples = N_SYNTH
    cfg.output.results_dir = str(workdir / "results")
    cfg.output.synthetic_data_dir = str(workdir / "results" / "synthetic")

    prev_cwd = os.getcwd()
    os.chdir(workdir)  # config_updated.yaml parity behavior
    try:
        out = {}
        t0 = time.perf_counter()
        train_model(cfg)
        out["train_sec"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        generate_synthetic_patients(cfg)
        out["generate_sec"] = time.perf_counter() - t0
        out["patients_per_sec"] = N_SYNTH / out["generate_sec"]

        t0 = time.perf_counter()
        results = validate_synthetic_patients(cfg)
        out["validate_sec"] = time.perf_counter() - t0
        out["validation"] = {k: float(v) for k, v in results.items()}
        return out
    finally:
        os.chdir(prev_cwd)


def mmd_noise_floor(processed_dir: Path, n_boot: int = 20) -> dict:
    """MMD floor at n=100: (a) disjoint 50/50 split halves, (b) the full
    real cohort vs a bootstrap resample of size N_SYNTH — the best any
    generator reproducing the empirical distribution could score."""
    import numpy as np
    import pandas as pd

    import jax.numpy as jnp
    from osteosarcoma_diffusionmodel_tpu.ops.stats import mmd_rbf

    mut = pd.read_csv(processed_dir / "mutation_matrix_aligned.csv", index_col=0)
    expr = pd.read_csv(processed_dir / "expression_matrix_aligned.csv", index_col=0)
    path = pd.read_csv(processed_dir / "pathway_scores.csv", index_col=0)
    data = np.concatenate(
        [mut.values, expr.values, path.values], axis=1
    ).astype(np.float32)

    rng = np.random.default_rng(0)
    split_vals, boot_vals = [], []
    n = data.shape[0]
    for _ in range(n_boot):
        perm = rng.permutation(n)
        a, b = data[perm[: n // 2]], data[perm[n // 2:]]
        split_vals.append(float(mmd_rbf(jnp.asarray(a), jnp.asarray(b))))
        resample = data[rng.integers(0, n, size=N_SYNTH)]
        boot_vals.append(float(mmd_rbf(jnp.asarray(data), jnp.asarray(resample))))
    return {
        "split_half_mean": float(np.mean(split_vals)),
        "split_half_std": float(np.std(split_vals)),
        "bootstrap_vs_full_mean": float(np.mean(boot_vals)),
        "bootstrap_vs_full_std": float(np.std(boot_vals)),
        "n_boot": n_boot,
    }


def main():
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="h2h_"))
    print(f"workdir: {root}", flush=True)
    processed = root / "processed"
    make_fixture(processed)
    # The reference's preprocessor never writes metastasis_at_diagnosis
    # to clinical_aligned.csv (reference preprocessor.py:218 vs
    # train.py:395, SURVEY L2 note); drop it so both frameworks see the
    # authentic 3-condition artifact schema — otherwise the reference
    # trips its own condition-dim mismatch bug when saving conditions.
    import pandas as pd

    clin_path = processed / "clinical_aligned.csv"
    pd.read_csv(clin_path).drop(
        columns=["metastasis_at_diagnosis"], errors="ignore"
    ).to_csv(clin_path, index=False)
    # The reference's prepare_data computes pathway scores lazily if the
    # CSV is missing (reference train.py:365-379); ours writes it via the
    # pathways step. Pre-compute once with OUR pathway step so both read
    # the identical pathway_scores.csv.
    from osteosarcoma_diffusionmodel_tpu.cli import compute_pathway_features
    from osteosarcoma_diffusionmodel_tpu.config import Config

    cfg = Config()
    cfg.data.processed_dir = str(processed)
    cfg.output.results_dir = str(root / "unused_results")
    compute_pathway_features(cfg)

    report = {"epochs": EPOCHS, "n_synth": N_SYNTH}

    print("=== measuring MMD noise floor ===", flush=True)
    report["mmd_noise_floor"] = mmd_noise_floor(processed)
    print(json.dumps(report["mmd_noise_floor"], indent=2), flush=True)

    print("=== running OURS (TPU/JAX) ===", flush=True)
    ours_dir = root / "ours"
    ours_dir.mkdir()
    report["ours"] = run_ours(ours_dir, processed)

    print("=== running REFERENCE (torch CPU) ===", flush=True)
    ref_dir = root / "reference"
    ref_dir.mkdir()
    report["reference"] = run_reference(ref_dir, processed)

    with open(REPO / "HEAD_TO_HEAD.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
