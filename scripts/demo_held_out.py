#!/usr/bin/env python3
"""Held-out + novelty evaluation protocol (round-2 VERDICT item 2).

The 0.98+ headline scores are measured against the same cohort the
copula calibration is fitted on. This script runs the split-half
protocol that evidences *generation* rather than resampling:

1. Build a cohort of 2N patients; split into fit/holdout halves.
2. Train + calibrate ONLY on the fit half.
3. Run the full validator three ways:
   - synthetic vs fit half      (the in-sample number every demo reports)
   - synthetic vs HOLDOUT half  (the honest generalization number)
   - fit half vs holdout half   (the real-vs-real noise floor: no
     generator can be expected to beat the score two disjoint real
     halves give each other)
4. Novelty metrics (nearest-neighbor ratio, duplicate rates,
   memorization fraction) ride along in each validation.

Writes DEMO_HELD_OUT.json. Env knobs: DEMO_N (per-half cohort size,
default 100), DEMO_EPOCHS (default 200), DEMO_CALIBRATE, DEMO_OUT.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if os.environ.get("OSDM_FORCE_CPU"):
    # Reliable CPU pin on axon-sitecustomize machines (see
    # scripts/demo_full_scale.py); a tunnel-outage hedge — the
    # validation metrics are hardware-independent.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from osteosarcoma_diffusionmodel_tpu.cli import (  # noqa: E402
    compute_pathway_features,
    generate_synthetic_patients,
    train_model,
    validate_synthetic_patients,
)
from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.utils.io import env_flag  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.validation.validator import (  # noqa: E402
    BiologicalValidator,
)


def _split_csvs(src: Path, fit_dir: Path, holdout_dir: Path, seed: int = 0):
    """Split every *_aligned.csv row-wise into disjoint halves."""
    fit_dir.mkdir(parents=True, exist_ok=True)
    holdout_dir.mkdir(parents=True, exist_ok=True)
    names = [
        "mutation_matrix_aligned.csv",
        "expression_matrix_aligned.csv",
        "clinical_aligned.csv",
    ]
    n = len(pd.read_csv(src / names[0], index_col=0))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    fit_idx, hold_idx = np.sort(perm[: n // 2]), np.sort(perm[n // 2:])
    for name in names:
        df = pd.read_csv(src / name, index_col=0)
        df.iloc[fit_idx].to_csv(fit_dir / name)
        df.iloc[hold_idx].to_csv(holdout_dir / name)
    return len(fit_idx), len(hold_idx)


def main():
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import tempfile

    workdir = Path(tempfile.mkdtemp(prefix="osdm_heldout_"))
    os.chdir(workdir)
    print(f"workdir: {workdir}", flush=True)

    n_half = int(os.environ.get("DEMO_N", 100))
    out = {"n_per_half": n_half,
           "platform": jax.devices()[0].platform}

    t0 = time.perf_counter()
    make_dummy_data(
        workdir / "full", n_samples=2 * n_half,
        n_mutation_genes=62, n_expression_genes=5054, n_pathways=26,
    )
    n_fit, n_hold = _split_csvs(
        workdir / "full", workdir / "fit", workdir / "holdout"
    )
    out["split"] = {"fit": n_fit, "holdout": n_hold}

    cfg = Config()
    cfg.data.processed_dir = str(workdir / "fit")
    cfg.training.num_epochs = int(os.environ.get("DEMO_EPOCHS", 200))
    cfg.training.patience = cfg.training.num_epochs
    if "DEMO_CALIBRATE" in os.environ:
        v = os.environ["DEMO_CALIBRATE"]
        cfg.generation.calibrate_marginals = False if v == "false" else v
    if "DEMO_BLOCK" in os.environ:  # epochs per jitted dispatch
        cfg.training.epochs_per_dispatch = int(os.environ["DEMO_BLOCK"])
    if env_flag("DEMO_AR"):  # autoregressive (FVSBN) mutation head
        cfg.model.diffusion.ar_mutation_head = True
    cfg.generation.batch_scenarios = True
    cfg.training.save_dir = str(workdir / "ckpt")
    cfg.generation.num_synthetic_samples = int(
        os.environ.get("DEMO_SAMPLES", 10002)
    )
    cfg.output.results_dir = str(workdir / "results")
    cfg.output.synthetic_data_dir = str(workdir / "results" / "synthetic")

    # Pathway features for both halves (the holdout validation needs
    # its own pathway_scores.csv / gene_pathway_matrix.csv).
    compute_pathway_features(cfg)
    hold_cfg_paths = Config.from_dict(cfg.to_dict())
    hold_cfg_paths.data.processed_dir = str(workdir / "holdout")
    compute_pathway_features(hold_cfg_paths)
    out["prep_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    train_model(cfg)
    out["train_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    generate_synthetic_patients(cfg)
    out["generate_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    res_fit = validate_synthetic_patients(cfg)
    out["validation_vs_fit"] = {k: float(v) for k, v in res_fit.items()}

    hold_cfg = Config.from_dict(cfg.to_dict())
    hold_cfg.data.processed_dir = str(workdir / "holdout")
    hold_cfg.output.results_dir = str(workdir / "results_holdout")
    res_hold = validate_synthetic_patients(hold_cfg)
    out["validation_vs_holdout"] = {k: float(v) for k, v in res_hold.items()}

    # Real-vs-real noise floor: validate the fit half "as synthetic"
    # against the holdout half.
    validator = BiologicalValidator(cfg)
    fit_mut = pd.read_csv(workdir / "fit" / "mutation_matrix_aligned.csv",
                          index_col=0)
    fit_expr = pd.read_csv(workdir / "fit" / "expression_matrix_aligned.csv",
                           index_col=0)
    fit_path = pd.read_csv(workdir / "fit" / "pathway_scores.csv",
                           index_col=0)
    hold_mut = pd.read_csv(workdir / "holdout" / "mutation_matrix_aligned.csv",
                           index_col=0)
    hold_expr = pd.read_csv(
        workdir / "holdout" / "expression_matrix_aligned.csv", index_col=0)
    hold_path = pd.read_csv(workdir / "holdout" / "pathway_scores.csv",
                            index_col=0)
    gpm = pd.read_csv(workdir / "holdout" / "gene_pathway_matrix.csv",
                      index_col=0)
    res_floor = validator.validate_all(
        real_mutations=hold_mut, real_expression=hold_expr,
        real_pathways=hold_path, synth_mutations=fit_mut,
        synth_expression=fit_expr, synth_pathways=fit_path,
        pathway_gene_matrix=gpm,
    )
    out["real_vs_real_floor"] = {k: float(v) for k, v in res_floor.items()}
    out["validate_sec"] = time.perf_counter() - t0

    dest = Path(os.environ.get("DEMO_OUT", REPO / "DEMO_HELD_OUT.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
