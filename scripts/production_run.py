#!/usr/bin/env python3
"""Regenerate PRODUCTION_RUN.json: the production preset end to end.

Loads `config/production.yaml` through the real YAML loader (so the
preset file itself is what is exercised), builds a TARGET-OS-shaped
structured cohort (100 x 5142), and runs the documented protocol —
pathways -> train (600 epochs, epoch-block dispatch) -> generate
(10002 patients, fused DDIM-50) -> validate -> report — writing the
committed artifact. `--assert` applies the same quality gate as
scripts/demo_full_scale.py (reference docs/DEPLOYMENT.md:478-508), so
the artifact cannot silently go stale.

Reference counterpart: the `python main.py --steps all` production
workflow (reference main.py:343-409, QUICKSTART.md:198-204).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osteosarcoma_diffusionmodel_tpu.cli import (  # noqa: E402
    compute_pathway_features,
    analysis_report,
    generate_synthetic_patients,
    train_model,
    validate_synthetic_patients,
)
from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data  # noqa: E402


def main():
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    workdir = Path(tempfile.mkdtemp(prefix="osdm_prod_"))
    os.chdir(workdir)
    print(f"workdir: {workdir}", flush=True)

    make_dummy_data(
        workdir / "processed", n_samples=100,
        n_mutation_genes=62, n_expression_genes=5054, n_pathways=26,
    )

    cfg = Config.from_yaml(REPO / "config" / "production.yaml")
    cfg.data.processed_dir = str(workdir / "processed")
    cfg.training.num_epochs = 600
    cfg.training.patience = 600
    cfg.training.save_dir = str(workdir / "ckpt")
    cfg.generation.num_synthetic_samples = 10002
    cfg.output.results_dir = str(workdir / "results")
    cfg.output.synthetic_data_dir = str(workdir / "results" / "synthetic")

    t_start = time.perf_counter()
    compute_pathway_features(cfg)
    history = train_model(cfg)
    generate_synthetic_patients(cfg)
    results = validate_synthetic_patients(cfg)
    analysis_report(cfg)
    wall = time.perf_counter() - t_start

    out = {
        "config": (
            "config/production.yaml (epochs_per_dispatch=25, ddim-50 "
            "fused, batch_scenarios, copula_joint calibration, bf16 "
            "readback)"
        ),
        "protocol": (
            "scripts/production_run.py (pathways train generate validate "
            "report); 100x5145 structured cohort, 600 epochs, 10002 "
            "generated"
        ),
        "train_epochs": len(history.train_loss),
        "pipeline_wall_clock_sec": round(wall),
        "validation": {k: float(v) for k, v in results.items()},
    }
    out_path = Path(os.environ.get("PROD_OUT", REPO / "PRODUCTION_RUN.json"))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))

    if "--assert" in sys.argv:
        overall = out["validation"]["overall_biological_score"]
        mmd = out["validation"]["mmd"]
        if overall < 0.85 or mmd >= 0.15:
            print(f"QUALITY GATE FAILED: overall={overall:.4f} mmd={mmd:.4f}")
            sys.exit(1)
        print(f"QUALITY GATE PASSED: overall={overall:.4f} mmd={mmd:.4f}")


if __name__ == "__main__":
    main()
