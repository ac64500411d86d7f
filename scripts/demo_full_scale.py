#!/usr/bin/env python3
"""Full-scale pipeline demonstration at production dims on the TPU.

Exercises BASELINE.json's headline configs end to end: trains the
biology-aware diffusion model (multi-task constraint losses on) on a
TARGET-OS-shaped cohort (100 patients x 5142 features), generates a
10k+ patient synthetic cohort via the three clinical scenarios through
the full 1000-step DDPM, and runs the complete validation suite
(MMD/KS/chi-square gates). Writes DEMO_FULL_SCALE.json with timings.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("OSDM_FORCE_CPU"):
    # The axon sitecustomize force-appends its platform regardless of
    # JAX_PLATFORMS; config-update after import is the only reliable
    # CPU pin for standalone scripts. A CPU demo is a tunnel-outage
    # hedge: the validation metrics are hardware-independent, only the
    # timings change (the JSON carries a platform stamp either way).
    jax.config.update("jax_platforms", "cpu")

from osteosarcoma_diffusionmodel_tpu.cli import (  # noqa: E402
    compute_pathway_features,
    generate_synthetic_patients,
    train_model,
    validate_synthetic_patients,
)
from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.utils.io import env_flag  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data  # noqa: E402


def main():
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import tempfile

    workdir = Path(tempfile.mkdtemp(prefix="osdm_demo_"))
    os.chdir(workdir)
    print(f"workdir: {workdir}", flush=True)

    timings = {"platform": jax.devices()[0].platform}
    t0 = time.perf_counter()
    n_samples = int(os.environ.get("DEMO_N", 100))
    demo_seed = int(os.environ.get("DEMO_SEED", 0))
    make_dummy_data(
        workdir / "processed", n_samples=n_samples,
        n_mutation_genes=62, n_expression_genes=5054, n_pathways=26,
        seed=demo_seed,
    )
    timings["make_data_sec"] = time.perf_counter() - t0
    timings["n_samples"] = n_samples
    timings["demo_seed"] = demo_seed

    cfg = Config()
    if demo_seed:  # seed-robustness runs vary training/split/gen seeds too
        cfg.training.random_seed = 42 + demo_seed
    cfg.data.processed_dir = str(workdir / "processed")
    cfg.training.num_epochs = int(os.environ.get("DEMO_EPOCHS", 200))
    cfg.training.patience = int(os.environ.get("DEMO_EPOCHS", 200))
    if "DEMO_CALIBRATE" in os.environ:  # copula_full | copula | quantile | false
        v = os.environ["DEMO_CALIBRATE"]
        cfg.generation.calibrate_marginals = False if v == "false" else v
    if "DEMO_PARAM" in os.environ:  # x0 | epsilon | v
        cfg.model.diffusion.parameterization = os.environ["DEMO_PARAM"]
    if os.environ.get("DEMO_LEARN_SIGMA"):
        cfg.model.diffusion.learn_sigma = True
    if os.environ.get("DEMO_DISCRETE"):  # binary D3PM mutation head
        cfg.model.diffusion.discrete_mutation_head = True
    if "DEMO_LATENT_K" in os.environ:  # latent-factor conditioning
        cfg.model.diffusion.latent_factor_dim = int(
            os.environ["DEMO_LATENT_K"]
        )
    if "DEMO_LATENT_INPUT" in os.environ:  # full | mutations
        cfg.model.diffusion.latent_encoder_input = os.environ[
            "DEMO_LATENT_INPUT"
        ]
    if "DEMO_LOWRANK_K" in os.environ:  # low-rank correlated sigma
        cfg.model.diffusion.low_rank_sigma_dim = int(
            os.environ["DEMO_LOWRANK_K"]
        )
    if "DEMO_LOWRANK_SCOPE" in os.environ:  # full | mutations
        cfg.model.diffusion.low_rank_sigma_scope = os.environ[
            "DEMO_LOWRANK_SCOPE"
        ]
    if env_flag("DEMO_AR"):  # autoregressive (FVSBN) mutation head
        cfg.model.diffusion.ar_mutation_head = True
    if "DEMO_AR_CONTEXT" in os.environ:  # pathways | continuous | none
        cfg.model.diffusion.ar_context = os.environ["DEMO_AR_CONTEXT"]
    if "DEMO_AR_LR" in os.environ:  # AR branch constant Adam LR
        cfg.model.diffusion.ar_lr = float(os.environ["DEMO_AR_LR"])
    if "DEMO_AR_L2" in os.environ:
        cfg.model.diffusion.ar_l2 = float(os.environ["DEMO_AR_L2"])
    if "DEMO_AR_CTX_L2" in os.environ:  # context-MLP kernel L2
        cfg.model.diffusion.ar_ctx_l2 = float(os.environ["DEMO_AR_CTX_L2"])
    if os.environ.get("DEMO_FINETUNE"):  # sample-path fine-tune (STEP 4b)
        cfg.training.sample_path_finetune.enabled = True
        cfg.training.sample_path_finetune.steps = int(
            os.environ.get("DEMO_FT_STEPS", 300)
        )
    if "DEMO_SAMPLER" in os.environ:  # ddpm | ddim
        cfg.generation.sampler = os.environ["DEMO_SAMPLER"]
    if "DEMO_BLOCK" in os.environ:  # epochs per jitted dispatch
        cfg.training.epochs_per_dispatch = int(os.environ["DEMO_BLOCK"])
    cfg.generation.batch_scenarios = True  # one device program, all scenarios
    if "DEMO_SAMPLING_STEPS" in os.environ:
        cfg.generation.sampling_steps = int(os.environ["DEMO_SAMPLING_STEPS"])
    cfg.training.save_dir = str(workdir / "ckpt")
    cfg.generation.num_synthetic_samples = 10002
    cfg.output.results_dir = str(workdir / "results")
    cfg.output.synthetic_data_dir = str(workdir / "results" / "synthetic")

    t0 = time.perf_counter()
    compute_pathway_features(cfg)
    timings["pathways_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    history = train_model(cfg)
    timings["train_sec"] = time.perf_counter() - t0
    timings["train_epochs"] = len(history.train_loss)
    timings["train_steps_per_sec"] = history.steps_per_sec
    timings["final_train_loss"] = history.train_loss[-1]

    t0 = time.perf_counter()
    generate_synthetic_patients(cfg)
    timings["generate_10k_sec"] = time.perf_counter() - t0
    timings["patients_per_sec_e2e"] = 10002 / timings["generate_10k_sec"]

    t0 = time.perf_counter()
    results = validate_synthetic_patients(cfg)
    timings["validate_sec"] = time.perf_counter() - t0
    timings["validation"] = {k: float(v) for k, v in results.items()}

    out = Path(os.environ.get("DEMO_OUT", REPO / "DEMO_FULL_SCALE.json"))
    with open(out, "w") as f:
        json.dump(timings, f, indent=2)
    print(json.dumps(timings, indent=2))

    if "--assert" in sys.argv:
        _assert_quality_gate(timings["validation"])


def _assert_quality_gate(validation):
    """Production quality gate (reference docs/DEPLOYMENT.md:478-508):
    overall biological score >= 0.85, MMD < 0.15. Run via
    `python scripts/demo_full_scale.py --assert` so the committed demo
    JSONs cannot silently go stale (round-2 VERDICT weak #5)."""
    overall = validation["overall_biological_score"]
    mmd = validation["mmd"]
    failures = []
    if overall < 0.85:
        failures.append(f"overall_biological_score {overall:.4f} < 0.85")
    if mmd >= 0.15:
        failures.append(f"mmd {mmd:.4f} >= 0.15")
    if failures:
        print("QUALITY GATE FAILED: " + "; ".join(failures))
        sys.exit(1)
    print(f"QUALITY GATE PASSED: overall={overall:.4f} mmd={mmd:.4f}")


if __name__ == "__main__":
    main()
