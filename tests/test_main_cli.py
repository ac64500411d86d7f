"""The real CLI entry point, exercised via subprocess.

Validates `python main.py --config ... --steps ...` end to end — the
exact invocation surface the reference documents (reference
main.py:343-369)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, str(REPO / "main.py"), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    from osteosarcoma_diffusionmodel_tpu.config import Config
    from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data

    make_dummy_data(tmp / "data" / "processed", n_samples=30,
                    n_mutation_genes=8, n_expression_genes=32, n_pathways=4)
    cfg = Config()
    cfg.data.data_dir = str(tmp / "data")
    cfg.data.raw_dir = str(tmp / "data" / "raw")
    cfg.data.processed_dir = str(tmp / "data" / "processed")
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 2
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp / "results" / "checkpoints")
    cfg.generation.num_synthetic_samples = 12
    cfg.output.results_dir = str(tmp / "results")
    cfg.output.synthetic_data_dir = str(tmp / "results" / "synthetic")
    (tmp / "config").mkdir()
    cfg.to_yaml(tmp / "config" / "config.yaml")
    return tmp


def test_cli_invalid_step_rejected(workdir):
    result = run_cli(["--steps", "not-a-step"], workdir)
    assert result.returncode != 0
    assert "invalid choice" in result.stderr


def test_cli_pipeline_steps(workdir):
    result = run_cli(
        ["--config", "config/config.yaml",
         "--steps", "pathways", "train", "generate", "validate"],
        workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (workdir / "results" / "validation_results.csv").exists()
    assert (workdir / "results" / "training_history.csv").exists()
    assert (workdir / "config" / "config_updated.yaml").exists()
    # Dims frozen into the persisted config.
    with open(workdir / "config" / "config_updated.yaml") as f:
        updated = yaml.safe_load(f)
    assert updated["model"]["n_genes_mutation"] == 8
    assert updated["model"]["n_conditions"] == 3


def test_cli_doctor(workdir):
    result = run_cli(
        ["--config", "config/config.yaml", "--steps", "doctor"], workdir
    )
    assert result.returncode == 0, result.stderr[-2000:]


def test_cli_resume(workdir):
    result = run_cli(
        ["--config", "config/config.yaml", "--steps", "train",
         "--resume-training"],
        workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Resumed from epoch" in result.stderr + result.stdout
