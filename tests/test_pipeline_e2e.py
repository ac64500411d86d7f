"""End-to-end pipeline on the dummy-data fixture (SURVEY §4 plan item b):
train -> generate -> validate, both model families, on CPU-JAX.
"""

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.cli import (
    analysis_report,
    compute_pathway_features,
    doctor,
    generate_synthetic_patients,
    train_model,
    validate_synthetic_patients,
)
from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data


def tiny_config(tmp_path, architecture="diffusion"):
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path / "processed")
    cfg.data.raw_dir = str(tmp_path / "raw")
    cfg.data.data_dir = str(tmp_path)
    cfg.model.architecture = architecture
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 8
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 3
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.training.save_frequency = 2
    cfg.generation.num_synthetic_samples = 30
    cfg.output.results_dir = str(tmp_path / "results")
    cfg.output.synthetic_data_dir = str(tmp_path / "results" / "synthetic")
    return cfg


@pytest.fixture()
def pipeline_dirs(tmp_path, monkeypatch):
    # config_updated.yaml is written relative to cwd, like the reference.
    monkeypatch.chdir(tmp_path)
    make_dummy_data(tmp_path / "processed", n_samples=40,
                    n_mutation_genes=12, n_expression_genes=64, n_pathways=6)
    return tmp_path


def run_full(cfg, tmp_path):
    compute_pathway_features(cfg)
    history = train_model(cfg)
    assert len(history.train_loss) >= 1
    assert all(np.isfinite(v) for v in history.train_loss)

    synthetic = generate_synthetic_patients(cfg)
    assert len(synthetic) == 3  # three scenarios
    for data in synthetic.values():
        assert data["mutations"].shape[0] == 10
        assert set(np.unique(data["mutations"])) <= {0.0, 1.0}
        assert np.all(np.isfinite(data["expression"]))

    results = validate_synthetic_patients(cfg)
    assert "overall_biological_score" in results
    assert "mmd" in results
    assert np.isfinite(results["mmd"])
    assert (tmp_path / "results" / "validation_results.csv").exists()
    return results


def test_diffusion_pipeline(pipeline_dirs):
    cfg = tiny_config(pipeline_dirs, "diffusion")
    results = run_full(cfg, pipeline_dirs)
    # Pathway coherence must actually run (fixed vs reference).
    assert "real_pathway_coherence" in results
    # Report step produces figures + graded summary.
    cfg.output.figures_dir = str(pipeline_dirs / "results" / "figures")
    analysis_report(cfg)
    assert (pipeline_dirs / "results" / "summary_report.txt").exists()
    figures = list((pipeline_dirs / "results" / "figures").glob("*.png"))
    assert len(figures) >= 4


def test_cvae_pipeline(pipeline_dirs):
    cfg = tiny_config(pipeline_dirs, "cvae")
    run_full(cfg, pipeline_dirs)


def test_resume_training(pipeline_dirs):
    cfg = tiny_config(pipeline_dirs, "diffusion")
    compute_pathway_features(cfg)
    train_model(cfg)
    # Second run resumes from the last periodic checkpoint.
    cfg2 = tiny_config(pipeline_dirs, "diffusion")
    cfg2.training.num_epochs = 5
    history = train_model(cfg2, resume=True)
    # Resumed from epoch >= 1, so fewer than 5 fresh epochs were run.
    assert len(history.train_loss) < 5


def test_doctor(pipeline_dirs):
    cfg = tiny_config(pipeline_dirs, "diffusion")
    compute_pathway_features(cfg)
    train_model(cfg)
    report = doctor(cfg)
    assert report["data"].startswith("OK")
    assert report["checkpoint"].startswith("OK")
    assert report.get("checkpoint_vs_data") == "OK"


def test_export_formats(pipeline_dirs):
    cfg = tiny_config(pipeline_dirs, "diffusion")
    cfg.output.export_formats = ["csv", "pickle"]
    compute_pathway_features(cfg)
    train_model(cfg)
    generate_synthetic_patients(cfg)
    scen_dir = (
        pipeline_dirs / "results" / "synthetic" / "typical_patient"
    )
    assert (scen_dir / "typical_patient_mutations.csv").exists()
    assert (scen_dir / "typical_patient_mutations.pkl").exists()
    df = pd.read_pickle(scen_dir / "typical_patient_mutations.pkl")
    assert df.shape[0] == 10
