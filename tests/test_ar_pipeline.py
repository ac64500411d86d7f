"""CLI-level e2e for the autoregressive (FVSBN) mutation head:
train -> checkpoint -> reload (metadata self-configuration) ->
generate -> validate, with `diffusion.ar_mutation_head: true`.

Covers the integration surface tests/test_ar_head.py does not: the
trainer's jitted step carrying the AR CE term, Orbax checkpointing of
the AR params (coupling/bias/context MLP), and the generator
re-building an AR-headed model purely from the checkpoint's
metadata.json — the path a production `generate` step takes
(reference main.py:343-409 step orchestration).
"""

import numpy as np

from osteosarcoma_diffusionmodel_tpu.cli import (
    compute_pathway_features,
    generate_synthetic_patients,
    train_model,
    validate_synthetic_patients,
)
from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import make_dummy_data


def _cfg(tmp_path):
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path / "processed")
    cfg.data.raw_dir = str(tmp_path / "raw")
    cfg.data.data_dir = str(tmp_path)
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 8
    cfg.model.diffusion.ar_mutation_head = True
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 3
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.generation.num_synthetic_samples = 30
    cfg.output.results_dir = str(tmp_path / "results")
    cfg.output.synthetic_data_dir = str(tmp_path / "results" / "synthetic")
    return cfg


def test_ar_head_pipeline_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_dummy_data(tmp_path / "processed", n_samples=40,
                    n_mutation_genes=12, n_expression_genes=64, n_pathways=6)
    cfg = _cfg(tmp_path)
    compute_pathway_features(cfg)
    history = train_model(cfg)
    assert all(np.isfinite(v) for v in history.train_loss)

    # The generate step reloads the model from the checkpoint's
    # metadata.json — the AR head must survive that round trip.
    synthetic = generate_synthetic_patients(cfg)
    assert len(synthetic) == 3
    for data in synthetic.values():
        assert data["mutations"].shape == (10, 12)
        assert set(np.unique(data["mutations"])) <= {0.0, 1.0}
        assert np.all(np.isfinite(data["expression"]))

    results = validate_synthetic_patients(cfg)
    assert np.isfinite(results["mmd"])
    assert np.isfinite(results["overall_biological_score"])


def test_ar_head_generation_varies_across_scenarios(tmp_path, monkeypatch):
    """Sequential AR draws must differ across the per-scenario calls
    (the generator folds a per-call counter into the AR key)."""
    monkeypatch.chdir(tmp_path)
    make_dummy_data(tmp_path / "processed", n_samples=40,
                    n_mutation_genes=12, n_expression_genes=64, n_pathways=6)
    cfg = _cfg(tmp_path)
    cfg.generation.batch_scenarios = False  # force per-scenario loop
    compute_pathway_features(cfg)
    train_model(cfg)
    synthetic = generate_synthetic_patients(cfg)
    muts = [d["mutations"] for d in synthetic.values()]
    assert not (
        np.array_equal(muts[0], muts[1]) and np.array_equal(muts[1], muts[2])
    ), "AR bits identical across all scenarios — per-call key not folded"
