"""Cross-cancer pretrain -> finetune (the reference declares
`cross_cancer_pretrain`/`pretrain_datasets` at config.yaml:77-78 and
never reads them; here they work)."""

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.cli import train_model
from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import (
    load_pretrain_arrays,
    make_dummy_data,
    prepare_arrays,
)


def _small_cfg(tmp_path, processed):
    cfg = Config()
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.data.processed_dir = str(processed)
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 2
    cfg.training.pretrain_epochs = 2
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp_path / "ckpt")
    return cfg


def _write_pretrain_cohort(d, n=24, genes=("TP53", "RB1", "XMUT1"),
                           expr_genes=("TP53", "CDKN1A", "OTHER1")):
    d.mkdir(parents=True, exist_ok=True)
    ids = [f"X{i}" for i in range(n)]
    rng = np.random.default_rng(3)
    pd.DataFrame(
        (rng.random((n, len(genes))) < 0.3).astype(float),
        index=ids, columns=list(genes),
    ).to_csv(d / "mutation_matrix_aligned.csv")
    pd.DataFrame(
        rng.normal(size=(n, len(expr_genes))),
        index=ids, columns=list(expr_genes),
    ).to_csv(d / "expression_matrix_aligned.csv")
    pd.DataFrame({
        "submitter_id": ids,
        "survival_days": rng.integers(50, 3000, n),
        "event_occurred": rng.integers(0, 2, n),
        "age_years": rng.uniform(5, 60, n),
    }).to_csv(d / "clinical_aligned.csv", index=False)


def test_load_pretrain_arrays_aligns_feature_space(tmp_path):
    processed = tmp_path / "processed"
    make_dummy_data(processed, n_samples=30, n_mutation_genes=8,
                    n_expression_genes=32, n_pathways=4)
    cfg = _small_cfg(tmp_path, processed)
    primary, dims = prepare_arrays(cfg)

    pre_dir = tmp_path / "pre_cohort"
    _write_pretrain_cohort(pre_dir)
    cfg.training.augmentation.cross_cancer_pretrain = True
    cfg.training.augmentation.pretrain_datasets = [str(pre_dir)]

    arrays = load_pretrain_arrays(cfg, primary)
    assert arrays is not None
    assert arrays.n_samples == 24
    # Aligned onto the PRIMARY feature space, absent genes zero-filled.
    assert arrays.data.shape[1] == primary.data.shape[1]
    assert arrays.mutation_genes == primary.mutation_genes
    assert arrays.conditions.shape[1] == primary.conditions.shape[1]
    assert np.isfinite(arrays.data).all()


def test_load_pretrain_arrays_off_or_missing(tmp_path):
    processed = tmp_path / "processed"
    make_dummy_data(processed, n_samples=20, n_mutation_genes=6,
                    n_expression_genes=16, n_pathways=3)
    cfg = _small_cfg(tmp_path, processed)
    primary, _ = prepare_arrays(cfg)
    assert load_pretrain_arrays(cfg, primary) is None  # flag off

    cfg.training.augmentation.cross_cancer_pretrain = True
    cfg.training.augmentation.pretrain_datasets = ["TCGA-DOES-NOT-EXIST"]
    assert load_pretrain_arrays(cfg, primary) is None  # nothing usable


def test_train_model_runs_pretrain_phase(tmp_path, monkeypatch, caplog):
    import logging

    monkeypatch.chdir(tmp_path)
    processed = tmp_path / "processed"
    make_dummy_data(processed, n_samples=30, n_mutation_genes=8,
                    n_expression_genes=32, n_pathways=4)
    pre_dir = tmp_path / "pre_cohort"
    _write_pretrain_cohort(pre_dir)

    cfg = _small_cfg(tmp_path, processed)
    cfg.training.augmentation.cross_cancer_pretrain = True
    cfg.training.augmentation.pretrain_datasets = [str(pre_dir)]

    with caplog.at_level(logging.INFO):
        history = train_model(cfg)
    assert len(history.train_loss) == 2
    assert any("Cross-cancer pretraining" in r.message for r in caplog.records)
    # Pretrain checkpoints land in a subdirectory.
    assert (tmp_path / "ckpt" / "pretrain").exists()
