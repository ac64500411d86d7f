"""Dataset assembly, alignment, and condition resolution.

Parity targets: reference utils/train.py:22-82 (index intersection and
tensor assembly) and :342-444 (prepare_data semantics).
"""

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.dataset import (
    build_arrays,
    make_dummy_data,
    prepare_arrays,
)


def make_frames(n=20):
    ids = [f"S{i}" for i in range(n)]
    mut = pd.DataFrame(np.eye(n, 5, dtype=np.float32), index=ids,
                       columns=[f"M{i}" for i in range(5)])
    expr = pd.DataFrame(np.ones((n, 7), np.float32), index=ids,
                        columns=[f"E{i}" for i in range(7)])
    path = pd.DataFrame(np.zeros((n, 3), np.float32), index=ids,
                        columns=[f"P{i}" for i in range(3)])
    clin = pd.DataFrame({
        "submitter_id": ids,
        "survival_days": np.arange(n, dtype=np.float32) * 100,
        "event_occurred": [i % 2 for i in range(n)],
        "age_years": 15.0,
    })
    return mut, expr, path, clin


def test_build_arrays_alignment():
    mut, expr, path, clin = make_frames()
    # Drop different samples from each table; intersection should win.
    mut2 = mut.drop(index=["S0"])
    expr2 = expr.drop(index=["S1"])
    clin2 = clin[clin.submitter_id != "S2"]
    arrays = build_arrays(mut2, expr2, path, clin2,
                          ["survival_days", "event_occurred"])
    assert arrays.n_samples == 17
    assert arrays.data.shape == (17, 5 + 7 + 3)
    assert "S0" not in arrays.sample_ids
    assert arrays.conditions.shape == (17, 2)


def test_build_arrays_nan_handling():
    mut, expr, path, clin = make_frames(6)
    clin.loc[2, "age_years"] = np.nan
    clin.loc[3, "survival_days"] = np.nan
    arrays = build_arrays(mut, expr, path, clin, ["age_years"])
    assert np.all(np.isfinite(arrays.conditions))
    assert arrays.survival[3] == 0.0  # fillna(0) like reference train.py:67


def test_prepare_arrays_full(tmp_path):
    make_dummy_data(tmp_path, n_samples=30, n_mutation_genes=10,
                    n_expression_genes=40, n_pathways=5)
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path)
    arrays, dims = prepare_arrays(cfg)
    assert dims.mutation_dim == 10
    assert dims.expression_dim == 40
    assert dims.pathway_dim == 5
    # condition_on resolves: survival_time -> survival_days_norm,
    # event_occurred, metastasis_at_diagnosis (all present in dummy data).
    assert dims.condition_names == [
        "survival_days_norm", "event_occurred", "metastasis_at_diagnosis",
    ]
    assert dims.condition_dim == 3
    # Survival stats recorded for generation-time encoding.
    assert dims.survival_std > 0
    # Pathway scores z-scored columnwise.
    path = pd.read_csv(tmp_path / "pathway_scores.csv", index_col=0)
    assert abs(arrays.data[:, 50:].mean()) < 0.2

    # Config mirrored dims (reference train.py:439-442).
    assert cfg.model.n_genes_mutation == 10
    assert cfg.model.n_conditions == 3


def test_prepare_arrays_lazy_pathways(tmp_path):
    make_dummy_data(tmp_path, n_samples=20, n_expression_genes=80)
    (tmp_path / "pathway_scores.csv").unlink()
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path)
    arrays, dims = prepare_arrays(cfg)
    # Lazily recomputed from the hallmark gene members in the dummy
    # expression matrix and persisted (reference train.py:365-379).
    assert (tmp_path / "pathway_scores.csv").exists()
    assert dims.pathway_dim > 0


def test_condition_resolution_fallback(tmp_path):
    make_dummy_data(tmp_path, n_samples=20)
    # Remove metastasis column: condition falls back to available ones.
    clin = pd.read_csv(tmp_path / "clinical_aligned.csv")
    clin.drop(columns=["metastasis_at_diagnosis"]).to_csv(
        tmp_path / "clinical_aligned.csv", index=False
    )
    cfg = Config()
    cfg.data.processed_dir = str(tmp_path)
    arrays, dims = prepare_arrays(cfg)
    assert "metastasis_at_diagnosis" not in dims.condition_names
    assert dims.condition_dim == 2
