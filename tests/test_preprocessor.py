"""Preprocessor on synthetic raw fixtures (MAF, STAR counts, clinical).

Parity targets: reference data/preprocessor.py:26-307.
"""

import gzip

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data.preprocessor import (
    OsteosarcomaPreprocessor,
)


@pytest.fixture()
def raw_fixture(tmp_path):
    raw = tmp_path / "raw"
    (raw / "mutations").mkdir(parents=True)
    (raw / "rna_seq").mkdir(parents=True)

    # --- MAF with mixed variant classes; gzipped.
    barcodes = [f"TARGET-40-S{i:03d}-01A" for i in range(8)]
    rows = []
    for i, bc in enumerate(barcodes):
        rows.append({"Hugo_Symbol": "TP53", "Tumor_Sample_Barcode": bc,
                     "Variant_Classification": "Missense_Mutation"})
        if i < 5:
            rows.append({"Hugo_Symbol": "RB1", "Tumor_Sample_Barcode": bc,
                         "Variant_Classification": "Nonsense_Mutation"})
        if i < 2:
            rows.append({"Hugo_Symbol": "RARE1", "Tumor_Sample_Barcode": bc,
                         "Variant_Classification": "Frame_Shift_Del"})
        # Silent mutations must be filtered out.
        rows.append({"Hugo_Symbol": "SILENTG", "Tumor_Sample_Barcode": bc,
                     "Variant_Classification": "Silent"})
    maf = pd.DataFrame(rows)
    with gzip.open(raw / "mutations" / "cohort.maf.gz", "wt") as f:
        maf.to_csv(f, sep="\t", index=False)

    # --- STAR counts per sample.
    genes = [f"ENSG{i:05d}.7" for i in range(30)]
    gene_names = [f"G{i}" for i in range(30)]
    meta = []
    rng = np.random.default_rng(0)
    for i in range(8)  :
        sid = f"TARGET-40-S{i:03d}"
        fname = raw / "rna_seq" / f"{sid}.tsv"
        counts = pd.DataFrame({
            "gene_id": genes,
            "gene_name": gene_names,
            "gene_type": "protein_coding",
            "unstranded": rng.integers(0, 1000, 30),
            "stranded_first": 0,
        })
        counts.to_csv(fname, sep="\t", index=False)
        meta.append({"file_id": str(i), "file_name": fname.name,
                     "case_id": str(i), "submitter_id": sid,
                     "file_path": str(fname)})
    pd.DataFrame(meta).to_csv(raw / "rna_seq" / "metadata.csv", index=False)

    # --- Clinical.
    clin = pd.DataFrame({
        "case_id": [str(i) for i in range(8)],
        "submitter_id": [f"TARGET-40-S{i:03d}" for i in range(8)],
        "age_at_diagnosis": [5000 + 100 * i for i in range(8)],
        "gender": ["male", "female"] * 4,
        "race": ["white"] * 8,
        "ethnicity": ["not hispanic or latino"] * 8,
        "tumor_stage": ["Stage II", "Stage IV", "--", "Stage IVA"] * 2,
        "primary_diagnosis": ["Osteosarcoma"] * 8,
        "site_of_resection": ["Bone"] * 8,
        "morphology": ["9180/3"] * 8,
        "days_to_death": [500, None, 800, None] * 2,
        "days_to_last_follow_up": [None, 1200, None, 900] * 2,
        "vital_status": ["Dead", "Alive", "Dead", "Alive"] * 2,
    })
    clin.to_csv(raw / "clinical.csv", index=False)
    return raw


def test_process_all(raw_fixture, tmp_path):
    cfg = Config()
    cfg.data.min_samples_per_gene = 3
    proc = OsteosarcomaPreprocessor(raw_fixture, tmp_path / "processed", cfg)
    out = proc.process_all()

    mut = out["mutation_matrix"]
    # TP53 in all 8, RB1 in 5 -> kept; RARE1 in 2 (<3) and SILENTG filtered.
    assert "TP53" in mut.columns and "RB1" in mut.columns
    assert "RARE1" not in mut.columns
    assert "SILENTG" not in mut.columns
    # Barcodes truncated to Project-TSS-Participant.
    assert all(len(s.split("-")) == 3 for s in mut.index)

    expr = out["expression_matrix"]
    # Gene version suffixes stripped... but gene_name preferred over id.
    assert expr.shape[0] == 8
    # log2(x+1) applied: all values < log2(1001).
    assert float(expr.values.max()) <= np.log2(1001) + 1e-6

    clin = out["clinical"]
    assert "metastasis_at_diagnosis" in clin.columns  # fix vs reference
    # Stage IV / IVA -> metastasis 1.
    met = clin.set_index("submitter_id")["metastasis_at_diagnosis"]
    assert met["TARGET-40-S001"] == 1
    assert met["TARGET-40-S000"] == 0
    # Survival fallback chain: dead -> days_to_death, alive -> follow-up.
    surv = clin.set_index("submitter_id")["survival_days"]
    assert surv["TARGET-40-S000"] == 500
    assert surv["TARGET-40-S001"] == 1200
    # event from vital status.
    ev = clin.set_index("submitter_id")["event_occurred"]
    assert ev["TARGET-40-S000"] == 1 and ev["TARGET-40-S001"] == 0
    # gender binarized.
    assert set(clin["gender_bin"].unique()) <= {0, 1}

    # Aligned artifacts written with the exact reference filenames.
    for name in ["mutation_matrix_aligned.csv", "expression_matrix_aligned.csv",
                 "clinical_aligned.csv", "mutation_matrix.csv",
                 "expression_matrix.csv", "clinical.csv"]:
        assert (tmp_path / "processed" / name).exists()

    # All three aligned tables share the same sorted sample order.
    m = pd.read_csv(tmp_path / "processed" / "mutation_matrix_aligned.csv",
                    index_col=0)
    e = pd.read_csv(tmp_path / "processed" / "expression_matrix_aligned.csv",
                    index_col=0)
    c = pd.read_csv(tmp_path / "processed" / "clinical_aligned.csv")
    assert list(m.index) == list(e.index) == list(c["submitter_id"])
    assert list(m.index) == sorted(m.index)


def test_missing_maf_raises(tmp_path):
    cfg = Config()
    proc = OsteosarcomaPreprocessor(tmp_path / "nothing", tmp_path / "p", cfg)
    with pytest.raises(FileNotFoundError):
        proc.process_mutations()
