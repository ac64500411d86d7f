"""Raw-data preprocessing: MAF -> mutation matrix, STAR counts ->
expression matrix, clinical cleaning, sample alignment.

Artifact parity with reference data/preprocessor.py — same filenames
(`mutation_matrix.csv`, `expression_matrix.csv`, `clinical.csv`,
`*_aligned.csv`) and the same transforms:
- protein-altering variant-class filter + binary pivot + min-samples
  gene filter (reference preprocessor.py:60-86)
- top-5000-variance gene selection + log2(x+1) (preprocessor.py:154-162)
- clinical numeric coercion, event from vital status, survival fallback
  chain, gender binarization, metastasis from stage string, age in
  years (preprocessor.py:183-214)
- barcode truncation to Project-TSS-Participant + dedup + sorted
  intersection (preprocessor.py:248-275)

Deliberate fix vs the reference: `metastasis_at_diagnosis` is written
to `clinical_aligned.csv` so the configured `condition_on` feature is
actually available downstream (the reference drops it at
preprocessor.py:218, breaking train.py:395 — SURVEY §5 config notes).
"""

from __future__ import annotations

import gzip
import logging
from pathlib import Path
from typing import Dict, Tuple

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

PROTEIN_ALTERING_CLASSES = [
    "Missense_Mutation",
    "Nonsense_Mutation",
    "Frame_Shift_Del",
    "Frame_Shift_Ins",
    "In_Frame_Del",
    "In_Frame_Ins",
    "Splice_Site",
]

CLINICAL_FEATURES = [
    "submitter_id",
    "survival_days",
    "event_occurred",
    "age_years",
    "gender_bin",
    "metastasis_at_diagnosis",
]


class OsteosarcomaPreprocessor:
    """TARGET-OS raw data -> ML-ready matrices."""

    def __init__(self, raw_dir: Path, processed_dir: Path, config):
        self.raw_dir = Path(raw_dir)
        self.processed_dir = Path(processed_dir)
        self.processed_dir.mkdir(parents=True, exist_ok=True)
        self.config = config

    # ------------------------------------------------------------------
    def process_mutations(self) -> pd.DataFrame:
        """MAF files -> binary (samples x genes) mutation matrix."""
        maf_dir = self.raw_dir / "mutations"
        maf_files = sorted(maf_dir.glob("*.maf*"))
        if not maf_files:
            raise FileNotFoundError(f"No MAF files found in {maf_dir}")

        frames = []
        for maf_file in maf_files:
            logger.info("Reading %s", maf_file.name)
            opener = gzip.open if maf_file.suffix == ".gz" else open
            with opener(maf_file, "rt") as f:
                frames.append(
                    pd.read_csv(f, sep="\t", comment="#", low_memory=False)
                )
        mutations = pd.concat(frames, ignore_index=True)
        logger.info("Total mutation records: %d", len(mutations))

        mutations = mutations[
            mutations["Variant_Classification"].isin(PROTEIN_ALTERING_CLASSES)
        ]
        logger.info("Protein-altering records: %d", len(mutations))

        # Binary presence matrix without a pivot aggfunc lambda:
        # dedup (sample, gene) pairs, then unstack.
        pairs = mutations[["Tumor_Sample_Barcode", "Hugo_Symbol"]].drop_duplicates()
        matrix = (
            pairs.assign(v=1)
            .set_index(["Tumor_Sample_Barcode", "Hugo_Symbol"])["v"]
            .unstack(fill_value=0)
        )

        min_samples = self.config.data.min_samples_per_gene
        keep = matrix.sum(axis=0) >= min_samples
        matrix = matrix.loc[:, keep]
        logger.info("Mutation matrix: %s", matrix.shape)

        matrix.to_csv(self.processed_dir / "mutation_matrix.csv")
        return matrix

    # ------------------------------------------------------------------
    def process_rna_seq(self) -> pd.DataFrame:
        """STAR count files -> log2(x+1) matrix over top-5000-variance genes."""
        rna_dir = self.raw_dir / "rna_seq"
        metadata_path = rna_dir / "metadata.csv"
        if not metadata_path.exists():
            raise FileNotFoundError(f"RNA-seq metadata not found: {metadata_path}")
        metadata = pd.read_csv(metadata_path)

        columns = []
        for _, row in metadata.iterrows():
            file_path = Path(row["file_path"])
            if not file_path.exists():
                logger.warning("Missing counts file: %s", file_path)
                continue
            compression = "gzip" if file_path.suffix == ".gz" else None
            counts = pd.read_csv(
                file_path, sep="\t", comment="#", compression=compression
            )
            id_col = "gene_name" if "gene_name" in counts.columns else "gene_id"
            if "unstranded" in counts.columns:
                count_col = "unstranded"
            elif "tpm_unstranded" in counts.columns:
                count_col = "tpm_unstranded"
            else:
                count_col = counts.columns[3]
            series = counts.set_index(id_col)[count_col]
            series = series[~series.index.duplicated(keep="first")]
            series.name = row["submitter_id"]
            columns.append(series)

        if not columns:
            raise FileNotFoundError("No RNA-seq count files could be read")

        matrix = pd.concat(columns, axis=1).T
        # Strip Ensembl version suffixes (ENSG...\.14 -> ENSG...).
        matrix.columns = matrix.columns.str.split(".").str[0]

        variances = matrix.var(axis=0)
        top_genes = variances.sort_values(ascending=False).head(5000).index
        matrix = matrix[top_genes]
        matrix = np.log2(matrix + 1)
        logger.info("Expression matrix: %s", matrix.shape)

        matrix.to_csv(self.processed_dir / "expression_matrix.csv")
        return matrix

    # ------------------------------------------------------------------
    def process_clinical(self) -> pd.DataFrame:
        """Clean clinical CSV into numeric survival/outcome features."""
        clinical = pd.read_csv(self.raw_dir / "clinical.csv")
        clinical.columns = [c.lower() for c in clinical.columns]

        for col in ("days_to_death", "days_to_last_follow_up", "age_at_diagnosis"):
            clinical[col] = pd.to_numeric(clinical.get(col), errors="coerce")

        vital = clinical.get("vital_status", pd.Series(dtype=object))
        clinical["event_occurred"] = (
            vital.fillna("Unknown").astype(str).str.capitalize() == "Dead"
        ).astype(int)

        clinical["survival_days"] = clinical["days_to_death"].fillna(
            clinical["days_to_last_follow_up"]
        )
        if clinical["survival_days"].isna().all():
            logger.warning("No survival days found; filling with 0")
            clinical["survival_days"] = clinical["survival_days"].fillna(0)

        clinical["gender_bin"] = (
            clinical.get("gender", pd.Series(dtype=object))
            .astype(str)
            .str.lower()
            .map({"female": 0, "male": 1})
            .fillna(0)
        )

        stage = clinical.get("tumor_stage", pd.Series(dtype=object)).astype(str)
        stage_upper = stage.str.upper()
        clinical["metastasis_at_diagnosis"] = (
            stage_upper.str.contains("IV", na=False)
            | stage_upper.str.contains("M1", na=False)
        ).astype(int)

        clinical["age_years"] = clinical["age_at_diagnosis"] / 365.25

        processed = (
            clinical[CLINICAL_FEATURES].dropna(subset=["survival_days"]).copy()
        )
        logger.info(
            "Clinical: %s, events %d/%d",
            processed.shape,
            processed["event_occurred"].sum(),
            len(processed),
        )
        processed.to_csv(self.processed_dir / "clinical.csv", index=False)
        return processed

    # ------------------------------------------------------------------
    def align_datasets(
        self,
        mutation_matrix: pd.DataFrame,
        expression_matrix: pd.DataFrame,
        clinical_df: pd.DataFrame,
    ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Truncate barcodes, dedup, intersect, sort, write *_aligned.csv."""
        mutation_matrix = mutation_matrix.copy()
        mutation_matrix.index = mutation_matrix.index.map(
            lambda x: "-".join(str(x).split("-")[:3])
        )
        mutation_matrix = mutation_matrix[
            ~mutation_matrix.index.duplicated(keep="first")
        ]

        common = (
            set(mutation_matrix.index)
            & set(expression_matrix.index)
            & set(clinical_df["submitter_id"])
        )
        logger.info("Common samples: %d", len(common))
        if len(common) < 20:
            logger.warning("Very few common samples — check ID mapping")

        order = sorted(common)
        mutation_aligned = mutation_matrix.loc[order]
        expression_aligned = expression_matrix.loc[order]
        clinical_aligned = (
            clinical_df.set_index("submitter_id").loc[order].reset_index()
        )

        mutation_aligned.to_csv(self.processed_dir / "mutation_matrix_aligned.csv")
        expression_aligned.to_csv(
            self.processed_dir / "expression_matrix_aligned.csv"
        )
        clinical_aligned.to_csv(
            self.processed_dir / "clinical_aligned.csv", index=False
        )
        return mutation_aligned, expression_aligned, clinical_aligned

    # ------------------------------------------------------------------
    def process_all(self) -> Dict[str, pd.DataFrame]:
        mutation = self.process_mutations()
        expression = self.process_rna_seq()
        clinical = self.process_clinical()
        mut_a, expr_a, clin_a = self.align_datasets(mutation, expression, clinical)
        return {
            "mutation_matrix": mut_a,
            "expression_matrix": expr_a,
            "clinical": clin_a,
        }
