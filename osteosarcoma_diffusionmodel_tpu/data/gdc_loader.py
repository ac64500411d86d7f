"""GDC REST data acquisition for TARGET-OS.

Capability parity with reference data/gdc_loader.py:228-240: queries
the GDC files endpoint for masked somatic MAFs, STAR-Counts RNA-seq,
and expanded clinical cases, streaming downloads into
``data/raw/{mutations,rna_seq,clinical.csv}``.

Network code is host-side I/O (no TPU angle); downloads are resumable
(existing files skipped) and parallelizable via a thread pool — the
reference downloads serially.
"""

from __future__ import annotations

import json
import logging
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd

logger = logging.getLogger(__name__)

GDC_API = "https://api.gdc.cancer.gov"


def _requests():
    """Late import so offline environments can use the rest of the package."""
    import requests

    return requests


class GDCDataLoader:
    """Download and organize TARGET-OS data from the GDC REST API."""

    def __init__(
        self,
        project_id: str = "TARGET-OS",
        data_dir: str | Path = "./data",
        max_workers: int = 4,
    ):
        self.project_id = project_id
        self.data_dir = Path(data_dir)
        self.raw_dir = self.data_dir / "raw"
        self.raw_dir.mkdir(parents=True, exist_ok=True)
        self.max_workers = max_workers

    # ------------------------------------------------------------------
    def query_files(
        self,
        data_category: str,
        data_type: str,
        workflow_type: Optional[str] = None,
        size: int = 1000,
    ) -> List[dict]:
        """Query the /files endpoint with project/category/type filters."""
        content = [
            {"op": "in", "content": {"field": "cases.project.project_id",
                                     "value": [self.project_id]}},
            {"op": "in", "content": {"field": "files.data_category",
                                     "value": [data_category]}},
            {"op": "in", "content": {"field": "files.data_type",
                                     "value": [data_type]}},
        ]
        if workflow_type:
            content.append(
                {"op": "in", "content": {"field": "files.analysis.workflow_type",
                                         "value": [workflow_type]}}
            )
        params = {
            "filters": json.dumps({"op": "and", "content": content}),
            "fields": "file_id,file_name,cases.submitter_id,cases.case_id",
            "format": "JSON",
            "size": size,
        }
        response = _requests().post(f"{GDC_API}/files", json=params, timeout=120)
        response.raise_for_status()
        return response.json()["data"]["hits"]

    def download_file(self, file_id: str, output_path: Path) -> None:
        """Stream one file in 8 KiB chunks."""
        response = _requests().get(f"{GDC_API}/data/{file_id}", stream=True,
                                   timeout=600)
        response.raise_for_status()
        tmp_path = output_path.with_suffix(output_path.suffix + ".part")
        with open(tmp_path, "wb") as f:
            for chunk in response.iter_content(chunk_size=8192):
                f.write(chunk)
        tmp_path.rename(output_path)
        logger.info("Downloaded %s", output_path.name)

    def _download_many(self, files: List[dict], out_dir: Path) -> None:
        out_dir.mkdir(exist_ok=True)
        todo = [
            (f["file_id"], out_dir / f["file_name"])
            for f in files
            if not (out_dir / f["file_name"]).exists()
        ]
        if not todo:
            return
        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            futures = {
                pool.submit(self.download_file, fid, path): path
                for fid, path in todo
            }
            for fut in as_completed(futures):
                fut.result()  # re-raise errors

    # ------------------------------------------------------------------
    def download_mutations(self) -> Path:
        logger.info("Querying mutation data...")
        files = self.query_files(
            data_category="Simple Nucleotide Variation",
            data_type="Masked Somatic Mutation",
            workflow_type="Aliquot Ensemble Somatic Variant Merging and Masking",
        )
        logger.info("Found %d mutation files", len(files))
        maf_dir = self.raw_dir / "mutations"
        self._download_many(files, maf_dir)
        return maf_dir

    def download_rna_seq(self) -> Path:
        logger.info("Querying RNA-seq data...")
        files = self.query_files(
            data_category="Transcriptome Profiling",
            data_type="Gene Expression Quantification",
            workflow_type="STAR - Counts",
        )
        logger.info("Found %d RNA-seq files", len(files))
        rna_dir = self.raw_dir / "rna_seq"
        rna_dir.mkdir(exist_ok=True)

        metadata = []
        for info in files:
            cases = info.get("cases") or [{}]
            metadata.append(
                {
                    "file_id": info["file_id"],
                    "file_name": info["file_name"],
                    "case_id": cases[0].get("case_id"),
                    "submitter_id": cases[0].get("submitter_id"),
                    "file_path": str(rna_dir / info["file_name"]),
                }
            )
        pd.DataFrame(metadata).to_csv(rna_dir / "metadata.csv", index=False)
        self._download_many(files, rna_dir)
        return rna_dir

    def download_copy_number(self) -> Path:
        """Gene-level copy number (optional; the reference declares the
        `download.copy_number` flag but never implements the download)."""
        logger.info("Querying copy number data...")
        files = self.query_files(
            data_category="Copy Number Variation",
            data_type="Gene Level Copy Number",
        )
        logger.info("Found %d copy-number files", len(files))
        cnv_dir = self.raw_dir / "copy_number"
        self._download_many(files, cnv_dir)
        return cnv_dir

    def download_clinical(self) -> Path:
        logger.info("Querying clinical data...")
        params = {
            "filters": json.dumps(
                {"op": "in", "content": {"field": "cases.project.project_id",
                                         "value": [self.project_id]}}
            ),
            "expand": "diagnoses,demographic,exposures,follow_ups",
            "format": "JSON",
            "size": 1000,
        }
        response = _requests().get(f"{GDC_API}/cases", params=params, timeout=120)
        response.raise_for_status()
        cases = response.json()["data"]["hits"]
        logger.info("Found %d cases", len(cases))

        clinical = [self.parse_case(case) for case in cases]
        clinical_path = self.raw_dir / "clinical.csv"
        pd.DataFrame(clinical).to_csv(clinical_path, index=False)
        return clinical_path

    @staticmethod
    def parse_case(case: dict) -> Dict:
        """Flatten one expanded GDC case record."""
        demographic = case.get("demographic") or {}
        diagnoses = case.get("diagnoses") or []
        diag = diagnoses[0] if diagnoses else {}
        follow_ups = case.get("follow_ups") or []
        fu = follow_ups[-1] if follow_ups else {}
        return {
            "case_id": case.get("case_id"),
            "submitter_id": case.get("submitter_id"),
            "age_at_diagnosis": demographic.get("age_at_diagnosis"),
            "gender": demographic.get("gender"),
            "race": demographic.get("race"),
            "ethnicity": demographic.get("ethnicity"),
            "tumor_stage": diag.get("tumor_stage"),
            "primary_diagnosis": diag.get("primary_diagnosis"),
            "site_of_resection": diag.get("site_of_resection_or_biopsy"),
            "morphology": diag.get("morphology"),
            "days_to_death": fu.get("days_to_death"),
            "days_to_last_follow_up": fu.get("days_to_last_follow_up"),
            "vital_status": fu.get("vital_status"),
        }

    # ------------------------------------------------------------------
    def download_all(self, include_copy_number: bool = False) -> Dict[str, Path]:
        logger.info("Starting download for project %s", self.project_id)
        results = {
            "mutations": self.download_mutations(),
            "rna_seq": self.download_rna_seq(),
            "clinical": self.download_clinical(),
        }
        if include_copy_number:
            results["copy_number"] = self.download_copy_number()
        logger.info("Download complete")
        return results
