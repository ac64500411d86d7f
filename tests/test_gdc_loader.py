"""GDC loader: case parsing and offline behavior (no network calls)."""

import pytest

from osteosarcoma_diffusionmodel_tpu.data.gdc_loader import GDCDataLoader


def test_parse_case_full():
    case = {
        "case_id": "c1",
        "submitter_id": "TARGET-40-0001",
        "demographic": {"age_at_diagnosis": 5100, "gender": "female",
                        "race": "white", "ethnicity": "unknown"},
        "diagnoses": [{"tumor_stage": "Stage IVA",
                       "primary_diagnosis": "Osteosarcoma",
                       "site_of_resection_or_biopsy": "Bone",
                       "morphology": "9180/3"}],
        "follow_ups": [
            {"days_to_death": None, "days_to_last_follow_up": 500,
             "vital_status": "Alive"},
            {"days_to_death": 900, "days_to_last_follow_up": None,
             "vital_status": "Dead"},
        ],
    }
    row = GDCDataLoader.parse_case(case)
    assert row["submitter_id"] == "TARGET-40-0001"
    assert row["age_at_diagnosis"] == 5100
    assert row["tumor_stage"] == "Stage IVA"
    # Most recent follow-up wins (reference gdc_loader.py:198).
    assert row["days_to_death"] == 900
    assert row["vital_status"] == "Dead"


def test_parse_case_sparse():
    row = GDCDataLoader.parse_case({"case_id": "c2", "submitter_id": "X"})
    assert row["age_at_diagnosis"] is None
    assert row["tumor_stage"] is None
    assert row["days_to_death"] is None


def test_loader_creates_dirs(tmp_path):
    loader = GDCDataLoader(data_dir=tmp_path / "d")
    assert (tmp_path / "d" / "raw").is_dir()
    assert loader.project_id == "TARGET-OS"
