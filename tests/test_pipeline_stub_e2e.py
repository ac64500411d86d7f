"""Full 6-step pipeline e2e against a live GDC HTTP stub (round-2
VERDICT item 5): download -> preprocess -> pathways -> train ->
generate -> validate, from stubbed network bytes to the validation CSV,
so the only untested element left is the real network itself.

The stub serves the complete GDC protocol the loader speaks
(reference data/gdc_loader.py:29-240): POST /files queries per data
category, streamed GET /data/<id> (gzipped MAF, STAR-counts TSVs), and
the expanded GET /cases records."""

import gzip
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.data import gdc_loader

N_CASES = 40
MUT_GENES = ["TP53", "RB1", "ATRX", "DLG2", "PTEN", "MDM2", "MYC"] + [
    f"MUT{i}" for i in range(7)
]


def _build_cohort():
    """Deterministic TARGET-OS-shaped raw payloads."""
    rng = np.random.default_rng(42)
    sids = [f"TARGET-40-{i:04d}" for i in range(N_CASES)]

    # --- cases (clinical)
    cases = []
    for i, sid in enumerate(sids):
        dead = bool(rng.random() < 0.4)
        cases.append(
            {
                "case_id": f"case-{i}",
                "submitter_id": sid,
                "demographic": {
                    "age_at_diagnosis": int(4000 + rng.integers(0, 4000)),
                    "gender": "female" if i % 2 else "male",
                    "race": "white",
                    "ethnicity": "not hispanic or latino",
                },
                "diagnoses": [
                    {
                        "tumor_stage": "stage iv" if rng.random() < 0.3
                        else "stage ii",
                        "primary_diagnosis": "Osteosarcoma",
                        "site_of_resection_or_biopsy": "Bone",
                        "morphology": "9180/3",
                    }
                ],
                "follow_ups": [
                    {"days_to_death": int(200 + rng.integers(0, 1500)),
                     "vital_status": "Dead"}
                    if dead
                    else {
                        "days_to_last_follow_up": int(
                            300 + rng.integers(0, 2000)
                        ),
                        "vital_status": "Alive",
                    }
                ],
            }
        )

    # --- two gzipped MAF shards covering all samples
    freqs = rng.uniform(0.15, 0.6, len(MUT_GENES))
    rows = []
    for i, sid in enumerate(sids):
        bc = f"{sid}-01A"
        for g, f in zip(MUT_GENES, freqs):
            if rng.random() < f:
                rows.append(
                    {
                        "Hugo_Symbol": g,
                        "Tumor_Sample_Barcode": bc,
                        "Variant_Classification": "Missense_Mutation",
                    }
                )
        # Silent noise the preprocessor must drop.
        rows.append(
            {
                "Hugo_Symbol": "SILENTG",
                "Tumor_Sample_Barcode": bc,
                "Variant_Classification": "Silent",
            }
        )
    maf = pd.DataFrame(rows)
    half = len(maf) // 2
    maf_blobs = {}
    for name, part in [("shard1.maf.gz", maf.iloc[:half]),
                       ("shard2.maf.gz", maf.iloc[half:])]:
        buf = io.BytesIO()
        with gzip.open(buf, "wt") as f:
            part.to_csv(f, sep="\t", index=False)
        maf_blobs[name] = buf.getvalue()

    # --- per-sample STAR-counts TSVs over hallmark member genes
    from osteosarcoma_diffusionmodel_tpu.data.pathways import (
        HALLMARK_GENE_SETS,
    )

    expr_genes = []
    for genes in HALLMARK_GENE_SETS.values():
        for g in genes:
            if g not in expr_genes:
                expr_genes.append(g)
            if len(expr_genes) >= 60:
                break
        if len(expr_genes) >= 60:
            break
    rna_blobs = {}
    for sid in sids:
        counts = pd.DataFrame(
            {
                "gene_id": [f"ENSG{j:05d}.1" for j in range(len(expr_genes))],
                "gene_name": expr_genes,
                "gene_type": "protein_coding",
                "unstranded": rng.integers(0, 2000, len(expr_genes)),
                "stranded_first": 0,
            }
        )
        body = "# STAR counts\n" + counts.to_csv(sep="\t", index=False)
        rna_blobs[f"{sid}.rna_seq.tsv"] = body.encode()

    return sids, cases, maf_blobs, rna_blobs


SIDS, CASES, MAF_BLOBS, RNA_BLOBS = _build_cohort()
FILES = {}  # file_id -> bytes
for k, (name, blob) in enumerate(MAF_BLOBS.items()):
    FILES[f"maf-{k}"] = (name, blob)
for k, (name, blob) in enumerate(RNA_BLOBS.items()):
    FILES[f"rna-{k}"] = (name, blob)


class _GDCStub(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):
        pass

    def _json(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length) or b"{}")
        if self.path != "/files":
            return self._json(404, {})
        filters = json.loads(payload["filters"])
        values = {
            c["content"]["field"]: c["content"]["value"]
            for c in filters["content"]
        }
        cat = values.get("files.data_category", [None])[0]
        if cat == "Simple Nucleotide Variation":
            hits = [
                {
                    "file_id": fid,
                    "file_name": FILES[fid][0],
                    "cases": [{"submitter_id": SIDS[0],
                               "case_id": "case-0"}],
                }
                for fid in FILES
                if fid.startswith("maf-")
            ]
        elif cat == "Transcriptome Profiling":
            hits = []
            rna_ids = [fid for fid in FILES if fid.startswith("rna-")]
            for fid in rna_ids:
                sid = FILES[fid][0].split(".rna_seq")[0]
                hits.append(
                    {
                        "file_id": fid,
                        "file_name": FILES[fid][0],
                        "cases": [
                            {"submitter_id": sid,
                             "case_id": f"case-{SIDS.index(sid)}"}
                        ],
                    }
                )
        else:
            hits = []
        self._json(200, {"data": {"hits": hits}})

    def do_GET(self):
        path = urlparse(self.path).path
        if path.startswith("/data/"):
            fid = path.split("/")[-1]
            if fid not in FILES:
                return self._json(404, {})
            blob = FILES[fid][1]
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)
        elif path == "/cases":
            self._json(200, {"data": {"hits": CASES}})
        else:
            self._json(404, {})


@pytest.fixture()
def stub_api():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _GDCStub)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    old = gdc_loader.GDC_API
    gdc_loader.GDC_API = f"http://127.0.0.1:{server.server_address[1]}"
    yield gdc_loader.GDC_API
    gdc_loader.GDC_API = old
    server.shutdown()
    server.server_close()


@pytest.mark.slow
def test_all_six_steps_from_stubbed_network(stub_api, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from osteosarcoma_diffusionmodel_tpu.cli import (
        STEP_FUNCTIONS, train_model,
    )

    cfg = Config()
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.data.raw_dir = str(tmp_path / "data" / "raw")
    cfg.data.processed_dir = str(tmp_path / "data" / "processed")
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.diffusion.num_steps = 8
    cfg.model.compute_dtype = "float32"
    cfg.training.num_epochs = 3
    cfg.training.batch_size = 8
    cfg.training.save_dir = str(tmp_path / "ckpt")
    cfg.generation.num_synthetic_samples = 30
    cfg.output.results_dir = str(tmp_path / "results")
    cfg.output.synthetic_data_dir = str(tmp_path / "results" / "synthetic")

    for step in ("download", "preprocess", "pathways", "train",
                 "generate", "validate"):
        if step == "train":
            train_model(cfg)  # dispatched specially by main(), as here
        else:
            STEP_FUNCTIONS[step](cfg)

    # Download artifacts landed where the preprocessor expects them.
    raw = tmp_path / "data" / "raw"
    assert sorted(p.name for p in (raw / "mutations").iterdir()) == [
        "shard1.maf.gz", "shard2.maf.gz",
    ]
    assert (raw / "rna_seq" / "metadata.csv").exists()
    assert (raw / "clinical.csv").exists()

    # Preprocessed cohort aligned across the three modalities.
    processed = tmp_path / "data" / "processed"
    mut = pd.read_csv(processed / "mutation_matrix_aligned.csv", index_col=0)
    expr = pd.read_csv(processed / "expression_matrix_aligned.csv",
                       index_col=0)
    clin = pd.read_csv(processed / "clinical_aligned.csv")
    assert len(mut) == len(expr) == len(clin) == N_CASES
    assert "TP53" in mut.columns
    assert not (processed / "mutation_matrix_aligned.csv").read_text().count(
        "SILENTG"
    )

    # Validation CSV produced with finite metrics.
    results = pd.read_csv(tmp_path / "results" / "validation_results.csv")
    assert "overall_biological_score" in results.columns
    assert np.isfinite(results["overall_biological_score"].iloc[0])
    assert "nn_distance_ratio" in results.columns
