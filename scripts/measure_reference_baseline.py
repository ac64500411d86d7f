#!/usr/bin/env python3
"""Measure the reference implementation's CPU sampling throughput.

Runs the reference model from /root/reference in-process (stubbing its
unused torch_geometric import — the GNN encoder is dead code, SURVEY §2)
at the production dims (62 mutation + 5054 expression + 26 pathway
features, 3 conditions) and times the full 1000-step DDPM `sample()`.

Writes BASELINE_MEASURED.json at the repo root; bench.py uses it as the
vs_baseline denominator. BASELINE.md requires the reference number to be
measured on this machine rather than trusting the doc estimates.
"""

import json
import sys
import time
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def stub_torch_geometric():
    fake = types.ModuleType("torch_geometric")
    fake_nn = types.ModuleType("torch_geometric.nn")
    fake_nn.GATConv = object
    fake_nn.global_mean_pool = lambda *a, **k: None
    fake.nn = fake_nn
    sys.modules["torch_geometric"] = fake
    sys.modules["torch_geometric.nn"] = fake_nn


def main():
    import torch

    torch.manual_seed(0)
    stub_torch_geometric()
    sys.path.insert(0, str(REFERENCE))
    from models.diffusion import BiologyAwareDiffusionModel  # noqa: E501  (reference import, not repo code)

    config = {
        "model": {
            "latent_dim": 128,
            "hidden_dims": [256, 512, 256],
            "gnn": {"dropout": 0.2},
            "diffusion": {"num_steps": 1000, "beta_schedule": "cosine"},
        }
    }
    model = BiologyAwareDiffusionModel(
        mutation_dim=62, expression_dim=5054, pathway_dim=26,
        condition_dim=3, config=config,
    )
    model.eval()

    results = {}
    for batch in (16, 64):
        conditions = torch.randn(batch, 3)
        # Warm-up a few reverse steps.
        with torch.no_grad():
            x = torch.randn(batch, model.data_dim)
            for t in reversed(range(995, 1000)):
                x = model.p_sample(x, t, conditions)
        t0 = time.perf_counter()
        with torch.no_grad():
            model.sample(conditions, num_samples=batch)
        dt = time.perf_counter() - t0
        results[f"batch_{batch}"] = {
            "patients": batch,
            "seconds": dt,
            "patients_per_sec": batch / dt,
        }
        print(f"batch={batch}: {dt:.1f}s -> {batch/dt:.3f} patients/sec",
              flush=True)

    best = max(v["patients_per_sec"] for v in results.values())
    out = {
        "reference_cpu_patients_per_sec": best,
        "details": results,
        "num_steps": 1000,
        "dims": {"mutation": 62, "expression": 5054, "pathway": 26,
                 "conditions": 3},
        "torch_version": torch.__version__,
    }
    with open(REPO / "BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["details"], indent=2))


if __name__ == "__main__":
    main()
