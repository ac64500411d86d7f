#!/usr/bin/env python3
"""Focused fused-kernel variant sweep at the headline batch.

Round-4 GN-stats overlap experiment (VERDICT stretch item): measures
the staggered two-half software pipeline against the round-3 shipped
default and the kept negatives, all in one session so tunnel load
cancels out. Writes BENCH_VARIANTS.json.

  python scripts/bench_kernel_variants.py [batch]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from osteosarcoma_diffusionmodel_tpu.config import Config  # noqa: E402
from osteosarcoma_diffusionmodel_tpu.models.diffusion import (  # noqa: E402
    ConditionalDiffusion,
)
from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (  # noqa: E402
    FusedSampler,
)
from osteosarcoma_diffusionmodel_tpu.utils.profiling import (  # noqa: E402
    enable_compilation_cache,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

VARIANTS = [
    ("sequential_bf16", dict(gn_mode="bf16")),          # shipped default
    ("staggered_bf16", dict(gn_mode="bf16", interleave="staggered")),
    ("staggered_f32", dict(gn_mode="f32", interleave="staggered")),
    ("pingpong_bf16", dict(gn_mode="bf16", interleave="pingpong")),
    ("sequential_f32", dict(gn_mode="f32")),
]


def main():
    enable_compilation_cache()
    cfg = Config()
    cfg.model.diffusion.num_steps = 1000
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(
        62, 5054, 26,
        ["survival_days_norm", "event_occurred", "metastasis_at_diagnosis"],
    )
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    cond = jnp.zeros((BATCH, dims.condition_dim), jnp.float32)

    results = {"batch": BATCH}
    for label, kw in VARIANTS:
        fs = FusedSampler(model, params, **kw)
        # Warm-up + compile; scalar readback forces completion.
        float(fs.sample(cond, jax.random.PRNGKey(1))[0, 0])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(fs.sample(cond, jax.random.PRNGKey(2 + i))[12, 34])
            times.append(time.perf_counter() - t0)
        pps = BATCH / min(times)
        results[label] = round(pps, 1)
        print(f"{label:24s} {pps:10.1f} patients/sec", flush=True)

    with open(REPO / "BENCH_VARIANTS.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
