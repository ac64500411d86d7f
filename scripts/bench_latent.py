#!/usr/bin/env python3
"""Latent-tail sampler microbench at the headline bench shape.

Times, on the attached accelerator at the production dims
(62 + 5054 + 26 features, 1000-step DDPM):
  - the fused Pallas data-space kernel (the shipped headline path)
  - the XLA latent-tail reference (ops/latent_sampler.py)
  - the Pallas latent-tail kernel when available
plus the clip-headroom probe profile for the constructed params.

Writes BENCH_LATENT.json (platform-stamped) and prints the table.
Usage: python scripts/bench_latent.py [--batch 32768] [--steps 1000]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MUTATION_DIM, EXPRESSION_DIM, PATHWAY_DIM, CONDITION_DIM = 62, 5054, 26, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--head", type=int, default=0,
                    help="fixed head steps (0 = use the probe)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osteosarcoma_diffusionmodel_tpu.config import Config
    from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
        ConditionalDiffusion,
    )
    from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
        maybe_fused_sampler,
    )
    from osteosarcoma_diffusionmodel_tpu.ops.latent_sampler import (
        LatentTailSampler,
        calibrate_head_steps,
    )
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    config = Config()
    config.model.diffusion.num_steps = args.steps
    config.model.constraints.enabled = False
    dims = config.freeze_dims(
        MUTATION_DIM, EXPRESSION_DIM, PATHWAY_DIM,
        ["survival_days_norm", "event_occurred", "metastasis_at_diagnosis"],
    )
    model = ConditionalDiffusion.from_config(config, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    conditions = jnp.zeros((args.batch, CONDITION_DIM), jnp.float32)
    report = {"platform": platform, "batch": args.batch,
              "steps": args.steps, "timings": {}}

    def timeit(name, fn):
        float(fn(jax.random.PRNGKey(1))[0, 0])  # compile + warm
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            float(fn(jax.random.PRNGKey(2 + i))[12, 34])
            times.append(time.perf_counter() - t0)
        best = min(times)
        report["timings"][name] = {
            "seconds": round(best, 4),
            "patients_per_sec": round(args.batch / best, 1),
        }
        print(f"{name}: {best:.3f}s = "
              f"{args.batch / best:,.0f} patients/sec", flush=True)

    # Clip-headroom probe (small cohort).
    t0 = time.perf_counter()
    head, profile = calibrate_head_steps(
        model, params, conditions[:256], jax.random.PRNGKey(9)
    )
    report["probe"] = {
        "head_steps": head,
        "seconds": round(time.perf_counter() - t0, 2),
        "profile_max": float(profile.max()),
        "profile_p99_row": int(
            np.argmax(profile > 0.99 * profile.max())
        ),
    }
    print(f"probe: head_steps={head} max|x0_pred|={profile.max():.2f} "
          f"({report['probe']['seconds']}s)", flush=True)
    if args.head:
        head = args.head

    fused = maybe_fused_sampler(model, params)
    if fused is not None:
        timeit("fused_dataspace", lambda k: fused.sample(conditions, k))

    latent = LatentTailSampler(model, params, head_steps=head)
    sample_jit = None
    if platform in ("tpu", "axon", "cpu"):
        import functools

        sample_jit = jax.jit(
            functools.partial(latent.sample, conditions)
        )
        timeit(f"latent_xla_head{head}", sample_jit)

    if platform in ("tpu", "axon"):
        from osteosarcoma_diffusionmodel_tpu.ops.latent_sampler import (
            LatentFusedSampler,
        )

        lf = LatentFusedSampler(model, params, head_steps=head)
        timeit(
            f"latent_pallas_head{head}",
            lambda k: lf.sample(conditions, k),
        )

    out = REPO / "BENCH_LATENT.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["timings"]))


if __name__ == "__main__":
    main()
