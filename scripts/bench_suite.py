#!/usr/bin/env python3
"""Extended benchmark suite: training throughput, sampler variants,
validation statistics, at production dims on the attached accelerator.

Complements bench.py (which prints the single headline line for the
driver) with the secondary metrics BASELINE.json names: train steps/sec
and the MMD/validate path. Writes BENCH_SUITE.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.models.constraints import ConstraintSpec
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion
from osteosarcoma_diffusionmodel_tpu.ops.pallas_kernels import mmd_rbf_auto
from osteosarcoma_diffusionmodel_tpu.ops.stats import ks_test_features, mmd_rbf

REPO = Path(__file__).resolve().parent.parent
M, E, P, C = 62, 5054, 26, 3


def _force(out):
    """Force completion with a scalar readback — on the tunneled TPU
    backend block_until_ready alone can return before execution."""
    jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and leaf.size:
            float(leaf.ravel()[0])
            break


def timeit(fn, *args, n=3):
    _force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    results = {}
    config = Config()
    dims = config.freeze_dims(M, E, P, ["s", "e", "m"])

    # Constraint spec with realistic sparsity.
    rng = np.random.default_rng(0)
    mask = np.zeros((E, 20), np.float32)
    for p in range(20):
        mask[rng.choice(E, 15, replace=False), p] = 1.0
    spec = ConstraintSpec(
        mutation_dim=M, expression_dim=E, pathway_dim=P,
        pathway_mask=mask,
        exclusive_pairs=np.array([[0, 1]], np.int32),
        rule_mutation_idx=np.array([0], np.int32),
        rule_pathway_idx=np.array([0], np.int32),
        rule_sign=np.array([-1.0], np.float32),
    )
    model = ConditionalDiffusion.from_config(config, dims, spec)
    params = model.init_params(jax.random.PRNGKey(0), C)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, weight_decay=1e-5))
    opt_state = tx.init(params)

    batch = 16  # reference batch size (config.yaml:64)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, dims.data_dim))
    cond = jnp.zeros((batch, C))

    @jax.jit
    def train_step(params, opt_state, x0, cond, rng):
        (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, x0, cond, rng, False
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dt = timeit(lambda: train_step(params, opt_state, x0, cond,
                                   jax.random.PRNGKey(2)), n=10)
    results["train_step_sec_b16_constraints"] = dt
    results["train_steps_per_sec_b16_constraints"] = 1.0 / dt

    # Larger batch training.
    x0b = jax.random.normal(jax.random.PRNGKey(1), (256, dims.data_dim))
    condb = jnp.zeros((256, C))
    dtb = timeit(lambda: train_step(params, opt_state, x0b, condb,
                                    jax.random.PRNGKey(2)), n=10)
    results["train_step_sec_b256_constraints"] = dtb
    results["train_samples_per_sec_b256"] = 256 / dtb

    # Sampler variants.
    for batch_s in (1024, 4096, 8192):
        cond_s = jnp.zeros((batch_s, C))
        f = jax.jit(lambda p, c, k: model.sample(p, c, k))
        dt = timeit(f, params, cond_s, jax.random.PRNGKey(3), n=2)
        results[f"ddpm1000_patients_per_sec_b{batch_s}"] = batch_s / dt

    # Fused whole-loop Pallas kernel (the production path for large
    # single-chip cohorts).
    from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
        maybe_fused_sampler,
    )

    fused = maybe_fused_sampler(model, params)
    if fused is not None:
        for batch_s in (4096, 8192, 16384, 32768):
            cond_s = jnp.zeros((batch_s, C))
            dt = timeit(
                lambda c, k: fused.sample(c, k),
                cond_s, jax.random.PRNGKey(3), n=2,
            )
            results[f"ddpm1000_fused_patients_per_sec_b{batch_s}"] = (
                batch_s / dt
            )

    # Round-3 kernel variants at the headline batch: GroupNorm stats
    # implementation (gn_mode; bf16 is the shipped default, f32 the
    # round-2 layout) and the int8 MXU mode (measured wash-to-loss for
    # DDPM — kept reproducible here; BASELINE.md anatomy).
    if fused is not None:
        from osteosarcoma_diffusionmodel_tpu.ops.fused_sampler import (
            FusedSampler,
        )

        cond_s = jnp.zeros((32768, C))
        for label, kw in (
            ("gn_f32", dict(gn_mode="f32")),
            ("int8_out", dict(gn_mode="bf16", quantize="out")),
            # Round-4 GN-stats overlap attack: two-half software
            # pipeline offset by one stage (MXU stages of one half
            # adjacent to the other's VPU stats stages).
            ("staggered", dict(gn_mode="bf16", interleave="staggered")),
            ("staggered_gn_f32", dict(gn_mode="f32",
                                      interleave="staggered")),
        ):
            fs_var = FusedSampler(model, params, **kw)
            dt = timeit(
                lambda c, k: fs_var.sample(c, k),
                cond_s, jax.random.PRNGKey(3), n=2,
            )
            results[f"ddpm1000_fused_b32768_{label}"] = 32768 / dt

    # Binary D3PM mutation head (scan sampler; bits drawn in-scan).
    import dataclasses as _dc

    model_disc = _dc.replace(model, discrete_head=True, mutation_dim=M)
    cond_s = jnp.zeros((4096, C))
    f_disc = jax.jit(lambda p, c, k: model_disc.sample(p, c, k))
    dt = timeit(f_disc, params, cond_s, jax.random.PRNGKey(3), n=2)
    results["ddpm1000_discrete_head_patients_per_sec_b4096"] = 4096 / dt

    # Discrete head through the fused whole-loop kernel (the D3PM
    # posterior rides the kernel on a 128-lane slice).
    fused_disc = maybe_fused_sampler(model_disc, params)
    if fused_disc is not None:
        for batch_s in (4096, 32768):
            cond_s = jnp.zeros((batch_s, C))
            dt = timeit(
                lambda c, k: fused_disc.sample(c, k),
                cond_s, jax.random.PRNGKey(3), n=2,
            )
            results[
                f"ddpm1000_discrete_fused_patients_per_sec_b{batch_s}"
            ] = batch_s / dt

    # Round-1 sampler numerics (f32 carry + gaussian transition noise)
    # for the ablation record.
    import dataclasses

    model_r1 = dataclasses.replace(
        model, sample_dtype="float32", noise_type="normal"
    )
    cond_s = jnp.zeros((4096, C))
    f_r1 = jax.jit(lambda p, c, k: model_r1.sample(p, c, k))
    dt = timeit(f_r1, params, cond_s, jax.random.PRNGKey(3), n=2)
    results["ddpm1000_patients_per_sec_b4096_f32_gaussian"] = 4096 / dt
    cond_s = jnp.zeros((1024, C))
    fd = jax.jit(lambda p, c, k: model.sample_ddim(p, c, k, 50))
    dt = timeit(fd, params, cond_s, jax.random.PRNGKey(3), n=2)
    results["ddim50_patients_per_sec_b1024"] = 1024 / dt

    # Fused (noise-free) DDIM-50 kernel.
    fused_ddim = maybe_fused_sampler(model, params, ddim_steps=50)
    if fused_ddim is not None:
        for batch_s in (8192, 32768, 131072):
            cond_s = jnp.zeros((batch_s, C))
            dt = timeit(
                lambda c, k: fused_ddim.sample(c, k),
                cond_s, jax.random.PRNGKey(3), n=2,
            )
            results[f"ddim50_fused_patients_per_sec_b{batch_s}"] = (
                batch_s / dt
            )

    # Alternate model families: one-pass samplers (flow inverse pass,
    # cVAE decoder) at production dims, batch 4096.
    from osteosarcoma_diffusionmodel_tpu.models.cvae import (
        BiologyConstrainedVAE,
    )
    from osteosarcoma_diffusionmodel_tpu.models.flow import ConditionalFlow

    flow = ConditionalFlow.from_config(config, dims)
    flow_params = flow.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    cond_s = jnp.zeros((4096, C))
    f_flow = jax.jit(lambda p, c, k: flow.sample(p, c, k))
    dt = timeit(f_flow, flow_params, cond_s, jax.random.PRNGKey(3), n=2)
    results["flow_patients_per_sec_b4096"] = 4096 / dt

    vae = BiologyConstrainedVAE.from_config(config, dims)
    vae_vars = vae.init_variables(jax.random.PRNGKey(0), dims.condition_dim)
    f_vae = jax.jit(
        lambda p, bs, c, k: vae.sample(p, bs, c, k)
    )
    dt = timeit(
        f_vae, vae_vars["params"], vae_vars["batch_stats"], cond_s,
        jax.random.PRNGKey(3), n=2,
    )
    results["cvae_patients_per_sec_b4096"] = 4096 / dt

    # Validation statistics at 10k-cohort scale.
    real = jax.random.normal(jax.random.PRNGKey(4), (100, dims.data_dim))
    synth = jax.random.normal(jax.random.PRNGKey(5), (10000, dims.data_dim))
    results["mmd_10k_sec"] = timeit(lambda: mmd_rbf_auto(real, synth), n=2)
    results["mmd_10k_pallas_equals_jnp"] = bool(
        abs(float(mmd_rbf_auto(real, synth)) - float(mmd_rbf(real, synth)))
        < 1e-3
    )
    results["ks100_10k_sec"] = timeit(
        lambda: ks_test_features(real[:, :100], synth[:, :100]), n=2
    )

    results["device"] = str(jax.devices()[0])
    with open(REPO / "BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
