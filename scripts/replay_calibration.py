#!/usr/bin/env python3
"""Replay calibration modes against a dumped raw sample matrix.

The round-3 quality fixes were found with this workflow: run any demo
with OSDM_DUMP_RAW=<path>.npz (generation/generator.py debug hook) to
capture the model's pre-calibration outputs, then iterate calibration
host-side in ~2-minute cycles instead of 15-minute TPU pipeline runs.

Usage:
  OSDM_DUMP_RAW=/tmp/raw.npz DEMO_N=400 python scripts/demo_full_scale.py
  python scripts/replay_calibration.py /tmp/raw.npz <demo_workdir> \
      [copula_joint copula_full quantile ...]

Prints, per mode: pathway-coherence mean/pattern-correlation, the
chi-square co-occurrence pattern correlation, and the directional
mutation->pathway rule correlations (the metrics that regressed at
n=400 in round 2).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from osteosarcoma_diffusionmodel_tpu.config import Config
    from osteosarcoma_diffusionmodel_tpu.data.pathways import PathwayFeatures
    from osteosarcoma_diffusionmodel_tpu.generation.generator import (
        SyntheticPatientGenerator,
    )
    from osteosarcoma_diffusionmodel_tpu.ops.stats import (
        chi2_binary_pairs,
        mean_pairwise_corr_within_groups,
        pearson_corr,
    )
    from osteosarcoma_diffusionmodel_tpu.training.checkpoint import (
        load_data_stats,
    )

    raw_path, work = sys.argv[1], Path(sys.argv[2])
    modes = sys.argv[3:] or ["copula_joint", "copula_full"]

    raw = np.load(raw_path)["samples"]
    stats = load_data_stats(work / "ckpt")
    mut_df = pd.read_csv(work / "processed" / "mutation_matrix_aligned.csv",
                         index_col=0)
    expr_df = pd.read_csv(
        work / "processed" / "expression_matrix_aligned.csv", index_col=0)
    pz_cols = list(pd.read_csv(work / "processed" / "pathway_scores.csv",
                               index_col=0, nrows=0).columns)
    m, e = mut_df.shape[1], expr_df.shape[1]
    real_mut = mut_df.values.astype(np.float32)

    eng = PathwayFeatures()
    gpm = eng.create_gene_pathway_matrix()
    masks = []
    for pw in gpm.columns[:10]:
        genes = [g for g in gpm.index[gpm[pw] == 1] if g in expr_df.columns]
        if len(genes) < 3:
            continue
        col = np.zeros(e, np.float32)
        col[[expr_df.columns.get_loc(g) for g in genes]] = 1.0
        masks.append(col)
    mask = jnp.asarray(np.stack(masks, axis=1))
    real_coh = np.asarray(mean_pairwise_corr_within_groups(
        jnp.asarray(expr_df.values, jnp.float32), mask))

    g0 = np.random.default_rng(0)
    idx = g0.choice(m, size=min(50, m), replace=False)
    pairs = [(int(idx[i]), int(idx[j]))
             for i in range(len(idx)) for j in range(i + 1, len(idx))]
    pi = jnp.asarray([p[0] for p in pairs])
    pj = jnp.asarray([p[1] for p in pairs])
    chi_real = chi2_binary_pairs(jnp.asarray(real_mut), pi, pj)

    # A bare generator: only _postprocess/_calibrate are used, so the
    # model is irrelevant except for the discrete_head attribute.
    class _Stub:
        discrete_head = False
        latent_factor_dim = 0

    cfg = Config()
    dims = cfg.freeze_dims(m, e, raw.shape[1] - m - e, ["a", "b", "c"])
    gen = SyntheticPatientGenerator(_Stub(), {}, cfg, dims, data_stats=stats)

    for mode in modes:
        t0 = time.time()
        cfg.generation.calibrate_marginals = (
            False if mode == "false" else mode
        )
        gen._copula = gen._cont_chol = gen._joint = None
        out = gen._postprocess(raw, np.zeros((raw.shape[0], 3), np.float32))
        sc = np.asarray(mean_pairwise_corr_within_groups(
            jnp.asarray(out["expression"], jnp.float32), mask))
        chi_s = chi2_binary_pairs(
            jnp.asarray(out["mutations"], jnp.float32), pi, pj)
        rules = {}
        for gene, pw, want in [("TP53", "HALLMARK_P53_PATHWAY", -1),
                               ("MYC", "HALLMARK_MYC_TARGETS_V1", +1)]:
            if gene in mut_df.columns and pw in pz_cols:
                gi = mut_df.columns.get_loc(gene)
                pjx = pz_cols.index(pw)
                c = np.corrcoef(out["mutations"][:, gi],
                                out["pathways"][:, pjx])[0, 1]
                rules[gene] = (round(float(c), 3),
                               "OK" if np.sign(c) == want else "VIOL")
        print(
            f"[{mode}] coherence synth={sc.mean():.3f} (real "
            f"{real_coh.mean():.3f}) pattern_corr="
            f"{np.corrcoef(real_coh, sc)[0, 1]:.3f} "
            f"cooc={float(pearson_corr(chi_real, chi_s)):.3f} "
            f"rules={rules} ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
