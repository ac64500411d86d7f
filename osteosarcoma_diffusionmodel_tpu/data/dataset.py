"""Dataset assembly: aligned arrays, normalization, splits, mixup.

Capability parity with reference utils/train.py:
- `OsteosarcomaArrays` mirrors `OsteosarcomaDataset` (train.py:22-82):
  intersect sample indices across the four processed tables, concat
  [mutations | expression | pathways] into one flat patient vector,
  NaN-safe conditions, survival vector for the aux loss.
- `prepare_arrays` mirrors `prepare_data` (train.py:342-444): loads the
  aligned CSVs, lazily computes pathway scores, z-scores pathway
  scores and survival, resolves condition features, seeded val split.

TPU-first: no DataLoader — the full cohort (~100 x ~5k floats) lives
on device; batches are gathered by permuted index inside the jitted
train step, and mixup is a jit-compatible transform with explicit PRNG
(the reference uses host numpy/torch RNG, train.py:110-115).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import Config, FrozenDims
from .pathways import PathwayFeatures

logger = logging.getLogger(__name__)


@dataclass
class OsteosarcomaArrays:
    """Aligned, model-ready arrays plus the column metadata."""

    data: np.ndarray  # (N, mutation+expression+pathway) float32
    conditions: np.ndarray  # (N, C) float32, NaN -> 0
    survival: np.ndarray  # (N,) float32 raw survival_days
    sample_ids: List[str]
    mutation_genes: List[str]
    expression_genes: List[str]
    pathway_names: List[str]
    condition_names: List[str]
    survival_mean: float = 800.0
    survival_std: float = 500.0

    @property
    def n_samples(self) -> int:
        return self.data.shape[0]

    @property
    def dims(self) -> Tuple[int, int, int, int]:
        return (
            len(self.mutation_genes),
            len(self.expression_genes),
            len(self.pathway_names),
            len(self.condition_names),
        )


def build_arrays(
    mutation_matrix: pd.DataFrame,
    expression_matrix: pd.DataFrame,
    pathway_scores: pd.DataFrame,
    clinical_data: pd.DataFrame,
    condition_features: List[str],
    survival_mean: float = 800.0,
    survival_std: float = 500.0,
) -> OsteosarcomaArrays:
    """Intersect indices and assemble the flat patient tensors
    (reference train.py:33-68)."""
    clinical = clinical_data.set_index("submitter_id")
    common = (
        mutation_matrix.index.intersection(expression_matrix.index)
        .intersection(pathway_scores.index)
        .intersection(clinical.index)
    )
    mut = mutation_matrix.loc[common].values.astype(np.float32)
    expr = expression_matrix.loc[common].values.astype(np.float32)
    path = pathway_scores.loc[common].values.astype(np.float32)
    data = np.concatenate([mut, expr, path], axis=1)

    clin = clinical.loc[common]
    cond = np.nan_to_num(
        clin[condition_features].values.astype(np.float32), nan=0.0
    )
    survival = clin["survival_days"].fillna(0).values.astype(np.float32)

    logger.info("Dataset: %d samples, data dim %d, condition dim %d",
                len(common), data.shape[1], cond.shape[1])

    return OsteosarcomaArrays(
        data=data,
        conditions=cond,
        survival=survival,
        sample_ids=[str(s) for s in common],
        mutation_genes=[str(c) for c in mutation_matrix.columns],
        expression_genes=[str(c) for c in expression_matrix.columns],
        pathway_names=[str(c) for c in pathway_scores.columns],
        condition_names=list(condition_features),
        survival_mean=survival_mean,
        survival_std=survival_std,
    )


def resolve_pretrain_dir(entry: str, config: Config) -> Path:
    """A pretrain_datasets entry is either a processed-data directory or
    a GDC project id mapping to data_dir/pretrain/<project>/processed."""
    p = Path(entry)
    if p.is_dir():
        return p
    return Path(config.data.data_dir) / "pretrain" / entry / "processed"


def load_pretrain_arrays(
    config: Config, primary: OsteosarcomaArrays
) -> Optional[OsteosarcomaArrays]:
    """Cross-cancer pretraining cohorts, aligned onto the primary
    cohort's feature space.

    Implements the `cross_cancer_pretrain` / `pretrain_datasets` config
    keys the reference declares but never reads (reference
    config.yaml:77-78, SURVEY §5 "declared-but-unused keys"). Each
    dataset's matrices are column-reindexed onto the primary gene /
    pathway / condition lists (absent features filled with 0), pathway
    scores and survival are z-scored within each cohort, and the cohorts
    are concatenated into one pretraining array set. Returns None when
    the feature is off or no dataset is usable.
    """
    aug = config.training.augmentation
    if not (aug.cross_cancer_pretrain and aug.pretrain_datasets):
        return None

    datas, conds, survs, ids = [], [], [], []
    for entry in aug.pretrain_datasets:
        d = resolve_pretrain_dir(entry, config)
        needed = [
            d / "mutation_matrix_aligned.csv",
            d / "expression_matrix_aligned.csv",
            d / "clinical_aligned.csv",
        ]
        if not all(f.exists() for f in needed):
            logger.warning(
                "Pretrain dataset %s: processed artifacts missing under %s "
                "— skipping (run download/preprocess for it first)",
                entry, d,
            )
            continue
        mut = pd.read_csv(needed[0], index_col=0).reindex(
            columns=primary.mutation_genes, fill_value=0.0
        )
        expr = pd.read_csv(needed[1], index_col=0).reindex(
            columns=primary.expression_genes, fill_value=0.0
        )
        clin = pd.read_csv(needed[2])

        path_file = d / "pathway_scores.csv"
        if path_file.exists():
            path = pd.read_csv(path_file, index_col=0)
        else:
            eng = PathwayFeatures(config.data.pathway_database)
            eng.load_gene_sets()
            path = eng.compute_pathway_scores_from_expression(expr)
        path = path.reindex(columns=primary.pathway_names, fill_value=0.0)
        path = (path - path.mean()) / (path.std() + 1e-8)

        surv_mean = float(clin["survival_days"].mean())
        surv_std = float(clin["survival_days"].std() + 1e-8)
        clin["survival_days_norm"] = (
            clin["survival_days"] - surv_mean
        ) / surv_std
        for col in primary.condition_names:
            if col not in clin.columns:
                clin[col] = 0.0

        arrays = build_arrays(
            mut, expr, path, clin, list(primary.condition_names),
            survival_mean=surv_mean, survival_std=surv_std,
        )
        if arrays.n_samples == 0:
            logger.warning("Pretrain dataset %s: no aligned samples", entry)
            continue
        datas.append(arrays.data)
        conds.append(arrays.conditions)
        survs.append(arrays.survival)
        ids.extend(f"{entry}:{s}" for s in arrays.sample_ids)
        logger.info("Pretrain dataset %s: %d samples", entry, arrays.n_samples)

    if not datas:
        return None
    pooled_surv = np.concatenate(survs)
    return OsteosarcomaArrays(
        data=np.concatenate(datas, axis=0),
        conditions=np.concatenate(conds, axis=0),
        survival=pooled_surv,
        sample_ids=ids,
        mutation_genes=list(primary.mutation_genes),
        expression_genes=list(primary.expression_genes),
        pathway_names=list(primary.pathway_names),
        condition_names=list(primary.condition_names),
        survival_mean=float(pooled_surv.mean()),
        survival_std=float(pooled_surv.std() + 1e-8),
    )


def prepare_arrays(config: Config) -> Tuple[OsteosarcomaArrays, FrozenDims]:
    """Load processed CSVs and build model-ready arrays + frozen dims.

    Mirrors reference prepare_data (train.py:342-444): lazy pathway-score
    computation, z-scored pathway scores, z-scored survival as the
    `survival_days_norm` condition, condition features resolved against
    what the clinical table actually provides.
    """
    processed = Path(config.data.processed_dir)

    mutation_matrix = pd.read_csv(
        processed / "mutation_matrix_aligned.csv", index_col=0
    )
    expression_matrix = pd.read_csv(
        processed / "expression_matrix_aligned.csv", index_col=0
    )
    clinical_data = pd.read_csv(processed / "clinical_aligned.csv")

    pathway_path = processed / "pathway_scores.csv"
    if not pathway_path.exists():
        logger.info("Computing pathway scores (lazy)...")
        eng = PathwayFeatures(config.data.pathway_database)
        eng.load_gene_sets()
        pathway_scores = eng.compute_pathway_scores_from_expression(
            expression_matrix
        )
        pathway_scores.to_csv(pathway_path)
    else:
        pathway_scores = pd.read_csv(pathway_path, index_col=0)

    # Normalize pathway scores column-wise (train.py:387).
    pathway_scores = (pathway_scores - pathway_scores.mean()) / (
        pathway_scores.std() + 1e-8
    )

    # Normalize survival (train.py:390-392); keep stats for generation.
    surv_mean = float(clinical_data["survival_days"].mean())
    surv_std = float(clinical_data["survival_days"].std() + 1e-8)
    clinical_data["survival_days_norm"] = (
        clinical_data["survival_days"] - surv_mean
    ) / surv_std

    condition_features = config.resolve_condition_columns(
        list(clinical_data.columns)
    )
    if not condition_features:
        # Fall back to whatever numeric features are available, like the
        # reference's availability filter (train.py:395-398).
        fallback = ["survival_days_norm", "event_occurred", "age_years"]
        condition_features = [f for f in fallback if f in clinical_data.columns]
    logger.info("Condition features: %s", condition_features)

    arrays = build_arrays(
        mutation_matrix,
        expression_matrix,
        pathway_scores,
        clinical_data,
        condition_features,
        survival_mean=surv_mean,
        survival_std=surv_std,
    )
    dims = config.freeze_dims(
        *arrays.dims[:3],
        condition_names=condition_features,
        survival_mean=surv_mean,
        survival_std=surv_std,
    )
    return arrays, dims


def train_val_split(
    n_samples: int, val_split: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded random split (reference train.py:412-420)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_samples)
    val_size = int(n_samples * val_split)
    return perm[val_size:], perm[:val_size]


def mixup(
    rng: jax.Array,
    data: jnp.ndarray,
    conditions: jnp.ndarray,
    survival: jnp.ndarray,
    alpha: float,
):
    """Mixup augmentation as a jit-compatible transform.

    lambda ~ Beta(alpha, alpha) shared across the batch, convex combo
    with a random permutation (reference train.py:85-126).
    """
    lam_rng, perm_rng = jax.random.split(rng)
    lam = jax.random.beta(lam_rng, alpha, alpha)
    idx = jax.random.permutation(perm_rng, data.shape[0])
    mixed_data = lam * data + (1 - lam) * data[idx]
    mixed_cond = lam * conditions + (1 - lam) * conditions[idx]
    mixed_surv = lam * survival + (1 - lam) * survival[idx]
    return mixed_data, mixed_cond, mixed_surv


def make_dummy_data(
    processed_dir: str | Path,
    n_samples: int = 100,
    n_mutation_genes: int = 50,
    n_expression_genes: int = 100,
    n_pathways: int = 30,
    seed: int = 0,
    use_hallmark_names: bool = True,
    structured: bool = True,
) -> None:
    """Write the QUICKSTART-style dummy fixture (QUICKSTART.md:206-248)
    as first-class library code, used by tests and quick pipelines.

    With `use_hallmark_names` the expression columns include real
    pathway member genes so pathway scoring and validation rules are
    exercised end to end. With `structured` (default), the cohort has
    learnable biology rather than uniform noise: per-gene mutation
    frequencies vary, latent factors induce mutation co-occurrence,
    TP53/MDM2 are near-exclusive, and TP53/MYC drive their configured
    pathways in the expected directions — so a trained generator can
    actually score on the validation suite. `structured=False` gives
    the reference QUICKSTART's uniform-random tables.
    """
    rng = np.random.default_rng(seed)
    processed = Path(processed_dir)
    processed.mkdir(parents=True, exist_ok=True)
    ids = [f"P{i:04d}" for i in range(n_samples)]

    # Mutation genes: include the configured drivers + exclusive pairs.
    drivers = ["TP53", "RB1", "ATRX", "DLG2", "PTEN", "MDM2", "MYC"]
    mut_genes = drivers + [f"MUT{i}" for i in range(n_mutation_genes - len(drivers))]
    mut_genes = mut_genes[:n_mutation_genes]

    if structured:
        freqs = rng.beta(1.2, 3.0, size=len(mut_genes)).clip(0.05, 0.9)
        # Latent factors induce co-occurrence among gene groups.
        n_factors = max(2, len(mut_genes) // 8)
        factor_load = rng.random((len(mut_genes), n_factors)) < 0.25
        factors = rng.random((n_samples, n_factors)) < 0.5
        bump = (factors @ factor_load.T).astype(bool)
        base = rng.random((n_samples, len(mut_genes))) < freqs[None, :]
        mut_values = (base | (bump & (rng.random((n_samples, len(mut_genes))) < 0.5)))
        mut_values = mut_values.astype(np.float32)
        gi = {g: k for k, g in enumerate(mut_genes)}
        # TP53 common driver; MDM2 rare and near-exclusive with TP53.
        # Tiny fixtures may truncate the driver list — guard each gene.
        if "TP53" in gi:
            mut_values[:, gi["TP53"]] = (
                rng.random(n_samples) < 0.6
            ).astype(np.float32)
            if "MDM2" in gi:
                mdm2 = (rng.random(n_samples) < 0.15) & (
                    mut_values[:, gi["TP53"]] < 0.5
                )
                mut_values[:, gi["MDM2"]] = mdm2.astype(np.float32)
        if "MYC" in gi:
            mut_values[:, gi["MYC"]] = (
                rng.random(n_samples) < 0.35
            ).astype(np.float32)
    else:
        mut_values = rng.integers(
            0, 2, size=(n_samples, len(mut_genes))
        ).astype(np.float32)

    mut = pd.DataFrame(mut_values, index=ids, columns=mut_genes)
    mut.to_csv(processed / "mutation_matrix_aligned.csv")

    if use_hallmark_names:
        from .pathways import HALLMARK_GENE_SETS

        expr_genes: List[str] = []
        for genes in HALLMARK_GENE_SETS.values():
            for g in genes:
                if g not in expr_genes:
                    expr_genes.append(g)
                if len(expr_genes) >= n_expression_genes:
                    break
            if len(expr_genes) >= n_expression_genes:
                break
        while len(expr_genes) < n_expression_genes:
            expr_genes.append(f"EXPR{len(expr_genes)}")
    else:
        expr_genes = [f"EXPR{i}" for i in range(n_expression_genes)]

    expr_values = rng.normal(size=(n_samples, n_expression_genes)).astype(
        np.float32
    )
    if structured and use_hallmark_names:
        # Within-pathway co-expression: genes sharing a hallmark set get
        # a common per-sample factor; driver mutations shift their
        # pathway's member genes in the configured direction
        # (TP53 -> p53 pathway DOWN, MYC -> MYC targets UP).
        from .pathways import HALLMARK_GENE_SETS

        col_index = {g: k for k, g in enumerate(expr_genes)}
        gi = {g: k for k, g in enumerate(mut_genes)}
        for pathway, genes in HALLMARK_GENE_SETS.items():
            member_cols = [col_index[g] for g in genes if g in col_index]
            if not member_cols:
                continue
            factor = rng.normal(size=(n_samples, 1)).astype(np.float32)
            expr_values[:, member_cols] += 0.8 * factor
            if pathway == "HALLMARK_P53_PATHWAY" and "TP53" in gi:
                expr_values[:, member_cols] -= 1.2 * mut_values[:, [gi["TP53"]]]
            if pathway == "HALLMARK_MYC_TARGETS_V1" and "MYC" in gi:
                expr_values[:, member_cols] += 1.2 * mut_values[:, [gi["MYC"]]]
    expr = pd.DataFrame(expr_values, index=ids, columns=expr_genes)
    expr.to_csv(processed / "expression_matrix_aligned.csv")

    path_names = [f"PATHWAY_{i}" for i in range(n_pathways)]
    if use_hallmark_names:
        from .pathways import HALLMARK_GENE_SETS

        hallmark_names = list(HALLMARK_GENE_SETS.keys())
        path_names = (hallmark_names + path_names)[:n_pathways]
    path_values = rng.normal(size=(n_samples, n_pathways)).astype(np.float32)
    if structured and use_hallmark_names:
        # Pathway scores consistent with the planted expression effects.
        from .pathways import PathwayFeatures

        eng = PathwayFeatures()
        derived = eng.compute_pathway_scores_from_expression(expr)
        for j, name in enumerate(path_names):
            if name in derived.columns:
                path_values[:, j] = derived[name].values.astype(np.float32)
    path = pd.DataFrame(path_values, index=ids, columns=path_names)
    path.to_csv(processed / "pathway_scores.csv")

    clin = pd.DataFrame(
        {
            "submitter_id": ids,
            "survival_days": rng.integers(100, 2000, n_samples),
            "event_occurred": rng.integers(0, 2, n_samples),
            "age_years": rng.uniform(10, 18, n_samples),
            "metastasis_at_diagnosis": rng.integers(0, 2, n_samples),
            "gender_bin": rng.integers(0, 2, n_samples),
        }
    )
    clin.to_csv(processed / "clinical_aligned.csv", index=False)
