"""Sample-path fine-tuning: differentiate through a short DDIM chain.

The base diffusion objective is a per-(sample, timestep) regression —
it never sees its own *samples*, so cohort-level statistics the data
can't identify per-dim (pairwise mutation co-occurrence above all;
ROADMAP §2) are not directly optimized. This pass fine-tunes a trained
denoiser by generating a batch through a short differentiable DDIM
chain (`ConditionalDiffusion.sample_ddim` is a `lax.scan` of denoiser
calls — reverse-mode differentiable end to end) and descending the
co-occurrence matching loss on the *generated cohort*, anchored by the
original diffusion loss on real data so marginals don't drift.

Mutations are soft-binarized with a tempered sigmoid around the 0.5
generation threshold (reference utils/generate.py:135) so the batch
correlation matrix stays differentiable; as tau -> 0 it approaches the
hard-thresholded statistic the validator measures.

Not applicable to the discrete (D3PM) mutation head — its reverse chain
draws hard Bernoulli bits, which have no pathwise gradient.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.constraints import (
    cooccurrence_matching_loss,
    mutation_corr_matrix as mutation_corr_target,
)

logger = logging.getLogger(__name__)


def sample_path_finetune(
    model,
    params,
    x0_data: jnp.ndarray,
    conditions: jnp.ndarray,
    rng: jax.Array,
    *,
    steps: int = 200,
    ddim_steps: int = 8,
    sample_batch: int = 256,
    learning_rate: float = 1e-5,
    soft_tau: float = 0.1,
    cooccurrence_weight: float = 1.0,
    anchor_weight: float = 1.0,
) -> Tuple[object, Dict[str, List[float]]]:
    """Fine-tune `params` so sampled cohorts match the training
    cohort's mutation co-occurrence structure.

    x0_data: (N, D) the real training matrix (mutation block first);
    conditions: (N, C) matching condition rows — the sampling batch
    draws condition vectors from these rows so the generated cohort
    covers the conditioning distribution seen in training.
    Returns (new_params, history).
    """
    if getattr(model, "discrete_head", False):
        raise ValueError(
            "sample-path fine-tuning requires the continuous mutation "
            "path (discrete D3PM bit draws have no pathwise gradient)"
        )
    # from_config always stamps mutation_dim; a spec-carrying model
    # built by hand can fall back to its constraint layout.
    M = model.mutation_dim or (
        model.constraint_spec.mutation_dim if model.constraint_spec else 0
    )
    if not M:
        raise ValueError("model.mutation_dim must be set for fine-tuning")

    target = jnp.asarray(
        mutation_corr_target(np.asarray(x0_data[:, :M], np.float32))
    )
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    n = x0_data.shape[0]

    def ft_loss(params, key):
        k_cond, k_z, k_anchor = jax.random.split(key, 3)
        rows = jax.random.randint(k_cond, (sample_batch,), 0, n)
        cond_batch = conditions[rows]
        x = model.sample_ddim(
            params, cond_batch, k_z, num_sampling_steps=ddim_steps
        )
        soft_bits = jax.nn.sigmoid((x[:, :M] - 0.5) / soft_tau)
        cooc = cooccurrence_matching_loss(soft_bits, target)
        anchor, _ = model.loss(params, x0_data, conditions, k_anchor, True)
        total = cooccurrence_weight * cooc + anchor_weight * anchor
        return total, {"cooccurrence": cooc, "anchor": anchor}

    @jax.jit
    def step(params, opt_state, key):
        (loss, metrics), grads = jax.value_and_grad(ft_loss, has_aux=True)(
            params, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    history: Dict[str, List[float]] = {"loss": [], "cooccurrence": [], "anchor": []}
    for i in range(steps):
        params, opt_state, loss, metrics = step(
            params, opt_state, jax.random.fold_in(rng, i)
        )
        if i % 25 == 0 or i == steps - 1:
            lv = float(loss)
            cv = float(metrics["cooccurrence"])
            av = float(metrics["anchor"])
            history["loss"].append(lv)
            history["cooccurrence"].append(cv)
            history["anchor"].append(av)
            logger.info(
                "Sample-path finetune %d/%d  loss %.4f  cooc %.4f  anchor %.4f",
                i + 1, steps, lv, cv, av,
            )
    return params, history
