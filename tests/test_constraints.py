"""Biological constraint losses — real implementations, verified
against brute-force numpy computations.

The reference stubs these to 0.0 (reference models/cvae.py:262-302);
here they must be exact and differentiable.
"""

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.models.constraints import (
    ConstraintSpec,
    constraint_losses,
    mutation_expression_correlation_loss,
    mutual_exclusivity_loss,
    pathway_coherence_loss,
)


def brute_force_coherence(expr, mask):
    """Mean (1 - mean pairwise within-pathway correlation) via np.corrcoef."""
    losses = []
    for p in range(mask.shape[1]):
        genes = np.where(mask[:, p] > 0)[0]
        corr = np.corrcoef(expr[:, genes].T)
        iu = np.triu_indices(len(genes), k=1)
        losses.append(1.0 - corr[iu].mean())
    return float(np.mean(losses))


def test_pathway_coherence_matches_bruteforce(rng):
    B, G, P = 32, 20, 3
    expr = rng.normal(size=(B, G)).astype(np.float32)
    mask = np.zeros((G, P), np.float32)
    mask[0:5, 0] = 1
    mask[5:12, 1] = 1
    mask[10:20, 2] = 1
    ours = float(pathway_coherence_loss(jnp.asarray(expr), mask))
    expected = brute_force_coherence(expr, mask)
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-3)


def test_pathway_coherence_perfectly_coherent_is_zero(rng):
    # All member genes identical => pairwise corr 1 => loss 0.
    B, G = 16, 8
    base = rng.normal(size=(B, 1)).astype(np.float32)
    expr = np.tile(base, (1, G))
    mask = np.ones((G, 1), np.float32)
    loss = float(pathway_coherence_loss(jnp.asarray(expr), mask))
    np.testing.assert_allclose(loss, 0.0, atol=1e-3)


def test_mutation_expression_rule_direction(rng):
    B = 64
    mut = rng.integers(0, 2, size=(B, 4)).astype(np.float32)
    # Pathway 0 strongly anti-correlated with mutation 0.
    path = rng.normal(size=(B, 2)).astype(np.float32)
    path[:, 0] = -2.0 * mut[:, 0] + 0.01 * rng.normal(size=B)
    # Rule: mutation 0 -> pathway 0 negative (satisfied => ~0 loss).
    loss_ok = float(
        mutation_expression_correlation_loss(
            jnp.asarray(mut), jnp.asarray(path),
            np.array([0], np.int32), np.array([0], np.int32),
            np.array([-1.0], np.float32),
        )
    )
    assert loss_ok < 1e-3
    # Opposite expectation (positive) should be strongly violated.
    loss_bad = float(
        mutation_expression_correlation_loss(
            jnp.asarray(mut), jnp.asarray(path),
            np.array([0], np.int32), np.array([0], np.int32),
            np.array([1.0], np.float32),
        )
    )
    assert loss_bad > 0.5


def test_mutual_exclusivity(rng):
    B = 32
    mut = np.zeros((B, 3), np.float32)
    mut[:, 0] = 1.0
    mut[:, 1] = 1.0  # always co-occurring => max violation
    pairs = np.array([[0, 1]], np.int32)
    loss = float(mutual_exclusivity_loss(jnp.asarray(mut), pairs))
    np.testing.assert_allclose(loss, 1.0, atol=1e-6)
    # Exclusive pattern => zero.
    mut[:, 1] = 0.0
    loss0 = float(mutual_exclusivity_loss(jnp.asarray(mut), pairs))
    np.testing.assert_allclose(loss0, 0.0, atol=1e-6)


def test_spec_build_and_full_losses(rng):
    mutation_genes = ["TP53", "MDM2", "RB1"]
    expression_genes = [f"G{i}" for i in range(10)]
    pathway_names = ["HALLMARK_P53_PATHWAY", "OTHER"]
    gene_sets = {"PATH_A": ["G0", "G1", "G2", "G3"], "PATH_B": ["G8", "G9"]}

    class Rule:
        def __init__(self, m, p, d):
            self.mutation, self.pathway, self.direction = m, p, d

    spec = ConstraintSpec.build(
        mutation_genes,
        expression_genes,
        pathway_names,
        gene_sets=gene_sets,
        exclusive_gene_pairs=[["TP53", "MDM2"], ["TP53", "NOTPRESENT"]],
        correlation_rules=[Rule("TP53", "HALLMARK_P53_PATHWAY", "negative")],
        min_genes_per_pathway=3,
    )
    assert spec.pathway_mask.shape == (10, 1)  # PATH_B dropped (<3 genes)
    assert spec.exclusive_pairs.shape == (1, 2)
    assert spec.rule_sign.tolist() == [-1.0]

    x = rng.normal(size=(16, 3 + 10 + 2)).astype(np.float32)
    terms = constraint_losses(jnp.asarray(x), spec)
    for v in terms.values():
        assert np.isfinite(float(v))

    # Differentiability.
    grad = jax.grad(
        lambda xx: sum(constraint_losses(xx, spec).values())
    )(jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_empty_spec_gives_zero_losses(rng):
    spec = ConstraintSpec(mutation_dim=3, expression_dim=5, pathway_dim=2)
    x = rng.normal(size=(8, 10)).astype(np.float32)
    terms = constraint_losses(jnp.asarray(x), spec)
    assert all(float(v) == 0.0 for v in terms.values())


def test_cooccurrence_matching_loss(rng):
    from osteosarcoma_diffusionmodel_tpu.models.constraints import (
        cooccurrence_matching_loss,
    )

    # Target: two strongly correlated genes.
    n = 200
    f = (rng.random(n) < 0.5).astype(np.float32)
    data = np.stack([f, f, (rng.random(n) < 0.5).astype(np.float32)], axis=1)
    std = data.std(0)
    z = (data - data.mean(0)) / std
    target = (z.T @ z / n).astype(np.float32)

    # Batch with the same structure: near-zero loss.
    loss_same = float(cooccurrence_matching_loss(jnp.asarray(data), target))
    assert loss_same < 0.05
    # Independent batch: positive loss (target corr 1 unmatched).
    indep = rng.random((n, 3)).astype(np.float32)
    loss_diff = float(cooccurrence_matching_loss(jnp.asarray(indep), target))
    assert loss_diff > 0.2
    # Empty target disables.
    assert float(cooccurrence_matching_loss(
        jnp.asarray(indep), np.zeros((0, 0), np.float32))) == 0.0


def test_spec_build_with_mutation_data(rng):
    data = (rng.random((50, 3)) < 0.4).astype(np.float32)
    spec = ConstraintSpec.build(
        ["A", "B", "C"], ["G0"], ["P0"], mutation_data=data
    )
    assert spec.mutation_corr_target.shape == (3, 3)
    np.testing.assert_allclose(np.diag(spec.mutation_corr_target), 1.0,
                               atol=1e-5)
