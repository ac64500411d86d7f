"""Pathway feature engineering: matmul-based scores vs loop semantics.

Parity targets: reference utils/pathway_features.py:168-284.
"""

import numpy as np
import pandas as pd

from osteosarcoma_diffusionmodel_tpu.data.pathways import (
    HALLMARK_GENE_SETS,
    PathwayFeatures,
)


def test_gene_sets_shape():
    assert len(HALLMARK_GENE_SETS) == 29
    for name, genes in HALLMARK_GENE_SETS.items():
        assert name.startswith("HALLMARK_")
        assert len(genes) >= 11


def test_expression_scores_equal_loop(rng):
    eng = PathwayFeatures()
    eng.load_gene_sets()
    # Expression over a subset of pathway genes plus noise genes.
    genes = HALLMARK_GENE_SETS["HALLMARK_P53_PATHWAY"] + [
        "NOISE1", "NOISE2", "NOISE3",
    ] + HALLMARK_GENE_SETS["HALLMARK_APOPTOSIS"]
    genes = list(dict.fromkeys(genes))
    expr = pd.DataFrame(
        rng.normal(size=(12, len(genes))).astype(np.float32),
        columns=genes,
        index=[f"S{i}" for i in range(12)],
    )
    scores = eng.compute_pathway_scores_from_expression(expr)
    # Loop-based recomputation (reference semantics).
    for pathway in scores.columns:
        members = [g for g in HALLMARK_GENE_SETS[pathway] if g in expr.columns]
        assert len(members) >= 5
        expected = expr[members].astype(np.float64).mean(axis=1)
        # rtol sits above f32 summation-reassociation noise (the masked
        # matmul and pandas' pairwise mean order ~200-member sums
        # differently, and XLA:CPU partitioning can shift with thread
        # availability — observed as a 1-in-many-runs flake at 1e-5)
        # but far below any semantic error (wrong membership or
        # normalization changes values at the 1e-2+ level).
        np.testing.assert_allclose(
            scores[pathway].values, expected.values, rtol=1e-4
        )
    # Pathways with <5 present genes are dropped.
    assert "HALLMARK_GLYCOLYSIS" not in scores.columns


def test_mutation_scores_fraction(rng):
    eng = PathwayFeatures()
    eng.load_gene_sets()
    genes = HALLMARK_GENE_SETS["HALLMARK_DNA_REPAIR"]
    mut = pd.DataFrame(
        rng.integers(0, 2, size=(10, len(genes))).astype(np.float32),
        columns=genes,
    )
    scores = eng.compute_pathway_scores_from_mutations(mut)
    assert "HALLMARK_DNA_REPAIR" in scores.columns
    expected = mut[genes].sum(axis=1) / len(genes)
    np.testing.assert_allclose(
        scores["HALLMARK_DNA_REPAIR"].values, expected.values, rtol=1e-5
    )


def test_gene_pathway_matrix():
    eng = PathwayFeatures()
    matrix = eng.create_gene_pathway_matrix()
    assert matrix.shape[1] == 29
    assert set(matrix.values.ravel()) <= {0, 1}
    # TP53 belongs to the p53 pathway.
    assert matrix.loc["TP53", "HALLMARK_P53_PATHWAY"] == 1
    # Index sorted and unique.
    assert list(matrix.index) == sorted(set(matrix.index))
