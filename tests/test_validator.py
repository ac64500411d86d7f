"""BiologicalValidator semantics on crafted cohorts.

Parity targets: reference utils/validation.py:27-387.
"""

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.validation.validator import BiologicalValidator


@pytest.fixture()
def validator():
    return BiologicalValidator(Config(), seed=0)


def make_mutations(rng, n, genes, freqs):
    data = (rng.random((n, len(genes))) < np.asarray(freqs)).astype(float)
    return pd.DataFrame(data, columns=genes)


def test_identical_cohorts_score_high(validator, rng):
    genes = ["TP53", "RB1", "MDM2", "G1", "G2", "G3"]
    freqs = [0.6, 0.4, 0.1, 0.3, 0.2, 0.5]
    real = make_mutations(rng, 200, genes, freqs)
    synth = make_mutations(rng, 200, genes, freqs)
    res = validator.validate_mutation_cooccurrence(real, synth)
    assert res["mutation_frequency_correlation"] > 0.9
    assert res["driver_gene_frequency_diff"] < 0.1
    assert "mutual_exclusivity_violation_rate" in res


def test_exclusivity_violations_counted(validator):
    genes = ["TP53", "MDM2"]
    real = pd.DataFrame(np.zeros((10, 2)), columns=genes)
    real.iloc[:5, 0] = 1  # TP53-only in real
    synth = pd.DataFrame(np.ones((10, 2)), columns=genes)  # all co-mutated
    res = validator.validate_mutation_cooccurrence(real, synth)
    assert res["mutual_exclusivity_violation_rate"] == 1.0


def test_mutation_expression_rules(validator, rng):
    n = 300
    mut = pd.DataFrame({"TP53": rng.integers(0, 2, n).astype(float),
                        "MYC": rng.integers(0, 2, n).astype(float)})
    path = pd.DataFrame({
        # TP53 mutated -> p53 pathway DOWN (satisfies negative rule).
        "HALLMARK_P53_PATHWAY": -mut["TP53"] + 0.1 * rng.normal(size=n),
        # MYC mutated -> MYC targets UP (satisfies positive rule).
        "HALLMARK_MYC_TARGETS_V1": mut["MYC"] + 0.1 * rng.normal(size=n),
    })
    res = validator.validate_mutation_expression_correlation(mut, None, path)
    assert res["mutation_expression_violation_rate"] == 0.0

    # Flip one relationship -> 50% violation.
    path2 = path.copy()
    path2["HALLMARK_P53_PATHWAY"] = -path["HALLMARK_P53_PATHWAY"]
    res2 = validator.validate_mutation_expression_correlation(mut, None, path2)
    assert res2["mutation_expression_violation_rate"] == 0.5


def test_pathway_coherence_detects_structure(validator, rng):
    n, g = 100, 12
    cols = [f"G{i}" for i in range(g)]
    # Real: first 4 genes strongly co-vary (pathway P0), rest independent.
    base = rng.normal(size=(n, 1))
    real = rng.normal(size=(n, g)) * 0.2
    real[:, :4] += base
    real_df = pd.DataFrame(real, columns=cols)
    # Synthetic: same structure.
    base2 = rng.normal(size=(n, 1))
    synth = rng.normal(size=(n, g)) * 0.2
    synth[:, :4] += base2
    synth_df = pd.DataFrame(synth, columns=cols)

    gpm = pd.DataFrame(0, index=cols, columns=["P0", "P1"])
    gpm.loc[cols[:4], "P0"] = 1
    gpm.loc[cols[4:8], "P1"] = 1

    res = validator.validate_pathway_coherence(real_df, synth_df, gpm)
    assert res["real_pathway_coherence"] > 0.3
    assert res["synthetic_pathway_coherence"] > 0.3


def test_statistical_tests_shapes(validator, rng):
    real = rng.normal(size=(80, 150)).astype(np.float32)
    synth = rng.normal(size=(120, 150)).astype(np.float32)
    res = validator.statistical_tests(real, synth)
    assert 0 <= res["ks_test_mean_pvalue"] <= 1
    assert 0 <= res["ks_test_fraction_significant"] <= 1
    assert res["mmd"] >= 0
    assert res["wasserstein_distance_mean"] >= 0
    # Same distribution: few significant KS tests, small MMD.
    assert res["ks_test_fraction_significant"] < 0.3
    assert res["mmd"] < 0.5


def test_statistical_tests_detect_shift(validator, rng):
    real = rng.normal(size=(100, 50)).astype(np.float32)
    shifted = rng.normal(loc=3.0, size=(100, 50)).astype(np.float32)
    res = validator.statistical_tests(real, shifted)
    assert res["ks_test_fraction_significant"] > 0.9
    assert res["mmd"] > 0.1


def make_structured_mutations(rng, n, genes):
    """Mutations with shared co-occurrence structure: pairs of genes
    driven by common latent factors (so chi-square patterns correlate
    between independently drawn cohorts)."""
    factors = rng.random((n, len(genes) // 2)) < 0.4
    cols = []
    for k in range(len(genes)):
        f = factors[:, k // 2]
        flips = rng.random(n) < 0.15
        cols.append(np.logical_xor(f, flips).astype(float))
    return pd.DataFrame(np.stack(cols, axis=1), columns=genes)


def test_overall_score_aggregation(validator, rng):
    genes = ["TP53", "MDM2", "RB1", "A", "B", "C", "D", "E"]
    real_mut = make_structured_mutations(rng, 200, genes)
    synth_mut = make_structured_mutations(rng, 200, genes)
    expr_cols = [f"G{i}" for i in range(20)]
    real_expr = pd.DataFrame(rng.normal(size=(200, 20)), columns=expr_cols)
    synth_expr = pd.DataFrame(rng.normal(size=(200, 20)), columns=expr_cols)
    path_cols = ["HALLMARK_P53_PATHWAY", "HALLMARK_MYC_TARGETS_V1", "P3"]
    real_path = pd.DataFrame(rng.normal(size=(200, 3)), columns=path_cols)
    synth_path = pd.DataFrame(rng.normal(size=(200, 3)), columns=path_cols)

    res = validator.validate_all(
        real_mut, real_expr, real_path, synth_mut, synth_expr, synth_path
    )
    assert "overall_biological_score" in res
    # Overall = mean of the 4 normalized components
    # (reference validation.py:368-385).
    expected = np.mean([
        res["mutation_frequency_correlation"],
        res["cooccurrence_pattern_correlation"],
        1 - res["mutual_exclusivity_violation_rate"],
        1 - res["mutation_expression_violation_rate"],
    ])
    np.testing.assert_allclose(res["overall_biological_score"], expected,
                               rtol=1e-6)
    # Shared latent-factor structure must be detected in co-occurrence.
    assert res["cooccurrence_pattern_correlation"] > 0.5


def test_chi2_sampling_is_seeded(rng):
    cfg = Config()
    genes = [f"G{i}" for i in range(60)]
    real = pd.DataFrame(rng.integers(0, 2, (100, 60)).astype(float),
                        columns=genes)
    synth = pd.DataFrame(rng.integers(0, 2, (100, 60)).astype(float),
                         columns=genes)
    r1 = BiologicalValidator(cfg, seed=3).validate_mutation_cooccurrence(real, synth)
    r2 = BiologicalValidator(cfg, seed=3).validate_mutation_cooccurrence(real, synth)
    assert (r1["cooccurrence_pattern_correlation"]
            == r2["cooccurrence_pattern_correlation"])


def test_size_matched_ks_restores_nominal_alpha(validator, rng):
    """Round-2 VERDICT weak #4: at n_real << n_synth the raw KS
    fraction reads ~0.6 on healthy cohorts. The size-matched variant
    compares n_real-sized subsamples and should sit near alpha for
    same-distribution data (and well below the raw fraction when the
    synthetic cohort has an epsilon-level marginal offset)."""
    n_real, n_synth, d = 100, 4000, 40
    real = rng.normal(size=(n_real, d)).astype(np.float32)
    # Epsilon marginal offset: enough for the 100-vs-4000 test to
    # flag many features, invisible at matched size.
    synth = rng.normal(size=(n_synth, d)).astype(np.float32) + 0.08
    res = validator.statistical_tests(real, synth)
    assert "ks_matched_fraction_significant" in res
    assert "ks_matched_mean_pvalue" in res
    assert 0.0 <= res["ks_matched_fraction_significant"] <= 1.0
    assert (res["ks_matched_fraction_significant"]
            <= res["ks_test_fraction_significant"] + 0.05)
    assert res["ks_matched_fraction_significant"] < 0.3


def test_size_matched_ks_skipped_when_not_larger(validator, rng):
    real = rng.normal(size=(50, 10)).astype(np.float32)
    synth = rng.normal(size=(50, 10)).astype(np.float32)
    res = validator.statistical_tests(real, synth)
    assert "ks_matched_fraction_significant" not in res


def test_novelty_flags_memorization(validator, rng):
    """A resampler (synthetic = copies of real rows) must be flagged;
    fresh same-distribution draws must not."""
    real = rng.normal(size=(60, 30)).astype(np.float32)
    copies = real[rng.integers(0, 60, size=200)]
    res = validator.novelty_metrics(real, copies)
    assert res["exact_duplicate_rate"] > 0.99
    assert res["duplicate_rate"] > 0.99
    assert res["nn_distance_ratio"] < 0.01
    assert res["nn_loo_ratio_median"] < 0.01
    assert res["nn_loo_ratio_q05"] < 0.01

    fresh = rng.normal(size=(200, 30)).astype(np.float32)
    res2 = validator.novelty_metrics(real, fresh)
    assert res2["exact_duplicate_rate"] == 0.0
    assert res2["duplicate_rate"] < 0.05
    assert 0.8 < res2["nn_distance_ratio"] < 1.6
    # In-distribution draws' ratio quantiles sit near the split-half
    # floors — nowhere near the resampler's ~0.
    assert res2["nn_loo_ratio_median"] > 0.6 * res2[
        "nn_loo_ratio_median_floor"]
    assert res2["nn_loo_ratio_q05"] > 0.4 * res2["nn_loo_ratio_q05_floor"]


def test_exact_duplicates_found_at_high_dim(validator, rng):
    """Bit-identical rows at D~5k: the f32 matmul distance identity's
    cancellation error (~0.03 absolute) is far above the 1e-6*scale
    threshold, so the pre-fix detector missed ~36% of true re-renders
    (round-3 ADVICE, medium). The row-hash path must find them all."""
    d = 5142
    real = rng.normal(size=(50, d)).astype(np.float32)
    copies = real[rng.integers(0, 50, size=120)]
    res = validator.novelty_metrics(real, copies)
    assert res["exact_duplicate_rate"] == 1.0

    # Mixed cohort: half exact re-renders, half fresh — the rate must
    # read exactly the planted fraction, and q05 must crush while the
    # median alone would hide the subpopulation less clearly.
    fresh = rng.normal(size=(120, d)).astype(np.float32)
    mixed = np.concatenate([copies[:60], fresh[:60]])
    res2 = validator.novelty_metrics(real, mixed)
    assert abs(res2["exact_duplicate_rate"] - 0.5) < 1e-9
    assert res2["nn_loo_ratio_q05"] < 0.01


def test_full_validator_positive_control(validator, rng, tmp_path):
    """VERDICT round-3 item 5: a deliberately-memorizing generator
    (bootstrap resampler + tiny noise) pushed through the FULL
    validator must be flagged by the novelty suite while an honest
    in-distribution generator passes — proving the suite can actually
    catch what the distributional metrics (which score the resampler
    perfectly) cannot."""
    from osteosarcoma_diffusionmodel_tpu.analysis.report import (
        write_summary_report,
    )

    genes = ["TP53", "RB1", "MDM2", "G1", "G2", "G3"]
    freqs = [0.6, 0.4, 0.1, 0.3, 0.2, 0.5]
    n_real, n_synth = 60, 150
    real_mut = make_mutations(rng, n_real, genes, freqs)
    cols_e = [f"E{i}" for i in range(12)]
    cols_p = [f"P{i}" for i in range(4)]
    real_expr = pd.DataFrame(rng.normal(size=(n_real, 12)), columns=cols_e)
    real_path = pd.DataFrame(rng.normal(size=(n_real, 4)), columns=cols_p)

    # Memorizer: bootstrap-resample real rows + tiny jitter on the
    # continuous block (the bits stay exact copies).
    idx = rng.integers(0, n_real, size=n_synth)
    mem_mut = real_mut.iloc[idx].reset_index(drop=True)
    jitter = 1e-4
    mem_expr = pd.DataFrame(
        real_expr.values[idx] + jitter * rng.normal(size=(n_synth, 12)),
        columns=cols_e,
    )
    mem_path = pd.DataFrame(
        real_path.values[idx] + jitter * rng.normal(size=(n_synth, 4)),
        columns=cols_p,
    )
    res_mem = validator.validate_all(
        real_mut, real_expr, real_path, mem_mut, mem_expr, mem_path
    )
    # The distributional score CANNOT catch it...
    assert res_mem["mutation_frequency_correlation"] > 0.9
    # ...the novelty suite must.
    assert res_mem["duplicate_rate"] > 0.9
    assert res_mem["nn_distance_ratio"] < 0.2
    assert res_mem["nn_loo_ratio_q05"] < 0.25 * res_mem[
        "nn_loo_ratio_q05_floor"]

    # Honest generator: fresh draws from the same distribution.
    hon_mut = make_mutations(rng, n_synth, genes, freqs)
    hon_expr = pd.DataFrame(rng.normal(size=(n_synth, 12)), columns=cols_e)
    hon_path = pd.DataFrame(rng.normal(size=(n_synth, 4)), columns=cols_p)
    res_hon = validator.validate_all(
        real_mut, real_expr, real_path, hon_mut, hon_expr, hon_path
    )
    assert res_hon["duplicate_rate"] < 0.05
    assert res_hon["nn_distance_ratio"] > 0.5
    assert res_hon["nn_loo_ratio_q05"] > 0.4 * res_hon[
        "nn_loo_ratio_q05_floor"]

    # And the report verdict must read the same way.
    rep_mem = write_summary_report(res_mem, tmp_path / "mem.txt")
    rep_hon = write_summary_report(res_hon, tmp_path / "hon.txt")
    assert "MEMORIZATION SUSPECTED" in rep_mem
    assert "NOVEL" in rep_hon


def test_novelty_in_validate_all(validator, rng):
    genes = ["TP53", "RB1", "MDM2", "G1", "G2", "G3"]
    freqs = [0.6, 0.4, 0.1, 0.3, 0.2, 0.5]
    real_mut = make_mutations(rng, 50, genes, freqs)
    synth_mut = make_mutations(rng, 80, genes, freqs)
    cols_e = [f"E{i}" for i in range(8)]
    cols_p = [f"P{i}" for i in range(4)]
    real_expr = pd.DataFrame(rng.normal(size=(50, 8)), columns=cols_e)
    synth_expr = pd.DataFrame(rng.normal(size=(80, 8)), columns=cols_e)
    real_path = pd.DataFrame(rng.normal(size=(50, 4)), columns=cols_p)
    synth_path = pd.DataFrame(rng.normal(size=(80, 4)), columns=cols_p)
    res = validator.validate_all(
        real_mut, real_expr, real_path, synth_mut, synth_expr, synth_path
    )
    assert "nn_distance_ratio" in res
    assert "nn_loo_ratio_median" in res
    assert "nn_loo_ratio_q05" in res
    # Novelty metrics are diagnostics, not score components.
    expected = np.mean([
        res["mutation_frequency_correlation"],
        res["cooccurrence_pattern_correlation"],
        1 - res["mutual_exclusivity_violation_rate"],
    ])
    np.testing.assert_allclose(
        res["overall_biological_score"], expected, rtol=1e-6
    )


def test_ratio_floors(validator, rng):
    """The split-half floors contextualize the ratio quantiles: an
    in-distribution sampler's stats sit near the floors, a resampler's
    far below them. The floors themselves must be non-degenerate
    (an in-distribution half-cohort is NOT flagged)."""
    real = rng.normal(size=(80, 20)).astype(np.float32)
    fresh = rng.normal(size=(100, 20)).astype(np.float32)
    res = validator.novelty_metrics(real, fresh)
    assert 0.3 < res["nn_loo_ratio_median_floor"] < 2.0
    assert 0.2 < res["nn_loo_ratio_q05_floor"] < 2.0
    assert res["nn_loo_ratio_median"] > 0.6 * res[
        "nn_loo_ratio_median_floor"]

    copies = real[rng.integers(0, 80, size=100)]
    res2 = validator.novelty_metrics(real, copies)
    assert res2["nn_loo_ratio_median"] < 0.05 * res2[
        "nn_loo_ratio_median_floor"]
