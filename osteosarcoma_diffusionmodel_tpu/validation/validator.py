"""Biological validation of synthetic cohorts.

Capability parity with reference utils/validation.py:18-387, with the
numeric hot spots on device:

- mutation frequency correlation (validation.py:43-54)
- driver-gene frequency diff (:58-66)
- mutual-exclusivity violation rate (:69-87)
- pairwise chi-square co-occurrence correlation over <=50 sampled genes
  (:89-121) — the reference's O(50^2/2) pandas crosstab loop becomes
  one vectorized `chi2_binary_pairs` call
- within-pathway coherence over the first 10 pathways (:125-175) via
  the masked-matmul group-correlation identity
- directional mutation<->pathway rules (:177-223)
- per-feature KS (<=100 features), RBF MMD, Wasserstein on 10 PCs
  (:225-298)
- overall score = mean of 4 normalized components (:365-385)

Deliberate fixes vs the reference (documented divergences):
- gene sampling for the chi-square test is seeded (the reference uses
  the global numpy RNG, validation.py:94)
- `validate_all` accepts and uses the pathway_gene_matrix when given;
  the reference's CLI never passes it so coherence silently skips
  (reference main.py:322-329, SURVEY §3.3)
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import Config
from ..ops.stats import (
    chi2_binary_pairs,
    ks_test_features,
    mean_pairwise_corr_within_groups,
    mmd_rbf,
    pca_project,
    pearson_corr,
    wasserstein_columns,
)

logger = logging.getLogger(__name__)


@jax.jit
def _freq_stats(real, synth, didx):
    """Frequency correlation + driver-gene diff, one compiled program
    (the tunneled backend pays ~0.1 s dispatch latency per un-jitted
    op; batching per-metric op chains is the validate-step speed fix)."""
    rf = jnp.mean(real, axis=0)
    sf = jnp.mean(synth, axis=0)
    return pearson_corr(rf, sf), jnp.mean(jnp.abs(rf[didx] - sf[didx]))


@jax.jit
def _pairwise_sqdist(x, y):
    """Squared Euclidean distances (N, M) via one matmul — rides the
    MXU instead of materializing (N, M, D) differences."""
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    return jnp.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)


@jax.jit
def _chi2_corr(real, synth, pi, pj):
    """Both cohorts' pairwise chi2 + their correlation on device —
    one program, one scalar readback."""
    return pearson_corr(
        chi2_binary_pairs(real, pi, pj), chi2_binary_pairs(synth, pi, pj)
    )


class BiologicalValidator:
    """Validate synthetic patients against biological knowledge."""

    def __init__(self, config: Config, seed: int = 0):
        self.config = config
        self.driver_genes = config.evaluation.driver_genes
        self.mutually_exclusive_pairs = config.evaluation.mutually_exclusive_pairs
        self.required_correlations = config.evaluation.required_correlations
        self.seed = seed

    # ------------------------------------------------------------------
    def validate_mutation_cooccurrence(
        self,
        real_mutations: pd.DataFrame,
        synthetic_mutations: pd.DataFrame,
        max_genes: int = 50,
    ) -> Dict[str, float]:
        results: Dict[str, float] = {}
        common = real_mutations.columns.intersection(synthetic_mutations.columns)

        real = jnp.asarray(real_mutations[common].values, jnp.float32)
        synth = jnp.asarray(synthetic_mutations[common].values, jnp.float32)

        # 1+2. Frequency correlation + driver diff in ONE compiled
        # program (the tunneled backend pays ~0.1 s dispatch latency
        # per un-jitted op, so per-metric op chains dominate validate).
        drivers = (
            [g for g in self.driver_genes if g in common]
            if self.config.evaluation.check_driver_mutations
            else []
        )
        didx = jnp.asarray(
            [common.get_loc(g) for g in drivers] or [0], jnp.int32
        )
        freq_corr_d, driver_diff_d = _freq_stats(real, synth, didx)
        freq_corr = float(freq_corr_d)
        results["mutation_frequency_correlation"] = freq_corr
        logger.info("Mutation frequency correlation: %.3f", freq_corr)
        if drivers:
            diff = float(driver_diff_d)
            results["driver_gene_frequency_diff"] = diff
            logger.info("Driver gene frequency diff: %.3f", diff)

        # 3. Mutual-exclusivity violation rate.
        if self.mutually_exclusive_pairs:
            violations, total_pairs = 0.0, 0
            synth_cols = synthetic_mutations.columns
            for gene1, gene2 in self.mutually_exclusive_pairs:
                if gene1 in synth_cols and gene2 in synth_cols:
                    both = float(
                        (
                            (synthetic_mutations[gene1] == 1)
                            & (synthetic_mutations[gene2] == 1)
                        ).sum()
                    )
                    violations += both
                    total_pairs += 1
            if total_pairs:
                rate = violations / (len(synthetic_mutations) * total_pairs)
                results["mutual_exclusivity_violation_rate"] = rate
                logger.info("Mutual exclusivity violation rate: %.3f", rate)

        # 4. Pairwise co-occurrence pattern correlation (chi-square).
        rng = np.random.default_rng(self.seed)
        n_sample = min(max_genes, len(common))
        sample_idx = rng.choice(len(common), size=n_sample, replace=False)
        pairs = [
            (int(sample_idx[i]), int(sample_idx[j]))
            for i in range(n_sample)
            for j in range(i + 1, n_sample)
        ]
        if pairs:
            pi = jnp.asarray([p[0] for p in pairs])
            pj = jnp.asarray([p[1] for p in pairs])
            chi2_corr = float(_chi2_corr(real, synth, pi, pj))
            results["cooccurrence_pattern_correlation"] = chi2_corr
            logger.info("Co-occurrence pattern correlation: %.3f", chi2_corr)

        return results

    # ------------------------------------------------------------------
    def validate_pathway_coherence(
        self,
        real_data: pd.DataFrame,
        synthetic_data: pd.DataFrame,
        pathway_gene_matrix: pd.DataFrame,
        max_pathways: int = 10,
        min_genes: int = 3,
    ) -> Dict[str, float]:
        """Within-pathway mean pairwise correlation, real vs synthetic."""
        results: Dict[str, float] = {}
        masks = []
        for pathway in pathway_gene_matrix.columns[:max_pathways]:
            genes = pathway_gene_matrix.index[pathway_gene_matrix[pathway] == 1]
            genes = [g for g in genes if g in real_data.columns]
            if len(genes) < min_genes:
                continue
            col = np.zeros(real_data.shape[1], np.float32)
            col[[real_data.columns.get_loc(g) for g in genes]] = 1.0
            masks.append(col)
        if not masks:
            return results

        mask = jnp.asarray(np.stack(masks, axis=1))
        common_cols = list(real_data.columns)
        real = jnp.asarray(real_data.values, jnp.float32)
        synth = jnp.asarray(synthetic_data[common_cols].values, jnp.float32)

        real_scores = np.asarray(mean_pairwise_corr_within_groups(real, mask))
        synth_scores = np.asarray(mean_pairwise_corr_within_groups(synth, mask))

        results["real_pathway_coherence"] = float(real_scores.mean())
        results["synthetic_pathway_coherence"] = float(synth_scores.mean())
        if len(real_scores) > 1:
            results["pathway_coherence_correlation"] = float(
                pearson_corr(jnp.asarray(real_scores), jnp.asarray(synth_scores))
            )
        logger.info(
            "Pathway coherence real %.3f synth %.3f",
            results["real_pathway_coherence"],
            results["synthetic_pathway_coherence"],
        )
        return results

    # ------------------------------------------------------------------
    def validate_mutation_expression_correlation(
        self,
        mutations: pd.DataFrame,
        expression: pd.DataFrame,
        pathway_scores: pd.DataFrame,
    ) -> Dict[str, float]:
        """Directional mutation -> pathway activity rules."""
        del expression  # rule checks operate on pathway scores (as in ref)
        results: Dict[str, float] = {}
        violations, total = 0, 0
        for rule in self.required_correlations:
            gene, pathway = rule.mutation, rule.pathway
            if gene not in mutations.columns or pathway not in pathway_scores.columns:
                continue
            corr = float(
                pearson_corr(
                    jnp.asarray(mutations[gene].values, jnp.float32),
                    jnp.asarray(pathway_scores[pathway].values, jnp.float32),
                )
            )
            if rule.direction == "positive" and corr < 0:
                violations += 1
            elif rule.direction == "negative" and corr > 0:
                violations += 1
            total += 1
            logger.info(
                "%s vs %s: corr=%.3f (expected %s)",
                gene, pathway, corr, rule.direction,
            )
        if total:
            results["mutation_expression_violation_rate"] = violations / total
        return results

    # ------------------------------------------------------------------
    def statistical_tests(
        self, real_data: np.ndarray, synthetic_data: np.ndarray,
        max_ks_features: int = 100, n_pca_components: int = 10,
    ) -> Dict[str, float]:
        results: Dict[str, float] = {}
        real = jnp.asarray(real_data, jnp.float32)
        synth = jnp.asarray(synthetic_data, jnp.float32)

        # KS over the first <=100 features (validation.py:241-246).
        # p-value method follows scipy's auto rule by default: exact
        # (lattice-path DP) at n<=10k, asymptotic above (round-1 VERDICT
        # weak #7: asymptotic-only diverged from scipy at small cohorts).
        k = min(real.shape[1], max_ks_features)
        _, pvals = ks_test_features(
            real[:, :k], synth[:, :k], mode=self.config.evaluation.ks_mode
        )
        pvals = np.asarray(pvals)
        results["ks_test_mean_pvalue"] = float(pvals.mean())
        results["ks_test_fraction_significant"] = float((pvals < 0.05).mean())

        # Size-matched KS (round-2 VERDICT weak #4): at n_real=100 vs
        # n_synth=10k the test detects any epsilon marginal discrepancy,
        # so the raw fraction reads ~0.6 on healthy cohorts. Comparing
        # n_real-sized subsamples restores the nominal-alpha reading;
        # both metrics are reported (the raw one for reference parity).
        n_re = int(self.config.evaluation.ks_size_matched_resamples)
        if n_re > 0 and synth.shape[0] > real.shape[0]:
            sub_rng = np.random.default_rng(self.seed)
            fracs, means = [], []
            for _ in range(n_re):
                idx = sub_rng.choice(
                    synth.shape[0], size=real.shape[0], replace=False
                )
                _, p_m = ks_test_features(
                    real[:, :k], synth[jnp.asarray(idx), :k],
                    mode=self.config.evaluation.ks_mode,
                )
                p_m = np.asarray(p_m)
                fracs.append(float((p_m < 0.05).mean()))
                means.append(float(p_m.mean()))
            results["ks_matched_fraction_significant"] = float(
                np.mean(fracs)
            )
            results["ks_matched_mean_pvalue"] = float(np.mean(means))

        # MMD with gamma = 1/d (validation.py:284-298). On TPU the tiled
        # Pallas kernel avoids materializing the n x m Gram matrix.
        from ..ops.pallas_kernels import mmd_rbf_auto

        results["mmd"] = float(mmd_rbf_auto(real, synth))

        # Wasserstein over 10 PCA components (validation.py:256-269);
        # all components in one vmapped program + one readback.
        n_comp = min(n_pca_components, real.shape[0], real.shape[1])
        real_pca, synth_pca = pca_project(real, synth, n_comp)
        dists = np.asarray(wasserstein_columns(real_pca, synth_pca))
        results["wasserstein_distance_mean"] = float(np.mean(dists))

        for key, value in results.items():
            logger.info("%s: %.4f", key, value)
        return results

    def compute_mmd(
        self, x: np.ndarray, y: np.ndarray, gamma: Optional[float] = None
    ) -> float:
        return float(mmd_rbf(jnp.asarray(x), jnp.asarray(y), gamma=gamma))

    # ------------------------------------------------------------------
    def novelty_metrics(
        self, real_data: np.ndarray, synthetic_data: np.ndarray
    ) -> Dict[str, float]:
        """Novelty / memorization audit of the synthetic cohort.

        The reference validator (utils/validation.py:300-387) — and
        every distributional metric above — cannot distinguish a
        generator from a resampler: re-rendering the training patients
        scores perfectly. These metrics can:

        - nn_distance_ratio: median synthetic->real nearest-neighbor
          distance over the real cohort's own leave-one-out NN
          distance. ~>=1 means synthetic patients sit no closer to
          real ones than real patients sit to each other (novel);
          << 1 means the generator parks on training points.
        - duplicate_rate: fraction of synthetic rows whose NN distance
          is < 5% of the real LOO median (near-copies), and
        - exact_duplicate_rate: bit-identical re-renders (row-hash
          membership against the whole real cohort) plus rows whose
          float64-exact candidate-NN distance is < 1e-6 relative. The
          f32 xx+yy-2xy distance identity alone misses ~36% of
          bit-identical rows at D~5k (cancellation error ~0.03-0.04
          absolute vs a ~7e-5 threshold; round-3 ADVICE), so both
          checks bypass it.
        - nn_loo_ratio_median / nn_loo_ratio_q05: per-row ratio of the
          synthetic row's (float64-exact) NN distance to its nearest
          real patient's own LOO distance, summarized by median and
          5th percentile. A memorizer drives these toward 0; an
          in-distribution generator sits near the split-half floors
          reported alongside (*_floor). Unlike the retired
          memorization_fraction (the count of ratios < 1, which
          saturated at ~1.0 under any uniform distance shrinkage,
          e.g. from quantile snapping), the quantiles stay
          discriminative: uniform shrinkage moves the median from
          ~1.0 to ~0.9 while a memorized subpopulation crushes q05
          toward 0.
        """
        real = jnp.asarray(real_data, jnp.float32)
        results = self._novelty_core(real, jnp.asarray(synthetic_data,
                                                       jnp.float32))
        # Split-half floors: even a PERFECT generator's ratio stats sit
        # below 1 in expectation at finite n (half-cohort LOO distances
        # are larger than full-cohort ones). Treat one random half of
        # the real cohort as "synthetic" against the other half and
        # report the same quantiles, so the verdict reads the synthetic
        # stats RELATIVE to an achievable ceiling instead of against 1.
        n = real.shape[0]
        if n >= 8:
            rng = np.random.default_rng(self.seed)
            floors = {"nn_loo_ratio_median": [], "nn_loo_ratio_q05": []}
            for _ in range(3):
                perm = rng.permutation(n)
                a, b = perm[: n // 2], perm[n // 2:]
                core = self._novelty_core(
                    real[jnp.asarray(b)], real[jnp.asarray(a)]
                )
                for key in floors:
                    floors[key].append(core[key])
            for key, vals in floors.items():
                results[f"{key}_floor"] = float(np.mean(vals))
        for key, value in results.items():
            logger.info("%s: %.4f", key, value)
        return results

    @staticmethod
    def _novelty_core(real, synth) -> Dict[str, float]:
        d2_rr = _pairwise_sqdist(real, real)
        # Mask the diagonal for leave-one-out.
        n = real.shape[0]
        d2_rr = d2_rr + jnp.where(
            jnp.eye(n, dtype=bool), jnp.inf, 0.0
        )
        loo = jnp.sqrt(jnp.maximum(jnp.min(d2_rr, axis=1), 0.0))
        d2_sr = _pairwise_sqdist(synth, real)
        nn_idx = jnp.argmin(d2_sr, axis=1)

        real_np = np.asarray(real, np.float32)
        synth_np = np.asarray(synth, np.float32)
        loo_np = np.asarray(loo)
        nn_idx_np = np.asarray(nn_idx)
        # Exact float64 distance to the selected candidate: the f32
        # matmul identity's cancellation error would swamp the
        # exact-duplicate threshold (round-3 ADVICE, medium).
        diff = (synth_np.astype(np.float64)
                - real_np[nn_idx_np].astype(np.float64))
        nn_np = np.sqrt(np.einsum("ij,ij->i", diff, diff))

        loo_med = float(np.median(loo_np))
        nn_med = float(np.median(nn_np))
        scale = float(np.sqrt(max(
            float(np.mean((real_np.astype(np.float64) ** 2).sum(axis=1))),
            1e-30,
        )))
        # Bit-identical re-renders by row hash: catches duplicates even
        # when the f32 argmin picked a non-duplicate neighbor.
        real_rows = {r.tobytes() for r in real_np}
        bit_dup = np.fromiter(
            (s.tobytes() in real_rows for s in synth_np),
            bool, synth_np.shape[0],
        )
        ratios = nn_np / np.maximum(loo_np[nn_idx_np], 1e-12)
        return {
            "nn_distance_ratio": nn_med / max(loo_med, 1e-12),
            "duplicate_rate": float(
                (nn_np < 0.05 * max(loo_med, 1e-12)).mean()
            ),
            "exact_duplicate_rate": float(
                (bit_dup | (nn_np < 1e-6 * scale)).mean()
            ),
            "nn_loo_ratio_median": float(np.median(ratios)),
            "nn_loo_ratio_q05": float(np.quantile(ratios, 0.05)),
            "real_loo_nn_median": loo_med,
            "synthetic_nn_median": nn_med,
        }

    # ------------------------------------------------------------------
    def validate_all(
        self,
        real_mutations: pd.DataFrame,
        real_expression: pd.DataFrame,
        real_pathways: pd.DataFrame,
        synth_mutations: pd.DataFrame,
        synth_expression: pd.DataFrame,
        synth_pathways: pd.DataFrame,
        pathway_gene_matrix: Optional[pd.DataFrame] = None,
    ) -> Dict[str, float]:
        logger.info("=" * 50)
        logger.info("BIOLOGICAL VALIDATION")
        logger.info("=" * 50)
        all_results: Dict[str, float] = {}
        ev = self.config.evaluation

        # The check_* flags are honored (the reference declares them at
        # config.yaml:93-96 but always runs everything).
        if ev.check_mutation_cooccurrence:
            all_results.update(
                self.validate_mutation_cooccurrence(real_mutations, synth_mutations)
            )
        if ev.check_pathway_coherence and pathway_gene_matrix is not None:
            all_results.update(
                self.validate_pathway_coherence(
                    real_expression, synth_expression, pathway_gene_matrix
                )
            )
        all_results.update(
            self.validate_mutation_expression_correlation(
                synth_mutations, synth_expression, synth_pathways
            )
        )

        real_combined = np.concatenate(
            [real_mutations.values, real_expression.values, real_pathways.values],
            axis=1,
        ).astype(np.float32)
        synth_combined = np.concatenate(
            [synth_mutations.values, synth_expression.values, synth_pathways.values],
            axis=1,
        ).astype(np.float32)
        all_results.update(self.statistical_tests(real_combined, synth_combined))
        if ev.check_novelty and real_combined.shape[0] > 2:
            all_results.update(
                self.novelty_metrics(real_combined, synth_combined)
            )

        # Overall score: mean of the 4 normalized components
        # (validation.py:368-385).
        components: List[float] = []
        if "mutation_frequency_correlation" in all_results:
            components.append(all_results["mutation_frequency_correlation"])
        if "cooccurrence_pattern_correlation" in all_results:
            components.append(all_results["cooccurrence_pattern_correlation"])
        if "mutual_exclusivity_violation_rate" in all_results:
            components.append(1 - all_results["mutual_exclusivity_violation_rate"])
        if "mutation_expression_violation_rate" in all_results:
            components.append(1 - all_results["mutation_expression_violation_rate"])
        if components:
            all_results["overall_biological_score"] = float(np.mean(components))
            logger.info(
                "Overall Biological Score: %.3f",
                all_results["overall_biological_score"],
            )
        return all_results
