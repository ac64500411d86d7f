"""Analysis/report module: KM estimator, grading, report generation."""

import numpy as np
import pandas as pd
import pytest

from osteosarcoma_diffusionmodel_tpu.analysis.report import (
    AnalysisReport,
    embed_2d,
    grade,
    kaplan_meier,
    write_summary_report,
)
from osteosarcoma_diffusionmodel_tpu.config import Config


def test_kaplan_meier_closed_form():
    # 4 subjects: events at t=1,2; censored at t=1.5, 3.
    times = np.array([1.0, 1.5, 2.0, 3.0])
    events = np.array([1, 0, 1, 0])
    t, s = kaplan_meier(times, events)
    np.testing.assert_array_equal(t, [1.0, 2.0])
    # S(1) = 1 - 1/4 = 0.75 ; S(2) = 0.75 * (1 - 1/2) = 0.375
    np.testing.assert_allclose(s, [0.75, 0.375])


def test_kaplan_meier_no_events():
    t, s = kaplan_meier(np.array([1.0, 2.0]), np.array([0, 0]))
    assert len(t) == 0


def test_kaplan_meier_ties():
    times = np.array([1.0, 1.0, 1.0, 2.0])
    events = np.array([1, 1, 0, 1])
    t, s = kaplan_meier(times, events)
    # At t=1: n=4, d=2 -> S=0.5 ; at t=2: n=1, d=1 -> S=0.
    np.testing.assert_allclose(s, [0.5, 0.0])


def test_grade_thresholds():
    assert grade(0.9) == "PASS"
    assert grade(0.85) == "PASS"
    assert grade(0.75) == "REVIEW"
    assert grade(0.5) == "FAIL"


def test_summary_report(tmp_path):
    results = {"overall_biological_score": 0.88, "mmd": 0.12}
    text = write_summary_report(results, tmp_path / "summary.txt")
    assert "PASS" in text
    assert (tmp_path / "summary.txt").exists()


def test_embed_2d_shapes(rng):
    real = rng.normal(size=(20, 10))
    synth = rng.normal(size=(30, 10))
    r2, s2 = embed_2d(real, synth)
    assert r2.shape == (20, 2)
    assert s2.shape == (30, 2)


def test_figures_generated(tmp_path, rng):
    cfg = Config()
    cfg.output.figures_dir = str(tmp_path / "figs")
    report = AnalysisReport(cfg)
    real_mut = pd.DataFrame(rng.integers(0, 2, (20, 6)).astype(float),
                            columns=["TP53", "RB1", "A", "B", "C", "D"])
    synth_mut = pd.DataFrame(rng.integers(0, 2, (30, 6)).astype(float),
                             columns=real_mut.columns)
    out = report.mutation_frequency_scatter(real_mut, synth_mut)
    assert out is not None and out.exists()
    out2 = report.driver_gene_bars(real_mut, synth_mut)
    assert out2 is not None and out2.exists()
    path_df = pd.DataFrame(rng.normal(size=(20, 6)),
                           columns=[f"HALLMARK_{i}" for i in range(6)])
    out3 = report.pathway_histograms(path_df, path_df)
    assert out3 is not None and out3.exists()
    out4 = report.km_curves({
        "s1": (rng.integers(100, 2000, 20), rng.integers(0, 2, 20)),
    })
    assert out4 is not None and out4.exists()
    out5 = report.validation_bars({"overall_biological_score": 0.8,
                                   "mmd": 0.1,
                                   "mutation_frequency_correlation": 0.9})
    assert out5 is not None and out5.exists()


def test_embed_2d_umap_branch_via_stub(rng, monkeypatch):
    """Exercise the UMAP code path (round-1 VERDICT item 8): umap-learn
    is absent in this image, so inject a minimal stand-in module and
    check embed_2d routes through it."""
    import sys
    import types

    calls = {}

    class FakeUMAP:
        def __init__(self, n_components=2, random_state=0):
            calls["n_components"] = n_components

        def fit_transform(self, x):
            calls["n_rows"] = len(x)
            return np.asarray(x)[:, :2] * 0.0 + 7.0

    fake = types.ModuleType("umap")
    fake.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    real = rng.normal(size=(10, 6)).astype(np.float32)
    synth = rng.normal(size=(4, 6)).astype(np.float32)
    r2, s2 = embed_2d(real, synth)
    assert calls == {"n_components": 2, "n_rows": 14}
    assert r2.shape == (10, 2) and s2.shape == (4, 2)
    np.testing.assert_allclose(r2, 7.0)


def test_kaplan_meier_matches_lifelines_or_hand_value():
    """KM parity with lifelines when installed (not in this image),
    otherwise against the hand-computed product-limit values."""
    times = np.array([5.0, 10.0, 10.0, 20.0, 30.0, 30.0, 40.0])
    events = np.array([1, 1, 0, 1, 0, 1, 0])
    t, s = kaplan_meier(times, events)
    try:
        from lifelines import KaplanMeierFitter

        kmf = KaplanMeierFitter().fit(times, events)
        ours = dict(zip(t, s))
        for ti, si in ours.items():
            np.testing.assert_allclose(
                float(kmf.predict(ti)), si, atol=1e-9
            )
    except ImportError:
        # S(5)=6/7; S(10)=6/7*5/6=5/7; S(20): 4 at risk -> *3/4;
        # S(30): 3 at risk, 1 death -> *2/3.
        np.testing.assert_allclose(t, [5.0, 10.0, 20.0, 30.0])
        np.testing.assert_allclose(
            s, [6 / 7, 5 / 7, 5 / 7 * 3 / 4, 5 / 7 * 3 / 4 * 2 / 3]
        )


# ----------------------------------------------------------------------
# Native UMAP (analysis/embedding.py)
# ----------------------------------------------------------------------
def test_find_ab_params_default_matches_umap_learn():
    """umap-learn's published fit for (min_dist=0.1, spread=1.0) is
    a=1.5769, b=0.8951; the native Gauss-Newton fit must land there."""
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        find_ab_params,
    )

    a, b = find_ab_params(0.1, 1.0)
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.895) < 0.02


def test_umap_preserves_cluster_structure(rng):
    """Two well-separated 30-D blobs must stay separated in the 2-D
    layout — the property PCA shares but a broken neighbor graph or
    diverging layout would lose."""
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        umap_embed,
    )

    a = rng.normal(size=(60, 30)) + 5.0
    b = rng.normal(size=(60, 30)) - 5.0
    emb = umap_embed(np.concatenate([a, b]), n_epochs=100, seed=1)
    ea, eb = emb[:60], emb[60:]
    centroid_gap = np.linalg.norm(ea.mean(0) - eb.mean(0))
    spread = 0.5 * (
        np.linalg.norm(ea - ea.mean(0), axis=1).mean()
        + np.linalg.norm(eb - eb.mean(0), axis=1).mean()
    )
    assert centroid_gap > 2.0 * spread


def test_umap_deterministic_under_seed(rng):
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        umap_embed,
    )

    x = rng.normal(size=(50, 8))
    e1 = umap_embed(x, n_epochs=30, seed=7)
    e2 = umap_embed(x, n_epochs=30, seed=7)
    np.testing.assert_array_equal(e1, e2)


def test_umap_tiny_cohort_falls_back_to_pca():
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        umap_embed,
    )

    emb = umap_embed(np.eye(3))
    assert emb.shape == (3, 2)


def test_umap_hub_update_is_degree_independent():
    """Star-graph hub regression (round-4 ADVICE): per-edge clipping
    alone lets a degree-m hub accumulate up to a 4*m per-axis update
    in one synchronous sweep (umap-learn's per-edge immediate updates
    never do), so hubs oscillate on dense graphs. The accumulated
    per-point update must respect the same +/-4 bound as one edge."""
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        optimize_layout,
    )

    m = 200  # hub degree
    leaves = np.arange(1, m + 1)
    # Symmetric edge list, as fuzzy_simplicial_set emits.
    rows = np.concatenate([np.zeros(m, np.int64), leaves])
    cols = np.concatenate([leaves, np.zeros(m, np.int64)])
    vals = np.ones(2 * m)
    # Leaves far from the hub so every per-edge gradient saturates its
    # +/-4 clip, all pulling the hub the same way.
    y0 = np.zeros((m + 1, 2))
    y0[1:, 0] = 100.0
    y1 = optimize_layout(
        y0, rows, cols, vals, a=1.577, b=0.895,
        n_epochs=1, neg_samples=0, lr=1.0, seed=0,
    )
    hub_step = np.abs(y1[0] - y0[0]).max()
    assert hub_step <= 4.0 + 1e-9, (
        f"hub moved {hub_step} in one epoch — accumulated update "
        "not clipped"
    )
    # The unclipped accumulated hub update is the sum of m per-edge
    # pulls — the regression this test exists for only bites if that
    # sum exceeds the bound.
    per_edge = np.abs(y1[1] - y0[1]).max()
    assert m * per_edge > 4.0, "fixture too weak to detect the bug"
    # Leaves (degree 1) still move: the clip must not freeze the layout.
    assert per_edge > 0.01


def test_fuzzy_graph_is_symmetric(rng):
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        fuzzy_simplicial_set,
    )

    x = rng.normal(size=(40, 6))
    rows, cols, vals = fuzzy_simplicial_set(x, 10)
    lut = {(i, j): v for i, j, v in zip(rows, cols, vals)}
    for (i, j), v in lut.items():
        assert (j, i) in lut
        np.testing.assert_allclose(lut[(j, i)], v, rtol=1e-10)
    assert np.all(vals > 0) and np.all(vals <= 1.0 + 1e-12)


# ----------------------------------------------------------------------
# Survival statistics (analysis/survival.py)
# ----------------------------------------------------------------------
def test_greenwood_ci_hand_value():
    """times [1,2,3,4], events [1,1,0,1]: at t=2, S=0.5 with Greenwood
    sum 1/12 + 1/6 -> Var=0.0625; the log-minus-log 95% band is
    (0.0578, 0.8449) (hand-computed)."""
    from osteosarcoma_diffusionmodel_tpu.analysis.survival import (
        kaplan_meier_full,
    )

    c = kaplan_meier_full([1.0, 2.0, 3.0, 4.0], [1, 1, 0, 1])
    np.testing.assert_array_equal(c.times, [1.0, 2.0, 4.0])
    np.testing.assert_allclose(c.survival, [0.75, 0.5, 0.0])
    np.testing.assert_allclose(c.ci_low[1], 0.05788, atol=2e-4)
    np.testing.assert_allclose(c.ci_high[1], 0.84489, atol=2e-4)
    # Band brackets the estimate and stays in [0, 1].
    assert np.all(c.ci_low <= c.survival + 1e-12)
    assert np.all(c.survival <= c.ci_high + 1e-12)
    assert np.all((c.ci_low >= 0) & (c.ci_high <= 1))


def test_logrank_hand_value():
    """A=[1,2,3], B=[4,5,6], all events: O_A=3, E_A=1.15, V=0.6775 ->
    chi2 = 1.85^2/0.6775 = 5.0517, p = erfc(sqrt(chi2/2)) = 0.0246."""
    from osteosarcoma_diffusionmodel_tpu.analysis.survival import (
        logrank_test,
    )

    r = logrank_test([1, 2, 3], [1, 1, 1], [4, 5, 6], [1, 1, 1])
    np.testing.assert_allclose(r.statistic, 5.0517, atol=1e-3)
    np.testing.assert_allclose(r.p_value, 0.0246, atol=1e-3)
    np.testing.assert_allclose(r.observed_a, 3.0)
    np.testing.assert_allclose(r.expected_a, 1.15, atol=1e-10)


def test_logrank_identical_groups_not_significant(rng):
    from osteosarcoma_diffusionmodel_tpu.analysis.survival import (
        logrank_test,
    )

    t = rng.exponential(100.0, size=200)
    e = rng.random(200) < 0.7
    r = logrank_test(t[:100], e[:100], t[100:], e[100:])
    assert r.p_value > 0.01


def test_median_survival():
    from osteosarcoma_diffusionmodel_tpu.analysis.survival import (
        median_survival,
    )

    # S drops to 0.5 exactly at the 2nd event of 4 subjects.
    assert median_survival([1, 2, 3, 4], [1, 1, 1, 1]) == 2.0
    assert np.isnan(median_survival([1, 2, 3], [0, 0, 0]))


def test_km_curves_ci_and_logrank_annotation(tmp_path, rng):
    """km_curves renders Greenwood bands + the two-scenario log-rank
    annotation without error and writes the figure."""
    cfg = Config()
    cfg.output.figures_dir = str(tmp_path)
    report = AnalysisReport(cfg, figures_dir=tmp_path)
    surv = {
        "good": (rng.exponential(900.0, 40), np.ones(40)),
        "poor": (rng.exponential(200.0, 40), np.ones(40)),
    }
    out = report.km_curves(surv)
    assert out is not None and out.exists()


def test_umap_survives_exact_duplicate_rows(rng):
    """A duplicated row (zero-distance edge) must not NaN-poison the
    layout: r2**(b-1) with b<1 is inf at r2=0; umap-learn zeroes the
    attractive force there and so do we (round-4 review finding)."""
    from osteosarcoma_diffusionmodel_tpu.analysis.embedding import (
        umap_embed,
    )

    x = rng.normal(size=(50, 20))
    x[31] = x[7]  # exact duplicate — the memorization-display case
    emb = umap_embed(x, n_epochs=25, seed=3)
    assert emb.shape == (50, 2)
    assert np.isfinite(emb).all()


def test_novelty_verdict_shared_thresholds():
    """The notebook and the written report consume the same helper."""
    from osteosarcoma_diffusionmodel_tpu.analysis.report import (
        novelty_verdict,
    )

    assert novelty_verdict({}) is None
    assert novelty_verdict(
        {"nn_distance_ratio": 0.9, "exact_duplicate_rate": 0.0}
    ).startswith("NOVEL")
    assert novelty_verdict(
        {"nn_distance_ratio": 0.9, "exact_duplicate_rate": 0.5}
    ) == "MEMORIZATION SUSPECTED"
    assert novelty_verdict(
        {"nn_distance_ratio": 0.35, "exact_duplicate_rate": 0.0}
    ).startswith("REVIEW")
    # A crushed q05 vs its floor flags a memorized subpopulation even
    # when the medians look healthy.
    assert novelty_verdict({
        "nn_distance_ratio": 0.9, "exact_duplicate_rate": 0.0,
        "nn_loo_ratio_q05": 0.1, "nn_loo_ratio_q05_floor": 0.8,
    }) == "MEMORIZATION SUSPECTED"
