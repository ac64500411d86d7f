"""Device (XLA) calibration parity vs the numpy reference path.

ops/copula_device.py re-runs the copula_joint / copula_full pipelines
as jitted XLA programs. Contract under test:

- per-column MARGINALS are identical to ops/copula.py by construction
  (exact per-gene bit counts; continuous values gathered from the same
  real quantile grid), so sorted columns must match;
- the IMPOSED JOINT matches statistically (both paths transplant the
  same target correlation; only the patient permutation may differ,
  within tie-randomization/f32-vs-f64 eigh noise);
- the generator engages the device path via
  generation.calibration_backend="device" and produces cohorts that
  match the numpy backend's marginals end to end.
"""

import jax
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.ops import copula as C
from osteosarcoma_diffusionmodel_tpu.ops.copula_device import DeviceCalibrator


def _structured_cohort(rng, n, m, d_cont):
    """Latent 2-factor cohort: correlated bits + coupled continuous."""
    k = 2
    load_m = rng.normal(size=(k, m)) * 1.2
    load_c = rng.normal(size=(k, d_cont))
    z = rng.normal(size=(n, k))
    bits = ((z @ load_m + rng.normal(size=(n, m))) > 0.3).astype(np.float64)
    cont = z @ load_c + rng.normal(size=(n, d_cont)) * 0.7
    return bits, cont


def _np_quantile_map(cont, sorted_real):
    """The generator's numpy quantile map (generator.py
    _quantile_map_continuous), inlined for a standalone reference."""
    n = cont.shape[0]
    n_real = sorted_real.shape[0]
    order = np.argsort(cont, axis=0)
    ranks = np.empty_like(order)
    np.put_along_axis(
        ranks, order,
        np.broadcast_to(np.arange(n)[:, None], order.shape), axis=0,
    )
    p = (ranks + 0.5) / n
    pos = p * (n_real - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_real - 1)
    frac = (pos - lo).astype(np.float32)
    return (
        np.take_along_axis(sorted_real, lo, axis=0) * (1.0 - frac)
        + np.take_along_axis(sorted_real, hi, axis=0) * frac
    )


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(7)
    m, d_cont, n_real = 10, 40, 200
    real_bits, real_cont = _structured_cohort(rng, n_real, m, d_cont)
    # Keep gene frequencies off 0/1 so counts are meaningful.
    real_bits[:, real_bits.mean(0) < 0.05] = rng.random((n_real,))[:, None] < 0.2
    fit = C.fit_joint_copula(real_bits, real_cont)
    sorted_real = np.sort(real_cont, axis=0).astype(np.float32)
    raw = rng.normal(size=(300, m + d_cont)).astype(np.float32)
    return fit, sorted_real, raw, m


def _both_paths(fitted):
    fit, sorted_real, raw, m = fitted
    freq, chol, tetra, _ = fit
    bits_np, z_cont = C.joint_transplant(
        raw, chol, freq, m, tetra=tetra,
        tie_rng=np.random.default_rng(1),
    )
    cont_np = _np_quantile_map(z_cont, sorted_real)
    cal = DeviceCalibrator(
        m, sorted_real, freq=freq, joint_chol=chol, tetra=tetra
    )
    bits_dev, cont_dev = cal.joint(raw, seed=1)
    return bits_np, cont_np, bits_dev, cont_dev


def test_joint_marginals_identical(fitted):
    bits_np, cont_np, bits_dev, cont_dev = _both_paths(fitted)
    # Exact-count thresholding: identical per-gene mutation counts.
    np.testing.assert_array_equal(bits_dev.sum(0), bits_np.sum(0))
    # Quantile gathers from the same grid: identical sorted columns.
    np.testing.assert_allclose(
        np.sort(cont_dev, axis=0), np.sort(cont_np, axis=0),
        rtol=1e-4, atol=1e-4,
    )


def test_joint_structure_parity(fitted):
    bits_np, cont_np, bits_dev, cont_dev = _both_paths(fitted)
    full_np = np.concatenate([bits_np, cont_np], axis=1)
    full_dev = np.concatenate([bits_dev, cont_dev], axis=1)
    c_np = np.corrcoef(full_np, rowvar=False)
    c_dev = np.corrcoef(full_dev, rowvar=False)
    iu = np.triu_indices_from(c_np, k=1)
    a, b = c_np[iu], c_dev[iu]
    # Both paths impose the SAME target joint; their empirical
    # correlation matrices must agree up to permutation/eigh noise.
    pattern = np.corrcoef(a, b)[0, 1]
    assert pattern > 0.95, pattern
    assert np.max(np.abs(a - b)) < 0.25


def test_continuous_path_parity(fitted):
    fit, sorted_real, raw, m = fitted
    rng = np.random.default_rng(3)
    real_cont = sorted_real  # any real matrix works for the fit
    cont_chol = C.fit_continuous_copula_chol(real_cont)
    cont_raw = raw[:, m:]
    z_np = C.gaussian_transplant(
        cont_raw, cont_chol, tie_rng=np.random.default_rng(2)
    )
    cont_np = _np_quantile_map(z_np, sorted_real)
    cal = DeviceCalibrator(m, sorted_real, cont_chol=cont_chol)
    cont_dev = cal.continuous(cont_raw, seed=2)
    np.testing.assert_allclose(
        np.sort(cont_dev, axis=0), np.sort(cont_np, axis=0),
        rtol=1e-4, atol=1e-4,
    )
    c_np = np.corrcoef(cont_np, rowvar=False)
    c_dev = np.corrcoef(cont_dev, rowvar=False)
    iu = np.triu_indices_from(c_np, k=1)
    assert np.corrcoef(c_np[iu], c_dev[iu])[0, 1] > 0.95


@pytest.fixture()
def generator_joint_stats(rng):
    from osteosarcoma_diffusionmodel_tpu.config import Config
    from osteosarcoma_diffusionmodel_tpu.generation.generator import (
        SyntheticPatientGenerator,
    )
    from osteosarcoma_diffusionmodel_tpu.models.diffusion import (
        ConditionalDiffusion,
    )

    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(
        5, 12, 3,
        ["survival_days_norm", "event_occurred", "metastasis_at_diagnosis"],
    )
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    real = np.concatenate(
        [
            (rng.random((100, 5)) < [0.1, 0.3, 0.5, 0.7, 0.9]).astype(
                np.float32
            ),
            rng.normal(5.0, 2.0, (100, 12)).astype(np.float32),
            rng.normal(-1.0, 0.5, (100, 3)).astype(np.float32),
        ],
        axis=1,
    )
    stats = {
        "feature_mean": real.mean(axis=0),
        "feature_std": real.std(axis=0),
        "mutation_freq": real[:, :5].mean(axis=0),
        "mutation_matrix": real[:, :5],
        "data_matrix": real,
        "feature_sorted": np.sort(real, axis=0),
    }
    return SyntheticPatientGenerator(
        model, params, cfg, dims, data_stats=stats
    )


def test_generator_device_backend_matches_numpy_marginals(
    generator_joint_stats,
):
    gen = generator_joint_stats
    gen.config.generation.calibration_backend = "numpy"
    out_np = gen.generate(
        300, {"survival_time": 800}, rng=jax.random.PRNGKey(5)
    )
    gen.config.generation.calibration_backend = "device"
    # Fresh calibrator caches per backend switch not needed: device
    # path builds its own DeviceCalibrator lazily.
    out_dev = gen.generate(
        300, {"survival_time": 800}, rng=jax.random.PRNGKey(5)
    )
    for k in ("mutations", "expression", "pathways", "conditions"):
        assert isinstance(out_dev[k], np.ndarray), k
    np.testing.assert_array_equal(
        out_dev["mutations"].sum(0), out_np["mutations"].sum(0)
    )
    np.testing.assert_allclose(
        np.sort(out_dev["expression"], axis=0),
        np.sort(out_np["expression"], axis=0),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.sort(out_dev["pathways"], axis=0),
        np.sort(out_np["pathways"], axis=0),
        rtol=1e-4, atol=1e-4,
    )


def test_mesh_disables_device_calibration(generator_joint_stats):
    """Sharded outputs are materialized host-side in generate(); the
    device-calibration predicate must refuse under a mesh even when
    the backend is forced, or the cohort it just read back would be
    re-uploaded for a host->device->host round trip."""
    gen = generator_joint_stats
    gen.config.generation.calibration_backend = "device"
    assert gen._device_calibration_enabled(300)
    gen.mesh = object()  # any non-None mesh
    assert not gen._device_calibration_enabled(300)


def test_accepts_row_bound(fitted):
    fit, sorted_real, raw, m = fitted
    freq, chol, tetra, _ = fit
    cal = DeviceCalibrator(
        m, sorted_real, freq=freq, joint_chol=chol, tetra=tetra
    )
    assert cal.accepts(1024)
    assert not cal.accepts(DeviceCalibrator.MAX_ROWS + 1)
