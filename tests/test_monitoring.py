"""Serving monitoring: PHI-safe request log, drift detection, dashboard.

The reference only documents these (reference docs/DEPLOYMENT.md:283-352
sketches a streamlit dashboard, detect_data_drift, and a SecureLogger
allowlist); here they are implemented and tested for real.
"""

import json

import numpy as np

from osteosarcoma_diffusionmodel_tpu.serving.monitoring import (
    DriftMonitor,
    SecureRequestLog,
    render_dashboard,
)


def test_secure_log_allowlists_fields(tmp_path):
    log_path = tmp_path / "requests.log"
    log = SecureRequestLog(str(log_path))
    record = log.log_generation(
        {
            "survival_time": 800,
            "event_occurred": 1,
            "patient_id": "TARGET-40-0A4HX8",   # PHI: must never be logged
            "name": "John Doe",                  # PHI
            "notes": "called about results",     # PHI
        },
        num_samples=5,
        sampler="ddpm",
        seconds=0.123,
    )
    assert record["conditions"] == {"survival_time": 800, "event_occurred": 1}
    assert record["fields_dropped"] == 3
    text = log_path.read_text()
    assert "survival_time" in text
    for phi in ("TARGET-40", "John", "patient_id", "notes"):
        assert phi not in text
    # The line is parseable JSON after the prefix.
    payload = json.loads(text.strip().split("generation ", 1)[1])
    assert payload["num_samples"] == 5


def test_secure_log_drops_non_numeric_values(tmp_path):
    log = SecureRequestLog(str(tmp_path / "r.log"))
    # Even an allowlisted KEY with a freeform string value is dropped.
    record = log.log_generation(
        {"survival_time": "800; see chart for Jane"}, 1, "ddim", 0.1
    )
    assert record["conditions"] == {}
    assert "Jane" not in (tmp_path / "r.log").read_text()


def test_drift_monitor_zero_then_shift():
    mon = DriftMonitor([0.0, 0.5], [1.0, 0.25], ["a", "b"])
    assert mon.score() == 0.0  # no requests yet
    mon.update(np.array([[0.0, 0.5], [0.0, 0.5]]))
    assert mon.score() < 1e-12  # requests match training exactly
    # Shift feature b by 2 training stds.
    mon2 = DriftMonitor([0.0, 0.5], [1.0, 0.25], ["a", "b"])
    mon2.update(np.array([[0.0, 1.0]]))
    per = mon2.per_feature()
    assert abs(per["b"] - 2.0) < 1e-9
    assert per["a"] == 0.0
    assert abs(mon2.score() - 1.0) < 1e-9  # mean of (0, 2)


def test_drift_monitor_streaming_mean():
    rng = np.random.default_rng(0)
    mon = DriftMonitor([0.0], [1.0])
    xs = rng.normal(3.0, 0.1, size=(500, 1))
    for chunk in np.array_split(xs, 7):
        mon.update(chunk)
    assert mon.count == 500
    assert abs(mon.per_feature()["c0"] - abs(xs.mean())) < 1e-9


def test_render_dashboard_alerts_on_drift():
    mon = DriftMonitor([0.0], [1.0], ["survival"])
    mon.update(np.array([[5.0]]))
    html = render_dashboard(
        {"requests": 3, "mean_seconds": 0.2}, mon,
        {"architecture": "diffusion"},
    )
    assert "Data drift detected" in html
    assert "survival" in html and "diffusion" in html
    quiet = render_dashboard({"requests": 0}, DriftMonitor([0.0], [1.0]), {})
    assert "drift detected" not in quiet.lower()
    none = render_dashboard({"requests": 0}, None, {})
    assert "No drift monitor" in none


def test_secure_log_instances_do_not_share_handlers(tmp_path):
    """Recreating the log (service restarts, tests) must not duplicate
    handlers via logger-registry name reuse (code-review finding)."""
    import gc

    paths = []
    for i in range(8):
        p = tmp_path / f"r{i}.log"
        log = SecureRequestLog(str(p))
        assert len(log.logger.handlers) == 1, i
        log.log_generation({"survival_time": 100 + i}, 1, "ddpm", 0.1)
        log.close()
        paths.append(p)
        del log
        gc.collect()
    # Each file got exactly its own single line.
    for i, p in enumerate(paths):
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 1, (i, lines)
