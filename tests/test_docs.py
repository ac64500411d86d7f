"""Docs hygiene: the parity map is the round-to-round audit trail, so
every repo-relative path it cites must resolve (round-2 VERDICT weak #6
found a phantom `generation/calibration.py` citation)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "osteosarcoma_diffusionmodel_tpu"

# Backtick-quoted tokens that look like repo file paths: at least one
# slash or a known top-level file, ending in a source/doc suffix.
_PATH_RE = re.compile(r"`([A-Za-z0-9_./-]+\.(?:py|md|yaml|ipynb|json))`")


def _resolve(token: str) -> bool:
    """A cited path may be repo-relative, package-relative, or a
    /root/reference citation (not checked here — the reference is
    read-only upstream)."""
    if token.startswith(("reference/", "/root/reference")):
        return True
    # Runtime artifacts (written by training/serving, not committed).
    if token in {"metadata.json", "config_updated.yaml", "data_stats.npz"}:
        return True
    candidates = [REPO / token, PKG / token]
    return any(c.exists() for c in candidates)


def test_parity_map_paths_resolve():
    text = (REPO / "docs" / "PARITY.md").read_text()
    cited = set(_PATH_RE.findall(text))
    assert cited, "PARITY.md should cite at least one path"
    missing = sorted(t for t in cited if not _resolve(t))
    assert not missing, f"PARITY.md cites nonexistent paths: {missing}"


def test_readme_and_roadmap_paths_resolve():
    for doc in [REPO / "README.md", REPO / "docs" / "ROADMAP.md"]:
        text = doc.read_text()
        cited = set(_PATH_RE.findall(text))
        missing = sorted(t for t in cited if not _resolve(t))
        assert not missing, f"{doc.name} cites nonexistent paths: {missing}"


def test_quality_gate_assertion_logic():
    """The --assert quality gate (scripts/demo_full_scale.py) enforces
    the reference's production thresholds (DEPLOYMENT.md:478-508)."""
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    from demo_full_scale import _assert_quality_gate

    # Passing case: no exit.
    _assert_quality_gate(
        {"overall_biological_score": 0.98, "mmd": 0.07}
    )
    import pytest

    with pytest.raises(SystemExit):
        _assert_quality_gate(
            {"overall_biological_score": 0.80, "mmd": 0.07}
        )
    with pytest.raises(SystemExit):
        _assert_quality_gate(
            {"overall_biological_score": 0.90, "mmd": 0.20}
        )
