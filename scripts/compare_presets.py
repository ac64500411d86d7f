#!/usr/bin/env python3
"""Side-by-side comparison of the candidate production presets.

Reads the committed full-scale demo artifacts (each produced by
scripts/demo_full_scale.py at n=400 / 62 genes / 600 epochs unless
noted) and prints one row per validation metric, so the production
preset decision (config.yaml defaults) has its evidence in one place:

  DEMO_N400.json      copula_joint calibration, no AR head (round 3)
  DEMO_AR_RAW.json    AR mutation head, calibrate_marginals=false
  DEMO_AR_JOINT.json  AR mutation head + copula_joint continuous block

Usage: python scripts/compare_presets.py [extra.json ...]
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Each preset may have a CPU-hedge artifact (produced during axon
# tunnel outages; same pipeline/metrics, different timings — the JSON
# carries a "platform" stamp). The newest existing artifact wins: a
# fresh post-fix CPU run outranks a stale pre-fix TPU one, and vice
# versa once the TPU queue refreshes it.
DEFAULT_FILES = [
    ("copula_joint (no AR)", ["DEMO_N400.json"]),
    ("AR raw", ["DEMO_AR_RAW.json", "DEMO_AR_RAW_CPU.json"]),
    ("AR + copula_joint", ["DEMO_AR_JOINT.json", "DEMO_AR_JOINT_CPU.json"]),
]

KEY_METRICS = [
    "overall_biological_score",
    "cooccurrence_pattern_correlation",
    "pathway_coherence_correlation",
    "mutation_frequency_correlation",
    "mutual_exclusivity_violation_rate",
    "mutation_expression_violation_rate",
    "mmd",
    "ks_matched_fraction_significant",
    "nn_distance_ratio",
    "duplicate_rate",
]


def main():
    cols = []
    for label, names in DEFAULT_FILES:
        existing = [REPO / n for n in names if (REPO / n).exists()]
        if not existing:
            continue
        p = max(existing, key=lambda q: q.stat().st_mtime)
        d = json.loads(p.read_text())
        plat = d.get("platform")
        if plat and plat not in ("tpu", "axon"):
            label = f"{label} [{plat}]"
        cols.append((label, d))
    for extra in sys.argv[1:]:
        cols.append((Path(extra).stem, json.loads(Path(extra).read_text())))
    if not cols:
        sys.exit("no demo artifacts found")

    w = max(len(m) for m in KEY_METRICS) + 2
    header = "metric".ljust(w) + "".join(
        f"{label:>24}" for label, _ in cols
    )
    print(header)
    print("-" * len(header))
    for m in KEY_METRICS:
        row = m.ljust(w)
        for _, d in cols:
            v = d.get("validation", {}).get(m)
            row += f"{v:>24.4f}" if v is not None else f"{'-':>24}"
        print(row)
    for aux in ("n_samples", "train_epochs", "train_sec", "generate_10k_sec"):
        row = aux.ljust(w)
        for _, d in cols:
            v = d.get(aux)
            row += f"{v:>24.1f}" if isinstance(v, float) else f"{v!s:>24}"
        print(row)


if __name__ == "__main__":
    main()
