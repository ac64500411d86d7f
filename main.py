#!/usr/bin/env python3
"""Pipeline entry point — preserves the reference CLI exactly:

    python main.py --config config/config.yaml \
        --steps download preprocess pathways train generate validate

See osteosarcoma_diffusionmodel_tpu/cli.py for the implementation.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("OSDM_FORCE_CPU"):
    # Honor an explicit CPU pin even on machines whose sitecustomize
    # force-registers an accelerator platform at interpreter start
    # (which silently overrides the env var): re-pin via jax.config
    # before any backend initialization. Keeps CPU-pinned subprocess
    # runs (tests, CI) hermetic when the accelerator is unreachable.
    import jax

    jax.config.update("jax_platforms", "cpu")

from osteosarcoma_diffusionmodel_tpu.cli import main

if __name__ == "__main__":
    main()
