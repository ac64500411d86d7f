#!/usr/bin/env python3
"""Pipeline entry point — preserves the reference CLI exactly:

    python main.py --config config/config.yaml \
        --steps download preprocess pathways train generate validate

See osteosarcoma_diffusionmodel_tpu/cli.py for the implementation.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from osteosarcoma_diffusionmodel_tpu.cli import main

if __name__ == "__main__":
    main()
