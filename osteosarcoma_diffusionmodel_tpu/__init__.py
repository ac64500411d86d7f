"""TPU-native framework for synthetic osteosarcoma patient generation.

A ground-up JAX/Flax/pjit/Pallas re-design with the capabilities of
rare-resilience-ai/Osteosarcoma_DiffusionModel: conditional DDPM and
cVAE generative models over flat [mutations | expression | pathways]
patient vectors, a 6-step CLI pipeline
(download -> preprocess -> pathways -> train -> generate -> validate),
biological constraint losses, and an on-device statistical validation
suite — built TPU-first (scan-compiled samplers, mesh-sharded cohort
generation, MXU-friendly matmuls, Pallas kernels for the hot
statistics).
"""

__version__ = "0.1.0"

from .config import Config, FrozenDims

__all__ = ["Config", "FrozenDims", "__version__"]
