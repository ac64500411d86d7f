from .constraints import ConstraintSpec, constraint_losses
from .cvae import BiologyConstrainedVAE, ConditionalVAEModule
from .diffusion import ConditionalDiffusion
from .networks import (
    ConditionEmbedding,
    DenoiserBlock,
    DiffusionDenoiser,
    SurvivalHead,
    TimeEmbedding,
)

__all__ = [
    "ConstraintSpec",
    "constraint_losses",
    "BiologyConstrainedVAE",
    "ConditionalVAEModule",
    "ConditionalDiffusion",
    "ConditionEmbedding",
    "DenoiserBlock",
    "DiffusionDenoiser",
    "SurvivalHead",
    "TimeEmbedding",
]
