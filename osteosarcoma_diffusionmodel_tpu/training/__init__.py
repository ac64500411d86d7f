from .checkpoint import CheckpointManager, load_metadata, metadata_to_dims, save_metadata
from .trainer import EarlyStopping, PlateauLR, Trainer, build_model

__all__ = [
    "CheckpointManager",
    "load_metadata",
    "metadata_to_dims",
    "save_metadata",
    "EarlyStopping",
    "PlateauLR",
    "Trainer",
    "build_model",
]
