from .dataset import (
    OsteosarcomaArrays,
    build_arrays,
    make_dummy_data,
    mixup,
    prepare_arrays,
    train_val_split,
)
from .gdc_loader import GDCDataLoader
from .pathways import HALLMARK_GENE_SETS, PathwayFeatures
from .preprocessor import OsteosarcomaPreprocessor

__all__ = [
    "OsteosarcomaArrays",
    "build_arrays",
    "make_dummy_data",
    "mixup",
    "prepare_arrays",
    "train_val_split",
    "GDCDataLoader",
    "HALLMARK_GENE_SETS",
    "PathwayFeatures",
    "OsteosarcomaPreprocessor",
]
