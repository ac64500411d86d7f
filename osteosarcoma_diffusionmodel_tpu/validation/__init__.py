from .validator import BiologicalValidator

__all__ = ["BiologicalValidator"]
