from .generator import SyntheticPatientGenerator, load_trained_model

__all__ = ["SyntheticPatientGenerator", "load_trained_model"]
