from .server import GenerationService, serve

__all__ = ["GenerationService", "serve"]
