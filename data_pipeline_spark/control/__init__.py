from .completeness import source_completeness

__all__ = ["source_completeness"]
