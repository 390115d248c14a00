from .lineage import StageRunner

__all__ = ["StageRunner"]
