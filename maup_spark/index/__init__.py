from .cells import CellGrid

__all__ = ["CellGrid"]
