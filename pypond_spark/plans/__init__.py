"""Query-plan layer: the fluent Pipeline API over lazy DataFrame chains."""

from .pipeline import Pipeline

__all__ = ["Pipeline"]
