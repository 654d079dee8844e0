"""Convenience wrappers.

Parity: reference ``puffbird/shortcuts.py:8-132`` (``puffy_to_long`` — a
module-level function delegating to ``FrameEngine.to_long``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .engine import FrameEngine


def puffy_to_long(
    table: DataFrame,
    *cols: str,
    indexcols: list[str] | None = None,
    datacols: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """``FrameEngine(table).to_long(*cols, **kwargs)`` in one call."""
    engine = FrameEngine(table, datacols=datacols, indexcols=indexcols)
    return engine.to_long(*cols, **kwargs)
