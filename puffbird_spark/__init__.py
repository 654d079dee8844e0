"""puffbird-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of neuralsignal/puffbird, built Spark-first
(DataFrame/SQL/Catalyst/Structured Streaming) and designed for 100 TB scale.

Public surface mirrors the reference exports (``puffbird/__init__.py:13``:
``FrameEngine``, ``puffy_to_long``, ``CallableContainer``) plus the engine's
relational / streaming / LLM-pipeline operator modules.
"""

from .dispatch import CallableContainer
from .engine import FrameEngine
from .errors import PuffbirdSparkError
from .session import get_spark
from .shortcuts import puffy_to_long

__all__ = [
    "CallableContainer",
    "FrameEngine",
    "PuffbirdSparkError",
    "get_spark",
    "puffy_to_long",
]

__version__ = "0.1.0"
