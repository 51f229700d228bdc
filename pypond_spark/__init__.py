"""pypond_spark — a PySpark-native timeseries analytics engine.

Re-implements the query and data-processing capabilities of esnet/pypond
(immutable events, collections, time windows, push-based processor chains)
as lazy Spark DataFrame plans: Catalyst owns optimization, window functions
own the order-dependent operators, Structured Streaming owns stream mode.
"""

from .series import TimeSeries
from .timerange import TimeRange
from .index_class import Index
from .session import get_spark
from .plans import Pipeline

__all__ = ["TimeSeries", "TimeRange", "Index", "Pipeline", "get_spark"]
__version__ = "0.3.0"
