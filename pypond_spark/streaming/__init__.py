"""Structured Streaming mirror of the batch operators."""

from .push import PushStream
from .stream import (StreamPipeline, run_available_now, stream_align,
                     stream_distinct_counts, stream_cusum,
                     stream_cumulative, stream_ewma, stream_exact_dedup,
                     stream_fill, stream_fill_pad, stream_gaps, stream_holt,
                     stream_holt_winters,
                     stream_rate, stream_rolling, stream_sessions,
                     stream_throttle, stream_transitions,
                     stream_zscore, windowed_stream_aggregate)

__all__ = ["PushStream", "StreamPipeline", "windowed_stream_aggregate",
           "stream_rate", "stream_align", "stream_fill", "stream_fill_pad",
           "stream_exact_dedup", "stream_ewma", "stream_gaps", "stream_holt",
           "stream_holt_winters",
           "stream_cumulative", "stream_cusum", "stream_distinct_counts",
           "stream_rolling",
           "stream_sessions", "stream_throttle", "stream_transitions",
           "stream_zscore", "run_available_now"]
