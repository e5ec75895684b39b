from .incremental import IncrementalSketchBuilder, windowed_distinct_stream

__all__ = ["IncrementalSketchBuilder", "windowed_distinct_stream"]
