from .validate import validate_stream, windowed_stats_stream, drift_state_stream

__all__ = ["validate_stream", "windowed_stats_stream", "drift_state_stream"]
