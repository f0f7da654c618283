from .api import coerce_increasing_time, exist_reversed_time

__all__ = ["coerce_increasing_time", "exist_reversed_time"]
