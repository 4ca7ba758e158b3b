from . import jobs, sinks

__all__ = ["jobs", "sinks"]
