from . import asof, dedup, similarity

__all__ = ["asof", "dedup", "similarity"]
