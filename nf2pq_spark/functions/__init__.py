from . import flownet, text, vectors

__all__ = ["flownet", "text", "vectors"]
