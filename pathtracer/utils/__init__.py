from pathtracer.utils import vmath

__all__ = ["vmath"]
