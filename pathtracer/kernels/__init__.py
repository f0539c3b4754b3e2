from pathtracer.kernels import intersect

__all__ = ["intersect"]
