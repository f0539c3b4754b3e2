from pathtracer.sampling import rng

__all__ = ["rng"]
