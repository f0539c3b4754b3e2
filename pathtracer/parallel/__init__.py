from pathtracer.parallel import sharding

__all__ = ["sharding"]
