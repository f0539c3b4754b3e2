from pathtracer.bench import harness

__all__ = ["harness"]
