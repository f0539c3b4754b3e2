from pathtracer.integrator import camera, path, sky

__all__ = ["camera", "path", "sky"]
