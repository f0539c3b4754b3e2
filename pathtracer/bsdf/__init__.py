from pathtracer.bsdf import microfacet

__all__ = ["microfacet"]
