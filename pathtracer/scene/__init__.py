from pathtracer.scene.types import Scene, Bvh
from pathtracer.scene.build import SceneBuilder, MaterialDesc

__all__ = ["Scene", "Bvh", "SceneBuilder", "MaterialDesc"]
