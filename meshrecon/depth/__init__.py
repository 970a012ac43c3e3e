from meshrecon.depth.triangulate import triangulate_pixels
from meshrecon.depth.normals import estimate_normals

__all__ = ["triangulate_pixels", "estimate_normals"]
