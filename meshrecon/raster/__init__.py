from meshrecon.raster.rasterizer import (
    clip_triangles_near,
    render_depth,
    depth_probe,
    Renderer,
)
from meshrecon.raster.fragment import projected_image, mix_background, dilate3x3_max

__all__ = [
    "clip_triangles_near",
    "render_depth",
    "depth_probe",
    "Renderer",
    "projected_image",
    "mix_background",
    "dilate3x3_max",
]
