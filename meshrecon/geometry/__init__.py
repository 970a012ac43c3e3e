from meshrecon.geometry.camera import (
    dehomogenize,
    extract_camera_center,
    camera_to_screen,
    project_points,
    ndc_to_pixel,
    pixel_to_ndc,
    pixel_grid_ndc,
)

__all__ = [
    "dehomogenize",
    "extract_camera_center",
    "camera_to_screen",
    "project_points",
    "ndc_to_pixel",
    "pixel_to_ndc",
    "pixel_grid_ndc",
]
