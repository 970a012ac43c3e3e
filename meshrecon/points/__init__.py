from meshrecon.points.filter import filter_points, density_scores, build_half_edges

__all__ = ["filter_points", "density_scores", "build_half_edges"]
