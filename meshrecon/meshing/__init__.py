from meshrecon.meshing.alpha import alpha_shape_faces
from meshrecon.meshing.poisson import poisson_surface
from meshrecon.meshing.rbf import rbf_surface
from meshrecon.meshing.greedy import greedy_projection

__all__ = ["alpha_shape_faces", "poisson_surface", "rbf_surface",
           "greedy_projection"]
