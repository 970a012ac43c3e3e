from meshrecon.io.tracks import TrackFile, load_tracks
from meshrecon.io.obj import read_mesh, save_mesh, Mesh
from meshrecon.io.images import save_image

__all__ = ["TrackFile", "load_tracks", "read_mesh", "save_mesh", "Mesh", "save_image"]
