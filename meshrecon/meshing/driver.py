"""Standalone meshing drivers — TEST_BUILD mains of alpha_shapes.cpp:107-143
and cgal_poisson.cpp:139-167. The reference's fixtures (bunny_5000, suzanne)
are not shipped; we generate equivalent fixtures (sampled sphere / torus with
normals) when absent.

Usage: python -m meshrecon.meshing.driver alpha|poisson|greedy
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _fixture_points(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    # torus point cloud: nontrivial topology for alpha shapes
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    R, r = 1.0, 0.4
    pts = np.stack(
        [(R + r * np.cos(v)) * np.cos(u), (R + r * np.cos(v)) * np.sin(u),
         r * np.sin(v)], axis=1
    )
    normals = np.stack(
        [np.cos(v) * np.cos(u), np.cos(v) * np.sin(u), np.sin(v)], axis=1
    )
    return pts.astype(np.float32), normals.astype(np.float32)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    mode = argv[0] if argv else "alpha"
    os.makedirs("test", exist_ok=True)
    pts, normals = _fixture_points()
    from meshrecon.io.obj import Mesh, save_mesh

    if mode == "alpha":
        from meshrecon.meshing import alpha_shape_faces

        print(f"Calculating alpha shape of {len(pts)} points...")
        faces, alpha = alpha_shape_faces(pts)
        print(f"{len(faces)} faces, alpha={alpha:g}")
        verts4 = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        save_mesh(Mesh(verts4, faces), "test/torus_alpha.obj")
        print("wrote test/torus_alpha.obj")
    elif mode == "greedy":
        from meshrecon.meshing import greedy_projection

        print(f"Greedy projection triangulation of {len(pts)} points...")
        mesh = greedy_projection(pts, normals)
        print(f"{len(mesh.vertices)} vertices, {len(mesh.faces)} faces")
        save_mesh(mesh, "test/torus_greedy.obj")
        print("wrote test/torus_greedy.obj")
    else:
        from meshrecon.meshing import poisson_surface

        print(f"Running Poisson reconstruction of {len(pts)} points...")
        mesh = poisson_surface(pts, normals, grid=96)
        print(f"{len(mesh.vertices)} vertices, {len(mesh.faces)} faces")
        save_mesh(mesh, "test/torus_poisson.obj")
        print("wrote test/torus_poisson.obj")
    return 0


if __name__ == "__main__":
    sys.exit(main())
