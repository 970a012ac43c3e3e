import numpy as np
import pytest

from meshrecon.meshing import alpha_shape_faces, poisson_surface
from meshrecon.meshing.poisson import _marching_tetrahedra_np, marching_tetrahedra
from meshrecon.meshing.native import marching_tetrahedra_native


def sphere_points(n, radius=1.0, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * (radius + rng.normal(scale=noise, size=(n, 1)))
    return pts.astype(np.float32), v.astype(np.float32)


def mesh_checks(verts3, faces):
    """Closed orientable surface checks + signed volume (positive = outward)."""
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    # each undirected edge appears exactly twice, once per direction
    keys = edges[:, 0].astype(np.int64) * len(verts3) + edges[:, 1]
    rkeys = edges[:, 1].astype(np.int64) * len(verts3) + edges[:, 0]
    _, counts = np.unique(
        np.minimum(keys, rkeys) * 2 + (keys < rkeys), return_counts=True
    )
    closed = np.all(counts == 1)  # every directed edge unique
    und, ucounts = np.unique(np.minimum(keys, rkeys), return_counts=True)
    manifold = np.all(ucounts == 2)
    a, b, c = verts3[faces[:, 0]], verts3[faces[:, 1]], verts3[faces[:, 2]]
    volume = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    return closed, manifold, volume


def test_alpha_sphere_closed_outward():
    pts, _ = sphere_points(400)
    faces, alpha = alpha_shape_faces(pts)
    assert len(faces) > 100
    assert alpha > 0
    closed, manifold, volume = mesh_checks(pts, faces)
    # alpha shapes may contain a few non-manifold pinch edges (true of CGAL's
    # REGULAR facets as well); demand the surface is overwhelmingly 2-manifold
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    keys = np.minimum(edges[:, 0], edges[:, 1]).astype(np.int64) * len(pts) + np.maximum(
        edges[:, 0], edges[:, 1]
    )
    _, counts = np.unique(keys, return_counts=True)
    assert np.mean(counts == 2) > 0.9
    assert volume > 0, "faces must be oriented away from the solid"
    # all faces live on the spherical shell (the alpha shape of a hollow
    # shell is a crust, so don't expect full-ball volume)
    centroids = pts[faces].mean(axis=1)
    radii = np.linalg.norm(centroids, axis=1)
    assert np.mean((radii > 0.6) & (radii < 1.05)) > 0.95


def test_alpha_homogeneous_input():
    pts, _ = sphere_points(200, seed=1)
    pts4 = np.concatenate([pts * 2.0, np.full((len(pts), 1), 2.0)], axis=1)
    f3, a3 = alpha_shape_faces(pts)
    f4, a4 = alpha_shape_faces(pts4)
    assert abs(a3 - a4) / a3 < 0.05
    assert abs(len(f3) - len(f4)) < max(10, 0.05 * len(f3))


def test_alpha_fixed_alpha():
    pts, _ = sphere_points(300, seed=2)
    _, a_opt = alpha_shape_faces(pts)
    faces, a_used = alpha_shape_faces(pts, alpha=a_opt * 2)
    assert a_used == a_opt * 2
    assert len(faces) > 0


def test_alpha_empty_and_tiny():
    f, a = alpha_shape_faces(np.zeros((0, 3), np.float32))
    assert f.shape == (0, 3)
    f, a = alpha_shape_faces(np.zeros((3, 3), np.float32))
    assert f.shape == (0, 3)


def test_marching_tetrahedra_sphere_sdf():
    g = 32
    ax = np.arange(g) - (g - 1) / 2.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = 10.0
    chi = (r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)  # >0 inside
    verts, faces = _marching_tetrahedra_np(chi, 0.0)
    assert len(faces) > 100
    closed, manifold, volume = mesh_checks(verts, faces)
    assert manifold
    center = (g - 1) / 2.0
    radii = np.linalg.norm(verts - center, axis=1)
    assert abs(radii.mean() - r) < 0.15
    # outward orientation: positive volume about the center
    a = verts[faces[:, 0]] - center
    b = verts[faces[:, 1]] - center
    c = verts[faces[:, 2]] - center
    vol = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    expected = 4 / 3 * np.pi * r**3
    assert abs(vol - expected) / expected < 0.05


def test_marching_tetrahedra_native_matches_numpy():
    g = 24
    rng = np.random.default_rng(7)
    ax = np.arange(g) - (g - 1) / 2.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    chi = (8.0 - np.sqrt(X**2 + 1.3 * Y**2 + 0.7 * Z**2)).astype(np.float32)
    ref_v, ref_f = _marching_tetrahedra_np(chi, 0.0)
    out = marching_tetrahedra_native(chi, 0.0)
    if out is None:
        pytest.skip("native meshing lib unavailable")
    nat_v, nat_f = out
    assert len(nat_f) == len(ref_f)
    assert len(nat_v) == len(ref_v)
    # same vertex sets (order may differ)
    sv = np.sort(ref_v.round(4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    nv = np.sort(nat_v.round(4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    assert np.array_equal(sv, nv)
    _, m1, vol1 = mesh_checks(ref_v, ref_f)
    _, m2, vol2 = mesh_checks(nat_v, nat_f)
    assert m1 and m2
    assert abs(vol1 - vol2) / abs(vol1) < 1e-4


def test_poisson_sphere():
    pts, normals = sphere_points(2000, radius=1.0, seed=3, noise=0.01)
    mesh = poisson_surface(pts, normals, grid=64)
    assert len(mesh.faces) > 200
    v3 = mesh.vertices[:, :3] / mesh.vertices[:, 3:4]
    closed, manifold, volume = mesh_checks(v3, mesh.faces)
    assert manifold
    radii = np.linalg.norm(v3 - v3.mean(axis=0), axis=1)
    assert abs(np.median(radii) - 1.0) < 0.15
    assert volume > 0  # outward
    expected = 4 / 3 * np.pi
    assert abs(volume - expected) / expected < 0.35


def test_meshing_extras():
    from meshrecon.meshing.extras import (
        bounding_box_size, filter_finest, estimated_normals,
        normalize_normals_average,
    )
    from meshrecon.io.obj import Mesh

    pts, true_normals = sphere_points(500, seed=5)
    assert abs(bounding_box_size(pts) - 2 * np.sqrt(3)) < 0.4

    # estimated normals align with true sphere normals (up to sign fixed by
    # an outside viewpoint)
    est = estimated_normals(pts, knn=12, viewpoint=(5.0, 0, 0))
    # viewpoint orientation only fixes the +x hemisphere reliably; check there
    sel = pts[:, 0] > 0.3
    dots = np.einsum("ni,ni->n", est[sel], true_normals[sel])
    assert np.mean(dots > 0.8) > 0.8

    verts4 = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    faces, _ = alpha_shape_faces(pts)
    mesh = Mesh(verts4, faces)
    # giant threshold keeps everything; tiny one drops everything
    assert len(filter_finest(mesh, 10.0).faces) == len(faces)
    assert len(filter_finest(mesh, 1e-6).faces) == 0

    nn = normalize_normals_average(est * 3.0)
    assert abs(np.linalg.norm(nn, axis=1).mean() - 1.0) < 1e-5


def test_decimate_vertex_clustering():
    from meshrecon.meshing.decimate import decimate_vertex_clustering
    from meshrecon.io.obj import Mesh

    pts, normals = sphere_points(4000, seed=9, noise=0.005)
    mesh = poisson_surface(pts, normals, grid=96)
    assert len(mesh.faces) > 4000
    dec = decimate_vertex_clustering(mesh, 2000)
    assert 0 < len(dec.faces) <= 2400
    # geometry preserved: decimated vertices stay near the unit sphere
    v3 = dec.vertices[:, :3] / dec.vertices[:, 3:4]
    r = np.linalg.norm(v3 - v3.mean(axis=0), axis=1)
    assert abs(np.median(r) - 1.0) < 0.2
    # no-op below the cap
    same = decimate_vertex_clustering(dec, 10**6)
    assert len(same.faces) == len(dec.faces)


def test_rbf_surface_sphere():
    from meshrecon.meshing import rbf_surface

    pts, normals = sphere_points(600, radius=1.0, seed=11, noise=0.005)
    mesh = rbf_surface(pts, normals, grid=48)
    assert len(mesh.faces) > 100
    v3 = mesh.vertices[:, :3] / mesh.vertices[:, 3:4]
    closed, manifold, volume = mesh_checks(v3, mesh.faces)
    assert manifold
    r = np.linalg.norm(v3 - v3.mean(axis=0), axis=1)
    assert abs(np.median(r) - 1.0) < 0.1
    assert volume > 0  # outward orientation


def test_keep_supported_components():
    from meshrecon.meshing.components import keep_supported_components
    from meshrecon.io.obj import Mesh

    pts, normals = sphere_points(1500, seed=13, noise=0.01)
    mesh = poisson_surface(pts, normals, grid=64)
    # graft a fake detached sheet far away
    far = mesh.vertices.copy()
    far[:, 0] += 50.0
    grafted = Mesh(np.concatenate([mesh.vertices, far]),
                   np.concatenate([mesh.faces,
                                   mesh.faces + len(mesh.vertices)]))
    cleaned = keep_supported_components(grafted, pts)
    assert len(cleaned.faces) == len(mesh.faces)
    v3 = cleaned.vertices[:, :3] / cleaned.vertices[:, 3:4]
    assert np.abs(v3[:, 0]).max() < 10.0  # the far sheet is gone


def test_trim_unsupported_faces_hemisphere():
    """Partial-coverage hallucination cure (SPSR --trim analog): Poisson
    closes a hemisphere cloud into a full blob; the support trim must cut
    the data-free half while keeping the supported one."""
    from meshrecon.meshing.components import trim_unsupported_faces
    from meshrecon.meshing.poisson import robust_grid_frame

    # mesh from the FULL sphere, support cloud from ONE hemisphere: the
    # lower half is then unsupported-by-data by construction (the pipeline
    # case: Poisson closes the unseen side of koule's camera arc)
    pts, normals = sphere_points(4000, radius=1.0, seed=7, noise=0.01)
    mesh = poisson_surface(pts, normals, grid=64)
    support = pts[pts[:, 2] > 0.05]
    v3 = mesh.vertices[:, :3] / mesh.vertices[:, 3:4]
    cz = v3[mesh.faces].mean(axis=1)[:, 2]
    assert (cz < -0.3).sum() > 0

    _, scale = robust_grid_frame(support, 64)
    trimmed = trim_unsupported_faces(mesh, support, 3.0 / scale)
    t3 = trimmed.vertices[:, :3] / trimmed.vertices[:, 3:4]
    tz = t3[trimmed.faces].mean(axis=1)[:, 2]
    assert len(trimmed.faces) > 100, "supported hemisphere must survive"
    assert (tz < -0.3).sum() == 0, "unsupported closure must be trimmed"
    # the supported cap keeps its geometry
    radii = np.linalg.norm(t3 - np.zeros(3), axis=1)
    assert abs(np.median(radii) - 1.0) < 0.15


def test_greedy_projection_sphere():
    """Greedy projection (pcl.cpp:247-280 counterpart) stitches a dense
    sphere cloud into a surface whose vertices ARE the input points."""
    from meshrecon.meshing import greedy_projection

    pts, normals = sphere_points(1200, radius=1.0, seed=21, noise=0.0)
    mesh = greedy_projection(pts, normals)
    assert len(mesh.faces) > 400
    # vertices are exactly the input cloud (greedy keeps points verbatim)
    np.testing.assert_allclose(
        mesh.vertices[:, :3], np.asarray(pts, np.float32)[:, :3]
        if np.asarray(pts).shape[1] == 4 else np.asarray(pts, np.float32),
        rtol=1e-6)
    soup = mesh.triangle_soup
    # edge-length constraint: no edge exceeds the auto search radius
    e = np.concatenate([
        np.linalg.norm(soup[:, 1] - soup[:, 0], axis=1),
        np.linalg.norm(soup[:, 2] - soup[:, 1], axis=1),
        np.linalg.norm(soup[:, 0] - soup[:, 2], axis=1)])
    from scipy.spatial import cKDTree
    d, _ = cKDTree(np.asarray(pts)).query(np.asarray(pts), k=2)
    assert e.max() <= 2.5 * np.median(d[:, 1]) + 1e-6
    # faces oriented outward along the sphere normals
    fn = np.cross(soup[:, 1] - soup[:, 0], soup[:, 2] - soup[:, 1])
    ctr = soup.mean(axis=1)
    assert np.mean(np.einsum("ij,ij->i", fn, ctr) > 0) > 0.95
    # most input points participate in the surface
    used = np.unique(mesh.faces)
    assert len(used) > 0.7 * len(pts)


def test_greedy_projection_degenerate():
    from meshrecon.meshing import greedy_projection

    m = greedy_projection(np.zeros((2, 3), np.float32))
    assert len(m.faces) == 0
