import numpy as np
import jax.numpy as jnp

from meshrecon.geometry import (
    dehomogenize,
    extract_camera_center,
    camera_to_screen,
    project_points,
    ndc_to_pixel,
    pixel_to_ndc,
    pixel_grid_ndc,
)
from meshrecon.geometry.camera import np_extract_camera_center, homogenize


def make_camera(fov=1.1, aspect=0.75, near=1.0, far=20.0, eye=(0, 0, 5)):
    """Blender-style projection * inverse-extrinsics * zflip
    (io_export_tracks.py:22-28)."""
    f = 1.0 / np.tan(fov / 2.0)
    proj = np.array(
        [
            [f, 0, 0, 0],
            [0, f / aspect, 0, 0],
            [0, 0, (near + far) / (near - far), 2 * near * far / (near - far)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )
    world_to_cam = np.eye(4, dtype=np.float32)
    world_to_cam[:3, 3] = -np.asarray(eye, dtype=np.float32)
    return proj @ world_to_cam


def test_dehomogenize():
    pts = np.array([[2.0, 4.0, 6.0, 2.0], [1.0, 1.0, 1.0, 1.0]])
    out = np.asarray(dehomogenize(pts))
    np.testing.assert_allclose(out, [[1, 2, 3], [1, 1, 1]], rtol=1e-6)


def test_extract_camera_center_recovers_eye():
    eye = (1.5, -2.0, 7.0)
    cam = make_camera(eye=eye)
    c = np.asarray(extract_camera_center(cam))
    c3 = c[:3] / c[3]
    np.testing.assert_allclose(c3, eye, atol=1e-4)
    c_np = np_extract_camera_center(cam)
    np.testing.assert_allclose(c_np[:3] / c_np[3], eye, atol=1e-4)


def test_camera_center_projects_to_w_zero():
    cam = make_camera(eye=(0.3, 0.4, 3.0))
    c = np.asarray(extract_camera_center(cam))
    p = cam @ c
    # rows 0,1,3 of camera annihilate the center (util.cpp:33-41)
    assert abs(p[0]) < 1e-4 and abs(p[1]) < 1e-4 and abs(p[3]) < 1e-4


def test_project_points_center_of_view():
    cam = make_camera(eye=(0, 0, 5))
    pts = homogenize(np.array([[0.0, 0.0, 0.0]], dtype=np.float32))
    ndc = np.asarray(project_points(cam, pts))
    np.testing.assert_allclose(ndc[0, :2], [0.0, 0.0], atol=1e-6)
    assert -1 <= ndc[0, 2] <= 1


def test_distortion_identity_when_zero():
    pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(camera_to_screen(pts, [0.0, 0.0, 0.0], 0.75))
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_distortion_matches_reference_formula():
    pts = np.array([[0.5, -0.25, 0.1]], dtype=np.float32)
    k1, k2, aspect = -0.19, 0.18, 0.75
    r2 = (0.5**2 + (0.25 * aspect) ** 2) / 4
    k = 1 + r2 * (k1 + r2 * k2)
    out = np.asarray(camera_to_screen(pts, [k1, k2, 0.0], aspect))
    np.testing.assert_allclose(out, pts * k, rtol=1e-6)


def test_pixel_ndc_roundtrip():
    w, h = 640, 480
    col, row = 123.0, 456.0
    x, y = pixel_to_ndc(col, row, w, h)
    c2, r2 = ndc_to_pixel(x, y, w, h)
    assert abs(c2 - col) < 1e-4 and abs(r2 - row) < 1e-4
    # top-left pixel has y near +1
    x0, y0 = pixel_to_ndc(0, 0, w, h)
    assert y0 > 0.99 and x0 < -0.99


def test_pixel_grid_matches_scalar():
    gx, gy = pixel_grid_ndc(8, 6)
    x, y = pixel_to_ndc(3, 2, 8, 6)
    assert abs(float(gx[2, 3]) - x) < 1e-6
    assert abs(float(gy[2, 3]) - y) < 1e-6
