"""Binned Pallas rasterizer vs the XLA brute-force path."""

import numpy as np

import __graft_entry__ as g
from meshrecon.raster.rasterizer import render_depth
from meshrecon.raster.binned import render_depth_binned, morton_order


def _soup(n_tris_cap=1024):
    soup = g._sphere_soup(n_theta=16, n_phi=16)
    t = len(soup)
    cap = max(n_tris_cap, t)
    pad = np.zeros((cap, 3, 3), np.float32)
    pad[:t] = soup
    valid = np.zeros(cap, bool)
    valid[:t] = True
    return pad, valid


def test_matches_xla_render():
    soup, valid = _soup()
    cam = g._make_camera(eye=(0.3, 0.2, 0.5))
    h, w = 96, 160
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    out = np.asarray(render_depth_binned(cam, soup, valid, h, w,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_matches_with_morton_sort():
    soup, valid = _soup()
    order = morton_order(soup)
    soup_sorted = soup[order]
    valid_sorted = valid[order]
    cam = g._make_camera(eye=(0.0, 0.0, 0.0))
    h, w = 64, 128
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    out = np.asarray(render_depth_binned(cam, soup_sorted, valid_sorted,
                                         h, w, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_empty_soup_is_background():
    soup = np.zeros((128, 3, 3), np.float32)
    valid = np.zeros(128, bool)
    cam = g._make_camera()
    out = np.asarray(render_depth_binned(cam, soup, valid, 32, 128,
                                         interpret=True))
    np.testing.assert_array_equal(out, np.ones((32, 128), np.float32))


def test_multi_slab():
    """Soups above SLAB capacity split and min-combine correctly."""
    import meshrecon.raster.binned as rb

    soup, valid = _soup(n_tris_cap=rb.SLAB + 512)  # forces 2 slabs
    cam = g._make_camera(eye=(0.1, -0.1, 0.2))
    h, w = 48, 128
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    out = np.asarray(render_depth_binned(cam, soup, valid, h, w,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_two_level_matches_xla_render():
    """Superchunk lists + scalar-core chunk/triangle skips (pl.when) must
    not change a single pixel vs the brute XLA path."""
    soup, valid = _soup()
    order = morton_order(soup)
    cam = g._make_camera(eye=(0.3, 0.2, 0.5))
    h, w = 96, 160
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    out = np.asarray(render_depth_binned(cam, soup[order], valid[order], h, w,
                                         interpret=True, two_level=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_two_level_multi_slab():
    import meshrecon.raster.binned as rb

    soup, valid = _soup(n_tris_cap=rb.SLAB + 512)
    cam = g._make_camera(eye=(0.1, -0.1, 0.2))
    h, w = 48, 128
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    out = np.asarray(render_depth_binned(cam, soup, valid, h, w,
                                         interpret=True, two_level=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_tile_h16_matches_xla_render(monkeypatch):
    """MESHRECON_RASTER_TILE_H=16 (half the grid steps) must stay bit-exact
    vs the brute XLA path — the knob only retiles the image grid."""
    import jax

    import meshrecon.raster.binned as rb
    from meshrecon.raster.binned import render_depth_binned_batched

    soup, valid = _soup()
    order = morton_order(soup)
    soup, valid = soup[order], valid[order]
    cam = g._make_camera(eye=(0.3, 0.2, 0.5))
    h, w = 96, 160
    ref = np.asarray(render_depth(cam, soup, valid, h, w))
    monkeypatch.setattr(rb, "TILE_H", 16)
    jax.clear_caches()  # TILE_H is baked into existing traces
    try:
        out = np.asarray(render_depth_binned(cam, soup, valid, h, w,
                                             interpret=True, two_level=True))
        outb = np.asarray(render_depth_binned_batched(
            cam[None], soup, valid, h, w, interpret=True))
    finally:
        jax.clear_caches()
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
    np.testing.assert_allclose(outb[0], ref, rtol=0, atol=1e-5)


def test_batched_matches_xla_render():
    """Camera-batched two-level kernel: per-camera prefetch-table rows must
    be selected by the camera grid index (a regression here once read every
    camera's triangles from row 0)."""
    from meshrecon.raster.binned import render_depth_binned_batched

    soup, valid = _soup()
    order = morton_order(soup)
    soup, valid = soup[order], valid[order]
    cams = np.stack([g._make_camera(eye=e)
                     for e in [(0.3, 0.2, 0.5), (0.0, 0.0, 0.0),
                               (-0.2, 0.1, 0.3), (0.1, 0.4, -0.2)]])
    h, w = 96, 160
    out = np.asarray(render_depth_binned_batched(cams, soup, valid, h, w,
                                                 interpret=True))
    for i in range(len(cams)):
        ref = np.asarray(render_depth(cams[i], soup, valid, h, w))
        np.testing.assert_allclose(out[i], ref, rtol=0, atol=1e-5)
