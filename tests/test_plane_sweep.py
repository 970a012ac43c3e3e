import numpy as np
import jax.numpy as jnp

from meshrecon.depth.plane_sweep import plane_sweep_depth
from meshrecon.io.synthetic import _render_sphere_frames
from tests.test_geometry import make_camera
from tests.test_depth import plane_depth_map


def test_plane_sweep_recovers_plane():
    """Textured plane scene: sweep must localize the true plane depth."""
    h, w = 48, 64
    z_true = -5.0
    main = make_camera(eye=(0, 0, 0), near=1.0, far=30.0)
    sides = [
        make_camera(eye=(1.0, 0, 0), near=1.0, far=30.0),
        make_camera(eye=(-1.0, 0.5, 0), near=1.0, far=30.0),
        make_camera(eye=(0.5, -0.8, 0), near=1.0, far=30.0),
    ]
    true_depth = plane_depth_map(main, z_true, h, w)
    main_inv = np.linalg.inv(main.astype(np.float64))

    # world-texture rendering for all cameras: intensity = f(world point)
    def render(cam):
        depth = plane_depth_map(cam, z_true, h, w)
        inv = np.linalg.inv(cam.astype(np.float64))
        img = np.zeros((h, w), np.float32)
        for r in range(h):
            for c in range(w):
                if depth[r, c] == 1.0:
                    continue
                x = (c - w / 2.0) * 2.0 / w
                y = (h / 2.0 - r) * 2.0 / h
                p = inv @ np.array([x, y, depth[r, c], 1.0])
                p = p[:3] / p[3]
                img[r, c] = (
                    120 + 60 * np.sin(3.0 * p[0]) * np.cos(2.5 * p[1])
                    + 40 * np.sin(7.0 * p[0] + 5.0 * p[1])
                )
        return img

    fm = render(main)
    fs = np.stack([render(s) for s in sides])

    zlo = float(true_depth[true_depth < 1].min()) - 0.05
    zhi = float(true_depth[true_depth < 1].max()) + 0.05
    out = plane_sweep_depth(fm, fs, main, np.stack(sides), np.ones(3, bool),
                            zlo, zhi, num_depths=48)
    depth = np.asarray(out["depth"])
    valid = np.asarray(out["valid"])
    interior = np.zeros((h, w), bool)
    interior[6:-6, 6:-6] = True
    sel = valid & interior & (true_depth < 1.0)
    assert sel.mean() > 0.3
    err = np.abs(depth[sel] - true_depth[sel])
    assert np.median(err) < 0.01, f"median NDC depth err {np.median(err)}"


def test_plane_sweep_invalid_without_views():
    h, w = 16, 24
    main = make_camera(eye=(0, 0, 0), near=1.0, far=30.0)
    # side cameras looking away: nothing projects in frame
    side = make_camera(eye=(100, 0, 0), near=1.0, far=30.0)
    fm = np.random.default_rng(0).uniform(0, 255, (h, w)).astype(np.float32)
    fs = fm[None]
    out = plane_sweep_depth(fm, fs, main, side[None], np.ones(1, bool),
                            -0.9, 0.9, num_depths=8)
    assert not np.asarray(out["valid"]).any()


def test_plane_sweep_pallas_matches_xla():
    """The tile-warp sampling engine (the TPU path) must agree with the XLA
    gather path: each depth plane's coordinate field is a smooth projective
    map, squarely inside the kernel's residual budget."""
    h, w = 64, 256  # at least one full (8, 128) tile grid
    z_true = -5.0
    main = make_camera(eye=(0, 0, 0), near=1.0, far=30.0)
    sides = [
        make_camera(eye=(0.8, 0.2, 0), near=1.0, far=30.0),
        make_camera(eye=(-0.6, -0.4, 0), near=1.0, far=30.0),
    ]
    rng = np.random.default_rng(5)
    # smooth random texture (piecewise-constant noise upsampled)
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    fm = np.kron(base, np.ones((8, 8), np.float32))
    fs = np.stack([np.roll(fm, (3 * i + 1, 5 * i + 2), axis=(0, 1))
                   for i in range(2)])

    args = (fm, fs, main, np.stack(sides), np.ones(2, bool), -0.9, 0.4)
    out_x = plane_sweep_depth(*args, num_depths=12, engine="xla")
    out_p = plane_sweep_depth(*args, num_depths=12, engine="pallas",
                              interpret=True)
    vx = np.asarray(out_x["valid"])
    vp = np.asarray(out_p["valid"])
    assert (vx == vp).mean() > 0.99
    sel = vx & vp
    dx = np.asarray(out_x["depth"])[sel]
    dp = np.asarray(out_p["depth"])[sel]
    # identical plane selection except at isolated cost ties
    assert np.mean(np.abs(dx - dp) < 1e-4) > 0.98
    cx = np.asarray(out_x["cost"])[sel]
    cp = np.asarray(out_p["cost"])[sel]
    np.testing.assert_allclose(np.median(np.abs(cx - cp)), 0.0, atol=0.5)
