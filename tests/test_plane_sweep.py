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


def test_batched_sweep_matches_single():
    """plane_sweep_depth_batched must equal per-camera plane_sweep_depth
    (it is the iteration-1 production path via fused_sweep_update_batched)."""
    from meshrecon.depth.plane_sweep import plane_sweep_depth_batched

    h, w = 48, 64
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    fm0 = np.kron(base, np.ones((8, 8), np.float32))
    fm1 = np.roll(fm0, 4, axis=1)
    mains = np.stack([make_camera(eye=(0, 0, 0), near=1.0, far=30.0),
                      make_camera(eye=(0.2, 0.1, 0), near=1.0, far=30.0)])
    sides = np.stack([
        np.stack([make_camera(eye=(0.8, 0.2, 0), near=1.0, far=30.0),
                  make_camera(eye=(-0.6, -0.4, 0), near=1.0, far=30.0)]),
        np.stack([make_camera(eye=(1.0, 0.0, 0), near=1.0, far=30.0),
                  make_camera(eye=(-0.5, 0.5, 0), near=1.0, far=30.0)]),
    ])
    fms = np.stack([fm0, fm1])
    fss = np.stack([np.stack([np.roll(f, 3 * i + 1, axis=1)
                              for i in range(2)]) for f in fms])
    sv = np.ones((2, 2), bool)
    zlo = np.array([-0.9, -0.8], np.float32)
    zhi = np.array([0.4, 0.5], np.float32)

    outb = plane_sweep_depth_batched(fms, fss, mains, sides, sv, zlo, zhi,
                                     num_depths=10)
    for i in range(2):
        ref = plane_sweep_depth(fms[i], fss[i], mains[i], sides[i], sv[i],
                                float(zlo[i]), float(zhi[i]), num_depths=10)
        np.testing.assert_array_equal(np.asarray(outb["valid"])[i],
                                      np.asarray(ref["valid"]))
        sel = np.asarray(ref["valid"])
        np.testing.assert_allclose(np.asarray(outb["depth"])[i][sel],
                                   np.asarray(ref["depth"])[sel],
                                   rtol=1e-5, atol=1e-5)


def test_fused_sweep_update_matches_host_path(tmp_path):
    """fused_sweep_update_batched (one program) must agree with the unfused
    per-camera plane-sweep path (_process_main_plane_sweep) on real scene
    fixtures — same visibility weights, z-range rule, back-projection."""
    import jax.numpy as jnp

    from meshrecon.io.tracks import load_tracks
    from meshrecon.io.synthetic import synthetic_frames
    from meshrecon.pipeline.config import Config
    from meshrecon.pipeline.heuristic import Heuristic
    from meshrecon.pipeline.fused import fused_sweep_update_batched
    from meshrecon.pipeline.reconstruct import (_process_main_plane_sweep,
                                                _bucket)
    from meshrecon.geometry.camera import np_extract_camera_center
    from meshrecon.raster import Renderer
    from meshrecon.utils.profiling import StageTimer

    track = load_tracks("tracks/koule-tr.yaml")
    w, h = 80, 60
    frames = synthetic_frames(track, w, h, mode="sphere", seed=0)
    cfg = Config(track=track, frames=frames, seed=3, sweep_depths=24)
    hint = Heuristic(cfg)
    hint.not_happy(track.bundles)
    mesh = hint.tessellate(track.bundles, np.zeros((len(track.bundles), 3)))
    r = Renderer(w, h)
    r.load_mesh(mesh)

    bundles = [(0, [5, 12]), (8, [2, 20])]
    kb = _bucket(2)
    cb = _bucket(kb + 1)
    B = len(bundles)
    mains = np.zeros((B, 4, 4), np.float32)
    fms = np.zeros((B, h, w), np.float32)
    scs = np.tile(np.eye(4, dtype=np.float32), (B, kb, 1, 1))
    sfs = np.zeros((B, kb, h, w), np.float32)
    svs = np.zeros((B, kb), bool)
    ctrs = np.zeros((B, cb, 3), np.float32)
    cvs = np.zeros((B, cb), bool)
    ks = np.zeros(B, np.int32)
    for b, (fa, sides) in enumerate(bundles):
        mains[b] = cfg.camera(fa)
        fms[b] = cfg.frame(fa)
        for i, fb in enumerate(sides):
            scs[b, i] = cfg.camera(fb)
            sfs[b, i] = cfg.frame(fb)
            svs[b, i] = True
        ctr = [np_extract_camera_center(cfg.camera(fa))] + [
            np_extract_camera_center(cfg.camera(fb)) for fb in sides]
        c3 = np.stack([c[:3] / c[3] for c in ctr]).astype(np.float32)
        ctrs[b, : len(c3)] = c3
        cvs[b, : len(c3)] = True
        ks[b] = len(sides)

    out = fused_sweep_update_batched(
        r.soup, r.soup_valid, mains, fms, scs, sfs, svs, ctrs, cvs,
        jnp.asarray(ks), height=h, width=w, num_depths=24)

    timer = StageTimer(enabled=False)
    for b, (fa, sides) in enumerate(bundles):
        depth = r.depth(cfg.camera(fa))
        pts_ref, nrm_ref, n_ref = _process_main_plane_sweep(
            cfg, r, fa, sides, depth, timer)
        vb = np.asarray(out["valid"])[b]
        assert abs(int(vb.sum()) - n_ref) <= max(5, 0.02 * max(n_ref, 1)), \
            f"bundle {b}: {int(vb.sum())} vs {n_ref} valid"
        pts_b = np.asarray(out["point4"])[b][vb]
        # compare medians (masks may differ at a handful of border pixels)
        if n_ref and vb.any():
            np.testing.assert_allclose(
                np.median(pts_b[:, :3] / pts_b[:, 3:4], axis=0),
                np.median(pts_ref[:, :3] / pts_ref[:, 3:4], axis=0),
                rtol=0.05, atol=0.05)
