import numpy as np
import jax.numpy as jnp

from meshrecon.depth import triangulate_pixels, estimate_normals
from meshrecon.depth.triangulate import sobel_gradient
from meshrecon.geometry.camera import np_extract_camera_center
from tests.test_geometry import make_camera


# ---------------------------------------------------------------------------
# scalar float64 reference of the triangulation semantics (independent of the
# vectorized implementation; per SURVEY.md section 4's per-kernel CPU
# reference strategy)
# ---------------------------------------------------------------------------
def scalar_triangulate(flows, main_cam, side_cams, depth, gn_iters=50):
    k, h, w = flows.shape[0], depth.shape[0], depth.shape[1]
    main_inv = np.linalg.inv(main_cam.astype(np.float64))
    cms = [c.astype(np.float64) @ main_inv for c in side_cams]
    gx, gy = np.asarray(sobel_gradient(depth))
    sx, sy = 2.0 / w, 2.0 / h

    def good(col, row):
        c0, r0 = int(np.floor(col)), int(np.floor(row))
        if c0 < 1 or c0 >= w - 1 or r0 < 1 or r0 >= h - 1:
            return False
        return all(
            depth[r0 + dr, c0 + dc] != 1.0 for dr in (0, 1) for dc in (0, 1)
        )

    def bilin(img, col, row):
        c0, r0 = int(np.floor(col)), int(np.floor(row))
        c0 = min(max(c0, 0), w - 2)
        r0 = min(max(r0, 0), h - 2)
        fc, fr = col - c0, row - r0
        return (
            img[r0, c0] * (1 - fr) * (1 - fc)
            + img[r0, c0 + 1] * (1 - fr) * fc
            + img[r0 + 1, c0] * fr * (1 - fc)
            + img[r0 + 1, c0 + 1] * fr * fc
        )

    points = np.zeros((h, w, 4))
    pdfs = np.zeros((h, w))
    valids = np.zeros((h, w), bool)
    for r in range(h):
        for c in range(w):
            if depth[r, c] == 1.0:
                continue
            x = (c - w / 2.0) * sx
            y = (h / 2.0 - r) * sy
            meas, icovs = [], []
            ok = True
            for i in range(k):
                fx, fy, var = flows[i, r, c, 0], flows[i, r, c, 1], flows[i, r, c, 2]
                var = max(var, 1e-12)
                fc_, fr_ = c + fx, r + fy
                g = good(fc_, fr_)
                z = bilin(depth, fc_, fr_) if g else depth[r, c]
                pt = cms[i] @ np.array([x + fx * sx, y + fy * sy, z, 1.0])
                mw = pt[3]
                gvec = (
                    np.array([bilin(gx, fc_, fr_), bilin(gy, fc_, fr_)])
                    if g
                    else np.array([gx[r, c], gy[r, c]])
                )
                D = np.array([[1.0, 0], [0, 1.0], [gvec[0], gvec[1]]])
                A = cms[i][0:2, 0:3] @ D / mw
                icov = np.linalg.inv(A @ A.T) / var
                pt = pt / mw
                if pt[2] < -1:
                    ok = False
                    break
                meas.append(pt[:2])
                icovs.append(icov)
            if not ok:
                continue
            z = depth[r, c]
            pd = np.stack([cm[0:2, 2] for cm in cms])
            for _ in range(gn_iters):
                first = second = 0.0
                for i in range(k):
                    kv = np.array([x, y, z, 1.0])
                    pt = cms[i] @ kv
                    wi = pt[3]
                    p = pt[:2] / wi
                    dp = pd[i] / wi
                    t = icovs[i] @ dp
                    first += (p - meas[i]) @ t
                    second += dp @ t
                dz = -first / second
                if abs(dz) < 1e-7:
                    break
                z += dz
            expo, proddet = 0.0, 1.0
            for i in range(k):
                kv = np.array([x, y, z, 1.0])
                pt = cms[i] @ kv
                diff = pt[:2] / pt[3] - meas[i]
                expo -= diff @ icovs[i] @ diff
                proddet *= np.linalg.det(icovs[i])
            pdfs[r, c] = 0.159 * proddet * np.exp(0.5 * expo)
            points[r, c] = main_inv @ np.array([x, y, z, 1.0])
            # mirror the production frustum guard on the solved depth
            valids[r, c] = -1.0 <= z <= 1.0
    return points, pdfs, valids


def plane_depth_map(camera, z_world, h, w):
    """NDC depth of the plane Z = z_world seen by `camera` (main at origin)."""
    cam = camera.astype(np.float64)
    depth = np.full((h, w), 1.0, np.float32)
    inv = np.linalg.inv(cam)
    for r in range(h):
        for c in range(w):
            x = (c - w / 2.0) * 2.0 / w
            y = (h / 2.0 - r) * 2.0 / h
            # ray through NDC (x, y): world point P(t) = inv @ (x, y, t, 1)
            # solve P(t).z / P(t).w == z_world for t (affine in t)
            a = inv @ np.array([x, y, 0.0, 1.0])
            b = inv @ np.array([0, 0, 1.0, 0.0])
            t = (z_world * a[3] - a[2]) / (b[2] - z_world * b[3])
            if -1 <= t <= 1:
                depth[r, c] = t
    return depth


def test_triangulate_matches_scalar_reference(rng):
    h, w, k = 12, 16, 2
    main = make_camera(eye=(0, 0, 5), near=1.0, far=30.0)
    sides = np.stack(
        [
            make_camera(eye=(1.0, 0.2, 5), near=1.0, far=30.0),
            make_camera(eye=(-0.8, -0.5, 5), near=1.0, far=30.0),
        ]
    )
    depth = plane_depth_map(main, -3.0, h, w)
    depth += rng.normal(scale=1e-3, size=depth.shape).astype(np.float32)
    flows = rng.normal(scale=0.4, size=(k, h, w, 4)).astype(np.float32)
    flows[..., 2] = rng.uniform(0.5, 3.0, size=(k, h, w))
    flows[..., 3] = 0

    out = triangulate_pixels(flows, main, sides, np.ones(k, bool), depth)
    pts, pdfs, valids = scalar_triangulate(flows, main, sides, depth)

    ours_valid = np.asarray(out["valid"])
    np.testing.assert_array_equal(ours_valid, valids)
    sel = valids
    ours_pts = np.asarray(out["point4"])[sel]
    ref_pts = pts[sel]
    ours3 = ours_pts[:, :3] / ours_pts[:, 3:4]
    ref3 = ref_pts[:, :3] / ref_pts[:, 3:4]
    err = np.linalg.norm(ours3 - ref3, axis=1)
    assert np.percentile(err, 95) < 5e-3, f"p95 point err {np.percentile(err, 95)}"
    ours_pdf = np.asarray(out["pdf"])[sel]
    ref_pdf = pdfs[sel]
    fin = np.isfinite(ref_pdf) & (ref_pdf > 1e-30) & (ref_pdf < 1e30)
    rel = np.abs(np.log(np.maximum(ours_pdf[fin], 1e-35)) - np.log(ref_pdf[fin]))
    assert np.median(rel) < 0.1  # pdf agrees within ~10% in log space


def test_triangulate_planes_form_bitexact(rng):
    """The (fx, fy, variance) channel-plane form (the fused pipeline's
    layout — skips the CV_32FC4 pack) is bit-identical to the array form."""
    h, w, k = 12, 16, 2
    main = make_camera(eye=(0, 0, 5), near=1.0, far=30.0)
    sides = np.stack(
        [
            make_camera(eye=(1.0, 0.2, 5), near=1.0, far=30.0),
            make_camera(eye=(-0.8, -0.5, 5), near=1.0, far=30.0),
        ]
    )
    depth = plane_depth_map(main, -3.0, h, w)
    flows = rng.normal(scale=0.4, size=(k, h, w, 4)).astype(np.float32)
    flows[..., 2] = rng.uniform(0.5, 3.0, size=(k, h, w))
    flows[..., 3] = 0
    sv = np.ones(k, bool)

    a = triangulate_pixels(flows, main, sides, sv, depth)
    b = triangulate_pixels(
        (flows[..., 0], flows[..., 1], flows[..., 2]), main, sides, sv, depth)
    for key in ("point4", "pdf", "valid"):
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]))


def test_triangulate_recovers_true_plane():
    """End-to-end estimator check: flows computed analytically between an
    estimated plane (the depth map) and a true plane must pull depths onto
    the true plane."""
    h, w = 24, 32
    z_est, z_true = -5.3, -5.0
    main = make_camera(eye=(0, 0, 0), near=1.0, far=30.0)
    sides_np = [
        make_camera(eye=(1.2, 0, 0), near=1.0, far=30.0),
        make_camera(eye=(-1.2, 0.8, 0), near=1.0, far=30.0),
    ]
    depth = plane_depth_map(main, z_est, h, w)
    main_inv = np.linalg.inv(main.astype(np.float64))

    def world_on_plane(x, y, zw):
        a = main_inv @ np.array([x, y, 0.0, 1.0])
        b = main_inv @ np.array([0, 0, 1.0, 0.0])
        t = (zw * a[3] - a[2]) / (b[2] - zw * b[3])
        p = a + t * b
        return p / p[3], t

    k = len(sides_np)
    flows = np.zeros((k, h, w, 4), np.float32)
    flows[..., 2] = 1.0
    sx, sy = 2.0 / w, 2.0 / h
    for r in range(h):
        for c in range(w):
            if depth[r, c] == 1.0:
                continue
            x = (c - w / 2.0) * sx
            y = (h / 2.0 - r) * sy
            t_w, _ = world_on_plane(x, y, z_true)
            for i, side in enumerate(sides_np):
                target = side.astype(np.float64) @ t_w
                target = target[:2] / target[3]
                # find main-NDC offset d such that the EST-plane point seen at
                # (x, y) + d projects to `target` in the side camera
                d = np.zeros(2)
                for _ in range(20):
                    e_w, _ = world_on_plane(x + d[0], y + d[1], z_est)
                    cur = side.astype(np.float64) @ e_w
                    cur = cur[:2] / cur[3]
                    # numeric 2x2 Jacobian
                    J = np.zeros((2, 2))
                    eps = 1e-5
                    for ax in range(2):
                        dd = d.copy()
                        dd[ax] += eps
                        pw, _ = world_on_plane(x + dd[0], y + dd[1], z_est)
                        pp = side.astype(np.float64) @ pw
                        J[:, ax] = (pp[:2] / pp[3] - cur) / eps
                    d = d + np.linalg.solve(J, target - cur)
                flows[i, r, c, 0] = d[0] / sx
                flows[i, r, c, 1] = d[1] / sy

    out = triangulate_pixels(flows, main, np.stack(sides_np), np.ones(k, bool), depth)
    pts = np.asarray(out["point4"])
    valid = np.asarray(out["valid"])
    interior = np.zeros_like(valid)
    interior[3:-3, 3:-3] = True
    sel = valid & interior & (depth != 1.0)
    z_rec = pts[sel][:, 2] / pts[sel][:, 3]
    assert np.median(np.abs(z_rec - z_true)) < 0.02, (
        f"median z err {np.median(np.abs(z_rec - z_true))}"
    )


def test_estimate_normals_plane():
    h, w = 20, 24
    main = make_camera(eye=(0, 0, 0), near=1.0, far=30.0)
    depth = plane_depth_map(main, -5.0, h, w)
    valid = depth != 1.0
    main_inv = np.linalg.inv(main.astype(np.float64))
    pts = np.zeros((h, w, 4), np.float32)
    for r in range(h):
        for c in range(w):
            x = (c - w / 2.0) * 2.0 / w
            y = (h / 2.0 - r) * 2.0 / h
            pts[r, c] = main_inv @ np.array([x, y, depth[r, c], 1.0])
    pdf = np.full((h, w), 0.5, np.float32)
    centers = np.array([[0, 0, 0.0], [1.2, 0, 0]], np.float32)
    normals = np.asarray(
        estimate_normals(
            pts, jnp.asarray(valid), pdf, centers, np.ones(2, bool),
            jnp.asarray(1),
        )
    )
    sel = valid & (np.arange(h)[:, None] > 2) & (np.arange(h)[:, None] < h - 3)
    nz = normals[sel]
    lens = np.linalg.norm(nz, axis=1)
    # scaled by pdf (K=1: no root)
    np.testing.assert_allclose(lens, 0.5, atol=1e-3)
    unit = nz / lens[:, None]
    # plane Z=-5 seen from camera at origin: outward normal is +Z
    assert np.mean(unit[:, 2] > 0.99) > 0.9


def test_normals_fallback_single_point():
    pts = np.zeros((9, 9, 4), np.float32)
    pts[4, 4] = [0, 0, -5, 1]
    valid = np.zeros((9, 9), bool)
    valid[4, 4] = True
    pdf = np.ones((9, 9), np.float32)
    centers = np.array([[0, 0, 0.0]], np.float32)
    normals = np.asarray(
        estimate_normals(pts, jnp.asarray(valid), pdf, centers,
                         np.ones(1, bool), jnp.asarray(1))
    )
    n = normals[4, 4]
    # fallback points toward the camera center: +Z
    assert n[2] > 0.99 and abs(n[0]) < 1e-3
    assert np.all(normals[~valid] == 0)


def test_analytic_eigvec_matches_eigh(rng):
    from meshrecon.depth.normals import _smallest_eigvec_3x3
    import jax.numpy as jnp

    m = rng.normal(size=(200, 3, 3))
    cov = np.einsum("nij,nkj->nik", m, m)  # random PSD
    v_fast = np.asarray(_smallest_eigvec_3x3(jnp.asarray(cov, jnp.float32)))
    v_ref = np.asarray(
        _smallest_eigvec_3x3(jnp.asarray(cov, jnp.float32), use_eigh=True)
    )
    # same line up to sign
    dots = np.abs(np.einsum("ni,ni->n", v_fast, v_ref))
    assert np.percentile(dots, 5) > 0.999, f"p5 alignment {np.percentile(dots,5)}"


def test_normals_always_finite(rng):
    """Pathological inputs (degenerate covariances, extreme pdf) must never
    emit non-finite normals — one NaN poisons global reductions downstream."""
    h, w = 12, 16
    pts = rng.normal(size=(h, w, 4)).astype(np.float32)
    pts[..., 3] = 1.0
    pts[2, 3] = [1e30, -1e30, 1e30, 1.0]   # absurd point
    pts[4, 5] = [0, 0, 0, 1e-30]           # near-zero w
    valid = np.ones((h, w), bool)
    pdf = rng.uniform(0, 1e30, size=(h, w)).astype(np.float32)
    centers = np.zeros((2, 3), np.float32)
    out = np.asarray(
        estimate_normals(pts, jnp.asarray(valid), pdf, centers,
                         np.ones(2, bool), jnp.asarray(3))
    )
    assert np.isfinite(out).all()
