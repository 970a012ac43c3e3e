"""Fused per-pixel depth triangulation — the numerical core of the pipeline.

Re-architecture of triangulatePixels/triangulatePixel (util.cpp:62-246): the
reference runs a scalar 1-D Gauss-Newton per pixel in a double loop; here the
whole (K, H, W) problem is one jitted program of fused elementwise arrays —
every quantity in the solver is affine in the single unknown z, so each GN
step is a handful of VPU ops per (pixel, side-camera) pair.

Semantics preserved from the reference:

- measured point per side camera: sample the depth map at the flow-displaced
  position when all four bilinear neighbors are valid, else keep the center
  depth (goodSample, util.cpp:44-53, 207-208); project
  ``C_i @ M^-1 @ (x + fx*sx, y + fy*sy, z, 1)`` (util.cpp:209).
- per-camera inverse covariance ``inv(A A^T) / variance`` where
  ``A = C_i[0:2,0:3] M^-1[0:3,0:3] D / w`` and D carries the depth-map Sobel
  gradient (util.cpp:211-223). NOTE: the reference samples its float gradient
  through an integer cv::Point type pun (util.cpp:215-217) which reinterprets
  float bits as ints; we implement the evident intent — bilinear float
  sampling — instead of the pun.
- pixels where any side camera sees z < -1 are dropped (util.cpp:229-233).
- GN on z: derivative uses the frozen Jacobian approximation
  ``dp/dz = (C_i M^-1)[0:2, 2] / w_i(z)`` (util.cpp:104-108), step
  ``dz = -first/second``, at most 50 iterations, stop at |dz| < 1e-7
  (util.cpp:125-126); convergence is a per-pixel mask here (jit-stable).
- density ``pdf = 0.159 * prod(det(icov_i)) * exp(-0.5 sum r^T icov r)``
  (util.cpp:128-141).
- output point is ``M^-1 @ (x, y, z*, 1)`` homogeneous (util.cpp:163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from meshrecon import BACKGROUND_DEPTH

_HI = jax.lax.Precision.HIGHEST


def sobel_gradient(image):
    """Unnormalized 3x3 Sobel (gx, gy), reflect-101 borders (util.cpp:465-479)."""
    p = jnp.pad(image, 1, mode="reflect")
    h, w = image.shape

    def sl(dr, dc):
        return p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]

    gx = (
        (sl(-1, 1) - sl(-1, -1))
        + 2.0 * (sl(0, 1) - sl(0, -1))
        + (sl(1, 1) - sl(1, -1))
    )
    gy = (
        (sl(1, -1) - sl(-1, -1))
        + 2.0 * (sl(1, 0) - sl(-1, 0))
        + (sl(1, 1) - sl(-1, 1))
    )
    return gx, gy


def _bilinear_packed(fields, col, row):
    """Bilinear sample of an (H, W, C) packed field + goodSample validity.

    One set of four corner gathers serves every channel (depth, gx, gy);
    channel 0 must be the depth map whose 4 corners define goodSample
    (util.cpp:44-53). Returns (samples (..., C), good (...)).
    """
    h, w = fields.shape[:2]
    c0 = jnp.floor(col).astype(jnp.int32)
    r0 = jnp.floor(row).astype(jnp.int32)
    inside = (c0 >= 1) & (c0 < w - 1) & (r0 >= 1) & (r0 < h - 1)
    c0c = jnp.clip(c0, 0, w - 2)
    r0c = jnp.clip(r0, 0, h - 2)
    v00 = fields[r0c, c0c]
    v01 = fields[r0c, c0c + 1]
    v10 = fields[r0c + 1, c0c]
    v11 = fields[r0c + 1, c0c + 1]
    good = (
        inside
        & (v00[..., 0] != BACKGROUND_DEPTH)
        & (v01[..., 0] != BACKGROUND_DEPTH)
        & (v10[..., 0] != BACKGROUND_DEPTH)
        & (v11[..., 0] != BACKGROUND_DEPTH)
    )
    fc = (col - c0c)[..., None]
    fr = (row - r0c)[..., None]
    samples = (
        v00 * (1 - fr) * (1 - fc)
        + v01 * (1 - fr) * fc
        + v10 * fr * (1 - fc)
        + v11 * fr * fc
    )
    return samples, good


@functools.partial(jax.jit, static_argnames=("gn_iters",))
def triangulate_pixels(flows, main_camera, side_cameras, side_valid, depth,
                       gn_iters: int = 50):
    """Triangulate every valid pixel of the main frame against K side flows.

    flows: (K, H, W, 4) (fx, fy, variance, 0); main_camera: (4, 4);
    side_cameras: (K, 4, 4); side_valid: (K,) bool mask (capacity padding —
    K can be bucket-padded so one compiled program serves many camera
    bundles); depth: (H, W) NDC depth with background = 1.0.

    Returns dict with: ``point4`` (H, W, 4) homogeneous world points,
    ``pdf`` (H, W) triangulation density, ``valid`` (H, W) bool.
    """
    flows = jnp.asarray(flows, jnp.float32)
    main_camera = jnp.asarray(main_camera, jnp.float32)
    side_cameras = jnp.asarray(side_cameras, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    k, h, w = flows.shape[0], depth.shape[0], depth.shape[1]
    side_valid = jnp.asarray(side_valid, bool)

    main_inv = jnp.linalg.inv(main_camera)
    cm = jnp.einsum("kij,jl->kil", side_cameras, main_inv, precision=_HI)  # C M^-1

    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    sx, sy = 2.0 / w, 2.0 / h
    x = (cols - w / 2.0) * sx * jnp.ones((h, 1), jnp.float32)
    y = (h / 2.0 - rows) * sy * jnp.ones((1, w), jnp.float32)
    center_valid = depth != BACKGROUND_DEPTH

    gx, gy = sobel_gradient(depth)
    grad = jnp.stack([gx, gy], axis=-1)

    flx = flows[..., 0]
    fly = flows[..., 1]
    variance = jnp.maximum(flows[..., 2], 1e-12)

    # --- measured points and covariances per side camera (K, H, W, ...) ---
    # one packed gather source: (depth, gx, gy) sampled together — 4 corner
    # gathers per (pixel, camera) instead of 12 (TPU gathers are expensive)
    packed = jnp.stack([depth, gx, gy], axis=-1)
    fcol = cols[None] + flx
    frow = rows[None] + fly
    samp, good = jax.vmap(_bilinear_packed, in_axes=(None, 0, 0))(
        packed, fcol, frow
    )
    zk = jnp.where(good, samp[..., 0], depth[None])

    mx = x[None] + flx * sx
    my = y[None] + fly * sy
    ones = jnp.ones_like(zk)
    pt4 = jnp.stack([mx, my, zk, ones], axis=-1)  # (K, H, W, 4)
    m = jnp.einsum("kij,khwj->khwi", cm, pt4, precision=_HI)
    mw = m[..., 3]
    mw_safe = jnp.where(jnp.abs(mw) < 1e-12, 1e-12, mw)
    m_ndc = m[..., :3] / mw_safe[..., None]
    # drop pixels any side camera sees in front of the near plane
    ok_pixel = center_valid & jnp.all(
        jnp.where(side_valid[:, None, None], m_ndc[..., 2] >= -1.0, True), axis=0
    )
    s_meas = m_ndc[..., :2]  # (K, H, W, 2)

    # gradient sampled at the flowed position when good, else at the pixel
    g_flow = samp[..., 1:3]
    g_ctr = jnp.broadcast_to(grad[None], g_flow.shape)
    g = jnp.where(good[..., None], g_flow, g_ctr)

    # A = B + outer(c3, g), scaled by 1/mw; icov = inv(A A^T) / variance
    B = cm[:, 0:2, 0:2]  # (K, 2, 2)
    c3 = cm[:, 0:2, 2]  # (K, 2)
    a11 = (B[:, 0, 0, None, None] + c3[:, 0, None, None] * g[..., 0]) / mw_safe
    a12 = (B[:, 0, 1, None, None] + c3[:, 0, None, None] * g[..., 1]) / mw_safe
    a21 = (B[:, 1, 0, None, None] + c3[:, 1, None, None] * g[..., 0]) / mw_safe
    a22 = (B[:, 1, 1, None, None] + c3[:, 1, None, None] * g[..., 1]) / mw_safe
    # S = A A^T (2x2 symmetric)
    s11 = a11 * a11 + a12 * a12
    s12 = a11 * a21 + a12 * a22
    s22 = a21 * a21 + a22 * a22
    det_s = s11 * s22 - s12 * s12
    det_s = jnp.where(jnp.abs(det_s) < 1e-20, 1e-20, det_s)
    ic11 = s22 / (det_s * variance)
    ic12 = -s12 / (det_s * variance)
    ic22 = s11 / (det_s * variance)
    # padded cameras contribute nothing
    vmask = side_valid[:, None, None].astype(jnp.float32)
    ic11, ic12, ic22 = ic11 * vmask, ic12 * vmask, ic22 * vmask

    # --- Gauss-Newton on z ---
    # projections are affine in z: num_xy = n0 + nz*z ; w_i = w0 + wz*z
    xyz1 = jnp.stack([x, y, jnp.zeros_like(x), jnp.ones_like(x)], axis=-1)
    base = jnp.einsum("kij,hwj->khwi", cm, xyz1, precision=_HI)  # z=0 part
    zcol = cm[:, :, 2]  # (K, 4): coefficient of z
    pdx = zcol[:, 0][:, None, None]  # dp numerators (constant,
    pdy = zcol[:, 1][:, None, None]  # util.cpp:86)
    n0x, n0y, w0 = base[..., 0], base[..., 1], base[..., 3]
    nzx = zcol[:, 0][:, None, None]
    nzy = zcol[:, 1][:, None, None]
    wz = zcol[:, 3][:, None, None]

    def residuals(z):
        wi = w0 + wz * z[None]
        wi = jnp.where(jnp.abs(wi) < 1e-12, 1e-12, wi)
        px = (n0x + nzx * z[None]) / wi
        py = (n0y + nzy * z[None]) / wi
        return px - s_meas[..., 0], py - s_meas[..., 1], wi

    def gn_body(_, state):
        z, active = state
        rx, ry, wi = residuals(z)
        dpx = pdx / wi
        dpy = pdy / wi
        tx = ic11 * dpx + ic12 * dpy
        ty = ic12 * dpx + ic22 * dpy
        first = jnp.sum(rx * tx + ry * ty, axis=0)
        second = jnp.sum(dpx * tx + dpy * ty, axis=0)
        second = jnp.where(jnp.abs(second) < 1e-30, 1e-30, second)
        dz = -first / second
        step = jnp.where(active, dz, 0.0)
        active = active & (jnp.abs(dz) >= 1e-7)
        return z + step, active

    z0 = depth
    z_final, _ = jax.lax.fori_loop(
        0, gn_iters, gn_body, (z0, jnp.ones_like(center_valid))
    )

    # density of the result (util.cpp:128-141)
    rx, ry, _ = residuals(z_final)
    quad = rx * (ic11 * rx + ic12 * ry) + ry * (ic12 * rx + ic22 * ry)
    exponent = -jnp.sum(quad, axis=0)
    det_ic = ic11 * ic22 - ic12 * ic12
    det_ic = jnp.where(side_valid[:, None, None], jnp.maximum(det_ic, 1e-30), 1.0)
    # the reference computes this product in double (util.cpp:129-141); in f32
    # we accumulate in log space and clamp to avoid overflow to inf
    log_pdf = (
        jnp.log(jnp.float32(0.159))
        + jnp.sum(jnp.log(det_ic), axis=0)
        + 0.5 * exponent
    )
    pdf = jnp.exp(jnp.clip(log_pdf, -80.0, 80.0))

    k4 = jnp.stack([x, y, z_final, jnp.ones_like(x)], axis=-1)
    point4 = jnp.einsum("ij,hwj->hwi", main_inv, k4, precision=_HI)

    return {"point4": point4, "pdf": pdf, "valid": ok_pixel}
