"""Per-pixel surface normals from neighborhood PCA, via integral images.

Re-architecture of the normal-estimation pass of triangulatePixels
(util.cpp:250-326): the reference gathers a 21x21 pixel neighborhood of
triangulated points for every pixel and runs cv::PCA on it — an O(radius^2)
gather per pixel. On TPU the same covariance is obtained with *integral
images* (2-D cumulative sums) of p, p p^T and the valid count — O(1) per
pixel, fully parallel — followed by a batched smallest-eigenvector solve of
the 3x3 covariance.

Semantics preserved:

- window half-size radius = 10 (util.cpp:253), only triangulated (valid)
  neighbors contribute (util.cpp:282-293).
- normal = eigenvector of the smallest eigenvalue (util.cpp:299-301).
- orientation: flip when ``sum_i 1 / (n . (c_i - p)) < 0`` over all camera
  centers (main first), the reference's inverse-distance vote
  (util.cpp:303-310).
- fallback for < 3 neighbors: ``sum_i (c_i - p) / |c_i - p|^2``
  (util.cpp:314-321).
- output scaled by ``pdf^(1/K) / |n|`` (pdf root only when K > 1,
  util.cpp:277-279, 324).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _window_sums(field, radius):
    """Sum of (H, W, C) field over (2r+1)^2 windows, zero outside the image.

    Implemented as a separable log-time doubling cascade of shifted adds
    (sums of 1, 2, 4, ... shifted copies): measured far faster on TPU than
    integral images, whose lane-axis cumsum lowers to a sequential scan.
    """
    size = 2 * radius + 1

    def _suffix_box(x, axis):
        """y[i] = sum(x[i : i+size]) along axis, zero beyond the end.

        Binary decomposition: power-of-two window sums are built by doubling
        (p_2k[i] = p_k[i] + p_k[i+k]) and combined per set bit of `size` —
        O(log size) shifted adds, all static slices.
        """
        n = x.shape[axis]

        def shift(a, s):
            if s == 0:
                return a
            pad = [(0, 0)] * a.ndim
            pad[axis] = (0, s)
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(s, s + n)
            return jnp.pad(a, pad)[tuple(idx)]

        pows = {1: x}
        k = 1
        while k * 2 <= size:
            pows[k * 2] = pows[k] + shift(pows[k], k)
            k *= 2
        acc = None
        offset = 0
        b = 1
        while b <= size:
            if size & b:
                term = shift(pows[b], offset)
                acc = term if acc is None else acc + term
                offset += b
            b *= 2
        return acc

    def centered_box(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad)
        acc = _suffix_box(xp, axis)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, x.shape[axis])
        return acc[tuple(idx)]

    return centered_box(centered_box(field, 0), 1)


def _smallest_eigvec_3x3(cov, use_eigh: bool = False):
    """Unit eigenvector of the smallest eigenvalue for (..., 3, 3) symmetric.

    Analytic (trigonometric) eigenvalue solve + cross-product eigenvector
    extraction: pure elementwise VPU work, vastly faster on TPU than the
    batched iterative ``jnp.linalg.eigh`` (which dominated the dense-update
    runtime). ``use_eigh`` keeps the LAPACK-style path for cross-checking.
    """
    if use_eigh:
        _, vecs = jnp.linalg.eigh(cov)
        return vecs[..., :, 0]  # eigh sorts ascending

    a00 = cov[..., 0, 0]
    a11 = cov[..., 1, 1]
    a22 = cov[..., 2, 2]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a12 = cov[..., 1, 2]

    # eigenvalues of a symmetric 3x3 via the trigonometric (Smith) method
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    inv_p = 1.0 / p
    # det(B/p) / 2 with B = A - qI
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    half_det = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    ) * 0.5
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    # smallest eigenvalue
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector: the largest cross product of two rows of (A - lam I)
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c_a = jnp.cross(r0, r1)
    c_b = jnp.cross(r0, r2)
    c_c = jnp.cross(r1, r2)
    na = jnp.sum(c_a * c_a, axis=-1, keepdims=True)
    nb = jnp.sum(c_b * c_b, axis=-1, keepdims=True)
    nc = jnp.sum(c_c * c_c, axis=-1, keepdims=True)
    best_ab = jnp.where(na >= nb, c_a, c_b)
    n_ab = jnp.maximum(na, nb)
    best = jnp.where(n_ab >= nc, best_ab, c_c)
    n_best = jnp.maximum(n_ab, nc)
    # degenerate (isotropic) fallback: +z
    z_axis = jnp.zeros_like(best).at[..., 2].set(1.0)
    best = jnp.where(n_best > 1e-30, best, z_axis)
    return best / jnp.sqrt(
        jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), 1e-30)
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def estimate_normals(point4, valid, pdf, camera_centers, centers_valid,
                     n_side: jnp.ndarray, radius: int = 10):
    """Estimate confidence-scaled normals for each triangulated pixel.

    point4: (H, W, 4); valid: (H, W) bool; pdf: (H, W); camera_centers:
    (C, 3) Cartesian centers (main camera first, like util.cpp:255-261);
    centers_valid: (C,) bool; n_side: scalar int (number of real side
    cameras, for the pdf root). Returns (H, W, 3) float32 normals.
    """
    point4 = jnp.asarray(point4, jnp.float32)
    w4 = point4[..., 3:4]
    w4 = jnp.where(jnp.abs(w4) < 1e-20, 1.0, w4)  # invalid pixels may have w=0
    vmask = valid.astype(jnp.float32)[..., None]
    p3 = (point4[..., :3] / w4) * vmask
    pm = p3 * vmask

    cnt = _window_sums(vmask, radius)[..., 0]
    s1 = _window_sums(pm, radius)  # (H, W, 3)
    # second moments: 6 unique entries of p p^T
    pp = jnp.stack(
        [
            pm[..., 0] * p3[..., 0],
            pm[..., 1] * p3[..., 1],
            pm[..., 2] * p3[..., 2],
            pm[..., 0] * p3[..., 1],
            pm[..., 0] * p3[..., 2],
            pm[..., 1] * p3[..., 2],
        ],
        axis=-1,
    )
    s2 = _window_sums(pp, radius)
    n = jnp.maximum(cnt, 1.0)
    mean = s1 / n[..., None]
    cxx = s2[..., 0] / n - mean[..., 0] * mean[..., 0]
    cyy = s2[..., 1] / n - mean[..., 1] * mean[..., 1]
    czz = s2[..., 2] / n - mean[..., 2] * mean[..., 2]
    cxy = s2[..., 3] / n - mean[..., 0] * mean[..., 1]
    cxz = s2[..., 4] / n - mean[..., 0] * mean[..., 2]
    cyz = s2[..., 5] / n - mean[..., 1] * mean[..., 2]
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], axis=-1),
            jnp.stack([cxy, cyy, cyz], axis=-1),
            jnp.stack([cxz, cyz, czz], axis=-1),
        ],
        axis=-2,
    )
    # regularize so eigh is well-defined on empty/degenerate windows
    eye = jnp.eye(3, dtype=jnp.float32) * 1e-12
    normal_pca = _smallest_eigvec_3x3(cov + eye)

    centers = jnp.asarray(camera_centers, jnp.float32)  # (C, 3)
    cmask = centers_valid.astype(jnp.float32)
    diff = centers[:, None, None, :] - p3[None]  # (C, H, W, 3)

    # orientation vote: sum_i 1 / (n . (c_i - p)); flip when negative
    ndot = jnp.einsum("chwi,hwi->chw", diff, normal_pca)
    ndot = jnp.where(jnp.abs(ndot) < 1e-12, 1e-12, ndot)
    vote = jnp.sum(cmask[:, None, None] / ndot, axis=0)
    normal_pca = jnp.where(vote[..., None] < 0, -normal_pca, normal_pca)

    # fallback when the window holds fewer than 3 points
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.maximum(d2, 1e-12)
    fallback = jnp.sum(
        diff * (cmask[:, None, None] / d2)[..., None], axis=0
    )
    normal = jnp.where((cnt >= 3.0)[..., None], normal_pca, fallback)

    k = jnp.maximum(n_side.astype(jnp.float32), 1.0)
    pdf_root = jnp.where(k > 1.0, jnp.power(jnp.maximum(pdf, 0.0), 1.0 / k), pdf)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    norm = jnp.maximum(norm, 1e-12)
    return normal * (pdf_root[..., None] / norm) * vmask
