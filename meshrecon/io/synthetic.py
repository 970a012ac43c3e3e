"""Synthetic fixture clips rendered from a scene's own calibration.

The reference's sample videos (koberec.avi, zatisi.avi, koule-perlin.mkv) are
not shipped with the repository, so CI and benchmarks need input frames that
are consistent with the bundled YAML camera tracks. We synthesize them on
device: fit a simple ground-truth surface to the sparse bundle cloud, then
ray-trace every frame analytically with a procedural 3-D texture (so every
camera sees a geometrically consistent, textured scene — exactly what the
reconstruction pipeline needs to produce a meaningful mesh).

Modes:
- "sphere": ground truth is the best-fit sphere of the bundle cloud (matches
  the koule-tr.yaml Perlin-sphere scene in spirit).
- "bundles": union of small spheres around every bundle point (gives
  non-trivial occlusions for scenes like koberec).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from meshrecon.io.tracks import TrackFile

_HI = jax.lax.Precision.HIGHEST


def _value_noise(p, seed):
    """Cheap procedural 3-D value noise in [0, 1]; p: (..., 3) world coords."""
    acc = jnp.zeros(p.shape[:-1], jnp.float32)
    amp = 0.5
    for octave in range(4):
        q = p * (2.0**octave) * 3.0
        base = jnp.floor(q)
        f = q - base
        f = f * f * (3.0 - 2.0 * f)  # smoothstep

        def hash3(c):
            h = (
                c[..., 0] * 127.1
                + c[..., 1] * 311.7
                + c[..., 2] * 74.7
                + jnp.float32(seed) * 13.7
            )
            return jnp.abs(jnp.sin(h) * 43758.5453) % 1.0

        v = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corner = base + jnp.array([dx, dy, dz], jnp.float32)
                    w = (
                        (f[..., 0] if dx else 1 - f[..., 0])
                        * (f[..., 1] if dy else 1 - f[..., 1])
                        * (f[..., 2] if dz else 1 - f[..., 2])
                    )
                    v = v + w * hash3(corner)
        acc = acc + amp * v
        amp *= 0.5
    return acc / 0.9375


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _render_sphere_frames(cameras, center, radius, height, width, seed):
    """Ray-trace the sphere for every camera; returns (F, H, W) in 0..255."""
    cams = jnp.asarray(cameras, jnp.float32)

    cols = (jnp.arange(width, dtype=jnp.float32) - width / 2.0) * (2.0 / width)
    rows = (height / 2.0 - jnp.arange(height, dtype=jnp.float32)) * (2.0 / height)
    x = jnp.broadcast_to(cols[None, :], (height, width))
    y = jnp.broadcast_to(rows[:, None], (height, width))

    def one(cam):
        inv = jnp.linalg.inv(cam)
        # ray through NDC (x, y): P(t) = inv @ (x, y, t, 1), t in [-1, 1]
        a = jnp.einsum("ij,hwj->hwi", inv,
                       jnp.stack([x, y, jnp.zeros_like(x), jnp.ones_like(x)],
                                 axis=-1), precision=_HI)
        b = inv[:, 2][None, None, :]  # coefficient of t
        # Cartesian ray: p(t) = (a3 + t b3) / (aw + t bw); intersect |p-c|=r
        # solve via sampling-free quadratic in s where p = o + s*d using two
        # points on the ray (t=-1 near, t=+1 far)
        def at(t):
            h = a + t * b
            return h[..., :3] / h[..., 3:4]

        o = at(-1.0)
        d = at(1.0) - o
        oc = o - center
        A = jnp.sum(d * d, axis=-1)
        B = 2.0 * jnp.sum(oc * d, axis=-1)
        C = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = B * B - 4 * A * C
        hit = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        s = (-B - sq) / (2 * jnp.maximum(A, 1e-12))
        s = jnp.where(s > 0, s, (-B + sq) / (2 * jnp.maximum(A, 1e-12)))
        hit &= s > 0
        p = o + s[..., None] * d
        tex = _value_noise(p, seed) * 175.0 + 60.0
        bg = _value_noise(
            jnp.stack([x * 4.0, y * 4.0, jnp.zeros_like(x)], axis=-1), seed + 1
        ) * 40.0 + 10.0
        return jnp.where(hit, tex, bg)

    return jax.lax.map(one, cams)


def fit_sphere(bundles: np.ndarray):
    p3 = bundles[:, :3] / bundles[:, 3:4]
    center = p3.mean(axis=0)
    radius = float(np.mean(np.linalg.norm(p3 - center, axis=1)))
    return center.astype(np.float32), max(radius, 1e-3)


def fit_plane(bundles: np.ndarray):
    """Least-squares plane through the bundle cloud: (point, unit normal,
    rms residual)."""
    p3 = bundles[:, :3] / bundles[:, 3:4]
    center = p3.mean(axis=0)
    c = p3 - center
    _, s, vt = np.linalg.svd(c, full_matrices=False)
    normal = vt[-1]
    resid = float(np.sqrt(np.mean((c @ normal) ** 2)))
    return center.astype(np.float32), normal.astype(np.float32), resid


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _render_plane_frames(cameras, center, normal, extent, height, width, seed):
    """Ray-trace a textured bounded plane for every camera (carpet-like
    scenes such as koberec)."""
    cams = jnp.asarray(cameras, jnp.float32)
    cols = (jnp.arange(width, dtype=jnp.float32) - width / 2.0) * (2.0 / width)
    rows = (height / 2.0 - jnp.arange(height, dtype=jnp.float32)) * (2.0 / height)
    x = jnp.broadcast_to(cols[None, :], (height, width))
    y = jnp.broadcast_to(rows[:, None], (height, width))

    def one(cam):
        inv = jnp.linalg.inv(cam)
        a = jnp.einsum("ij,hwj->hwi", inv,
                       jnp.stack([x, y, jnp.zeros_like(x), jnp.ones_like(x)],
                                 axis=-1), precision=_HI)
        b = inv[:, 2][None, None, :]

        def at(t):
            h = a + t * b
            return h[..., :3] / h[..., 3:4]

        o = at(-1.0)
        d = at(1.0) - o
        denom = jnp.einsum("hwi,i->hw", d, normal, precision=_HI)
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = jnp.einsum("hwi,i->hw", center[None, None] - o, normal,
                       precision=_HI) / denom
        p = o + t[..., None] * d
        hit = (t > 0) & (jnp.linalg.norm(p - center, axis=-1) < extent)
        tex = _value_noise(p, seed) * 175.0 + 60.0
        bg = _value_noise(
            jnp.stack([x * 4.0, y * 4.0, jnp.zeros_like(x)], axis=-1),
            seed + 1) * 40.0 + 10.0
        return jnp.where(hit, tex, bg)

    return jax.lax.map(one, cams)


def synthetic_frames(track: TrackFile, width: int, height: int,
                     mode: str = "sphere", seed: int = 0) -> np.ndarray:
    """Render (F, H, W) float32 grayscale fixture frames for a scene.

    Modes: "sphere" (best-fit sphere), "plane" (best-fit bounded plane, for
    carpet-like scenes), "auto" (plane when the cloud is near-planar).
    """
    center, radius = fit_sphere(track.bundles)
    if mode == "auto":
        _, _, resid = fit_plane(track.bundles)
        mode = "plane" if resid < 0.2 * radius else "sphere"
    if mode == "plane":
        pc, pn, _ = fit_plane(track.bundles)
        p3 = track.bundles[:, :3] / track.bundles[:, 3:4]
        extent = 1.3 * float(np.max(np.linalg.norm(p3 - pc, axis=1)))
        frames = _render_plane_frames(
            track.cameras, jnp.asarray(pc), jnp.asarray(pn),
            jnp.float32(max(extent, 1e-3)), height, width, seed,
        )
    else:
        frames = _render_sphere_frames(
            track.cameras, jnp.asarray(center), jnp.float32(radius),
            height, width, seed,
        )
    return np.asarray(frames, np.float32)
