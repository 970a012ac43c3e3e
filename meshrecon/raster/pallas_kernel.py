"""Pallas TPU kernel: tiled z-buffer triangle rasterization.

The depth render is the framework's hottest irregular op (every camera bundle
and shadow pass needs one; the reference does it on a GPU via GL,
render_glx.cpp:369-397). The XLA fallback in rasterizer.py streams every
triangle over every pixel; this kernel tiles the image over a Pallas grid and
skips whole 64-triangle chunks whose screen bounding box misses the tile —
output-sensitive work instead of T x H x W.

Layout: triangle setup (clip, perspective divide, edge data) happens in plain
XLA outside the kernel; per-chunk data is laid out as (num_chunks, CHUNK)
f32 arrays (lane-aligned, CHUNK=64) resident in VMEM. Inside the kernel each
chunk is evaluated as (CHUNK, TH, TW) fused VPU ops reduced with a running
min — z-buffering is order-independent, so no serialization is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshrecon.raster.rasterizer import clip_triangles_near, _setup_screen

CHUNK = 64
TILE_H = 8
TILE_W = 128


def _raster_kernel(num_chunks, height, width,
                   x0, x1, x2, y0, y1, y2, z0, z1, z2, inv_area, okf,
                   bb, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    # NOTE: tpu.iota only produces integers; cast afterwards
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32
    )
    row0 = (ti * TILE_H).astype(jnp.float32)
    col0 = (tj * TILE_W).astype(jnp.float32)
    py = (height / 2.0 - (rows + row0)) * (2.0 / height)
    px = ((cols + col0) - width / 2.0) * (2.0 / width)

    # NDC bounds of this tile (y decreases with rows)
    tile_x_min = (col0 - width / 2.0) * (2.0 / width)
    tile_x_max = (col0 + (TILE_W - 1) - width / 2.0) * (2.0 / width)
    tile_y_max = (height / 2.0 - row0) * (2.0 / height)
    tile_y_min = (height / 2.0 - (row0 + TILE_H - 1)) * (2.0 / height)

    out_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)

    def chunk_body(c, _):
        overlap = (
            (bb[c, 0] <= tile_x_max)
            & (bb[c, 1] >= tile_x_min)
            & (bb[c, 2] <= tile_y_max)
            & (bb[c, 3] >= tile_y_min)
        )

        @pl.when(overlap)
        def _():
            ax = x0[c, :][:, None, None]
            bx = x1[c, :][:, None, None]
            cx = x2[c, :][:, None, None]
            ay = y0[c, :][:, None, None]
            by = y1[c, :][:, None, None]
            cy = y2[c, :][:, None, None]
            az = z0[c, :][:, None, None]
            bz = z1[c, :][:, None, None]
            cz = z2[c, :][:, None, None]
            ia = inv_area[c, :][:, None, None]
            okm = okf[c, :][:, None, None]

            p_x = px[None]
            p_y = py[None]
            e0 = ((cx - bx) * (p_y - by) - (cy - by) * (p_x - bx)) * ia
            e1 = ((ax - cx) * (p_y - cy) - (ay - cy) * (p_x - cx)) * ia
            e2 = ((bx - ax) * (p_y - ay) - (by - ay) * (p_x - ax)) * ia
            zs = e0 * az + e1 * bz + e2 * cz
            covered = (
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                & (zs >= -1.0) & (zs <= 1.0) & (okm > 0)
            )
            zmin = jnp.min(jnp.where(covered, zs, jnp.inf), axis=0)
            out_ref[:] = jnp.minimum(out_ref[:], zmin)

        return _

    jax.lax.fori_loop(0, num_chunks, lambda c, s: (chunk_body(c, s), None)[1],
                      None)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def render_depth_pallas(camera, soup, soup_valid, height, width,
                        interpret: bool = False):
    """Full-frame z-buffer depth render via the Pallas tile kernel.

    Same contract as rasterizer.render_depth: (H, W) NDC depth, bg 1.0.
    """
    camera = jnp.asarray(camera, jnp.float32)
    soup = jnp.asarray(soup, jnp.float32)
    tri_clip = jnp.einsum(
        "ij,tvj->tvi", camera[:, :3], soup, precision=jax.lax.Precision.HIGHEST
    ) + camera[:, 3]
    tris, cvalid = clip_triangles_near(tri_clip)
    cvalid &= soup_valid[:, None]
    tris = tris.reshape(-1, 3, 4)
    cvalid = cvalid.reshape(-1)
    x, y, z, area, ok, _ = _setup_screen(tris, cvalid)

    t = x.shape[0]
    pad = (-t) % CHUNK
    def padc(a, fill=0.0):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)
    x, y, z = padc(x), padc(y), padc(z)
    area = padc(area, 1.0)
    ok = padc(ok)
    nc = x.shape[0] // CHUNK

    def comp(v):
        return v.reshape(nc, CHUNK)

    inv_area = jnp.where(jnp.abs(area) < 1e-12, 0.0, 1.0 / area)
    okf = ok.astype(jnp.float32)
    # per-chunk bbox over valid triangles only
    big = 1e30
    vx_min = jnp.where(ok[:, None], x, big).min(axis=1).reshape(nc, CHUNK)
    vx_max = jnp.where(ok[:, None], x, -big).max(axis=1).reshape(nc, CHUNK)
    vy_min = jnp.where(ok[:, None], y, big).min(axis=1).reshape(nc, CHUNK)
    vy_max = jnp.where(ok[:, None], y, -big).max(axis=1).reshape(nc, CHUNK)
    bb = jnp.stack(
        [vx_min.min(axis=1), vx_max.max(axis=1),
         vy_min.min(axis=1), vy_max.max(axis=1)], axis=1
    )  # (nc, 4)

    args = [comp(x[:, 0]), comp(x[:, 1]), comp(x[:, 2]),
            comp(y[:, 0]), comp(y[:, 1]), comp(y[:, 2]),
            comp(z[:, 0]), comp(z[:, 1]), comp(z[:, 2]),
            comp(inv_area), comp(okf), bb]

    grid = (pl.cdiv(height, TILE_H), pl.cdiv(width, TILE_W))
    kernel = functools.partial(_raster_kernel, nc, float(height), float(width))
    zbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * TILE_H, grid[1] * TILE_W), jnp.float32
        ),
        interpret=interpret,
    )(*args)
    zbuf = zbuf[:height, :width]
    return jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
