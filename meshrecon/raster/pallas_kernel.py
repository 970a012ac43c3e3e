"""Pallas TPU kernel: tiled z-buffer triangle rasterization.

The depth render is the framework's hottest irregular op (every camera bundle
and shadow pass needs one; the reference does it on a GPU via GL,
render_glx.cpp:369-397). The XLA fallback in rasterizer.py streams every
triangle over every pixel; this kernel tiles the image over a Pallas grid and
rasterizes with two-level culling: whole 64-triangle chunks are skipped when
their joint screen bbox misses the tile, and each surviving triangle is
bbox-tested again before its edge functions are evaluated.

Mosaic-friendly structure (learned on real v5e): the tile is one native
(8, 128) f32 vector register block; per-triangle data are SCALAR reads from
lane-aligned (num_chunks, CHUNK) VMEM arrays; the inner loop is scalar-times-
vector ops only — no rank-3 vectors, no shape casts, integer iota.
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
                   bb, tb, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

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

    def tri_body(c, t, _):
        overlap = (
            (tb[c, 4 * t + 0] <= tile_x_max)
            & (tb[c, 4 * t + 1] >= tile_x_min)
            & (tb[c, 4 * t + 2] <= tile_y_max)
            & (tb[c, 4 * t + 3] >= tile_y_min)
            & (okf[c, t] > 0)
        )

        @pl.when(overlap)
        def _():
            ax, bx, cx = x0[c, t], x1[c, t], x2[c, t]
            ay, by, cy = y0[c, t], y1[c, t], y2[c, t]
            az, bz, cz = z0[c, t], z1[c, t], z2[c, t]
            ia = inv_area[c, t]
            e0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * ia
            e1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * ia
            e2 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * ia
            zs = e0 * az + e1 * bz + e2 * cz
            covered = (
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                & (zs >= -1.0) & (zs <= 1.0)
            )
            out_ref[:] = jnp.minimum(
                out_ref[:], jnp.where(covered, zs, jnp.inf)
            )

        return _

    def chunk_body(c, _):
        coverlap = (
            (bb[c, 0] <= tile_x_max)
            & (bb[c, 1] >= tile_x_min)
            & (bb[c, 2] <= tile_y_max)
            & (bb[c, 3] >= tile_y_min)
        )

        @pl.when(coverlap)
        def _():
            jax.lax.fori_loop(
                0, CHUNK, lambda t, s: (tri_body(c, t, s), 0)[1], 0
            )

        return _

    jax.lax.fori_loop(0, num_chunks, lambda c, s: (chunk_body(c, s), 0)[1], 0)


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
    big = 1e30
    # per-triangle bboxes interleaved (xmin, xmax, ymin, ymax) per chunk row
    vx_min = jnp.where(ok, jnp.min(x, axis=1), big)
    vx_max = jnp.where(ok, jnp.max(x, axis=1), -big)
    vy_min = jnp.where(ok, jnp.min(y, axis=1), big)
    vy_max = jnp.where(ok, jnp.max(y, axis=1), -big)
    tb = jnp.stack([vx_min, vx_max, vy_min, vy_max], axis=-1).reshape(
        nc, 4 * CHUNK
    )
    bb = jnp.stack(
        [
            vx_min.reshape(nc, CHUNK).min(axis=1),
            vx_max.reshape(nc, CHUNK).max(axis=1),
            vy_min.reshape(nc, CHUNK).min(axis=1),
            vy_max.reshape(nc, CHUNK).max(axis=1),
        ],
        axis=1,
    )  # (nc, 4)

    args = [comp(x[:, 0]), comp(x[:, 1]), comp(x[:, 2]),
            comp(y[:, 0]), comp(y[:, 1]), comp(y[:, 2]),
            comp(z[:, 0]), comp(z[:, 1]), comp(z[:, 2]),
            comp(inv_area), comp(okf), bb, tb]

    grid = (pl.cdiv(height, TILE_H), pl.cdiv(width, TILE_W))
    kernel = functools.partial(_raster_kernel, nc, float(height), float(width))
    zbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
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
