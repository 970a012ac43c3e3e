"""Pallas TPU kernel: tiled z-buffer triangle rasterization.

The depth render is the framework's hottest irregular op (every camera bundle
and shadow pass needs one; the reference does it on a GPU via GL,
render_glx.cpp:369-397). The XLA fallback in rasterizer.py streams every
triangle over every pixel (~17 ms at 2k triangles, 480x640 on v5e); this
kernel tiles the image over a Pallas grid and skips triangles whose screen
bbox misses the tile — output-sensitive work instead of T x H x W.

Mosaic constraints shaped the design (hit on real v5e):
- per-triangle values are SCALARS; dynamic per-element loads from VMEM along
  the lane axis are rejected ("index must be a multiple of 128"), so all
  triangle data rides SCALAR-PREFETCH arguments in SMEM
  (pltpu.PrefetchScalarGridSpec), the prescribed pattern for data-dependent
  scalar access.
- the pixel tile is one native (8, 128) f32 block; the inner loop is
  scalar-times-vector ops only; iota must be integer-typed.

Triangle capacity per pallas_call is bounded (SMEM budget); larger soups are
rasterized in slabs whose z-buffers are min-combined in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshrecon.raster.rasterizer import clip_triangles_near, _setup_screen

TILE_H = 8
TILE_W = 128
SLAB = 4096  # triangles per pallas_call (SMEM-bounded)


def _raster_kernel(n_tris, height, width, tri_ref, dummy_ref, out_ref):
    """tri_ref: scalar-prefetch (12 * SLAB,) f32 in SMEM, layout per triangle
    t: [x0 x1 x2 y0 y1 y2 z0 z1 z2 inv_area xmin_xmax...]; see packer below.
    Actually packed as 12 contiguous blocks of SLAB for simple indexing."""
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

    tile_x_min = (col0 - width / 2.0) * (2.0 / width)
    tile_x_max = (col0 + (TILE_W - 1) - width / 2.0) * (2.0 / width)
    tile_y_max = (height / 2.0 - row0) * (2.0 / height)
    tile_y_min = (height / 2.0 - (row0 + TILE_H - 1)) * (2.0 / height)

    out_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)

    def fld(i, t):
        return tri_ref[i * SLAB + t]

    def tri_body(t, _):
        overlap = (
            (fld(10, t) <= tile_x_max)  # xmin
            & (fld(11, t) >= tile_x_min)  # xmax
            & (fld(12, t) <= tile_y_max)  # ymin
            & (fld(13, t) >= tile_y_min)  # ymax
        )

        @pl.when(overlap)
        def _():
            ax, bx, cx = fld(0, t), fld(1, t), fld(2, t)
            ay, by, cy = fld(3, t), fld(4, t), fld(5, t)
            az, bz, cz = fld(6, t), fld(7, t), fld(8, t)
            ia = fld(9, t)
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

        return 0

    jax.lax.fori_loop(0, n_tris, tri_body, 0)


def _rasterize_slab(tri_data, height, width, interpret):
    grid = (pl.cdiv(height, TILE_H), pl.cdiv(width, TILE_W))
    kernel = functools.partial(
        _raster_kernel, SLAB, float(height), float(width)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j, *_: (i, j)
        ),
    )
    dummy = jnp.zeros((8, 128), jnp.float32)  # unused VMEM operand
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * TILE_H, grid[1] * TILE_W), jnp.float32
        ),
        interpret=interpret,
    )(tri_data, dummy)


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
    pad = (-t) % SLAB
    def padc(a, fill=0.0):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)
    x, y, z = padc(x), padc(y), padc(z)
    area = padc(area, 1.0)
    ok = padc(ok)
    n_slabs = x.shape[0] // SLAB

    inv_area = jnp.where(ok & (jnp.abs(area) > 1e-12), 1.0 / area, 0.0)
    big = 1e30
    # invalid triangles get an empty bbox so the per-triangle test culls them
    xmin = jnp.where(ok, jnp.min(x, axis=1), big)
    xmax = jnp.where(ok, jnp.max(x, axis=1), -big)
    ymin = jnp.where(ok, jnp.min(y, axis=1), big)
    ymax = jnp.where(ok, jnp.max(y, axis=1), -big)

    # layout: 14 contiguous SLAB-sized fields
    packed = jnp.concatenate(
        [
            x[:, 0], x[:, 1], x[:, 2],
            y[:, 0], y[:, 1], y[:, 2],
            z[:, 0], z[:, 1], z[:, 2],
            inv_area, xmin, xmax, ymin, ymax,
        ]
    ).reshape(14, n_slabs, SLAB)

    zbuf = None
    for s in range(n_slabs):
        slab = packed[:, s, :].reshape(-1)
        zb = _rasterize_slab(slab, height, width, interpret)
        zbuf = zb if zbuf is None else jnp.minimum(zbuf, zb)
    zbuf = zbuf[:height, :width]
    return jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
