"""Binned Pallas z-buffer rasterizer — output-sensitive depth rendering.

The XLA brute path (rasterizer.render_depth) streams every triangle over
every pixel through (chunk, H*W) HBM intermediates: 2.6 ms at 1k triangles
but ~117 ms at 16k (both real, 640x480 v5e) — linear in T with a huge
constant. The round-1 whole-soup Pallas kernel (deleted in round 3) skipped
per-triangle by bbox but still paid ~6 scalar ops for every (triangle, tile)
pair, losing to XLA. This version adds BINNING so the kernel only ever walks
triangles near its tile:

  1. Host-side (Renderer.load_mesh): triangles are Morton-sorted by world
     centroid once per mesh, so consecutive CHUNK-sized bins are spatially
     coherent and their bbox unions stay tight after projection.
  2. XLA per render: near-clip + screen setup (shared with rasterizer.py),
     per-chunk screen bbox union, chunk-vs-tile interval tests, and a
     per-tile LIST of active chunk ids (a (SLAB/CHUNK)-element sort per
     tile — the list is complete by construction, no overflow case).
  3. Pallas kernel: grid over (8, 128) image tiles; for each tile a
     ``fori_loop`` walks only the listed chunks, and an unrolled scalar loop
     evaluates the chunk's CHUNK triangles (edge functions, barycentric z,
     z-buffer min) with a per-triangle bbox skip. All triangle data rides
     scalar-prefetch SMEM (Mosaic rejects dynamic lane-axis VMEM loads).

Functional contract identical to rasterizer.render_depth
(render_glx.cpp:369-397 semantics): (H, W) NDC depth, background 1.0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshrecon.raster.rasterizer import clip_project_planes

# Image-tile height/width per grid step. 8 is the f32 sublane minimum;
# taller tiles cut the grid-step count (and its fixed per-step cost, which
# dominates at small soups: 4 cameras x 60x5 tiles = 1200 steps for a
# 2.46 ms render of a 512-tri soup) at the cost of coarser tile-vs-chunk
# selectivity. 24-row tiles cut the serial grid-step count 3x vs the
# VPU-native 8 (bench A/B: 20.84 -> 27.96 Mpix/s, tpu_queue4 2026-08-18;
# bit-exact at any legal value — the tile walk is a pure partition of the
# pixel grid). Legal values: TILE_H a multiple of 8 (the f32 sublane; an
# unaligned VMEM output block fails Mosaic compilation), TILE_W a multiple
# of 128 (the lane width). Set via config/CLI (--raster-tile-h) or the
# MESHRECON_RASTER_TILE_H / _TILE_W env vars; use set_tile_dims() to change
# them mid-process.
def _valid_tile(v: int, mult: int, name: str) -> int:
    v = int(v)
    if v < mult or v % mult:
        raise ValueError(
            f"{name} must be a positive multiple of {mult} (got {v}): "
            "Mosaic rejects unaligned VMEM output blocks")
    return v


def set_tile_dims(tile_h: int | None = None, tile_w: int | None = None):
    """Set the raster tile dims (validated); clears jit caches so traces
    that baked the old values cannot go stale."""
    global TILE_H, TILE_W
    changed = False
    if tile_h is not None and tile_h != TILE_H:
        TILE_H = _valid_tile(tile_h, 8, "raster tile_h")
        changed = True
    if tile_w is not None and tile_w != TILE_W:
        TILE_W = _valid_tile(tile_w, 128, "raster tile_w")
        changed = True
    if changed:
        jax.clear_caches()


TILE_H = _valid_tile(
    __import__("os").environ.get("MESHRECON_RASTER_TILE_H", "24"), 8,
    "MESHRECON_RASTER_TILE_H")
TILE_W = _valid_tile(
    __import__("os").environ.get("MESHRECON_RASTER_TILE_W", "128"), 128,
    "MESHRECON_RASTER_TILE_W")
# import-time values = the process defaults a zero config knob restores
# (apply_kernel_knobs) — otherwise one study config's override would leak
# into the next config's run
DEFAULT_TILE_H, DEFAULT_TILE_W = TILE_H, TILE_W
# Triangles per bin unit. Smaller chunks bin tighter (fewer wasted triangle
# evaluations per tile) at the cost of a longer per-tile list in SMEM and
# more fori_loop trips. Measured at 640x480 on v5e (ms/render, eps-forced):
#   tris    chunk=8   16     32     64    xla-brute
#   578      0.33    0.77   1.26   2.48    2.86
#   3200     1.02    1.34   1.88   2.80
#   16384    4.76    5.64   6.83   8.62   ~91
CHUNK = 8
SLAB = 4096          # triangles per pallas_call (SMEM budget)


def morton_order(soup: np.ndarray) -> np.ndarray:
    """Host-side spatial sort: permutation ordering triangles by the Morton
    code of their centroid (10 bits/axis). Chunked bins of a sorted soup
    stay spatially tight, which is what makes the chunk bboxes selective."""
    soup = np.asarray(soup)
    cent = soup.mean(axis=1)  # (T, 3)
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.minimum(((cent - lo) / span * 1023.0).astype(np.uint64), 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable")


def _raster_kernel(height, width, chunk, slab, tri_ref, lists_ref,
                   counts_ref, dummy_ref, out_ref):
    """One image tile: walk the tile's chunk list, z-buffer its triangles."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile = ti * pl.num_programs(1) + tj

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32)
    row0 = (ti * TILE_H).astype(jnp.float32)
    col0 = (tj * TILE_W).astype(jnp.float32)
    py = (height / 2.0 - (rows + row0)) * (2.0 / height)
    px = ((cols + col0) - width / 2.0) * (2.0 / width)

    tile_x_min = (col0 - width / 2.0) * (2.0 / width)
    tile_x_max = (col0 + (TILE_W - 1) - width / 2.0) * (2.0 / width)
    tile_y_max = (height / 2.0 - row0) * (2.0 / height)
    tile_y_min = (height / 2.0 - (row0 + TILE_H - 1)) * (2.0 / height)

    def fld(i, t):
        return tri_ref[i * slab + t]

    def chunk_body(k, zbuf):
        c = lists_ref[tile, k]
        base = c * chunk
        for tt in range(chunk):
            t = base + tt
            overlap = (
                (fld(12, t) <= tile_x_max)
                & (fld(13, t) >= tile_x_min)
                & (fld(14, t) <= tile_y_max)
                & (fld(15, t) >= tile_y_min)
            )
            # affine barycentrics (edge_affine_planes): 2 FMAs per edge;
            # invalid triangles carry (0, 0, -1) so l0 < 0 everywhere, and
            # the scalar `overlap` term excludes bbox-missed triangles
            l0 = fld(0, t) * px + fld(1, t) * py + fld(2, t)
            l1 = fld(3, t) * px + fld(4, t) * py + fld(5, t)
            l2 = fld(6, t) * px + fld(7, t) * py + fld(8, t)
            zs = l0 * fld(9, t) + l1 * fld(10, t) + l2 * fld(11, t)
            # shared-edge tie slop rides the affine C coefficients
            # (rasterizer.EDGE_TIE_SLOP) — the coverage test stays exact
            covered = ((l0 >= 0) & (l1 >= 0) & (l2 >= 0)
                       & (zs >= -1.0) & (zs <= 1.0) & overlap)
            zbuf = jnp.minimum(zbuf, jnp.where(covered, zs, jnp.inf))
        return zbuf

    zbuf0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, counts_ref[tile], chunk_body, zbuf0)


def _two_level_tile_walk(height, width, chunk, supers, ti, tj, fld, list_at,
                         cbox_at, count, zbuf_ref):
    """Shared two-level tile walk: the tile's list holds SUPERCHUNK ids
    (supers chunks each); chunk bboxes and then per-triangle bboxes are
    tested on the scalar core and non-overlapping work is SKIPPED with
    pl.when — the one-level kernel burned ~25 vector ops per listed
    triangle even when its bbox missed the tile (the `overlap` flag only
    zeroed the weights). At production face counts most listed triangles
    miss any given (8, 128) tile, so the skip converts the per-triangle
    cost from vector FMAs to a handful of scalar compares.

    The single-camera and camera-batched kernels differ ONLY in how they
    index their scalar-prefetch tables, injected here as the ``fld``
    (packed triangle field), ``list_at`` (tile list entry) and ``cbox_at``
    (chunk bbox 4-tuple) accessors — one Mosaic-sensitive walk body, two
    launch shells."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32)
    row0 = (ti * TILE_H).astype(jnp.float32)
    col0 = (tj * TILE_W).astype(jnp.float32)
    py = (height / 2.0 - (rows + row0)) * (2.0 / height)
    px = ((cols + col0) - width / 2.0) * (2.0 / width)

    tile_x_min = (col0 - width / 2.0) * (2.0 / width)
    tile_x_max = (col0 + (TILE_W - 1) - width / 2.0) * (2.0 / width)
    tile_y_max = (height / 2.0 - row0) * (2.0 / height)
    tile_y_min = (height / 2.0 - (row0 + TILE_H - 1)) * (2.0 / height)

    zbuf_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)

    def super_body(k, carry):
        sc = list_at(k)
        for sub in range(supers):
            c = sc * supers + sub
            cxmn, cxmx, cymn, cymx = cbox_at(c)
            chunk_hit = ((cxmn <= tile_x_max) & (cxmx >= tile_x_min)
                         & (cymn <= tile_y_max) & (cymx >= tile_y_min))

            @pl.when(chunk_hit)
            def _chunk():
                base = c * chunk
                for tt in range(chunk):
                    t = base + tt
                    tri_hit = ((fld(12, t) <= tile_x_max)
                               & (fld(13, t) >= tile_x_min)
                               & (fld(14, t) <= tile_y_max)
                               & (fld(15, t) >= tile_y_min))

                    @pl.when(tri_hit)
                    def _tri():
                        # affine barycentrics (edge_affine_planes): 2 FMAs
                        # per edge; invalid triangles carry (0, 0, -1) so
                        # l0 < 0 everywhere (their bbox is inverted too, so
                        # tri_hit already skips them)
                        l0 = fld(0, t) * px + fld(1, t) * py + fld(2, t)
                        l1 = fld(3, t) * px + fld(4, t) * py + fld(5, t)
                        l2 = fld(6, t) * px + fld(7, t) * py + fld(8, t)
                        zs = (l0 * fld(9, t) + l1 * fld(10, t)
                              + l2 * fld(11, t))
                        covered = ((l0 >= 0) & (l1 >= 0) & (l2 >= 0)
                                   & (zs >= -1.0) & (zs <= 1.0))
                        zbuf_ref[:] = jnp.minimum(
                            zbuf_ref[:], jnp.where(covered, zs, jnp.inf))
        return carry

    jax.lax.fori_loop(0, count, super_body, jnp.int32(0))


def _raster_kernel2(height, width, chunk, supers, slab, tri_ref, lists_ref,
                    counts_ref, cxmn_ref, cxmx_ref, cymn_ref, cymx_ref,
                    dummy_ref, out_ref, zbuf_ref):
    """Single-camera two-level kernel: grid (nty, ntx); see
    _two_level_tile_walk for the walk itself."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile = ti * pl.num_programs(1) + tj
    _two_level_tile_walk(
        height, width, chunk, supers, ti, tj,
        lambda i, t: tri_ref[i * slab + t],
        lambda k: lists_ref[tile, k],
        lambda c: (cxmn_ref[c], cxmx_ref[c], cymn_ref[c], cymx_ref[c]),
        counts_ref[tile], zbuf_ref)
    out_ref[:] = zbuf_ref[:]


def _raster_kernel2b(height, width, chunk, supers, n_tiles, nch, slab,
                     tri_ref, lists_ref, counts_ref, cxmn_ref, cxmx_ref,
                     cymn_ref, cymx_ref, dummy_ref, out_ref, zbuf_ref):
    """Camera-batched two-level kernel: grid (N, nty, ntx). Same walk as
    _raster_kernel2 (_two_level_tile_walk); the camera index only offsets
    the per-camera rows of the scalar-prefetch tables (packed triangles,
    lists, counts, chunk bboxes). One launch for a camera chunk —
    jax.vmap over a pallas_call costs ~3x per element on v5e and cannot
    lower at all with scratch refs. The lists table is FLAT 1-D: a 2-D
    (tiles, nsup) layout lane-pads nsup up to 128 and doubled its SMEM
    (measured 600K vs 300K at 4x640x480 — the whole scoped-SMEM budget
    is 1 MB). The packed table rides scalar prefetch (like the one-level
    kernel); the camera selects its ROW — not a VMEM block (the in_specs
    entry belongs to the dummy operand)."""
    cam = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    tile = cam * n_tiles + ti * pl.num_programs(2) + tj
    nsup = nch // supers
    _two_level_tile_walk(
        height, width, chunk, supers, ti, tj,
        lambda i, t: tri_ref[cam, i * slab + t],
        lambda k: lists_ref[tile * nsup + k],
        lambda c: (cxmn_ref[cam * nch + c], cxmx_ref[cam * nch + c],
                   cymn_ref[cam * nch + c], cymx_ref[cam * nch + c]),
        counts_ref[tile], zbuf_ref)
    out_ref[0] = zbuf_ref[:]


# SMEM budget for one camera-chunked batched launch (bytes). The scoped
# SMEM capacity is 1 MB and ALL scalar-prefetch operands live there
# (packed triangles 16*slab*4 per camera + flat lists + chunk bboxes);
# exceeding it is a hard compile error (measured: 4 cameras at slab=4096
# with lane-padded 2-D lists wanted 1.50 MB).
_SMEM_BUDGET = 700 * 1024
_BATCH_SLAB = 2048


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk",
                                             "interpret", "supers", "slab"))
def render_depth_binned_batched(cameras, soup, soup_valid, height, width,
                                chunk: int = CHUNK, interpret: bool = False,
                                supers: int = 8, slab: int = _BATCH_SLAB):
    """N z-buffer depth renders of one soup: cameras (N, 4, 4) -> (N, H, W),
    a few cameras per two-level Pallas launch (as many as the SMEM budget
    allows — 4 at 640x480). Same per-pixel contract as render_depth /
    render_depth_binned (render_glx.cpp:369-397 semantics, background 1.0).
    This is the production form for the B*(K+1) depth renders of the fused
    update (one mesh, many cameras — render_glx.cpp:261-397 renders the
    same static VBO per camera)."""
    n = cameras.shape[0]

    nty = -(-height // TILE_H)
    ntx = -(-width // TILE_W)
    n_tiles = nty * ntx
    nch = slab // chunk
    if nch < supers or nch % supers:
        raise ValueError(
            f"slab/chunk = {nch} chunks must be a positive multiple of "
            f"supers={supers} (got slab={slab}, chunk={chunk}); trailing "
            "chunks would be silently dropped from every tile list")
    nsup = nch // supers
    per_cam = 16 * slab * 4 + n_tiles * nsup * 4 + 4 * nch * 4 + n_tiles * 4
    n_c = max(1, min(n, _SMEM_BUDGET // per_cam))

    def setup(camera):
        return clip_project_planes(camera, soup, soup_valid)

    (x0, x1, x2, y0, y1, y2, z0, z1, z2, area, ok) = jax.vmap(setup)(
        jnp.asarray(cameras, jnp.float32))

    t = x0.shape[1]
    pad = (-t) % slab

    def padc(a, fill=0.0):
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    x0, x1, x2 = padc(x0), padc(x1), padc(x2)
    y0, y1, y2 = padc(y0), padc(y1), padc(y2)
    z0, z1, z2 = padc(z0), padc(z1), padc(z2)
    area = padc(area, 1.0)
    ok = padc(ok)
    n_slabs = x0.shape[1] // slab

    from meshrecon.raster.rasterizer import edge_affine_planes

    # elementwise over the (n, T) camera-major planes
    (a0, b0, c0, a1, b1, c1, a2, b2, c2) = edge_affine_planes(
        x0, x1, x2, y0, y1, y2, z0, z1, z2, area, ok)
    big = jnp.float32(3e38)
    xmn = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmx = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymn = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymx = jnp.maximum(jnp.maximum(y0, y1), y2)
    xmin = jnp.where(ok, xmn, big)
    xmax = jnp.where(ok, xmx, -big)
    ymin = jnp.where(ok, ymn, big)
    ymax = jnp.where(ok, ymx, -big)

    tx0 = (jnp.arange(ntx, dtype=jnp.float32) * TILE_W - width / 2.0) * (
        2.0 / width)
    tx1 = ((jnp.arange(ntx, dtype=jnp.float32) * TILE_W + TILE_W - 1)
           - width / 2.0) * (2.0 / width)
    ty1 = (height / 2.0 - jnp.arange(nty, dtype=jnp.float32) * TILE_H) * (
        2.0 / height)
    ty0 = (height / 2.0 - (jnp.arange(nty, dtype=jnp.float32) * TILE_H
                           + TILE_H - 1)) * (2.0 / height)

    packed_all = jnp.concatenate(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, z0, z1, z2, xmin, xmax,
         ymin, ymax], axis=1,
    ).reshape(n, 16, n_slabs, slab)

    def cagg(a, op):
        return op(a.reshape(n, n_slabs, nch, chunk), 3)

    cxmin = cagg(xmin, lambda a, ax: a.min(axis=ax))
    cxmax = cagg(xmax, lambda a, ax: a.max(axis=ax))
    cymin = cagg(ymin, lambda a, ax: a.min(axis=ax))
    cymax = cagg(ymax, lambda a, ax: a.max(axis=ax))
    sxmin = cxmin.reshape(n, n_slabs, nsup, supers).min(axis=3)
    sxmax = cxmax.reshape(n, n_slabs, nsup, supers).max(axis=3)
    symin = cymin.reshape(n, n_slabs, nsup, supers).min(axis=3)
    symax = cymax.reshape(n, n_slabs, nsup, supers).max(axis=3)

    # per-(camera, tile, super) activity for ALL slabs at once
    ax = ((sxmin[:, :, None, :] <= tx1[None, None, :, None])
          & (sxmax[:, :, None, :] >= tx0[None, None, :, None]))
    ay = ((symin[:, :, None, :] <= ty1[None, None, :, None])
          & (symax[:, :, None, :] >= ty0[None, None, :, None]))
    active = (ay[:, :, :, None, :] & ax[:, :, None, :, :])  # (n,s,ty,tx,sup)
    keys = jnp.where(active, jnp.arange(nsup, dtype=jnp.int32), jnp.int32(
        nsup))
    lists_all = jnp.sort(keys.reshape(n, n_slabs, n_tiles, nsup), axis=-1)
    counts_all = jnp.sum(active, axis=(-1,)).reshape(n, n_slabs, n_tiles)

    dummy = jnp.zeros((8, 128), jnp.float32)
    outs = []
    for c0 in range(0, n, n_c):
        nc = min(n_c, n - c0)
        # NOTE (round 3): a row-band variant (grid (nty,) walking all
        # cameras x column tiles with static loops inside one program) was
        # built to amortize the per-grid-step cost and REGRESSED: the ~20x
        # static code multiplication pushed Mosaic compile to 265 s and
        # the render to 4.5 ms vs 2.9 (measured on v5e, B=1 K=3 578 tris,
        # bit-exact both ways). Mosaic pipelines this (nc, nty, ntx) grid
        # fine; keep it.
        grid = (nc, nty, ntx)
        kernel = functools.partial(_raster_kernel2b, float(height),
                                   float(width), chunk, supers, n_tiles,
                                   nch, slab)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                                   lambda b, i, j, *_: (b, i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        )
        zbuf = None
        for s in range(n_slabs):
            lists = lists_all[c0:c0 + nc, s].reshape(-1)
            counts = counts_all[c0:c0 + nc, s].reshape(-1).astype(jnp.int32)
            packed = packed_all[c0:c0 + nc, :, s, :].reshape(nc, 16 * slab)
            zb = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (nc, nty * TILE_H, ntx * TILE_W), jnp.float32),
                interpret=interpret,
            )(packed, lists, counts,
              cxmin[c0:c0 + nc, s].reshape(-1),
              cxmax[c0:c0 + nc, s].reshape(-1),
              cymin[c0:c0 + nc, s].reshape(-1),
              cymax[c0:c0 + nc, s].reshape(-1), dummy)
            zbuf = zb if zbuf is None else jnp.minimum(zbuf, zb)
        outs.append(zbuf)

    zbuf = jnp.concatenate(outs, axis=0)[:, :height, :width]
    return jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)


def _rasterize_slab2(packed, lists, counts, cxmn, cxmx, cymn, cymx,
                     height, width, chunk, supers, slab, interpret):
    grid = (pl.cdiv(height, TILE_H), pl.cdiv(width, TILE_W))
    kernel = functools.partial(_raster_kernel2, float(height), float(width),
                               chunk, supers, slab)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
    )
    dummy = jnp.zeros((8, 128), jnp.float32)  # unused VMEM operand
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * TILE_H, grid[1] * TILE_W), jnp.float32),
        interpret=interpret,
    )(packed, lists, counts, cxmn, cxmx, cymn, cymx, dummy)


def _rasterize_slab(packed, lists, counts, height, width, chunk, slab,
                    interpret):
    grid = (pl.cdiv(height, TILE_H), pl.cdiv(width, TILE_W))
    kernel = functools.partial(_raster_kernel, float(height), float(width),
                               chunk, slab)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
    )
    dummy = jnp.zeros((8, 128), jnp.float32)  # unused VMEM operand
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * TILE_H, grid[1] * TILE_W), jnp.float32),
        interpret=interpret,
    )(packed, lists, counts, dummy)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk",
                                             "interpret", "two_level",
                                             "supers", "slab"))
def render_depth_binned(camera, soup, soup_valid, height, width,
                        chunk: int = CHUNK, interpret: bool = False,
                        two_level: bool = False, supers: int = 8,
                        slab: int = SLAB):
    """Full-frame z-buffer depth render via the binned Pallas kernel.

    Same contract as rasterizer.render_depth. ``soup`` should be Morton-
    sorted (Renderer.load_mesh does this); an unsorted soup is still correct,
    just slower (looser chunk bboxes -> longer tile lists).

    two_level=True bins by SUPERCHUNKS of ``supers`` chunks (tile lists
    shrink 8x in SMEM) and skips chunks/triangles whose bbox misses the
    tile with scalar-core branches instead of burning masked vector work
    (see _raster_kernel2).
    """
    # slot-interleaved per-component planes (the (T, 2, 3, 4) array form
    # carries trailing small dims that TPU tiling pads 32x; see
    # clip_project_planes)
    (x0, x1, x2, y0, y1, y2, z0, z1, z2, area, ok) = clip_project_planes(
        camera, soup, soup_valid)

    t = x0.shape[0]
    pad = (-t) % slab

    def padc(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill)

    x0, x1, x2 = padc(x0), padc(x1), padc(x2)
    y0, y1, y2 = padc(y0), padc(y1), padc(y2)
    z0, z1, z2 = padc(z0), padc(z1), padc(z2)
    area = padc(area, 1.0)
    ok = padc(ok)
    n_slabs = x0.shape[0] // slab

    from meshrecon.raster.rasterizer import edge_affine_planes

    (a0, b0, c0, a1, b1, c1, a2, b2, c2) = edge_affine_planes(
        x0, x1, x2, y0, y1, y2, z0, z1, z2, area, ok)
    big = jnp.float32(3e38)
    xmn = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmx = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymn = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymx = jnp.maximum(jnp.maximum(y0, y1), y2)
    xmin = jnp.where(ok, xmn, big)
    xmax = jnp.where(ok, xmx, -big)
    ymin = jnp.where(ok, ymn, big)
    ymax = jnp.where(ok, ymx, -big)

    nty = -(-height // TILE_H)
    ntx = -(-width // TILE_W)
    n_tiles = nty * ntx
    # tile extents in NDC (y decreasing with row)
    tx0 = (jnp.arange(ntx, dtype=jnp.float32) * TILE_W - width / 2.0) * (
        2.0 / width)
    tx1 = ((jnp.arange(ntx, dtype=jnp.float32) * TILE_W + TILE_W - 1)
           - width / 2.0) * (2.0 / width)
    ty1 = (height / 2.0 - jnp.arange(nty, dtype=jnp.float32) * TILE_H) * (
        2.0 / height)
    ty0 = (height / 2.0 - (jnp.arange(nty, dtype=jnp.float32) * TILE_H
                           + TILE_H - 1)) * (2.0 / height)

    packed_all = jnp.concatenate(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, z0, z1, z2,
         xmin, xmax, ymin, ymax]
    ).reshape(16, n_slabs, slab)

    nch = slab // chunk

    # per-chunk bbox unions, (n_slabs, nch)
    def cmin(a):
        return a.reshape(n_slabs, nch, chunk).min(axis=2)

    def cmax(a):
        return a.reshape(n_slabs, nch, chunk).max(axis=2)

    cxmin, cxmax = cmin(xmin), cmax(xmax)
    cymin, cymax = cmin(ymin), cmax(ymax)

    if two_level:
        if nch < supers or nch % supers:
            raise ValueError(
                f"slab/chunk = {nch} chunks must be a positive multiple "
                f"of supers={supers} (got chunk={chunk}); trailing chunks "
                "would be silently dropped from every tile list")
        nsup = nch // supers

        def smin(a):
            return a.reshape(n_slabs, nsup, supers).min(axis=2)

        def smax(a):
            return a.reshape(n_slabs, nsup, supers).max(axis=2)

        sxmin, sxmax = smin(cxmin), smax(cxmax)
        symin, symax = smin(cymin), smax(cymax)

    zbuf = None
    for s in range(n_slabs):
        packed = packed_all[:, s, :].reshape(-1)
        if two_level:
            ax = ((sxmin[s][None, :] <= tx1[:, None])
                  & (sxmax[s][None, :] >= tx0[:, None]))  # (ntx, nsup)
            ay = ((symin[s][None, :] <= ty1[:, None])
                  & (symax[s][None, :] >= ty0[:, None]))  # (nty, nsup)
            active = (ay[:, None, :] & ax[None, :, :]).reshape(n_tiles, nsup)
            keys = jnp.where(active,
                             jnp.arange(nsup, dtype=jnp.int32)[None, :],
                             jnp.int32(nsup))
            lists = jnp.sort(keys, axis=1)
            counts = jnp.sum(active, axis=1).astype(jnp.int32)
            zb = _rasterize_slab2(packed, lists, counts, cxmin[s], cxmax[s],
                                  cymin[s], cymax[s], height, width, chunk,
                                  supers, slab, interpret)
        else:
            # chunk-vs-tile interval overlap -> (n_tiles, nch) activity
            ax = ((cxmin[s][None, :] <= tx1[:, None])
                  & (cxmax[s][None, :] >= tx0[:, None]))  # (ntx, nch)
            ay = ((cymin[s][None, :] <= ty1[:, None])
                  & (cymax[s][None, :] >= ty0[:, None]))  # (nty, nch)
            active = (ay[:, None, :] & ax[None, :, :]).reshape(n_tiles, nch)
            keys = jnp.where(active,
                             jnp.arange(nch, dtype=jnp.int32)[None, :],
                             jnp.int32(nch))
            lists = jnp.sort(keys, axis=1)  # active chunk ids first
            counts = jnp.sum(active, axis=1).astype(jnp.int32)
            zb = _rasterize_slab(packed, lists, counts, height, width, chunk,
                                 slab, interpret)
        zbuf = zb if zbuf is None else jnp.minimum(zbuf, zb)

    zbuf = zbuf[:height, :width]
    return jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
