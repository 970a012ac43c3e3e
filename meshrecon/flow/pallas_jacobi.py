"""Banded VMEM-resident Horn-Schunck Jacobi solver (production kernel).

The XLA relaxation loop (variational._hs_sweeps) re-touches HBM every sweep:
60 sweeps of 6 fields at 640x480 measured 28 ms. This kernel holds everything
in VMEM and runs the sweeps back to back.

Design (the NOTES_ROUND2 banding plan):

- The update u <- ubar - Ix*(Ix*ubar + Iy*vbar + c) / (alpha^2 + Ix^2 + Iy^2)
  with c = It - Ix*u0 - Iy*v0 needs only FIVE live fields (ix, iy, c, u, v);
  the round-1 whole-image kernel carried seven and OOM'd scoped VMEM at
  640x480 (23 MB > 16 MB).
- Rows are split into BANDS; each grid step DMAs its band plus a HALO of
  ``halo`` rows from HBM, relaxes ``halo`` sweeps entirely in VMEM (Jacobi
  information propagates one pixel per sweep, so the band interior is exact),
  and writes the center back. Chunks of ``halo`` sweeps repeat until ``iters``
  is reached, carrying (u, v) through HBM between chunks.
- Border semantics match the XLA path's edge padding exactly: shifts are
  ``pltpu.roll`` (circular) followed by a select against the GLOBAL first/last
  row/column — not the wrapped or replicated-pad approximation.

Semantics reference: the relaxation inside OpenCV's variational refinement
used by the reference (flow.cpp:27-32); numerics identical to
variational._hs_sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the five banded fields (bytes); leaves headroom for the
# sweep temporaries, the double-buffered output blocks, and Mosaic's own
# scratch inside the 16 MB core budget (a single 640x480 band measured
# 17.4 MB scoped with an 8 MB budget; a 240-row band at width 640 under a
# 4 MB budget measured 16.48 MB scoped — 488 KB over).
_VMEM_FIELD_BUDGET = 3 * 1024 * 1024


def _sweep_kernel(band, halo, height, stride_h, width, sweeps, alpha2,
                  ix_hbm, iy_hbm, c_hbm, u_hbm, v_hbm,
                  u_out, v_out, ixb, iyb, cb, ub, vb, sems):
    """One band: DMA fields+halo, run ``sweeps`` Jacobi sweeps, write center.

    ``height`` is the height of ONE image; the arrays may hold a vertical
    STACK of images (total rows = N*height), with band dividing height so
    no band straddles two images. The border masks are per-image (local
    row 0 / height-1), which blocks Jacobi propagation across image
    boundaries — halo rows read from a neighboring image never influence
    this image's interior.
    """
    i = pl.program_id(0)
    ext = band + 2 * halo
    row0 = i * band  # start row in the halo-padded arrays (stack coords)
    # image-local base row of this band (scalar arithmetic; stride_h is
    # the per-image padded height of the stack)
    img_local0 = row0 - (row0 // stride_h) * stride_h

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(row0, ext)], dst, sems.at[k])
        for k, (src, dst) in enumerate(
            ((ix_hbm, ixb), (iy_hbm, iyb), (c_hbm, cb),
             (u_hbm, ub), (v_hbm, vb))
        )
    ]
    for cp in copies:
        cp.start()

    w = ixb.shape[1]
    # masks in IMAGE-LOCAL coordinates (halo rows may carry negative /
    # beyond-height values; they are outside any mask and their content
    # cannot cross the row-0 / row-(height-1) barriers)
    g_row = (jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)
             + (img_local0 - halo))
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 1)
    top = g_row == 0
    bot = g_row == height - 1
    left = col == 0
    right = col == width - 1  # TRUE width: the lane padding must not leak

    def shift_rows(f, dy):
        r = pltpu.roll(f, (-dy) % ext, axis=0)
        return jnp.where(bot if dy > 0 else top, f, r)

    def shift_cols(f, dx):
        r = pltpu.roll(f, (-dx) % w, axis=1)
        return jnp.where(right if dx > 0 else left, f, r)

    def hs_avg(f):
        fn = shift_rows(f, -1)
        fs = shift_rows(f, 1)
        horiz = shift_cols(f, -1) + shift_cols(f, 1)
        diag = (shift_cols(fn, -1) + shift_cols(fn, 1)
                + shift_cols(fs, -1) + shift_cols(fs, 1))
        return (fn + fs + horiz) * (1.0 / 6.0) + diag * (1.0 / 12.0)

    for cp in copies:
        cp.wait()

    ix = ixb[:]
    iy = iyb[:]
    cc = cb[:]
    invd = 1.0 / (alpha2 + ix * ix + iy * iy)

    def sweep(_, uv):
        u, v = uv
        u_avg = hs_avg(u)
        v_avg = hs_avg(v)
        num = (ix * u_avg + iy * v_avg + cc) * invd
        return u_avg - ix * num, v_avg - iy * num

    u, v = jax.lax.fori_loop(0, sweeps, sweep, (ub[:], vb[:]))
    u_out[:] = u[halo:halo + band]
    v_out[:] = v[halo:halo + band]


def _pick_band(h: int, w: int, halo: int) -> int:
    """Largest 8-multiple band so 5 banded fields fit the VMEM budget."""
    per_row = 5 * w * 4
    rows = max(_VMEM_FIELD_BUDGET // per_row - 2 * halo, 8)
    band = min((rows // 8) * 8, h)
    while h % band:  # bands must tile the height evenly
        band -= 8
    return max(band, 8)


@functools.partial(
    jax.jit, static_argnames=("alpha2", "iters", "halo", "interpret")
)
def hs_jacobi(ix, iy, c, u0, v0, alpha2: float, iters: int = 60,
              halo: int = 12, interpret: bool = False):
    """Run ``iters`` Horn-Schunck Jacobi sweeps; returns (u, v).

    ix, iy, c, u0, v0: (H, W) — or a BATCH (..., H, W) — float32 with
    c = It - Ix*u0 - Iy*v0. Matches variational._hs_sweeps numerics
    (edge-clamped borders). Batches stack vertically into one kernel
    (jax.vmap over a pallas_call with scratch currently fails to lower);
    the per-image border masks keep each image's relaxation independent.
    Batched inputs require H % 8 == 0 (bands must tile every image);
    unbatched H, W need not be aligned (padded internally).
    """
    lead = ix.shape[:-2]
    h, w = ix.shape[-2:]
    n_img = 1
    for d in lead:
        n_img *= d
    if lead and h % 8 != 0:
        raise ValueError(f"batched hs_jacobi needs H % 8 == 0, got {h}")
    hp1 = -(-h // 8) * 8  # per-image padded height (== h when batched)
    wp = -(-w // 128) * 128
    hp = n_img * hp1

    def prep(x):
        x = jnp.asarray(x, jnp.float32).reshape((n_img, h, w))
        return jnp.pad(x, ((0, 0), (0, hp1 - h), (0, wp - w))).reshape(
            hp, wp)

    ix, iy, c, u, v = map(prep, (ix, iy, c, u0, v0))
    band = _pick_band(hp1, wp, halo)
    n_bands = hp // band
    if n_bands == 1:
        halo_eff = 0
        chunks = [iters]
    else:
        halo_eff = halo
        chunks = [halo] * (iters // halo)
        if iters % halo:
            chunks.append(iters % halo)

    # halo padding so every band's DMA window stays in bounds (content is
    # irrelevant: the border masks stop information flow across row 0/h-1)
    def hpad(x):
        return jnp.pad(x, ((halo_eff, halo_eff), (0, 0)))

    ixp, iyp, cp = map(hpad, (ix, iy, c))
    ext = band + 2 * halo_eff
    for sweeps in chunks:
        up, vp = map(hpad, (u, v))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=(
                pl.BlockSpec((band, wp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((band, wp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((ext, wp), jnp.float32),
                pltpu.VMEM((ext, wp), jnp.float32),
                pltpu.VMEM((ext, wp), jnp.float32),
                pltpu.VMEM((ext, wp), jnp.float32),
                pltpu.VMEM((ext, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((5,)),
            ],
        )
        u, v = pl.pallas_call(
            functools.partial(_sweep_kernel, band, halo_eff, h, hp1, w,
                              sweeps, alpha2),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                       jax.ShapeDtypeStruct((hp, wp), jnp.float32)),
            interpret=interpret,
        )(ixp, iyp, cp, up, vp)
    out_shape = lead + (h, w)
    u = u.reshape(n_img, hp1, wp)[:, :h, :w].reshape(out_shape)
    v = v.reshape(n_img, hp1, wp)[:, :h, :w].reshape(out_shape)
    return u, v
