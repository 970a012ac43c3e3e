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
        # 2 lane rolls instead of 6: with g = north+south and
        # t = f + g/2, the weighted 8-neighborhood average
        #   (g + west(f) + east(f))/6 + (west(g) + east(g))/12
        # factors as (g + west(t) + east(t))/6 — the border select clamps
        # each roll to its own operand, and clamping t at a border
        # contributes exactly f + g/2 there, so the edge-clamped semantics
        # are identical; the reassociation drifts only in the last ulp
        # (tests/verify-tpu tolerance 1e-3). Lane rolls shuffle the whole
        # band across vregs and are the costliest op per sweep.
        g = shift_rows(f, -1) + shift_rows(f, 1)
        t = f + 0.5 * g
        return (g + shift_cols(t, -1) + shift_cols(t, 1)) * (1.0 / 6.0)

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


def _fused_sweep_kernel(band, halo, height, stride_h, width, sweeps, alpha2,
                        coeffs, first, *refs):
    """Fused setup + relaxation band: DMA (prev, warped, ...), derive the
    linearization fields (gradients of the temporal average, temporal
    difference, data coefficient) IN KERNEL, then relax — one HBM round
    trip for setup + sweeps instead of an XLA setup stage writing
    (ix, iy, c) through HBM for a separate sweep kernel.

    The data coefficient cc = It - Ix*u0 - Iy*v0 is anchored at the warp
    linearization point (u0, v0) for ALL sweeps (the classic pyramidal-HS
    anchoring, variational._hs_level). Chunked runs carry partially-relaxed
    (u, v) through HBM, so cc CANNOT be re-derived from them: the FIRST
    chunk computes cc from (u0, v0) and writes it out; later chunks DMA it
    back. ``coeffs`` (static (a_k, b_k) tuple) selects Chebyshev
    semi-iteration (restarted per chunk — no extra HBM fields; the restart
    costs ~4x damping vs one long schedule but still crushes plain
    Jacobi's per-chunk 0.98^12); None = plain Jacobi sweeps.
    Semantics: variational._hs_level XLA tail, edge-clamped per image."""
    if first:
        a_hbm, b_hbm, u_hbm, v_hbm, u_out, v_out, cc_out, \
            ab, bb, ub, vb, sems = refs
        srcs = ((a_hbm, ab), (b_hbm, bb), (u_hbm, ub), (v_hbm, vb))
    else:
        a_hbm, b_hbm, cc_hbm, u_hbm, v_hbm, u_out, v_out, \
            ab, bb, ccb, ub, vb, sems = refs
        srcs = ((a_hbm, ab), (b_hbm, bb), (cc_hbm, ccb),
                (u_hbm, ub), (v_hbm, vb))
    i = pl.program_id(0)
    ext = band + 2 * halo
    row0 = i * band
    img_local0 = row0 - (row0 // stride_h) * stride_h

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(row0, ext)], dst, sems.at[k])
        for k, (src, dst) in enumerate(srcs)
    ]
    for cp in copies:
        cp.start()

    w = ab.shape[1]
    g_row = (jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)
             + (img_local0 - halo))
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 1)
    top = g_row == 0
    bot = g_row == height - 1
    left = col == 0
    right = col == width - 1

    def shift_rows(f, dy):
        r = pltpu.roll(f, (-dy) % ext, axis=0)
        return jnp.where(bot if dy > 0 else top, f, r)

    def shift_cols(f, dx):
        r = pltpu.roll(f, (-dx) % w, axis=1)
        return jnp.where(right if dx > 0 else left, f, r)

    def hs_avg(f):
        # 2 lane rolls instead of 6 (see _sweep_kernel.hs_avg: the
        # 8-neighborhood average factors through t = f + g/2; edge-clamp
        # identical, last-ulp reassociation only)
        g = shift_rows(f, -1) + shift_rows(f, 1)
        t = f + 0.5 * g
        return (g + shift_cols(t, -1) + shift_cols(t, 1)) * (1.0 / 6.0)

    for cp in copies:
        cp.wait()

    a = ab[:]
    b = bb[:]
    u0 = ub[:]
    v0 = vb[:]
    # gradients of the temporal average with the same edge-clamped central
    # differences as variational._gradients (ix, iy depend only on (a, b),
    # so re-deriving them per chunk is exact)
    m = 0.5 * (a + b)
    ix = (shift_cols(m, 1) - shift_cols(m, -1)) * 0.5
    iy = (shift_rows(m, 1) - shift_rows(m, -1)) * 0.5
    if first:
        cc = (b - a) - ix * u0 - iy * v0
        cc_out[:] = cc[halo:halo + band]
    else:
        cc = ccb[:]
    invd = 1.0 / (alpha2 + ix * ix + iy * iy)

    def jac(u, v):
        u_avg = hs_avg(u)
        v_avg = hs_avg(v)
        num = (ix * u_avg + iy * v_avg + cc) * invd
        return u_avg - ix * num, v_avg - iy * num

    if coeffs is None:
        def sweep(_, uv):
            return jac(*uv)

        u, v = jax.lax.fori_loop(0, sweeps, sweep, (u0, v0))
    else:
        # static unroll: each Chebyshev step has its own (a_k, b_k)
        u, v, up, vp = u0, v0, u0, v0
        for a_k, b_k in coeffs:
            yu, yv = jac(u, v)
            un = a_k * yu + b_k * up
            vn = a_k * yv + b_k * vp
            up, vp, u, v = u, v, un, vn
    u_out[:] = u[halo:halo + band]
    v_out[:] = v[halo:halo + band]


@functools.partial(
    jax.jit, static_argnames=("alpha2", "iters", "halo", "solver",
                              "interpret")
)
def hs_level_fused(prev, warped, u0, v0, alpha2: float, iters: int = 60,
                   halo: int = 12, solver: str = "jacobi",
                   interpret: bool = False):
    """Fused setup+sweeps for one HS warp linearization; returns (u, v).

    prev, warped, u0, v0: (H, W) or batched (..., H, W) float32. Matches
    the XLA tail of variational._hs_level (gradients + anchored data term
    + _hs_sweeps / _hs_sweeps_cheb numerics). Batches stack vertically
    (per-image border masks isolate each image); batched inputs need
    H % 8 == 0. solver: "jacobi" or "cheb" (Chebyshev semi-iteration,
    restarted per band chunk).

    Chunked like hs_jacobi: ``halo`` sweeps per launch carry (u, v)
    through HBM. Each chunk re-derives (ix, iy) from (prev, warped) in
    VMEM (~6 elementwise ops vs a chunk's ~36 per sweep — far cheaper
    than storing two derived fields through HBM), but the anchored data
    coefficient cc depends on the ORIGINAL (u0, v0), so the first chunk
    computes and persists it for the rest.
    """
    h, w = warped.shape[-2:]
    # broadcast prev against batched warped/flow (the solver shares one
    # source frame across K targets)
    if prev.shape != warped.shape:
        prev = jnp.broadcast_to(prev, warped.shape)
    lead = warped.shape[:-2]
    n_img = 1
    for d in lead:
        n_img *= d
    if lead and h % 8 != 0:
        raise ValueError(f"batched hs_level_fused needs H % 8 == 0, got {h}")
    hp1 = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    hp = n_img * hp1

    def prep(x):
        x = jnp.asarray(x, jnp.float32).reshape((n_img, h, w))
        return jnp.pad(x, ((0, 0), (0, hp1 - h), (0, wp - w))).reshape(
            hp, wp)

    a, b, u, v = map(prep, (prev, warped, u0, v0))
    single = iters <= 24
    # the band DMA extent is band + 2*halo and Mosaic requires 8-aligned
    # row slices — round the single-chunk halo up to a multiple of 4
    # (halo > sweeps is exact: the per-shift border masks clamp at true
    # image rows, extra halo rows are merely redundant work). iters=14
    # with halo==14 produced a 188-row slice and failed to compile.
    single_halo = -(-iters // 4) * 4
    band = _pick_band_fused(hp1, wp, single_halo if single else halo)
    n_bands = hp // band
    if n_bands == 1:
        halo_eff = 0
        chunks = [iters]
    elif single:
        # single chunk with halo == iters: the whole relaxation runs in
        # one launch with NO Chebyshev restart — the per-chunk restarted
        # schedule damps ~4x worse per sweep than one global schedule,
        # and at full res this kernel IS the production solver (stacks
        # above _HS_FUSED_MIN_PX), so the restart was silently weakening
        # the deployed flow vs the XLA path validated at low res. The
        # wider halo costs redundant rows (2*iters per band) but saves
        # the extra launch + cc round trip; 24 caps the redundancy at
        # ~25% of a 192-row band.
        halo_eff = single_halo
        chunks = [iters]
    else:
        halo_eff = halo
        chunks = [halo] * (iters // halo)
        if iters % halo:
            chunks.append(iters % halo)

    def hpad(x):
        return jnp.pad(x, ((halo_eff, halo_eff), (0, 0)))

    ap, bp = hpad(a), hpad(b)
    ext = band + 2 * halo_eff
    cc = None
    for sweeps in chunks:
        first = cc is None
        if solver == "cheb":
            # per-chunk restarted schedule (global schedules would need
            # (u_prev, v_prev) carried through HBM)
            coeffs = tuple(cheb_coeffs_cached(sweeps, 0.98))
        else:
            coeffs = None
        n_in = 4 if first else 5
        n_out = 3 if first else 2
        band_spec = pl.BlockSpec((band, wp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=tuple([band_spec] * n_out),
            scratch_shapes=[pltpu.VMEM((ext, wp), jnp.float32)] * n_in
            + [pltpu.SemaphoreType.DMA((n_in,))],
        )
        kern = functools.partial(_fused_sweep_kernel, band, halo_eff, h,
                                 hp1, w, sweeps, alpha2, coeffs, first)
        out1 = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
        if first:
            ins = (ap, bp, hpad(u), hpad(v))
            u, v, cc = pl.pallas_call(
                kern, grid_spec=grid_spec, out_shape=(out1,) * 3,
                interpret=interpret)(*ins)
        else:
            ins = (ap, bp, hpad(cc), hpad(u), hpad(v))
            u, v = pl.pallas_call(
                kern, grid_spec=grid_spec, out_shape=(out1,) * 2,
                interpret=interpret)(*ins)
    out_shape = lead + (h, w)
    u = u.reshape(n_img, hp1, wp)[:, :h, :w].reshape(out_shape)
    v = v.reshape(n_img, hp1, wp)[:, :h, :w].reshape(out_shape)
    return u, v


@functools.lru_cache(maxsize=None)
def cheb_coeffs_cached(iters: int, rho: float):
    from meshrecon.flow.variational import cheb_coeffs

    return tuple(cheb_coeffs(iters, rho))


def _pick_band_fused(h: int, w: int, halo: int) -> int:
    """Band size for the fused kernel: 5 DMA'd fields + ~5 derived
    temporaries live per band (vs 5 persistent in _pick_band)."""
    per_row = 10 * w * 4
    rows = max(_VMEM_FIELD_BUDGET * 2 // per_row - 2 * halo, 8)
    band = min((rows // 8) * 8, h)
    while h % band:
        band -= 8
    return max(band, 8)
