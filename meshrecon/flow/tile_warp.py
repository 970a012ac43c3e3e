"""Tile-base-offset warp: gather-free bilinear resampling for smooth fields.

TPU gathers cost ~9 cycles/element, so a 4-tap bilinear warp of a 640x480
image costs ~12 ms — it dominated the round-1 flow solver (the reference's
per-pixel remap loops, flow.cpp:19-42 / util.cpp:390-403, are free on a CPU
but are the anti-pattern on TPU). This kernel exploits the smoothness of the
sample-coordinate field instead:

  1. XLA computes, per output tile (TH x TW), an integer base offset
     (by, bx) = floor(min over the tile of (srow - row, scol - col)) — the
     minimal displacement of the tile's samples.
  2. The kernel DMAs the shifted source window
     src[by+row0 : by+row0+WH, bx+col0 : bx+col0+WW] into VMEM and
     accumulates the bilinear taps as a STATIC double loop over residual
     offsets: out[i,j] = sum_d hat(ry-dy) hat(rx-dx) win[dy+i, dx+j],
     where (ry, rx) = (srow - by - row, scol - bx - col) is the bounded
     residual. Every term is a static VMEM slice + FMA on the VPU — no
     data-dependent addressing (Mosaic forbids it anyway).

The result matches fragment.bilinear_sample to f32 rounding (~1e-3 on a
0..255 image; the window-relative coordinate arithmetic reassociates the
interpolation weights), including its border clamp, wherever the
within-tile spread of the displacement field fits the residual budget
(R_ROW/R_COL); residuals beyond the budget clamp to the window edge, i.e.
the sample degrades to the nearest representable coordinate. Callers warp
with fields that are smooth BY CONSTRUCTION (flow after Jacobi relaxation
with alpha=12; projective reprojection coordinates away from depth edges),
so overflow is confined to motion/depth discontinuities where the flow
variance channel already downweights the data.

This is NOT the round-1 clamped shift-warp (reverted in commit 9f52b63):
that clamped the TOTAL flow to a global radius, corrupting any large
translation; here the per-tile base absorbs arbitrarily large smooth
displacement and only the within-tile VARIATION is bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile and residual budget. TH=8 keeps the per-tile spread small and
# matches the f32 sublane tile; TW=128 is the lane width. R_ROW/R_COL bound
# the within-tile coordinate spread (see module docstring).
TH, TW = 8, 128
R_ROW, R_COL = 14, 14


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _hat_weight(t):
    """Bilinear hat kernel."""
    return jnp.maximum(1.0 - jnp.abs(t), 0.0)


def _cubic_weight(t, a=-0.75):
    """Keys bicubic kernel (OpenCV's a = -0.75); support |t| < 2."""
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _spec_branches(row_spec, col_spec, nr_n, nc_n, n_rows, n_cols,
                   fits_r, fits_c, enumerate_taps):
    """Emit the per-tile specialization branch tree shared by both warp
    kernels: up to 2x2 enumerations — {narrow, wide} rows x {narrow, wide}
    columns — selected by one or two scalar predicates per tile. Every
    branch is EXACT (a fit test only passes when the skipped taps are
    identically zero); guards-per-column apply only at wide budgets."""
    rows_opts = ([(nr_n, fits_r), (n_rows, jnp.logical_not(fits_r))]
                 if row_spec else [(n_rows, None)])
    cols_opts = ([(nc_n, fits_c), (n_cols, jnp.logical_not(fits_c))]
                 if col_spec else [(n_cols, None)])
    for nr, pr in rows_opts:
        for nc, pc in cols_opts:
            pred = None
            for p in (pr, pc):
                if p is not None:
                    pred = p if pred is None else jnp.logical_and(pred, p)
            if pred is None:
                enumerate_taps(nr, nc, nc >= _GUARD_COLS)
            else:
                pl.when(pred)(
                    functools.partial(enumerate_taps, nr, nc,
                                      nc >= _GUARD_COLS))


def _warp_tile_kernel(wh, ww, taps, sub, narrow, narrow_c, by_ref, bx_ref,
                      py_ref, px_ref, src_ref, out_ref, win, acc, sem):
    """One grid step = ``sub`` vertically-adjacent output tiles: start ALL
    window DMAs up front (each tile's source window is independent), then
    per tile realign with dynamic rolls and accumulate the static
    interpolation taps (bilinear taps=2, bicubic taps=4).

    The one-tile-per-step form serialized a window DMA against every
    tile's compute (measured: the solver-budget warp of a 0.92 Mpix stack
    ran 0.59 ms for ~0.2 ms of tap FLOPs — grid-step latency dominated);
    batching ``sub`` tiles per step both cuts the fixed per-step cost and
    hides DMA latency of tiles 1..sub-1 behind tile 0's compute.

    HBM DMA slice starts must be (8, 128)-aligned (Mosaic tiling), so the
    XLA wrapper aligns the window base down and passes the remainders; the
    kernel undoes them with two tpu.dynamic_rotate ops — far cheaper than
    widening the static tap enumeration by the alignment slack.

    A tile whose by_ref entry is the -1 dead-tile sentinel (no valid pixel,
    see _prep_warp_coords) skips its DMA, rolls and enumeration and writes
    zeros.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ntx = pl.num_programs(1)
    wh2 = wh + 8  # aligned window incl. alignment slack
    ww2 = _round_up(ww, 128) + 128  # lane dynamic_rotate needs 128-aligned

    # scalar-prefetch arrays are 1-D tile-indexed: SMEM pads the last axis
    # to 128 lanes, so a (nty, ntx) layout with tiny ntx cost nty*128*4
    # bytes PER OPERAND (1.4 MB total at 12 stacked images — over the 1 MB
    # SMEM budget); flat (nty*ntx,) arrays pad once overall. Only the two
    # UNALIGNED bases ship; the DMA alignment and its roll remainders are
    # rederived with scalar arithmetic (4 arrays of 64k tiles at 1080p x 32
    # stacked frames = the whole 1 MB SMEM budget by themselves).
    rems = []
    dmas = []
    alive = []
    for s in range(sub):
        tile = (ti * sub + s) * ntx + tj
        by_raw = by_ref[tile]
        bx_raw = bx_ref[tile]
        alive.append(by_raw >= 0)
        by = pl.multiple_of((jnp.maximum(by_raw, 0) // 8) * 8, 8)
        bx = pl.multiple_of((bx_raw // 128) * 128, 128)
        rems.append((by_raw - (by_raw // 8) * 8,
                     bx_raw - (bx_raw // 128) * 128))
        dma = pltpu.make_async_copy(
            src_ref.at[pl.ds(by, wh2), pl.ds(bx, ww2)], win.at[s], sem.at[s],
        )
        pl.when(alive[s])(dma.start)
        dmas.append(dma)

    half = taps // 2 - 1
    i_loc = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(
        jnp.float32)
    j_loc = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(
        jnp.float32)
    weight = _hat_weight if taps == 2 else _cubic_weight

    for s in range(sub):
        rem_y, rem_x = rems[s]
        # residuals (computed while the DMA is in flight); cap so every tap
        # (floor(r) - taps/2 + 1 .. floor(r) + taps/2) stays inside the
        # window for every output row/col
        ry = jnp.clip(py_ref[s * TH:(s + 1) * TH] - i_loc, half,
                      wh - TH - half - 1e-3)
        rx = jnp.clip(px_ref[s * TH:(s + 1) * TH] - j_loc, half,
                      ww - TW - half - 1e-3)

        @pl.when(jnp.logical_not(alive[s]))
        def _dead():
            out_ref[s * TH:(s + 1) * TH] = jnp.zeros((TH, TW), jnp.float32)

        @pl.when(alive[s])
        def _alive():
            dmas[s].wait()
            w = win[s]
            # out[p] = in[p + rem]: roll by (-rem) mod n (same convention
            # the validated round-1 warp kernel used)
            w = pltpu.roll(w, jnp.mod(wh2 - rem_y, wh2), axis=0)
            w = pltpu.roll(w, jnp.mod(ww2 - rem_x, ww2), axis=1)

            # Loop structure matters: the lane-axis slice (dx) costs a
            # cross-vreg shift of the whole window, so hoist it to the
            # OUTER loop (done once per dx); the inner dy step is a cheap
            # sublane slice + FMA. The naive dy-outer/dx-inner order
            # re-sliced lanes 289 times and ran 29 ms — this order is the
            # difference between losing and beating the gather.
            n_rows = wh - TH + 1
            n_cols = ww - TW + 1

            def enumerate_taps(nr, nc, guard_cols):
                # Residual-span column SKIPPING (pl.when per dx column,
                # guarding on max(rx) + taps/2) is applied ONLY at wide
                # column budgets: scalar-core branches disrupt the VPU
                # pipeline enough that the unconditional static enumeration
                # wins below ~20 columns. Measured on v5e (K=3 640x480
                # stack, smooth ~2 px-spread field): solver r6/r8 0.59 ms
                # unconditional vs 1.03 guarded; projection r14/r14 1.09 vs
                # 1.18; but the plane-sweep budget r14/r24 1.62 vs 1.27 —
                # the guard only earns its branches when most of a wide
                # enumeration is dead. (A first cut guarding every (dy, dx)
                # tap with the accumulator in VMEM scratch was 2.8x WORSE
                # overall: per-tap branches + a scratch load/store per tap
                # instead of vector registers.)
                # the column weight wx is hoisted OUT of the dy loop
                # (sum_dy (wy*wx)*win == wx * sum_dy wy*win): nr+1 FMAs
                # per column instead of 2*nr ops — pure reassociation,
                # last-ulp drift only (test atol 5e-3)
                wys = [weight(ry - dy) for dy in range(nr)]
                if guard_cols:
                    rx_hi = jnp.max(rx) + taps * 0.5
                    acc[:] = jnp.zeros((TH, TW), jnp.float32)
                    for dx in range(nc):
                        @pl.when(dx <= rx_hi)
                        def _col():
                            wx = weight(rx - dx)
                            wcol = w[:, dx:dx + TW]
                            part = jnp.zeros((TH, TW), jnp.float32)
                            for dy in range(nr):
                                part = part + wys[dy] * wcol[dy:dy + TH]
                            acc[:] = acc[:] + wx * part
                    out_ref[s * TH:(s + 1) * TH] = acc[:]
                else:
                    out = jnp.zeros((TH, TW), jnp.float32)
                    for dx in range(nc):
                        wx = weight(rx - dx)
                        wcol = w[:, dx:dx + TW]
                        part = jnp.zeros((TH, TW), jnp.float32)
                        for dy in range(nr):
                            part = part + wys[dy] * wcol[dy:dy + TH]
                        out = out + wx * part
                    out_ref[s * TH:(s + 1) * TH] = out

            # Narrow/wide ROW specialization: the per-tile window base is
            # the tile's own MINIMAL displacement, so residuals span
            # exactly the within-tile spread. Output tiles are (8, 128):
            # across 8 ROWS a smooth field spreads a fraction of a pixel,
            # while across 128 LANES even a mildly sloped reprojection
            # field spreads several pixels — so the row span fits a SMALL
            # budget while the column span gets its own MID-TIER budget
            # (narrow_c; invalid-pixel coordinate cleaning in
            # _prep_warp_coords is what makes these fits fire on real
            # projection fields). When every nonzero-weight tap provably
            # fits the narrow span (weight support |t| < taps/2, so max
            # residual <= narrow - taps/2 suffices), run the short
            # enumeration — EXACT, the skipped terms are identically zero.
            # One or two scalar branches per tile.
            nr_n = min(narrow, n_rows) if narrow else n_rows
            nc_n = min(narrow_c, n_cols) if narrow_c else n_cols
            row_spec = bool(narrow) and nr_n < n_rows
            col_spec = bool(narrow_c) and nc_n < n_cols
            fits_r = (jnp.max(ry) <= nr_n - taps * 0.5) if row_spec else None
            fits_c = (jnp.max(rx) <= nc_n - taps * 0.5) if col_spec else None
            _spec_branches(row_spec, col_spec, nr_n, nc_n, n_rows, n_cols,
                           fits_r, fits_c, enumerate_taps)


def _warp_tile_kernel2(wh, ww, taps, sub, nearest_a, narrow, narrow_c,
                       by_ref, bx_ref, py_ref, px_ref, pya_ref, pxa_ref,
                       srca_ref, srcb_ref,
                       outa_ref, outb_ref, wina, winb, acca, accb,
                       sema, semb):
    """Dual-source variant of :func:`_warp_tile_kernel`: sample TWO images
    through ONE coordinate field in one grid walk.

    The projective-texturing stage needs exactly this (fragment.py): the
    shadow map (nearest) and the side frame (bilinear) are both sampled at
    the same reprojection coordinates. Two stacked single-source passes pay
    the coordinate/base/grid machinery twice; here the window DMAs of both
    sources overlap, the residual fields and (for ``nearest_a=False``) the
    tap weights are computed once, and only the slice+FMA accumulation
    doubles.

    nearest_a: sample source A at the ROUNDED coordinates (GL_NEAREST
    shadow-sampler semantics, shader.frag:17-18) — its tap weights become
    one-hot at the integral residuals, reproducing ``nearest_sample``
    exactly. With ``nearest_a=False`` source A shares source B's bilinear
    weights (one weight product per tap serves both FMAs).
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ntx = pl.num_programs(1)
    wh2 = wh + 8
    ww2 = _round_up(ww, 128) + 128

    rems = []
    dmas = []
    alive = []
    for s in range(sub):
        tile = (ti * sub + s) * ntx + tj
        by_raw = by_ref[tile]
        bx_raw = bx_ref[tile]
        alive.append(by_raw >= 0)
        by = pl.multiple_of((jnp.maximum(by_raw, 0) // 8) * 8, 8)
        bx = pl.multiple_of((bx_raw // 128) * 128, 128)
        rems.append((by_raw - (by_raw // 8) * 8,
                     bx_raw - (bx_raw // 128) * 128))
        da = pltpu.make_async_copy(
            srca_ref.at[pl.ds(by, wh2), pl.ds(bx, ww2)], wina.at[s],
            sema.at[s])
        db = pltpu.make_async_copy(
            srcb_ref.at[pl.ds(by, wh2), pl.ds(bx, ww2)], winb.at[s],
            semb.at[s])

        @pl.when(alive[s])
        def _start():
            da.start()
            db.start()

        dmas.append((da, db))

    half = taps // 2 - 1
    i_loc = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(
        jnp.float32)
    j_loc = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(
        jnp.float32)
    weight = _hat_weight if taps == 2 else _cubic_weight

    for s in range(sub):
        rem_y, rem_x = rems[s]
        py = py_ref[s * TH:(s + 1) * TH]
        px = px_ref[s * TH:(s + 1) * TH]
        lo_y, hi_y = float(half), wh - TH - half - 1e-3
        lo_x, hi_x = float(half), ww - TW - half - 1e-3
        ry = jnp.clip(py - i_loc, lo_y, hi_y)
        rx = jnp.clip(px - j_loc, lo_x, hi_x)
        if nearest_a:
            # the wrapper rounds the RAW coordinates (pre-offset) so these
            # residuals are exactly integral — one-hot weights hit the same
            # texel as fragment.nearest_sample at every .5 tie (rounding py
            # here instead flipped ties through f32 reassociation of the
            # pad/base offsets, caught by the on-TPU equality sweep)
            # integral clip bounds (floor of the raw field's hi): clipping
            # an integral residual to the raw non-integral bound would turn
            # the one-hot weights into a two-texel blend exactly at
            # budget-saturating tiles (round-4 advisor)
            hi_ya = float(int(hi_y))
            hi_xa = float(int(hi_x))
            rya = jnp.clip(pya_ref[s * TH:(s + 1) * TH] - i_loc, lo_y, hi_ya)
            rxa = jnp.clip(pxa_ref[s * TH:(s + 1) * TH] - j_loc, lo_x, hi_xa)

        @pl.when(jnp.logical_not(alive[s]))
        def _dead():
            zero = jnp.zeros((TH, TW), jnp.float32)
            outa_ref[s * TH:(s + 1) * TH] = zero
            outb_ref[s * TH:(s + 1) * TH] = zero

        @pl.when(alive[s])
        def _alive():
            da, db = dmas[s]
            da.wait()
            db.wait()
            wa = wina[s]
            wb = winb[s]
            roll_y = jnp.mod(wh2 - rem_y, wh2)
            roll_x = jnp.mod(ww2 - rem_x, ww2)
            wa = pltpu.roll(pltpu.roll(wa, roll_y, axis=0), roll_x, axis=1)
            wb = pltpu.roll(pltpu.roll(wb, roll_y, axis=0), roll_x, axis=1)

            n_rows = wh - TH + 1
            n_cols = ww - TW + 1

            def enumerate_taps(nr, nc, guard_cols):
                wys = [weight(ry - dy) for dy in range(nr)]
                wysa = ([weight(rya - dy) for dy in range(nr)]
                        if nearest_a else wys)
                if guard_cols:
                    # residual-span column skipping (see _warp_tile_kernel):
                    # the guard bound covers both residual fields (they
                    # differ by the rounding, <= 0.5)
                    rx_hi = (jnp.max(rx) + taps * 0.5
                             + (0.5 if nearest_a else 0.0))
                    acca[:] = jnp.zeros((TH, TW), jnp.float32)
                    accb[:] = jnp.zeros((TH, TW), jnp.float32)
                    for dx in range(nc):
                        @pl.when(dx <= rx_hi)
                        def _col():
                            wx = weight(rx - dx)
                            wxa = weight(rxa - dx) if nearest_a else wx
                            # wx/wxa hoisted out of the dy loop (see
                            # _warp_tile_kernel: pure reassociation)
                            wca = wa[:, dx:dx + TW]
                            wcb = wb[:, dx:dx + TW]
                            parta = jnp.zeros((TH, TW), jnp.float32)
                            partb = jnp.zeros((TH, TW), jnp.float32)
                            for dy in range(nr):
                                partb = partb + wys[dy] * wcb[dy:dy + TH]
                                parta = parta + wysa[dy] * wca[dy:dy + TH]
                            acca[:] = acca[:] + wxa * parta
                            accb[:] = accb[:] + wx * partb
                    outa_ref[s * TH:(s + 1) * TH] = acca[:]
                    outb_ref[s * TH:(s + 1) * TH] = accb[:]
                else:
                    outa = jnp.zeros((TH, TW), jnp.float32)
                    outb = jnp.zeros((TH, TW), jnp.float32)
                    for dx in range(nc):
                        wx = weight(rx - dx)
                        wxa = weight(rxa - dx) if nearest_a else wx
                        wca = wa[:, dx:dx + TW]
                        wcb = wb[:, dx:dx + TW]
                        parta = jnp.zeros((TH, TW), jnp.float32)
                        partb = jnp.zeros((TH, TW), jnp.float32)
                        for dy in range(nr):
                            partb = partb + wys[dy] * wcb[dy:dy + TH]
                            parta = parta + wysa[dy] * wca[dy:dy + TH]
                        outa = outa + wxa * parta
                        outb = outb + wx * partb
                    outa_ref[s * TH:(s + 1) * TH] = outa
                    outb_ref[s * TH:(s + 1) * TH] = outb

            # narrow/wide row + mid-tier column specialization, exactly as
            # _warp_tile_kernel; BOTH residual fields must fit a span
            nr_n = min(narrow, n_rows) if narrow else n_rows
            nc_n = min(narrow_c, n_cols) if narrow_c else n_cols
            row_spec = bool(narrow) and nr_n < n_rows
            col_spec = bool(narrow_c) and nc_n < n_cols
            fits_r = fits_c = None
            if row_spec:
                my = jnp.maximum(jnp.max(ry), jnp.max(rya)) if nearest_a \
                    else jnp.max(ry)
                fits_r = my <= nr_n - taps * 0.5
            if col_spec:
                mx = jnp.maximum(jnp.max(rx), jnp.max(rxa)) if nearest_a \
                    else jnp.max(rx)
                fits_c = mx <= nc_n - taps * 0.5
            _spec_branches(row_spec, col_spec, nr_n, nc_n, n_rows, n_cols,
                           fits_r, fits_c, enumerate_taps)


def _prep_warp_coords(scol, srow, valid, h, w, r_row: int, r_col: int,
                      taps: int, scol2=None, srow2=None):
    """Shared XLA-side coordinate machinery of the tile warp: pad the
    displacement fields, fit the per-tile integer window bases, and produce
    window-relative sample coordinates. Returns
    (sub, nty, ntx, wh, ww, padt, padl, padb, padr, hp, wp, by_dma, bx, py,
    px, py2, px2); the caller pads each SOURCE with ((padt, padb),
    (padl, padr)) edge mode.

    When ``valid`` is given, two extra jobs beyond excluding invalid pixels
    from the base fit:
      * invalid pixels' COORDINATES are rewritten to their tile's minimal
        valid displacement (their samples are undefined by contract, so any
        in-budget coordinate is legal). Garbage coordinates otherwise
        saturate the clip bounds and inflate every per-tile residual
        maximum, forcing the wide row/column enumeration and defeating the
        in-kernel span guards on exactly the tiles (silhouettes,
        off-frame regions) that have the least real work.
      * tiles with NO valid pixel are marked with a ``by_dma = -1``
        sentinel; the kernel skips their window DMA, rolls and tap
        enumeration entirely and writes zeros (background tiles are a
        large fraction of a typical projection target).

    scol2/srow2 (optional): a SECOND coordinate field sharing the first's
    window bases (the dual kernel's rounded nearest-sampler coordinates —
    integral raw values stay exactly integral through the integer pad/base
    offsets, so in-kernel weights are exactly one-hot; rounding the
    offset-shifted py instead flipped .5 ties through f32 reassociation,
    caught by the on-TPU equality sweep). py2/px2 are None when not given.

    Border handling: do NOT clamp coordinates at the image edge — a hard
    clamp flattens the coordinate field where it overhangs the border,
    creating an artificial within-tile spread as large as the overhang
    (which blew the residual budget of border tiles). Instead coordinates
    run into the edge-replicated source padding, where every tap reads the
    border value — the same result bilinear_sample's clamp produces, but
    with the displacement field left smooth. Only clamp at the pad limits.
    """
    ho, wo = scol.shape
    scol = jnp.asarray(scol, jnp.float32)
    srow = jnp.asarray(srow, jnp.float32)

    # tiles per grid step (vertical): fewer, fatter steps amortize the
    # fixed per-step cost and overlap the window DMAs (see kernel docstring)
    sub = min(4, -(-ho // TH))
    hp = _round_up(ho, TH * sub)
    wp = _round_up(wo, TW)
    # Pad the DISPLACEMENT fields (srow - row, scol - col) with edge mode —
    # padding the raw coordinates would put a steep artificial gradient in
    # the pad region (constant coord, increasing pixel index) and blow the
    # per-tile residual budget of every edge tile.
    rows_o = jnp.arange(ho, dtype=jnp.float32)[:, None]
    cols_o = jnp.arange(wo, dtype=jnp.float32)[None, :]
    pad2 = ((0, hp - ho), (0, wp - wo))
    gy_p = jnp.pad(srow - rows_o, pad2, mode="edge")
    gx_p = jnp.pad(scol - cols_o, pad2, mode="edge")
    srow_p = gy_p + jnp.arange(hp, dtype=jnp.float32)[:, None]
    scol_p = gx_p + jnp.arange(wp, dtype=jnp.float32)[None, :]

    wh = _round_up(TH + r_row + taps, 8)
    ww = TW + r_col + taps
    # Edge-pad the source on ALL sides so no window start ever needs
    # clamping: left/top pads cover windows reaching before the first
    # sample (out[j] can only read win[>= j], so a tile whose samples sit
    # left of its own column indices needs the window to start at negative
    # source columns); right/bottom pads cover windows past the last one.
    # Edge replication preserves the border-clamp sampling semantics.
    wh2 = wh + 8  # aligned DMA window size
    ww2 = _round_up(ww, 128) + 128
    padt, padl = TH - 1 + wh, TW - 1 + ww
    padb, padr = wh2, ww2
    hs, ws = h + padt + padb, w + padl + padr
    # pad-limit clamp (the only clamp; see border note above): both taps of
    # any in-range coordinate stay inside the replicated padding
    srow_p = jnp.clip(srow_p + padt, 1.0, hs - 2.0)
    scol_p = jnp.clip(scol_p + padl, 1.0, ws - 2.0)

    nty, ntx = hp // TH, wp // TW
    rows = jnp.arange(hp, dtype=jnp.float32)[:, None]
    cols = jnp.arange(wp, dtype=jnp.float32)[None, :]
    gy = srow_p - rows  # displacement fields
    gx = scol_p - cols
    # per-tile minimal displacement -> integer window base
    gy_t = gy.reshape(nty, TH, ntx, TW)
    gx_t = gx.reshape(nty, TH, ntx, TW)
    half = taps // 2 - 1  # bicubic: shift base so the -1 tap stays inside
    tile_alive = None
    if valid is not None:
        big = jnp.float32(3e8)
        vmask = jnp.pad(jnp.asarray(valid, bool), pad2)
        v_t = vmask.reshape(nty, TH, ntx, TW)
        tile_alive = v_t.any(axis=(1, 3))
        gy_min = jnp.where(v_t, gy_t, big).min(axis=(1, 3))
        gx_min = jnp.where(v_t, gx_t, big).min(axis=(1, 3))
        # all-invalid tiles: any in-bounds base works, samples are masked
        gy_min = jnp.where(gy_min > big * 0.5, 0.0, gy_min)
        gx_min = jnp.where(gx_min > big * 0.5, 0.0, gx_min)
        # rewrite invalid pixels' coordinates to the tile-min displacement
        # (see docstring): their residual lands in [half, half+1) so they
        # never widen a tile's row/column span
        gy_fill = jnp.broadcast_to(gy_min[:, None, :, None],
                                   (nty, TH, ntx, TW)).reshape(hp, wp)
        gx_fill = jnp.broadcast_to(gx_min[:, None, :, None],
                                   (nty, TH, ntx, TW)).reshape(hp, wp)
        srow_p = jnp.where(vmask, srow_p, gy_fill + rows)
        scol_p = jnp.where(vmask, scol_p, gx_fill + cols)
    else:
        gy_min = gy_t.min(axis=(1, 3))
        gx_min = gx_t.min(axis=(1, 3))
    by = jnp.floor(gy_min).astype(jnp.int32) - half
    bx = jnp.floor(gx_min).astype(jnp.int32) - half
    # absolute window start = tile origin + base, clamped into the source
    ty0 = (jnp.arange(nty, dtype=jnp.int32) * TH)[:, None]
    tx0 = (jnp.arange(ntx, dtype=jnp.int32) * TW)[None, :]
    by = jnp.clip(by + ty0, 0, hs - wh2)
    bx = jnp.clip(bx + tx0, 0, ws - ww2)
    # window-relative sample coordinates (broadcast per-tile bases back out)
    byf = jnp.broadcast_to(by.astype(jnp.float32)[:, None, :, None],
                           (nty, TH, ntx, TW)).reshape(hp, wp)
    bxf = jnp.broadcast_to(bx.astype(jnp.float32)[:, None, :, None],
                           (nty, TH, ntx, TW)).reshape(hp, wp)
    py = srow_p - byf
    px = scol_p - bxf
    py2 = px2 = None
    if scol2 is not None:
        gy2 = jnp.pad(jnp.asarray(srow2, jnp.float32) - rows_o, pad2,
                      mode="edge")
        gx2 = jnp.pad(jnp.asarray(scol2, jnp.float32) - cols_o, pad2,
                      mode="edge")
        srow2_p = jnp.clip(gy2 + jnp.arange(hp, dtype=jnp.float32)[:, None]
                           + padt, 1.0, hs - 2.0)
        scol2_p = jnp.clip(gx2 + jnp.arange(wp, dtype=jnp.float32)[None, :]
                           + padl, 1.0, ws - 2.0)
        if tile_alive is not None:
            # same invalid-pixel rewrite for the nearest-sampler field (its
            # residuals feed the same in-kernel span tests)
            srow2_p = jnp.where(vmask, srow2_p, gy_fill + rows)
            scol2_p = jnp.where(vmask, scol2_p, gx_fill + cols)
        py2 = srow2_p - byf
        px2 = scol2_p - bxf
    if tile_alive is not None:
        # dead-tile sentinel: the kernel tests by < 0 and skips DMA + taps
        by = jnp.where(tile_alive, by, -1)
    return (sub, nty, ntx, wh, ww, padt, padl, padb, padr, hp, wp,
            by, bx, py, px, py2, px2)


_NARROW_DEFAULT = int(__import__("os").environ.get(
    "MESHRECON_WARP_NARROW", "-1"))  # A/B knob: 0 disables the narrow path
# Mid-tier COLUMN specialization size (like the narrow-row path but for the
# lane axis, where a sloped projection field spreads several pixels over
# 128 lanes — wider than the row budget but usually well under the full
# r_col enumeration). A/B knob: 0 disables, -1 auto.
_NARROW_COLS_DEFAULT = int(__import__("os").environ.get(
    "MESHRECON_WARP_NARROW_COLS", "-1"))
# Column-count threshold above which the per-dx residual-span guard runs
# (see the measured tradeoffs in the kernel comment). A/B knob.
_GUARD_COLS = int(__import__("os").environ.get(
    "MESHRECON_WARP_GUARD_COLS", "20"))
# import-time (env-resolved) values: what a config sentinel restores, so one
# study config's override cannot leak into the next (apply_kernel_knobs)
DEFAULT_NARROW = _NARROW_DEFAULT
DEFAULT_NARROW_COLS = _NARROW_COLS_DEFAULT
DEFAULT_GUARD_COLS = _GUARD_COLS


def set_warp_knobs(narrow: int | None = None, narrow_cols: int | None = None,
                   guard_cols: int | None = None):
    """Set the warp-kernel specialization knobs mid-process (A/B plumbing,
    same contract as raster.set_tile_dims): clears jit caches so traces
    that baked the old values cannot go stale. -1 = auto, 0 = disabled."""
    global _NARROW_DEFAULT, _NARROW_COLS_DEFAULT, _GUARD_COLS
    changed = False
    if narrow is not None and int(narrow) != _NARROW_DEFAULT:
        _NARROW_DEFAULT = int(narrow)
        changed = True
    if narrow_cols is not None and int(narrow_cols) != _NARROW_COLS_DEFAULT:
        _NARROW_COLS_DEFAULT = int(narrow_cols)
        changed = True
    if guard_cols is not None and int(guard_cols) != _GUARD_COLS:
        _GUARD_COLS = int(guard_cols)
        changed = True
    if changed:
        jax.clear_caches()


def _narrow_size(narrow: int, taps: int) -> int:
    """Resolve the narrow-path enumeration size: -1 = auto (6 for bilinear,
    8 for bicubic — the bicubic support eats taps/2 = 2 of the span), 0 =
    disabled, else the given size."""
    if narrow == -1:
        narrow = _NARROW_DEFAULT
    if narrow == -1:
        return 6 if taps == 2 else 8
    return narrow


def _narrow_cols_size(narrow_c: int, taps: int) -> int:
    """Resolve the mid-tier column enumeration size (-1 auto / 0 off)."""
    if narrow_c == -1:
        narrow_c = _NARROW_COLS_DEFAULT
    if narrow_c == -1:
        return 9 if taps == 2 else 11
    return narrow_c


@functools.partial(
    jax.jit,
    static_argnames=("r_row", "r_col", "taps", "narrow", "narrow_cols",
                     "interpret"),
)
def tile_warp_sample(src, scol, srow, valid=None, r_row: int = R_ROW,
                     r_col: int = R_COL, taps: int = 2, narrow: int = -1,
                     narrow_cols: int = -1, interpret: bool = False):
    """Resample ``src`` at continuous (scol, srow) per output pixel.

    src: (H, W) float32 source image; scol, srow: (Ho, Wo) float32 sample
    coordinates in source pixel units. Returns (Ho, Wo) float32. taps=2 is
    bilinear (matches ``fragment.bilinear_sample`` incl. border clamp to f32
    rounding); taps=4 is Keys bicubic a=-0.75 (matches
    ``remap.bicubic_sample``). Valid wherever the within-tile spread of
    (srow - row, scol - col) is <= (r_row, r_col); larger residuals clamp
    toward the window edge.

    valid (optional, (Ho, Wo) bool): pixels whose coordinates are
    meaningful. Invalid pixels (e.g. background fragments projected to
    arbitrary positions) are EXCLUDED from the per-tile base estimation so
    they cannot blow a tile's residual budget; their own samples are
    undefined (callers mask them downstream).
    """
    src = jnp.asarray(src, jnp.float32)
    h, w = src.shape
    prep = _prep_warp_coords(scol, srow, valid, h, w, r_row, r_col, taps)
    (sub, nty, ntx, wh, ww, padt, padl, padb, padr, hp, wp,
     by, bx, py, px, _, _) = prep
    src_p = jnp.pad(src, ((padt, padb), (padl, padr)), mode="edge")
    ho, wo = scol.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty // sub, ntx),
        in_specs=[
            pl.BlockSpec((TH * sub, TW), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH * sub, TW), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TH * sub, TW), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sub, wh + 8, _round_up(ww, 128) + 128), jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((sub,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_warp_tile_kernel, wh, ww, taps, sub,
                          _narrow_size(narrow, taps),
                          _narrow_cols_size(narrow_cols, taps)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(by.reshape(-1), bx.reshape(-1), py, px, src_p)
    return out[:ho, :wo]


@functools.partial(
    jax.jit,
    static_argnames=("r_row", "r_col", "taps", "nearest_a", "narrow",
                     "narrow_cols", "interpret"),
)
def tile_warp_sample2(src_a, src_b, scol, srow, valid=None,
                      r_row: int = R_ROW, r_col: int = R_COL, taps: int = 2,
                      nearest_a: bool = True, narrow: int = -1,
                      narrow_cols: int = -1,
                      scol_a=None, srow_a=None,
                      interpret: bool = False):
    """Sample TWO same-shape sources at ONE coordinate field in one kernel
    pass (see :func:`_warp_tile_kernel2`). Returns (out_a, out_b).

    src_a is sampled NEAREST (``nearest_a=True``, default — matches
    ``fragment.nearest_sample``) or with the shared bilinear weights;
    src_b is always taps-interpolated at the exact coordinates (matches
    ``fragment.bilinear_sample`` / ``remap.bicubic_sample``).
    """
    src_a = jnp.asarray(src_a, jnp.float32)
    src_b = jnp.asarray(src_b, jnp.float32)
    h, w = src_b.shape
    # nearest-sampler coordinates: round the RAW inputs (exact integers in
    # f32) so the kernel's one-hot weights hit the same texel as
    # fragment.nearest_sample at every .5 tie (see _prep_warp_coords);
    # scol_a/srow_a let the batched wrapper round BEFORE its stride
    # offsets (rounding after would re-expose the tie to f32 rounding)
    scol_r = (jnp.asarray(scol_a, jnp.float32) if scol_a is not None
              else jnp.floor(jnp.asarray(scol, jnp.float32) + 0.5))
    srow_r = (jnp.asarray(srow_a, jnp.float32) if srow_a is not None
              else jnp.floor(jnp.asarray(srow, jnp.float32) + 0.5))
    prep = _prep_warp_coords(scol, srow, valid, h, w, r_row, r_col, taps,
                             scol2=scol_r if nearest_a else None,
                             srow2=srow_r if nearest_a else None)
    (sub, nty, ntx, wh, ww, padt, padl, padb, padr, hp, wp,
     by, bx, py, px, pya, pxa) = prep
    if pya is None:
        pya, pxa = py, px  # unused by the kernel when nearest_a=False
    pads = ((padt, padb), (padl, padr))
    srca_p = jnp.pad(src_a, pads, mode="edge")
    srcb_p = jnp.pad(src_b, pads, mode="edge")
    ho, wo = scol.shape

    blk = pl.BlockSpec((TH * sub, TW), lambda i, j, *_: (i, j),
                       memory_space=pltpu.VMEM)
    win_shape = (sub, wh + 8, _round_up(ww, 128) + 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty // sub, ntx),
        in_specs=[blk, blk, blk, blk,
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[blk, blk],
        scratch_shapes=[
            pltpu.VMEM(win_shape, jnp.float32),
            pltpu.VMEM(win_shape, jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((sub,)),
            pltpu.SemaphoreType.DMA((sub,)),
        ],
    )
    out_a, out_b = pl.pallas_call(
        functools.partial(_warp_tile_kernel2, wh, ww, taps, sub, nearest_a,
                          _narrow_size(narrow, taps),
                          _narrow_cols_size(narrow_cols, taps)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.float32)],
        interpret=interpret,
    )(by.reshape(-1), bx.reshape(-1), py, px, pya, pxa, srca_p, srcb_p)
    return out_a[:ho, :wo], out_b[:ho, :wo]


@functools.partial(
    jax.jit,
    static_argnames=("r_row", "r_col", "taps", "nearest_a", "interpret"),
)
def tile_warp_sample2_batched(srcs_a, srcs_b, scols, srows, valid=None,
                              r_row: int = R_ROW, r_col: int = R_COL,
                              taps: int = 2, nearest_a: bool = True,
                              interpret: bool = False):
    """Batched dual-source resample: two (..., H, W) source stacks sampled
    at ONE (..., H, W) coordinate field -> two (..., H, W) outputs, all in
    ONE kernel invocation (vertical stacking + guard bands exactly as
    :func:`tile_warp_sample_batched`)."""
    lead = srcs_b.shape[:-2]
    h, w = srcs_b.shape[-2:]
    srcs_a = srcs_a.reshape((-1, h, w))
    srcs_b = srcs_b.reshape((-1, h, w))
    scols = scols.reshape((-1, h, w))
    srows = srows.reshape((-1, h, w))
    vflat = None if valid is None else jnp.asarray(valid).reshape((-1, h, w))
    k = srcs_b.shape[0]
    if h % TH != 0:
        # output tiles would straddle images: two stacked single passes
        # (the fallback path — correctness over speed at odd sizes)
        both = tile_warp_sample_batched(
            jnp.concatenate([srcs_a, srcs_b], axis=0),
            jnp.concatenate(
                [jnp.floor(scols + 0.5) if nearest_a else scols, scols],
                axis=0),
            jnp.concatenate(
                [jnp.floor(srows + 0.5) if nearest_a else srows, srows],
                axis=0),
            valid=None if vflat is None
            else jnp.concatenate([vflat] * 2, axis=0),
            r_row=r_row, r_col=r_col, taps=taps, interpret=interpret)
        return (both[:k].reshape(lead + (h, w)),
                both[k:].reshape(lead + (h, w)))

    gt, gb = 24, 48  # top/bottom guards; stride stays a multiple of 8
    stride = gt + h + gb

    def stack(srcs):
        return jnp.concatenate(
            [jnp.broadcast_to(srcs[:, :1], (k, gt, w)),
             srcs,
             jnp.broadcast_to(srcs[:, -1:], (k, gb, w))], axis=1
        ).reshape(k * stride, w)

    over = 12.0  # allowed smooth overhang into the replicated guards
    offs = (jnp.arange(k, dtype=jnp.float32) * stride)[:, None, None]
    srow_local = jnp.clip(srows, -over, h - 1 + over)
    srow = (srow_local + gt + offs).reshape(k * h, w)
    # nearest-sampler coords: round LOCALLY, then shift by the exact
    # integer offsets — rounding the shifted field would re-expose .5
    # ties to f32 rounding of (coord + offset)
    srow_a = (jnp.floor(srow_local + 0.5) + gt + offs).reshape(k * h, w)
    scol_a = jnp.floor(scols + 0.5).reshape(k * h, w)
    out_a, out_b = tile_warp_sample2(
        stack(srcs_a), stack(srcs_b), scols.reshape(k * h, w), srow,
        valid=None if vflat is None else vflat.reshape(k * h, w),
        r_row=r_row, r_col=r_col, taps=taps, nearest_a=nearest_a,
        scol_a=scol_a if nearest_a else None,
        srow_a=srow_a if nearest_a else None,
        interpret=interpret)
    return out_a.reshape(lead + (h, w)), out_b.reshape(lead + (h, w))


def tile_warp_bilinear(src, scol, srow, r_row: int = R_ROW,
                       r_col: int = R_COL, interpret: bool = False):
    """Bilinear tile-warp (see tile_warp_sample)."""
    return tile_warp_sample(src, scol, srow, r_row=r_row, r_col=r_col,
                            taps=2, interpret=interpret)


def tile_warp_bicubic(src, scol, srow, r_row: int = R_ROW,
                      r_col: int = R_COL, interpret: bool = False):
    """Keys bicubic (a=-0.75) tile-warp, the OpenCV CV_INTER_CUBIC kernel
    (reference remap use: util.cpp:390-403)."""
    return tile_warp_sample(src, scol, srow, r_row=r_row, r_col=r_col,
                            taps=4, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("r_row", "r_col", "taps", "interpret")
)
def tile_warp_flow(image, flow, r_row: int = R_ROW, r_col: int = R_COL,
                   taps: int = 2, interpret: bool = False):
    """Warp ``image`` by a dense flow field (same contract as
    remap.bilinear_warp / remap.flow_remap): out(r, c) is the image sampled
    at (c + fx, r + fy)."""
    h, w = image.shape
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    return tile_warp_sample(
        image, cols + flow[..., 0], rows + flow[..., 1],
        r_row=r_row, r_col=r_col, taps=taps, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("r_row", "r_col", "taps", "interpret")
)
def tile_warp_sample_batched(srcs, scols, srows, valid=None,
                             r_row: int = R_ROW, r_col: int = R_COL,
                             taps: int = 2, interpret: bool = False):
    """Batched resample: (..., H, W) sources, matching per-image coordinate
    fields (source pixel units, local to each image) -> (..., H, W).

    ``jax.vmap`` over the Pallas call costs ~3x the kernel itself on v5e
    (measured: one 640x480 bicubic warp 0.47 ms, vmapped K=3 ~1.4 ms each).
    Instead all leading axes flatten and the images stack VERTICALLY into
    one (N*stride, W) source, and ONE kernel invocation samples them all:
    H is a multiple of the 8-row tile, so no output tile straddles two
    images and the per-tile base machinery is unaffected.

    Guard bands of edge-replicated rows separate the images. Two jobs:
    (1) border coordinates may OVERHANG an image by up to 12 rows and
        still sample smoothly into its own replicated rows — a hard clamp
        at the image edge would flatten the coordinate field and blow the
        tile residual budget (exactly the artifact the unbatched warp's
        edge-pad design avoids, see the border note in tile_warp_sample);
    (2) the DMA window extends past the sampled row by up to wh2-1 rows
        and residual-budget overflow clamps taps to the window edge —
        the guards keep every reachable tap inside the image's own block.
    Bound check (worst case taps=4: wh=32, wh2=40, 8-row DMA alignment):
    reads stay within [min_srow-9, min_srow+30] ⊂ [-21, h-1+42] local.
    This matches the unbatched border-clamp semantics to within an
    O(1e-3)-pixel coordinate epsilon at the extreme border rows.
    """
    lead = srcs.shape[:-2]
    h, w = srcs.shape[-2:]
    srcs = srcs.reshape((-1, h, w))
    scols = scols.reshape((-1, h, w))
    srows = srows.reshape((-1, h, w))
    vflat = None if valid is None else jnp.asarray(valid).reshape((-1, h, w))
    k = srcs.shape[0]
    if h % TH != 0:
        # output tiles would straddle images: fall back to the vmapped kernel
        if vflat is None:
            out = jax.vmap(
                lambda im, sc, sr: tile_warp_sample(
                    im, sc, sr, r_row=r_row, r_col=r_col, taps=taps,
                    interpret=interpret)
            )(srcs, scols, srows)
        else:
            out = jax.vmap(
                lambda im, sc, sr, v: tile_warp_sample(
                    im, sc, sr, valid=v, r_row=r_row, r_col=r_col, taps=taps,
                    interpret=interpret)
            )(srcs, scols, srows, vflat)
        return out.reshape(lead + (h, w))

    gt, gb = 24, 48  # top/bottom guards; stride stays a multiple of 8
    stride = gt + h + gb
    src = jnp.concatenate(
        [jnp.broadcast_to(srcs[:, :1], (k, gt, w)),
         srcs,
         jnp.broadcast_to(srcs[:, -1:], (k, gb, w))], axis=1
    ).reshape(k * stride, w)

    over = 12.0  # allowed smooth overhang into the replicated guards
    srow_local = jnp.clip(srows, -over, h - 1 + over)
    srow = (srow_local + gt
            + (jnp.arange(k, dtype=jnp.float32) * stride)[:, None, None]
            ).reshape(k * h, w)
    out = tile_warp_sample(src, scols.reshape(k * h, w), srow,
                           valid=None if vflat is None
                           else vflat.reshape(k * h, w),
                           r_row=r_row, r_col=r_col, taps=taps,
                           interpret=interpret)
    return out.reshape(lead + (h, w))


@functools.partial(
    jax.jit, static_argnames=("r_row", "r_col", "taps", "interpret")
)
def tile_warp_flow_batched(images, flows, r_row: int = R_ROW,
                           r_col: int = R_COL, taps: int = 2,
                           interpret: bool = False):
    """Batched flow warp: (..., H, W) images, (..., H, W, 2) flows ->
    (..., H, W). All leading axes flatten into one vertically-stacked
    kernel invocation (see tile_warp_sample_batched)."""
    h, w = images.shape[-2:]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    return tile_warp_sample_batched(
        images, cols + flows[..., 0], rows + flows[..., 1],
        r_row=r_row, r_col=r_col, taps=taps, interpret=interpret)
