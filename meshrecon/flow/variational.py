"""Coarse-to-fine variational (Horn-Schunck) dense optical flow.

The reference's default flow algorithm is OpenCV's variational refinement
(flow.cpp:27-30), a Horn-Schunck-family energy minimized with relaxation
sweeps. Our TPU-native scheme is the classic pyramidal HS:

  at each pyramid level (coarse -> fine):
    warp `next` by the upsampled flow estimate (bilinear)
    linearize: It = warped - prev, (Ix, Iy) from the warped/prev average
    run N weighted-Jacobi iterations of the HS update:
        ubar   = neighborhood average of u  (the HS Laplacian stencil)
        num    = Ix*ubar + Iy*vbar + It
        u      = ubar - Ix * num / (alpha^2 + Ix^2 + Iy^2)

Jacobi (not SOR) keeps every sweep fully data-parallel on the VPU; the whole
solver is one jitted program of fused elementwise ops and 4 shifted adds per
sweep — no gathers, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from meshrecon.flow.pyramid import pyr_down, pyr_up
from meshrecon.flow.remap import bilinear_warp


def _tpu_backend() -> bool:
    """True when the default backend is a real TPU (incl. the axon tunnel).

    Decided at trace time: the Pallas kernels compile only for Mosaic, so CPU
    runs (the test suite's virtual mesh) take the pure-XLA path.
    """
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# Pallas production kernels (tile-base-offset warp + banded VMEM Jacobi).
# Minimum level size for the kernel path: below this the (8, 128) tile
# padding dominates and plain XLA is faster.
_PALLAS_MIN_DIM = 64


def _pad_hw(u):
    pad = [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(u, pad, mode="edge")


def _hs_average(u):
    """Horn-Schunck neighborhood average: 4-neighbors 1/6, diagonals 1/12.
    Operates on the last two axes; leading axes are batch."""
    p = _pad_hw(u)
    s4 = (p[..., :-2, 1:-1] + p[..., 2:, 1:-1]
          + p[..., 1:-1, :-2] + p[..., 1:-1, 2:])
    s8 = (p[..., :-2, :-2] + p[..., :-2, 2:]
          + p[..., 2:, :-2] + p[..., 2:, 2:])
    return s4 / 6.0 + s8 / 12.0


def _gradients(a, b):
    """Spatial gradients of the temporal average (central differences)."""
    m = 0.5 * (a + b)
    p = _pad_hw(m)
    ix = (p[..., 1:-1, 2:] - p[..., 1:-1, :-2]) * 0.5
    iy = (p[..., 2:, 1:-1] - p[..., :-2, 1:-1]) * 0.5
    return ix, iy


def _hs_sweeps(prev, warped, u0, v0, alpha2, iters):
    """Jacobi relaxation given the warped image (linearized at (u0, v0))."""
    ix, iy = _gradients(prev, warped)
    it = warped - prev
    denom = alpha2 + ix * ix + iy * iy

    def body(_, uv):
        u, v = uv
        ub = _hs_average(u)
        vb = _hs_average(v)
        num = (ix * (ub - u0) + iy * (vb - v0) + it) / denom
        return ub - ix * num, vb - iy * num

    return jax.lax.fori_loop(0, iters, body, (u0, v0))


def _hs_level(prev, next_, u0, v0, alpha2, iters, engine: str = "xla",
              solver: str = "jacobi", cycles: int = 2):
    """One warp iteration: linearize around (u0, v0) and relax the total flow.

    Data term: Ix*(u - u0) + Iy*(v - v0) + It = 0 with It evaluated at the
    warp point — omitting the -u0 anchoring is the classic pyramidal-HS bug.

    The warp handles UNBOUNDED total flow (a clamped shift-warp here once
    corrupted a 20 px translation into 36 px): either a true gather (XLA
    engine) or the tile-base-offset kernel whose per-tile base absorbs any
    smooth displacement (flow/tile_warp.py). engine == "pallas" additionally
    runs the relaxation in the banded VMEM kernel (flow/pallas_jacobi.py).
    """
    if engine == "pallas" and min(next_.shape[-2:]) >= _PALLAS_MIN_DIM:
        from meshrecon.flow.tile_warp import (tile_warp_flow,
                                              tile_warp_flow_batched)

        # Reduced residual budget for the SOLVER's internal warps: the
        # incremental flow a level warps with is relaxed/upsampled, so its
        # within-tile spread is small — especially across the 8-row tile
        # height. (r_row=6, r_col=8) cuts the kernel's static tap
        # enumeration from 289 to 99 FMA blocks; overflow clamps degrade
        # individual samples at motion discontinuities, which the variance
        # channel already downweights (koule full e2e med unchanged).
        uv = jnp.stack([u0, v0], axis=-1)
        if next_.ndim >= 3:
            warped = tile_warp_flow_batched(next_, uv, r_row=6, r_col=8)
        else:
            warped = tile_warp_flow(next_, uv, r_row=6, r_col=8)
        total_px = 1
        for dd in next_.shape:
            total_px *= dd
        if solver == "mg":
            from meshrecon.flow.multigrid import hs_solve_mg

            u, v = hs_solve_mg(prev, warped, u0, v0, alpha2, cycles=cycles)
            return u, v, warped
        if next_.shape[-2] % 8 == 0 and total_px > 2_000_000:
            # banded VMEM relaxation for LARGE stacks only: XLA fuses the
            # whole sweep loop VMEM-resident while the working set fits
            # (K=3 at 640x480: 1.3 ms/60 sweeps — faster than the kernel),
            # but goes HBM-bound beyond (12 images: 6.8 ms); the kernel
            # runs 12 sweeps per HBM round trip regardless of stack size
            from meshrecon.flow.pallas_jacobi import hs_jacobi

            ix, iy = _gradients(prev, warped)
            it = warped - prev
            cc = it - ix * u0 - iy * v0
            u, v = hs_jacobi(ix, iy, cc, u0, v0, alpha2, iters=iters)
            return u, v, warped
    elif next_.ndim >= 3:
        h, w = next_.shape[-2:]
        uv = jnp.stack([u0, v0], axis=-1)
        warped = jax.vmap(bilinear_warp)(
            next_.reshape(-1, h, w), uv.reshape(-1, h, w, 2)
        ).reshape(next_.shape)
    else:
        warped = bilinear_warp(next_, jnp.stack([u0, v0], axis=-1))
    if solver == "mg":
        from meshrecon.flow.multigrid import hs_solve_mg

        u, v = hs_solve_mg(prev, warped, u0, v0, alpha2, cycles=cycles)
    else:
        u, v = _hs_sweeps(prev, warped, u0, v0, alpha2, iters)
    return u, v, warped


# NOTE (round 2): a residual re-warp against the already-warped image
# (shift-decomposed, bounded) was attempted to avoid the second gather per
# level; it degraded flow quality in tests — per-level residuals after a full
# relaxation pass are not reliably small. Revisit inside the banded VMEM
# kernel where per-SWEEP residuals are bounded.


@functools.partial(
    jax.jit,
    static_argnames=("levels", "iters", "warps", "alpha", "min_size",
                     "engine", "solver", "cycles"),
)
def variational_flow(
    prev,
    next_,
    levels: int = 6,
    iters: int = 60,
    warps: int = 2,
    alpha: float = 12.0,
    min_size: int = 12,
    engine: str = "auto",
    solver: str = "jacobi",
    cycles: int = 2,
):
    """Dense flow prev -> next: next(x + flow(x)) ~= prev(x).

    prev: (H, W) grayscale float (0..255 scale); next_: (H, W) or a BATCH
    (K, H, W) of targets sharing the same source. Returns (H, W, 2) (or
    (K, H, W, 2)) float32 (fx, fy) in pixels, the same convention as the
    reference's cv::DenseOpticalFlow::calc output (flow.cpp:31-32).

    The batched form solves all K flows in ONE program: relaxation sweeps
    and pyramid ops are elementwise (K just widens them), and the warps use
    the vertically-stacked tile-warp kernel — one Pallas launch per level
    instead of K (jax.vmap over a pallas_call measured ~3x the kernel cost
    per element on v5e).

    engine: "auto" (Pallas kernels on TPU, XLA elsewhere), "pallas", "xla".
    solver: "jacobi" (default) runs ``iters`` fused relaxation sweeps per
    warp — a single fori_loop the compiler keeps VMEM-resident, the
    TPU-optimal form. "mg" runs ``cycles`` multigrid W-cycles
    (flow/multigrid.py): 3x less arithmetic and better converged, but its
    coarse-level visits fragment into hundreds of small XLA ops and
    measured 20 ms vs 8.1 ms inside the fused update on v5e — an option
    and a reference solver, not the default.
    """
    if engine == "auto":
        engine = "pallas" if _tpu_backend() else "xla"
    prev = jnp.asarray(prev, jnp.float32)
    next_ = jnp.asarray(next_, jnp.float32)
    alpha2 = float(alpha * alpha)

    pyr_a = [prev]
    pyr_b = [next_]
    for _ in range(levels - 1):
        if min(pyr_a[-1].shape[-2:]) <= min_size:
            break
        pyr_a.append(pyr_down(pyr_a[-1]))
        pyr_b.append(pyr_down(pyr_b[-1]))

    u = jnp.zeros_like(pyr_b[-1])
    v = jnp.zeros_like(pyr_b[-1])
    for lvl in range(len(pyr_a) - 1, -1, -1):
        a, b = pyr_a[lvl], pyr_b[lvl]
        if u.shape[-2:] != a.shape[-2:]:
            # pyr_up preserves magnitude; flow VALUES double at 2x resolution
            u = pyr_up(u, a.shape[-2:]) * 2.0
            v = pyr_up(v, a.shape[-2:]) * 2.0
        for _ in range(warps):
            u, v, _ = _hs_level(a, b, u, v, alpha2, iters, engine=engine,
                                solver=solver, cycles=cycles)
    return jnp.stack([u, v], axis=-1)
