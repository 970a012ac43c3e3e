"""On-TPU kernel equality sweep (`make verify-tpu`).

The CI suite runs every Pallas kernel in interpret mode only (the test host
has no TPU), so "bit-exact on hardware" claims used to rest on one-off
manual runs. This driver re-checks each production kernel against its XLA
reference ON THE REAL CHIP and asserts, so a Mosaic lowering regression is
caught the same day, not at the next bench:

  1. tile_warp bilinear/bicubic vs the gather-based samplers
  2. stacked-batched tile_warp vs per-image kernels
  3. hs_jacobi (banded VMEM relaxation) vs variational._hs_sweeps
  4. multigrid solver vs a long-converged Jacobi fixed point
  5. binned raster (one-level / two-level / camera-batched) vs XLA raster

Exits nonzero on any failure. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_tpu.py
"""

from __future__ import annotations

import sys

import numpy as np

FAILURES = []


def check(name, a, b, atol, interior=None):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if interior:
        sl = (Ellipsis,) + tuple(slice(interior, -interior) for _ in range(2))
        a, b = a[sl], b[sl]
    diff = float(np.abs(a - b).max()) if a.size else 0.0
    status = "ok" if diff <= atol else "FAIL"
    print(f"{name:<44} max|diff| {diff:10.2e}  (atol {atol:.0e})  {status}",
          flush=True)
    if diff > atol:
        FAILURES.append(name)


def smooth_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h // 8 + 2, w // 8 + 2))
    yy = np.linspace(0, img.shape[0] - 1.001, h)
    xx = np.linspace(0, img.shape[1] - 1.001, w)
    yi, xi = np.floor(yy).astype(int), np.floor(xx).astype(int)
    fy, fx = (yy - yi)[:, None], (xx - xi)[None, :]
    v = (img[yi][:, xi] * (1 - fy) * (1 - fx)
         + img[yi][:, xi + 1] * (1 - fy) * fx
         + img[yi + 1][:, xi] * fy * (1 - fx)
         + img[yi + 1][:, xi + 1] * fy * fx)
    v -= v.min()
    return (v * (255.0 / max(v.max(), 1e-6))).astype(np.float32)


def main():
    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("verify-tpu: axon TPU tunnel unreachable (relay port 8083 "
              "down) — backend init would hang, not fail; aborting",
              file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    print(f"# devices: {jax.devices()}", flush=True)
    if jax.devices()[0].platform not in ("tpu", "axon"):
        print("no TPU attached; this sweep is meaningless on CPU",
              file=sys.stderr)
        return 2

    # --- 1/2: tile warps vs gather samplers --------------------------------
    from meshrecon.flow.tile_warp import (tile_warp_sample,
                                          tile_warp_sample_batched)
    from meshrecon.raster.fragment import bilinear_sample
    from meshrecon.flow.remap import bicubic_sample

    h, w = 240, 320
    img = smooth_image(h, w, seed=1)
    rng = np.random.default_rng(2)
    # smooth within-tile displacement field with a large global offset
    gy = (smooth_image(h, w, seed=3) / 255.0 - 0.5) * 6.0 + 17.0
    gx = (smooth_image(h, w, seed=4) / 255.0 - 0.5) * 6.0 - 23.0
    rows = np.arange(h, dtype=np.float32)[:, None]
    cols = np.arange(w, dtype=np.float32)[None, :]
    srow = jnp.asarray(rows + gy)
    scol = jnp.asarray(cols + gx)
    imgj = jnp.asarray(img)

    ref_bl = bilinear_sample(imgj, scol, srow)
    ref_bc = bicubic_sample(imgj, scol, srow)
    check("tile_warp bilinear vs gather", tile_warp_sample(imgj, scol, srow),
          ref_bl, 5e-3, interior=8)
    check("tile_warp bicubic vs gather",
          tile_warp_sample(imgj, scol, srow, taps=4), ref_bc, 2e-2,
          interior=8)

    stack = jnp.stack([imgj, imgj[::-1]])
    scols = jnp.stack([scol, scol])
    srows = jnp.stack([srow, srow])
    got = tile_warp_sample_batched(stack, scols, srows)
    ref0 = tile_warp_sample(imgj, scol, srow)
    ref1 = tile_warp_sample(imgj[::-1], scol, srow)
    check("tile_warp batched[0] vs single", got[0], ref0, 5e-3, interior=8)
    check("tile_warp batched[1] vs single", got[1], ref1, 5e-3, interior=8)

    # --- 2b: dual-source projection kernel (shadow + intensity, one pass) --
    from meshrecon.flow.tile_warp import (tile_warp_sample2,
                                          tile_warp_sample2_batched)
    from meshrecon.raster.fragment import nearest_sample

    other = jnp.asarray(smooth_image(h, w, seed=6))
    ref_nn = nearest_sample(other, scol, srow)
    got_a, got_b = tile_warp_sample2(other, imgj, scol, srow)
    check("dual kernel nearest(A) vs gather", got_a, ref_nn, 5e-3, interior=8)
    check("dual kernel bilinear(B) vs gather", got_b, ref_bl, 5e-3,
          interior=8)
    got_a, got_b = tile_warp_sample2(other, imgj, scol, srow, nearest_a=False)
    check("dual kernel shared-bilinear(A)", got_a,
          bilinear_sample(other, scol, srow), 5e-3, interior=8)
    check("dual kernel shared-bilinear(B)", got_b, ref_bl, 5e-3, interior=8)
    gb_a, gb_b = tile_warp_sample2_batched(
        jnp.stack([other, other[::-1]]), stack, scols, srows)
    check("dual batched[1] A vs single", gb_a[1],
          nearest_sample(other[::-1], scol, srow), 5e-3, interior=8)
    check("dual batched[1] B vs single", gb_b[1], ref1, 5e-3, interior=8)

    # --- 2c: valid-masked dual warp (dead-tile skip + coordinate cleaning,
    # the production projection path) ---------------------------------------
    vmask = np.ones((h, w), bool)
    vmask[:32] = False                 # four full dead tile rows
    vmask[::11, ::17] = False          # scattered invalid pixels, live tiles
    scol_g = np.asarray(scol).copy()
    scol_g[~vmask] = 7e4               # garbage coords at invalid pixels
    va, vb = tile_warp_sample2(other, imgj, jnp.asarray(scol_g), srow,
                               valid=jnp.asarray(vmask))
    sel = vmask.copy()
    sel[:8] = sel[-8:] = False
    sel[:, :8] = sel[:, -8:] = False
    check("dual masked A valid px vs gather", np.asarray(va)[sel],
          np.asarray(ref_nn)[sel], 5e-3)
    check("dual masked B valid px vs gather", np.asarray(vb)[sel],
          np.asarray(ref_bl)[sel], 5e-3)
    check("dual masked dead tiles are zero", np.asarray(vb)[:32],
          np.zeros((32, w), np.float32), 0.0)

    # --- 3: banded VMEM Jacobi vs XLA sweeps -------------------------------
    from meshrecon.flow.pallas_jacobi import hs_jacobi
    from meshrecon.flow.variational import _hs_sweeps, _gradients

    hh, ww = 480, 640  # large enough to band (3 MB field budget)
    a = jnp.asarray(smooth_image(hh, ww, seed=5))
    b = jnp.roll(a, (2, -3), axis=(0, 1))
    u0 = jnp.full((hh, ww), 0.5)
    v0 = jnp.full((hh, ww), -0.25)
    ix, iy = _gradients(a, b)
    cc = (b - a) - ix * u0 - iy * v0
    uk, vk = hs_jacobi(ix, iy, cc, u0, v0, 144.0, iters=24)
    ux, vx = _hs_sweeps(a, b, u0, v0, 144.0, 24)
    check("hs_jacobi u vs XLA sweeps", uk, ux, 1e-3)
    check("hs_jacobi v vs XLA sweeps", vk, vx, 1e-3)

    # --- 3b: fused setup+sweeps kernel vs XLA tail -------------------------
    from meshrecon.flow.pallas_jacobi import hs_level_fused

    uf, vf = hs_level_fused(a, b, u0, v0, 144.0, iters=24)
    check("hs_level_fused u vs XLA sweeps", uf, ux, 1e-3)
    check("hs_level_fused v vs XLA sweeps", vf, vx, 1e-3)

    # batched K=3 (the production stacked form, > 2M px threshold)
    bb3 = jnp.stack([b, jnp.roll(a, (-1, 4), axis=(0, 1)),
                     jnp.roll(a, (3, 2), axis=(0, 1))])
    ub3 = jnp.broadcast_to(u0, bb3.shape)
    vb3 = jnp.broadcast_to(v0, bb3.shape)
    uf3, vf3 = hs_level_fused(a, bb3, ub3, vb3, 144.0, iters=24)
    ux3, vx3 = _hs_sweeps(a[None], bb3, ub3, vb3, 144.0, 24)
    check("hs_level_fused batched u vs XLA", uf3, ux3, 1e-3)
    check("hs_level_fused batched v vs XLA", vf3, vx3, 1e-3)

    # Chebyshev: iters <= 24 runs ONE chunk (halo == iters, no restart),
    # so the fused kernel must match the global XLA schedule EXACTLY —
    # this is the production full-res solver path
    from meshrecon.flow.variational import _hs_sweeps_cheb

    ucf, vcf = hs_level_fused(a, b, u0, v0, 144.0, iters=20, solver="cheb")
    uxc, vxc = _hs_sweeps_cheb(a, b, u0, v0, 144.0, 20)
    check("hs_level_fused cheb20 u vs XLA cheb", ucf, uxc, 2e-3)
    check("hs_level_fused cheb20 v vs XLA cheb", vcf, vxc, 2e-3)
    ubc3, vbc3 = hs_level_fused(a, bb3, ub3, vb3, 144.0, iters=20,
                                solver="cheb")
    uxc3, vxc3 = _hs_sweeps_cheb(a[None], bb3, ub3, vb3, 144.0, 20)
    check("hs_level_fused cheb20 batched u vs XLA", ubc3, uxc3, 2e-3)
    check("hs_level_fused cheb20 batched v vs XLA", vbc3, vxc3, 2e-3)

    # convergence guard (unchanged): cheb20 must still beat jacobi60
    ustar, vstar = _hs_sweeps(a, b, u0, v0, 144.0, 1200)
    err_cf = float(jnp.abs(ucf - ustar)[8:-8, 8:-8].max())
    u60b, _ = _hs_sweeps(a, b, u0, v0, 144.0, 60)
    err_j60 = float(jnp.abs(u60b - ustar)[8:-8, 8:-8].max())
    status = "ok" if err_cf <= max(err_j60, 1e-3) else "FAIL"
    print(f"{'fused cheb20 convergence vs jacobi60':<44} cheb {err_cf:.2e} "
          f"j60 {err_j60:.2e}  {status}", flush=True)
    if status == "FAIL":
        FAILURES.append("fused cheb convergence")

    # --- 4: multigrid vs converged Jacobi ----------------------------------
    from meshrecon.flow.multigrid import hs_solve_mg

    u_star, v_star = _hs_sweeps(a, b, u0, v0, 144.0, 1200)
    um, vm = hs_solve_mg(a, b, u0, v0, 144.0, cycles=2)
    u60, v60 = _hs_sweeps(a, b, u0, v0, 144.0, 60)
    err_mg = float(jnp.abs(um - u_star)[8:-8, 8:-8].max())
    err_j = float(jnp.abs(u60 - u_star)[8:-8, 8:-8].max())
    status = "ok" if err_mg <= max(err_j, 1e-3) else "FAIL"
    print(f"{'multigrid convergence vs jacobi60':<44} mg {err_mg:.2e} "
          f"j60 {err_j:.2e}  {status}", flush=True)
    if status == "FAIL":
        FAILURES.append("multigrid convergence")

    # --- 5: binned rasters vs XLA raster -----------------------------------
    import __graft_entry__ as g
    from meshrecon.raster.binned import (morton_order, render_depth_binned,
                                         render_depth_binned_batched)
    from meshrecon.raster.rasterizer import render_depth

    soup = g._sphere_soup(n_theta=24, n_phi=24)
    t = len(soup)
    cap = 2048
    pad = np.zeros((cap, 3, 3), np.float32)
    pad[:t] = soup
    valid = np.zeros(cap, bool)
    valid[:t] = True
    order = morton_order(pad)
    pad, valid = pad[order], valid[order]
    cams = np.stack([g._make_camera(eye=e)
                     for e in [(0.3, 0.2, 0.5), (0.0, 0.0, 0.0),
                               (-0.2, 0.1, 0.3), (0.1, 0.4, -0.2)]])
    rh, rw = 240, 384
    refs = np.stack([np.asarray(render_depth(c, pad, valid, rh, rw))
                     for c in cams])
    check("binned one-level vs XLA raster",
          render_depth_binned(cams[0], pad, valid, rh, rw), refs[0], 1e-5)
    check("binned two-level vs XLA raster",
          render_depth_binned(cams[0], pad, valid, rh, rw, two_level=True),
          refs[0], 1e-5)
    # clip_project_planes projects with fixed-association elementwise FMAs
    # (vmap-stable), so batched == single == XLA reference bitwise; the old
    # jnp.dot form reassociated under vmap and flipped silhouette edge tests
    # (0.245 depth diff caught here in round 5).
    check("binned camera-batched vs XLA raster",
          render_depth_binned_batched(cams, pad, valid, rh, rw), refs, 1e-5)

    if FAILURES:
        print(f"\nFAILED: {FAILURES}", file=sys.stderr)
        return 1
    print("\nall TPU kernel equalities hold", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
