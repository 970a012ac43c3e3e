"""Per-stage TPU timing of the fused-update hot path at 640x480, K=3.

Each stage is repeated IN-PROGRAM (lax.fori_loop serialized through a carry
perturbation so XLA cannot CSE the reps) — the axon tunnel has a fixed
~30 ms dispatch+fetch latency that otherwise dominates, and its
block_until_ready does not synchronize, so a scalar host fetch is the only
honest barrier. Per-call cost = (round time - 30 ms) / reps.

Usage: python tools/perf_breakdown.py [H W K reps]
(run with PYTHONPATH=/root/repo:/root/.axon_site)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.pipeline.fused import fused_main_update
    from meshrecon.raster.rasterizer import render_depth
    from meshrecon.raster.fragment import projected_image, mix_background
    from meshrecon.flow.variational import variational_flow, _hs_sweeps
    from meshrecon.flow.tile_warp import tile_warp_flow
    from meshrecon.flow.pyramid import compare, pyr_down, pyr_up
    from meshrecon.depth import triangulate_pixels, estimate_normals

    print(f"# devices: {jax.devices()}  {H}x{W} K={K} reps={reps}",
          flush=True)

    (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns) = (
        g._fused_problem(b=1, k=K, h=H, w=W, seed=0)
    )
    rng = np.random.default_rng(7)
    flow2 = rng.normal(scale=3.0, size=(H, W, 2)).astype(np.float32)
    flows4 = rng.normal(scale=2.0, size=(K, H, W, 4)).astype(np.float32)
    depth = g._plane_depth(mains[0], -5.0, H, W)
    pt4 = rng.normal(size=(H, W, 4)).astype(np.float32)
    pdf = rng.uniform(0.1, 1.0, size=(H, W)).astype(np.float32)
    validm = np.ones((H, W), bool)

    dev = jax.device_put
    d = dict(
        soup=dev(soup), soup_valid=dev(soup_valid), main=dev(mains[0]),
        fm=dev(fm[0]), side_cams=dev(sides[0]), fs=dev(fs[0]),
        sv=dev(sv[0]), centers=dev(centers[0]), cvalid=dev(cvalid[0]),
        ns=dev(ns[0]), flow2=dev(flow2), flows4=dev(flows4),
        depth=dev(depth), fside=dev(fs[0][0]), scam=dev(sides[0][0]),
        pt4=dev(pt4), pdf=dev(pdf), validm=dev(validm),
    )

    def timeit(name, fn, *args):
        """fn(eps, *args) -> pytree; eps is the serialization perturbation."""
        try:
            def red(eps, *a):
                return jnp.sum(sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(
                        fn(eps, *a))
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
                ))

            def many(*a):
                def body(i, acc):
                    return acc * 1e-30 + red(acc * 1e-30, *a)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            fjit = jax.jit(many)
            t0 = time.perf_counter()
            float(np.asarray(fjit(*args)))
            tc = time.perf_counter() - t0
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                float(np.asarray(fjit(*args)))
                best = min(best, time.perf_counter() - t0)
            per = (best * 1e3 - 30.0) / reps
            print(f"{name:<34} {per:9.2f} ms   (compile {tc:6.1f} s)",
                  flush=True)
        except Exception as e:
            print(f"{name:<34} FAILED: {type(e).__name__}: "
                  f"{repr(e)[:300]}", flush=True)

    timeit("render_depth(578tri)",
           lambda eps, c, s, v: render_depth(c, s + eps, v, H, W),
           d["main"], d["soup"], d["soup_valid"])
    timeit("projected+mix(1side)",
           lambda eps, cm, dm, f, cs, ds: mix_background(
               *projected_image(cm, dm + eps, f, cs, ds), d["fm"], dm),
           d["main"], d["depth"], d["fside"], d["scam"], d["depth"])
    timeit("tile_warp_bicubic",
           lambda eps, im, fl: tile_warp_flow(im + eps, fl, taps=4),
           d["fm"], d["flow2"])
    timeit("compare",
           lambda eps, a, b: compare(a + eps, b), d["fm"], d["fs"][0])
    timeit("pyr_down+up",
           lambda eps, a: pyr_up(pyr_down(a + eps), a.shape), d["fm"])
    timeit("hs_sweeps60_xla",
           lambda eps, a, b, u, v: _hs_sweeps(a + eps, b, u, v,
                                              jnp.float32(144.0), 60),
           d["fm"], d["fs"][0], d["flow2"][..., 0], d["flow2"][..., 1])
    timeit("variational_flow(pallas)",
           lambda eps, a, b: variational_flow(a + eps, b, engine="pallas"),
           d["fm"], d["fs"][0])
    timeit("variational_flow(xla)",
           lambda eps, a, b: variational_flow(a + eps, b, engine="xla"),
           d["fm"], d["fs"][0])
    timeit("triangulate_pixels",
           lambda eps, f4, cm, sc, sv_, dp: triangulate_pixels(
               f4 + eps, cm, sc, sv_, dp, sampling="taylor"),
           d["flows4"], d["main"], d["side_cams"], d["sv"], d["depth"])
    timeit("estimate_normals",
           lambda eps, p4, vm, pf, ct, cv, n: estimate_normals(
               p4 + eps, vm, pf, ct, cv, n),
           d["pt4"], d["validm"], d["pdf"], d["centers"], d["cvalid"],
           d["ns"])
    timeit("fused_main_update(K=3)",
           lambda eps, *a: fused_main_update(
               a[0], a[1], a[2], a[3] + eps, *a[4:], height=H, width=W),
           d["soup"], d["soup_valid"], d["main"], d["fm"], d["side_cams"],
           d["fs"], d["sv"], d["centers"], d["cvalid"], d["ns"])


if __name__ == "__main__":
    main()
