"""Per-stage TPU timing of the fused-update hot path at 640x480, K=3.

Each stage is jitted standalone with a scalar-reducing wrapper (the axon
tunnel's block_until_ready does not synchronize; a scalar host fetch is the
only honest barrier). Inputs are device_put beforehand. Prints one line per
stage, flushed immediately, so a partial run still yields data.

Usage: python tools/perf_breakdown.py [H W K reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.pipeline.fused import fused_main_update
    from meshrecon.raster.rasterizer import render_depth
    from meshrecon.raster.fragment import projected_image, mix_background
    from meshrecon.flow.variational import variational_flow, _hs_sweeps
    from meshrecon.flow.remap import bilinear_warp, flow_remap
    from meshrecon.flow.pyramid import compare
    from meshrecon.flow.pallas_hs import hs_level_pallas
    from meshrecon.depth import triangulate_pixels, estimate_normals

    print(f"# devices: {jax.devices()}", flush=True)

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
        try:
            red = jax.jit(lambda *a: jnp.sum(
                sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fn(*a))
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact))
            ))
            t0 = time.perf_counter()
            float(np.asarray(red(*args)))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                float(np.asarray(red(*args)))
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:<34} {dt * 1e3:9.2f} ms   (compile {tc:6.1f} s)",
                  flush=True)
        except Exception as e:
            print(f"{name:<34} FAILED: {type(e).__name__}: {e}", flush=True)

    timeit("render_depth(578tri)",
           lambda c, s, v: render_depth(c, s, v, H, W),
           d["main"], d["soup"], d["soup_valid"])
    timeit("projected+mix(1side)",
           lambda cm, dm, f, cs, ds: mix_background(
               *projected_image(cm, dm, f, cs, ds), d["fm"], dm),
           d["main"], d["depth"], d["fside"], d["scam"], d["depth"])
    timeit("bilinear_warp", bilinear_warp, d["fm"], d["flow2"])
    timeit("flow_remap(bicubic)", flow_remap, d["flows4"][0], d["fm"])
    timeit("compare", compare, d["fm"], d["fs"][0])
    timeit("hs_sweeps60_xla",
           lambda a, b, u, v: _hs_sweeps(a, b, u, v, jnp.float32(144.0), 60),
           d["fm"], d["fs"][0], d["flow2"][..., 0], d["flow2"][..., 1])
    timeit("hs_level_pallas(w+j60)",
           lambda a, b, u, v: hs_level_pallas(a, b, u, v, 144.0, 60),
           d["fm"], d["fs"][0], d["flow2"][..., 0], d["flow2"][..., 1])
    timeit("variational_flow(full)", variational_flow, d["fm"], d["fs"][0])
    timeit("triangulate_pixels",
           lambda f4, cm, sc, sv_, dp: triangulate_pixels(
               f4, cm, sc, sv_, dp, sampling="taylor"),
           d["flows4"], d["main"], d["side_cams"], d["sv"], d["depth"])
    timeit("estimate_normals", estimate_normals,
           d["pt4"], d["validm"], d["pdf"], d["centers"], d["cvalid"],
           d["ns"])
    timeit("fused_main_update(K=3)",
           lambda *a: fused_main_update(*a, height=H, width=W),
           d["soup"], d["soup_valid"], d["main"], d["fm"], d["side_cams"],
           d["fs"], d["sv"], d["centers"], d["cvalid"], d["ns"])


if __name__ == "__main__":
    main()
