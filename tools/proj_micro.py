"""Micro-timing of projected_image variants to localize the in-context cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/proj_micro.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    H, W, K = 480, 640, 3
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.pipeline import fused as F
    from meshrecon.raster.fragment import (projected_image, mix_background,
                                           dilate3x3_max)

    print(f"# {jax.devices()}", flush=True)
    (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns) = (
        g._fused_problem(b=1, k=K, h=H, w=W, seed=0)
    )
    depth_of = F._depth_fn(None, H, W)

    @jax.jit
    def depths(cam_main, side_cams):
        all_cams = jnp.concatenate([cam_main[None], side_cams], axis=0)
        return jax.vmap(lambda c: depth_of(c, soup, soup_valid))(all_cams)

    all_d = jax.device_put(np.asarray(depths(mains[0], sides[0])))
    d0 = all_d[0]
    ds = all_d[1:]
    plane = jax.device_put(g._plane_depth(mains[0], -5.0, H, W))
    cam_main = jax.device_put(mains[0])
    scams = jax.device_put(sides[0])
    sframes = jax.device_put(fs[0])
    frame_main = jax.device_put(fm[0])
    reps = 10

    def timeit(name, fn, *args):
        def many(*a):
            def body(i, acc):
                return acc * 1e-30 + jnp.sum(sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(
                        fn(acc * 1e-30, *a))))
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
        print(f"{name:<42} {(best*1e3-30)/reps:8.2f} ms (compile {tc:5.1f}s)",
              flush=True)

    # eps on the DEPTH (forces re-execution of everything downstream)
    timeit("proj1 plane depth (as perf_breakdown)",
           lambda eps, dm, f, cs, dsd: projected_image(
               cam_main, dm + eps, f, cs, dsd),
           plane, sframes[0], scams[0], plane)
    timeit("proj1 real depth",
           lambda eps, dm, f, cs, dsd: projected_image(
               cam_main, dm + eps, f, cs, dsd),
           d0, sframes[0], scams[0], ds[0])
    timeit("proj1 real depth xla",
           lambda eps, dm, f, cs, dsd: projected_image(
               cam_main, dm + eps, f, cs, dsd, engine="xla"),
           d0, sframes[0], scams[0], ds[0])
    timeit("projK vmap real depth",
           lambda eps, dm, f, cs, dsd: jax.vmap(
               lambda f_, c_, d_: projected_image(cam_main, dm + eps, f_,
                                                  c_, d_))(f, cs, dsd),
           d0, sframes, scams, ds)
    timeit("projK loop real depth",
           lambda eps, dm, f, cs, dsd: [
               projected_image(cam_main, dm + eps, f[i], cs[i], dsd[i])
               for i in range(K)],
           d0, sframes, scams, ds)
    timeit("dilate3x3 only",
           lambda eps, dsd: dilate3x3_max(dsd + eps), ds[0])
    timeit("dilateK vmap",
           lambda eps, dsd: jax.vmap(dilate3x3_max)(dsd + eps), ds)


if __name__ == "__main__":
    main()
