"""Sweep the binned rasterizer's chunk size at several triangle counts.

eps rides the soup so every rep re-renders (no loop-invariant hoisting).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/raster_sweep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    H, W = 480, 640
    reps = 10
    chunks = [int(c) for c in (sys.argv[1].split(",") if len(sys.argv) > 1
                               else [8, 16, 32, 64])]
    # argv[2] nonempty: ALSO time the camera-batched two-level form (the
    # production path of the fused update: B*(K+1)=4 cameras per launch) —
    # VERDICT r3 item 6's target is <= 5 ms at the 65k production cap there
    batched = len(sys.argv) > 2 and bool(sys.argv[2])
    slab = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = module default

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.raster.binned import (render_depth_binned,
                                         render_depth_binned_batched,
                                         morton_order)
    from meshrecon.raster.rasterizer import render_depth

    print(f"# {jax.devices()}", flush=True)
    (soup, soup_valid, mains, *_rest) = g._fused_problem(
        b=1, k=3, h=H, w=W, seed=0)
    cam = jax.device_put(mains[0])

    def make_soup(t):
        """t triangles tiling a sphere around the fused problem's scene."""
        rng = np.random.default_rng(1)
        # icosphere-ish random tessellated sphere: random points, small tris
        ctr = np.array([0.0, 0.0, -5.0], np.float32)
        p = rng.normal(size=(t, 3)).astype(np.float32)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        e1 = rng.normal(scale=0.05, size=(t, 3)).astype(np.float32)
        e2 = rng.normal(scale=0.05, size=(t, 3)).astype(np.float32)
        s = np.stack([p, p + e1, p + e2], axis=1) + ctr
        s = s[morton_order(s)]
        return jnp.asarray(s), jnp.ones(t, bool)

    def timeit(name, fn, *args):
        def many(*a):
            def body(i, acc):
                return acc * 1e-30 + jnp.sum(fn(acc * 1e-30, *a))
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
        print(f"{name:<38} {(best*1e3-30)/reps:8.2f} ms (compile {tc:5.1f}s)",
              flush=True)

    cases = [("bench578", jax.device_put(soup), jax.device_put(soup_valid))]
    for t in (3200, 16384, 65536):
        s, v = make_soup(t)
        cases.append((f"sphere{t}", jax.device_put(s), jax.device_put(v)))

    cams4 = jax.device_put(jnp.asarray(
        np.stack([np.asarray(mains[0])] * 4), jnp.float32))
    for name, s, v in cases:
        for c in chunks:
            kw = {"slab": slab} if slab else {}
            tag = f" slab={slab}" if slab else ""
            timeit(f"{name} chunk={c}{tag}",
                   lambda eps, s_, v_, c=c: render_depth_binned(
                       cam, s_ + eps, v_, H, W, chunk=c, **kw), s, v)
            timeit(f"{name} chunk={c}{tag} two-level",
                   lambda eps, s_, v_, c=c: render_depth_binned(
                       cam, s_ + eps, v_, H, W, chunk=c, two_level=True,
                       **kw), s, v)
            if batched:
                timeit(f"{name} chunk={c} batched4",
                       lambda eps, s_, v_, c=c: render_depth_binned_batched(
                           cams4, s_ + eps, v_, H, W, chunk=c), s, v)
        if name == "bench578":
            timeit(f"{name} xla-brute",
                   lambda eps, s_, v_: render_depth(cam, s_ + eps, v_, H, W),
                   s, v)


if __name__ == "__main__":
    main()
