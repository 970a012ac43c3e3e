"""Microbenchmark of the tile-warp kernel in its production configurations.

Times (eps-forced in-program reps, scalar-fetch barrier):
  1. solver warp: K=3 stacked 640x480 bilinear, r_row=6 r_col=8
  2. variance re-warp: same stack, bicubic taps=4, r6/r8
  3. projection warp: full budget r14/r14 bilinear (fragment.py context)
  4. plane-sweep warp: bilinear r14/r24 (the sweep's oblique-homography
     budget)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/warp_micro.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    H, W, K = 480, 640, 3
    reps = 20
    import jax
    import jax.numpy as jnp

    from meshrecon.flow.tile_warp import tile_warp_flow_batched

    print(f"# {jax.devices()}  {K}x{H}x{W} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (K, H, W)).astype(np.float32))
    # smooth flow field, ~2 px within-tile spread + large offsets
    gy = rng.normal(size=(K, H // 40 + 2, W // 40 + 2))
    gx = rng.normal(size=(K, H // 40 + 2, W // 40 + 2))

    def up(a):
        import cv2

        return np.stack([cv2.resize(x, (W, H)) for x in a])

    flow = np.stack([up(gx) * 3.0 + 11.0, up(gy) * 3.0 - 7.0],
                    axis=-1).astype(np.float32)
    flow = jnp.asarray(flow)

    def timeit(name, fn):
        def many(eps0, im, fl):
            def body(i, acc):
                eps = acc * 1e-30 + eps0 * 0.0
                return acc * 1e-30 + jnp.sum(fn(im + eps, fl + eps))
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        fjit = jax.jit(many)
        t0 = time.perf_counter()
        float(np.asarray(fjit(jnp.float32(0.0), imgs, flow)))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fjit(jnp.float32(0.0), imgs, flow)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:<40} {(best*1e3-30)/reps:8.3f} ms (compile {tc:5.1f}s)",
              flush=True)

    timeit("bilinear r6/r8 (solver warp)",
           lambda im, fl: tile_warp_flow_batched(im, fl, r_row=6, r_col=8))
    timeit("bicubic r6/r8 (variance re-warp)",
           lambda im, fl: tile_warp_flow_batched(im, fl, taps=4, r_row=6,
                                                 r_col=8))
    timeit("bilinear r14/r14 (projection budget)",
           lambda im, fl: tile_warp_flow_batched(im, fl, r_row=14, r_col=14))
    timeit("bilinear r14/r24 (plane-sweep budget)",
           lambda im, fl: tile_warp_flow_batched(im, fl, r_row=14, r_col=24))


if __name__ == "__main__":
    main()
