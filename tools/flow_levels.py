"""Cumulative per-level cost of the batched variational flow on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/flow_levels.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    H, W, K = 480, 640, 3
    reps = 10
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.flow.variational import variational_flow

    print(f"# {jax.devices()}", flush=True)
    (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns) = (
        g._fused_problem(b=1, k=K, h=H, w=W, seed=0)
    )
    a = jax.device_put(fm[0])
    bs = jax.device_put(fs[0])

    def timeit(name, fn, *args):
        def many(*aa):
            def body(i, acc):
                return acc * 1e-30 + jnp.sum(fn(acc * 1e-30, *aa))
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
        print(f"{name:<44} {(best*1e3-30)/reps:8.2f} ms"
              f" (compile {tc:5.1f}s)", flush=True)

    for lv in (1, 2, 3, 4, 5, 6):
        timeit(f"flowK3 levels={lv}",
               lambda eps, a_, b_, lv=lv: variational_flow(
                   a_ + eps, b_, levels=lv), a, bs)
    for ms in (48, 96):
        timeit(f"flowK3 levels=6 min_size={ms}",
               lambda eps, a_, b_, ms=ms: variational_flow(
                   a_ + eps, b_, min_size=ms), a, bs)
    timeit("flowK3 default (ref)",
           lambda eps, a_, b_: variational_flow(a_ + eps, b_), a, bs)
    timeit("flowK3 solver=jacobi i60",
           lambda eps, a_, b_: variational_flow(a_ + eps, b_,
                                                solver="jacobi"), a, bs)
    timeit("flowK3 cheb warps=1",
           lambda eps, a_, b_: variational_flow(a_ + eps, b_, warps=1),
           a, bs)
    timeit("flowK3 cheb iters=14",
           lambda eps, a_, b_: variational_flow(a_ + eps, b_, iters=14),
           a, bs)

    # variance stage pieces (fused.py stage 2 tail)
    from meshrecon.flow.tile_warp import tile_warp_flow_batched
    from meshrecon.flow.pyramid import compare

    flows = variational_flow(a, bs)

    def var_stage(eps, a_, b_, fl):
        rw = tile_warp_flow_batched(b_ + eps, fl + eps, taps=4,
                                    r_row=6, r_col=8)
        return compare(a_[None], rw)

    timeit("var: bicubic re-warp + compare", var_stage, a, bs,
           jax.device_put(flows))
    timeit("var: compare only",
           lambda eps, a_, b_: compare(a_[None], b_ + eps), a, bs)


if __name__ == "__main__":
    main()
