"""Isolate the cost of flow level transitions on TPU (batched K=3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/flow_trans.py
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
    from meshrecon.flow.variational import _hs_level, _hs_sweeps
    from meshrecon.flow.pyramid import pyr_down, pyr_up
    from meshrecon.flow.tile_warp import tile_warp_flow_batched

    print(f"# {jax.devices()}", flush=True)
    (_s, _sv, _m, fm, _sc, fs, *_r) = g._fused_problem(
        b=1, k=K, h=H, w=W, seed=0)
    a = jax.device_put(fm[0])
    bs = jax.device_put(fs[0])
    rng = np.random.default_rng(0)
    uv0 = jax.device_put(
        rng.normal(scale=2.0, size=(K, H, W, 2)).astype(np.float32))
    a1 = jax.device_put(np.asarray(pyr_down(fm[0])))
    b1 = jax.device_put(np.asarray(pyr_down(fs[0])))

    def timeit(name, fn, *args):
        def many(*aa):
            def body(i, acc):
                return acc * 1e-30 + jnp.sum(sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(
                        fn(acc * 1e-30, *aa))))
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

    timeit("warp_batched L0 zero-flow",
           lambda eps, b_: tile_warp_flow_batched(
               b_ + eps, jnp.zeros((K, H, W, 2), jnp.float32)), bs)
    timeit("warp_batched L0 real-flow",
           lambda eps, b_, uv: tile_warp_flow_batched(b_ + eps, uv + eps),
           bs, uv0)
    timeit("sweeps60 L0 K3",
           lambda eps, a_, b_, uv: _hs_sweeps(
               a_ + eps, b_, uv[..., 0], uv[..., 1], jnp.float32(144.0), 60),
           a, bs, uv0)
    timeit("hs_level L0 K3 zero-init",
           lambda eps, a_, b_: _hs_level(
               a_ + eps, b_, jnp.zeros((K, H, W), jnp.float32),
               jnp.zeros((K, H, W), jnp.float32), 144.0, 60,
               engine="pallas"), a, bs)
    timeit("hs_level L0 K3 real-init",
           lambda eps, a_, b_, uv: _hs_level(
               a_ + eps, b_, uv[..., 0], uv[..., 1], 144.0, 60,
               engine="pallas"), a, bs, uv0)
    timeit("hs_level L1 K3",
           lambda eps, a_, b_: _hs_level(
               a_ + eps, b_, jnp.zeros(b_.shape, jnp.float32),
               jnp.zeros(b_.shape, jnp.float32), 144.0, 60,
               engine="pallas"), a1, b1)
    timeit("pyr_down a+b K3",
           lambda eps, a_, b_: (pyr_down(a_ + eps), pyr_down(b_ + eps)),
           a, bs)
    timeit("pyr_up uv L1->L0 K3",
           lambda eps, uv: (pyr_up(pyr_down(uv[..., 0] + eps), (H, W)),
                            pyr_up(pyr_down(uv[..., 1] + eps), (H, W))),
           uv0)


if __name__ == "__main__":
    main()
