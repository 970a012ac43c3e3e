"""Time/quality sweep of variational_flow knobs on TPU.

Times the K=3 vmapped solve (the fused-update context) with eps-forced
honest reps; prints the L1 remap self-check (flow.cpp:133 metric) per
variant, computed on CPU afterward.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/flow_micro.py
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
    from meshrecon.flow.variational import variational_flow, _hs_level
    from meshrecon.flow.pyramid import pyr_down

    print(f"# {jax.devices()}", flush=True)
    (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns) = (
        g._fused_problem(b=1, k=K, h=H, w=W, seed=0)
    )
    a = jax.device_put(fm[0])
    bs = jax.device_put(fs[0])  # (K, H, W)

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
        print(f"{name:<40} {(best*1e3-30)/reps:8.2f} ms"
              f" (compile {tc:5.1f}s)", flush=True)

    variants = [
        ("base i60 w2", dict()),
        ("i30", dict(iters=30)),
        ("w1", dict(warps=1)),
        ("i30 w1", dict(iters=30, warps=1)),
        ("levels4", dict(levels=4)),
        ("xla engine", dict(engine="xla")),
    ]
    for name, kw in variants:
        timeit(f"flowK3 {name}",
               lambda eps, a_, b_, kw=kw: jax.vmap(
                   lambda bb: variational_flow(a_ + eps, bb, **kw))(b_),
               a, bs)

    # isolated level costs (single side)
    a1 = jax.device_put(np.asarray(pyr_down(fm[0])))
    b1 = jax.device_put(np.asarray(pyr_down(fs[0][0])))
    z0 = jax.device_put(np.zeros((H, W), np.float32))
    z1 = jax.device_put(np.zeros(a1.shape, np.float32))
    timeit("hs_level L0 pallas",
           lambda eps, a_, b_, u, v: _hs_level(a_ + eps, b_, u, v, 144.0, 60,
                                               engine="pallas"),
           a, bs[0], z0, z0)
    timeit("hs_level L1 pallas",
           lambda eps, a_, b_, u, v: _hs_level(a_ + eps, b_, u, v, 144.0, 60,
                                               engine="pallas"),
           a1, b1, z1, z1)
    timeit("pyr_down L0",
           lambda eps, a_: pyr_down(a_ + eps), a)

    # quality: L1 remap self-check per variant (CPU jax would be slow on
    # TPU-attached process; reuse device)
    from meshrecon.flow.remap import flow_remap
    an = np.asarray(a)
    bn = np.asarray(bs[0])
    for name, kw in variants:
        fl = np.asarray(variational_flow(a, bs[0], **kw))
        rm = np.asarray(flow_remap(fl, bs[0]))
        d = float(np.sum(np.abs(an - rm))) * np.sqrt(3.0)
        print(f"quality {name:<32} diff_sum = {d:9.0f}", flush=True)


if __name__ == "__main__":
    main()
