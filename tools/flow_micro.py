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
    reps = 25
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

    # measured dispatch floor (the tunnel round trip drifts 20-35 ms)
    noop = jax.jit(lambda x: x * 1.0)
    float(np.asarray(noop(jnp.float32(1.0))))
    floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(noop(jnp.float32(1.0))))
        floor = min(floor, time.perf_counter() - t0)
    floor *= 1e3
    print(f"# dispatch floor {floor:.1f} ms", flush=True)

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
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fjit(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:<40} {(best*1e3-floor)/reps:8.2f} ms"
              f" (compile {tc:5.1f}s)", flush=True)

    variants = [
        # production config (fused.py call site, round-5 flip): lv2
        # single-warp pyramid, knob-default sweeps (14 cheb), fine warp 1,
        # band-kernel floor 1e5 (L1 rides hs_level_fused)
        ("prod lv2 w1", dict(levels=2, warps=1)),
        ("lv2 w2", dict(levels=2)),
        ("lv3 w2 (r4 default)", dict(levels=3)),
        ("lv3 w1", dict(levels=3, warps=1)),
        ("xla engine lv3", dict(levels=3, engine="xla")),
    ]
    # fused-band-kernel floor A/B: the round-4 floor (5e5) pushed the L1
    # (240x320, K=3 -> 230k px) level's relaxation back to the XLA sweep
    # loop (flow 1.10 -> 1.23 ms, tpu_q7)
    from meshrecon.flow.variational import set_flow_knobs
    minpx_variants = [("prod minpx5e5", dict(levels=2, warps=1))]
    # production batched form: prev (1,1,H,W) broadcast against next
    # (1,K,H,W) — vmapping the single-image API over K would instead hit
    # pallas vmap lowering rules the production path never exercises
    for name, kw in variants:
        timeit(f"flowK3 {name}",
               lambda eps, a_, b_, kw=kw: variational_flow(
                   a_[None, None] + eps, b_[None], **kw),
               a, bs)
    set_flow_knobs(fused_min_px=500000)
    for name, kw in minpx_variants:
        timeit(f"flowK3 {name}",
               lambda eps, a_, b_, kw=kw: variational_flow(
                   a_[None, None] + eps, b_[None], **kw),
               a, bs)
    set_flow_knobs(fused_min_px=100000)

    # isolated level costs (single side)
    a1 = jax.device_put(np.asarray(pyr_down(fm[0])))
    b1 = jax.device_put(np.asarray(pyr_down(fs[0][0])))
    z0 = jax.device_put(np.zeros((H, W), np.float32))
    z1 = jax.device_put(np.zeros(a1.shape, np.float32))
    # isolated level costs at PRODUCTION sweep counts; the iters=2 row's
    # offset from iters=14 gives the per-sweep marginal, and extrapolating
    # to iters=0 isolates the warp+gradients cost of a level
    for it in (14, 2):
        timeit(f"hs_level L0 cheb{it} pallas",
               lambda eps, a_, b_, u, v, it=it: _hs_level(
                   a_ + eps, b_, u, v, 144.0, it,
                   engine="pallas", solver="cheb"),
               a, bs[0], z0, z0)
    timeit("hs_level L1 cheb14 pallas",
           lambda eps, a_, b_, u, v: _hs_level(a_ + eps, b_, u, v, 144.0, 14,
                                               engine="pallas", solver="cheb"),
           a1, b1, z1, z1)
    # K=3 batched L0 level (the real fused-update context)
    timeit("hs_level L0 cheb14 K3",
           lambda eps, a_, b_: _hs_level(
               jnp.broadcast_to(a_[None] + eps, b_.shape), b_,
               jnp.zeros_like(b_), jnp.zeros_like(b_),
               144.0, 14, engine="pallas", solver="cheb"),
           a, bs)
    timeit("pyr_down L0",
           lambda eps, a_: pyr_down(a_ + eps), a)

    # quality: L1 remap self-check per variant (CPU jax would be slow on
    # TPU-attached process; reuse device)
    from meshrecon.flow.remap import flow_remap
    an = np.asarray(a)
    bn = np.asarray(bs[0])
    # (minpx variants skipped here: the band kernel vs XLA sweep choice
    # does not change the math, only where it runs — quality == lv2 rows)
    for name, kw in variants:
        fl = np.asarray(variational_flow(a[None, None], bs[:1][None],
                                         **kw))[0, 0]
        rm = np.asarray(flow_remap(fl, bs[0]))
        d = float(np.sum(np.abs(an - rm))) * np.sqrt(3.0)
        print(f"quality {name:<32} diff_sum = {d:9.0f}", flush=True)


if __name__ == "__main__":
    main()
