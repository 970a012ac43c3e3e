"""Measured hardware roofline for the fused dense update (VERDICT r4 #1).

Establishes the per-chip speed-of-light bounds the 100 Mpix/s question
reduces to:

  1. HBM stream bandwidth (GB/s): one Pallas pass reading+writing a large
     array through VMEM tiles (the memory pattern every image-stage kernel
     uses).
  2. VPU f32 FMA throughput (Gflop/s): a VMEM-resident Pallas kernel
     iterating fused multiply-adds on an (256, 512) block — no HBM traffic
     inside the timed loop, so this is the elementwise-compute ceiling.
  3. Kernel-launch / grid-step floor (us): the cost of dispatching a
     minimal Pallas kernel, and of one extra grid step.

All timings use the repo's honest-timing protocol: in-program fori_loop
reps with a carry data-dependence and a host scalar fetch as the barrier
(the axon tunnel's block_until_ready does not synchronize).

With those three numbers, the per-stage analysis in BASELINE.md ("round 5:
roofline") bounds each fused-update stage by
    max(bytes / BW_meas, flops / FLOPS_meas, steps * step_cost)
and states whether the 3.07 ms/update budget (100 Mpix/s at 640x480) is
reachable without cutting algorithmic work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""

from __future__ import annotations

import time

import numpy as np

# CPU smoke-test toggle (pallas needs interpret mode off-TPU)
INTERPRET = False


def _barrier(x) -> float:
    return float(np.asarray(x).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print(f"# {jax.devices()}", flush=True)

    # ---- 1. HBM stream bandwidth ----
    H, W = 4096, 4096  # 64 MiB f32
    nbytes = H * W * 4
    a = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(H, W)).astype(np.float32))

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    grid = (H // 512,)
    copy = pl.pallas_call(
        copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((512, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((512, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=INTERPRET,
    )

    reps = 20

    def stream_many(x):
        def body(i, acc):
            return copy(acc)
        return jax.lax.fori_loop(0, reps, body, x)

    f = jax.jit(stream_many)
    _barrier(f(a))  # compile
    t0 = time.perf_counter()
    rounds = 3
    for _ in range(rounds):
        _barrier(f(a))
    dt = time.perf_counter() - t0
    # each rep reads nbytes and writes nbytes
    bw = 2 * nbytes * reps * rounds / dt / 1e9
    print(f"HBM stream: {bw:.1f} GB/s  "
          f"({dt / rounds / reps * 1e3:.3f} ms per 128 MiB round trip)",
          flush=True)

    # ---- 2. VPU f32 FMA peak ----
    BH, BW = 256, 512  # 512 KiB block, VMEM-resident
    b = jnp.asarray(np.random.default_rng(1)
                    .uniform(0.999, 1.001, size=(BH, BW)).astype(np.float32))
    inner = 512  # FMAs per element per kernel call

    def fma_kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x

        def body(i, acc):
            return acc * x + 1e-7

        acc = jax.lax.fori_loop(0, inner, body, acc)
        o_ref[...] = acc

    fma = pl.pallas_call(
        fma_kernel,
        out_shape=jax.ShapeDtypeStruct((BH, BW), jnp.float32),
        interpret=INTERPRET,
    )

    def fma_many(x):
        def body(i, acc):
            return fma(acc) * 1e-30 + x
        return jax.lax.fori_loop(0, reps, body, x)

    f2 = jax.jit(fma_many)
    _barrier(f2(b))
    t0 = time.perf_counter()
    for _ in range(rounds):
        _barrier(f2(b))
    dt = time.perf_counter() - t0
    flops = 2 * BH * BW * inner * reps * rounds / dt / 1e9
    print(f"VPU f32 FMA: {flops:.0f} Gflop/s "
          f"({dt / rounds / reps * 1e3:.3f} ms per {inner}-deep block)",
          flush=True)

    # ---- 3. launch + grid-step floor ----
    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    c = jnp.ones((8, 128), jnp.float32)
    tiny = pl.pallas_call(
        tiny_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET)

    launch_reps = 200

    def tiny_many(x):
        def body(i, acc):
            return tiny(acc)
        return jax.lax.fori_loop(0, launch_reps, body, x)

    f3 = jax.jit(tiny_many)
    _barrier(f3(c))
    t0 = time.perf_counter()
    for _ in range(rounds):
        _barrier(f3(c))
    dt = time.perf_counter() - t0
    launch_us = dt / rounds / launch_reps * 1e6
    print(f"Pallas launch floor: {launch_us:.1f} us/kernel", flush=True)

    # grid-step marginal cost: same tiny compute, 1 vs 64 grid steps
    g = jnp.ones((64 * 8, 128), jnp.float32)

    def gridded(n):
        k = pl.pallas_call(
            tiny_kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((512 // n, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512 // n, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            interpret=INTERPRET,
        )

        def many(x):
            def body(i, acc):
                return k(acc)
            return jax.lax.fori_loop(0, launch_reps, body, x)

        f = jax.jit(many)
        _barrier(f(g))
        t0 = time.perf_counter()
        for _ in range(rounds):
            _barrier(f(g))
        return (time.perf_counter() - t0) / rounds / launch_reps * 1e6

    t1, t64 = gridded(1), gridded(64)
    print(f"grid-step marginal: {(t64 - t1) / 63:.2f} us/step "
          f"(1-step {t1:.1f} us, 64-step {t64:.1f} us)", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
