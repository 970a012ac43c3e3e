"""Measured hardware roofline for the fused dense update (VERDICT r4 #1).

Establishes the per-chip speed-of-light bounds the 100 Mpix/s question
reduces to:

  1. HBM stream bandwidth (GB/s): one Pallas pass reading+writing a large
     array through VMEM tiles (the memory pattern every image-stage kernel
     uses).
  2. VPU f32 FMA throughput (Gflop/s): a VMEM-resident Pallas kernel
     iterating fused multiply-adds on a (256, 512) block — no HBM traffic
     inside the timed loop, so this is the elementwise-compute ceiling.
  3. MXU bf16 matmul throughput (Tflop/s): chained 1024^3 matmuls — the
     ceiling for anything XLA can tile onto the systolic array.
  4. Kernel-launch / grid-step floor (us): the cost of dispatching a
     minimal Pallas kernel, and of one extra grid step.

Timing protocol (v2 — the first version of this harness produced garbage
through the axon tunnel and is superseded):
  - every timed jit REDUCES to a scalar inside the program, so the tunnel
    transfers 4 bytes per call, never the payload array;
  - a no-op dispatch floor (same scalar-fetch shape) is measured right
    before each section and subtracted — through the tunnel the floor is
    ~20-35 ms and would otherwise dominate every number;
  - in-program fori_loop reps are sized so the device time is comparable
    to or larger than the floor, and each section takes the best of 3.

With those numbers, the per-stage analysis in BASELINE.md ("round 5:
roofline") bounds each fused-update stage by
    max(bytes / BW_meas, flops / FLOPS_meas, steps * step_cost)
using the marginal bytes/flops that tools/fused_breakdown.py --cost now
reports from XLA's own cost model, and states whether the 3.07 ms/update
budget (100 Mpix/s at 640x480) is reachable without cutting algorithmic
work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""

from __future__ import annotations

import time

import numpy as np

# CPU smoke-test toggle (pallas needs interpret mode off-TPU)
INTERPRET = False


def _scalar(x) -> float:
    return float(np.asarray(x))


def _time_best(f, *args, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        _scalar(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print(f"# {jax.devices()}", flush=True)

    # dispatch floor: minimal jit, scalar in -> scalar out. Re-measured
    # before each section because the tunnel round trip drifts by ~10 ms
    # between minutes.
    noop = jax.jit(lambda x: x * 1.0)

    def floor_ms():
        _scalar(noop(jnp.float32(1.0)))
        return _time_best(noop, jnp.float32(1.0), n=5) * 1e3

    # ---- 1. HBM stream bandwidth ----
    H, W = 4096, 4096  # 64 MiB f32
    nbytes = H * W * 4
    a = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(H, W)).astype(np.float32))

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    copy = pl.pallas_call(
        copy_kernel,
        grid=(H // 512,),
        in_specs=[pl.BlockSpec((512, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((512, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=INTERPRET,
    )

    reps = 100  # 100 x 128 MiB round trips ~ 16 ms at 800 GB/s

    @jax.jit
    def stream_many(x):
        def body(i, acc):
            return copy(acc)
        return jax.lax.fori_loop(0, reps, body, x)[0, 0]

    fl = floor_ms()
    _scalar(stream_many(a))  # compile
    dt = _time_best(stream_many, a) * 1e3 - fl
    bw = 2 * nbytes * reps / (dt * 1e-3) / 1e9
    print(f"HBM stream: {bw:.0f} GB/s  "
          f"({dt / reps * 1e3:.1f} us per 128 MiB round trip; "
          f"floor {fl:.1f} ms)", flush=True)

    # ---- 2. VPU f32 FMA peak ----
    BH, BW = 256, 512  # 512 KiB block, VMEM-resident
    b = jnp.asarray(np.random.default_rng(1)
                    .uniform(0.999, 1.001, size=(BH, BW)).astype(np.float32))
    inner = 2048  # FMAs per element per kernel call

    def fma_kernel(x_ref, o_ref):
        x = x_ref[...]

        def body(i, acc):
            return acc * x + 1e-7

        o_ref[...] = jax.lax.fori_loop(0, inner, body, x)

    fma = pl.pallas_call(
        fma_kernel,
        out_shape=jax.ShapeDtypeStruct((BH, BW), jnp.float32),
        interpret=INTERPRET,
    )

    vreps = 100

    @jax.jit
    def fma_many(x):
        def body(i, acc):
            return fma(acc) * 1e-30 + x
        return jax.lax.fori_loop(0, vreps, body, x)[0, 0]

    fl = floor_ms()
    _scalar(fma_many(b))
    dt = _time_best(fma_many, b) * 1e3 - fl
    flops = 2 * BH * BW * inner * vreps / (dt * 1e-3) / 1e9
    print(f"VPU f32 FMA: {flops:.0f} Gflop/s "
          f"({dt / vreps * 1e3:.1f} us per {inner}-deep block; "
          f"floor {fl:.1f} ms)", flush=True)

    # ---- 3. MXU bf16 matmul peak ----
    N = 1024
    m = jnp.asarray(np.random.default_rng(2)
                    .uniform(-0.03, 0.03, size=(N, N)).astype(jnp.bfloat16))
    mreps = 500  # 500 x 2.15 Gflop ~ 5.5 ms at 197 Tflop/s

    @jax.jit
    def mm_many(x):
        def body(i, acc):
            y = jnp.dot(acc, x, preferred_element_type=jnp.bfloat16)
            # renormalize so values stay finite without leaving the MXU path
            return y * jnp.bfloat16(0.18)
        out = jax.lax.fori_loop(0, mreps, body, x)
        return out[0, 0].astype(jnp.float32)

    fl = floor_ms()
    _scalar(mm_many(m))
    dt = _time_best(mm_many, m) * 1e3 - fl
    tflops = 2 * N**3 * mreps / (dt * 1e-3) / 1e12
    print(f"MXU bf16 matmul: {tflops:.0f} Tflop/s "
          f"({dt / mreps * 1e3:.1f} us per 1024^3 matmul; floor {fl:.1f} ms)",
          flush=True)

    # ---- 4. launch + grid-step floor ----
    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    c = jnp.ones((8, 128), jnp.float32)
    tiny = pl.pallas_call(
        tiny_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET)

    launch_reps = 5000

    @jax.jit
    def tiny_many(x):
        def body(i, acc):
            return tiny(acc)
        return jax.lax.fori_loop(0, launch_reps, body, x)[0, 0]

    fl = floor_ms()
    _scalar(tiny_many(c))
    dt = _time_best(tiny_many, c) * 1e3 - fl
    launch_us = dt / launch_reps * 1e3
    print(f"Pallas launch floor: {launch_us:.2f} us/kernel "
          f"(floor {fl:.1f} ms)", flush=True)

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
        greps = 2000

        @jax.jit
        def many(x):
            def body(i, acc):
                return k(acc)
            return jax.lax.fori_loop(0, greps, body, x)[0, 0]

        fl = floor_ms()
        _scalar(many(g))
        return (_time_best(many, g) * 1e3 - fl) / greps * 1e3

    t1, t64 = gridded(1), gridded(64)
    print(f"grid-step marginal: {(t64 - t1) / 63:.2f} us/step "
          f"(1-step {t1:.2f} us, 64-step {t64:.2f} us)", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
