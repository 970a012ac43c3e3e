"""Pallas TPU kernel: one fused Horn-Schunck level (warp + N Jacobi sweeps).

The XLA path re-reads u, v and the linearization fields from HBM every Jacobi
iteration; this kernel keeps the whole level in VMEM (640x480 f32 images are
1.2 MB each; the working set is ~8 buffers) and runs the warp plus all sweeps
in one invocation.

Mosaic constraints shaped the design:
- data-dependent addressing is unavailable, so the bounded-displacement warp
  uses the shift-decomposition of flow/shiftwarp.py with ``pltpu.roll`` for
  the static shifts (roll is a native lane/sublane rotate). Rolls wrap
  circularly — the <= radius-wide border ring sees wrapped pixels, which the
  variance channel masks downstream (the XLA path's edge-clamp differs there
  too; interior results are exact).
- neighborhood averages are rolls + adds; everything is (8k, 128m)-aligned
  elementwise VPU work. Inputs are padded to tile multiples by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(radius, iters, alpha2, prev_ref, next_ref, u0_ref, v0_ref,
            u_out, v_out):
    prev = prev_ref[:]
    nxt = next_ref[:]
    u0 = jnp.clip(u0_ref[:], -radius, radius)
    v0 = jnp.clip(v0_ref[:], -radius, radius)

    def roll2(img, dy, dx):
        # out[p] = img[p + (dy, dx)] (circular)
        out = img
        if dy != 0:
            out = pltpu.roll(out, -dy % out.shape[0], axis=0)
        if dx != 0:
            out = pltpu.roll(out, -dx % out.shape[1], axis=1)
        return out

    # shift-decomposed bilinear warp of `nxt` by (u0, v0)
    warped = jnp.zeros_like(nxt)
    for dy in range(-radius, radius + 2):
        wy = jnp.maximum(1.0 - jnp.abs(v0 - dy), 0.0)
        row = jnp.zeros_like(nxt)
        for dx in range(-radius, radius + 2):
            wx = jnp.maximum(1.0 - jnp.abs(u0 - dx), 0.0)
            row = row + roll2(nxt, dy, dx) * wx
        warped = warped + row * wy

    ix = (roll2(warped + prev, 0, 1) - roll2(warped + prev, 0, -1)) * 0.25
    iy = (roll2(warped + prev, 1, 0) - roll2(warped + prev, -1, 0)) * 0.25
    it = warped - prev
    inv_denom = 1.0 / (alpha2 + ix * ix + iy * iy)

    def avg(f):
        s4 = (roll2(f, -1, 0) + roll2(f, 1, 0) + roll2(f, 0, -1)
              + roll2(f, 0, 1))
        s8 = (roll2(f, -1, -1) + roll2(f, -1, 1) + roll2(f, 1, -1)
              + roll2(f, 1, 1))
        return s4 * (1.0 / 6.0) + s8 * (1.0 / 12.0)

    def body(_, uv):
        u, v = uv
        ub = avg(u)
        vb = avg(v)
        num = (ix * (ub - u0) + iy * (vb - v0) + it) * inv_denom
        return ub - ix * num, vb - iy * num

    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    u_out[:] = u
    v_out[:] = v


@functools.partial(jax.jit,
                   static_argnames=("alpha2", "iters", "radius", "interpret"))
def hs_level_pallas(prev, next_, u0, v0, alpha2: float, iters: int = 60,
                    radius: int = 6, interpret: bool = False):
    """One HS warp level entirely in VMEM. Same contract as
    variational._hs_level (modulo circular borders)."""
    h, w = prev.shape
    hp = (-h) % 8
    wp = (-w) % 128

    def pad(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, hp), (0, wp)),
                       mode="edge")

    kernel = functools.partial(_kernel, radius, iters, float(alpha2))
    u, v = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((h + hp, w + wp), jnp.float32),
            jax.ShapeDtypeStruct((h + hp, w + wp), jnp.float32),
        ),
        interpret=interpret,
    )(pad(prev), pad(next_), pad(u0), pad(v0))
    return u[:h, :w], v[:h, :w]
