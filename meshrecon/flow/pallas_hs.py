"""Pallas TPU kernels for the Horn-Schunck level: VMEM-resident warp + sweeps.

Two kernels (one fused kernel exceeded the 16 MB VMEM budget when the
shift-decomposed warp unrolled ~200 live temporaries):

- ``warp_pallas``: bounded-displacement bilinear warp as a ``fori_loop`` over
  window offsets with ``pltpu.roll`` (native rotate) — constant VMEM, no
  data-dependent addressing (Mosaic forbids it). Rolls wrap circularly, so
  the <= radius border ring sees wrapped pixels; the variance channel masks
  those downstream and interior results are exact.
- ``jacobi_pallas``: N weighted-Jacobi sweeps with the fields (Ix, Iy, It,
  1/denom, u, v) held in VMEM across all iterations — the XLA path re-touches
  HBM every sweep.

The gradients/denominator between the two kernels are cheap elementwise XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(radius, nxt_ref, u_ref, v_ref, out_ref):
    nxt = nxt_ref[:]
    u = jnp.clip(u_ref[:], -radius, radius)
    v = jnp.clip(v_ref[:], -radius, radius)
    h, w = nxt.shape
    n = 2 * radius + 2
    lo = -radius

    def body(i, acc):
        dy = i // n + lo
        dx = i % n + lo
        # out[p] = nxt[p + (dy, dx)] circularly
        shifted = pltpu.roll(nxt, (-dy) % h, axis=0)
        shifted = pltpu.roll(shifted, (-dx) % w, axis=1)
        wgt = jnp.maximum(1.0 - jnp.abs(v - dy.astype(jnp.float32)), 0.0) * \
            jnp.maximum(1.0 - jnp.abs(u - dx.astype(jnp.float32)), 0.0)
        return acc + shifted * wgt

    out_ref[:] = jax.lax.fori_loop(0, n * n, body, jnp.zeros_like(nxt))


def _jacobi_kernel(iters, ix_ref, iy_ref, it_ref, invd_ref, u0_ref, v0_ref,
                   u_out, v_out):
    ix = ix_ref[:]
    iy = iy_ref[:]
    it = it_ref[:]
    invd = invd_ref[:]
    u0 = u0_ref[:]
    v0 = v0_ref[:]
    h, w = ix.shape

    def roll2(f, dy, dx):
        out = f
        if dy != 0:
            out = pltpu.roll(out, (-dy) % h, axis=0)
        if dx != 0:
            out = pltpu.roll(out, (-dx) % w, axis=1)
        return out

    def avg(f):
        s4 = roll2(f, -1, 0) + roll2(f, 1, 0) + roll2(f, 0, -1) + roll2(f, 0, 1)
        s8 = (roll2(f, -1, -1) + roll2(f, -1, 1) + roll2(f, 1, -1)
              + roll2(f, 1, 1))
        return s4 * (1.0 / 6.0) + s8 * (1.0 / 12.0)

    def body(_, uv):
        u, v = uv
        ub = avg(u)
        vb = avg(v)
        num = (ix * (ub - u0) + iy * (vb - v0) + it) * invd
        return ub - ix * num, vb - iy * num

    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    u_out[:] = u
    v_out[:] = v


def _pad_tiles(x, hp, wp):
    return jnp.pad(jnp.asarray(x, jnp.float32), ((0, hp), (0, wp)),
                   mode="edge")


@functools.partial(jax.jit,
                   static_argnames=("alpha2", "iters", "radius", "interpret"))
def hs_level_pallas(prev, next_, u0, v0, alpha2: float, iters: int = 60,
                    radius: int = 6, interpret: bool = False):
    """One HS warp level via the two VMEM kernels. Same contract as
    variational._hs_level (modulo circular borders)."""
    h, w = prev.shape
    hp = (-h) % 8
    wp = (-w) % 128
    prev_p = _pad_tiles(prev, hp, wp)
    next_p = _pad_tiles(next_, hp, wp)
    u0_p = _pad_tiles(u0, hp, wp)
    v0_p = _pad_tiles(v0, hp, wp)
    shape = jax.ShapeDtypeStruct(prev_p.shape, jnp.float32)

    warped = pl.pallas_call(
        functools.partial(_warp_kernel, radius),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=shape,
        interpret=interpret,
    )(next_p, u0_p, v0_p)

    m = prev_p + warped
    p = jnp.pad(m, 1, mode="edge")
    ix = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.25
    iy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.25
    it = warped - prev_p
    invd = 1.0 / (alpha2 + ix * ix + iy * iy)

    u, v = pl.pallas_call(
        functools.partial(_jacobi_kernel, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(shape, shape),
        interpret=interpret,
    )(ix, iy, it, invd, u0_p, v0_p)
    return u[:h, :w], v[:h, :w]
