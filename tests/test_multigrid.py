"""Multigrid HS solver (flow/multigrid.py): convergence and flow quality.

The MG solver must (a) converge to the SAME fixed point as the production
Jacobi relaxation (it shares the fine-grid operator with
variational._hs_sweeps), (b) get there with less fine-grid work, and
(c) plug into variational_flow as solver="mg" without quality loss.
"""

import numpy as np
import jax.numpy as jnp

from test_flow import smooth_image, shift_image

from meshrecon.flow.multigrid import hs_solve_mg
from meshrecon.flow.remap import bilinear_warp
from meshrecon.flow.variational import _hs_sweeps, variational_flow


def _linearization(h=120, w=160, seed=4, dx=3, dy=-2):
    img = smooth_image(h, w, seed=seed)
    moved = shift_image(img, dx, dy).astype(np.float32)
    u0 = jnp.full((h, w), float(dx) - 0.5, jnp.float32)
    v0 = jnp.full((h, w), float(dy) + 0.5, jnp.float32)
    warped = bilinear_warp(jnp.asarray(moved), jnp.stack([u0, v0], -1))
    return jnp.asarray(img), warped, u0, v0


def test_mg_converges_to_jacobi_fixed_point():
    prev, warped, u0, v0 = _linearization()
    alpha2 = 144.0
    u_star, v_star = _hs_sweeps(prev, warped, u0, v0, alpha2, 1500)
    u60, v60 = _hs_sweeps(prev, warped, u0, v0, alpha2, 60)
    um, vm = hs_solve_mg(prev, warped, u0, v0, alpha2, cycles=2)

    def interior_err(u, v):
        i = (slice(8, -8), slice(8, -8))
        return float(jnp.abs(u - u_star)[i].max()
                     + jnp.abs(v - v_star)[i].max())

    err_mg = interior_err(um, vm)
    err_j60 = interior_err(u60, v60)
    # 2 W-cycles (~21 fine-sweep equivalents) must beat the production
    # 60-sweep Jacobi budget against the shared fixed point
    assert err_mg < err_j60, (err_mg, err_j60)
    assert err_mg < 1.0, err_mg


def test_mg_batched_matches_unbatched():
    prev, warped, u0, v0 = _linearization(h=64, w=80)
    prev_b = jnp.stack([prev, prev * 0.5 + 10.0])
    warped_b = jnp.stack([warped, warped * 0.5 + 10.0])
    u0_b = jnp.stack([u0, u0 * 0.0])
    v0_b = jnp.stack([v0, v0 * 0.0])
    ub, vb = hs_solve_mg(prev_b, warped_b, u0_b, v0_b, 144.0)
    u1, v1 = hs_solve_mg(prev, warped, u0, v0, 144.0)
    np.testing.assert_allclose(np.asarray(ub[0]), np.asarray(u1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vb[0]), np.asarray(v1), atol=1e-4)


def test_mg_flow_recovers_translation():
    img = smooth_image(72, 96, seed=4)
    dx, dy = 3, -2
    moved = shift_image(img, dx, dy)
    flow = np.asarray(variational_flow(img, moved, solver="mg"))
    interior = flow[12:-12, 12:-12]
    err = np.hypot(interior[..., 0] - dx, interior[..., 1] - dy)
    assert np.median(err) < 0.5, f"median flow error {np.median(err)}"


def test_mg_flow_recovers_large_translation():
    img = smooth_image(240, 320, seed=4)
    for d in (20, 40):
        moved = shift_image(img, d, 0)
        # deep pyramid: standalone large-displacement capability (the
        # pipeline default is 3 levels since round 4)
        flow = np.asarray(variational_flow(img, moved, solver="mg", levels=6))
        interior = flow[40:-40, 60:-60]
        err = np.abs(interior[..., 0] - d)
        assert np.median(err) < 1.0, f"shift {d}: med err {np.median(err)}"
