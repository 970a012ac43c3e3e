"""Banded VMEM Jacobi solver vs the XLA reference sweeps."""

import numpy as np
import pytest

import jax.numpy as jnp

import meshrecon.flow.pallas_jacobi as pj
from meshrecon.flow.pallas_jacobi import hs_jacobi
from meshrecon.flow.variational import _hs_sweeps


def _problem(rng, h, w):
    prev = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    warped = (prev + rng.normal(scale=4.0, size=(h, w))).astype(np.float32)
    u0 = rng.normal(scale=1.5, size=(h, w)).astype(np.float32)
    v0 = rng.normal(scale=1.5, size=(h, w)).astype(np.float32)
    return prev, warped, u0, v0


def _fields(prev, warped, u0, v0):
    m = 0.5 * (prev + warped)
    p = jnp.pad(m, 1, mode="edge")
    ix = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
    iy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
    it = warped - prev
    c = it - ix * u0 - iy * v0
    return ix, iy, c


@pytest.mark.parametrize("h,w,iters", [(64, 128, 20), (40, 100, 13)])
def test_matches_xla_single_band(rng, h, w, iters):
    prev, warped, u0, v0 = _problem(rng, h, w)
    ix, iy, c = _fields(prev, warped, u0, v0)
    alpha2 = 144.0
    u_ref, v_ref = _hs_sweeps(prev, warped, u0, v0, jnp.float32(alpha2),
                              iters)
    u, v = hs_jacobi(ix, iy, c, u0, v0, alpha2, iters=iters, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=1e-3)


def test_matches_xla_multi_band(rng, monkeypatch):
    """Force banding (tiny VMEM budget) — the halo chunking must be exact."""
    h, w, iters = 96, 128, 25
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 40)
    prev, warped, u0, v0 = _problem(rng, h, w)
    ix, iy, c = _fields(prev, warped, u0, v0)
    alpha2 = 144.0
    u_ref, v_ref = _hs_sweeps(prev, warped, u0, v0, jnp.float32(alpha2),
                              iters)
    u, v = hs_jacobi(ix, iy, c, u0, v0, alpha2, iters=iters, halo=8,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=1e-3)


def test_hs_jacobi_batched_matches_xla():
    """Stacked-batch solve (per-image border masks) must equal per-image
    XLA sweeps — no cross-image propagation through the stack."""
    from meshrecon.flow.pallas_jacobi import hs_jacobi
    from meshrecon.flow.variational import _hs_sweeps

    rng = np.random.default_rng(7)
    k, h, w = 3, 48, 64
    a = rng.uniform(0, 255, size=(k, h, w)).astype(np.float32)
    b = rng.uniform(0, 255, size=(k, h, w)).astype(np.float32)
    u0 = rng.normal(scale=2.0, size=(k, h, w)).astype(np.float32)
    v0 = rng.normal(scale=2.0, size=(k, h, w)).astype(np.float32)
    m = 0.5 * (a + b)
    p = np.pad(m, [(0, 0), (1, 1), (1, 1)], mode="edge")
    ix = (p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) * 0.5
    iy = (p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) * 0.5
    c = (b - a) - ix * u0 - iy * v0

    u_p, v_p = hs_jacobi(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(c),
                         jnp.asarray(u0), jnp.asarray(v0), 144.0, iters=24,
                         interpret=True)
    for i in range(k):
        u_x, v_x = _hs_sweeps(jnp.asarray(a[i]), jnp.asarray(b[i]),
                              jnp.asarray(u0[i]), jnp.asarray(v0[i]),
                              jnp.float32(144.0), 24)
        np.testing.assert_allclose(np.asarray(u_p)[i], np.asarray(u_x),
                                   rtol=0, atol=2e-4, err_msg=f"u k={i}")
        np.testing.assert_allclose(np.asarray(v_p)[i], np.asarray(v_x),
                                   rtol=0, atol=2e-4, err_msg=f"v k={i}")


def test_hs_level_fused_matches_xla_batched():
    """Fused setup+sweeps (gradients + anchored cc derived in VMEM) vs the
    XLA tail, batched K=3 sharing one source frame."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused

    rng = np.random.default_rng(11)
    k, h, w = 3, 48, 64
    a = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    b = rng.uniform(0, 255, size=(k, h, w)).astype(np.float32)
    u0 = rng.normal(scale=2.0, size=(k, h, w)).astype(np.float32)
    v0 = rng.normal(scale=2.0, size=(k, h, w)).astype(np.float32)
    u_ref, v_ref = _hs_sweeps(jnp.asarray(a)[None], jnp.asarray(b),
                              jnp.asarray(u0), jnp.asarray(v0),
                              jnp.float32(144.0), 24)
    u, v = hs_level_fused(jnp.asarray(a), jnp.asarray(b), jnp.asarray(u0),
                          jnp.asarray(v0), 144.0, iters=24, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=1e-3)


def test_hs_level_fused_chunked_anchors_cc(monkeypatch):
    """Multi-chunk runs must anchor the data term at the ORIGINAL (u0, v0)
    (chunk 1 persists cc; re-deriving it from partially-relaxed flow was a
    real bug: 5.4 px max error on this fixture)."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused

    h, w, iters = 96, 128, 25
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 40)
    rng = np.random.default_rng(12)
    prev, warped, u0, v0 = _problem(rng, h, w)
    u_ref, v_ref = _hs_sweeps(jnp.asarray(prev), jnp.asarray(warped),
                              jnp.asarray(u0), jnp.asarray(v0),
                              jnp.float32(144.0), iters)
    u, v = hs_level_fused(jnp.asarray(prev), jnp.asarray(warped),
                          jnp.asarray(u0), jnp.asarray(v0), 144.0,
                          iters=iters, halo=8, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=1e-3)


def _smooth_problem(h, w, seed):
    """Smooth-texture fixture: the representative flow regime (moderate
    gradients, alpha^2-dominated smoothing) where relaxation is slow and
    Chebyshev acceleration matters. The uniform-noise `_problem` fixture
    is the opposite regime — data terms dominate, plain Jacobi converges
    to 1e-8 in 60 sweeps and acceleration has nothing to accelerate."""
    rng = np.random.default_rng(seed)
    coarse = rng.normal(size=(h // 8 + 1, w // 8 + 1))
    ys = np.linspace(0, coarse.shape[0] - 1.001, h)
    xs = np.linspace(0, coarse.shape[1] - 1.001, w)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - yi)[:, None], (xs - xi)[None, :]
    img = (coarse[yi][:, xi] * (1 - fy) * (1 - fx)
           + coarse[yi][:, xi + 1] * (1 - fy) * fx
           + coarse[yi + 1][:, xi] * fy * (1 - fx)
           + coarse[yi + 1][:, xi + 1] * fy * fx)
    img = (img - img.min()) * (255.0 / max(np.ptp(img), 1e-6))
    prev = img.astype(np.float32)
    warped = np.roll(prev, (1, -2), axis=(0, 1))
    u0 = np.zeros((h, w), np.float32)
    v0 = np.zeros((h, w), np.float32)
    return prev, warped, u0, v0


def test_hs_level_fused_cheb_converges(monkeypatch):
    """Chunk-restarted Chebyshev in the fused kernel: not bit-identical to
    the global XLA schedule, but must reach a lower fixed-point error than
    2.5x as many plain Jacobi sweeps."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused

    h, w = 96, 128
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 40)
    prev, warped, u0, v0 = _smooth_problem(h, w, seed=13)
    a, b = jnp.asarray(prev), jnp.asarray(warped)
    u0j, v0j = jnp.asarray(u0), jnp.asarray(v0)
    ustar, vstar = _hs_sweeps(a, b, u0j, v0j, jnp.float32(144.0), 4000)

    def fp_err(u, v):
        return float(jnp.mean(jnp.hypot(u - ustar, v - vstar)[4:-4, 4:-4]))

    uc, vc = hs_level_fused(a, b, u0j, v0j, 144.0, iters=24, halo=8,
                            solver="cheb", interpret=True)
    uj, vj = _hs_sweeps(a, b, u0j, v0j, jnp.float32(144.0), 60)
    assert fp_err(uc, vc) < fp_err(uj, vj), (fp_err(uc, vc), fp_err(uj, vj))


def test_hs_level_fused_cheb_single_chunk_exact(monkeypatch):
    """iters <= 24 runs ONE chunk with halo == iters: no Chebyshev restart,
    so the fused kernel must now match the global XLA schedule exactly —
    the restarted schedule silently weakened the production (full-res)
    solver vs the XLA path validated at low res."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused
    from meshrecon.flow.variational import _hs_sweeps_cheb

    h, w = 96, 128
    # small budget forces multiple bands — the regime where restarts used
    # to happen
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 60)
    prev, warped, u0, v0 = _smooth_problem(h, w, seed=14)
    a, b = jnp.asarray(prev), jnp.asarray(warped)
    u0j, v0j = jnp.asarray(u0), jnp.asarray(v0)
    u_ref, v_ref = _hs_sweeps_cheb(a, b, u0j, v0j, jnp.float32(144.0), 20)
    u, v = hs_level_fused(a, b, u0j, v0j, 144.0, iters=20, halo=8,
                          solver="cheb", interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=2e-3)


def test_hs_level_fused_cheb_single_chunk_batched(monkeypatch):
    """Batched (K, H, W) single-chunk cheb vs the XLA schedule — the exact
    production shape class (stacks above _HS_FUSED_MIN_PX)."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused
    from meshrecon.flow.variational import _hs_sweeps_cheb

    k, h, w = 2, 64, 128
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 60)
    a1, b1, _, _ = _smooth_problem(h, w, seed=15)
    _, b2, _, _ = _smooth_problem(h, w, seed=16)
    a = jnp.asarray(a1)
    b = jnp.stack([jnp.asarray(b1), jnp.asarray(b2)])
    rng = np.random.default_rng(17)
    u0 = jnp.asarray(rng.normal(scale=1.5, size=(k, h, w)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(scale=1.5, size=(k, h, w)).astype(np.float32))
    u_ref, v_ref = _hs_sweeps_cheb(a[None], b, u0, v0, jnp.float32(144.0), 20)
    u, v = hs_level_fused(a, b, u0, v0, 144.0, iters=20, halo=8,
                          solver="cheb", interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=2e-3)


def test_hs_level_fused_unaligned_iters_halo(monkeypatch):
    """iters=14 single-chunk: halo rounds UP to a multiple of 4 so the band
    DMA extent (band + 2*halo) stays 8-row aligned — halo==14 produced a
    188-row slice Mosaic rejects (round-4 on-hardware failure); the extra
    halo rows beyond the sweep count are exact (border masks clamp at true
    image rows)."""
    from meshrecon.flow.pallas_jacobi import hs_level_fused
    from meshrecon.flow.variational import _hs_sweeps_cheb

    h, w = 96, 128
    monkeypatch.setattr(pj, "_VMEM_FIELD_BUDGET", 5 * w * 4 * 60)
    prev, warped, u0, v0 = _smooth_problem(h, w, seed=7)
    a, b = jnp.asarray(prev), jnp.asarray(warped)
    u0j, v0j = jnp.asarray(u0), jnp.asarray(v0)
    for iters in (14, 18, 22):
        u_ref, v_ref = _hs_sweeps_cheb(a, b, u0j, v0j, jnp.float32(144.0),
                                       iters)
        u, v = hs_level_fused(a, b, u0j, v0j, 144.0, iters=iters, halo=8,
                              solver="cheb", interpret=True)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=0, atol=2e-3)
