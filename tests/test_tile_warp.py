"""Tile-base-offset warp kernel: exactness vs the gather-based sampler.

The kernel must reproduce fragment.bilinear_sample bit-for-bit wherever the
within-tile spread of the displacement field fits the residual budget —
including arbitrarily LARGE smooth displacements (the round-1 clamped
shift-warp failed exactly this, corrupting a 20 px translation; see
flow/tile_warp.py docstring).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from meshrecon.flow.tile_warp import tile_warp_bilinear, tile_warp_flow
from meshrecon.raster.fragment import bilinear_sample


def _ref(img, scol, srow):
    return np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(scol),
                                      jnp.asarray(srow)))


def _grid(h, w):
    c, r = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    return c, r


@pytest.fixture
def img(rng):
    return rng.uniform(0, 255, size=(96, 160)).astype(np.float32)


def test_identity(img):
    c, r = _grid(*img.shape)
    out = tile_warp_bilinear(img, c, r, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), img)


def test_large_constant_translation(img):
    """A 37.3 px shift must be EXACT — the per-tile base absorbs it."""
    c, r = _grid(*img.shape)
    scol = c + 37.3
    srow = r - 21.7
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_smooth_varying_field(img):
    """Smooth sinusoidal displacement (spread < budget) is exact."""
    h, w = img.shape
    c, r = _grid(h, w)
    scol = c + 15.0 * np.sin(r / 40.0) + 3.0 * np.sin(c / 50.0)
    srow = r + 3.5 * np.cos(c / 45.0)
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_border_clamp_semantics(img):
    """Coordinates outside the image clamp to the border like the gather."""
    h, w = img.shape
    c, r = _grid(h, w)
    scol = c * 1.1 - 20.0  # runs past both borders (spread 0.1/px)
    srow = r * 1.1 - 15.0
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_flow_wrapper_matches_bilinear_warp(img, rng):
    from meshrecon.flow.remap import bilinear_warp

    h, w = img.shape
    # smooth flow: coarse noise upsampled
    coarse = rng.normal(scale=1.5, size=(h // 16, w // 16, 2)).astype(
        np.float32)
    flow = np.stack(
        [np.kron(coarse[..., i], np.ones((16, 16), np.float32))
         for i in range(2)], axis=-1)
    out = tile_warp_flow(img, jnp.asarray(flow), interpret=True)
    ref = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-2)


def test_overflow_degrades_gracefully(img):
    """Residual overflow (spread >> budget) clamps instead of exploding."""
    h, w = img.shape
    c, r = _grid(h, w)
    # 60 px swing inside single tiles: way past the budget
    scol = c + 60.0 * np.sign(np.sin(c)).astype(np.float32)
    srow = r
    out = np.asarray(tile_warp_bilinear(img, scol, srow, interpret=True))
    assert np.isfinite(out).all()
    assert out.min() >= img.min() - 1e-3 and out.max() <= img.max() + 1e-3


def test_nonaligned_shapes(rng):
    """Output sizes not multiples of (8, 128) pad and crop correctly."""
    img = rng.uniform(0, 255, size=(45, 77)).astype(np.float32)
    c, r = _grid(45, 77)
    scol = c + 2.3
    srow = r + 1.1
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_bicubic_matches_gather(img):
    """taps=4 must match remap.bicubic_sample (OpenCV CV_INTER_CUBIC)."""
    from meshrecon.flow.tile_warp import tile_warp_bicubic
    from meshrecon.flow.remap import bicubic_sample

    h, w = img.shape
    c, r = _grid(h, w)
    scol = c + 11.3 + 2.0 * np.sin(r / 37.0)
    srow = r - 6.7 + 1.5 * np.cos(c / 53.0)
    out = tile_warp_bicubic(img, scol, srow, interpret=True)
    ref = np.asarray(bicubic_sample(jnp.asarray(img), jnp.asarray(scol),
                                    jnp.asarray(srow)))
    # interior must match tightly; the border rows differ by design (the
    # gather clamps each tap index, we sample the replicated pad — identical
    # for constant extrapolation, which bicubic weights preserve)
    np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2], ref[2:-2, 2:-2],
                               rtol=0, atol=1e-2)


def test_batched_flow_warp_matches_unbatched(img):
    """Vertical stacking (one kernel for K images) must agree with the
    per-image warp: interior exactly, borders within the clamp epsilon."""
    from meshrecon.flow.tile_warp import tile_warp_flow, tile_warp_flow_batched

    h, w = img.shape
    rng = np.random.default_rng(3)
    imgs = np.stack([img, img[::-1].copy(), np.roll(img, 7, axis=1)])
    flows = rng.normal(scale=3.0, size=(3, h, w, 2)).astype(np.float32)
    # add smooth large displacement (the production regime)
    flows[..., 0] += 6.0
    flows[..., 1] -= 4.0

    for taps in (2, 4):
        got = np.asarray(tile_warp_flow_batched(
            jnp.asarray(imgs), jnp.asarray(flows), taps=taps, interpret=True))
        for k in range(3):
            ref = np.asarray(tile_warp_flow(
                jnp.asarray(imgs[k]), jnp.asarray(flows[k]), taps=taps,
                interpret=True))
            # rows whose sigma=3 noise tail can exceed the 12-row smooth
            # overhang budget behave differently at the stack borders; the
            # interior (one tile row in) must match exactly
            np.testing.assert_allclose(got[k][16:-16], ref[16:-16],
                                       rtol=0, atol=1e-2,
                                       err_msg=f"k={k} taps={taps}")
            # border rows: overhang-clamped coordinates, looser bound
            assert np.mean(np.abs(got[k] - ref) < 1e-2) > 0.97


def test_batched_flow_warp_no_cross_image_bleed(img):
    """A flow pushing past the image edge must clamp inside ITS image, not
    sample the neighbor stacked below/above."""
    from meshrecon.flow.tile_warp import tile_warp_flow_batched

    h, w = img.shape
    white = np.full((h, w), 255.0, np.float32)
    black = np.zeros((h, w), np.float32)
    imgs = np.stack([black, white])
    flows = np.zeros((2, h, w, 2), np.float32)
    flows[0, ..., 1] = 50.0   # push far below image 0 (toward image 1)
    flows[1, ..., 1] = -50.0  # push far above image 1 (toward image 0)
    out = np.asarray(tile_warp_flow_batched(
        jnp.asarray(imgs), jnp.asarray(flows), taps=2, interpret=True))
    assert np.all(out[0] < 1.0), "black image bled white neighbor values"
    assert np.all(out[1] > 254.0), "white image bled black neighbor values"


# --- dual-source kernel (projection stage: shadow + intensity in one pass) ---


def test_dual_nearest_bilinear_matches_gathers(img, rng):
    """nearest_a=True: source A reproduces nearest_sample, source B
    bilinear_sample, at one shared smooth coordinate field."""
    from meshrecon.flow.tile_warp import tile_warp_sample2
    from meshrecon.raster.fragment import nearest_sample

    h, w = img.shape
    other = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scol = c + 11.0 * np.sin(r / 37.0) + 2.0 * np.sin(c / 61.0)
    srow = r - 7.5 * np.cos(c / 53.0)
    out_a, out_b = tile_warp_sample2(other, img, scol, srow, interpret=True)
    ref_a = np.asarray(nearest_sample(jnp.asarray(other), jnp.asarray(scol),
                                      jnp.asarray(srow)))
    np.testing.assert_allclose(np.asarray(out_a), ref_a, rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_b), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_dual_shared_bilinear_weights(img, rng):
    """nearest_a=False: both sources bilinear at the exact coordinates."""
    from meshrecon.flow.tile_warp import tile_warp_sample2

    h, w = img.shape
    other = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scol = c + 6.0 * np.sin(r / 31.0)
    srow = r + 4.0 * np.cos(c / 41.0)
    out_a, out_b = tile_warp_sample2(other, img, scol, srow,
                                     nearest_a=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out_a), _ref(other, scol, srow),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_b), _ref(img, scol, srow),
                               rtol=0, atol=1e-2)


def test_dual_batched_matches_unbatched(img, rng):
    from meshrecon.flow.tile_warp import (tile_warp_sample2,
                                          tile_warp_sample2_batched)

    h, w = img.shape
    srcs_a = rng.uniform(0, 255, size=(3, h, w)).astype(np.float32)
    srcs_b = rng.uniform(0, 255, size=(3, h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scols = np.stack([c + 5.0 * np.sin(r / (29.0 + 7 * k)) for k in range(3)])
    srows = np.stack([r - 3.0 * np.cos(c / (43.0 + 5 * k)) for k in range(3)])
    got_a, got_b = tile_warp_sample2_batched(
        jnp.asarray(srcs_a), jnp.asarray(srcs_b),
        jnp.asarray(scols), jnp.asarray(srows), interpret=True)
    for k in range(3):
        ref_a, ref_b = tile_warp_sample2(srcs_a[k], srcs_b[k],
                                         scols[k], srows[k], interpret=True)
        np.testing.assert_allclose(np.asarray(got_a[k])[16:-16],
                                   np.asarray(ref_a)[16:-16],
                                   rtol=0, atol=1e-2, err_msg=f"A k={k}")
        np.testing.assert_allclose(np.asarray(got_b[k])[16:-16],
                                   np.asarray(ref_b)[16:-16],
                                   rtol=0, atol=1e-2, err_msg=f"B k={k}")


def test_dual_valid_mask_excludes_outliers(img, rng):
    """Invalid pixels (garbage coordinates) must not blow a tile's budget."""
    from meshrecon.flow.tile_warp import tile_warp_sample2

    h, w = img.shape
    other = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scol = c + 3.0 * np.sin(r / 33.0)
    srow = r + 2.0 * np.cos(c / 37.0)
    valid = np.ones((h, w), bool)
    scol_g = scol.copy()
    scol_g[5, 5] = 3000.0  # garbage coordinate, masked invalid
    valid[5, 5] = False
    out_a, out_b = tile_warp_sample2(other, img, scol_g, srow, valid=valid,
                                     interpret=True)
    ref_b = _ref(img, scol, srow)
    mask = valid
    np.testing.assert_allclose(np.asarray(out_b)[mask], ref_b[mask],
                               rtol=0, atol=1e-2)


def test_narrow_wide_branch_exact(img):
    """A field that is nearly constant in most tiles but jumps inside a few
    must be exact on BOTH specializations (narrow path skips only
    provably-zero taps; jump tiles take the full budget)."""
    h, w = img.shape
    c, r = _grid(h, w)
    scol = c + 3.3
    srow = r + 2.7
    # a 12-px displacement step through the middle rows: tiles straddling
    # the step exceed the narrow span and must take the wide path
    scol = scol + np.where((r > 40) & (r <= 48), 9.0, 0.0)
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    ref = _ref(img, scol, srow)
    # rows away from the jump are bit-tight; the jump rows land within the
    # r14 budget here too (spread 9 < 14), so everything matches
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-2)


def test_dead_tile_skip_writes_zeros(img, rng):
    """Tiles with NO valid pixel take the sentinel skip path: zeros out,
    valid tiles bit-identical to the valid-free run."""
    from meshrecon.flow.tile_warp import tile_warp_sample, tile_warp_sample2

    h, w = img.shape
    other = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scol = c + 4.0 * np.sin(r / 41.0)
    srow = r + 2.0 * np.cos(c / 43.0)
    valid = np.ones((h, w), bool)
    valid[:16] = False          # two full tile rows dead
    valid[40:48, :] = False     # one mid tile row dead
    out = np.asarray(tile_warp_sample(img, scol, srow, valid=valid,
                                      interpret=True))
    ref = _ref(img, scol, srow)
    assert np.all(out[:16] == 0.0) and np.all(out[40:48] == 0.0)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=0, atol=1e-2)
    # dual kernel: both outputs zero on dead tiles, exact on valid pixels
    oa, ob = tile_warp_sample2(other, img, scol, srow, valid=valid,
                               interpret=True)
    oa, ob = np.asarray(oa), np.asarray(ob)
    assert np.all(oa[:16] == 0.0) and np.all(ob[:16] == 0.0)
    np.testing.assert_allclose(ob[valid], ref[valid], rtol=0, atol=1e-2)


def test_partial_tile_invalid_pixels_cleaned(img):
    """Invalid pixels inside a live tile (garbage coordinates) must not
    disturb valid pixels' samples — their coordinates are rewritten to the
    tile minimum on the XLA side."""
    from meshrecon.flow.tile_warp import tile_warp_sample

    h, w = img.shape
    c, r = _grid(h, w)
    scol = c + 1.7
    srow = r + 0.9
    valid = np.ones((h, w), bool)
    scol_g = scol.copy()
    # scatter garbage through many tiles (stays a PARTIAL-tile case)
    scol_g[::7, ::13] = -5000.0
    valid[::7, ::13] = False
    out = np.asarray(tile_warp_sample(img, scol_g, srow, valid=valid,
                                      interpret=True))
    ref = _ref(img, scol, srow)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=0, atol=1e-2)


def test_column_midtier_branch_exact(img):
    """Per-tile column specialization: fields whose lane-axis spread fits
    the mid budget in most tiles but not all must be exact on BOTH column
    enumerations (the fit test only skips identically-zero taps)."""
    from meshrecon.flow.tile_warp import tile_warp_bilinear

    h, w = img.shape
    c, r = _grid(h, w)
    # ~4 px spread per 128 lanes in most tiles -> mid tier fires; a steeper
    # band (12 px/tile, still under the r14 budget) forces the wide path
    slope = np.where((c > 48) & (c <= 96), 0.095, 0.033).astype(np.float32)
    scol = c + np.cumsum(slope, axis=1) - 10.0
    srow = r + 1.3
    out = tile_warp_bilinear(img, scol, srow, interpret=True)
    ref = _ref(img, scol, srow)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-2)


def test_dual_nearest_half_ties(img, rng):
    """Exact .5 coordinates must pick the same texel as nearest_sample
    (floor(x+0.5)) — the tie must not depend on tile bases or offsets."""
    from meshrecon.flow.tile_warp import (tile_warp_sample2,
                                          tile_warp_sample2_batched)
    from meshrecon.raster.fragment import nearest_sample

    h, w = img.shape
    other = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    c, r = _grid(h, w)
    scol = c + 2.5  # every coordinate an exact .5 tie
    srow = r + 1.5
    out_a, _ = tile_warp_sample2(other, img, scol, srow, interpret=True)
    ref_a = np.asarray(nearest_sample(jnp.asarray(other), jnp.asarray(scol),
                                      jnp.asarray(srow)))
    np.testing.assert_allclose(np.asarray(out_a), ref_a, rtol=0, atol=1e-3)
    # batched form: the stride offsets must not disturb the tie either
    ga, _ = tile_warp_sample2_batched(
        jnp.stack([other, other]), jnp.stack([img, img]),
        jnp.stack([scol, scol]), jnp.stack([srow, srow]), interpret=True)
    np.testing.assert_allclose(np.asarray(ga[0]), ref_a, rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga[1]), ref_a, rtol=0, atol=1e-3)
