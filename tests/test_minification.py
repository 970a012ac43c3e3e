"""Minification stress test for projective texturing (VERDICT r3 item 7).

The reference samples the projected frame through mipmapped anisotropic GL
textures (render_glx.cpp:65-88); our projected_image uses plain bilinear
taps (PARITY.md divergence 4). Under strong minification — a side camera
much CLOSER to the surface than the main — bilinear point-sampling aliases
where GL would area-average. These tests characterize that divergence on a
plane seen by a side camera 4x closer than the main, against a supersampled
reference (the projection computed at 4x main resolution and box-averaged
down, i.e. exact area sampling of the same bilinear reconstruction).

Finding (and why no mip fallback ships): with the synthetic fixtures'
band-limited value-noise texture statistics, the divergence is small — the
side camera being CLOSER means the side frame is smooth at side-pixel
scale, so 4x minification stays comfortably under the bilinear kernel's
footprint. Genuine aliasing needs frame content near the side Nyquist
rate (the high-frequency case below), which the flow pipeline's variance
channel downweights; its measured magnitude is recorded here as a bound.
"""

import numpy as np
import jax.numpy as jnp

from meshrecon.raster import render_depth, projected_image
from tests.test_geometry import make_camera


def _plane_soup(extent=4.0, z=0.0):
    """Two triangles tiling [-extent, extent]^2 at world z."""
    e = extent
    quad = np.array([
        [[-e, -e, z], [e, -e, z], [e, e, z]],
        [[-e, -e, z], [e, e, z], [-e, e, z]],
    ], np.float32)
    return jnp.asarray(quad), jnp.ones(2, bool)


def _texture(x, y, fine=False):
    """Band-limited plane texture; fine=True pushes content toward the
    side camera's Nyquist rate (the aliasing regime)."""
    f = 8.0 if fine else 1.5
    return (100.0
            + 60.0 * np.sin(f * 2.1 * x) * np.cos(f * 1.7 * y)
            + 40.0 * np.sin(f * 0.9 * (x + y)))


def _photo_texture():
    """Analytic texture with natural-image (photo) statistics: a sum of
    ~50 sinusoids whose amplitudes fall as 1/f (i.e. 1/f^2 power spectral
    density, the classic natural-image law), random directions and phases.
    Unlike the band-limited fixture above, energy extends past the MAIN
    camera's Nyquist rate, so strong minification genuinely aliases."""
    rng = np.random.default_rng(7)
    n = 50
    freqs = np.exp(rng.uniform(np.log(0.5), np.log(24.0), n))
    dirs = rng.uniform(0.0, 2.0 * np.pi, n)
    phases = rng.uniform(0.0, 2.0 * np.pi, n)
    amps = 1.0 / freqs
    amps *= 60.0 / np.sqrt(np.sum(amps ** 2) / 2.0)  # ~60-unit rms contrast
    kx, ky = np.cos(dirs) * freqs, np.sin(dirs) * freqs

    def tex(x, y):
        acc = np.full_like(np.asarray(x, np.float64), 100.0)
        for a, fx, fy, p in zip(amps, kx, ky, phases):
            acc = acc + a * np.sin(fx * x + fy * y + p)
        return acc

    return tex


def _side_frame(cam, h, w, fine, tex=None):
    """Ray-trace the textured z=0 plane for ``cam`` (analytic ground truth
    for what that camera's video frame would contain)."""
    inv = np.linalg.inv(np.asarray(cam, np.float64))
    cols = (np.arange(w) + 0.0 - w / 2.0) * (2.0 / w)
    rows = (h / 2.0 - np.arange(h)) * (2.0 / h)
    x = np.broadcast_to(cols[None, :], (h, w))
    y = np.broadcast_to(rows[:, None], (h, w))

    def at(t):
        ndc = np.stack([x, y, np.full_like(x, t), np.ones_like(x)], -1)
        p = ndc @ inv.T
        return p[..., :3] / p[..., 3:4]

    o, p1 = at(-1.0), at(1.0)
    d = p1 - o
    t = -o[..., 2] / np.where(np.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    hit = o + t[..., None] * d
    if tex is not None:
        return tex(hit[..., 0], hit[..., 1]).astype(np.float32)
    return _texture(hit[..., 0], hit[..., 1], fine).astype(np.float32)


def _project(main_cam, side_cam, h, w, fine, frame=None):
    soup, valid = _plane_soup()
    dm = render_depth(main_cam, soup, valid, h, w)
    ds = render_depth(side_cam, soup, valid, h, w)
    if frame is None:
        frame = _side_frame(side_cam, h, w, fine)
    inten, mask = projected_image(main_cam, dm, jnp.asarray(frame),
                                  side_cam, ds, engine="xla")
    return np.asarray(inten), np.asarray(mask)


def _upsample_reconstruction(frame1, ss):
    """The ss-times-finer grid of frame1's OWN bilinear reconstruction —
    the reference must area-sample the exact function our 1x projection
    point-samples, not a finer re-render of the true texture (that would
    charge the side frame's reconstruction error to the sampler). The NDC
    -> pixel convention is scol = (sx+1)/2*W, so the ss-res coordinate is
    simply scol_ss = ss*scol_1 and the matching pullback is c1 = c_ss/ss."""
    from scipy.ndimage import map_coordinates

    h, w = frame1.shape
    r = np.arange(h * ss) / ss
    c = np.arange(w * ss) / ss
    rr, cc = np.meshgrid(r, c, indexing="ij")
    return map_coordinates(frame1, [rr, cc], order=1,
                           mode="nearest").astype(np.float32)


def _run_case(fine, ss=5, tex=None, side_eye=(0.6, 0.3, 4), hw=(60, 80),
              min_valid=150):
    h, w = hw
    main_cam = make_camera(fov=1.1, near=1.0, far=40.0, eye=(0, 0, 16))
    side_cam = make_camera(fov=1.1, near=0.25, far=40.0, eye=side_eye)

    frame1 = _side_frame(side_cam, h, w, fine, tex=tex)
    inten, mask = _project(main_cam, side_cam, h, w, fine, frame=frame1)
    # supersampled reference: same projection at ss x resolution OF THE
    # SAME 1x reconstruction, averaged over a CENTERED ss x ss window.
    # Under the integer-grid convention the 1x pixel j center maps to
    # subpixel ss*j exactly (odd ss keeps the window integer-centered) —
    # a naive reshape-block average is misaligned by (ss-1)/2 subpixels
    # and reads as a bogus half-pixel shift.
    from scipy.ndimage import uniform_filter

    fi, fm = _project(main_cam, side_cam, h * ss, w * ss, fine,
                      frame=_upsample_reconstruction(frame1, ss))
    fmf = fm.astype(np.float64)
    num = uniform_filter(np.where(fm, fi, 0.0).astype(np.float64), size=ss)
    den = uniform_filter(fmf, size=ss)
    ref = (num / np.maximum(den, 1e-12))[::ss, ::ss][:h, :w]
    full = den[::ss, ::ss][:h, :w] > 0.999
    ok = mask & full
    # a 4x-closer side camera covers ~1/16 of the main frustum by
    # construction — a few hundred pixels is the expected valid set
    assert ok.sum() > min_valid, f"too few valid pixels: {ok.sum()}"
    err = np.abs(inten[ok] - ref[ok])
    return float(np.median(err)), float(np.percentile(err, 95))


def test_minification_fixture_statistics():
    """4x-closer side camera, fixture-like band-limited texture: bilinear
    point sampling must track area sampling closely (measured med 0.90,
    p95 2.2 intensity units of a ~200-unit signal)."""
    med, p95 = _run_case(fine=False)
    assert med < 2.0, f"median divergence {med}"
    assert p95 < 5.0, f"p95 divergence {p95}"


def test_minification_aliasing_regime_characterized():
    """Content near the side Nyquist rate: the divergence grows (this IS
    the mipmap-vs-bilinear gap) but must stay bounded — the regression
    bound records the characterized magnitude (measured med 16.6, p95 39
    of a ~200-unit signal); a mip/area fallback is only warranted if real
    clips push past it."""
    med, p95 = _run_case(fine=True)
    assert med < 25.0, f"median divergence {med}"
    assert p95 < 55.0, f"p95 divergence {p95}"


def test_minification_photo_statistics_8x():
    """VERDICT r4 item 8: the characterized bound above was measured on
    band-limited synthetic textures only. This fixture uses an analytic
    texture with PHOTO statistics (1/f amplitude spectrum, energy past the
    main camera's Nyquist rate) at 8x minification (side camera at z=2 vs
    the main's z=16). With most natural-image energy at low frequencies,
    bilinear point sampling stays FAR within a usable bound of exact area
    sampling — measured med 0.32 / p95 1.18 intensity units of a
    ~120-unit signal (bounds ~4x measured), versus med 16.6 / p95 39 for
    the adversarial near-Nyquist sinusoid above. Real-video content is
    photo-statistics, so no mip/area fallback ships (VERDICT r4 item 8:
    the characterized divergence holds off band-limited fixtures too)."""
    med, p95 = _run_case(fine=False, tex=_photo_texture(),
                         side_eye=(0.3, 0.15, 2.0), hw=(96, 128),
                         min_valid=100)
    assert med < 1.5, f"median divergence {med}"
    assert p95 < 5.0, f"p95 divergence {p95}"
