"""Flow-based image warping with bicubic interpolation.

``flow_remap(flow, image)`` resamples `image` at ``(x + fx, y + fy)`` like the
reference (util.cpp:390-403, which uses cv::remap with CV_INTER_CUBIC). The
bicubic kernel is Catmull-Rom-family with a = -0.75, matching OpenCV's cubic
coefficient; samples outside the domain are clamped to the border (the warp
error at frame borders is masked downstream by the variance channel anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cubic_weights(t, a=-0.75):
    """Four kernel weights for fractional offset t in [0,1): taps at -1,0,1,2."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t2 - t3)
    return w0, w1, w2, w3


def bicubic_sample(image, col, row):
    """Bicubic sample of (H, W) image at continuous (col, row); clamped."""
    h, w = image.shape
    c0 = jnp.floor(col).astype(jnp.int32)
    r0 = jnp.floor(row).astype(jnp.int32)
    fc = col - c0
    fr = row - r0
    wc = _cubic_weights(fc)
    wr = _cubic_weights(fr)
    out = jnp.zeros_like(col)
    for i in range(4):
        ri = jnp.clip(r0 + (i - 1), 0, h - 1)
        row_acc = jnp.zeros_like(col)
        for j in range(4):
            cj = jnp.clip(c0 + (j - 1), 0, w - 1)
            row_acc = row_acc + wc[j] * image[ri, cj]
        out = out + wr[i] * row_acc
    return out


@jax.jit
def bicubic_remap(image, map_col, map_row):
    return bicubic_sample(jnp.asarray(image, jnp.float32), map_col, map_row)


@jax.jit
def flow_remap(flow, image):
    """Warp `image` by `flow`: out(r, c) = image(c + fx(r,c), r + fy(r,c)).

    flow: (H, W, >=2) with channels (fx, fy, ...); image: (H, W).
    Mirrors util.cpp:390-403.
    """
    flow = jnp.asarray(flow, jnp.float32)
    h, w = flow.shape[:2]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    return bicubic_remap(image, cols + flow[..., 0], rows + flow[..., 1])


def bilinear_warp(image, flow):
    """Bilinear warp used inside the flow solver (cheaper than bicubic)."""
    from meshrecon.raster.fragment import bilinear_sample

    h, w = image.shape
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    return bilinear_sample(
        jnp.asarray(image, jnp.float32), cols + flow[..., 0], rows + flow[..., 1]
    )
