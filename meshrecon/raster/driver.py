"""Standalone raster driver — TEST_BUILD main of render_glx.cpp:399-433.

Renders the same golden scene (the hard-coded mesh + MVPs exported from
test_glx.blend) to test/out-depth.png and test/out-projected.png, overlaying
reprojected vertices colored by NDC depth, and prints depth min/max.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    os.makedirs("test", exist_ok=True)
    from tests.test_raster import GLX_POINTS, GLX_FACES, GLX_MVP, GLX_SIDE_MVP
    from meshrecon.io.obj import Mesh
    from meshrecon.raster import Renderer
    from meshrecon.io.images import save_image

    r = Renderer(640, 480)
    r.load_mesh(Mesh(GLX_POINTS, GLX_FACES))

    rng = np.random.default_rng(0)
    # procedural grid texture (the reference reads test/grid.png)
    yy, xx = np.mgrid[0:480, 0:640]
    tex = (((xx // 40) + (yy // 40)) % 2 * 155 + 50).astype(np.float32)

    depth = np.asarray(r.depth(GLX_MVP))
    inten, mask = r.projected(GLX_MVP, tex, GLX_SIDE_MVP)
    frame = np.stack([np.zeros_like(np.asarray(inten)),
                      np.asarray(mask) * 255.0, np.asarray(inten)], axis=-1)

    pts = GLX_POINTS[:, :3] / GLX_POINTS[:, 3:4]
    clip = (GLX_MVP[:, :3] @ pts.T).T + GLX_MVP[:, 3]
    ndc = clip[:, :3] / clip[:, 3:4]
    for x, y, z in ndc:
        c = int(640 * (0.5 + x * 0.5))
        rr = int(480 * (0.5 - y * 0.5))
        if 0 <= rr < 480 and 0 <= c < 640:
            color = (
                [128 * (1 - z), 128 * (z + 1), 0] if -1 <= z <= 1 else [0, 0, 255]
            )
            frame[max(0, rr - 3):rr + 3, max(0, c - 3):c + 3] = color
    save_image(frame, "test/out-projected.png")
    save_image(depth, "test/out-depth.png", normalize=True)
    print(f"Depth min: {depth.min():g}, max: {depth.max():g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
