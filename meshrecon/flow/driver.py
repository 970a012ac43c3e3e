"""Standalone flow driver — the TEST_BUILD main of flow.cpp (flow.cpp:77-135).

Usage: python -m meshrecon.flow.driver IMAGE1 IMAGE2 [(l|i|f)NUMBER]...
Writes flow.png, remap.png, diff.png and prints the L1 remap-error self-check
(the reference's flow-quality metric, flow.cpp:133).
"""

from __future__ import annotations

import sys

import numpy as np


def _make_fixture_pair():
    """Synthetic test pair (shifted band-limited texture) when no images are
    given — the reference's fixtures aren't shipped either."""
    import os

    from tests.test_flow import smooth_image, shift_image
    from meshrecon.io.images import save_image

    os.makedirs("test", exist_ok=True)
    img = smooth_image(240, 320, seed=11)
    save_image(img, "test/flow1.png")
    save_image(shift_image(img, 3, -2), "test/flow2.png")
    return "test/flow1.png", "test/flow2.png"


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import imageio.v3 as iio

    from meshrecon.flow import calculate_flow, flow_remap

    def to_gray(img):
        img = np.asarray(img, np.float32)
        return img if img.ndim == 2 else img[..., :3].mean(axis=2)

    if len(argv) < 2:
        print("No images given; generating synthetic fixtures in test/")
        argv = list(_make_fixture_pair()) + list(argv)

    prev = to_gray(iio.imread(argv[0]))
    next_ = to_gray(iio.imread(argv[1]))
    use_farneback = False
    for opt in argv[2:]:
        if opt == "f":
            use_farneback = True

    flow = np.asarray(calculate_flow(prev, next_, use_farneback))
    from meshrecon.io.images import save_image

    vis = flow[..., :3] * 10 + 127
    save_image(vis, "flow.png")
    remapped = np.asarray(flow_remap(flow, next_))
    save_image(remapped, "remap.png")
    save_image(np.abs(prev - remapped) * 10, "diff.png")
    print(f"Diff sum: {np.abs(prev - remapped).sum():g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
