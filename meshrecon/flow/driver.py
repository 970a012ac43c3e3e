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

    # single-letter knobs like the reference test CLI (flow.cpp:88-109):
    # l<levels> i<iters> w<winsize> s<sigma> n<poly_n> f=farneback h=variational
    knobs = {"l": None, "i": None, "w": None, "s": None, "n": None}
    use_farneback = False
    for opt in argv[2:]:
        if opt == "f":
            use_farneback = True
        elif opt == "h":
            use_farneback = False
        elif opt and opt[0] in knobs:
            knobs[opt[0]] = float(opt[1:])

    if use_farneback:
        from meshrecon.flow.farneback import farneback_flow
        from meshrecon.flow.pyramid import compare
        from meshrecon.flow.shiftwarp import shift_warp_bicubic

        kw = {}
        if knobs["l"]:
            kw["levels"] = int(knobs["l"])
        if knobs["i"]:
            kw["iters"] = int(knobs["i"])
        if knobs["w"]:
            # OpenCV winsize convention, matching the reference CLI's w
            # knob (flow.cpp:97-99) parameter for parameter
            kw["winsize"] = int(knobs["w"])
        if knobs["s"]:
            kw["poly_sigma"] = knobs["s"]
        if knobs["n"]:
            kw["poly_n"] = int(knobs["n"])
        f2 = np.asarray(farneback_flow(prev, next_, **kw))
        warped = shift_warp_bicubic(next_, f2[..., 0], f2[..., 1], radius=8)
        var = np.asarray(compare(prev, warped))
        flow = np.concatenate(
            [f2, var[..., None], np.zeros_like(var)[..., None]], axis=-1
        )
    elif any(v for v in knobs.values()):
        from meshrecon.flow.variational import variational_flow
        from meshrecon.flow.pyramid import compare
        from meshrecon.flow.shiftwarp import shift_warp_bicubic

        kw = {"levels": 6}  # arbitrary frame pairs: large displacements
        if knobs["l"]:
            kw["levels"] = int(knobs["l"])
        if knobs["i"]:
            kw["iters"] = int(knobs["i"])
        if knobs["s"]:
            kw["alpha"] = knobs["s"]
        f2 = np.asarray(variational_flow(prev, next_, **kw))
        warped = shift_warp_bicubic(next_, f2[..., 0], f2[..., 1], radius=8)
        var = np.asarray(compare(prev, warped))
        flow = np.concatenate(
            [f2, var[..., None], np.zeros_like(var)[..., None]], axis=-1
        )
    else:
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
