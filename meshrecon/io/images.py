"""PNG image dumps with the reference's normalization semantics.

Mirrors util.cpp:482-519: multi-channel images that are not 3-channel get
padded/truncated to 3 channels; optional normalization maps the global
min..max of all channels jointly to 0..255.
"""

from __future__ import annotations

import numpy as np

try:  # imageio is baked into the environment
    import imageio.v3 as iio

    _HAVE_IIO = True
except Exception:  # pragma: no cover
    _HAVE_IIO = False


def save_image(image, file_name: str, normalize: bool = False) -> None:
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[2] not in (1, 3):
        # pad or cut to 3 channels, first channel becomes G like the
        # reference's mixChannels {-1,0, 0,1, 1,2} (util.cpp:492-497)
        out = np.zeros(img.shape[:2] + (3,), dtype=img.dtype)
        n = min(2, img.shape[2])
        out[..., 1 : 1 + n] = img[..., :n]
        img = out
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    if normalize:
        lo, hi = float(np.min(img)), float(np.max(img))
        if hi > lo:
            img = (img.astype(np.float64) - lo) * 255.0 / (hi - lo)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if _HAVE_IIO:
        iio.imwrite(file_name, img)
    else:  # pragma: no cover
        raise RuntimeError("no image backend available")
