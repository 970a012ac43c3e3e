"""Parser for the OpenCV-FileStorage YAML dialect written by Blender's
``io_export_tracks.py`` exporter.

The format (see reference ``io_export_tracks.py:40-96`` and samples in
``tracks/*.yaml``) is YAML 1.0 with two OpenCV quirks that stock PyYAML
rejects or mishandles:

- a ``%YAML:1.0`` directive (note the colon — not valid YAML),
- ``!!opencv-matrix`` tagged mappings ``{rows, cols, dt, data}``.

Structure: ``clip: {path, width, height, fov, distortion[k1,k2,k3],
center-x, center-y}``, ``camera: [{frame, near, far, projection 4x4,
position 4x1}]``, ``tracks: [{bundle 4x1, frames-enabled[]}]``.
``frame`` and ``frames-enabled`` indices are 1-based; ``skip_frames``
remapping follows configuration.cpp:183-196,205-218.
"""

from __future__ import annotations

import dataclasses
import os
import numpy as np
import yaml


def _opencv_matrix_constructor(loader, node):
    mapping = loader.construct_mapping(node, deep=True)
    rows, cols = int(mapping["rows"]), int(mapping["cols"])
    data = np.asarray(mapping["data"], dtype=np.float32)
    return data.reshape(rows, cols)


class _OpenCVLoader(yaml.SafeLoader):
    pass


_OpenCVLoader.add_constructor(
    "tag:yaml.org,2002:opencv-matrix", _opencv_matrix_constructor
)
# OpenCV also writes the short-hand local tag form in some versions.
_OpenCVLoader.add_constructor("!opencv-matrix", _opencv_matrix_constructor)


def _read_opencv_yaml(path: str) -> dict:
    with open(path, "r") as fh:
        text = fh.read()
    lines = text.splitlines()
    if lines and lines[0].lstrip().startswith("%YAML"):
        lines = lines[1:]  # drop the malformed %YAML:1.0 directive
    return yaml.load("\n".join(lines), Loader=_OpenCVLoader)


@dataclasses.dataclass
class TrackFile:
    """In-memory form of one exported scene calibration.

    Arrays are kept exactly as parsed; frame-index remapping for
    ``skip_frames`` happens here (like configuration.cpp:183-218) so all
    downstream indices are 0-based and already subsampled.
    """

    clip_path: str  # resolved relative to the YAML's directory
    width: int
    height: int
    fov: float
    distortion: np.ndarray  # (3,) [k1, k2, k3]
    center_x: float
    center_y: float
    cameras: np.ndarray  # (F, 4, 4) float32 projection per tracked frame
    near: np.ndarray  # (F,)
    far: np.ndarray  # (F,)
    camera_valid: np.ndarray  # (F,) bool: frame had a camera entry
    bundles: np.ndarray  # (N, 4) float32 homogeneous sparse points
    bundles_enabled: list  # list of N sets of 0-based frame indices

    @property
    def frame_count(self) -> int:
        return int(self.cameras.shape[0])


def load_tracks(path: str, skip_frames: int = 1) -> TrackFile:
    """Load and validate a track YAML. Fail-fast like configuration.cpp:134-142."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Cannot read file {path}")
    doc = _read_opencv_yaml(path)
    if not isinstance(doc, dict) or "clip" not in doc:
        raise ValueError(f"No clip section in configuration YAML {path}")

    clip = doc["clip"]
    width, height = int(clip["width"]), int(clip["height"])
    distortion = np.asarray(clip.get("distortion", [0.0, 0.0, 0.0]), dtype=np.float32)
    clip_path = os.path.join(os.path.dirname(os.path.abspath(path)), clip["path"])

    cam_entries = doc.get("camera", []) or []
    # Largest (1-based) frame index after skip remapping decides array length,
    # mirroring trackedFrameCount in configuration.cpp:204-224.
    tracked = 0
    parsed = []
    for entry in cam_entries:
        fi = int(entry["frame"])
        assert fi > 0, "frame indices are 1-based"
        fi -= 1
        if fi % skip_frames:
            continue
        fi //= skip_frames
        parsed.append((fi, entry))
        tracked = max(tracked, fi + 1)

    cameras = np.zeros((tracked, 4, 4), dtype=np.float32)
    near = np.zeros(tracked, dtype=np.float32)
    far = np.zeros(tracked, dtype=np.float32)
    valid = np.zeros(tracked, dtype=bool)
    for fi, entry in parsed:
        proj = np.asarray(entry["projection"], dtype=np.float32)
        if proj.shape != (4, 4):
            raise ValueError(f"projection for frame {fi} is {proj.shape}, not 4x4")
        cameras[fi] = proj
        near[fi] = float(entry["near"])
        far[fi] = float(entry["far"])
        valid[fi] = True
    if not np.all((near[valid] > 0) & (far[valid] > 0)):
        raise ValueError("near/far values must be positive for tracked frames")

    bundles = []
    enabled = []
    for track in doc.get("tracks", []) or []:
        bundle = np.asarray(track["bundle"], dtype=np.float32).reshape(-1)
        if bundle.shape[0] != 4:
            raise ValueError("bundle must be a 4-vector")
        frames_enabled = track.get("frames-enabled", []) or []
        remapped = set()
        for f in frames_enabled:
            f0 = int(f) - 1
            if f0 % skip_frames == 0:
                remapped.add(f0 // skip_frames)
        bundles.append(bundle)
        enabled.append(remapped)
    bundles_arr = (
        np.stack(bundles).astype(np.float32)
        if bundles
        else np.zeros((0, 4), dtype=np.float32)
    )

    return TrackFile(
        clip_path=clip_path,
        width=width,
        height=height,
        fov=float(clip.get("fov", 0.0)),
        distortion=distortion,
        center_x=float(clip.get("center-x", width / 2.0)),
        center_y=float(clip.get("center-y", height / 2.0)),
        cameras=cameras,
        near=near,
        far=far,
        camera_valid=valid,
        bundles=bundles_arr,
        bundles_enabled=enabled,
    )
