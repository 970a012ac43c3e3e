"""Blender addon: export motion-tracking data in the OpenCV-YAML dialect that
`recon` consumes.

From-scratch reimplementation of the reference's producer-side addon
(io_export_tracks.py): for the active movie clip it writes

- ``clip``: path, size, horizontal FOV, first three radial distortion
  coefficients, principal point (io_export_tracks.py:40-54);
- ``camera``: per tracked frame a 1-based frame index, auto-guessed near/far
  (0.8x min / 2x max of bundle depths, io_export_tracks.py:57-74) and the
  4x4 ``projection = PerspectiveMatrix(fov, aspect, near, far) @ camera_inv
  @ zflip`` with a z-axis flip because Blender cameras look along -Z
  (io_export_tracks.py:22-28), plus the camera ``position``;
- ``tracks``: per tracking point its homogeneous ``bundle`` and the 1-based
  list of frames where its marker is enabled (io_export_tracks.py:86-96).

Install as a regular Blender addon; appears under File > Export > Tracking
data (.yaml). Requires bpy; importable without Blender for format tests via
``write_tracks_yaml``.
"""

from __future__ import annotations

import math

bl_info = {
    "name": "Export tracking data (meshrecon)",
    "description": "Camera track + bundles in the OpenCV-YAML recon format",
    "category": "Import-Export",
}


def _fmt_matrix(mat_rows, indent=4):
    data = ", ".join(repr(float(v)) for row in mat_rows for v in row)
    pad = " " * indent
    return (
        f"{pad}rows: {len(mat_rows)}\n"
        f"{pad}cols: {len(mat_rows[0])}\n"
        f"{pad}dt: f\n"
        f"{pad}data: [ {data}]\n"
    )


def write_tracks_yaml(fh, clip_info, cameras, tracks):
    """Serialize the scene in the exact file dialect.

    clip_info: dict(path, width, height, fov, distortion(k1, k2, k3),
    center_x, center_y); cameras: list of dicts (frame [1-based], near, far,
    projection 4x4 nested list, position length-4 list); tracks: list of
    dicts (bundle length-4, frames_enabled list of 1-based ints).
    """
    fh.write("%YAML:1.0\n")
    fh.write("clip:\n")
    fh.write(f" path: {clip_info['path']}\n")
    fh.write(f" width: {clip_info['width']}\n")
    fh.write(f" height: {clip_info['height']}\n")
    fh.write(f" fov: {clip_info['fov']!r}\n")
    k1, k2, k3 = clip_info["distortion"]
    fh.write(f" distortion: [{k1!r}, {k2!r}, {k3!r}]\n")
    fh.write(f" center-x: {clip_info['center_x']!r}\n")
    fh.write(f" center-y: {clip_info['center_y']!r}\n")
    fh.write("camera:\n")
    for cam in cameras:
        fh.write(f" - frame: {cam['frame']}\n")
        fh.write(f"   near: {cam['near']!r}\n")
        fh.write(f"   far: {cam['far']!r}\n")
        fh.write("   projection: !!opencv-matrix\n")
        fh.write(_fmt_matrix(cam["projection"]))
        fh.write("   position: !!opencv-matrix\n")
        fh.write(_fmt_matrix([[v] for v in cam["position"]]))
    fh.write("tracks:\n")
    for tr in tracks:
        fh.write(" - bundle: !!opencv-matrix\n")
        fh.write(_fmt_matrix([[v] for v in tr["bundle"]]))
        enabled = ", ".join(str(int(f)) for f in tr["frames_enabled"])
        fh.write(f"   frames-enabled: [{enabled}]\n")


def _perspective(fov, aspect, near, far):
    """Row-major perspective matrix matching Blender's PerspectiveMatrix."""
    f = 1.0 / math.tan(fov / 2.0)
    return [
        [f, 0.0, 0.0, 0.0],
        [0.0, f / aspect if aspect < 1 else f * (1 / aspect), 0.0, 0.0],
        [0.0, 0.0, (near + far) / (near - far), 2.0 * near * far / (near - far)],
        [0.0, 0.0, -1.0, 0.0],
    ]


def export_from_blender(context, filepath):  # pragma: no cover - needs bpy
    import bpy
    from mathutils import Matrix

    scene = context.scene
    clip = None
    for obj in scene.objects:
        if obj.type == "CAMERA":
            for con in obj.constraints:
                if con.type == "CAMERA_SOLVER":
                    clip = con.clip if not con.use_active_clip else scene.active_clip
                    camera_obj = obj
    if clip is None:
        raise RuntimeError("no camera with a Camera Solver constraint found")
    tracking = clip.tracking
    cam = tracking.camera
    width, height = clip.size
    aspect = height / width

    # near/far guessed from bundle depth range per camera pose
    zflip = Matrix(((1, 0, 0, 0), (0, 1, 0, 0), (0, 0, -1, 0), (0, 0, 0, 1)))
    fov = 2.0 * math.atan(cam.sensor_width / (2.0 * cam.focal_length))

    cameras = []
    depsgraph = context.evaluated_depsgraph_get()
    for frame in range(scene.frame_start, scene.frame_end + 1):
        scene.frame_set(frame)
        cam_inv = camera_obj.matrix_world.inverted()
        depths = []
        for track in tracking.tracks:
            if track.has_bundle:
                p = cam_inv @ track.bundle.to_4d()
                depths.append(-p.z)
        if not depths:
            continue
        near = 0.8 * min(depths)
        far = 2.0 * max(depths)
        persp = Matrix(_perspective(fov, aspect, near, far))
        proj = persp @ cam_inv @ zflip
        pos = camera_obj.matrix_world.translation.to_4d()
        cameras.append(
            {
                "frame": frame,
                "near": near,
                "far": far,
                "projection": [list(r) for r in proj],
                "position": list(pos),
            }
        )

    tracks = []
    for track in tracking.tracks:
        if not track.has_bundle:
            continue
        enabled = [
            m.frame for m in track.markers if not m.mute
        ]
        tracks.append(
            {
                "bundle": list(track.bundle.to_4d()),
                "frames_enabled": enabled,
            }
        )

    with open(filepath, "w") as fh:
        write_tracks_yaml(
            fh,
            {
                "path": bpy.path.abspath(clip.filepath),
                "width": width,
                "height": height,
                "fov": fov,
                "distortion": (cam.k1, cam.k2, cam.k3),
                "center_x": cam.principal[0],
                "center_y": cam.principal[1],
            },
            cameras,
            tracks,
        )


try:  # Blender operator registration (no-op outside Blender)
    import bpy

    class ExportTracksMeshrecon(bpy.types.Operator):  # pragma: no cover
        bl_idname = "export.meshrecon_tracks"
        bl_label = "Tracking data (.yaml)"
        filepath: bpy.props.StringProperty(subtype="FILE_PATH")

        def execute(self, context):
            export_from_blender(context, self.filepath)
            return {"FINISHED"}

        def invoke(self, context, event):
            context.window_manager.fileselect_add(self)
            return {"RUNNING_MODAL"}

    def menu_func(self, context):  # pragma: no cover
        self.layout.operator(ExportTracksMeshrecon.bl_idname)

    def register():  # pragma: no cover
        bpy.utils.register_class(ExportTracksMeshrecon)
        bpy.types.TOPBAR_MT_file_export.append(menu_func)

    def unregister():  # pragma: no cover
        bpy.utils.unregister_class(ExportTracksMeshrecon)
        bpy.types.TOPBAR_MT_file_export.remove(menu_func)

except ImportError:
    pass
