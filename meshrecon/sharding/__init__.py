from meshrecon.sharding.meshes import (
    make_device_mesh,
    make_scene_mesh,
    dense_update_batch,
    sharded_dense_update,
    sharded_fused_update,
    sharded_plane_sweep,
    sharded_multi_scene_fused,
    make_window_mesh,
)

__all__ = [
    "make_device_mesh",
    "make_scene_mesh",
    "dense_update_batch",
    "sharded_dense_update",
    "sharded_fused_update",
    "sharded_plane_sweep",
    "sharded_multi_scene_fused",
    "make_window_mesh",
]
