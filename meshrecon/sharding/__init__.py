from meshrecon.sharding.meshes import (
    make_device_mesh,
    dense_update_batch,
    sharded_dense_update,
)

__all__ = ["make_device_mesh", "dense_update_batch", "sharded_dense_update"]
