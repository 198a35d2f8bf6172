from raytracerfacility_tpu.parallel.sharding import (
    make_mesh,
    render_frame_sharded,
)

__all__ = ["make_mesh", "render_frame_sharded"]
