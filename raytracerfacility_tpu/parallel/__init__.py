from raytracerfacility_tpu.parallel.sharding import (
    estimate_illumination_sharded,
    make_mesh,
    render_frame_sharded,
    scan_point_cloud_sharded,
)

__all__ = [
    "estimate_illumination_sharded",
    "make_mesh",
    "render_frame_sharded",
    "scan_point_cloud_sharded",
]
