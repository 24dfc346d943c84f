"""Distribution: mesh construction and the shard_map pencil/slab pipelines."""

from .mesh import COL, ROW, input_sharding, make_mesh, mesh_shape, output_sharding
from .pencil import make_pencil_fft3d, pencil_pipeline

__all__ = [
    "COL", "ROW", "input_sharding", "make_mesh", "make_pencil_fft3d",
    "mesh_shape", "output_sharding", "pencil_pipeline",
]
