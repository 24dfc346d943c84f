"""Distribution: mesh construction and the shard_map pencil/slab pipelines."""

from .mesh import (
    COL,
    RANKORDER_AUTO,
    RANKORDER_COL,
    RANKORDER_ROW,
    ROW,
    SLICE,
    input_sharding,
    make_mesh,
    make_multislice_mesh,
    mesh_shape,
    output_sharding,
    with_rankorder,
)
from .long1d import dist1d_split, natural_sharding
from .pencil import make_pencil_fft3d, make_phase_trials, pencil_pipeline

__all__ = [
    "COL", "RANKORDER_AUTO", "RANKORDER_COL", "RANKORDER_ROW", "ROW",
    "SLICE", "dist1d_split", "input_sharding", "make_mesh",
    "make_multislice_mesh", "make_pencil_fft3d", "make_phase_trials",
    "mesh_shape", "natural_sharding", "output_sharding",
    "pencil_pipeline", "with_rankorder",
]
