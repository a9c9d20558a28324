from .mesh import default_mesh, make_mesh
from .batch import shard_batch, modwt_multilevel_sharded_batch
from .tiled import (
    imodwt_multilevel_tiled,
    modwt_multilevel_tiled,
    tiled_roundtrip_check,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "shard_batch",
    "modwt_multilevel_sharded_batch",
    "modwt_multilevel_tiled",
    "imodwt_multilevel_tiled",
    "tiled_roundtrip_check",
]
