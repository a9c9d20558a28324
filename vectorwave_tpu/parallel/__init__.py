from .mesh import default_mesh, make_mesh
from .batch import shard_batch, modwt_multilevel_sharded_batch
from .tiled import (
    imodwt_multilevel_tiled,
    modwt_multilevel_tiled,
    tiled_roundtrip_check,
)
from .cwt_tiled import cwt_tiled

__all__ = [
    "cwt_tiled",
    "make_mesh",
    "default_mesh",
    "shard_batch",
    "modwt_multilevel_sharded_batch",
    "modwt_multilevel_tiled",
    "imodwt_multilevel_tiled",
    "tiled_roundtrip_check",
]
