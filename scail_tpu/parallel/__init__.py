from scail_tpu.parallel.mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    MODEL_AXIS,
    MeshSpec,
    make_mesh,
    get_mesh,
    set_mesh,
    mesh_axis_size,
)
from scail_tpu.parallel.ring import ring_attention
from scail_tpu.parallel.sharding import (
    PathRules,
    specs_for_tree,
    shard_tree,
    with_sharding_constraint,
)

__all__ = [
    "DATA_AXIS",
    "SEQ_AXIS",
    "MODEL_AXIS",
    "MeshSpec",
    "make_mesh",
    "get_mesh",
    "set_mesh",
    "mesh_axis_size",
    "ring_attention",
    "PathRules",
    "specs_for_tree",
    "shard_tree",
    "with_sharding_constraint",
]
