from fab_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    activate_mesh,
    active_mesh,
    constrain_batch,
    constrain_tree_batch,
    data_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    use_mesh,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "activate_mesh",
    "active_mesh",
    "constrain_batch",
    "constrain_tree_batch",
    "data_sharding",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "use_mesh",
]
