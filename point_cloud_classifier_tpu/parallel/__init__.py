from point_cloud_classifier_tpu.parallel.mesh import (
    batch_shardings,
    default_mesh,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "batch_shardings",
    "param_shardings",
    "replicated",
    "shard_batch",
]
