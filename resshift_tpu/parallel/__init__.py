from .mesh import make_mesh, shard_batch, replicate, data_parallel_shardings, P
from .tp import param_specs, param_shardings, shard_params
from .pp import make_stage_mesh, pipeline_stream, stage_slices

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings",
           "P", "param_specs", "param_shardings", "shard_params",
           "make_stage_mesh", "pipeline_stream", "stage_slices"]
