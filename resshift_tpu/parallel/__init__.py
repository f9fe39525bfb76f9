from .mesh import make_mesh, shard_batch, replicate, data_parallel_shardings, P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings", "P"]
