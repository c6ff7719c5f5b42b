from .mesh import make_mesh, shard_batch, data_parallel_env_step

__all__ = ["make_mesh", "shard_batch", "data_parallel_env_step"]
