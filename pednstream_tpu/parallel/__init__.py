from .mesh import make_mesh, make_mesh_2d, shard_batch, data_parallel_env_step
from .link_shard import (
    link_state_shardings,
    link_params_shardings,
    shard_link_state,
    shard_link_params,
    make_link_sharded_simulate,
    make_link_sharded_step,
    hybrid_state_shardings,
    shard_hybrid_state,
    make_hybrid_sharded_simulate,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "data_parallel_env_step",
    "link_state_shardings",
    "link_params_shardings",
    "shard_link_state",
    "shard_link_params",
    "make_link_sharded_simulate",
    "make_link_sharded_step",
    "hybrid_state_shardings",
    "shard_hybrid_state",
    "make_hybrid_sharded_simulate",
]
