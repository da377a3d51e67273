from n_body_problem_tpu.parallel.mesh import make_ring_mesh
from n_body_problem_tpu.parallel.ring import (
    half_ring_acc,
    make_sharded_step,
    ring_acc,
    shard_state,
)
from n_body_problem_tpu.parallel.sharded import ShardedSimulation

__all__ = [
    "make_ring_mesh",
    "ring_acc",
    "half_ring_acc",
    "make_sharded_step",
    "shard_state",
    "ShardedSimulation",
]
