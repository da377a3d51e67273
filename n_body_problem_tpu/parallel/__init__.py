from n_body_problem_tpu.parallel.mesh import make_ring_mesh
from n_body_problem_tpu.parallel.ring import (
    half_ring_acc,
    make_sharded_step,
    ring_acc,
    shard_state,
)
from n_body_problem_tpu.parallel.sharded import ShardedSimulation
from n_body_problem_tpu.parallel.stream import (
    make_staged_force,
    make_staged_run,
)
from n_body_problem_tpu.parallel.tree import (
    make_sharded_treecode_force,
    make_sharded_treecode_run,
)

__all__ = [
    "make_ring_mesh",
    "ring_acc",
    "half_ring_acc",
    "make_sharded_step",
    "shard_state",
    "ShardedSimulation",
    "make_sharded_treecode_force",
    "make_sharded_treecode_run",
    "make_staged_force",
    "make_staged_run",
]
