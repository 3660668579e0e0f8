"""Device-mesh parallelism: data-parallel PPO over ICI/DCN.

TPU-native replacement for the reference's two parallelism mechanisms
(SURVEY.md §2): the `multiprocessing.Pool` rollout workers
(reference ppo.py:44,359-369) and the mother/child file-IPC protocol
(reference visual_landing/rl_worker.py:267-342). Both were synchronous
on-policy data-parallel experience collection with post-update parameter
broadcast — here that is a `shard_map` over a `Mesh` axis: env batches shard
across chips, gradients `pmean` over ICI, and the "broadcast" is the
replicated parameter sharding (no files, no pickling, no polling).
"""

from .dp import (
    make_dp_mesh,
    make_parallel_train_loop,
    make_parallel_train_step,
    ppo_init_sharded,
)
from .dp_landing import (
    landing_ppo_init_sharded,
    make_landing_parallel_train_loop,
    make_landing_parallel_train_step,
)
from .multiseed import (
    make_multiseed_parallel_train_loop,
    multiseed_init_sharded,
)

__all__ = [
    "landing_ppo_init_sharded",
    "make_dp_mesh",
    "make_landing_parallel_train_loop",
    "make_landing_parallel_train_step",
    "make_multiseed_parallel_train_loop",
    "make_parallel_train_loop",
    "make_parallel_train_step",
    "multiseed_init_sharded",
    "ppo_init_sharded",
]
