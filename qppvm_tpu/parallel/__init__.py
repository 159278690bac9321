"""Device-mesh, sharding and horizon-parallel helpers (SURVEY.md §2c)."""
from qppvm_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    initialize_distributed,
    make_2d_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
from qppvm_tpu.parallel.ring_horizon import (  # noqa: F401
    RingRolloutInfo,
    ring_rollout,
)
