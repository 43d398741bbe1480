from gb25_tpu.parallel.mesh import factors, make_mesh  # noqa: F401
from gb25_tpu.parallel.halo import MeshComm  # noqa: F401
from gb25_tpu.parallel.localize import localize_grid  # noqa: F401
from gb25_tpu.parallel.sharded import (  # noqa: F401
    shard_state,
    sharded_step_fn,
    make_comm,
    replicate,
)
