from .mesh import make_mesh, shard_batch, replicate, batch_sharding  # noqa: F401
from .distributed import (  # noqa: F401
    all_processes_mean,
    barrier,
    form_global_batch,
    global_mesh,
    is_multi_process,
    maybe_initialize,
)
