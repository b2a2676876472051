from .mesh import make_mesh, shard_batch, replicate, batch_sharding  # noqa: F401
from .zero import (  # noqa: F401
    constrain_opt_state,
    opt_state_shardings,
    place_opt_state,
)
from .distributed import (  # noqa: F401
    all_processes_mean,
    barrier,
    form_global_batch,
    global_mesh,
    is_multi_process,
    maybe_initialize,
)
