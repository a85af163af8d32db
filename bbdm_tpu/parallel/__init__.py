"""Device mesh + sharding helpers (data parallelism over ICI/DCN)."""

from bbdm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    local_device_count,
)
from bbdm_tpu.parallel.distributed import (  # noqa: F401
    maybe_initialize_distributed,
)
from bbdm_tpu.parallel.tp import (  # noqa: F401
    fetch_tree,
    place_state,
)
