from .mesh import (
    fsdp_shardings,
    gather_to_host,
    make_mesh,
    replicate,
    shard_batch,
)
