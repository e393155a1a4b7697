from tmrnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    shard_state,
    initialize_multihost,
    process_local_bounds,
    global_batch_from_local,
    mesh_spans_processes,
    host_local,
)
