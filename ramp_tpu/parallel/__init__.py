from ramp_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding, process_shard_indices,
    initialize_distributed,
)
