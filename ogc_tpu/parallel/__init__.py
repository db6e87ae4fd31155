from ogc_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch,
    replicate,
    replicated,
    shard_batch,
)
