from psnerf_tpu.parallel.mesh import (
    make_mesh,
    shard_stage2_batch,
    shard_stage1_batch,
    replicate,
)
